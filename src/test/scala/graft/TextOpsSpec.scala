package graft

import graft.operators.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("quality calibration: two-level rank equals the single-window " +
      "per-language rank, percentiles and deciles included") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        (length(col("text")) % 97).cast("long").as("score"))
      .localCheckpoint()
    val got = TextOps.calibrateQuality(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // reference: the skew-unsafe single window (fine at spec scale)
    val w = Window.partitionBy("lang").orderBy("score", "doc_id")
    val expect = docs
      .withColumn("lang_rank", row_number().over(w).cast("long"))
      .withColumn("n_lang",
        count(lit(1)).over(Window.partitionBy("lang")).cast("long"))
      .select(col("doc_id"), col("lang"), col("score"), col("lang_rank"),
        expr("""CAST(CASE WHEN n_lang > 1
                  THEN (lang_rank - 1) * 1000 DIV (n_lang - 1)
                  ELSE 0 END AS BIGINT)""").as("pct_millis"),
        expr("CAST(least((lang_rank - 1) * 10 DIV n_lang, 9) AS BIGINT)")
          .as("decile"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expect, "two-level rank diverges from the single window")
    // sanity: complete cover, ranks contiguous per lang
    assert(got.size == docs.count())
    got.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.map(_._4).toSeq.sorted == (1L to rows.size).toSeq,
        s"ranks not contiguous for $lang")
    }
  }

  test("quality calibration plan has no per-language corpus window") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        (length(col("text")) % 97).cast("long").as("score"))
    val plan = TextOps.calibrateQuality(docs)
      .queryExecution.optimizedPlan.toString
    // every Window partitions at least by (lang, score [, bucket]) —
    // never by lang alone, which would put a whole language in one task
    val windowSpecs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(plan.toLowerCase).map(_.group(1)).toSeq
    assert(windowSpecs.nonEmpty, s"expected window specs in:\n$plan")
    windowSpecs.foreach { spec =>
      assert(spec.contains("score") || spec.contains("bucket"),
        s"a window partitions by language alone: [$spec]\n$plan")
    }
  }
}
