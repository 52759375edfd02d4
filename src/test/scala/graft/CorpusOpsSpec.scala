package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("HLL sketch estimates track exact distincts within sketch error") {
    val rows = CorpusOps.distinctSketch(docs)
      .select("scope", "est", "exact_distinct", "rel_err").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scope, est, exact) = (r.getString(0), r.getDouble(1), r.getLong(2))
      assert(exact > 0)
      // m=256 registers -> ~1.04/sqrt(256) = 6.5% typical; allow 4 sigma
      assert(math.abs(est - exact) / exact <= 0.26,
        s"$scope: est $est vs exact $exact")
    }
  }

  test("HLL registers merge: split-by-doc sub-sketches max-merge to the " +
      "whole-corpus registers") {
    val left = CorpusOps.hllRegisters(docs.filter(col("doc_id") % 2 === 0))
    val right = CorpusOps.hllRegisters(docs.filter(col("doc_id") % 2 =!= 0))
    val merged = left.unionByName(right)
      .groupBy("scope", "reg").agg(max("mx").as("mx"))
      .orderBy("scope", "reg").collect().toSeq
    val whole = CorpusOps.hllRegisters(docs)
      .orderBy("scope", "reg").collect().toSeq
    assert(merged == whole)
  }

  test("HLL ALL row is the max-merge of the per-lang rows") {
    val sk = CorpusOps.distinctSketch(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap // scope -> s_num
    assert(sk.contains("ALL") && sk.size >= 3)
    val perLang = CorpusOps.hllRegisters(docs)
      .groupBy("reg").agg(max("mx").as("mx"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 45 - mx)")).as("s"),
        count(lit(1)).as("n")).collect().head
    val expected = perLang.getLong(0) + (256L - perLang.getLong(1)) *
      35184372088832L
    assert(sk("ALL") == expected)
  }

  test("snapshot diff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("doc_id", "text")
    val neu = Seq((2L, "b"), (3L, "c2"), (4L, "d"))
      .toDF("doc_id", "text")
    val got = CorpusOps.snapshotDiff(old, neu)
      .select("doc_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("PPS sample selects exactly the n smallest priorities") {
    val n = 16
    val sample = CorpusOps.ppsSample(docs, n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sample.size == n)
    // recompute all priorities with the same program, no limit
    val full = {
      val w = docs.agg(sum(col("n_chars")).as("w_total"))
      docs.select(col("doc_id"), col("n_chars"),
        conv(substring(md5(col("doc_id").cast("string").cast("binary")),
          1, 13), 16, 10).cast("long").as("u_num"))
        .crossJoin(broadcast(w))
        .withColumn("priority",
          (col("u_num").cast("double") / lit(4503599627370496.0)) /
            ((lit(n.toDouble) * col("n_chars").cast("double")) /
              col("w_total").cast("double")))
        .orderBy("priority", "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).take(n).toSet
    }
    assert(sample == full)
  }

  test("PPS sampling is weight-biased: heavy rows dominate the sample") {
    import spark.implicits._
    val fixture = ((0 until 10).map(i => (i.toLong, 1000L)) ++
      (10 until 100).map(i => (i.toLong, 1L))).toDF("doc_id", "n_chars")
    val picked = CorpusOps.ppsSample(fixture, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val heavy = picked.count(_ < 10)
    assert(heavy >= 9, s"expected >=9 of 10 heavy rows, got $heavy: $picked")
  }

  test("PPS sample is deterministic across runs") {
    val a = CorpusOps.ppsSample(docs, 32).collect().toSeq
    val b = CorpusOps.ppsSample(docs, 32).collect().toSeq
    assert(a == b)
  }

  test("incremental dedup: carried/matched/new verdicts on a constructed " +
      "fixture; v1 canonicals are frozen") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "a"), (5L, "b"), (10L, "x"))
      .toDF("doc_id", "text")
    val v2 = Seq((2L, "a"),   // unchanged -> carried, group 1
      (3L, "a"),              // new doc, v1 content -> matched_v1, group 1
      (4L, "c"),              // new content -> new_group, canonical 4
      (5L, "b2"),             // changed -> new_group, canonical 5
      (0L, "x")               // smaller id than v1's 10 -> STILL group 10
    ).toDF("doc_id", "text")
    val got = CorpusOps.incrementalDedup(v1, v2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got == Map(
      2L -> ((1L, "carried")),
      3L -> ((1L, "matched_v1")),
      4L -> ((4L, "new_group")),
      5L -> ((5L, "new_group")),
      0L -> ((10L, "matched_v1"))))
  }

  test("incremental dedup equals the closed-form priority rule on the " +
      "corpus snapshots") {
    val v1 = CorpusOps.simulatedV1(docs)
    val v2 = CorpusOps.simulatedV2(docs)
    val inc = CorpusOps.incrementalDedup(v1, v2)
      .select("doc_id", "canonical").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // closed form: canonical(h) = coalesce(min over v1, min over delta)
    val v1h = v1.select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val v2h = v2.select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val v1min = v1h.groupBy(_._2).map { case (h, xs) => h -> xs.map(_._1).min }
    val v1set = v1h.toSet
    val deltaMin = v2h.filterNot(v1set.contains).groupBy(_._2)
      .map { case (h, xs) => h -> xs.map(_._1).min }
    val expected = v2h.map { case (id, h) =>
      id -> v1min.getOrElse(h, deltaMin(h))
    }.toMap
    assert(inc == expected)
    assert(inc.size == v2h.length)
  }
}
