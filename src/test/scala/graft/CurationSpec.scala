package graft

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  // ---------------------------------------------------------- d15

  test("decontamination matches a per-doc brute-force shingle intersect") {
    val base = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val bench = base.filter(col("doc_id") % 17 === 0)
    val corpus = base.filter(col("doc_id") % 17 =!= 0)
    val got = Curation.decontaminate(corpus, bench)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // brute force: one flattened benchmark shingle set, intersect per doc
    val benchSet = bench.select(explode(col("sh")).as("g"))
      .distinct().collect().map(_.getString(0)).toSet
    val exp = corpus.collect().map { r =>
      val sh = r.getSeq[String](1)
      r.getLong(0) -> (sh.count(benchSet).toLong, sh.size.toLong)
    }.toMap
    assert(got == exp)
    assert(exp.values.exists(_._1 > 0),
      "fixture should produce at least one benchmark overlap")
  }

  test("benchmark docs are excluded and the contaminated flag is the 0.5 ratio") {
    val out = Curation.d15.fn(spark, sf).collect()
    assert(out.forall(_.getLong(0) % 17 != 0))
    out.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(1) * 2 >= r.getLong(2)))
    }
  }

  // ---------------------------------------------------------- d16

  test("stratified sample is deterministic and respects per-stratum rates") {
    val a = Curation.stratifiedSample(docs, Curation.SampleRates)
      .orderBy("doc_id").collect().toSeq
    val b = Curation.stratifiedSample(docs, Curation.SampleRates)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    val keptByLang = a.groupBy(_.getString(1)).view.mapValues(_.size).toMap
    val totByLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Curation.SampleRates.foreach { case (lang, permille) =>
      val tot = totByLang.getOrElse(lang, 0L)
      val kept = keptByLang.getOrElse(lang, 0).toLong
      // binomial-ish tolerance on a small fixture: ±4·sqrt(n·p) + 2
      val expct = tot * permille / 1000.0
      val tol = 4 * math.sqrt(math.max(expct, 1.0)) + 2
      assert(math.abs(kept - expct) <= tol,
        s"$lang: kept $kept of $tot, expected ~$expct ±$tol")
    }
  }

  test("sample plan is a pure scan+filter: no exchange") {
    val plan = Curation.stratifiedSample(docs, Curation.SampleRates)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  // ---------------------------------------------------------- d17

  test("shard packing equals the single-window prefix sum, any bucket size") {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val expect = d.withColumn("cum_tokens",
        sum("n_tokens").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("shard_id", expr("(cum_tokens - n_tokens) DIV 2000"))
      .select("doc_id", "n_tokens", "cum_tokens", "shard_id")
      .orderBy("doc_id").collect().toSeq
    for (bucket <- Seq(1L, 7L, 4096L)) {
      val got = Curation.packShards(d, 2000L, bucket)
        .select("doc_id", "n_tokens", "cum_tokens", "shard_id")
        .orderBy("doc_id").collect().toSeq
      assert(got == expect, s"bucketSize=$bucket diverges")
    }
  }

  test("shards are contiguous, monotone, and hold ≤ budget + one doc") {
    val rows = Curation.d17.fn(spark, sf).collect()
    val shardIds = rows.map(_.getLong(3))
    assert(shardIds.sameElements(shardIds.sorted), "shard ids must be monotone")
    rows.groupBy(_.getLong(3)).foreach { case (sid, rs) =>
      val tot = rs.map(_.getLong(1)).sum
      val maxDoc = rs.map(_.getLong(1)).max
      assert(tot < 2000L + maxDoc, s"shard $sid holds $tot tokens")
    }
  }

  // ---------------------------------------------------------- d18

  test("scrub removes every blocklisted token, preserves count and order") {
    val out = Curation.scrub(docs, Curation.Blocklist).collect()
    val orig = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    assert(out.exists(_.getInt(1) > 0), "blocklist should hit the corpus")
    out.foreach { r =>
      val before = orig(r.getLong(0))
      val after = r.getString(2).split(" ", -1).toSeq
      assert(after.size == before.size)
      assert(!after.exists(Curation.Blocklist.contains(_)))
      assert(r.getInt(1) == before.count(Curation.Blocklist.contains(_)))
      before.zip(after).foreach { case (b, a) =>
        if (Curation.Blocklist.contains(b)) assert(a == "[REDACTED]")
        else assert(a == b)
      }
    }
  }
}
