package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"),
      expr("ts DIV 1000").as("ts_us"), col("value"), col("event_type"))
    .cache()

  test("asofJoin matches a brute-force latest-at-or-before lookup") {
    val left = events.filter($"event_type" === "purchase")
      .select("event_id", "user_id", "ts_us", "value")
    val right = events.filter($"event_type" === "click")
      .select("user_id", "ts_us", "value")
    val got = AsOf.asofJoin(left, right, Seq("user_id"), "ts_us")
      .collect()
      .map(r => r.getLong(r.fieldIndex("event_id")) ->
        ((Option(r.get(r.fieldIndex("asof_ts_us"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("asof_value")))
            .map(_.asInstanceOf[Double]))))
      .toMap
    val clicks = right.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val exp = left.collect().map { r =>
      val (id, u, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val m = clicks.getOrElse(u, Array.empty).filter(_._2 <= t)
      id -> (if (m.isEmpty) (None, None)
             else { val best = m.maxBy(_._2); (Some(best._2), Some(best._3)) })
    }.toMap
    assert(got == exp)
    assert(exp.values.exists(_._1.isEmpty), "fixture should have unmatched rows")
    assert(exp.values.exists(_._1.nonEmpty), "fixture should have matched rows")
  }

  test("asofJoin is inclusive at equal ts and a null payload FIELD survives") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 150L), (3L, 20L, 50L))
      .toDF("event_id", "user_id", "ts_us")
    // user 10: a right row exactly at ts=100 (must match row 1), whose
    // payload value is NULL (must come back as a matched-but-null field,
    // NOT fall through to the earlier ts=40 row); user 20: only later rows.
    val right = Seq((10L, 40L, Some(7.0)), (10L, 100L, None),
        (20L, 60L, Some(9.0)))
      .toDF("user_id", "ts_us", "value")
    val got = AsOf.asofJoin(left, right, Seq("user_id"), "ts_us")
      .orderBy("event_id").collect()
    assert(got(0).getLong(got(0).fieldIndex("asof_ts_us")) == 100L)
    assert(got(0).isNullAt(got(0).fieldIndex("asof_value")),
      "the matched row's own null field must survive, not be skipped")
    assert(got(1).getLong(got(1).fieldIndex("asof_ts_us")) == 100L)
    assert(got(2).isNullAt(got(2).fieldIndex("asof_ts_us")),
      "no right row at-or-before ts=50 for user 20")
  }

  test("intervalPairs equals the brute-force range predicate, each pair once") {
    val left = events.filter($"event_type" === "purchase")
      .select("event_id", "user_id", "ts_us")
    val right = events.filter($"event_type" === "click")
      .select("user_id", "ts_us", "value")
    val lb = 86400000000L
    val got = AsOf.intervalPairs(left, right, Seq("user_id"), "ts_us", lb)
      .select("event_id", "__rts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val clicks = right.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
    val exp = left.collect().flatMap { r =>
      val (id, u, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
      clicks.getOrElse(u, Array.empty)
        .filter { case (_, rt) => rt >= t - lb && rt < t }
        .map { case (_, rt) => (id, rt) }
    }.toSeq.sorted
    assert(got == exp)
    assert(got == got.distinct, "two-bucket probe must not duplicate pairs")
    assert(exp.nonEmpty, "fixture should produce in-window pairs")
  }

  test("intervalPairs buckets negative timestamps with floor division") {
    // ts -1 and -10 sit in bucket -1 under floor division but bucket 0
    // under DIV truncation — the truncated form would miss the (-1 left,
    // -10 right) in-window pair whenever left lands in true bucket 0
    val left = Seq((1L, 5L, -1L), (2L, 5L, 5L), (3L, 5L, 95L))
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq((5L, -10L, 1.0), (5L, -99L, 2.0), (5L, 4L, 3.0))
      .toDF("user_id", "ts_us", "value")
    val got = AsOf.intervalPairs(left, right, Seq("user_id"), "ts_us", 100L)
      .select("event_id", "__rts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val exp = Seq( // brute force over the strict [t-100, t) window
      (1L, -10L), (1L, -99L),         // -1: window [-101, -1)
      (2L, -10L), (2L, -99L), (2L, 4L), // 5: window [-95, 5) — -99 out
      (3L, 4L)).filter { case (id, rt) =>
        val t = Map(1L -> -1L, 2L -> 5L, 3L -> 95L)(id)
        rt >= t - 100L && rt < t
      }.sorted
    assert(got == exp, s"got $got expected $exp")
  }

  test("intervalPairs rejects non-positive lookback; both joins reject " +
      "reserved column names") {
    val l = Seq((1L, 5L, 10L)).toDF("event_id", "user_id", "ts_us")
    val r = Seq((5L, 5L, 1.0)).toDF("user_id", "ts_us", "value")
    intercept[IllegalArgumentException] {
      AsOf.intervalPairs(l, r, Seq("user_id"), "ts_us", 0L)
    }
    intercept[IllegalArgumentException] {
      AsOf.intervalPairs(l.withColumn("__bkt", lit(1)), r,
        Seq("user_id"), "ts_us", 10L)
    }
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(l, r.withColumn("__side", lit(0)),
        Seq("user_id"), "ts_us")
    }
    intercept[IllegalArgumentException] { // generated-name collision
      AsOf.asofJoin(l.withColumn("asof_value", lit(1)), r,
        Seq("user_id"), "ts_us")
    }
  }

  test("asofJoinTolerance nulls stale matches as a unit") {
    val left = Seq((1L, 5L, 100L), (2L, 5L, 500L), (3L, 6L, 100L))
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq((5L, 90L, 7.0)).toDF("user_id", "ts_us", "value")
    val got = AsOf.asofJoinTolerance(left, right, Seq("user_id"), "ts_us",
        tolerance = 50L)
      .orderBy("event_id").collect()
    def isNull(i: Int, c: String) = got(i).isNullAt(got(i).fieldIndex(c))
    assert(!isNull(0, "asof_ts_us") && !isNull(0, "asof_value"),
      "fresh match (gap 10 <= 50) must survive")
    assert(isNull(1, "asof_ts_us") && isNull(1, "asof_value"),
      "stale match (gap 410 > 50) must null BOTH asof columns")
    assert(isNull(2, "asof_ts_us"), "unmatched key stays null")
    intercept[IllegalArgumentException] {
      AsOf.asofJoinTolerance(left, right, Seq("user_id"), "ts_us", 0L)
    }
  }

  test("asofJoin picks a deterministic duplicate at equal right (key, ts)") {
    val left = Seq((1L, 5L, 100L)).toDF("event_id", "user_id", "ts_us")
    // two DIFFERENT right rows at the same (key, ts): the xxhash64
    // tie-break must pick the same one on every run/partitioning
    val right = Seq((5L, 100L, 1.0), (5L, 100L, 2.0), (5L, 40L, 9.0))
      .toDF("user_id", "ts_us", "value")
    def run() = AsOf.asofJoin(left, right, Seq("user_id"), "ts_us")
      .select("asof_value").head().getDouble(0)
    val first = run()
    assert(Seq(1.0, 2.0).contains(first))
    assert((1 to 3).forall(_ => run() == first), "tie pick must be stable")
    val rep = AsOf.asofJoin(left, right.repartition(7), Seq("user_id"),
      "ts_us").select("asof_value").head().getDouble(0)
    assert(rep == first, "tie pick must not depend on partitioning")
  }
}
