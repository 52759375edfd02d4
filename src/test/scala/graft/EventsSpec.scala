package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  private lazy val purchases = Tables.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .select(col("user_id"), expr("ts DIV 1000").as("ts_us"), col("value"))
    .cache()

  test("ohlc downsample equals a per-bucket brute force") {
    val got = Events.ohlcDownsample(purchases, 86400000000L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    val exp = purchases.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy { case (u, t, _) => (u, t / 86400000000L) }
      .map { case (k, vs) =>
        val s = vs.sortBy(_._2)
        k -> ((vs.length.toLong, s.head._3, vs.map(_._3).max,
          vs.map(_._3).min, s.last._3))
      }
    assert(got == exp)
    assert(exp.values.exists(_._1 > 1),
      "fixture should contain multi-event buckets (open != close possible)")
  }

  test("pinned-values pivot: exact counts, zero-filled, one aggregate pass") {
    val ev = Tables.events(spark, sf).select("user_id", "event_type")
    val got = Events.pivotCounts(ev).collect()
      .map(r => r.getLong(0) -> (1 to 5).map(r.getLong).toSeq).toMap
    val raw = ev.collect().map(r => (r.getLong(0), r.getString(1)))
    val exp = raw.groupBy(_._1).map { case (u, xs) =>
      u -> Events.EventTypes.map(t => xs.count(_._2 == t).toLong)
    }
    assert(got == exp)
    // values-form pivot must not run a distinct pre-scan of the corpus:
    // the physical plan reads the source exactly once
    val p = Events.pivotCounts(ev).queryExecution.executedPlan.toString
    assert(!p.contains("CollectLimit"), "no driver-side category inference")
    assert("Scan".r.findAllIn(p).size <= 2, // FileSourceScan prints 1-2 lines
      s"pivot must scan the source once:\n${p.take(1200)}")
    purchases.unpersist()
    ()
  }
}
