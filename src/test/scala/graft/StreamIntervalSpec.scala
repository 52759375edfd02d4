package graft

import graft.streaming.{IntervalMatch, StampedRow, StreamAsOf}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming interval aggregate must equal the batch bucketed
  * interval join regardless of micro-batch splits, and its per-key state
  * must actually stay bounded by the lookback window. */
class StreamIntervalSpec extends SparkSpec {

  private val lb = 86400000000L

  private lazy val rows: Seq[StampedRow] = Tables.events(spark, sf)
    .filter(col("event_type").isin("purchase", "click"))
    .select(col("event_id"), col("user_id"),
      expr("ts DIV 1000").as("ts_us"), col("value"), col("event_type"))
    .collect()
    .map(r => StampedRow(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getString(4) == "click"))
    .sortBy(r => (r.ts_us, r.event_id))

  private lazy val batchExpected: Map[Long, (Long, Long, Option[Long])] = {
    val clicks = rows.filter(_.is_right)
      .map(r => (r.user_id, r.ts_us, (r.value * 100).toLong))
      .groupBy(_._1)
    rows.filterNot(_.is_right).map { p =>
      val in = clicks.getOrElse(p.user_id, Seq.empty)
        .filter { case (_, t, _) => t >= p.ts_us - lb && t < p.ts_us }
      p.event_id -> ((in.size.toLong, in.map(_._3).sum,
        in.map(_._2).maxOption.map(p.ts_us - _)))
    }.toMap
  }

  private def runStream(batches: Seq[Seq[StampedRow]], name: String)
      : Map[Long, (Long, Long, Option[Long])] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StampedRow]
    val q = StreamAsOf.windowAggMatches(input.toDS(), lb)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[IntervalMatch].collect()
      .map(m => m.event_id -> ((m.n_clicks, m.click_cents, m.last_gap_us)))
      .toMap
  }

  test("one mega-batch equals the brute-force window aggregate") {
    val got = runStream(Seq(rows), "iv_one")
    assert(got == batchExpected)
    assert(batchExpected.values.exists(_._1 > 0),
      "fixture should contain in-window clicks")
    assert(batchExpected.values.exists(_._1 == 0),
      "fixture should contain empty-window probes")
  }

  test("ts-ordered micro-batch splits leave the result invariant") {
    for (n <- Seq(5, 23)) {
      val size = math.max(1, rows.length / n)
      assert(runStream(rows.grouped(size).toSeq, s"iv_split_$n")
        == batchExpected, s"split $n diverged")
    }
  }

  test("matches the REGISTERED batch program (s06) row for row") {
    val batch = graft.streaming.StreamQueries.s06.fn(spark, sf).collect()
      .map { r =>
        val i = r.fieldIndex("last_gap_us")
        r.getLong(0) -> ((r.getLong(3), r.getLong(4),
          if (r.isNullAt(i)) None else Some(r.getLong(i))))
      }.toMap
    assert(batch == batchExpected)
  }

  test("state prunes to the lookback window and the strict bounds hold") {
    val r = Seq(
      StampedRow(1L, 7L, 1000L, 2.0, is_right = true),   // click
      StampedRow(2L, 7L, 1000L + lb, 0.0, is_right = false), // exactly lb: in
      StampedRow(3L, 7L, 2000L + lb, 0.0, is_right = false), // aged out
      StampedRow(4L, 7L, 3000L + lb, 3.0, is_right = true),
      StampedRow(5L, 7L, 3000L + lb, 0.0, is_right = false)) // same ts: out
    val got = runStream(r.grouped(2).toSeq, "iv_edges")
    assert(got(2L) == ((1L, 200L, Some(lb))),
      "window start is inclusive at exactly ts - lookback")
    assert(got(3L) == ((0L, 0L, None)), "click beyond lookback must age out")
    assert(got(5L) == ((0L, 0L, None)),
      "a click at the probe's own ts is strictly-before-excluded")
  }
}
