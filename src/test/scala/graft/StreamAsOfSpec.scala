package graft

import graft.streaming.{AsOfMatch, StampedRow, StreamAsOf}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming as-of must equal the batch as-of operator no matter how
  * the (ts-ordered) input splits into micro-batches — the invariant that
  * lets the same query run over the live stream and the backfill. */
class StreamAsOfSpec extends SparkSpec {

  private lazy val rows: Seq[StampedRow] = Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"),
      expr("ts DIV 1000").as("ts_us"), col("value"), col("event_type"))
    .collect()
    .map(r => StampedRow(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getString(4) == "purchase"))
    .sortBy(r => (r.ts_us, r.event_id))

  private lazy val batchExpected: Map[Long, (Option[Long], Option[Double])] = {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("ts_us"), col("value"), col("event_type"))
    graft.operators.AsOf.asofJoin(
        ev.drop("event_type", "value"),
        ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts_us", "value"),
        Seq("user_id"), "ts_us")
      .collect()
      .map { r =>
        val i = r.fieldIndex("asof_ts_us"); val j = r.fieldIndex("asof_value")
        r.getLong(r.fieldIndex("event_id")) ->
          ((if (r.isNullAt(i)) None else Some(r.getLong(i)),
            if (r.isNullAt(j)) None else Some(r.getDouble(j))))
      }.toMap
  }

  private def runStream(batches: Seq[Seq[StampedRow]], name: String)
      : Map[Long, (Option[Long], Option[Double])] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StampedRow]
    val q = StreamAsOf.latestStateMatches(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[AsOfMatch].collect()
      .map(m => m.event_id -> ((m.asof_ts_us, m.asof_value))).toMap
  }

  test("one mega-batch equals the batch as-of operator") {
    assert(runStream(Seq(rows), "asof_one") == batchExpected)
  }

  test("ts-ordered micro-batch splits leave the result invariant") {
    for (n <- Seq(3, 17)) {
      val size = math.max(1, rows.length / n)
      val batches = rows.grouped(size).toSeq
      assert(runStream(batches, s"asof_split_$n") == batchExpected,
        s"split into ${batches.size} micro-batches diverged")
    }
  }

  test("a purchase matches itself (inclusive bound) and state persists " +
      "across batches") {
    val r = Seq(
      StampedRow(1L, 7L, 100L, 5.0, is_right = true),
      StampedRow(2L, 7L, 100L, 0.0, is_right = false), // equal ts: sees it
      StampedRow(3L, 7L, 250L, 0.0, is_right = false),
      StampedRow(4L, 8L, 50L, 0.0, is_right = false))  // other key: nothing
    val got = runStream(Seq(r.take(2), r.drop(2)), "asof_edge")
    assert(got(1L) == ((Some(100L), Some(5.0))), "right row probes itself")
    assert(got(2L) == ((Some(100L), Some(5.0))), "equal-ts probe is inclusive")
    assert(got(3L) == ((Some(100L), Some(5.0))), "state survives the batch cut")
    assert(got(4L) == ((None, None)))
  }

  test("tolerance twin equals the batch asofJoinTolerance across splits " +
      "and keeps state beyond the staleness horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val tol = 3600000000L
    val batchTol: Map[Long, (Option[Long], Option[Double])] = {
      val ev = Tables.events(spark, sf)
        .select(col("event_id"), col("user_id"),
          expr("ts DIV 1000").as("ts_us"), col("value"), col("event_type"))
      graft.operators.AsOf.asofJoinTolerance(
          ev.drop("event_type", "value"),
          ev.filter(col("event_type") === "purchase")
            .select("user_id", "ts_us", "value"),
          Seq("user_id"), "ts_us", tol)
        .collect()
        .map { r =>
          val i = r.fieldIndex("asof_ts_us"); val j = r.fieldIndex("asof_value")
          r.getLong(r.fieldIndex("event_id")) ->
            ((if (r.isNullAt(i)) None else Some(r.getLong(i)),
              if (r.isNullAt(j)) None else Some(r.getDouble(j))))
        }.toMap
    }
    assert(batchTol.values.exists(_._1.isEmpty) &&
      batchTol.values.exists(_._1.nonEmpty),
      "fixture must exercise both fresh and stale answers")
    for (n <- Seq(1, 13)) {
      val size = math.max(1, rows.length / n)
      val input = MemoryStream[StampedRow]
      val q = StreamAsOf.latestStateMatchesTolerance(input.toDS(), tol)
        .writeStream.format("memory").queryName(s"asof_tol_$n")
        .outputMode("append").start()
      try rows.grouped(size).foreach { b =>
        input.addData(b); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(s"asof_tol_$n").as[AsOfMatch].collect()
        .map(m => m.event_id -> ((m.asof_ts_us, m.asof_value))).toMap
      assert(got == batchTol, s"tolerance twin diverged at split $n")
    }
    // staleness gates the ANSWER, not the state: a probe inside the
    // horizon of an old-but-only state still matches after a long gap
    val r2 = Seq(
      StampedRow(1L, 42L, 1000L, 9.0, is_right = true),
      StampedRow(2L, 42L, 1000L + tol + 1, 0.0, is_right = false), // stale
      StampedRow(3L, 42L, 1000L + tol + 2, 5.0, is_right = true),
      StampedRow(4L, 42L, 1500L + tol, 0.0, is_right = false))     // fresh
    val input2 = MemoryStream[StampedRow]
    val q2 = StreamAsOf.latestStateMatchesTolerance(input2.toDS(), tol)
      .writeStream.format("memory").queryName("asof_tol_edge")
      .outputMode("append").start()
    try r2.grouped(1).foreach { b => input2.addData(b); q2.processAllAvailable() }
    finally q2.stop()
    val got2 = spark.table("asof_tol_edge").as[AsOfMatch].collect()
      .map(m => m.event_id -> ((m.asof_ts_us, m.asof_value))).toMap
    assert(got2(2L) == ((None, None)), "stale state must answer nulls")
    assert(got2(4L) == ((Some(1000L + tol + 2), Some(5.0))),
      "a later state refresh answers fresh again")
  }

  test("equal-ts tie across a batch cut: state-first order matches batch; " +
      "probe-first is excluded by contract and pinned") {
    val state = StampedRow(10L, 9L, 500L, 7.0, is_right = true)
    val probe = StampedRow(11L, 9L, 500L, 0.0, is_right = false)
    val later = StampedRow(12L, 9L, 600L, 0.0, is_right = false)
    // contract-conforming split (state row in the earlier batch): the
    // equal-ts probe sees it, same as the batch operator's <= bound
    val ok = runStream(Seq(Seq(state), Seq(probe)), "asof_tie_ok")
    assert(ok(11L) == ((Some(500L), Some(7.0))))
    // contract VIOLATION (probe-first split of the tie): the probe is
    // answered from the prior state — exactly-one-answer Append
    // semantics cannot hold it for a tie that may never arrive. The
    // late equal-ts state row still applies to later probes (monotonic
    // guard keeps it), so the divergence is confined to the tied probe.
    val v = runStream(Seq(Seq(probe), Seq(state), Seq(later)), "asof_tie_v")
    assert(v(11L) == ((None, None)),
      "probe-first tie answers pre-state (documented contract exclusion)")
    assert(v(12L) == ((Some(500L), Some(7.0))),
      "late equal-ts state still applies forward")
  }

  private def runHoldback(batches: Seq[Seq[StampedRow]], name: String)
      : Map[Long, (Option[Long], Option[Double])] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StampedRow]
    val q = StreamAsOf.latestStateMatchesHoldback(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[AsOfMatch].collect()
      .map(m => m.event_id -> ((m.asof_ts_us, m.asof_value))).toMap
  }

  test("hold-back variant: the probe-first equal-ts split matches the " +
      "batch operator WITHOUT the producer-ordering contract") {
    val state = StampedRow(10L, 9L, 500L, 7.0, is_right = true)
    val probe = StampedRow(11L, 9L, 500L, 0.0, is_right = false)
    val later = StampedRow(12L, 9L, 600L, 0.0, is_right = false)
    val flush = StampedRow(99L, 9L, 700L, 0.0, is_right = false)
    // the contract-violating split: probe lands a batch BEFORE its
    // equal-ts state row — held at the frontier, it is answered only
    // after the tie resolves, now WITH the state row (inclusive bound)
    val got = runHoldback(
      Seq(Seq(probe), Seq(state), Seq(later), Seq(flush)), "asof_hb_tie")
    assert(got(11L) == ((Some(500L), Some(7.0))),
      "held probe must see the late equal-ts state row")
    assert(got(10L) == ((Some(500L), Some(7.0))),
      "the state row's own probe answers itself")
    assert(got(12L) == ((Some(500L), Some(7.0))))
    assert(!got.contains(99L),
      "the frontier probe stays held until a later row arrives")
    // corpus-wide: any ts-ordered split equals the batch operator once a
    // per-key sentinel advances every frontier (production: watermark
    // timeout). Sentinels are excluded from the comparison.
    val maxTs = rows.map(_.ts_us).max
    val sentinels = rows.map(_.user_id).distinct.zipWithIndex.map {
      case (u, i) => StampedRow(-1000L - i, u, maxTs + 1, 0.0,
        is_right = false)
    }
    for (n <- Seq(1, 11)) {
      val size = math.max(1, rows.length / n)
      val batches = rows.grouped(size).toSeq :+ sentinels
      val hb = runHoldback(batches, s"asof_hb_$n").filter(_._1 >= 0)
      assert(hb == batchExpected, s"hold-back diverged at split $n")
    }
  }

  private def runFlush(batches: Seq[Seq[StampedRow]], delay: String,
      name: String): Map[Long, (Option[Long], Option[Double])] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StampedRow]
    val q = StreamAsOf.latestStateMatchesHoldbackFlush(input.toDS(), delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[AsOfMatch].collect()
      .map(m => m.event_id -> ((m.asof_ts_us, m.asof_value))).toMap
  }

  test("watermark-flushed hold-back: the frontier-only tail the " +
      "sentinel-free mode never emits flushes on EventTimeTimeout, " +
      "with the tie repair intact") {
    val state = StampedRow(10L, 9L, 500000L, 7.0, is_right = true)
    val probe = StampedRow(11L, 9L, 500000L, 0.0, is_right = false)
    val later = StampedRow(12L, 9L, 600000L, 0.0, is_right = false)
    val mover = StampedRow(20L, 8L, 100000000L, 0.0, is_right = false)
    val batches = Seq(Seq(probe), Seq(state), Seq(later), Seq(mover))
    // sentinel-free mode: key 9's frontier row (12) is never emitted
    val noFlush = runHoldback(batches, "asof_fl_red")
    assert(!noFlush.contains(12L),
      "red half: sentinel-free mode must hold the frontier-only tail")
    // watermark mode: key 8's far-later row advances the watermark past
    // key 9's frontier; the timeout flushes it — and the probe-first
    // equal-ts tie is still repaired (the contract-free guarantee)
    val got = runFlush(batches, "1 millisecond", "asof_fl_tail")
    assert(got(11L) == ((Some(500000L), Some(7.0))),
      "held probe must still see the late equal-ts state row")
    assert(got(12L) == ((Some(500000L), Some(7.0))),
      "green half: the frontier-only tail must flush on timeout")
    assert(!got.contains(20L),
      "the watermark-driving key's own frontier stays held")
  }

  test("watermark-flushed hold-back equals the batch program — as-of " +
      "join over finalized prefix ∪ watermark-flushed frontier — at " +
      "any ts-ordered split") {
    val delayMs = 8L * 3600 * 1000 // 8h: splits the fixture's frontiers
    val gmaxMs = rows.map(_.ts_us).max / 1000
    val frontier = rows.groupBy(_.user_id).view
      .mapValues(_.map(_.ts_us).max).toMap
    // fire condition pinned by the engine: timeout (frontier_ms + 1)
    // strictly below the final watermark (gmax_ms - delay_ms)
    val flushed = frontier.filter {
      case (_, f) => f / 1000 + 1 < gmaxMs - delayMs
    }.keySet
    assert(flushed.nonEmpty && flushed.size < frontier.size,
      s"fixture must exercise both flushed and held keys ($flushed)")
    val expIds = rows.filter(r =>
      r.ts_us < frontier(r.user_id) || flushed(r.user_id))
      .map(_.event_id).toSet
    val exp = batchExpected.view.filterKeys(expIds).toMap
    // the registered s12 batch program IS this set
    val s12 = graft.streaming.StreamQueries.s12.fn(spark, sf).collect()
      .map { r =>
        val i = r.fieldIndex("asof_ts_us"); val j = r.fieldIndex("asof_value")
        r.getLong(r.fieldIndex("event_id")) ->
          ((if (r.isNullAt(i)) None else Some(r.getLong(i)),
            if (r.isNullAt(j)) None else Some(r.getDouble(j))))
      }.toMap
    assert(s12 == exp, "registered s12 must equal the flush set")
    for (n <- Seq(1, 7)) {
      val size = math.max(1, rows.length / n)
      val got = runFlush(rows.grouped(size).toSeq, "8 hours",
        s"asof_fl_split_$n")
      assert(got == exp, s"watermark flush diverged at split $n")
    }
  }

  test("hold-back stream WITHOUT a sentinel emits exactly the finalized " +
      "prefix — the registered s11 batch program — at any split") {
    val s11 = graft.streaming.StreamQueries.s11.fn(spark, sf).collect()
      .map { r =>
        val i = r.fieldIndex("asof_ts_us"); val j = r.fieldIndex("asof_value")
        r.getLong(r.fieldIndex("event_id")) ->
          ((if (r.isNullAt(i)) None else Some(r.getLong(i)),
            if (r.isNullAt(j)) None else Some(r.getDouble(j))))
      }.toMap
    for (n <- Seq(1, 7)) {
      val size = math.max(1, rows.length / n)
      val hb = runHoldback(rows.grouped(size).toSeq, s"asof_hb_fin_$n")
      assert(hb == s11, s"finalized prefix diverged at split $n")
    }
    // the prefix is a strict subset: the per-key frontier rows are held
    assert(s11.size < rows.length,
      "fixture must leave frontier rows held (else the pin is vacuous)")
  }
}
