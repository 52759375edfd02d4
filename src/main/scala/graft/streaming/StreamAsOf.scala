package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event row entering the streaming as-of: `is_right` marks rows that
  * UPDATE the per-key state (e.g. purchases) — every row, right or not,
  * is also a probe that gets the state as of its own timestamp. */
case class StampedRow(event_id: Long, user_id: Long, ts_us: Long,
    value: Double, is_right: Boolean)

case class AsOfMatch(event_id: Long, user_id: Long, ts_us: Long,
    asof_ts_us: Option[Long], asof_value: Option[Double])

/** [[StampedRow]] plus the event-time column the watermark rides on —
  * the input shape of the watermark-flushed hold-back variant. */
case class StampedRowT(event_id: Long, user_id: Long, ts_us: Long,
    value: Double, is_right: Boolean, event_time: java.sql.Timestamp)

/** Streaming as-of join — the online form of `operators.AsOf.asofJoin`:
  * attach to every arriving event the latest state row (right side) of
  * the same key with state.ts <= event.ts. The reference maintains
  * exactly this shape imperatively (latest-state tables upserted per
  * block, read by point lookups); here it is Structured Streaming keyed
  * state: per key, ONE (ts, value) pair — O(keys) state total,
  * independent of stream length, where the batch operator's window
  * would need the whole history.
  *
  * A right row takes effect BEFORE its own probe is answered
  * (update-then-emit), which is the inclusive <= bound — identical to
  * the batch operator's (ts, side) ordering and DuckDB's ASOF
  * semantics. Within a micro-batch rows process in (ts_us, event_id)
  * order; across batches the per-key monotonic-max guard makes a late
  * STATE row inert rather than corrupting (state only moves forward),
  * matching the at-or-before contract as long as each key's rows
  * arrive in ts order across batches — the same ordered-replay
  * assumption s04's first-seen dedup documents.
  *
  * EQUAL-TS TIES ACROSS BATCHES: the ordered-arrival contract must be
  * read as rights-before-probes at equal ts. Within one batch the sort
  * enforces that; if a batch boundary splits an equal-ts (probe, state)
  * pair PROBE-FIRST, the probe is answered with the previous state (the
  * equal-ts state row was not yet known), diverging from the batch
  * operator's inclusive bound. Exactly-one-answer-per-probe semantics
  * (Append mode, no watermark) forbid holding probes for a tie that may
  * never come, so the divergence is excluded by contract instead:
  * producers must emit an equal-ts state row in the same or an earlier
  * batch than its probes — the natural order when both derive from one
  * upstream event. StreamAsOfSpec pins both sides of the contract. */
case class IntervalMatch(event_id: Long, user_id: Long, ts_us: Long,
    n_clicks: Long, click_cents: Long, last_gap_us: Option[Long])

object StreamAsOf {

  /** Streaming interval aggregate — the online form of
    * `operators.AsOf.intervalPairs` + its group-by: every PROBE row
    * (is_right = false) is answered with the count / cent-exact sum /
    * most-recent-gap of the key's STATE rows (is_right = true) in the
    * strictly-before window [probe.ts − lookback, probe.ts). Per-key
    * state is the (ts, cents) ring of the last `lookback` microseconds
    * — pruned against the key's max seen ts each batch, so state is
    * bounded by per-key activity within one window, the exact bound
    * Structured Streaming's own interval joins hold, NOT stream length.
    * Probes process BEFORE state rows at equal ts (the strict < bound —
    * mirror image of the as-of's inclusive ordering). Cents are cast
    * per click, matching the batch/oracle truncation order. */
  def windowAggMatches(rows: Dataset[StampedRow], lookback: Long)
      : Dataset[IntervalMatch] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Vector[(Long, Long)]), IntervalMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[StampedRow],
            state: GroupState[(Long, Vector[(Long, Long)])]) =>
          var (maxTs, buf) = state.getOption.getOrElse(
            (Long.MinValue, Vector.empty[(Long, Long)]))
          val out = it.toSeq
            .sortBy(r => (r.ts_us, r.is_right, r.event_id)).flatMap { r =>
              maxTs = math.max(maxTs, r.ts_us)
              if (r.is_right) {
                buf :+= ((r.ts_us, (r.value * 100).toLong)); None
              } else {
                val in = buf.filter { case (t, _) =>
                  t >= r.ts_us - lookback && t < r.ts_us }
                Some(IntervalMatch(r.event_id, r.user_id, r.ts_us,
                  in.size.toLong, in.map(_._2).sum,
                  in.map(_._1).maxOption.map(r.ts_us - _)))
              }
            }
          buf = buf.filter(_._1 >= maxTs - lookback)
          state.update((maxTs, buf))
          out.iterator
      }
  }

  /** Tolerance-bounded streaming as-of — the online form of
    * `operators.AsOf.asofJoinTolerance`: identical O(keys) state to
    * [[latestStateMatches]], but a probe whose state is older than
    * `tolerance` microseconds answers (None, None), both fields as a
    * unit. The state itself is still retained un-aged (a fresh state
    * row may arrive later; only the ANSWER is staleness-gated), so
    * state size and the ordered-arrival contract are unchanged. */
  def latestStateMatchesTolerance(rows: Dataset[StampedRow],
      tolerance: Long): Dataset[AsOfMatch] = {
    require(tolerance > 0, s"tolerance must be positive, got $tolerance")
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), AsOfMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[StampedRow],
            state: GroupState[(Long, Double)]) =>
          var cur: Option[(Long, Double)] = state.getOption
          val out = it.toSeq
            .sortBy(r => (r.ts_us, !r.is_right, r.event_id)).map { r =>
            if (r.is_right && cur.forall(_._1 <= r.ts_us))
              cur = Some((r.ts_us, r.value))
            val fresh = cur.filter { case (t, _) => r.ts_us - t <= tolerance }
            AsOfMatch(r.event_id, r.user_id, r.ts_us,
              fresh.map(_._1), fresh.map(_._2))
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** Structural equal-ts hold-back variant (r12 verdict item 7): the
    * frontier rows of each key — those whose ts equals the key's max
    * seen ts, where an equal-ts state row could still arrive in a later
    * batch — are HELD in state un-answered and un-applied, and released
    * the first time a strictly-later row (state or probe) of the same
    * key arrives: under per-key ts-ordered arrival, a strictly-later row
    * proves no ts ≤ probe.ts state row remains upstream, so the answer
    * is final. This REMOVES [[latestStateMatches]]'s producer-ordering
    * contract for equal-ts ties (rights-before-probes across batches)
    * at the cost of answer latency: a frontier probe emits one batch
    * late, and a key's final probes emit only when a later row (or an
    * explicit sentinel flush — in production, a watermark-driven
    * timeout) advances its frontier. Held probes re-enter the ordered
    * replay each batch, so a tie split probe-first across batches is
    * answered WITH the late equal-ts state row — identical to the batch
    * operator's inclusive bound. State: O(keys) for the latest pair plus
    * the held frontier probes (bounded by per-key probes within one
    * frontier timestamp). */
  def latestStateMatchesHoldback(rows: Dataset[StampedRow])
      : Dataset[AsOfMatch] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[
        (Option[(Long, Double)], Vector[StampedRow]), AsOfMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[StampedRow],
            state: GroupState[(Option[(Long, Double)], Vector[StampedRow])]) =>
          var (cur, held) = state.getOption
            .getOrElse((Option.empty[(Long, Double)],
              Vector.empty[StampedRow]))
          // ALL frontier rows (rights and probes) are held un-applied and
          // re-enter the replay: their ts <= every new row's ts (ordered
          // arrival), so the (ts, rights-first, event_id) sort replays
          // them in the batch operator's order against any late
          // equal-ts arrivals — including re-sequencing equal-ts rights
          // by event_id across the batch cut
          val merged = (held ++ it.toSeq)
            .sortBy(r => (r.ts_us, !r.is_right, r.event_id))
          val maxTs = merged.lastOption.map(_.ts_us).getOrElse(Long.MinValue)
          val out = Vector.newBuilder[AsOfMatch]
          var nextHeld = Vector.empty[StampedRow]
          merged.foreach { r =>
            if (r.ts_us < maxTs) { // final: no ts <= r.ts row can follow
              if (r.is_right && cur.forall(_._1 <= r.ts_us))
                cur = Some((r.ts_us, r.value))
              out += AsOfMatch(r.event_id, r.user_id, r.ts_us,
                cur.map(_._1), cur.map(_._2))
            } else nextHeld :+= r // frontier: an equal-ts tie may follow
          }
          state.update((cur, nextHeld))
          out.result().iterator
      }
  }

  /** Watermark-driven production flush for [[latestStateMatchesHoldback]]
    * (r14 verdict item 4): the same hold-back state machine, but the
    * frontier releases on `GroupStateTimeout.EventTimeTimeout` instead
    * of an explicit per-key sentinel. Once the watermark passes a key's
    * frontier timestamp, no ts ≤ frontier row can arrive anymore (the
    * stateful operator drops input older than the watermark), so the
    * held rows are FINAL: the timeout invocation replays them in the
    * batch operator's (ts, rights-first, event_id) order, applies the
    * rights, and emits the answers. Output = the sentinel-free mode's
    * finalized prefix PLUS the timed-out frontier (StreamAsOfSpec pins
    * both, including the frontier-only tail the sentinel-free mode
    * never emits). `delay` is the watermark delay (e.g. "10 seconds"):
    * the lateness allowance within which the contract-free equal-ts tie
    * repair still works — rows later than that are dropped, the
    * standard watermark trade every Structured Streaming operator
    * makes. Timeout fires when the watermark moves STRICTLY past
    * frontier_ms + 1 (frontier floored to ms — Spark tracks watermarks
    * in milliseconds; the +1 covers equal-ms ties under the floor). */
  def latestStateMatchesHoldbackFlush(rows: Dataset[StampedRow],
      delay: String): Dataset[AsOfMatch] = {
    val sess = rows.sparkSession
    import sess.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val stamped = rows
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", delay)
      .as[StampedRowT]
    stamped.groupByKey(_.user_id)
      .flatMapGroupsWithState[
        (Option[(Long, Double)], Vector[StampedRow]), AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[StampedRowT],
            state: GroupState[(Option[(Long, Double)], Vector[StampedRow])]) =>
          var (cur, held) = state.getOption
            .getOrElse((Option.empty[(Long, Double)],
              Vector.empty[StampedRow]))
          val out = Vector.newBuilder[AsOfMatch]
          def replay(r: StampedRow): Unit = {
            if (r.is_right && cur.forall(_._1 <= r.ts_us))
              cur = Some((r.ts_us, r.value))
            out += AsOfMatch(r.event_id, r.user_id, r.ts_us,
              cur.map(_._1), cur.map(_._2))
          }
          if (state.hasTimedOut) {
            // the watermark passed the frontier: the held rows are final
            held.sortBy(r => (r.ts_us, !r.is_right, r.event_id))
              .foreach(replay)
            state.update((cur, Vector.empty))
          } else {
            val merged = (held ++ it.map(t => StampedRow(t.event_id,
              t.user_id, t.ts_us, t.value, t.is_right)))
              .sortBy(r => (r.ts_us, !r.is_right, r.event_id))
            val maxTs =
              merged.lastOption.map(_.ts_us).getOrElse(Long.MinValue)
            var nextHeld = Vector.empty[StampedRow]
            merged.foreach { r =>
              if (r.ts_us < maxTs) replay(r)
              else nextHeld :+= r
            }
            state.update((cur, nextHeld))
            if (nextHeld.nonEmpty)
              // strictly-past-frontier fire point; a watermark already
              // beyond it flushes on the next (possibly no-data) batch
              state.setTimeoutTimestamp(
                math.max(nextHeld.head.ts_us / 1000 + 1,
                  state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }

  def latestStateMatches(rows: Dataset[StampedRow]): Dataset[AsOfMatch] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), AsOfMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[StampedRow],
            state: GroupState[(Long, Double)]) =>
          var cur: Option[(Long, Double)] = state.getOption
          // rights sort before probes at equal ts (the <= bound), then
          // event_id for a total order
          val out = it.toSeq
            .sortBy(r => (r.ts_us, !r.is_right, r.event_id)).map { r =>
            if (r.is_right && cur.forall(_._1 <= r.ts_us))
              cur = Some((r.ts_us, r.value))
            AsOfMatch(r.event_id, r.user_id, r.ts_us,
              cur.map(_._1), cur.map(_._2))
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
