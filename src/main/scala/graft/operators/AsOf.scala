package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins — the two shapes every event/state analytics engine
  * eventually needs and plain equi-joins can't express efficiently:
  *
  *  - AS-OF: attach to each left row the single latest right row with
  *    right.ts <= left.ts per key ("state as of this event"). The
  *    reference materializes this with latest-state tables refreshed per
  *    block (so point lookups are current-state only); the as-of join is
  *    the batch generalization that answers it for EVERY historical
  *    timestamp in one pass.
  *  - INTERVAL: aggregate the right rows inside a bounded lookback window
  *    before each left row ("activity in the hour before purchase") —
  *    the batch twin of a Structured Streaming interval join.
  *
  * Scale design: neither is a range JOIN (which Catalyst would plan as a
  * key-equi join with a post-filter — per-key quadratic on power keys, or
  * worse a BroadcastNestedLoop without the equi key). The as-of join is
  * the union-tag trick: ONE shuffle on the key, one ordered window scan,
  * O(n log n) per key and never a pair blowup. The interval join buckets
  * the right side by `lookback`-sized time buckets and probes exactly two
  * buckets per left row, so the pair count is bounded per (key, bucket)
  * — the same state-bounding idea streaming interval joins use — instead
  * of per key.
  */
object AsOf {

  /** Internal spine/marker columns injected by the two joins — caller
    * inputs must not collide with them (silent corruption otherwise). */
  private val ReservedCols = Set("__r", "__side", "__m", "__bkt", "__rts")

  private def requireNoReserved(dfCols: Seq[String], who: String): Unit = {
    val bad = dfCols.filter(ReservedCols)
    require(bad.isEmpty,
      s"$who input carries reserved column name(s) ${bad.mkString(", ")} — " +
        "rename them before the temporal join")
  }

  /** Floor division for the bucket math — `DIV` truncates toward zero,
    * which would put negative timestamps one bucket too high and
    * silently drop in-window pairs near the boundary. */
  private def floorDiv(ts: String, d: Long): String =
    s"(($ts DIV $d) - (CASE WHEN $ts < 0 AND $ts % $d != 0 THEN 1 ELSE 0 END))"

  /** As-of join: for each `left` row, the latest `right` row of the same
    * `keys` with `right.tsCol <= left.tsCol` (inclusive). Right columns
    * other than keys/ts come back prefixed `asof_`; unmatched left rows
    * keep nulls (LEFT ASOF semantics, DuckDB's default).
    *
    * Implementation: tag right rows side=0 and left rows side=1, union on
    * the shared (keys, ts) spine, and carry the right payload as ONE
    * nullable struct so a single `last(ignoreNulls)` running window
    * resolves every left row — null-valued payload FIELDS inside a
    * matched right row survive (the struct itself is the null marker, so
    * a legitimately-null field never makes the window skip past its row).
    * Ordering (ts, side) puts a right row before a left row at equal ts,
    * which is exactly the <= bound. One hash shuffle on `keys`, one sort,
    * zero joins. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String): DataFrame = {
    requireNoReserved(left.columns ++ right.columns, "asofJoin")
    val payload = right.columns.filterNot(c => keys.contains(c) || c == tsCol)
    require(payload.nonEmpty, "right side carries no payload columns")
    val leftOther = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val clash = leftOther.filter(c =>
      c == s"asof_$tsCol" || payload.exists(p => c == s"asof_$p"))
    require(clash.isEmpty,
      s"left column(s) ${clash.mkString(", ")} collide with generated " +
        "asof_-prefixed output names")
    val spine = keys.map(col) :+ col(tsCol)
    val rSel = right.select(spine ++
      leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      Seq(struct((tsCol +: payload).map(col): _*).as("__r"),
        lit(0).as("__side")): _*)
    val rType = rSel.schema("__r").dataType
    val lSel = left.select(spine ++ leftOther.map(col) ++
      Seq(lit(null).cast(rType).as("__r"), lit(1).as("__side")): _*)
    // (ts, side) puts rights before lefts at equal ts (the <= bound);
    // xxhash64(__r) breaks ties between duplicate right (keys, ts) rows
    // deterministically — without it, last() picks whichever duplicate
    // the sort happened to place last and the output can flake against
    // the oracle's (equally arbitrary but stable) pick. Identical
    // duplicates hash equal and remain interchangeable.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"), xxhash64(col("__r")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedCols: Seq[Column] =
      col("__m")(tsCol).as(s"asof_$tsCol") +:
        payload.map(c => col("__m")(c).as(s"asof_$c"))
    lSel.unionByName(rSel)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(spine ++ leftOther.map(col) ++ matchedCols: _*)
  }

  /** Bounded-lookback interval aggregate: for each `left` row, aggregate
    * the `right` rows of the same keys with
    * left.ts - lookback <= right.ts < left.ts. Returns the INNER pair
    * frame (left row columns + the matched right payload); callers group
    * it. Right rows land in ONE `lookback`-sized time bucket; each left
    * row probes its own bucket and the previous one, so every qualifying
    * pair appears exactly once and the join never compares rows more than
    * one bucket apart — per-(key, bucket) pair bounds instead of per-key
    * quadratic on power keys. */
  def intervalPairs(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, lookback: Long): DataFrame = {
    require(lookback > 0, s"lookback must be positive, got $lookback")
    requireNoReserved(left.columns ++ right.columns, "intervalPairs")
    val payload = right.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val clash = left.columns.filter(c => payload.exists(p => c == s"r_$p"))
    require(clash.isEmpty,
      s"left column(s) ${clash.mkString(", ")} collide with generated " +
        "r_-prefixed right payload names")
    val bkt = floorDiv(tsCol, lookback)
    val r = right.select(keys.map(col) ++
      Seq(col(tsCol).as("__rts"), expr(bkt).as("__bkt")) ++
      payload.map(c => col(c).as(s"r_$c")): _*)
    left
      .withColumn("__bkt", explode(array(
        expr(bkt), expr(s"$bkt - 1"))))
      .join(r, keys :+ "__bkt")
      .filter(col("__rts") >= col(tsCol) - lookback &&
        col("__rts") < col(tsCol))
      .drop("__bkt")
  }

  private def sideOf(et: String)(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    T.events(s, dir).filter(col("event_type") === et)
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("ts_us"), col("value"))

  /** Each purchase joined to the user's latest click at-or-before it.
    * DuckDB mirrors with its native ASOF LEFT JOIN — an independent
    * implementation of the same semantics, so the oracle checks the
    * operator, not the trick. */
  val q31 = Q("q31_asof_join",
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.ts_us, p.value,
      |  c.ts_us AS asof_ts_us, c.value AS asof_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
      |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
    asofJoin(
      sideOf("purchase")(s, dir),
      sideOf("click")(s, dir).drop("event_id"),
      keys = Seq("user_id"), tsCol = "ts_us")
      .select("event_id", "user_id", "ts_us", "value",
        "asof_ts_us", "asof_value")
      .orderBy("event_id")
  }

  /** Click count + cent-exact click value sum in the day before each
    * purchase (zero-click purchases kept via a left join back onto the
    * purchase spine). The cents cast makes the sum order-independent —
    * a parallel double sum would flake the hash gate. */
  val q32 = Q("q32_interval_join",
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.ts_us,
      |  count(c.ts_us) AS n_clicks,
      |  coalesce(CAST(sum(CAST(trunc(c.value * 100) AS BIGINT)) AS BIGINT),
      |           0) AS click_cents
      |FROM p LEFT JOIN c ON c.user_id = p.user_id
      |  AND c.ts_us >= p.ts_us - 86400000000 AND c.ts_us < p.ts_us
      |GROUP BY 1, 2, 3
      |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
    val p = sideOf("purchase")(s, dir).drop("value")
    val c = sideOf("click")(s, dir).drop("event_id")
    val agg = intervalPairs(p, c, Seq("user_id"), "ts_us",
        lookback = 86400000000L)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_clicks"),
        sum(expr("CAST(r_value * 100 AS BIGINT)")).as("click_cents"))
    p.join(agg, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("click_cents"), lit(0L)).as("click_cents"))
      .orderBy("event_id")
  }

  /** As-of join with a TOLERANCE bound (pandas merge_asof's `tolerance`,
    * kdb wj's window edge): a match older than `tolerance` microseconds
    * is treated as no match — every asof_ column nulls together (the
    * matched-row struct is the unit of matching, same null discipline as
    * [[asofJoin]]'s payload struct). Composes the plain as-of with one
    * conditional projection — no extra shuffle. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String, tolerance: Long): DataFrame = {
    require(tolerance > 0, s"tolerance must be positive, got $tolerance")
    val joined = asofJoin(left, right, keys, tsCol)
    val within = col(s"asof_$tsCol").isNotNull &&
      (col(tsCol) - col(s"asof_$tsCol")) <= tolerance
    val asofCols = joined.columns.filter(_.startsWith("asof_"))
    asofCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(within, col(c)))
    }
  }

  /** Purchases joined to the latest click at-or-before them, but only if
    * it happened within the last hour — the tolerance variant every
    * "state must be fresh" lookup needs. Oracle: DuckDB native ASOF plus
    * the same gap CASE. */
  val q35 = Q("q35_asof_tolerance",
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'click')
      |SELECT event_id, user_id, ts_us, value,
      |  CASE WHEN gap <= 3600000000 THEN a_ts END AS asof_ts_us,
      |  CASE WHEN gap <= 3600000000 THEN a_val END AS asof_value
      |FROM (
      |  SELECT p.event_id, p.user_id, p.ts_us, p.value,
      |    c.ts_us AS a_ts, c.value AS a_val, p.ts_us - c.ts_us AS gap
      |  FROM p ASOF LEFT JOIN c
      |    ON p.user_id = c.user_id AND p.ts_us >= c.ts_us) t
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    asofJoinTolerance(
      sideOf("purchase")(s, dir),
      sideOf("click")(s, dir).drop("event_id"),
      keys = Seq("user_id"), tsCol = "ts_us", tolerance = 3600000000L)
      .select("event_id", "user_id", "ts_us", "value",
        "asof_ts_us", "asof_value")
      .orderBy("event_id")
  }

  /** Distinct-cardinality interval aggregate: how many DISTINCT click
    * values (cent-quantized) in the day before each purchase, plus the
    * narrowest gap — the dedup-inside-window shape (e.g. distinct
    * sessions/devices in the lookback). Runs on the same bucketed pair
    * frame as q32; the distinct is per-purchase-group, bounded by the
    * window, never global. */
  val q36 = Q("q36_interval_distinct",
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.ts_us,
      |  count(DISTINCT CAST(trunc(c.value * 100) AS BIGINT))
      |    AS n_distinct_cents,
      |  coalesce(min(p.ts_us - c.ts_us), 0) AS min_gap_us
      |FROM p LEFT JOIN c ON c.user_id = p.user_id
      |  AND c.ts_us >= p.ts_us - 86400000000 AND c.ts_us < p.ts_us
      |GROUP BY 1, 2, 3
      |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
    val p = sideOf("purchase")(s, dir).drop("value")
    val c = sideOf("click")(s, dir).drop("event_id")
    val agg = intervalPairs(p, c, Seq("user_id"), "ts_us",
        lookback = 86400000000L)
      .groupBy("event_id")
      .agg(countDistinct(expr("CAST(r_value * 100 AS BIGINT)"))
          .as("n_distinct_cents"),
        min(col("ts_us") - col("__rts")).as("min_gap_us"))
    p.join(agg, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        coalesce(col("n_distinct_cents"), lit(0L)).as("n_distinct_cents"),
        coalesce(col("min_gap_us"), lit(0L)).as("min_gap_us"))
      .orderBy("event_id")
  }

  /** COMPOSITE-key as-of: state is tracked per (user, segment) — the
    * multi-tenant shape where "latest state" is scoped by more than one
    * column (account × token, user × device, …). Same union-tag window,
    * now hash-partitioned on both keys; DuckDB mirrors with a two-
    * equality ASOF. */
  val q37 = Q("q37_asof_two_key",
    """WITH p AS (SELECT event_id, user_id,
      |    CAST(trunc(value * 100) AS BIGINT) % 2 AS segment,
      |    epoch_us(ts) AS ts_us
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id,
      |    CAST(trunc(value * 100) AS BIGINT) % 2 AS segment,
      |    epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.segment, p.ts_us,
      |  c.ts_us AS asof_ts_us, c.value AS asof_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.segment = c.segment
      |  AND p.ts_us >= c.ts_us
      |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
    def side(et: String) = T.events(s, dir)
      .filter(col("event_type") === et)
      .select(col("event_id"), col("user_id"),
        (expr("CAST(value * 100 AS BIGINT)") % 2).as("segment"),
        expr("ts DIV 1000").as("ts_us"), col("value"))
    asofJoin(side("purchase").drop("value"), side("click").drop("event_id"),
        keys = Seq("user_id", "segment"), tsCol = "ts_us")
      .select("event_id", "user_id", "segment", "ts_us",
        "asof_ts_us", "asof_value")
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(q31, q32, q35, q36, q37)
}
