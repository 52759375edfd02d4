package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-series analytics: the two reshaping aggregates every
  * time-series surface ends up needing — OHLC-style downsampling
  * (first/last/extremes per time bucket) and categorical pivot. Both are
  * single-shuffle groupBy aggregates: downsampling keys on
  * (entity, bucket) so cardinality is bounded by active entities per
  * window, and the pivot's column set is FIXED up front (never inferred
  * by a pre-scan — Spark's two-arg pivot would otherwise run an extra
  * distinct job over the corpus, and an unbounded category set would
  * make an unbounded-width row). */
object Events {

  /** Per (user, day) OHLC over purchase values: open/close are
    * min_by/max_by on the timestamp (unique per (user, ts) in any
    * dedup'd event feed — the tie-break contract is the caller's),
    * high/low plain extremes. One shuffle, map-side partial. */
  def ohlcDownsample(events: DataFrame, bucketUs: Long): DataFrame =
    events
      .withColumn("day", expr(s"ts_us DIV $bucketUs"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"),
        min_by(col("value"), col("ts_us")).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), col("ts_us")).as("close"))

  val q33 = Q("q33_ohlc_downsample",
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, value,
      |    epoch_us(ts) // 86400000000 AS day
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT user_id, day, count(*) AS n,
      |  arg_min(value, ts_us) AS open,
      |  max(value) AS high, min(value) AS low,
      |  arg_max(value, ts_us) AS close
      |FROM e GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin) { (s, dir) =>
    ohlcDownsample(
      T.events(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
          col("value")),
      bucketUs = 86400000000L)
      .orderBy("user_id", "day")
  }

  /** Event-type counts pivoted to one column per type. The type list is
    * pinned (values-form pivot): the plan is a single hash aggregate
    * with conditional counts — no distinct-scan job, and the output
    * width is a compile-time constant however large the corpus. */
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def pivotCounts(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .select(col("user_id") +:
        EventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)

  val q34 = Q("q34_pivot_counts",
    s"""SELECT user_id,
       |${EventTypes.map(t =>
            s"  count(*) FILTER (event_type = '$t') AS n_$t")
            .mkString(",\n")}
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
    (s, dir) =>
      pivotCounts(T.events(s, dir).select("user_id", "event_type"))
        .orderBy("user_id")
  }

  val all: Seq[Q] = Seq(q33, q34)
}
