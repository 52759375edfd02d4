package graft.streaming

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Driver-visible instantiation of the streaming aggregation plan shape:
  * `StreamOps.windowedCounts` runs the identical plan over the batch
  * events table (Structured Streaming batch/stream unification), checked
  * against epoch-aligned bucket arithmetic in the oracle.
  */
object StreamQueries {

  /** 5-minute tumbling-window counts per event type. Spark's window()
    * aligns to the epoch, so bucket_start_us = floor(us / 300e6) * 300e6. */
  val s01 = Q("s01_windowed_counts",
    """SELECT (epoch_us(ts) // 300000000) * 300000000 AS bucket_start_us,
      |  event_type, count(*) AS n,
      |  cast(sum(cast(trunc(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM events GROUP BY 1, 2
      |ORDER BY bucket_start_us, event_type""".stripMargin) { (s, dir) =>
    StreamOps.windowedCounts(T.events(s, dir), "ts")
      .select(unix_micros(col("window.start")).as("bucket_start_us"),
        col("event_type"), col("n"), col("total_cents"))
      .orderBy("bucket_start_us", "event_type")
  }

  /** Gap-based sessionization (session_window): events of a user belong
    * to one session while consecutive gaps stay under 30 minutes. The
    * oracle derives identical sessions with a lag + running-sum — session
    * starts where the gap reaches the timeout (Spark merges only on
    * strict overlap, hence `>=` in the oracle). */
  val s02 = Q("s02_sessionize",
    """WITH o AS (SELECT user_id, epoch_us(ts) AS us,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM events),
      |m AS (SELECT user_id, us,
      |    CASE WHEN prev IS NULL OR us - prev >= 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM o),
      |s AS (SELECT user_id, us, sum(new_s) OVER (PARTITION BY user_id
      |    ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      |SELECT user_id, min(us) AS session_start_us, count(*) AS n
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin) { (s, dir) =>
    T.events(s, dir)
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(session_window(col("ts_ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n"))
      .orderBy("user_id", "session_start_us")
  }

  val all: Seq[Q] = Seq(s01, s02)
}
