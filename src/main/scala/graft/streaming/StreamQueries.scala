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

  val all: Seq[Q] = Seq(s01)
}
