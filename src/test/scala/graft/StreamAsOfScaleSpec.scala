package graft

import graft.streaming.{StampedRow, StreamAsOf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming as-of at BENCH scale with a real crash/restart: the
  * sf0.1 events corpus ships as four ts-quartile file chunks, the stream
  * consumes two, stops ("crash"), restarts from its checkpoint and
  * consumes the rest — every event's as-of verdict must equal the batch
  * operator's. This is the T5 evidence for the temporal-join family: the
  * per-key (ts, value) state survives the restart, so a probe in chunk 3
  * still sees a purchase from chunk 1. */
class StreamAsOfScaleSpec extends SparkSpec {

  private val benchSf = "/root/testdata/sf0.1"

  test("streaming as-of at sf0.1 equals the batch operator across a restart") {
    import spark.implicits._

    val ev = Tables.events(spark, benchSf)
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("ts_us"), col("value"),
        (col("event_type") === "purchase").as("is_right"))
      .localCheckpoint()

    val expect = graft.operators.AsOf.asofJoin(
        ev.drop("is_right", "value"),
        Tables.events(spark, benchSf)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
            col("value")),
        Seq("user_id"), "ts_us")
      .collect()
      .map { r =>
        val i = r.fieldIndex("asof_ts_us")
        r.getLong(r.fieldIndex("event_id")) ->
          (if (r.isNullAt(i)) -1L else r.getLong(i))
      }.toMap
    assert(expect.nonEmpty && expect.values.exists(_ >= 0))

    val tmp = java.nio.file.Files
      .createTempDirectory("graft-asof-sf01").toString
    val inDir = s"$tmp/in"; val ckDir = s"$tmp/ck"; val outDir = s"$tmp/out"
    new java.io.File(inDir).mkdirs()

    // ts-quartile chunks: the stream's only ordering assumption is that
    // each key's rows arrive in ts order ACROSS micro-batches, which a
    // time-partitioned replay (the production shape) satisfies
    val qs = ev.stat.approxQuantile("ts_us",
      Array(0.25, 0.5, 0.75), 0.0).map(_.toLong)
    val cuts = Seq(Long.MinValue) ++ qs ++ Seq(Long.MaxValue)
    (0 until 4).foreach { i =>
      ev.filter(col("ts_us") > cuts(i) && col("ts_us") <= cuts(i + 1))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/stage$i")
    }
    // strictly increasing mtimes: the file source orders micro-batches
    // by modification time, and same-millisecond copies would let a
    // later ts quartile process first — exactly the out-of-order replay
    // the operator's ordering contract excludes
    def ship(i: Int): Unit =
      new java.io.File(s"$tmp/stage$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, j) =>
          val dst = java.nio.file.Paths.get(s"$inDir/chunk$i-$j.parquet")
          java.nio.file.Files.copy(f.toPath, dst)
          dst.toFile.setLastModified(1000000000000L + i * 60000L + j * 1000L)
          ()
        }

    def runAvailable(): Unit = {
      val q = StreamAsOf.latestStateMatches(
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
          .as[StampedRow])
        .writeStream
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", outDir)
        .outputMode("append")
        .start()
      q.awaitTermination()
    }

    ship(0); ship(1)
    runAvailable() // phase 1, then the query exits ("crash")
    ship(2); ship(3)
    runAvailable() // restart from checkpointed offsets + state

    val got = spark.read.parquet(outDir)
      .select(col("event_id"), coalesce(col("asof_ts_us"), lit(-1L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == expect.size, s"${got.size} vs ${expect.size} rows")
    assert(got == expect,
      s"streamed as-of diverges from batch: ${
        (got.toSet -- expect.toSet).take(5)} / ${
        (expect.toSet -- got.toSet).take(5)}")
  }

  test("watermark-flushed hold-back at sf0.1 equals the s12 batch " +
      "program across a restart (timeout + watermark state survive " +
      "the checkpoint)") {
    import spark.implicits._

    val ev = Tables.events(spark, benchSf)
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("ts_us"), col("value"),
        (col("event_type") === "purchase").as("is_right"))
      .localCheckpoint()

    // the registered batch unification IS the expected emitted set
    val expect = graft.streaming.StreamQueries.s12.fn(spark, benchSf)
      .select(col("event_id"), coalesce(col("asof_ts_us"), lit(-1L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expect.nonEmpty && expect.size < ev.count(),
      "fixture must hold back SOME frontier rows under the 8h delay")

    val tmp = java.nio.file.Files
      .createTempDirectory("graft-asof-fl-sf01").toString
    val inDir = s"$tmp/in"; val ckDir = s"$tmp/ck"; val outDir = s"$tmp/out"
    new java.io.File(inDir).mkdirs()
    val qs = ev.stat.approxQuantile("ts_us",
      Array(0.25, 0.5, 0.75), 0.0).map(_.toLong)
    val cuts = Seq(Long.MinValue) ++ qs ++ Seq(Long.MaxValue)
    (0 until 4).foreach { i =>
      ev.filter(col("ts_us") > cuts(i) && col("ts_us") <= cuts(i + 1))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/stage$i")
    }
    def ship(i: Int): Unit =
      new java.io.File(s"$tmp/stage$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, j) =>
          val dst = java.nio.file.Paths.get(s"$inDir/chunk$i-$j.parquet")
          java.nio.file.Files.copy(f.toPath, dst)
          dst.toFile.setLastModified(1000000000000L + i * 60000L + j * 1000L)
          ()
        }
    def runAvailable(): Unit = {
      val q = StreamAsOf.latestStateMatchesHoldbackFlush(
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
          .as[StampedRow], "8 hours")
        .writeStream
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", outDir)
        .outputMode("append")
        .start()
      q.awaitTermination()
    }
    ship(0); ship(1)
    runAvailable() // phase 1, then the query exits ("crash")
    ship(2); ship(3)
    runAvailable() // restart: offsets, per-key state, watermark, timeouts

    val got = spark.read.parquet(outDir)
      .select(col("event_id"), coalesce(col("asof_ts_us"), lit(-1L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == expect.size, s"${got.size} vs ${expect.size} rows")
    assert(got == expect,
      s"flushed hold-back diverges from the s12 program: ${
        (got.toSet -- expect.toSet).take(5)} / ${
        (expect.toSet -- got.toSet).take(5)}")
  }
}
