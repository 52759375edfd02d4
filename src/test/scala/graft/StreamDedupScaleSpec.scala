package graft

import graft.operators.Dedup
import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.BandRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The online LSH index at BENCH scale with a real crash/restart: the
  * sf0.1 document corpus's band rows are shipped as four file chunks,
  * the stream consumes two, "crashes" (the query stops), restarts from
  * its checkpoint, consumes the rest — and the accumulated candidate
  * stream must equal batch banding's pair set exactly. The spec-scale
  * MemoryStream twin (StreamDedupSpec) pins batching-invariance; this
  * pins that the checkpointed flatMapGroupsWithState state survives a
  * restart at 5k-document scale, mirroring StreamingScaleSpec's T5
  * evidence for the classify pipeline. */
class StreamDedupScaleSpec extends SparkSpec {

  private val benchSf = "/root/testdata/sf0.1"

  test("online LSH index at sf0.1 equals batch banding across a restart") {
    import spark.implicits._

    val base = Tables.documents(spark, benchSf)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val bands = Dedup.bandKeyRows(Dedup.signaturesOf(base))
      .localCheckpoint()

    // batch ground truth: per-bucket all-pairs, distinct — computed
    // distributedly (collect only the pair set)
    val expect = bands.as[(Long, Int, Long)].rdd
      .groupBy { case (_, band, bkey) => (band, bkey) }
      .flatMap { case (_, rows) =>
        val ids = rows.map(_._1).toSeq.distinct.sorted
        for (i <- ids.indices.iterator; j <- (i + 1) until ids.size)
          yield (ids(i), ids(j))
      }.distinct().collect().toSet
    assert(expect.nonEmpty, "sf0.1 corpus must produce candidates")

    val tmp = java.nio.file.Files
      .createTempDirectory("graft-lsh-sf01").toString
    val inDir = s"$tmp/in"; val ckDir = s"$tmp/ck"; val outDir = s"$tmp/out"
    new java.io.File(inDir).mkdirs()

    // four chunks split by doc_id quartile — duplicates of a bucket can
    // land in different chunks, so cross-restart state is exercised
    val n = 4
    (0 until n).foreach { i =>
      bands.filter(pmod(col("doc_id"), lit(n)) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/stage$i")
    }
    def ship(i: Int): Unit =
      new java.io.File(s"$tmp/stage$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, j) =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(s"$inDir/chunk$i-$j.parquet"))
        }

    def runAvailable(): Unit = {
      val q = StreamDedup.candidatePairs(
        spark.readStream.schema(bands.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
          .as[BandRow])
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
      .select("doc_a", "doc_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect,
      s"streamed candidates diverge from batch banding: " +
        s"+${(got -- expect).size} -${(expect -- got).size}")
  }
}
