package graft.streaming

import graft.classifier.ClassifyJob
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** End-to-end streaming ingest (SURVEY §3.2 as one streaming program):
  * file-source micro-batches of parsed (tx × msg) rows → incremental
  * trace assembly (stateful G1) → classification of traces that COMPLETED
  * in the batch → append-only actions sink. Restart-safe: the file
  * source's offsets live in the Spark checkpoint, the assembler's open
  * working set in its .tastate-analogue snapshot (TraceAssembler.cpp:
  * 53-128; IndexScheduler.cpp:173-208 restore-with-backtrack).
  *
  * The input contract mirrors the worker's parse fan-out (S2): each row
  * is one transaction × message pairing, and a transaction's OUT-messages
  * ship with the transaction that produced them — exactly the reference's
  * parse order, and what makes "complete" monotone (a trace can only be
  * extended through a pending out-edge, never by a tx appearing out of
  * nowhere).
  */
object StreamPipeline {

  /** Parsed-row stream schema (tx attributes + one message). */
  val inputSchema: StructType = StructType(Seq(
    StructField("hash", StringType), StructField("account", StringType),
    StructField("lt", LongType), StructField("now", IntegerType),
    StructField("mc_block_seqno", IntegerType),
    StructField("orig_status", StringType), StructField("end_status", StringType),
    StructField("aborted", BooleanType),
    StructField("compute_exit_code", IntegerType),
    StructField("action_result_code", IntegerType),
    StructField("total_fees", LongType), StructField("descr", StringType),
    StructField("msg_hash", StringType), StructField("direction", StringType),
    StructField("source", StringType), StructField("destination", StringType),
    StructField("value", LongType), StructField("opcode", LongType),
    StructField("bounce", BooleanType), StructField("bounced", BooleanType),
    StructField("created_lt", LongType), StructField("body", StringType)))

  private val txCols = Seq("hash", "account", "lt", "now", "mc_block_seqno",
    "orig_status", "end_status", "aborted", "compute_exit_code",
    "action_result_code", "total_fees", "descr")
  private val msgCols = Seq("msg_hash", "direction", "source", "destination",
    "value", "opcode", "bounce", "bounced", "created_lt", "body")

  /** Join txs×msgs into the stream-input row shape (fixture writer). */
  def toInputRows(txs: DataFrame, msgs: DataFrame): DataFrame =
    txs.join(msgs.withColumnRenamed("tx_hash", "hash")
        .withColumn("body", lit(null).cast("string")),
      Seq("hash"), "left")
      .select((txCols ++ msgCols).map(col): _*)

  /** Drain all available input files (Trigger.AvailableNow), assembling
    * and classifying incrementally; writes completed traces' actions to
    * `outDir/actions/batch_id=N` as parquet. Call again after a restart —
    * offsets and assembler state both resume.
    *
    * Restart-safe END TO END: a batch whose offsets never committed is
    * re-delivered with the SAME batch id; the assembler seeks to its
    * batch-keyed pre-batch snapshot and the sink overwrites the same
    * `batch_id=N` partition, so the replay is byte-idempotent — no
    * duplicated actions, no traces assembled from partial state. */
  def runAvailable(spark: SparkSession, inputDir: String,
      checkpointDir: String, outDir: String,
      maxFilesPerTrigger: Int = 1): Unit = {
    val ita = new IncrementalTraceAssembly(spark, Some(s"$checkpointDir/tastate"))
    val q = StreamOps.fileStream(spark, inputDir, inputSchema, maxFilesPerTrigger)
      .writeStream
      .option("checkpointLocation", s"$checkpointDir/offsets")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val txs = batch.select(txCols.map(col): _*).dropDuplicates("hash")
        val msgs = batch.filter(col("msg_hash").isNotNull)
          .select((Seq("hash") ++ msgCols).map(col): _*)
          .withColumnRenamed("hash", "tx_hash")
        val (done, doneTxs, doneMsgs) = ita.processBatchFull(txs, msgs, batchId)
        if (!done.isEmpty) {
          ClassifyJob.run(spark, doneTxs, doneMsgs).toDF()
            .write.mode("overwrite").parquet(s"$outDir/actions/batch_id=$batchId")
        }
        ()
      }
      .start()
    q.awaitTermination()
  }
}
