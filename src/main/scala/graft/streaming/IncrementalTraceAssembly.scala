package graft.streaming

import graft.plans.TraceAssembly
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftFreshStats.{checkpointFresh, unpersistCheckpoints}
import org.apache.spark.sql.functions._

/** Incremental (micro-batch) trace assembly — the streaming form of
  * TraceAssembly, mirroring the reference's stateful builder + snapshot
  * lifecycle (TraceAssembler.cpp:53-128 state persistence;
  * IndexScheduler.cpp:173-208 restore-with-backtrack).
  *
  * State = the open working set: transactions/messages of traces that are
  * not yet complete (pending out-messages or broken edges that newer
  * blocks might still resolve). Each micro-batch unions the new rows with
  * the open set, re-assembles that closed universe with the batch
  * assembler (identical semantics by construction — T5's exactly-once
  * equivalence), emits traces that completed, and carries the rest.
  *
  * The open set is bounded by in-flight trace size, not by history —
  * the reference bounds the same state with its 50-block backtrack.
  * State snapshots go to `checkpointDir` as parquet (the .tastate
  * analogue); `restore()` resumes after a crash.
  */
class IncrementalTraceAssembly(spark: SparkSession,
    checkpointDir: Option[String] = None) {

  import TraceAssembly.assemble

  private var openTxs: Option[DataFrame] = None
  private var openMsgs: Option[DataFrame] = None
  private var lastBatchId: Option[Long] = None
  @volatile var completedCount: Long = 0L

  // checkpoints created by the PREVIOUS batch. They stay readable until
  // the next batch's inputs are materialized, then they are unreachable
  // and their blocks are released. Without this rotation a long-running
  // stream pins every batch's working set in the block store for the
  // life of the session. The RETURNED frames (done/doneTxs/doneMsgs) are
  // checkpointed too — self-contained, no lineage into this internal
  // state — and rotate through `returnedState` with one extra batch of
  // lag, so a caller holding batch N's results can still read them while
  // (and after) batch N+1 is processed; they die when batch N+2 starts.
  private var staleState: Seq[DataFrame] = Nil
  private var returnedState: Seq[DataFrame] = Nil
  private var returnedStale: Seq[DataFrame] = Nil

  private def unionOpt(a: Option[DataFrame], b: DataFrame): DataFrame =
    a.map(_.unionByName(b)).getOrElse(b)

  /** Process one micro-batch; returns the traces that COMPLETED in this
    * batch (with their final metadata). */
  def processBatch(txs: DataFrame, msgs: DataFrame): DataFrame =
    processBatchFull(txs, msgs)._1

  /** Position state for processing batch `batchId`: state must be the
    * post-state of `batchId - 1`. In-memory state is already correct when
    * the previous call processed batchId-1; otherwise (restart, or a
    * REPLAYED batch whose offsets never committed) load the batch-keyed
    * snapshot, so reprocessing starts from the exact pre-batch state and
    * produces byte-identical output — the idempotence contract of the
    * streaming sink. */
  private def seekTo(batchId: Long): Unit = checkpointDir.foreach { dir =>
    if (lastBatchId.contains(batchId - 1)) return
    if (batchId == 0L) { openTxs = None; openMsgs = None }
    else {
      openTxs = Some(spark.read.parquet(s"$dir/batches/${batchId - 1}/open_txs"))
      openMsgs = Some(spark.read.parquet(s"$dir/batches/${batchId - 1}/open_msgs"))
    }
  }

  /** As processBatch, but also returns the completed traces' transaction
    * rows (with trace_id) and messages — the classification feed of the
    * end-to-end pipeline (StreamPipeline). Pass the streaming `batchId`
    * to get batch-keyed snapshots (replay-safe); batchId = -1 keeps the
    * legacy unkeyed snapshot behavior.
    *
    * Lifetime contract: the returned frames are eagerly materialized
    * (local checkpoints with no lineage into the rotating internal
    * state) and remain readable while the NEXT batch is processed; they
    * are released when the batch after that starts. Persist them (write
    * or your own checkpoint) if you need them beyond that window. */
  def processBatchFull(txs: DataFrame, msgs: DataFrame, batchId: Long = -1L)
      : (DataFrame, DataFrame, DataFrame) = {
    if (batchId >= 0L) seekTo(batchId)
    // checkpointFresh throughout: open-trace state carries across
    // BATCHES, so plain checkpoints would compound plan stats batch
    // over batch (see GraftFreshStats) — a thousand-batch stream would
    // hit the same driver-side BigInt blowup as an iterative loop.
    val allTxs = checkpointFresh(unionOpt(openTxs, txs)
      .dropDuplicates("hash"))
    val allMsgs = checkpointFresh(unionOpt(openMsgs, msgs)
      .dropDuplicates("msg_hash", "tx_hash", "direction"))
    // this batch's inputs are materialized: the previous batch's
    // internal checkpoints (working set + carried open state) are now
    // dead; the frames RETURNED two batches ago die with them
    staleState.foreach(unpersistCheckpoints)
    returnedStale.foreach(unpersistCheckpoints)

    val (traces, _, txsWithTrace) = assemble(allTxs, allMsgs)
    val tracesC = checkpointFresh(traces)
    val txsWithTraceC = checkpointFresh(txsWithTrace)

    // returned frames are materialized (no lineage into rotated state)
    val done = checkpointFresh(tracesC.filter(col("state") === "complete"))
    val open = tracesC.filter(col("state") =!= "complete")
      .select(col("trace_id"))

    val doneTxs = checkpointFresh(txsWithTraceC
      .join(done.select("trace_id"), Seq("trace_id"), "left_semi"))
    val doneMsgs = checkpointFresh(allMsgs.join(
      doneTxs.select(col("hash").as("tx_hash")), Seq("tx_hash"), "left_semi"))

    // carry only rows belonging to still-open traces
    val openTxKeys = checkpointFresh(txsWithTraceC
      .join(open, Seq("trace_id"), "left_semi"))
    openTxs = Some(openTxKeys.drop("trace_id"))
    openMsgs = Some(checkpointFresh(allMsgs.join(
      openTxKeys.select(col("hash").as("tx_hash")), Seq("tx_hash"),
      "left_semi")))

    completedCount += done.count()
    if (batchId >= 0L) {
      checkpointDir.foreach { dir =>
        snapshot(s"$dir/batches/$batchId")
        prune(dir, batchId)
      }
      lastBatchId = Some(batchId)
    } else checkpointDir.foreach(snapshot)
    // internal checkpoints rotate out at the next batch; the raw
    // (pre-checkpoint) traces/txsWithTrace frames are included so the
    // assembler's internal fixpoint state is released too. Returned
    // frames rotate with one extra batch of lag (see returnedState).
    staleState = Seq(allTxs, allMsgs, tracesC, txsWithTraceC,
      openTxKeys, traces, txsWithTrace) ++ openMsgs
    returnedStale = returnedState
    returnedState = Seq(done, doneTxs, doneMsgs)
    (done, doneTxs, doneMsgs)
  }

  /** Persist the open working set (the .tastate analogue). Batch-keyed
    * dirs mirror the reference's per-seqno state files
    * (TraceAssembler.cpp:53-128, keep-last-100 GC). */
  private def snapshot(dir: String): Unit = {
    openTxs.getOrElse(emptyLike("open_txs"))
      .write.mode("overwrite").parquet(s"$dir/open_txs")
    openMsgs.getOrElse(emptyLike("open_msgs"))
      .write.mode("overwrite").parquet(s"$dir/open_msgs")
  }

  private def emptyLike(which: String): DataFrame = {
    // an empty open set still needs a readable snapshot; schemas match the
    // stream-input projection (StreamPipeline.inputSchema split)
    val fields = if (which == "open_txs")
      StreamPipeline.inputSchema.fields.take(12)
    else StreamPipeline.inputSchema.fields.takeRight(10) :+
      org.apache.spark.sql.types.StructField("tx_hash",
        org.apache.spark.sql.types.StringType)
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(fields))
  }

  /** Keep the last 100 batch snapshots (the reference's GC policy). */
  private def prune(dir: String, batchId: Long): Unit = {
    val victim = batchId - 100
    if (victim >= 0) {
      val path = new org.apache.hadoop.fs.Path(s"$dir/batches/$victim")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
  }

  /** Restore the open set after restart. */
  def restore(): Boolean = checkpointDir.exists { dir =>
    try {
      openTxs = Some(spark.read.parquet(s"$dir/open_txs"))
      openMsgs = Some(spark.read.parquet(s"$dir/open_msgs"))
      true
    } catch { case _: Exception => false }
  }

  /** Traces still open (pending/broken) at the current point. */
  def openTraces(): DataFrame = (openTxs, openMsgs) match {
    case (Some(t), Some(m)) => TraceAssembly.assemble(t, m)._1
    case _ =>
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.Schemas.traces)
  }

  /** Classify the open working set — the reference's pending/emulated
    * trace classification (S10): speculative actions over traces that
    * have not completed, served alongside finalized actions via
    * StreamOps.federate and replaced wholesale by ClassifyJob.reclassify
    * when the trace finalizes (T6). The trace root is stable as a trace
    * completes, so pending and final actions share trace_id and the
    * replacement is a per-trace anti-join. */
  def pendingActions(): DataFrame = (openTxs, openMsgs) match {
    case (Some(t), Some(m)) =>
      val (_, _, txw) = TraceAssembly.assemble(t, m)
      graft.classifier.ClassifyJob.run(spark, txw, m).toDF()
    case _ =>
      spark.emptyDataset(org.apache.spark.sql.Encoders.product[
        graft.classifier.ActionRow]).toDF()
  }
}
