package graft.plans

import graft.streaming.IncrementalTraceAssembly
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental silver refresh — the batch form of the reference's
  * incremental-by-construction ingest (`ON CONFLICT ... WHERE
  * last_trans_lt < EXCLUDED.last_trans_lt`,
  * InsertManagerPostgres.cpp:2423-2431): given the silver at masterchain
  * seqno N and ONLY the raw rows in (N, M], produce the silver at M —
  * without recomputing the corpus.
  *
  * Cost model (the whole point): the refresh never shuffles the existing
  * silver. The delta is window-deduped on its own (∝ |delta|), its
  * account set broadcasts, and the corpus splits map-side into an
  * untouched pass-through (broadcast LEFT ANTI — no exchange) and a
  * touched slice (broadcast LEFT SEMI, ∝ |accounts touched by the
  * delta|) that merges with the delta through one small window. Compute
  * and shuffle scale with the delta; the corpus contributes one columnar
  * scan, which any output rewrite needs anyway (on a cluster, silver
  * partitioned by account-hash rewrites only touched partitions).
  */
object IncrementalSilver {

  /** Latest-state rows from a raw tx frame — the b03 dedup, factored so
    * full recompute and incremental refresh share one definition. */
  def latestStates(txs: DataFrame): DataFrame = {
    val w = Window.partitionBy("account")
      .orderBy(col("lt").desc, col("hash").desc)
    txs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("account"), col("lt").as("last_trans_lt"),
        col("hash").as("last_trans_hash"))
  }

  /** prev silver (account, last_trans_lt, last_trans_hash) + delta raw
    * txs → merged latest-state rows, WITHOUT the surrogate id (see
    * [[refreshLatestStates]] for the id-complete form). */
  def mergeLatestStates(prev: DataFrame, deltaTxs: DataFrame): DataFrame = {
    // the surrogate id (if the caller's silver carries one) is a
    // corpus-wide rank — dropped here, re-derived by refreshLatestStates
    val prevRows = prev.select("account", "last_trans_lt", "last_trans_hash")
    val deltaLatest = latestStates(deltaTxs)
    val deltaAccounts = deltaLatest.select("account").distinct()
    // untouched corpus rows pass through map-side: broadcast anti join,
    // no exchange of prev
    val untouched = prevRows
      .join(broadcast(deltaAccounts), Seq("account"), "left_anti")
    // touched rows re-dedup against the delta through one window over a
    // delta-sized frame
    val touched = prevRows
      .join(broadcast(deltaAccounts), Seq("account"), "left_semi")
      .select(col("account"), col("last_trans_lt").as("lt"),
        col("last_trans_hash").as("hash"))
      .unionByName(deltaTxs.select("account", "lt", "hash"))
    untouched.unionByName(latestStates(touched))
  }

  /** The id-complete refresh, matching the full-recompute b03 contract
    * exactly: merged rows + the §1.4 deterministic surrogate id (global
    * dense rank by (last_trans_lt, account), zipWithIndex shape). The
    * rank is corpus-wide by definition — any row change can shift every
    * id — so it re-derives over the merged OUTPUT; that is a
    * range-repartition of the narrow 3-column result, not a recompute
    * of the dedup itself. */
  def refreshLatestStates(prev: DataFrame, deltaTxs: DataFrame): DataFrame =
    graft.operators.GlobalIndex
      .globalRowNumber(mergeLatestStates(prev, deltaTxs), "id",
        col("last_trans_lt"), col("account"))
      .withColumn("id", col("id").cast("int"))

  /** Incremental action-store refresh: feed the delta through the
    * stateful trace assembler (its open-set state is the (N, M]
    * backtrack analogue, TraceAssembler.cpp:53-128), classify ONLY the
    * traces that completed in the delta, and swap them into the store
    * per trace_id (ClassifyJob.reclassify — the T6 wholesale-replace
    * contract). Everything scales with the delta and the open set,
    * never the corpus: the store is touched only by the anti-join on
    * completed trace ids. */
  def refreshActions(spark: SparkSession, prevActions: DataFrame,
      assembler: IncrementalTraceAssembly,
      deltaTxs: DataFrame, deltaMsgs: DataFrame): DataFrame = {
    val (_, doneTxs, doneMsgs) = assembler.processBatchFull(deltaTxs, deltaMsgs)
    val newActions =
      graft.classifier.ClassifyJob.run(spark, doneTxs, doneMsgs).toDF()
    graft.classifier.ClassifyJob.reclassify(prevActions, newActions)
  }
}
