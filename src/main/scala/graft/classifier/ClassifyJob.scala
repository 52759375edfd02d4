package graft.classifier

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Spark integration of the classifier (SURVEY §3.3 Spark shape):
  * traces ⋈ transactions ⋈ messages → groupByKey(trace_id) →
  * flatMapGroups(classify) → actions. The reference's Redis interface
  * repository becomes a pre-joined per-trace map (no IO inside matchers).
  *
  * Scale: one shuffle on trace_id; per-group work is bounded by the
  * 4000-node big-trace cutoff, so no group can straggle unboundedly.
  */
/** Flattened tx⟕msg row for the trace-group encoder (must be visible to
  * Catalyst codegen — do not make private). */
case class ClassifyInputRow(
      trace_id: String, hash: String, account: String, lt: Long, now: Int,
      orig_status: String, end_status: String, aborted: Boolean,
      compute_exit_code: Option[Int], action_result_code: Option[Int],
      total_fees: Long, descr: String,
      msg_hash: Option[String], direction: Option[String],
      source: Option[String], destination: Option[String],
      value: Option[Long], opcode: Option[Long],
    bounce: Option[Boolean], bounced: Option[Boolean],
    created_lt: Option[Long], body: Option[String],
    init_state: Option[String],
    mc_block_seqno: Option[Int] = None)

object ClassifyJob {

  /** transactions(+trace_id) ⟕ messages → actions DataFrame. The
    * optional interface map (account → detected interface) replaces the
    * reference's Redis interface repository: broadcast once, read inside
    * the per-trace groups — no IO inside matchers (J12/S6).
    *
    * Shuffle shape, measured both ways: this wide join replicates the 12
    * tx columns onto every message row through the trace_id shuffle. The
    * alternative — messages pick up trace_id via a narrow (tx_hash →
    * trace_id) join, then tx and message Datasets cogroup on trace_id —
    * shuffles fewer bytes (tx attributes cross once) but costs one more
    * stage, a second per-partition sort, and a second evaluation of the
    * txs lineage. At sf0.1 bench scale the two are a wash; on micro-batch
    * pipelines (incremental assembly → classify per batch) the cogroup
    * form measured ~4-5× slower end-to-end, so the join form stays. At
    * extreme message multiplicity revisit the cogroup with the txs side
    * pre-materialized. */
  def run(spark: SparkSession, txs: DataFrame, messages: DataFrame,
      interfaces: Map[String, String] = Map.empty,
      jettonWallets: Map[String, String] = Map.empty,
      nftItems: Map[String, NftItemInfo] = Map.empty): Dataset[ActionRow] = {
    import spark.implicits._
    val interfacesB = spark.sparkContext.broadcast(interfaces)
    val jettonWalletsB = spark.sparkContext.broadcast(jettonWallets)
    val nftItemsB = spark.sparkContext.broadcast(nftItems)
    val joined = txs.select(
        col("trace_id"), col("hash"), col("account"), col("lt"), col("now"),
        coalesce(col("orig_status"), lit("active")).as("orig_status"),
        coalesce(col("end_status"), lit("active")).as("end_status"),
        coalesce(col("aborted"), lit(false)).as("aborted"),
        col("compute_exit_code"), col("action_result_code"),
        coalesce(col("total_fees"), lit(0L)).as("total_fees"),
        coalesce(col("descr"), lit("ord")).as("descr"),
        (if (txs.columns.contains("mc_block_seqno")) col("mc_block_seqno")
         else lit(null).cast("int")).as("mc_block_seqno"))
      .join(messages.select(col("tx_hash").as("hash"), col("msg_hash"),
        col("direction"), col("source"), col("destination"), col("value"),
        col("opcode"), col("bounce"), col("bounced"), col("created_lt"),
        (if (messages.columns.contains("body")) col("body")
         else lit(null).cast("string")).as("body"),
        (if (messages.columns.contains("init_state")) col("init_state")
         else lit(null).cast("string")).as("init_state")),
        Seq("hash"), "left")
      .as[ClassifyInputRow]

    joined.groupByKey(_.trace_id).flatMapGroups { (traceId, rows) =>
      val buf = rows.toSeq
      val txsOf = buf.groupBy(_.hash).map { case (h, rs) =>
        val r = rs.head
        TxLite(h, r.account, r.lt, r.now, r.orig_status, r.end_status,
          r.aborted, r.compute_exit_code, r.action_result_code,
          r.total_fees, r.descr, r.mc_block_seqno)
      }.toSeq
      val msgsByTx: Map[String, Seq[MsgLite]] = buf
        .filter(_.msg_hash.isDefined)
        .groupBy(_.hash)
        .map { case (h, rs) =>
          h -> rs.map(r => MsgLite(r.msg_hash.get, r.direction.getOrElse("in"),
            r.source, r.destination, r.value.getOrElse(0L), r.opcode,
            r.bounce.getOrElse(false), r.bounced.getOrElse(false),
            r.created_lt, r.body, r.init_state))
        }
      Classifier.classify(traceId, txsOf, msgsByTx, interfacesB.value,
        jettonWalletsB.value, nftItemsB.value).iterator
    }
  }

  /** Full-schema actions table: classifier output conformed to
    * Schemas.actions — the §1.4 denormalized trace columns joined in
    * (trace_end_lt/utime, external hash, mc_seqno) and every column of
    * the reference DDL present with its exact type (absent families as
    * typed nulls). Struct casts are field-by-field: the detail case
    * classes mirror Schemas' *_details field order. */
  def typedActions(spark: SparkSession, txsWithTrace: DataFrame,
      messages: DataFrame, traces: DataFrame): DataFrame = {
    val acts = run(spark, txsWithTrace, messages).toDF()
    val meta = traces.select(col("trace_id"),
      col("end_lt").as("trace_end_lt"),
      col("end_utime").cast("long").as("trace_end_utime"),
      col("external_hash").as("trace_external_hash"),
      col("mc_seqno_end").as("trace_mc_seqno_end"),
      (if (traces.columns.contains("external_hash_norm"))
        col("external_hash_norm")
      else lit(null).cast("string")).as("trace_external_hash_norm"))
    val joined = acts.join(broadcast(meta), Seq("trace_id"), "left")
    val cols = graft.Schemas.actions.fields.map { fld =>
      if (joined.columns.contains(fld.name))
        col(fld.name).cast(fld.dataType).as(fld.name)
      else lit(null).cast(fld.dataType).as(fld.name)
    }
    joined.select(cols.toSeq: _*)
  }

  /** T6 reclassification: replace a store's actions for the given traces
    * with freshly computed ones — the DELETE-then-insert of the reference
    * (event_classifier.py:253-267) as an anti-join + union (in a
    * partitioned store this is an overwrite of the touched trace
    * partitions, not a full rewrite). */
  def reclassify(existingActions: DataFrame, newActions: DataFrame): DataFrame = {
    val touched = newActions.select("trace_id").distinct()
    existingActions
      .join(touched, Seq("trace_id"), "left_anti")
      .unionByName(newActions)
  }

  /** Exploded action_accounts from an actions frame (denormalized
    * pagination fact, SURVEY §1.4). Column-based so pruned silver scans
    * qualify — only the id/endpoint/lt columns are touched. */
  def actionAccounts(spark: SparkSession, actions: DataFrame): DataFrame = {
    val traceEnds = actions.groupBy("trace_id")
      .agg(max("end_lt").as("trace_end_lt"), max("end_utime").as("trace_end_utime"))
    actions.toDF()
      .select(col("action_id"), col("trace_id"),
        explode(array_distinct(concat(
          coalesce(array(col("source")), array()),
          coalesce(array(col("destination")), array()))))
          .as("account"),
        col("end_lt").as("action_end_lt"), col("end_utime").as("action_end_utime"))
      .filter(col("account").isNotNull)
      .join(traceEnds, Seq("trace_id"))
      .select("action_id", "trace_id", "account", "trace_end_lt",
        "action_end_lt", "trace_end_utime", "action_end_utime")
  }
}
