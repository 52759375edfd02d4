package graft.golden

import graft.classifier._

/** Flattened golden-trace rows for the DataFrame encoders (top-level so
  * Catalyst can derive TypeTags). */
case class GTxRow(trace_id: String, hash: String, account: String, lt: Long,
    now: Int, orig_status: String, end_status: String, aborted: Boolean,
    compute_exit_code: Option[Int], action_result_code: Option[Int],
    total_fees: Long, descr: String, mc_block_seqno: Option[Int])

case class GMsgRow(tx_hash: String, msg_hash: String, direction: String,
    source: Option[String], destination: Option[String], value: Long,
    opcode: Option[Long], bounce: Boolean, bounced: Boolean,
    created_lt: Option[Long], body: Option[String], init_state: Option[String],
    msg_seq: Option[Int], created_at: Option[Long])

/** Golden corpus through the DISTRIBUTED path: every reference trace
  * fixture is classified via `ClassifyJob.run` — the production
  * DataFrame→groupByKey→flatMapGroups pipeline with DataFrame dims
  * (interfaces / jettonWallets+owner / nftItems) — and the output must
  * match the local `Classifier.classify` action-for-action. This is the
  * analogue of the reference testing through its production pipeline
  * (indexer/tests/test_actions.py:12-63): it pins the dims cogroup, the
  * per-trace map delivery, and the msg_seq/created_at plumbing against
  * real mainnet traces, not synthetic fixtures.
  *
  * Traces whose interface dicts disagree on a shared account (the same
  * address captured at two points in time) cannot share one dim table —
  * they are greedily split into conflict-free batches, one ClassifyJob
  * run per batch.
  */
class GoldenDistributedSpec extends graft.SparkSpec {

  import scala.jdk.CollectionConverters._

  private def traceIds: Seq[String] = {
    val y = new org.yaml.snakeyaml.Yaml()
    GoldenCorpus.CasesDir.listFiles().filter(_.getName.endsWith(".yaml"))
      .sortBy(_.getName).toSeq.flatMap { f =>
        val root = y.load[java.util.Map[String, Any]](
          new java.io.FileInputStream(f))
        Option(root).flatMap(r => Option(r.get("cases"))) match {
          case Some(cs: java.util.Map[_, _]) =>
            cs.asInstanceOf[java.util.Map[String, Any]].asScala.values
              .map(d => String.valueOf(
                d.asInstanceOf[java.util.Map[String, Any]].get("trace-id")))
              .toSeq
          case _ => Nil
        }
      }.distinct
  }

  /** A dim row of trace B is VISIBLE to trace A's distributed run when
    * its key is reachable from A: among A's tx accounts / msg endpoints /
    * body-decoded addresses (TlbDecoders.resolverAddressKeys — the same
    * candidate-key surface ClassifyJob.traceDims explodes), or — for
    * jetton wallets, which ClassifyJob also delivers under their owner's
    * address — when the row's owner is reachable. A's local classify
    * uses only A's own fixture maps, so a batch is sound only if every
    * row visible to A is already in A's own dims (and vice versa). */
  private case class TInfo(t: GoldenCorpus.LoadedTrace, vis: Set[String])

  private def tinfo(t: GoldenCorpus.LoadedTrace): TInfo = {
    val accts = t.txs.map(_.account).toSet
    val endpoints = t.msgsByTx.valuesIterator.flatten.flatMap(m =>
      m.source.iterator ++ m.destination.iterator).toSet
    val bodyKeys = t.msgsByTx.valuesIterator.flatten.flatMap(m =>
      (m.opcode, m.body) match {
        case (Some(op), Some(b)) =>
          graft.functions.TlbDecoders.resolverAddressKeys(op, b)
        case _ => Nil
      }).toSet
    TInfo(t, accts ++ endpoints ++ bodyKeys)
  }

  /** Pairwise batch compatibility: shared dim keys must agree (one dim
    * TABLE per batch), and a key present in only one trace's dims must
    * not be visible to the other — else the distributed run would see a
    * row the local run doesn't, a test artifact, not a ClassifyJob
    * divergence. */
  private def compatible(a: TInfo, b: TInfo): Boolean = {
    def chk[V](da: Map[String, V], db: Map[String, V],
        visA: String => Boolean, visB: String => Boolean): Boolean =
      da.forall { case (k, v) => db.get(k) match {
        case Some(w) => w == v
        case None => !visB(k)
      }} && db.forall { case (k, _) => da.contains(k) || !visA(k) }
    // jw rows are also visible through their owner address
    def jwVis(info: TInfo, own: Map[String, String])(k: String): Boolean =
      info.vis(k) || own.get(k).exists(info.vis)
    chk(a.t.interfaces, b.t.interfaces, a.vis, b.vis) &&
      chk(a.t.nftItems, b.t.nftItems, a.vis, b.vis) &&
      chk(a.t.jettonWallets, b.t.jettonWallets,
        jwVis(a, a.t.walletOwners), jwVis(b, b.t.walletOwners)) &&
      chk(a.t.walletOwners, b.t.walletOwners,
        jwVis(a, a.t.walletOwners), jwVis(b, b.t.walletOwners))
  }

  /** Greedy conflict-free batching: a trace joins the first batch where
    * it is pairwise-compatible with every already-placed trace. */
  private def batch(ts: Seq[GoldenCorpus.LoadedTrace])
      : Seq[Seq[GoldenCorpus.LoadedTrace]] = {
    val infos = ts.map(tinfo)
    val batches = scala.collection.mutable.ArrayBuffer[
      scala.collection.mutable.ArrayBuffer[TInfo]]()
    infos.foreach { ti =>
      batches.find(_.forall(compatible(_, ti))) match {
        case Some(b) => b += ti
        case None => batches +=
          scala.collection.mutable.ArrayBuffer(ti)
      }
    }
    batches.map(_.map(_.t).toSeq).toSeq
  }

  if (GoldenCorpus.available) {
    test("all golden traces classify identically through ClassifyJob") {
      import spark.implicits._
      val loaded = traceIds.map(GoldenCorpus.load)
      val batches = batch(loaded)
      info(s"${loaded.size} traces in ${batches.size} conflict-free batches")

      val failures = scala.collection.mutable.ArrayBuffer[String]()
      batches.foreach { ts =>
        val txDf = ts.flatMap(t => t.txs.map(tx => GTxRow(t.traceId, tx.hash,
          tx.account, tx.lt, tx.now, tx.origStatus, tx.endStatus, tx.aborted,
          tx.computeExitCode, tx.actionResultCode, tx.totalFees, tx.descr,
          tx.mcSeqno))).toDF()
        val msgDf = ts.flatMap(_.msgsByTx.toSeq.flatMap { case (h, ms) =>
          ms.map(m => GMsgRow(h, m.msgHash, m.direction, m.source,
            m.destination, m.value, m.opcode, m.bounce, m.bounced,
            m.createdLt, m.body, m.initState, m.seqNo, m.createdAt))
        }).toDF()
        val ifDim = ts.flatMap(_.interfaces).distinct
          .toDF("account", "interface")
        val jwDim = ts.flatMap(t => t.jettonWallets.map { case (a, master) =>
          (a, master, t.walletOwners.get(a)) }).distinct
          .toDF("account", "master", "owner")
        val nftDim = ts.flatMap(_.nftItems.map { case (a, i) =>
          (a, i.index, i.collection) }).distinct
          .toDF("account", "item_index", "collection")

        val dims = ClassifyDims(Some(ifDim), Some(jwDim), Some(nftDim))
        val actual = ClassifyJob.run(spark, txDf, msgDf, dims)
          .collect().groupBy(_.trace_id)
        // classification_state parity: the narrow-output path's per-trace
        // state (ok/failed/broken/unclassified) must equal the local
        // classifyStatedWith verdict on the same dims
        val distStates = ClassifyJob.runProjected(spark, txDf, msgDf, dims,
            Seq("trace_id", "classification_state"))
          .distinct().collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap

        ts.foreach { t =>
          val (_, localState) = Classifier.classifyStatedWith(t.traceId,
            t.txs, t.msgsByTx, ProtocolMatchers.registryWith(
              t.interfaces, t.jettonWallets, t.nftItems, t.walletOwners))
          if (!distStates.get(t.traceId).contains(localState))
            failures += s"trace ${t.traceId}: classification_state " +
              s"local=$localState spark=${distStates.get(t.traceId)}"
          val exp = GoldenCorpus.classify(t).sortBy(_.action_id)
          val act = actual.getOrElse(t.traceId, Array.empty[ActionRow])
            .toSeq.sortBy(_.action_id)
          if (exp != act) {
            val detail =
              if (exp.map(_.action_id) != act.map(_.action_id))
                s"action ids differ:\n  local=${exp.map(a => a.`type` + "/" + a.action_id)}\n  spark=${act.map(a => a.`type` + "/" + a.action_id)}"
              else exp.zip(act).collect { case (e, a) if e != a =>
                val fields = classOf[ActionRow].getDeclaredFields.map(_.getName)
                val diffs = fields.indices.collect {
                  case i if e.productElement(i) != a.productElement(i) =>
                    s"${fields(i)}: local=${e.productElement(i)} spark=${a.productElement(i)}"
                }
                s"action ${e.action_id} (${e.`type`}): ${diffs.mkString("; ")}"
              }.mkString("\n  ")
            failures += s"trace ${t.traceId}:\n  $detail"
          }
        }
      }
      assert(failures.isEmpty,
        s"${failures.size} traces diverge between local and distributed classify:\n" +
          failures.mkString("\n"))
    }
  } else {
    ignore("golden corpus unavailable (reference checkout missing)") {}
  }
}
