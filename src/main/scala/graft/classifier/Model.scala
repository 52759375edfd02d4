package graft.classifier

/** Lite row models for classification — the per-trace working set
  * (reference: indexer/indexer/events/blocks/utils/tree_utils.py:93-119
  * builds the same tree from ORM rows). Only the columns the matchers
  * consume; the full table schemas stay in graft.Schemas.
  */
case class MsgLite(
    msgHash: String,
    direction: String, // in | out
    source: Option[String],
    destination: Option[String],
    value: Long,
    opcode: Option[Long],
    bounce: Boolean,
    bounced: Boolean,
    createdLt: Option[Long],
    body: Option[String])

case class TxLite(
    hash: String,
    account: String,
    lt: Long,
    now: Int,
    origStatus: String,
    endStatus: String,
    aborted: Boolean,
    computeExitCode: Option[Int],
    actionResultCode: Option[Int],
    totalFees: Long,
    descr: String)

/** One node of the per-trace message tree: a transaction with its in-message
  * and out-messages; children are the transactions consuming those
  * out-messages. */
case class TxNode(
    tx: TxLite,
    inMsg: Option[MsgLite],
    outMsgs: Seq[MsgLite],
    children: Seq[TxNode]) {

  def bfs: Seq[TxNode] = {
    val buf = scala.collection.mutable.ArrayBuffer[TxNode](this)
    var i = 0
    while (i < buf.length) { buf ++= buf(i).children; i += 1 }
    buf.toSeq
  }
}

object TxTree {

  /** G3: txs + msgs of ONE trace → forest of TxNodes (roots = txs whose
    * in-message has no producer inside the trace). Runs in-JVM inside
    * flatMapGroups — traces are bounded (reference cutoff: 4000 nodes). */
  def build(txs: Seq[TxLite], msgs: Seq[MsgLite], byTx: Map[String, Seq[MsgLite]])
      : Seq[TxNode] = {
    val producerOf: Map[String, String] = (for {
      (txHash, ms) <- byTx.toSeq
      m <- ms if m.direction == "out"
    } yield m.msgHash -> txHash).toMap

    val childrenOf = scala.collection.mutable.Map[String, Vector[String]]()
    val roots = scala.collection.mutable.ArrayBuffer[String]()
    val txByHash = txs.map(t => t.hash -> t).toMap
    val sortedTxs = txs.sortBy(t => (t.lt, t.account))
    sortedTxs.foreach { t =>
      val in = byTx.getOrElse(t.hash, Nil).find(_.direction == "in")
      in.flatMap(m => producerOf.get(m.msgHash)).filter(_ != t.hash) match {
        case Some(p) => childrenOf(p) = childrenOf.getOrElse(p, Vector()) :+ t.hash
        case None => roots += t.hash
      }
    }
    def mk(hash: String): TxNode = {
      val t = txByHash(hash)
      val ms = byTx.getOrElse(hash, Nil)
      TxNode(t,
        ms.find(_.direction == "in"),
        ms.filter(_.direction == "out")
          .sortBy(m => (m.createdLt.isDefined, m.createdLt.getOrElse(0L))),
        childrenOf.getOrElse(hash, Vector()).map(mk))
    }
    roots.toSeq.map(mk)
  }
}

/** Well-known opcodes (public TL-B scheme constants, as used across the
  * reference's matchers — e.g. indexer/indexer/events/blocks/jettons.py). */
object Opcodes {
  val TextComment = 0x00000000L
  val EncryptedComment = 0x2167da4bL
  val JettonTransfer = 0x0f8a7ea5L
  val JettonInternalTransfer = 0x178d4519L
  val JettonNotify = 0x7362d09cL
  val JettonBurn = 0x595f07bcL
  val JettonBurnNotification = 0x7bdd97deL
  val Excesses = 0xd53276dbL
  val Bounce = 0xffffffffL
  val NftTransfer = 0x5fcc3d14L
  val NftOwnershipAssigned = 0x05138d91L

  /** opcode column is signed int32; compare on the unsigned 32-bit value. */
  def matches(op: Option[Long], wanted: Long): Boolean =
    op.exists(o => (o & 0xffffffffL) == (wanted & 0xffffffffL))
}
