package graft.classifier

import graft.functions.Boc
import graft.functions.Boc.Slice

/** G9 step 2: unknown-trace external unroll (reference
  * `init_from_external`, indexer/indexer/events/event_processing.py:
  * 157-194) — when a trace is a bare wallet external with no classified
  * actions, parse the wallet payload and forge the "ghost" child messages
  * the wallet was ordering, then classify those. One row → N synthetic
  * rows: the UDTF-shaped operator of SURVEY §2.11, realized as a flatMap
  * inside the per-trace group.
  *
  * Wallet layout parsed (public wallet-v3/v4 scheme): signature(512b),
  * subwallet_id(32), valid_until(32), seqno(32), [op(8) — v4 only], then
  * per out-message: send_mode(8) + ^MessageRelaxed. Each forged message
  * is the int_msg_info header of that ref.
  */
object ExternalUnroll {

  final case class GhostMsg(
      destination: Option[String], value: Long, opcode: Option[Long],
      bounce: Boolean, body: Option[String] = None,
      // base64 of the payload cell's representation hash — the reference
      // keys ghost messages on it: msg_hash = b64((cellHashB64 + idx))
      // (event_processing.py:166-167, externals.py:102)
      cellHashB64: String = "")

  /** Parse a wallet external body; None if no known layout fits. Tries
    * the same ladder as the reference (messages/externals.py:140-158):
    * v3 → v4 → v5r1; every forged message must parse as int_msg_info or
    * the candidate layout is rejected. Returns (wallet_type, messages). */
  def ghostMessages(bodyB64: String): Option[(String, Seq[GhostMsg])] = {
    val root =
      try Boc.parseBase64(bodyB64)
      catch { case scala.util.control.NonFatal(_) => return None }

    // v3/v4 share the ghost-relevant shape: after the 608-bit header the
    // payload messages ride the REFS; send-mode bits in the main slice
    // are ignored, and a ref that fails the int_msg_info parse is
    // SKIPPED, not fatal (the reference's PayloadMessage leaves
    // info=None and init_from_external `continue`s —
    // externals.py:63-101, event_processing.py:162-164). Because the v3
    // constructor succeeds on any body with ≥608 bits, it also consumes
    // v4 (op byte ignored) and even v5 bodies — v5's action list then
    // parses as zero valid messages, matching the reference's ladder
    // order exactly (externals.py:141-158).
    def v3or4(walletType: String): Option[(String, Seq[GhostMsg])] = try {
      val s = root.beginParse()
      if (s.remainingBits < 512 + 96) return None
      s.loadUint(512) // signature
      s.loadUint(32); s.loadUint(32); s.loadUint(32) // subwallet/valid/seqno
      val out = scala.collection.mutable.ArrayBuffer[GhostMsg]()
      while (s.remainingRefs > 0) {
        val cell = s.loadRef()
        try out += parseMessageRelaxed(cell)
        catch { case scala.util.control.NonFatal(_) => () } // skip ref
      }
      if (out.isEmpty) None else Some((walletType, out.toSeq))
    } catch { case scala.util.control.NonFatal(_) => None }

    // W5R1: opcode(32) wallet_id(32) valid_until(32) seqno(32) then a
    // maybe-ref linked list — each node: ^next ^payload
    // (messages/externals.py:125-138)
    def v5r1: Option[(String, Seq[GhostMsg])] = try {
      val s = root.beginParse()
      if (s.remainingBits < 128) return None
      s.loadUint(32); s.loadUint(32); s.loadUint(32); s.loadUint(32)
      val out = scala.collection.mutable.ArrayBuffer[GhostMsg]()
      var cur: Option[Boc.Cell] =
        if (s.remainingBits >= 1 && s.loadBit() && s.remainingRefs > 0)
          Some(s.loadRef())
        else None
      while (cur.isDefined && out.length < 255) {
        val ns = cur.get.beginParse()
        if (ns.remainingBits == 0 && ns.remainingRefs < 2) cur = None
        else {
          val next = ns.loadRef()
          val cell = ns.loadRef()
          try out += parseMessageRelaxed(cell)
          catch { case scala.util.control.NonFatal(_) => () }
          cur = Some(next)
        }
      }
      if (out.isEmpty) None else Some(("v5r1", out.toSeq))
    } catch { case scala.util.control.NonFatal(_) => None }

    v3or4("v3").orElse(v3or4("v4")).orElse(v5r1)
  }

  /** int_msg_info$0 ihr_disabled bounce bounced src:MsgAddress
    * dest:MsgAddress value:Coins ... body (opcode = first 32 bits of the
    * remaining body if present). */
  private def parseMessageRelaxed(cell: Boc.Cell): GhostMsg = {
    val s = cell.beginParse()
    val tag = s.loadBit()
    require(!tag, "only int_msg_info ghost messages supported")
    s.loadBit() // ihr_disabled
    val bounce = s.loadBit()
    s.loadBit() // bounced
    s.loadAddress() // src (usually addr_none in relaxed form)
    val dest = s.loadAddress()
    val value = s.loadCoins()
    // skip extra-currencies dict bit, ihr_fee, fwd_fee
    if (s.remainingBits >= 1 && s.loadBit()) s.loadRef() // extra currencies
    // retain the ordered body itself (ref or inline rest-of-slice): the
    // failed-external fallback matcher decodes it (TEP-74 and friends) —
    // the reference keeps the full forged message for the same reason
    // (init_from_external; FallbackJettonTransferBlockMatcher)
    val bodyCell: Option[Boc.Cell] =
      if (s.remainingBits >= 4 + 64 + 32 + 2) {
        s.loadCoins(); s.loadCoins() // ihr_fee, fwd_fee
        s.loadUint(64); s.loadUint(32) // created_lt, created_at
        s.loadBit() // no init
        val inRef = s.loadBit()
        if (inRef && s.remainingRefs > 0) Some(s.loadRef())
        else if (s.remainingBits > 0 || s.remainingRefs > 0) {
          val bld = new Boc.Builder()
          while (s.remainingBits > 0) bld.storeBit(s.loadBit())
          while (s.remainingRefs > 0) bld.storeRef(s.loadRef())
          Some(bld.build())
        } else None
      } else None
    val opcode = bodyCell.flatMap { c =>
      val bs = c.beginParse()
      if (bs.remainingBits >= 32) Some(bs.loadUint(32).toLong) else None
    }
    GhostMsg(dest, value.toLong, opcode, bounce,
      bodyCell.map(Boc.serializeBase64(_)),
      cellHashB64 = Boc.cellHashBase64(cell))
  }

  /** Forge child TxNodes from a wallet external root (ghost children get
    * synthetic hashes; they carry only message-level information). */
  def unroll(root: TxNode): Option[TxNode] = {
    val body = root.inMsg.flatMap(_.body)
    if (root.children.nonEmpty || body.isEmpty) return None
    ghostMessages(body.get).map { case (_, ghosts) =>
      val children = ghosts.zipWithIndex.map { case (g, i) =>
        // forged msg hash (keys the ghost action id): b64 of the payload
        // cell-hash-b64 concatenated with the payload index, exactly as
        // the reference builds it (event_processing.py:167)
        val forgedHash = java.util.Base64.getEncoder.encodeToString(
          (g.cellHashB64 + i.toString).getBytes("UTF-8"))
        val m = MsgLite(forgedHash, "in",
          Some(root.tx.account), g.destination, g.value, g.opcode,
          g.bounce, bounced = false, createdLt = Some(root.tx.lt),
          body = g.body, createdAt = Some(root.tx.now.toLong))
        // the reference's ghost EventNode wraps the REAL wallet tx and is
        // born failed (event_processing.py:186-191): account/lt mirror the
        // wallet tx; aborted=true makes the seeded block failed, and the
        // ghost: hash marker lets the serializer report the real tx hash
        // while excluding the never-reached destination from accounts
        TxNode(
          TxLite(s"ghost:${root.tx.hash}:$i",
            root.tx.account,
            root.tx.lt, root.tx.now, "active", "active",
            aborted = true, None, None, 0L, "ord"),
          Some(m), Nil, Nil)
      }
      root.copy(children = children)
    }
  }
}
