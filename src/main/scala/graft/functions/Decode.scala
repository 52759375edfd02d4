package graft.functions

/** Standalone message-body decode surface — the engine analogue of the
  * reference's GET/POST /api/v3/decode (ton-index-go/main.go:1897-1978,
  * backed by the ton-marker dispatch): given a body BOC, identify the
  * message type by its 32-bit opcode and return the decoded fields as a
  * flat string map. Covers the high-frequency opcodes the matcher layer
  * already decodes (TEP-74/62, multisig, vesting, DNS, StonFi, DeDust,
  * mint calls, cocoon, wallet excesses/comments) — one entry per
  * `TlbDecoders` family.
  *
  * Field values are stringified deterministically (decimal numbers,
  * raw address strings, base64 cells) so the surface is oracle-checkable
  * end-to-end: build body → decode → compare fields by formula.
  */
object Decode {

  final case class Decoded(opcode: Long, name: String,
      fields: Map[String, String])

  private def f(kv: (String, Option[Any])*): Map[String, String] =
    kv.collect { case (k, Some(v)) => k -> v.toString }.toMap

  /** Decode a body BOC; None when the body has no 32-bit opcode. An
    * opcode with no registered decoder (or a decoder failure) yields
    * name="unknown" with the opcode still identified — mirroring the
    * reference's pass-through for unmarked bodies. */
  def decode(bodyB64: String): Option[Decoded] = {
    val s =
      try Boc.parseBase64(bodyB64).beginParse()
      catch { case scala.util.control.NonFatal(_) => return None }
    if (s.remainingBits < 32) return None
    val op = s.loadUint(32).toLong
    val d =
      try decodeOp(op, bodyB64)
      catch { case scala.util.control.NonFatal(_) => None }
    Some(d.getOrElse(Decoded(op, "unknown", Map.empty)))
  }

  import TlbDecoders._

  private def decodeOp(op: Long, b: String): Option[Decoded] = op match {
    case 0x00000000L =>
      comment(b).map(c => Decoded(op, "text_comment", Map("text" -> c)))
    case 0x0f8a7ea5L =>
      val d = jettonTransfer(b)
      Some(Decoded(op, "jetton_transfer", f(
        "query_id" -> Some(d.queryId), "amount" -> Some(d.amount),
        "destination" -> d.destination,
        "response_destination" -> d.responseDestination,
        "forward_ton_amount" -> Some(d.forwardTonAmount),
        "comment" -> d.comment)))
    case 0x178d4519L =>
      val d = jettonInternalTransfer(b)
      Some(Decoded(op, "jetton_internal_transfer", f(
        "query_id" -> Some(d.queryId), "amount" -> Some(d.amount),
        "from" -> d.from, "response" -> d.responseAddress)))
    case 0x595f07bcL =>
      val d = jettonBurn(b)
      Some(Decoded(op, "jetton_burn", f(
        "query_id" -> Some(d.queryId), "amount" -> Some(d.amount),
        "response_destination" -> d.responseDestination)))
    case 0x642b7d07L | 0x00000015L =>
      val d = jettonMintCall(b)
      Some(Decoded(op, "jetton_mint", f(
        "query_id" -> Some(d.queryId), "to_address" -> d.toAddress,
        "ton_amount" -> Some(d.tonAmount),
        "master_msg_jetton_amount" -> d.masterMsgJettonAmount)))
    case 0x5fcc3d14L =>
      val d = nftTransfer(b)
      Some(Decoded(op, "nft_transfer", f(
        "query_id" -> Some(d.queryId), "new_owner" -> d.newOwner,
        "response_destination" -> d.responseDestination,
        "forward_amount" -> Some(d.forwardAmount))))
    case 0x05138d91L =>
      val d = nftOwnershipAssigned(b)
      Some(Decoded(op, "nft_ownership_assigned", f(
        "query_id" -> Some(d.queryId), "prev_owner" -> d.prevOwner)))
    case 0xf718510fL =>
      val d = multisigNewOrder(b)
      Some(Decoded(op, "multisig_new_order", f(
        "query_id" -> Some(d.queryId), "order_seqno" -> Some(d.orderSeqno),
        "is_signer" -> Some(d.isSigner), "index" -> Some(d.signerIndex),
        "expiration_date" -> Some(d.expirationDate))))
    case 0x9c73fba2L =>
      val d = multisigInitOrder(b)
      Some(Decoded(op, "multisig_init_order", f(
        "query_id" -> Some(d.queryId), "threshold" -> Some(d.threshold),
        "expiration_date" -> Some(d.expirationDate),
        "approve_on_init" -> Some(d.approveOnInit),
        "signers" -> Some(d.signers.mkString(",")).filter(_.nonEmpty))))
    case 0xa762230fL =>
      val d = multisigApprove(b)
      Some(Decoded(op, "multisig_approve", f(
        "query_id" -> Some(d.queryId),
        "signer_index" -> Some(d.signerIndex))))
    case 0x75097f5dL =>
      val d = multisigExecute(b)
      Some(Decoded(op, "multisig_execute", f(
        "query_id" -> Some(d.queryId), "order_seqno" -> Some(d.orderSeqno),
        "expiration_date" -> Some(d.expirationDate),
        "approvals_num" -> Some(d.approvalsNum),
        "signers_hash" -> Some(d.signersHash))))
    case 0xa7733acdL =>
      val d = vestingSendMessage(b)
      Some(Decoded(op, "vesting_send_message", f(
        "query_id" -> Some(d.queryId), "send_mode" -> Some(d.sendMode),
        "message_destination" -> d.messageDestination,
        "message_value" -> d.messageValue)))
    case 0x7258a69bL =>
      val d = vestingAddWhitelist(b)
      Some(Decoded(op, "vesting_add_whitelist", f(
        "query_id" -> Some(d.queryId),
        "accounts_added" -> Some(d.accounts.mkString(","))
          .filter(_.nonEmpty))))
    case 0x25938561L =>
      val d = stonfiSwap(b)
      Some(Decoded(op, "stonfi_swap", f(
        "query_id" -> Some(d.queryId), "amount" -> Some(d.amount),
        "min_out" -> Some(d.minOut), "token_wallet" -> d.tokenWallet,
        "from_user" -> d.fromUser, "from_real_user" -> d.fromRealUser)))
    case 0x4eb1f0f9L =>
      val d = changeDnsRecord(b)
      Some(Decoded(op, "change_dns_record", f(
        "query_id" -> Some(d.queryId), "key" -> Some(d.keyHex),
        "value_schema" -> d.valueSchema, "value" -> d.value)))
    case 0x01f3835dL =>
      val d = ptonTransfer(b)
      Some(Decoded(op, "pton_transfer", f(
        "query_id" -> Some(d.queryId), "ton_amount" -> Some(d.tonAmount),
        "refund_address" -> d.refundAddress)))
    case 0xd53276dbL =>
      Some(Decoded(op, "excesses", f("query_id" -> Some(opQueryId(b)))))
    case 0x7362d09cL =>
      Some(Decoded(op, "jetton_notify",
        f("query_id" -> Some(opQueryId(b)))))
    case 0x47d54391L =>
      Some(Decoded(op, "tonstakers_deposit",
        f("query_id" -> Some(opQueryId(b)))))
    case 0x319b0cdcL =>
      Some(Decoded(op, "tonstakers_withdraw",
        f("query_id" -> Some(opQueryId(b)))))
    case 0xf93bb43fL =>
      val d = stonfiPaymentRequest(b)
      Some(Decoded(op, "stonfi_payment_request", f(
        "query_id" -> Some(d.queryId), "owner" -> d.owner,
        "exit_code" -> Some(d.exitCode),
        "amount0_out" -> Some(d.amount0Out),
        "amount1_out" -> Some(d.amount1Out))))
    case 0x657b54f5L =>
      val d = stonfiV2PayTo(b)
      Some(Decoded(op, "stonfi_v2_pay_to", f(
        "exit_code" -> Some(d.exitCode),
        "amount0_out" -> Some(d.amount0Out), "token0" -> d.token0,
        "amount1_out" -> Some(d.amount1Out), "token1" -> d.token1)))
    case 0x9c610de3L =>
      val d = dedustSwapNotification(b)
      Some(Decoded(op, "dedust_swap_notification", f(
        "asset_in" -> Some(d.assetIn), "asset_out" -> Some(d.assetOut),
        "amount_in" -> Some(d.amountIn), "amount_out" -> Some(d.amountOut),
        "sender" -> d.sender)))
    case 0xc59a7cd3L =>
      Some(Decoded(op, "cocoon_worker_payout",
        f("query_id" -> Some(opQueryId(b)))))
    case 0x5cfc6b87L =>
      Some(Decoded(op, "cocoon_client_top_up",
        f("query_id" -> Some(opQueryId(b)))))
    case _ => None
  }
}
