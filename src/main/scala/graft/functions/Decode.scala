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
    // no field decoder: identify by the reference's class inventory —
    // many reference message classes are opcode markers with no parser,
    // so a named empty-field result IS full parity for them
    Some(d.getOrElse(Decoded(op,
      OpcodeNames.names.getOrElse(op & 0xffffffffL, "unknown"), Map.empty)))
  }

  import TlbDecoders._

  /** Every opcode handled by a decodeOp arm — the registered FIELD
    * decoders. An opcode outside this set can only ever decode to a
    * name-only marker (fields = Map.empty), so harvest paths that need
    * field VALUES (TlbDecoders.resolverAddressKeys, the classify dims
    * branch) skip the body parse entirely when the message's opcode is
    * not a member — the opcode-pruned dispatch. At chain scale most
    * bodies carry app-specific or wallet opcodes with no registered
    * decoder, so the prune removes the BOC parse from the hot path
    * without changing any output (the skipped parse could only have
    * produced an empty field map).
    *
    * MUST stay in sync with the decodeOp match: DecodeSpec extracts the
    * case-arm literals from this file's source and asserts set
    * equality, so adding a decoder without updating this set fails the
    * build. */
  val FieldDecoderOpcodes: Set[Long] = Set(
    0x00000000L, 0x00000001L, 0x00000002L, 0x00000003L, 0x0000000fL,
    0x00000011L, 0x00000015L, 0x00000021L, 0x00000031L, 0x00000081L,
    0x0000011aL, 0x0000011fL, 0x00000211L, 0x00000311L, 0x0000031fL,
    0x0000211aL, 0x0000211fL, 0x0000311aL, 0x0000311dL, 0x0000311fL,
    0x0168d4b7L, 0x01f3835dL, 0x022fa189L, 0x05138d91L, 0x08e7d036L,
    0x0a9577f0L, 0x0bf3f447L, 0x0c0ffedeL, 0x0f8a7ea5L, 0x11aefd51L,
    0x178d4519L, 0x2565934cL, 0x25938561L, 0x26ed7f65L, 0x27756729L,
    0x2e3034efL, 0x2fcb26a2L, 0x319b0cdcL, 0x370fec51L, 0x37c096dfL,
    0x3c41d0b2L, 0x3cb38090L, 0x3ebe5431L, 0x40e108d6L, 0x42a0fb43L,
    0x441c39edL, 0x4468de77L, 0x453443a6L, 0x46ca335aL, 0x474f86cfL,
    0x47d54391L, 0x487a8e81L, 0x499a9262L, 0x4d725d2cL, 0x4e737e4dL,
    0x4eb1f0f9L, 0x4ed14b65L, 0x4f7c5789L, 0x530b5f2cL, 0x5388cd88L,
    0x563c1d96L, 0x595f07bcL, 0x5cfc6b87L, 0x5fcc3d14L, 0x636a4391L,
    0x642b7d07L, 0x65448ff4L, 0x657b54f5L, 0x6664de2aL, 0x6a1f6a60L,
    0x6bc79e7eL, 0x6bdcbeb8L, 0x6c6c2080L, 0x6d49eaf2L, 0x706c7567L,
    0x71860e80L, 0x7258a69bL, 0x7362d09cL, 0x75097f5dL, 0x7610e6ebL,
    0x77a80ef3L, 0x78d9f109L, 0x81702ef8L, 0x8473b408L, 0x8b771735L,
    0x8d94a79aL, 0x927c7cb5L, 0x92b11c18L, 0x9713f187L, 0x9c610de3L,
    0x9c69f376L, 0x9c73fba2L, 0x9c7924baL, 0xa040ad28L, 0xa1daa96dL,
    0xa2370f61L, 0xa2b5fbaeL, 0xa35cb580L, 0xa762230fL, 0xa7733acdL,
    0xa7fb58f8L, 0xa9357034L, 0xad4eb6f5L, 0xafaf283eL, 0xb1b0b7e2L,
    0xb2c1b6e3L, 0xb30c7310L, 0xb51d5a01L, 0xb56b9598L, 0xbb63ff93L,
    0xbe5a7595L, 0xc0ffee00L, 0xc0ffee01L, 0xc0ffee02L, 0xc0ffee03L,
    0xc0ffee04L, 0xc0ffee05L, 0xc0ffee06L, 0xc0ffee07L, 0xc0ffee10L,
    0xc0ffee11L, 0xc0ffee12L, 0xc0ffee20L, 0xc0ffee21L, 0xc0ffee22L,
    0xc0ffee23L, 0xc0ffee24L, 0xc0ffee25L, 0xc0ffee26L, 0xc0ffee27L,
    0xc0ffee28L, 0xc0ffee29L, 0xc0ffee2aL, 0xc0ffee2bL, 0xc0ffee2cL,
    0xc0ffee2dL, 0xc0ffee2eL, 0xc0ffee30L, 0xc0ffee31L, 0xc0ffee32L,
    0xc0ffee33L, 0xc0ffee34L, 0xc0ffee35L, 0xc0ffee36L, 0xc0ffeea0L,
    0xc146134dL, 0xc45f9f3bL, 0xc4a1ae54L, 0xc52ed8d4L, 0xc59a7cd3L,
    0xc68ebc7bL, 0xca444ce6L, 0xcaae25a1L, 0xcb03bfafL, 0xd53276dbL,
    0xd55e4686L, 0xd5ecca2aL, 0xd68a4ac1L, 0xd73ac09dL, 0xda068e78L,
    0xe33b9873L, 0xe34b1c60L, 0xe511abc7L, 0xed58b0b2L, 0xee51ce51L,
    0xefd711e1L, 0xf172e6c2L, 0xf4c354c9L, 0xf5f26a36L, 0xf718510fL,
    0xf93bb43fL, 0xf9471134L, 0xfafa6cc1L)

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
      val d = jettonNotify(b)
      Some(Decoded(op, "jetton_notify", f(
        "query_id" -> Some(d.queryId), "amount" -> Some(d.amount),
        "sender" -> d.sender, "forward_payload" -> d.forwardPayload)))
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
    case 0x6664de2aL =>
      // StonFi v2 router→pool swap. The reference's StonfiSwapV2 class
      // declares opcode 0x657b54f5 but is dispatched on-wire at
      // 0x6664de2a (blocks/swaps.py:235,327 — the matcher's swap_opcode;
      // 0x657b54f5 is pay_to). Layout messages/swaps.py:129-175:
      // qid from_user left right ^dex_payload[transferred_op
      // token_wallet1 refund excesses deadline ^swap_body[min_out
      // receiver fwd_gas maybe ^custom refund_fwd_gas maybe ^refund
      // ref_fee ref_addr]], plus the cross-pool custom-payload walk
      // (get_pool_accounts_recursive, swaps.py:177-203) whose addresses
      // feed the dims harvest via resolverAddressKeys.
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val fromUser = s.loadAddress()
      val left = s.loadCoins(); val right = s.loadCoins()
      val dex = s.loadRef().beginParse()
      val transferredOp = dex.loadUint(32)
      val wallet1 = dex.loadAddress()
      val refund = dex.loadAddress()
      val excesses = dex.loadAddress()
      val deadline = dex.loadUint(64)
      val sw = dex.loadRef().beginParse()
      val minOut = sw.loadCoins()
      val receiver = sw.loadAddress()
      val fwdGas = sw.loadCoins()
      val custom = if (sw.loadBit()) Some(sw.loadRef()) else None
      val refundFwdGas = sw.loadCoins()
      if (sw.loadBit()) sw.loadRef()
      val refFee = sw.loadUint(16)
      val refAddr = sw.loadAddress()
      // cross-pool wallet chain: sum_type ∈ {swap, 0x69cf1a5b} → addr,
      // then ^cross_swap[min_out coins, coins, maybe ^next]
      val pools = scala.collection.mutable.ArrayBuffer[String]()
      wallet1.foreach(pools += _)
      var cur = custom.map(_.beginParse())
      var going = cur.isDefined
      while (going) {
        going = false
        val c = cur.get
        if (c.remainingBits >= 32) {
          val st = c.loadUint(32).toLong
          if (st == 0x6664de2aL || st == 0x69cf1a5bL) {
            c.loadAddress().foreach(pools += _)
            if (c.remainingRefs > 0) {
              val cross = c.loadRef().beginParse()
              cross.loadCoins(); cross.loadCoins()
              if (cross.remainingRefs > 0 && cross.loadBit()) {
                cur = Some(cross.loadRef().beginParse()); going = true
              }
            }
          }
        }
      }
      Some(Decoded(op, "stonfi_swap_v2", f(
        "query_id" -> Some(qid), "from_user" -> fromUser,
        "left_amount" -> Some(left), "right_amount" -> Some(right),
        "transferred_op" -> Some(transferredOp),
        "token_wallet1" -> wallet1,
        "refund_address" -> refund, "excesses_address" -> excesses,
        "tx_deadline" -> Some(deadline),
        "min_out" -> Some(minOut), "receiver" -> receiver,
        "fwd_gas" -> Some(fwdGas), "refund_fwd_gas" -> Some(refundFwdGas),
        "ref_fee" -> Some(refFee), "ref_address" -> refAddr,
        "pool_accounts" ->
          (if (pools.isEmpty) None else Some(pools.mkString(","))))))
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

    // ----------------------------------------------------- evaa lending
    case 0x00000001L =>
      val d = evaaSupplyMaster(b)
      Some(Decoded(op, "evaa_supply_master", f(
        "query_id" -> Some(d.queryId),
        "supply_amount" -> Some(d.supplyAmount),
        "recipient_address" -> d.recipient)))
    case 0x00000002L =>
      val d = evaaWithdrawMaster(b)
      Some(Decoded(op, "evaa_withdraw_master", f(
        "query_id" -> Some(d.queryId), "asset_id" -> Some(d.assetIdHex),
        "amount" -> Some(d.amount), "recipient_address" -> d.recipient)))
    case 0x0000011aL =>
      val d = evaaSupplySuccess(b)
      Some(Decoded(op, "evaa_supply_success", f(
        "query_id" -> Some(d.queryId), "owner_address" -> d.owner,
        "asset_id" -> Some(d.assetIdHex),
        "amount_supplied" -> Some(d.amountSupplied))))
    case 0x00000211L =>
      Some(Decoded(op, "evaa_withdraw_collateralized", f(
        "withdraw_amount_current" -> Some(evaaWithdrawCollateralized(b)))))
    case 0x00000311L =>
      // liquidate_satisfied#311 qid owner liquidator transferred_asset
      // ^[delta_loan liquidatable protocol_gift new_user_loan
      //   collateral_asset delta_collateral collateral_reward
      //   (min_collateral new_user_collateral fwd_ton ^payload)?] —
      // the full reference field list (messages/evaa.py:317-368); the
      // tail quadruple is optional on remaining bits, like the reference.
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val owner = s.loadAddress(); val liquidator = s.loadAddress()
      val transferred = s.loadUint(256)
      val ref = s.loadRef().beginParse()
      val deltaLoan = ref.loadInt(64)
      val liquidatable = ref.loadUint(64)
      val gift = ref.loadUint(64)
      val newUserLoan = ref.loadInt(64)
      val coll = ref.loadUint(256)
      val deltaColl = ref.loadInt(64)
      val collReward = ref.loadUint(64)
      val tail =
        if (ref.remainingBits > 0)
          Some((ref.loadUint(64), ref.loadInt(64), ref.loadUint(64)))
        else None
      Some(Decoded(op, "evaa_liquidate_satisfied", f(
        "query_id" -> Some(qid), "owner_address" -> owner,
        "liquidator_address" -> liquidator,
        "transferred_asset_id" -> Some("0x" + transferred.toString(16)),
        "delta_loan_principal" -> Some(deltaLoan),
        "liquidatable_amount" -> Some(liquidatable),
        "protocol_gift" -> Some(gift),
        "new_user_loan_principal" -> Some(newUserLoan),
        "collateral_asset_id" -> Some("0x" + coll.toString(16)),
        "delta_collateral_principal" -> Some(deltaColl),
        "collateral_reward" -> Some(collReward),
        "min_collateral_amount" -> tail.map(_._1),
        "new_user_collateral_principal" -> tail.map(_._2),
        "forward_ton_amount" -> tail.map(_._3))))

    // ------------------------------------------------------------ tonco
    case 0x2e3034efL =>
      val d = toncoCreatePool(b)
      Some(Decoded(op, "tonco_create_pool", f(
        "jetton_wallet0" -> d.jettonWallet0,
        "jetton_wallet1" -> d.jettonWallet1,
        "tick_spacing" -> Some(d.tickSpacing),
        "initial_price_x96" -> Some(d.initialPriceX96),
        "protocol_fee" -> Some(d.protocolFee),
        "lp_fee_base" -> Some(d.lpFeeBase),
        "jetton0_minter" -> d.jetton0Minter,
        "jetton1_minter" -> d.jetton1Minter)))
    case 0x441c39edL =>
      val d = toncoPoolInit(b)
      Some(Decoded(op, "tonco_pool_init", f(
        "query_id" -> Some(d.queryId),
        "tick_spacing" -> Some(d.tickSpacing),
        "initial_price_x96" -> Some(d.initialPriceX96),
        "pool_active" -> Some(d.poolActive))))
    case 0xa1daa96dL =>
      // full ROUTERV3_PAY_TO depth (messages/swaps.py:307-404): after
      // the coinsinfo maybe-ref, exit 200 carries a maybe swap-info cell
      // [liquidity:u128 price_sqrt:u160 tick:i24 fee_growth_0:i256
      // fee_growth_1:i256] and exit 201 a maybe burn-info cell
      // [nft_index:u64 liquidity_burned:u128 tick_lower/upper/burn:i24]
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val r0 = s.loadAddress(); val r1 = s.loadAddress()
      val exit = s.loadUint(32).toLong
      val seqno = s.loadUint(64)
      val coins =
        if (s.remainingBits >= 1 && s.loadBit()) {
          val cs = s.loadRef().beginParse()
          Some((cs.loadCoins(), cs.loadAddress(), cs.loadCoins(),
            cs.loadAddress()))
        } else None
      val swapInfo =
        if (exit == 200L && s.remainingBits >= 1 && s.loadBit()) {
          val is = s.loadRef().beginParse()
          Some((is.loadUint(128), is.loadUint(160), is.loadInt(24),
            is.loadInt(256), is.loadInt(256)))
        } else None
      val burnInfo =
        if (exit == 201L && s.remainingBits >= 1 && s.loadBit()) {
          val is = s.loadRef().beginParse()
          Some((is.loadUint(64), is.loadUint(128), is.loadInt(24),
            is.loadInt(24), is.loadInt(24)))
        } else None
      Some(Decoded(op, "tonco_pay_to", f(
        "query_id" -> Some(qid), "receiver0" -> r0, "receiver1" -> r1,
        "exit_code" -> Some(exit), "seqno" -> Some(seqno),
        "amount0" -> Some(coins.map(_._1).getOrElse(BigInt(0))),
        "jetton0_address" -> coins.flatMap(_._2),
        "amount1" -> Some(coins.map(_._3).getOrElse(BigInt(0))),
        "jetton1_address" -> coins.flatMap(_._4),
        "liquidity" -> swapInfo.map(_._1),
        "price_sqrt" -> swapInfo.map(_._2),
        "tick_swap" -> swapInfo.map(_._3),
        "fee_growth_global_0x128" -> swapInfo.map(_._4),
        "fee_growth_global_1x128" -> swapInfo.map(_._5),
        "nft_index" -> burnInfo.map(_._1),
        "liquidity_burned" -> burnInfo.map(_._2),
        "tick_lower" -> burnInfo.map(_._3),
        "tick_upper" -> burnInfo.map(_._4),
        "tick_burn" -> burnInfo.map(_._5))))

    // ------------------------------------------------------------ tgbtc
    case 0x77a80ef3L =>
      val d = tgbtcMintEvent(b)
      Some(Decoded(op, "tgbtc_mint_event", f(
        "amount" -> Some(d.amount), "recipient" -> d.recipient,
        "bitcoin_txid" -> Some(d.bitcoinTxidHex))))
    case 0xca444ce6L =>
      val d = tgbtcBurnEvent(b)
      Some(Decoded(op, "tgbtc_burn_event", f(
        "amount" -> Some(d.amount), "sender" -> d.sender,
        "pegout_address" -> d.pegout)))
    case 0x27756729L =>
      val d = tgbtcNewKeyEvent(b)
      Some(Decoded(op, "tgbtc_new_key_event", f(
        "amount" -> Some(d.amount), "pubkey" -> Some(d.pubkeyHex),
        "pegout_address" -> d.pegout)))
    case 0x453443a6L =>
      val d = tgbtcDkgEvent(b)
      Some(Decoded(op, "tgbtc_dkg_completed_event", f(
        "timestamp" -> Some(d.timestamp),
        "internal_pubkey" -> Some(d.pubkeyHex))))

    // ----------------------------------------------------------- coffee
    case 0xc0ffee00L =>
      Some(Decoded(op, "coffee_swap_native", f(
        "amount" -> Some(coffeeSwapNativeAmount(b)))))
    case 0xc0ffee21L =>
      val d = coffeePayoutInternal(b)
      Some(Decoded(op, "coffee_payout_internal", f(
        "recipient" -> d.recipient, "amount" -> Some(d.amount))))
    case 0xc0ffee30L =>
      val d = coffeeSwapEvent(b)
      Some(Decoded(op, "coffee_swap_successful_event", f(
        "input_asset" -> d.inputAsset,
        "input_amount" -> Some(d.inputAmount),
        "output_amount" -> Some(d.outputAmount))))

    // ----------------------------------------------------------- jvault
    case 0x499a9262L =>
      Some(Decoded(op, "jvault_unstake_jettons", f(
        "query_id" -> Some(opQueryId(b)),
        "jettons_to_unstake" -> Some(opQidCoins(b)))))
    case 0x0168d4b7L =>
      Some(Decoded(op, "jvault_unstake_request", f(
        "query_id" -> Some(opQueryId(b)),
        "jettons_to_unstake" -> Some(opQidCoins(b)))))
    case 0x78d9f109L =>
      Some(Decoded(op, "jvault_claim_rewards", f(
        "query_id" -> Some(opQueryId(b)),
        "jettons_to_claim" -> Some(jvaultClaimWallets(b).mkString(","))
          .filter(_.nonEmpty))))

    // ----------------------------------------------------------- cocoon
    case 0xbb63ff93L | 0xefd711e1L =>
      val d = cocoonCharge(b)
      val name =
        if (op == 0xbb63ff93L) "cocoon_charge" else "cocoon_grant_refund"
      Some(Decoded(op, name, f(
        "query_id" -> Some(d.queryId),
        "new_tokens_used" -> Some(d.newTokensUsed),
        "expected_address" -> d.expectedAddress)))
    case 0xa040ad28L | 0xf5f26a36L =>
      val d = cocoonPayoutPayload(b)
      val name = if (op == 0xa040ad28L) "cocoon_payout_payload"
        else "cocoon_last_payout_payload"
      Some(Decoded(op, name, f(
        "query_id" -> Some(d.queryId), "new_tokens" -> Some(d.newTokens),
        "expected_address" -> d.expectedAddress)))
    case 0x4d725d2cL =>
      val d = cocoonWorkerRequest(b)
      Some(Decoded(op, "cocoon_worker_proxy_request", f(
        "query_id" -> Some(d.queryId), "owner_address" -> d.owner,
        "state" -> Some(d.state), "tokens" -> Some(d.tokens))))
    case 0xf172e6c2L =>
      val d = cocoonExtClientTopUp(b)
      Some(Decoded(op, "cocoon_ext_client_top_up", f(
        "query_id" -> Some(d.queryId), "top_up_amount" -> Some(d.amount),
        "send_excesses_to" -> d.sender)))
    case 0xc45f9f3bL =>
      val d = cocoonOwnerClientRegister(b)
      Some(Decoded(op, "cocoon_owner_client_register", f(
        "query_id" -> Some(d.queryId), "nonce" -> Some(d.nonce),
        "send_excesses_to" -> d.owner)))
    case 0x6d49eaf2L =>
      val d = cocoonUnregisterProxy(b)
      Some(Decoded(op, "cocoon_unregister_proxy", f(
        "query_id" -> Some(d.queryId), "seqno" -> Some(d.seqno))))
    case 0xa9357034L =>
      val d = cocoonChangeSecretHash(b)
      Some(Decoded(op, "cocoon_client_change_secret_hash", f(
        "query_id" -> Some(d.queryId),
        "new_secret_hash" -> Some(d.newSecretHashHex))))
    case 0x6a1f6a60L =>
      val d = cocoonIncreaseStake(b)
      Some(Decoded(op, "cocoon_owner_client_increase_stake", f(
        "query_id" -> Some(d.queryId), "new_stake" -> Some(d.newStake),
        "send_excesses_to" -> d.sendExcessesTo)))
    case 0xfafa6cc1L =>
      val d = cocoonRequestRefund(b)
      Some(Decoded(op, "cocoon_owner_client_request_refund", f(
        "query_id" -> Some(d.queryId),
        "send_excesses_to" -> d.sendExcessesTo)))
    case 0xd55e4686L =>
      val d = dedustDepositTonToVault(b)
      Some(Decoded(op, "dedust_deposit_ton_to_vault", f(
        "amount" -> d.amount,
        "asset0" -> Some(d.asset0), "asset1" -> Some(d.asset1),
        "asset0_target" -> Some(d.asset0Target),
        "asset1_target" -> Some(d.asset1Target))))
    case 0xed58b0b2L =>
      val d = tonstakersNftBurnNotification(b)
      Some(Decoded(op, "ton_stakers_nft_burn_notification", f(
        "amount" -> Some(d.amount), "owner" -> d.owner)))
    case 0xb56b9598L =>
      val d = dedustDepositToPool(b)
      Some(Decoded(op, "dedust_deposit_liquidity_to_pool", f(
        "owner" -> d.owner,
        "asset0" -> Some(d.asset0), "amount0" -> Some(d.asset0Amount),
        "asset1" -> Some(d.asset1), "amount1" -> Some(d.asset1Amount))))
    case 0x530b5f2cL =>
      val d = toncoStartBurn(b)
      Some(Decoded(op, "tonco_pool_v3_start_burn", f(
        "burned_index" -> Some(d.burnedIndex),
        "liquidity_to_burn" -> Some(d.liquidityToBurn),
        "tick_lower" -> Some(d.tickLower), "tick_upper" -> Some(d.tickUpper))))
    case 0x3ebe5431L =>
      val d = toncoAddLiquidity(b)
      Some(Decoded(op, "tonco_account_v3_add_liquidity", f(
        "amount0" -> Some(d.newAmount0), "amount1" -> Some(d.newAmount1),
        "liquidity" -> Some(d.liquidity),
        "tick_lower" -> Some(d.tickLower), "tick_upper" -> Some(d.tickUpper))))
    case 0xd5ecca2aL =>
      val d = toncoPositionInit(b)
      Some(Decoded(op, "tonco_position_nft_v3_position_init", f(
        "liquidity" -> Some(d.liquidity), "nft_index" -> Some(d.nftIndex))))
    case 0xc0ffee25L =>
      val d = coffeeCreatePoolRequest(b)
      Some(Decoded(op, "coffee_create_pool_request", f(
        "query_id" -> Some(d.queryId),
        "amount1" -> Some(d.amount1), "amount2" -> Some(d.amount2),
        "tx_initiator" -> d.txInitiator)))
    case 0xc0ffee33L =>
      val d = coffeeDepositSuccess(b)
      Some(Decoded(op, "coffee_deposit_liquidity_successful_event", f(
        "query_id" -> Some(d.queryId),
        "amount1" -> Some(d.amount1), "amount2" -> Some(d.amount2),
        "lp_amount" -> Some(d.lpAmount))))
    case 0xc0ffee35L =>
      val d = coffeeWithdrawalEvent(b)
      Some(Decoded(op, "coffee_liquidity_withdrawal_event", f(
        "amount1" -> Some(d.amount1), "amount2" -> Some(d.amount2),
        "lp_amount" -> Some(d.lpAmount))))
    case 0xc0ffee06L =>
      Some(Decoded(op, "coffee_create_vault", f(
        "asset" -> coffeeCreateVault(b))))
    case 0xb30c7310L =>
      val d = coffeeStakingClaimRewards(b)
      Some(Decoded(op, "coffee_staking_claim_rewards", f(
        "query_id" -> Some(d.queryId), "jetton_wallet" -> d.jettonWallet,
        "jetton_amount" -> Some(d.jettonAmount), "receiver" -> d.receiver)))
    case 0x2fcb26a2L =>
      Some(Decoded(op, "nft_discovery", f(
        "query_id" -> Some(opQueryId(b)))))
    case 0x8b771735L =>
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val idx = s.loadUint(256)
      Some(Decoded(op, "nft_report_static_data", f(
        "query_id" -> Some(qid), "index" -> Some(idx),
        "collection" -> s.loadAddress())))
    case 0x487a8e81L =>
      // teleitem_start_auction#487a8e81 qid ^auction_config[beneficiary
      // initial_min_bid:Coins max_bid:Coins min_bid_step:u8
      // min_extend_time:u32 duration:u32] (messages/nft.py:105-135);
      // a malformed config degrades to qid-only like the reference's
      // except-arm (beneficiary None, amounts 0).
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val cfg =
        try {
          val c = s.loadRef().beginParse()
          val ben = c.loadAddress()
          Some((ben, c.loadCoins(), c.loadCoins(), c.loadUint(8),
            c.loadUint(32), c.loadUint(32)))
        } catch { case scala.util.control.NonFatal(_) => None }
      Some(Decoded(op, "teleitem_start_auction", f(
        "query_id" -> Some(qid),
        "beneficiary_address" -> cfg.flatMap(_._1),
        "initial_min_bid" -> cfg.map(_._2),
        "max_bid" -> cfg.map(_._3),
        "min_bid_step" -> cfg.map(_._4),
        "min_extend_time" -> cfg.map(_._5),
        "duration" -> cfg.map(_._6))))
    case 0x370fec51L | 0x4ed14b65L =>
      val name = if (op == 0x370fec51L) "auction_fill_up"
        else "dns_release_balance"
      val qid = try Some(opQueryId(b))
        catch { case scala.util.control.NonFatal(_) => None }
      Some(Decoded(op, name, f("query_id" -> qid)))
    case 0x474f86cfL | 0xad4eb6f5L =>
      val name = if (op == 0x474f86cfL) "dedust_payout"
        else "dedust_payout_from_pool"
      Some(Decoded(op, name, f(
        "query_id" -> Some(opQueryId(b)),
        "amount" -> Some(dedustPayoutAmount(b)))))
    case 0xafaf283eL =>
      Some(Decoded(op, "multisig_approve_rejected", f(
        "exit_code" -> Some(multisigApproveRejectedExitCode(b)))))
    case 0xd68a4ac1L =>
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "jvault_receive_jettons", f(
        "query_id" -> Some(s.loadUint(64)),
        "min_deposit" -> Some(s.loadCoins()),
        "max_deposit" -> Some(s.loadCoins()))))
    case 0xc0ffee27L =>
      val d = coffeeDepositRequest(b)
      Some(Decoded(op, "coffee_create_liquidity_depository_request", f(
        "amount" -> Some(d.amount), "pool_first" -> d.poolFirst,
        "pool_second" -> d.poolSecond, "sender" -> d.sender)))
    case 0x46ca335aL =>
      Some(Decoded(op, "tonco_position_nft_v3_position_burn", f(
        "query_id" -> Some(opQueryId(b)),
        "nft_owner" -> toncoPositionBurnOwner(b))))
    case 0x3cb38090L =>
      val d = lzVerifyCallback(b)
      Some(Decoded(op, "lz_uln_connection_verify_callback", f(
        "nonce" -> Some(d.nonce), "status" -> Some(d.status))))
    case 0x5388cd88L =>
      val p = lzChannelCommitPacket(b)
      Some(Decoded(op, "lz_channel_commit_packet", f(
        "nonce" -> Some(p.nonce), "guid" -> Some(p.guid),
        "src_eid" -> Some(p.path.srcEid), "dst_eid" -> Some(p.path.dstEid),
        "src_oapp" -> Some(p.path.srcOapp),
        "dst_oapp" -> Some(p.path.dstOapp))))
    // cocoon ops whose whole body is op + query_id (messages/cocoon.py)
    case 0x2565934cL | 0x927c7cb5L | 0x563c1d96L =>
      val name = op match {
        case 0x2565934cL => "cocoon_return_excesses_back"
        case 0x927c7cb5L => "cocoon_register_proxy"
        case _ => "cocoon_reset_root"
      }
      Some(Decoded(op, name, f("query_id" -> Some(opQueryId(b)))))
    case 0xda068e78L =>
      // owner_client_withdraw: qid + send_excesses_to:address
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "cocoon_owner_client_withdraw", f(
        "query_id" -> Some(s.loadUint(64)),
        "send_excesses_to" -> s.loadAddress())))
    case 0xc0ffee32L | 0x6bc79e7eL | 0xc0ffee07L | 0xc0ffee36L =>
      val name = op match {
        case 0xc0ffee32L => "coffee_payout"
        case 0x6bc79e7eL => "coffee_mev_protect_hold_funds"
        case 0xc0ffee07L => "coffee_withdraw_deposit"
        case _ => "coffee_notification"
      }
      Some(Decoded(op, name, f("query_id" -> Some(opQueryId(b)))))
    case 0xc0ffee31L =>
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val asset = coffeeAsset(s)
      Some(Decoded(op, "coffee_swap_failed_event", f(
        "query_id" -> Some(qid), "input" -> asset,
        "input_amount" -> Some(s.loadCoins()))))
    case 0x37c096dfL =>
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "stonfi_v2_provide_liquidity", f(
        "query_id" -> Some(s.loadUint(64)),
        "from_user" -> s.loadAddress(),
        "amount1" -> Some(s.loadCoins()), "amount2" -> Some(s.loadCoins()))))
    case 0xb2c1b6e3L =>
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val owner = s.loadAddress()
      val a0 = s.loadCoins(); val a1 = s.loadCoins()
      s.loadCoins(); s.loadCoins()
      Some(Decoded(op, "tonco_pool_v3_mint", f(
        "query_id" -> Some(qid), "owner" -> owner,
        "amount0" -> Some(a0), "amount1" -> Some(a1),
        "liquidity" -> Some(s.loadUint(128)),
        "tick_lower" -> Some(s.loadInt(24)),
        "tick_upper" -> Some(s.loadInt(24)))))
    case 0x40e108d6L =>
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val poolType = if (!s.loadBit()) "volatile" else "stable"
      val a0 = loadDedustAsset(s); val a1 = loadDedustAsset(s)
      val minLp = s.loadCoins()
      Some(Decoded(op, "dedust_deposit_liquidity_forward_payload", f(
        "pool_type" -> Some(poolType),
        "asset0" -> Some(a0), "asset1" -> Some(a1),
        "min_lp_amount" -> Some(minLp),
        "asset0_target_balance" -> Some(s.loadCoins()),
        "asset1_target_balance" -> Some(s.loadCoins()))))
    case 0x706c7567L =>
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "subscription_payment_request", f(
        "query_id" -> Some(s.loadUint(64)),
        "grams" -> Some(s.loadCoins()))))
    case 0x65448ff4L =>
      Some(Decoded(op, "cocoon_client_proxy_request", f(
        "query_id" -> Some(opQueryId(b)),
        "refund_granted_coins" -> cocoonRefundGrantedCoins(b))))
    case 0xa2b5fbaeL =>
      val d = lzChannelSendCallback(b)
      Some(Decoded(op, "lz_channel_send_callback", f(
        "send_request_id" -> Some(d.sendRequestId),
        "nonce" -> Some(d.packet.nonce), "guid" -> Some(d.packet.guid),
        "dst_eid" -> Some(d.packet.path.dstEid),
        "dst_oapp" -> Some(d.packet.path.dstOapp),
        "native_fee" -> Some(d.nativeFee), "zro_fee" -> Some(d.zroFee))))

    // ------------------------------------------ evaa lending, long tail
    // (messages/evaa.py field lists; asset ids serialize as 0x-hex like
    // block_tree_serializer.py:689)
    case 0x00000003L =>
      // liquidate_master#3 qid borrower liquidator collateral_asset_id
      // min_collateral include_user_code liquidate_incoming_amount
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val borrower = s.loadAddress(); val liquidator = s.loadAddress()
      val coll = s.loadUint(256)
      s.loadUint(64); s.loadInt(2)
      Some(Decoded(op, "evaa_liquidate_master", f(
        "query_id" -> Some(qid), "borrower_address" -> borrower,
        "liquidator_address" -> liquidator,
        "collateral_asset_id" -> Some("0x" + coll.toString(16)),
        "liquidate_incoming_amount" -> Some(s.loadUint(64)))))
    case 0x0000000fL =>
      // revert_call#f qid owner_address ^revert_body
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "evaa_revert_call", f(
        "query_id" -> Some(s.loadUint(64)),
        "owner_address" -> s.loadAddress())))
    case 0x00000011L =>
      // supply_user#11 qid asset_id supply_amount_current ...
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val aid = s.loadUint(256)
      Some(Decoded(op, "evaa_supply_user", f(
        "query_id" -> Some(qid),
        "asset_id" -> Some("0x" + aid.toString(16)),
        "supply_amount_current" -> Some(s.loadUint(64)))))
    case 0x00000021L =>
      // withdraw_user#21 qid asset_id amount s_rate b_rate recipient
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val aid = s.loadUint(256)
      val amount = s.loadUint(64)
      s.loadUint(64); s.loadUint(64)
      Some(Decoded(op, "evaa_withdraw_user", f(
        "query_id" -> Some(qid),
        "asset_id" -> Some("0x" + aid.toString(16)),
        "withdraw_amount_current" -> Some(amount),
        "recipient_address" -> s.loadAddress())))
    case 0x00000031L =>
      // liquidate_user#31 qid dict dict ^[^prices collateral_asset_id
      // min_collateral liquidator transferred_asset_id transferred_amount]
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      // two HashmapE collections = Maybe ^Cell each
      if (s.loadBit()) s.loadRef()
      if (s.loadBit()) s.loadRef()
      val ref = s.loadRef().beginParse()
      ref.loadRef() // prices_packed
      val coll = ref.loadUint(256)
      ref.loadUint(64)
      val liquidator = ref.loadAddress()
      val transferred = ref.loadUint(256)
      Some(Decoded(op, "evaa_liquidate_user", f(
        "query_id" -> Some(qid),
        "collateral_asset_id" -> Some("0x" + coll.toString(16)),
        "liquidator_address" -> liquidator,
        "transferred_asset_id" -> Some("0x" + transferred.toString(16)),
        "transferred_amount" -> Some(ref.loadUint(64)))))
    case 0x00000081L =>
      // idle_user#81 qid tokens_keys:(Maybe ^Cell) originator_address
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      if (s.loadBit()) s.loadRef()
      Some(Decoded(op, "evaa_idle_user", f(
        "query_id" -> Some(qid),
        "originator_address" -> s.loadAddress())))
    case 0x0000011fL =>
      // supply_fail#11f qid owner asset_id amount ...
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val owner = s.loadAddress()
      val aid = s.loadUint(256)
      Some(Decoded(op, "evaa_supply_fail", f(
        "query_id" -> Some(qid), "owner_address" -> owner,
        "asset_id" -> Some("0x" + aid.toString(16)),
        "amount" -> Some(s.loadUint(64)))))
    case 0x0000031fL =>
      // liquidate_unsatisfied#31f qid owner liquidator transferred_asset
      // ^[amount collateral_asset min_collateral fwd ^payload error:u32]
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val owner = s.loadAddress(); val liquidator = s.loadAddress()
      val transferred = s.loadUint(256)
      val ref = s.loadRef().beginParse()
      val amount = ref.loadUint(64)
      val coll = ref.loadUint(256)
      val minColl = ref.loadUint(64)
      val fwdTon = ref.loadUint(64)
      ref.loadRef()
      val err = evaaLiquidationErrorReason(ref)
      Some(Decoded(op, "evaa_liquidate_unsatisfied", f(
        "query_id" -> Some(qid), "owner_address" -> owner,
        "liquidator_address" -> liquidator,
        "transferred_asset_id" -> Some("0x" + transferred.toString(16)),
        "transferred_amount" -> Some(amount),
        "collateral_asset_id" -> Some("0x" + coll.toString(16)),
        "min_collateral_amount" -> Some(minColl),
        "forward_ton_amount" -> Some(fwdTon),
        "error" -> Some(err))))
    case 0x0000211aL =>
      // withdraw_success#211a qid asset_id principal_amount ...
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val aid = s.loadUint(256)
      Some(Decoded(op, "evaa_withdraw_success", f(
        "query_id" -> Some(qid),
        "asset_id" -> Some("0x" + aid.toString(16)),
        "principal_amount" -> Some(s.loadInt(64)))))
    case 0x0000211fL =>
      // withdraw_fail#211f qid asset_id principal_amount
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val aid = s.loadUint(256)
      Some(Decoded(op, "evaa_withdraw_fail", f(
        "query_id" -> Some(qid),
        "asset_id" -> Some("0x" + aid.toString(16)),
        "principal_amount" -> Some(s.loadInt(64)))))
    case 0x0000311aL =>
      // liquidate_success#311a qid transferred_asset delta_loan ts tb
      // collateral_asset delta_collateral ...
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val transferred = s.loadUint(256)
      val deltaLoan = s.loadInt(64)
      s.loadUint(64); s.loadUint(64)
      val coll = s.loadUint(256)
      Some(Decoded(op, "evaa_liquidate_success", f(
        "query_id" -> Some(qid),
        "transferred_asset_id" -> Some("0x" + transferred.toString(16)),
        "delta_loan_principal" -> Some(deltaLoan),
        "collateral_asset_id" -> Some("0x" + coll.toString(16)),
        "delta_collateral_principal" -> Some(s.loadInt(64)))))
    case 0x0000311dL =>
      // liquidate_success_report#311d qid transferred_asset amount
      // collateral_asset collateral_reward
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val transferred = s.loadUint(256)
      val amount = s.loadUint(64); val coll = s.loadUint(256)
      Some(Decoded(op, "evaa_liquidate_success_report", f(
        "query_id" -> Some(qid),
        "transferred_asset_id" -> Some("0x" + transferred.toString(16)),
        "transferred_amount" -> Some(amount),
        "collateral_asset_id" -> Some("0x" + coll.toString(16)),
        "collateral_reward" -> Some(s.loadUint(64)))))
    case 0x0000311fL =>
      // liquidate_fail#311f qid transferred_asset delta_loan
      // collateral_asset delta_collateral
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val transferred = s.loadUint(256)
      val deltaLoan = s.loadInt(64); val coll = s.loadUint(256)
      Some(Decoded(op, "evaa_liquidate_fail", f(
        "query_id" -> Some(qid),
        "transferred_asset_id" -> Some("0x" + transferred.toString(16)),
        "delta_loan_principal" -> Some(deltaLoan),
        "collateral_asset_id" -> Some("0x" + coll.toString(16)),
        "delta_collateral_principal" -> Some(s.loadInt(64)))))

    // ------------------------------------- tonco v3 management/payloads
    // (messages/liquidity.py, messages/swaps.py)
    case 0x0bf3f447L | 0x42a0fb43L | 0x4e737e4dL | 0xb1b0b7e2L =>
      val name = op match {
        case 0x0bf3f447L => "tonco_account_v3_refund_me"
        case 0x42a0fb43L => "tonco_reset_gas"
        case 0x4e737e4dL => "tonco_pool_v3_unlock"
        case _ => "tonco_pool_v3_lock"
      }
      Some(Decoded(op, name, f("query_id" -> Some(opQueryId(b)))))
    case 0x4468de77L =>
      // POOLV3_FUND_ACCOUNT payload: other_jetton_wallet amount0 amount1
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "tonco_pool_v3_fund_account", f(
        "other_jetton_wallet" -> s.loadAddress(),
        "amount0" -> Some(s.loadCoins()),
        "amount1" -> Some(s.loadCoins()))))
    case 0x6bdcbeb8L =>
      // POOLV3_SET_FEE qid protocol_fee lp_fee_base lp_fee_current
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "tonco_pool_v3_set_fee", f(
        "query_id" -> Some(s.loadUint(64)),
        "protocol_fee" -> Some(s.loadUint(16)),
        "lp_fee_base" -> Some(s.loadUint(16)),
        "lp_fee_current" -> Some(s.loadUint(16)))))
    case 0x81702ef8L =>
      // POOLV3_MINT (min_and_refund) qid amount0 amount1 recipient
      // liquidity tickLower tickUpper
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val a0 = s.loadCoins(); val a1 = s.loadCoins()
      val recipient = s.loadAddress()
      Some(Decoded(op, "tonco_pool_v3_min_and_refund", f(
        "query_id" -> Some(qid),
        "amount0_funded" -> Some(a0), "amount1_funded" -> Some(a1),
        "recipient" -> recipient,
        "liquidity" -> Some(s.loadUint(128)),
        "tick_lower" -> Some(s.loadInt(24)),
        "tick_upper" -> Some(s.loadInt(24)))))
    case 0xd73ac09dL =>
      // POOLV3_BURN qid recipient burned_index liquidity tick_lower
      // tick_upper liquidity_to_burn ^old_fees ^new_fees
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val recipient = s.loadAddress()
      val idx = s.loadUint(64); val liq = s.loadUint(128)
      val tl = s.loadInt(24); val tu = s.loadInt(24)
      val toBurn = s.loadUint(128)
      // fee-growth snapshots ride as two ref cells of u256 pairs
      // (messages/liquidity.py:219-225)
      val oldFees = s.loadRef().beginParse()
      val newFees = s.loadRef().beginParse()
      Some(Decoded(op, "tonco_pool_v3_burn", f(
        "query_id" -> Some(qid), "recipient" -> recipient,
        "burned_index" -> Some(idx), "liquidity" -> Some(liq),
        "tick_lower" -> Some(tl), "tick_upper" -> Some(tu),
        "liquidity_to_burn" -> Some(toBurn),
        "fee_growth_inside_0_last_x128" -> Some(oldFees.loadUint(256)),
        "fee_growth_inside_1_last_x128" -> Some(oldFees.loadUint(256)),
        "fee_growth_inside_0_current_x128" -> Some(newFees.loadUint(256)),
        "fee_growth_inside_1_current_x128" -> Some(newFees.loadUint(256)))))
    case 0xa7fb58f8L =>
      // POOLV3_SWAP rides the same opcode in two shapes (messages/
      // swaps.py): the internal router→pool message ToncoPoolV3Swap
      // (qid owner source ^params[amount sqrt_price_limit:u160 min_out]
      // ^payloads[target ok_fwd maybe^ ret_fwd maybe^], blocks/swaps.py
      // :866 parses bodies with it) and the SDK in-transfer payload
      // ToncoPoolV3SwapPayload (wallet u160 min_out recipient). Try the
      // internal shape first, fall back to the payload shape.
      val internal =
        try {
          val s = Boc.parseBase64(b).beginParse()
          s.loadUint(32)
          val qid = s.loadUint(64)
          val owner = s.loadAddress()
          val source = s.loadAddress()
          val params = s.loadRef().beginParse()
          val amount = params.loadCoins()
          val price = params.loadUint(160)
          val minOut = params.loadCoins()
          val pay = s.loadRef().beginParse()
          val target = pay.loadAddress()
          val okFwd = pay.loadCoins()
          if (pay.loadBit()) pay.loadRef()
          val retFwd = pay.loadCoins()
          Some(Decoded(op, "tonco_pool_v3_swap", f(
            "query_id" -> Some(qid), "owner_address" -> owner,
            "source_wallet" -> source, "amount" -> Some(amount),
            "price_limit_sqrt" -> Some(price),
            "min_out_amount" -> Some(minOut),
            "target_address" -> target,
            "ok_forward_amount" -> Some(okFwd),
            "ret_forward_amount" -> Some(retFwd))))
        } catch { case scala.util.control.NonFatal(_) => None }
      internal.orElse {
        val s = Boc.parseBase64(b).beginParse()
        s.loadUint(32)
        val wallet = s.loadAddress()
        val price = s.loadUint(160)
        val minOut = s.loadCoins()
        Some(Decoded(op, "tonco_pool_v3_swap", f(
          "target_router_jetton_wallet" -> wallet,
          "price_limit_sqrt" -> Some(price),
          "min_out_amount" -> Some(minOut),
          "recipient" -> s.loadAddress())))
      }

    // ------------------------------------------------ layerzero, getgems
    case 0xcaae25a1L =>
      // LZ_RECEIVE_EXECUTE_CALLBACK: packet at refs[0].refs[0]
      // (messages/layerzero.py LayerZeroOappExecuteCallback)
      val root = Boc.parseBase64(b)
      val p = lzPacket(root.refs(0).refs(0))
      Some(Decoded(op, "lz_oapp_execute_callback", f(
        "nonce" -> Some(p.nonce), "guid" -> Some(p.guid),
        "src_eid" -> Some(p.path.srcEid), "dst_eid" -> Some(p.path.dstEid),
        "src_oapp" -> Some(p.path.srcOapp),
        "dst_oapp" -> Some(p.path.dstOapp))))
    case 0xe33b9873L =>
      // layerzero event: qid donation_nanos origin ^action_data, where
      // action_data = header(134)=_headerInfo ones(216) topic:u256
      // ^body ^initialStorage and body is the OFTSentSucceed shape
      // topic:u256 ^mdguid (mdguid: header(116) ones(234) guid:u256 ^md).
      // The reference parses the whole chain unconditionally
      // (messages/layerzero.py:303-392 LayerZeroEventMsgBody →
      // LayerZeroEventAction → …OFTSentSucceed → LayerZeroMdGuid), so a
      // malformed nested cell fails the decode here too.
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val donation = s.loadCoins()
      val origin = s.loadAddress()
      val ad = s.loadRef().beginParse()
      require(ad.loadUint(134) ==
        BigInt("7850279558805522911016931325"), "lz event action header")
      require(ad.loadInt(216) == BigInt(-1), "lz event action filler")
      val topic = ad.loadUint(256)
      val body = ad.loadRef().beginParse()
      val bodyTopic = body.loadUint(256)
      val mg = body.loadRef().beginParse()
      require(mg.loadUint(116) ==
        BigInt("5847552683615412884211067"), "lz mdguid header")
      require(mg.loadInt(234) == BigInt(-1), "lz mdguid filler")
      Some(Decoded(op, "lz_event", f(
        "query_id" -> Some(qid),
        "donation_nanos" -> Some(donation),
        "origin" -> origin,
        "topic" -> Some(topic),
        "event_body_topic" -> Some(bodyTopic),
        "guid" -> Some("0x" + mg.loadUint(256).toString(16)))))
    case 0x6c6c2080L =>
      // getgems sale_update#6c6c2080 qid new_full_price new_mp_fee
      // new_royalty_amount (messages/getgems.py SaleUpdateMessage)
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "sale_update", f(
        "query_id" -> Some(s.loadUint(64)),
        "new_full_price" -> Some(s.loadCoins()),
        "new_mp_fee" -> Some(s.loadCoins()),
        "new_royalty_amount" -> Some(s.loadCoins()))))
    // -------------------------------------------- coffee, long tail
    // (messages/coffee.py TL-B comments; Asset via coffeeAsset)
    case 0xc0ffee01L =>
      // swap_extra#c0ffee01 qid _:SwapStepParams params:^SwapParams
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val step = coffeeSwapStep(s)
      val sp = coffeeSwapParams(s.loadRef().beginParse())
      Some(Decoded(op, "coffee_swap_extra", f(
        "query_id" -> Some(qid), "pool" -> Some(step._1),
        "min_output_amount" -> Some(step._2),
        "deadline" -> Some(sp._1), "recipient" -> sp._2,
        "referral" -> sp._3)))
    case 0xc0ffee02L =>
      // create_pool_native#c0ffee02 qid amount params:PoolParams ...
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val amount = s.loadCoins()
      val pp = coffeePoolParams(s)
      Some(Decoded(op, "coffee_create_pool_native", f(
        "query_id" -> Some(qid), "amount" -> Some(amount),
        "pool_first" -> pp.first, "pool_second" -> pp.second,
        "amm" -> Some(pp.amm))))
    case 0xc0ffee03L =>
      // create_pool_extra#c0ffee03 qid params creation_params
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val pp = coffeePoolParams(s)
      Some(Decoded(op, "coffee_create_pool_extra", f(
        "query_id" -> Some(qid),
        "pool_first" -> pp.first, "pool_second" -> pp.second,
        "amm" -> Some(pp.amm))))
    case 0xc0ffee04L =>
      // deposit_liquidity_native#c0ffee04 qid amount
      // params:DepositLiquidityParams (inline trimmed + pool params)
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val amount = s.loadCoins()
      val recipient = s.loadAddress()
      s.loadBit() // use_recipient_on_failure
      val pp = coffeePoolParams(s)
      Some(Decoded(op, "coffee_deposit_liquidity_native", f(
        "query_id" -> Some(qid), "amount" -> Some(amount),
        "recipient" -> recipient,
        "pool_first" -> pp.first, "pool_second" -> pp.second)))
    case 0xc0ffee05L =>
      // deposit_liquidity_extra#c0ffee05 qid params
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val recipient = s.loadAddress()
      s.loadBit()
      val pp = coffeePoolParams(s)
      Some(Decoded(op, "coffee_deposit_liquidity_extra", f(
        "query_id" -> Some(qid), "recipient" -> recipient,
        "pool_first" -> pp.first, "pool_second" -> pp.second)))
    case 0xc0ffee10L =>
      // swap_jetton#c0ffee10 _:SwapStepParams params:^SwapParams
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val step = coffeeSwapStep(s)
      val sp = coffeeSwapParams(s.loadRef().beginParse())
      Some(Decoded(op, "coffee_swap_jetton", f(
        "pool" -> Some(step._1), "min_output_amount" -> Some(step._2),
        "deadline" -> Some(sp._1), "recipient" -> sp._2,
        "referral" -> sp._3)))
    case 0xc0ffee11L =>
      // create_pool_jetton#c0ffee11 params creation_params
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val pp = coffeePoolParams(s)
      Some(Decoded(op, "coffee_create_pool_jetton", f(
        "pool_first" -> pp.first, "pool_second" -> pp.second,
        "amm" -> Some(pp.amm))))
    case 0xc0ffee12L =>
      // deposit_liquidity_jetton#c0ffee12 params
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val recipient = s.loadAddress()
      s.loadBit()
      val pp = coffeePoolParams(s)
      Some(Decoded(op, "coffee_deposit_liquidity_jetton", f(
        "recipient" -> recipient,
        "pool_first" -> pp.first, "pool_second" -> pp.second)))
    case 0xc0ffee20L =>
      // swap_internal#c0ffee20 qid _:SwapStepInternalParams
      // params:^SwapParams proof:^Cell
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val prevAmount = s.loadCoins()
      val hint = if (s.loadBit())
        coffeeAsset(s.loadRef().beginParse()) else None
      val minOut = s.loadCoins()
      if (s.loadBit()) s.loadRef() // next step
      val sp = coffeeSwapParams(s.loadRef().beginParse())
      Some(Decoded(op, "coffee_swap_internal", f(
        "query_id" -> Some(qid),
        "previous_amount" -> Some(prevAmount),
        "previous_asset_hint" -> hint,
        "min_output_amount" -> Some(minOut),
        "recipient" -> sp._2)))
    case 0xc0ffee22L =>
      // deploy#c0ffee22 qid code:^ data:^ action:(Maybe ^)
      Some(Decoded(op, "coffee_deploy", f(
        "query_id" -> Some(opQueryId(b)))))
    case 0xc0ffee23L =>
      // create_pool_creator_request#c0ffee23 qid amount params
      // creation_params sender proof
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val amount = s.loadCoins()
      val pp = coffeePoolParams(s)
      val recipient = s.loadAddress() // creation_params.public.recipient
      s.loadBit()
      if (s.loadBit()) s.loadRef()
      s.loadBit(); if (s.loadBit()) s.loadRef()
      Some(Decoded(op, "coffee_create_pool_creator_request", f(
        "query_id" -> Some(qid), "amount" -> Some(amount),
        "pool_first" -> pp.first, "pool_second" -> pp.second,
        "recipient" -> recipient, "sender" -> s.loadAddress())))
    case 0xc0ffee24L =>
      // create_pool_creator_internal#c0ffee24 qid asset:Asset amount
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val asset = coffeeAsset(s)
      Some(Decoded(op, "coffee_create_pool_creator_internal", f(
        "query_id" -> Some(qid), "asset" -> asset,
        "amount" -> Some(s.loadCoins()))))
    case 0xc0ffee26L =>
      // create_pool_internal#c0ffee26 qid amount1 amount2 tx_initiator
      // recipient use_recipient_on_failure ...
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val a1 = s.loadCoins(); val a2 = s.loadCoins()
      val initiator = s.loadAddress()
      Some(Decoded(op, "coffee_create_pool_internal", f(
        "query_id" -> Some(qid), "amount1" -> Some(a1),
        "amount2" -> Some(a2), "tx_initiator" -> initiator,
        "recipient" -> s.loadAddress())))
    case 0xc0ffee28L =>
      // create_liquidity_depository_internal#c0ffee28 qid asset amount
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val asset = coffeeAsset(s)
      Some(Decoded(op, "coffee_create_liquidity_depository_internal", f(
        "query_id" -> Some(qid), "asset" -> asset,
        "amount" -> Some(s.loadCoins()))))
    case 0xc0ffee29L =>
      // deposit_liquidity_internal#c0ffee29 qid amount1 amount2
      // tx_initiator params proof
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val a1 = s.loadCoins(); val a2 = s.loadCoins()
      Some(Decoded(op, "coffee_deposit_liquidity_internal", f(
        "query_id" -> Some(qid), "amount1" -> Some(a1),
        "amount2" -> Some(a2), "tx_initiator" -> s.loadAddress())))
    case 0xc0ffee2aL =>
      Some(Decoded(op, "coffee_create_vault_internal", f(
        "query_id" -> Some(opQueryId(b)))))
    case 0xc0ffee2bL =>
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "coffee_update_pool_internal", f(
        "query_id" -> Some(s.loadUint(64)),
        "excesses_receiver" -> s.loadAddress())))
    case 0xc0ffee2cL =>
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "coffee_activate_vault_internal", f(
        "query_id" -> Some(s.loadUint(64)),
        "wallet" -> s.loadAddress())))
    case 0xc0ffee2dL =>
      // withdraw_internal#c0ffee2d qid asset amount receiver
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val asset = coffeeAsset(s)
      val amount = s.loadCoins()
      Some(Decoded(op, "coffee_withdraw_internal", f(
        "query_id" -> Some(qid), "asset" -> asset,
        "amount" -> Some(amount), "receiver" -> s.loadAddress())))
    case 0xc0ffee2eL =>
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "coffee_update_contract_internal", f(
        "query_id" -> Some(s.loadUint(64)),
        "excesses_receiver" -> s.loadAddress())))
    case 0xc0ffee34L =>
      // deposit_liquidity_failed_event#c0ffee34 qid amount1 amount2
      // min_lp total_supply reserves
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val a1 = s.loadCoins(); val a2 = s.loadCoins()
      val minLp = s.loadCoins(); val total = s.loadCoins()
      Some(Decoded(op, "coffee_deposit_liquidity_failed_event", f(
        "query_id" -> Some(qid), "amount1" -> Some(a1),
        "amount2" -> Some(a2), "min_lp_amount" -> Some(minLp),
        "total_supply" -> Some(total),
        "input_reserve" -> Some(s.loadCoins()),
        "output_reserve" -> Some(s.loadCoins()))))
    case 0xc0ffeea0L =>
      // service_fee#c0ffeea0 (no fields)
      Some(Decoded(op, "coffee_service_fee", Map.empty))
    case 0x0a9577f0L =>
      // staking_rewards_updated#0a9577f0 qid jetton_wallet duration
      // finish_at rewards_rate
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val wallet = s.loadAddress()
      val dur = s.loadUint(64); val finish = s.loadUint(64)
      Some(Decoded(op, "coffee_staking_rewards_updated", f(
        "query_id" -> Some(qid), "jetton_wallet" -> wallet,
        "duration" -> Some(dur), "finish_at" -> Some(finish),
        "rewards_rate" -> Some(s.loadCoins()))))
    case 0x0c0ffedeL =>
      // staking_lock#c0ffede period_id:uint32 (forward payload)
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "coffee_staking_lock", f(
        "period_id" -> Some(s.loadUint(32)))))
    case 0xbe5a7595L =>
      // staking_initialize#be5a7595 qid owner ^jetton_data ^position ^periods
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "coffee_staking_initialize", f(
        "query_id" -> Some(s.loadUint(64)),
        "owner" -> s.loadAddress())))
    case 0xcb03bfafL =>
      // staking_position_withdraw_3#cb03bfaf qid jetton_wallet amount owner
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val wallet = s.loadAddress()
      val amount = s.loadCoins()
      Some(Decoded(op, "coffee_staking_position_withdraw", f(
        "query_id" -> Some(qid), "jetton_wallet" -> wallet,
        "jetton_amount" -> Some(amount), "owner" -> s.loadAddress())))
    case 0xee51ce51L =>
      // mev_protect_failed_swap#ee51ce51 qid recipient
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "coffee_mev_protect_failed_swap", f(
        "query_id" -> Some(s.loadUint(64)),
        "recipient" -> s.loadAddress())))
    case 0xf9471134L =>
      // staking_deposit#f9471134 qid sender jetton_amount from_user period
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val sender = s.loadAddress()
      val amount = s.loadCoins()
      val fromUser = s.loadAddress()
      Some(Decoded(op, "coffee_staking_deposit", f(
        "query_id" -> Some(qid), "sender" -> sender,
        "jetton_amount" -> Some(amount), "from_user" -> fromUser,
        "period_id" -> Some(s.loadUint(32)))))
    // -------------------------------------------- cocoon, long tail
    // (messages/cocoon.py struct comments — names per the reference
    // class inventory)
    case 0x26ed7f65L | 0x7610e6ebL | 0xb51d5a01L | 0xc4a1ae54L |
        0x636a4391L | 0xe511abc7L =>
      // qid + one address payload; the address field name varies
      val (name, fieldName) = op match {
        case 0x26ed7f65L => ("cocoon_owner_worker_register", "send_excesses_to")
        case 0x7610e6ebL => ("cocoon_ext_proxy_payout_request", "send_excesses_to")
        case 0xb51d5a01L => ("cocoon_owner_proxy_close", "send_excesses_to")
        case 0xc4a1ae54L => ("cocoon_change_owner", "new_owner_address")
        case 0x636a4391L => ("cocoon_close_request_payload", "expected_my_address")
        case _ => ("cocoon_close_complete_request_payload", "expected_my_address")
      }
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      Some(Decoded(op, name, f(
        "query_id" -> Some(qid), fieldName -> s.loadAddress())))
    case 0x3c41d0b2L | 0x71860e80L | 0x8d94a79aL | 0x92b11c18L |
        0xc146134dL | 0xe34b1c60L =>
      // qid + uint256 type-hash payload
      val (name, fieldName) = op match {
        case 0x3c41d0b2L => ("cocoon_del_proxy_type", "proxy_hash")
        case 0x71860e80L => ("cocoon_add_proxy_type", "proxy_hash")
        case 0x8d94a79aL => ("cocoon_del_worker_type", "worker_hash")
        case 0x92b11c18L => ("cocoon_del_model_type", "model_hash")
        case 0xc146134dL => ("cocoon_add_model_type", "model_hash")
        case _ => ("cocoon_add_worker_type", "worker_hash")
      }
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      Some(Decoded(op, name, f(
        "query_id" -> Some(qid),
        fieldName -> Some("0x" + s.loadUint(256).toString(16)))))
    case 0x11aefd51L | 0x4f7c5789L | 0xa2370f61L =>
      // qid + code/data cell refs (not surfaced)
      val name = op match {
        case 0x11aefd51L => "cocoon_upgrade_code"
        case 0x4f7c5789L => "cocoon_upgrade_full"
        case _ => "cocoon_upgrade_contracts"
      }
      Some(Decoded(op, name, f("query_id" -> Some(opQueryId(b)))))
    case 0xc68ebc7bL | 0xf4c354c9L =>
      // coins + send_excesses_to (no query id)
      val name = if (op == 0xc68ebc7bL) "cocoon_client_proxy_refund_granted"
        else "cocoon_client_proxy_refund_force"
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val coins = s.loadCoins()
      Some(Decoded(op, name, f(
        "coins" -> Some(coins), "send_excesses_to" -> s.loadAddress())))
    case 0x08e7d036L =>
      // worker_proxy_payout_request: worker_part proxy_part excesses
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val worker = s.loadCoins(); val proxy = s.loadCoins()
      Some(Decoded(op, "cocoon_worker_proxy_payout_request", f(
        "worker_part" -> Some(worker), "proxy_part" -> Some(proxy),
        "send_excesses_to" -> s.loadAddress())))
    case 0x022fa189L =>
      // change_params: qid price worker_fee proxy_delay client_delay
      // min_proxy_stake min_client_stake
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64)
      val price = s.loadCoins(); val fee = s.loadCoins()
      val pDelay = s.loadUint(32); val cDelay = s.loadUint(32)
      Some(Decoded(op, "cocoon_change_params", f(
        "query_id" -> Some(qid), "price_per_token" -> Some(price),
        "worker_fee_per_token" -> Some(fee),
        "proxy_delay_before_close" -> Some(pDelay),
        "client_delay_before_close" -> Some(cDelay),
        "min_proxy_stake" -> Some(s.loadCoins()),
        "min_client_stake" -> Some(s.loadCoins()))))
    case 0x8473b408L =>
      // change_secret_hash_and_top_up: qid amount new_hash excesses
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val amount = s.loadCoins()
      val hash = s.loadUint(256)
      Some(Decoded(op,
        "cocoon_owner_client_change_secret_hash_and_top_up", f(
        "query_id" -> Some(qid), "top_up_amount" -> Some(amount),
        "new_secret_hash" -> Some("0x" + hash.toString(16)),
        "send_excesses_to" -> s.loadAddress())))
    case 0x9713f187L =>
      // ext_proxy_increase_stake: qid grams excesses
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val grams = s.loadCoins()
      Some(Decoded(op, "cocoon_ext_proxy_increase_stake", f(
        "query_id" -> Some(qid), "grams" -> Some(grams),
        "send_excesses_to" -> s.loadAddress())))
    case 0x9c69f376L =>
      // owner_wallet_send_message: qid mode ^body
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "cocoon_owner_wallet_send_message", f(
        "query_id" -> Some(s.loadUint(64)),
        "mode" -> Some(s.loadUint(8)))))
    case 0x9c7924baL =>
      // update_proxy: qid seqno proxy_addr:rest
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      Some(Decoded(op, "cocoon_update_proxy", f(
        "query_id" -> Some(s.loadUint(64)),
        "seqno" -> Some(s.loadUint(32)))))
    case 0xa35cb580L =>
      // client_proxy_register: empty payload
      Some(Decoded(op, "client_proxy_register", Map.empty))
    case 0xc52ed8d4L =>
      // change_fees: qid price_per_token worker_fee_per_token
      val s = Boc.parseBase64(b).beginParse()
      s.loadUint(32)
      val qid = s.loadUint(64); val price = s.loadCoins()
      Some(Decoded(op, "cocoon_change_fees", f(
        "query_id" -> Some(qid), "price_per_token" -> Some(price),
        "worker_fee_per_token" -> Some(s.loadCoins()))))
    case _ => None
  }

  /** swap_step_params pool_address_hash:uint256 min_output_amount:Coins
    * next:(Maybe ^SwapStepParams) — pool hash renders as a basechain
    * raw address (messages/coffee.py SwapStepParams). */
  private def coffeeSwapStep(s: Boc.Slice): (String, BigInt) = {
    val hash = s.loadBytes(32).map(x => f"${x & 0xff}%02X").mkString
    val minOut = s.loadCoins()
    if (s.loadBit()) s.loadRef() // next
    (s"0:$hash", minOut)
  }

  /** swap_params deadline:uint32 recipient referral
    * notification_data:(Maybe ^) (messages/coffee.py SwapParams). */
  private def coffeeSwapParams(s: Boc.Slice)
      : (BigInt, Option[String], Option[String]) = {
    val deadline = s.loadUint(32)
    val recipient = s.loadAddress()
    val referral = s.loadAddress()
    (deadline, recipient, referral)
  }

  /** liquidate_unsatisfied error tail (messages/evaa.py
    * EvaaLiquidationError.ERROR_CODES, liquidate-message.fc). */
  private def evaaLiquidationErrorReason(s: Boc.Slice): String =
    try {
      s.loadUint(32).toLong match {
        case 0xE001L => "master_liquidating_too_much"
        case 0xE002L => "user_withdraw_in_progress"
        case 0xE003L => "not_liquidatable"
        case 0xE004L => "execution_crashed"
        case 0xE005L => "min_collateral_not_satisfied"
        case 0xE006L => "user_not_enough_collateral"
        case 0xE007L => "user_liquidating_too_much"
        case 0xE008L => "master_not_enough_liquidity"
        case 0xE009L => "liquidation_prices_missing"
        case _ => "unknown"
      }
    } catch { case scala.util.control.NonFatal(_) => "parse_error" }
}
