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
      val d = evaaLiquidateSatisfied(b)
      Some(Decoded(op, "evaa_liquidate_satisfied", f(
        "transferred_asset_id" -> Some(d.transferredAssetIdHex),
        "collateral_asset_id" -> Some(d.collateralAssetIdHex),
        "liquidatable_amount" -> Some(d.liquidatableAmount))))

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
      val d = toncoPayTo(b)
      Some(Decoded(op, "tonco_pay_to", f(
        "exit_code" -> Some(d.exitCode),
        "amount0" -> Some(d.amount0), "jetton0_address" -> d.jetton0,
        "amount1" -> Some(d.amount1), "jetton1_address" -> d.jetton1)))

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
    case 0x642b7d07L =>
      val d = jettonMintCall(b)
      Some(Decoded(op, "jetton_mint", f(
        "query_id" -> Some(d.queryId), "to_address" -> d.toAddress,
        "ton_amount" -> Some(d.tonAmount))))
    case 0x00000015L =>
      val d = jettonMintCall(b)
      Some(Decoded(op, "minter_jetton_mint", f(
        "query_id" -> Some(d.queryId), "to_address" -> d.toAddress,
        "ton_amount" -> Some(d.tonAmount),
        "master_msg_jetton_amount" -> d.masterMsgJettonAmount)))
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
      Some(Decoded(op, "teleitem_start_auction", f(
        "query_id" -> Some(opQueryId(b)))))
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
    case _ => None
  }
}
