package graft.functions

import graft.functions.Boc.Slice

/** TL-B body decoders (F5) for the message families the round-1 matchers
  * consume. One object per opcode, mirroring the reference's
  * class-per-message design (indexer/indexer/events/blocks/messages);
  * schemes are the published TEP standards (TEP-74 jettons, TEP-62 NFTs).
  */
object TlbDecoders {

  final case class JettonTransferBody(
      queryId: BigInt, amount: BigInt, destination: Option[String],
      responseDestination: Option[String], hasCustomPayload: Boolean,
      forwardTonAmount: BigInt, comment: Option[String],
      // raw payload cells as base64 BOCs + the encrypted-comment flag
      // (jetton_transfer_details columns; blocks/jettons.py:88-97)
      customPayload: Option[String] = None,
      forwardPayload: Option[String] = None,
      encryptedComment: Boolean = false)

  final case class JettonInternalTransferBody(
      queryId: BigInt, amount: BigInt, from: Option[String],
      responseAddress: Option[String], forwardTonAmount: BigInt)

  final case class JettonBurnBody(
      queryId: BigInt, amount: BigInt, responseDestination: Option[String])

  final case class NftTransferBody(
      queryId: BigInt, newOwner: Option[String],
      responseDestination: Option[String], forwardAmount: BigInt,
      // raw payload cells as base64 BOCs (nft_transfer_details columns;
      // blocks/nft.py:135-138)
      customPayload: Option[String] = None,
      forwardPayload: Option[String] = None)

  /** ownership_assigned#05138d91 query_id:uint64 prev_owner:MsgAddress
    * forward_payload:(Either Cell ^Cell); a 0x38127de1 payload carries
    * TeleitemBidInfo {bid:Coins bid_ts:uint32} — the fragment purchase
    * marker (messages/nft.py:7-33,57-74). */
  final case class OwnershipAssignedBody(
      queryId: BigInt, prevOwner: Option[String], bid: Option[BigInt],
      // the raw forward payload as a base64 BOC — the reference stores
      // base64(payload.raw) on the fragment path (blocks/nft.py:330-331)
      rawPayload: Option[String] = None)

  def nftOwnershipAssigned(bodyB64: String): OwnershipAssignedBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x05138d91L)
    val queryId = s.loadUint(64)
    val prevOwner = s.loadAddress()
    val payload: Option[Boc.Cell] =
      if (s.remainingBits < 1) None
      else if (s.loadBit()) Some(s.loadRef())
      else {
        // inline payload keeps its raw form even when EMPTY — the
        // reference wraps the remaining slice unconditionally
        // (NftOwnershipAssigned, messages/nft.py:68-72: NftPayload(slice)
        // whose .raw is to_cell().to_boc(hash_crc32=True))
        val b = new Boc.Builder()
        while (s.remainingBits > 0) b.storeBit(s.loadBit())
        while (s.remainingRefs > 0) b.storeRef(s.loadRef())
        Some(b.build())
      }
    val bid = payload.map(_.beginParse()).flatMap { p =>
      if (p.remainingBits < 32) None
      else if (p.loadUint(32).toLong == 0x38127de1L) Some(p.loadCoins())
      else None
    }
    OwnershipAssignedBody(queryId, prevOwner, bid,
      payload.map(Boc.serializeBase64(_)))
  }

  private def expectOpcode(s: Slice, op: Long): Unit = {
    val got = s.loadUint(32).toLong
    require(got == op, f"opcode 0x$got%08x != expected 0x$op%08x")
  }

  /** transfer#0f8a7ea5 query_id:uint64 amount:(VarUInteger 16)
    * destination:MsgAddress response_destination:MsgAddress
    * custom_payload:(Maybe ^Cell) forward_ton_amount:(VarUInteger 16)
    * forward_payload:(Either Cell ^Cell) */
  def jettonTransfer(bodyB64: String): JettonTransferBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x0f8a7ea5L)
    val queryId = s.loadUint(64)
    val amount = s.loadCoins()
    val dest = s.loadAddress()
    val resp = s.loadAddress()
    val hasCustom = s.loadBit()
    val custom = if (hasCustom) Some(Boc.serializeBase64(s.loadRef())) else None
    val fwd = s.loadCoins()
    // Either Cell ^Cell — keep the raw payload cell (serialized like the
    // reference, messages/jettons.py:36-46) AND sniff the comment ops
    val payloadCell: Option[Boc.Cell] =
      if (s.remainingBits == 0) None
      else if (s.loadBit()) Some(s.loadRef())
      else {
        val b = new Boc.Builder()
        while (s.remainingBits > 0) b.storeBit(s.loadBit())
        while (s.remainingRefs > 0) b.storeRef(s.loadRef())
        Some(b.build())
      }
    // an empty payload slice is no payload (jettons.py:42-43)
    val present = payloadCell.filter(_.bitLen > 0)
    var comment: Option[String] = None
    var encrypted = false
    present.foreach { c =>
      val ps = c.beginParse()
      if (ps.remainingBits >= 32) ps.loadUint(32).toLong match {
        case 0L => comment = Some(ps.loadSnakeString())
        case 0x2167da4bL => // encrypted comment stays base64 bytes
          comment = Some(java.util.Base64.getEncoder
            .encodeToString(ps.loadSnakeBytes()))
          encrypted = true
        case _ =>
      }
    }
    JettonTransferBody(queryId, amount, dest, resp, hasCustom, fwd, comment,
      customPayload = custom,
      forwardPayload = present.map(Boc.serializeBase64(_)),
      encryptedComment = encrypted)
  }

  /** internal_transfer#178d4519 query_id:uint64 amount:(VarUInteger 16)
    * from:MsgAddress response_address:MsgAddress
    * forward_ton_amount:(VarUInteger 16) ... */
  def jettonInternalTransfer(bodyB64: String): JettonInternalTransferBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x178d4519L)
    JettonInternalTransferBody(s.loadUint(64), s.loadCoins(),
      s.loadAddress(), s.loadAddress(), s.loadCoins())
  }

  final case class JettonMintCallBody(
      queryId: BigInt, toAddress: Option[String], tonAmount: BigInt,
      masterMsgJettonAmount: Option[BigInt] = None)

  /** Mint calls at the jetton master: 0x642b7d07 query_id:uint64
    * to_address:MsgAddress ton_amount:Coins master_msg:^... (JettonMint,
    * messages/jettons.py:142-154) and minter-style 0x00000015 whose
    * master_msg ref carries the jetton amount (MinterJettonMint,
    * :156-173). */
  def jettonMintCall(bodyB64: String): JettonMintCallBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    val op = s.loadUint(32).toLong
    require(op == 0x642b7d07L || op == 0x00000015L, s"not a mint call: $op")
    val qid = s.loadUint(64)
    // tolerant address load: nonstandard mint bodies can carry an
    // addr_extern here and the reference's blind parse still proceeds to
    // ton_amount (pytoniq load_address accepts it; _get_jetton_mint_data
    // only uses to_address on the no-internal-transfer branch)
    val to = s.loadAddressExt()
    val tonAmount = s.loadCoins()
    val masterAmount =
      if (op == 0x00000015L && s.remainingRefs > 0) {
        try {
          val ms = s.loadRef().beginParse()
          ms.loadUint(32); ms.loadUint(64)
          Some(ms.loadCoins())
        } catch { case scala.util.control.NonFatal(_) => None }
      } else None
    JettonMintCallBody(qid, to, tonAmount, masterAmount)
  }

  /** burn#595f07bc query_id:uint64 amount:(VarUInteger 16)
    * response_destination:MsgAddress */
  def jettonBurn(bodyB64: String): JettonBurnBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x595f07bcL)
    JettonBurnBody(s.loadUint(64), s.loadCoins(), s.loadAddress())
  }

  final case class PTonTransferBody(
      queryId: BigInt, tonAmount: BigInt, refundAddress: Option[String],
      forwardPayload: Option[String] = None)

  /** pTON v2 ton_transfer#01f3835d query_id:uint64 ton_amount:Coins
    * refund_address:MsgAddress forward_payload:(Either Cell ^Cell) —
    * the wrapped-TON wallet call whose ton_amount is the TRUE amount of
    * a pTON swap/liquidity leg (reference messages/swaps.py:50-61
    * PTonTransfer; consumed at blocks/swaps.py:374-376 and
    * liquidity.py:830-832). */
  def ptonTransfer(bodyB64: String): PTonTransferBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x01f3835dL)
    val qid = s.loadUint(64)
    val amount = s.loadCoins()
    val refund = s.loadAddress()
    // maybe-ref forward payload; a trailing ref without the maybe bit is
    // ALSO accepted as the payload (messages/swaps.py:58-60)
    val fwd =
      if (s.remainingBits >= 1 && s.loadBit() && s.remainingRefs > 0)
        Some(s.loadRef())
      else if (s.remainingRefs > 0) Some(s.loadRef())
      else None
    PTonTransferBody(qid, amount, refund, fwd.map(Boc.serializeBase64(_)))
  }

  final case class TonstakersNftBurnNotificationBody(
      queryId: BigInt, amount: BigInt, owner: Option[String])

  /** nft_burn_notification#ed58b0b2 query_id:uint64
    * amount:(VarUInteger 16) owner:MsgAddress — the TONStakers
    * withdrawal-bill burn notification (reference
    * messages/staking.py:39-50). */
  def tonstakersNftBurnNotification(bodyB64: String)
      : TonstakersNftBurnNotificationBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xed58b0b2L)
    TonstakersNftBurnNotificationBody(
      s.loadUint(64), s.loadCoins(), s.loadAddress())
  }

  /** DeDust Asset: 4-bit tag — native$0000 → "TON"; jetton$0001
    * wc:uint8 account:bits256 → "wc:HEX64" (reference
    * messages/swaps.py:41-48 load_asset). */
  def loadDedustAsset(s: Slice): String = {
    val kind = s.loadUint(4).toInt
    if (kind == 0) "TON"
    else {
      val wc = s.loadUint(8).toInt
      val addr = s.loadBytes(32)
      s"$wc:${addr.map(b => f"${b & 0xff}%02X").mkString}"
    }
  }

  final case class DedustSwapNotificationBody(
      assetIn: String, assetOut: String,
      amountIn: BigInt, amountOut: BigInt,
      sender: Option[String], refAddress: Option[String])

  /** swap#9c610de3 asset_in:Asset asset_out:Asset amount_in:Coins
    * amount_out:Coins ^[sender:MsgAddress ref:MsgAddress reserve0:Coins
    * reserve1:Coins] — the per-pool DeDust swap notification whose hops,
    * ordered by lt, form jetton_swap_data.peer_swaps (reference
    * messages/swaps.py:81-94, blocks/swaps.py:547-564). */
  def dedustSwapNotification(bodyB64: String): DedustSwapNotificationBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x9c610de3L)
    val assetIn = loadDedustAsset(s)
    val assetOut = loadDedustAsset(s)
    val amountIn = s.loadCoins()
    val amountOut = s.loadCoins()
    val (sender, ref) =
      if (s.remainingRefs > 0) {
        val r = s.loadRef().beginParse()
        (r.loadAddress(), r.loadAddress())
      } else (None, None)
    DedustSwapNotificationBody(assetIn, assetOut, amountIn, amountOut,
      sender, ref)
  }

  final case class DedustDepositParams(
      amount: Option[BigInt], // TON-to-vault only
      asset0: String, asset1: String, // "TON" or master raw form
      asset0Target: BigInt, asset1Target: BigInt)

  /** dedust_deposit_liquidity#d55e4686 query_id:u64 amount:Coins
    * pool_params:(bit + Asset + Asset) deposit_params:^[min_lp:Coins
    * asset0_target:Coins asset1_target:Coins] ...
    * (messages/liquidity.py:17-37). */
  def dedustDepositTonToVault(bodyB64: String): DedustDepositParams = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xd55e4686L)
    s.loadUint(64)
    val amount = s.loadCoins()
    s.loadBit() // pool type
    val a0 = loadDedustAsset(s)
    val a1 = loadDedustAsset(s)
    val p = s.loadRef().beginParse()
    p.loadCoins() // min lp
    DedustDepositParams(Some(amount), a0, a1, p.loadCoins(), p.loadCoins())
  }

  /** deposit_liquidity#40e108d6 pool_params min_lp:Coins
    * asset0_target:Coins asset1_target:Coins — the TEP-74 forward
    * payload of a jetton-side deposit (messages/liquidity.py:40-55). */
  def dedustDepositJettonFwd(payloadB64: String): DedustDepositParams = {
    val s = Boc.parseBase64(payloadB64).beginParse()
    expectOpcode(s, 0x40e108d6L)
    s.loadBit()
    val a0 = loadDedustAsset(s)
    val a1 = loadDedustAsset(s)
    s.loadCoins() // min lp
    DedustDepositParams(None, a0, a1, s.loadCoins(), s.loadCoins())
  }

  final case class DedustDepositToPoolBody(
      owner: Option[String],
      asset0: String, asset0Amount: BigInt,
      asset1: String, asset1Amount: BigInt)

  /** deposit#b56b9598 query_id:u64 proof:^Cell owner:MsgAddress
    * min_lp:Coins ^[asset0 amount0:Coins asset1 amount1:Coins] ...
    * (messages/liquidity.py:73-89). */
  def dedustDepositToPool(bodyB64: String): DedustDepositToPoolBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xb56b9598L)
    s.loadUint(64)
    s.loadRef() // proof
    val owner = s.loadAddress()
    s.loadCoins() // min lp
    val f = s.loadRef().beginParse()
    val a0 = loadDedustAsset(f)
    val am0 = f.loadCoins()
    val a1 = loadDedustAsset(f)
    val am1 = f.loadCoins()
    DedustDepositToPoolBody(owner, a0, am0, a1, am1)
  }

  final case class StonfiV2PayToBody(
      exitCode: Long,
      amount0Out: BigInt, token0: Option[String],
      amount1Out: BigInt, token1: Option[String]) {
    /** The actual swap output is the non-zero (larger) side
      * (blocks/swaps.py:390-399 sorts the pair by amount desc). */
    def out: (BigInt, Option[String]) =
      if (amount0Out >= amount1Out) (amount0Out, token0)
      else (amount1Out, token1)
  }

  /** StonFi v2 router success opcode inside pay_to
    * (blocks/swaps.py:327 exit_code check). */
  val StonfiV2SwapOkCode = 0xc64370e5L

  /** pay_to#657b54f5 query_id:uint64 to:MsgAddress excesses:MsgAddress
    * original_caller:MsgAddress exit_code:uint32 custom_payload:(Maybe
    * ^Cell) ^[fwd_ton_amount:Coins amount0_out:Coins token0:MsgAddress
    * amount1_out:Coins token1:MsgAddress]
    * (reference messages/swaps.py:64-78). */
  def stonfiV2PayTo(bodyB64: String): StonfiV2PayToBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x657b54f5L)
    s.loadUint(64) // query_id
    s.loadAddress(); s.loadAddress(); s.loadAddress()
    val exit = s.loadUint(32).toLong
    if (s.loadBit()) s.loadRef() // custom payload
    val add = s.loadRef().beginParse()
    add.loadCoins() // fwd_ton_amount
    val a0 = add.loadCoins(); val t0 = add.loadAddress()
    val a1 = add.loadCoins(); val t1 = add.loadAddress()
    StonfiV2PayToBody(exit, a0, t0, a1, t1)
  }

  /** raw address shape as the decoders stringify it: wc:HEX64
    * (Boc.loadAddress). Anchored so amounts/hashes/b64 cells never
    * match. */
  private val RawAddrRe = "-?\\d+:[0-9A-F]{64}".r

  /** Candidate dim-lookup addresses decodable from a message body. The
    * classify dims pre-join (ClassifyJob.traceDims) must cover every
    * address a matcher can hand to the jetton-wallet/interface
    * resolvers; most keys are in-trace tx/msg addresses, but e.g. the
    * StonFi v2 / TONCO pay_to payment-request wallets come out of the
    * body (swaps.py:338-352, 390-424; liquidity.py TONCO withdraw). The
    * reference's repository is GLOBAL (interface_repository.py:512-533)
    * — any address a matcher decodes mid-match resolves — so this runs
    * the ENTIRE registered decode surface (Decode.decode) and harvests
    * every address-shaped field value, list fields included. Opcodes are
    * stored with signed-int32 semantics; mask before use. Returns Nil on
    * any decode failure. */
  def resolverAddressKeys(opcode: Long, bodyB64: String): Seq[String] = {
    // opcode-pruned dispatch: an opcode with no registered field decoder
    // can only decode to a name-only marker (empty field map → no keys),
    // so skip the body parse entirely. At chain scale most bodies carry
    // unregistered app/wallet opcodes, making this the common path.
    if (!Decode.FieldDecoderOpcodes.contains(opcode & 0xffffffffL))
      return Nil
    resolverAddressKeysUnpruned(bodyB64)
  }

  /** The unpruned harvest — decodes regardless of the opcode argument.
    * Exposed for the spec that proves prune-equivalence. */
  private[graft] def resolverAddressKeysUnpruned(bodyB64: String): Seq[String] =
    try {
      Decode.decode(bodyB64) match {
        case Some(d) if d.fields.nonEmpty =>
          d.fields.valuesIterator.flatMap { v =>
            // comma-split catches list fields (signers, accounts_added,
            // jettons_to_claim); fullmatch per element keeps hashes out
            v.split(',').iterator.filter(e => RawAddrRe.matches(e))
          }.toSeq.distinct
        case _ => Nil
      }
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** StateInit: split_depth:(Maybe (## 5)) special:(Maybe TickTock)
    * code:(Maybe ^Cell) data:(Maybe ^Cell) library:(HashmapE ...) —
    * returns the data cell (StateInit.deserialize(...).data, reference
    * messages/getgems.py:72-74). */
  def stateInitDataCell(b64: String): Boc.Cell = {
    val s = Boc.parseBase64(b64).beginParse()
    if (s.loadBit()) s.loadUint(5)
    if (s.loadBit()) s.loadUint(2)
    if (s.loadBit()) s.loadRef() // code
    require(s.loadBit(), "state init has no data cell")
    s.loadRef()
  }

  final case class NftSaleStateData(
      isComplete: Boolean, createdAt: Long,
      marketplace: Option[String], nftAddress: Option[String],
      nftOwner: Option[String], fullPrice: BigInt,
      mpFeeAddress: Option[String], mpFee: Option[BigInt],
      royaltyAddress: Option[String], royaltyAmount: Option[BigInt],
      feePercent: Option[BigInt] = None,
      royaltyPercent: Option[BigInt] = None)

  /** Getgems sale/auction contract VERSIONS, dispatched on the
    * contract's code hash exactly like the reference
    * (messages/getgems.py:12-27 SALE/AUCTION_VERSION_MAPPING — these
    * are the public getgems contract code hashes). Unknown hash (or no
    * dim-provided hash) falls to the reference's "latest" default:
    * sale → v4r1, auction → v3r3 (getgems.py:66-70,122-126). */
  val SaleVersionByCodeHash: Map[String, String] = Map(
    "2pufziLofEllctIDZSWVebzO+RpyA1fMvowFLvyb4I8=" -> "v1",
    "gnj0xSM95vvtyWmvUZNEp6m//FRIVtuphqlcC8+Fcck=" -> "v2",
    "MgUN+sRPZIZrzIbyzZ4TBf6dyts5WcACI3z7CQLUQyM=" -> "v3",
    "3rU7bFdlwebNI4v0e8XoO6WWvcwEsLhM1Qqx5HSgjzE=" -> "v3r2",
    "JCIfpXHlQuBVx3vt/b9SfHr0YM/cfzRMRQeHtM+h600=" -> "v3r3",
    "a5WmQYucnSNZBF0edVm41UmuDlBvJMqrWPowyPsf64Y=" -> "v4r1")
  val AuctionVersionByCodeHash: Map[String, String] = Map(
    "zlp4U06qps7tja/UhtB262CpsNbb+1Nnb2YmScBomVY=" -> "v4r1",
    "ZmiHL6eXBUQ//UdSPo6eqfdquZ+aC1nSfej4GhwnudQ=" -> "v2",
    "G9nFo5v/t6DzQViLXdkrgTqEK/Ze8UEJOCIAzq+Pct8=" -> "v3r2",
    "u29ireD+stefqzuK6/CTCvmFU99gCTsgJ/Covxab/Ow=" -> "v3r3",
    "/ACindAgW83MDT/7nKOMw8jBWexg2KpUMkCpLxBZLUA=" -> "v1")

  /** Getgems fix-price sale contract storage, version-dispatched
    * (get_sale_data, messages/getgems.py:66-115):
    *  - v2/v3/v3r2/v3r3: is_complete(1) created_at(32) marketplace nft
    *    owner full_price:Coins ^[mp_fee_addr mp_fee:Coins royalty_addr
    *    royalty:Coins]
    *  - v1: same without the is_complete/created_at prefix, fees cell
    *    ordered [mp_fee:Coins mp_fee_addr royalty_addr royalty:Coins]
    *  - v4r1: is_complete(1) marketplace owner full_price:Coins
    *    sold_at(32) query_id(64) ^[mp_fee_addr royalty_addr
    *    fee_percent(17) royalty_percent(17)] — absolute fees are not
    *    stored, so mpFee/royaltyAmount stay None like the reference's
    *    NftSaleData. */
  def nftSaleStateInit(b64: String,
      codeHash: Option[String] = None): NftSaleStateData = {
    val version =
      codeHash.flatMap(SaleVersionByCodeHash.get).getOrElse("v4r1")
    val cs = stateInitDataCell(b64).beginParse()
    version match {
      case "v4r1" =>
        val isComplete = cs.loadBit()
        val marketplace = cs.loadAddress()
        val owner = cs.loadAddress()
        val fullPrice = cs.loadCoins()
        cs.loadUint(32) // sold_at
        cs.loadUint(64) // query_id
        val st = cs.loadRef().beginParse()
        val mpFeeAddr = st.loadAddress()
        val royaltyAddr = st.loadAddress()
        val feePct = st.loadUint(17)
        val royaltyPct = st.loadUint(17)
        NftSaleStateData(isComplete, 0L, marketplace, None, owner,
          fullPrice, mpFeeAddr, None, royaltyAddr, None,
          Some(feePct), Some(royaltyPct))
      case v =>
        val (isComplete, createdAt) =
          if (v == "v1") (false, 0L)
          else (cs.loadBit(), cs.loadUint(32).toLong)
        val marketplace = cs.loadAddress()
        val nft = cs.loadAddress()
        val owner = cs.loadAddress()
        val fullPrice = cs.loadCoins()
        val fees = cs.loadRef().beginParse()
        if (v == "v1") {
          val mpFee = fees.loadCoins()
          val mpFeeAddr = fees.loadAddress()
          val royaltyAddr = fees.loadAddress()
          val royalty = fees.loadCoins()
          NftSaleStateData(isComplete, createdAt, marketplace, nft, owner,
            fullPrice, mpFeeAddr, Some(mpFee), royaltyAddr, Some(royalty))
        } else {
          val mpFeeAddr = fees.loadAddress()
          val mpFee = fees.loadCoins()
          val royaltyAddr = fees.loadAddress()
          val royalty = fees.loadCoins()
          NftSaleStateData(isComplete, createdAt, marketplace, nft, owner,
            fullPrice, mpFeeAddr, Some(mpFee), royaltyAddr, Some(royalty))
        }
    }
  }

  final case class NftAuctionStateData(
      endTime: Long, mpFeeFactor: BigInt, mpFeeBase: BigInt,
      royaltyFeeFactor: BigInt, royaltyFeeBase: BigInt,
      mpFeeAddress: Option[String], royaltyAddress: Option[String],
      mpAddress: Option[String], minBid: BigInt, maxBid: BigInt)

  /** Getgems auction contract storage, version-dispatched on code hash
    * (get_auction_data, messages/getgems.py:122-243; default v3r3):
    *  - v1: ^fees[mp_fee_addr factor(32) base(32) royalty_addr
    *    factor(32) base(32)] ^bids[min_bid:Coins max_bid:Coins
    *    min_step:Coins end_time(32) step_time(32) try_step_time(32)]
    *  - v3r2: end?(1) activated?(1) canceled?(1) last_member last_bid
    *    last_bid_at(32) end_time(32) ^fees[as v1] ^const[
    *    sub_gas_price_from_bid(32) mp_addr min_bid max_bid min_step
    *    step_time(32)]
    *  - v3r3: end?(1) canceled?(1) last_member last_bid last_bid_at(32)
    *    end_time(32) nft_owner last_query_id(64) mp_fee_factor(32)
    *    mp_fee_base(32) royalty_fee_factor(32) royalty_fee_base(32)
    *    ^[mp_fee_addr royalty_fee_addr] ^[mp_addr min_bid max_bid
    *    min_step step_time(32)]
    *  - v4r1: as v3r3 but factors/bases live in the fees cell after the
    *    two addresses
    *  - v2: mapped but has no parser in the reference either — throws
    *    (get_auction_data returns None via its except arm). */
  def nftAuctionStateInit(b64: String,
      codeHash: Option[String] = None): NftAuctionStateData = {
    val version =
      codeHash.flatMap(AuctionVersionByCodeHash.get).getOrElse("v3r3")
    val cs = stateInitDataCell(b64).beginParse()
    version match {
      case "v1" =>
        val fees = cs.loadRef().beginParse()
        val bids = cs.loadRef().beginParse()
        val mpFeeAddr = fees.loadAddress()
        val mpFeeFactor = fees.loadUint(32)
        val mpFeeBase = fees.loadUint(32)
        val royaltyAddr = fees.loadAddress()
        val royaltyFeeFactor = fees.loadUint(32)
        val royaltyFeeBase = fees.loadUint(32)
        val minBid = bids.loadCoins()
        val maxBid = bids.loadCoins()
        bids.loadCoins() // min_step
        val endTime = bids.loadUint(32).toLong
        NftAuctionStateData(endTime, mpFeeFactor, mpFeeBase,
          royaltyFeeFactor, royaltyFeeBase, mpFeeAddr, royaltyAddr,
          None, minBid, maxBid)
      case "v3r2" =>
        cs.loadUint(3) // end?, activated?, is_canceled?
        cs.loadAddress() // last_member
        cs.loadCoins() // last_bid
        cs.loadUint(32) // last_bid_at
        val endTime = cs.loadUint(32).toLong
        val fees = cs.loadRef().beginParse()
        val const = cs.loadRef().beginParse()
        const.loadUint(32) // sub_gas_price_from_bid
        val mpAddr = const.loadAddress()
        val minBid = const.loadCoins()
        val maxBid = const.loadCoins()
        val mpFeeAddr = fees.loadAddress()
        val mpFeeFactor = fees.loadUint(32)
        val mpFeeBase = fees.loadUint(32)
        val royaltyAddr = fees.loadAddress()
        val royaltyFeeFactor = fees.loadUint(32)
        val royaltyFeeBase = fees.loadUint(32)
        NftAuctionStateData(endTime, mpFeeFactor, mpFeeBase,
          royaltyFeeFactor, royaltyFeeBase, mpFeeAddr, royaltyAddr,
          mpAddr, minBid, maxBid)
      case "v4r1" =>
        cs.loadUint(2) // end?, is_canceled?
        cs.loadAddress() // last_member
        cs.loadCoins() // last_bid
        cs.loadUint(32) // last_bid_at
        val endTime = cs.loadUint(32).toLong
        cs.loadAddress() // nft_owner
        cs.loadUint(64) // last_query_id
        val fees = cs.loadRef().beginParse()
        val const = cs.loadRef().beginParse()
        val mpFeeAddr = fees.loadAddress()
        val royaltyAddr = fees.loadAddress()
        val mpFeeFactor = fees.loadUint(32)
        val mpFeeBase = fees.loadUint(32)
        val royaltyFeeFactor = fees.loadUint(32)
        val royaltyFeeBase = fees.loadUint(32)
        val mpAddr = const.loadAddress()
        val minBid = const.loadCoins()
        val maxBid = const.loadCoins()
        NftAuctionStateData(endTime, mpFeeFactor, mpFeeBase,
          royaltyFeeFactor, royaltyFeeBase, mpFeeAddr, royaltyAddr,
          mpAddr, minBid, maxBid)
      case "v2" =>
        throw new IllegalArgumentException(
          "getgems auction v2 has no parser (reference parity)")
      case _ => // v3r3, the "latest" default
        cs.loadUint(2) // end?, is_canceled?
        cs.loadAddress() // last_member
        cs.loadCoins() // last_bid
        cs.loadUint(32) // last_bid_at
        val endTime = cs.loadUint(32).toLong
        cs.loadAddress() // nft_owner
        cs.loadUint(64) // last_query_id
        val mpFeeFactor = cs.loadUint(32)
        val mpFeeBase = cs.loadUint(32)
        val royaltyFeeFactor = cs.loadUint(32)
        val royaltyFeeBase = cs.loadUint(32)
        val fees = cs.loadRef().beginParse()
        val mpFeeAddr = fees.loadAddress()
        val royaltyAddr = fees.loadAddress()
        val const = cs.loadRef().beginParse()
        val mpAddr = const.loadAddress()
        val minBid = const.loadCoins()
        val maxBid = const.loadCoins()
        NftAuctionStateData(endTime, mpFeeFactor, mpFeeBase,
          royaltyFeeFactor, royaltyFeeBase, mpFeeAddr, royaltyAddr,
          mpAddr, minBid, maxBid)
    }
  }

  /** transfer#5fcc3d14 query_id:uint64 new_owner:MsgAddress
    * response_destination:MsgAddress custom_payload:(Maybe ^Cell)
    * forward_amount:(VarUInteger 16) */
  def nftTransfer(bodyB64: String): NftTransferBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x5fcc3d14L)
    val queryId = s.loadUint(64)
    val newOwner = s.loadAddress()
    val resp = s.loadAddress()
    val custom =
      if (s.loadBit()) Some(Boc.serializeBase64(s.loadRef())) else None
    val fwdAmount = s.loadCoins()
    val payload: Option[Boc.Cell] =
      if (s.remainingBits == 0) None
      else if (s.loadBit()) Some(s.loadRef())
      else {
        val b = new Boc.Builder()
        while (s.remainingBits > 0) b.storeBit(s.loadBit())
        while (s.remainingRefs > 0) b.storeRef(s.loadRef())
        Some(b.build())
      }
    NftTransferBody(queryId, newOwner, resp, fwdAmount,
      customPayload = custom,
      // the reference emits the payload BOC whenever the either-field is
      // present, INCLUDING an empty right-ref cell (messages/nft.py:51-54)
      forwardPayload = payload.map(Boc.serializeBase64(_)))
  }

  /** Text comment: op 0x00000000 then snake UTF-8 (strip NULs like the
    * reference's backslashreplace+strip, event_processing.py:142-154). */
  def comment(bodyB64: String): Option[String] = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    if (s.remainingBits < 32) return None
    if (s.loadUint(32) != 0) None
    else Some(s.loadSnakeString().replace("\u0000", ""))
  }

  final case class ChangeDnsRecordBody(
      queryId: BigInt, key: BigInt, hasValue: Boolean,
      valueSchema: Option[String] = None, value: Option[String] = None,
      flags: Option[Int] = None) {
    /** key as the 64-hex-digit string the reference serializes
      * (block_tree_serializer.py:477: block.data['key'].hex()). */
    def keyHex: String = f"$key%064x"
  }

  /** change_dns_record#4eb1f0f9 query_id:uint64 key:uint256
    * value:(Maybe ^DNSRecord) — the value's presence/key decide whether
    * the action is change_dns / renew_dns (zero key, no value) /
    * delete_dns (reference ChangeDnsRecordMessage + branch,
    * blocks/dns.py:46-69). The value ref's 16-bit schema tag selects the
    * payload layout (messages/dns.py:19-56). */
  def changeDnsRecord(bodyB64: String): ChangeDnsRecordBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x4eb1f0f9L)
    val queryId = s.loadUint(64)
    val key = s.loadUint(256)
    val base = ChangeDnsRecordBody(queryId, key, s.remainingRefs > 0)
    if (!base.hasValue) base
    else {
      val v = s.loadRef().beginParse()
      def hex32(): String =
        v.loadBytes(32).map(b => f"$b%02x").mkString
      try v.loadUint(16).toInt match {
        case 0xba93 => base.copy(valueSchema = Some("DNSNextResolver"),
          value = v.loadAddress())
        case 0xad01 =>
          val addr = hex32()
          base.copy(valueSchema = Some("DNSAdnlAddress"),
            value = Some(addr), flags = Some(v.loadUint(8).toInt))
        case 0x9fd3 =>
          val addr = v.loadAddress()
          base.copy(valueSchema = Some("DNSSmcAddress"),
            value = addr, flags = Some(v.loadUint(8).toInt))
        case 0x7473 => base.copy(valueSchema = Some("DNSStorageAddress"),
          value = Some(hex32()))
        case 0x1eda =>
          var chunks = v.loadUint(8).toInt
          val sb = new StringBuilder
          var cur = v
          while (chunks > 0) {
            val len = cur.loadUint(8).toInt
            sb ++= new String(cur.loadBytes(len), "UTF-8")
            chunks -= 1
            if (chunks > 0) cur = cur.loadRef().beginParse()
          }
          base.copy(valueSchema = Some("DNSText"), value = Some(sb.toString))
        case _ => base
      } catch { case scala.util.control.NonFatal(_) => base }
    }
  }

  /** DeDust payout#474f86cf / payout_from_pool#ad4eb6f5: query_id:uint64
    * proof:^Cell amount:Coins (reference messages/swaps.py:97-115). */
  def dedustPayoutAmount(bodyB64: String): BigInt = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    val op = s.loadUint(32).toLong
    require(op == 0x474f86cfL || op == 0xad4eb6f5L,
      f"opcode 0x$op%08x is not a dedust payout")
    s.loadUint(64)
    s.loadRef()
    s.loadCoins()
  }

  // ------------------------------------------------------------ multisig

  final case class MultisigNewOrderBody(
      queryId: BigInt, orderSeqno: BigInt, isSigner: Boolean,
      signerIndex: Int, expirationDate: Long, orderBoc: String)

  /** new_order#f718510f query_id:uint64 order_seqno:uint256 signer:(## 1)
    * index:uint8 expiration_date:uint48 order:^Order
    * (reference messages/multisig.py:6-30). */
  def multisigNewOrder(bodyB64: String): MultisigNewOrderBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xf718510fL)
    MultisigNewOrderBody(s.loadUint(64), s.loadUint(256), s.loadBit(),
      s.loadUint(8).toInt, s.loadUint(48).toLong,
      Boc.serializeBase64(s.loadRef(), withCrc = false))
  }

  final case class MultisigInitOrderBody(
      queryId: BigInt, threshold: Int, expirationDate: Long,
      orderBoc: String, approveOnInit: Boolean,
      signers: Seq[String] = Nil)

  /** init#9c73fba2 query_id:uint64 threshold:uint8
    * signers:^(Hashmap 8 MsgAddressInt) expiration_date:uint48
    * order:^Order approve_on_init:(## 1) ...
    * (messages/multisig.py:33-66; the signers dict parse mirrors
    * :46-56 — index-ordered MsgAddressInt leaves). */
  def multisigInitOrder(bodyB64: String): MultisigInitOrderBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x9c73fba2L)
    val qid = s.loadUint(64)
    val threshold = s.loadUint(8).toInt
    // signers ref cell: HashmapE 8 MsgAddressInt (empty = lone 0 bit, the
    // shape multisig.py:57-59 defaults to {}); index-ordered values
    val signersDict = s.loadRef()
    val signers =
      try {
        val ds = signersDict.beginParse()
        if (!ds.loadBit()) Nil
        else Boc.dictInline(ds.loadRef(), 8)(_.loadAddress())
          .toSeq.sortBy(_._1).flatMap(_._2)
      } catch { case scala.util.control.NonFatal(_) => Nil }
    val exp = s.loadUint(48).toLong
    val order = s.loadRef()
    val approveOnInit = s.loadBit()
    MultisigInitOrderBody(qid, threshold, exp,
      Boc.serializeBase64(order, withCrc = false), approveOnInit, signers)
  }

  final case class MultisigApproveBody(queryId: BigInt, signerIndex: Int)

  /** approve#a762230f query_id:uint64 signer_index:uint8
    * (messages/multisig.py:69-83). */
  def multisigApprove(bodyB64: String): MultisigApproveBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xa762230fL)
    MultisigApproveBody(s.loadUint(64), s.loadUint(8).toInt)
  }

  /** approve_rejected#afaf283e query_id:uint64 exit_code:uint32
    * (messages/multisig.py:92-101). */
  def multisigApproveRejectedExitCode(bodyB64: String): Int = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xafaf283eL)
    s.loadUint(64)
    s.loadUint(32).toInt
  }

  final case class MultisigExecuteBody(
      queryId: BigInt, orderSeqno: BigInt, expirationDate: Long,
      approvalsNum: Int, signersHash: String, orderBoc: String)

  /** execute#75097f5d query_id:uint64 order_seqno:uint256
    * expiration_date:uint48 approvals_num:uint8 signers_hash:bits256
    * order:^Order (messages/multisig.py:103-125). signers_hash is
    * base64-encoded like the reference serializer (multisig.py:249). */
  def multisigExecute(bodyB64: String): MultisigExecuteBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x75097f5dL)
    MultisigExecuteBody(s.loadUint(64), s.loadUint(256),
      s.loadUint(48).toLong, s.loadUint(8).toInt,
      java.util.Base64.getEncoder.encodeToString(s.loadBytes(32)),
      Boc.serializeBase64(s.loadRef(), withCrc = false))
  }

  final case class StonfiSwapBody(
      queryId: BigInt, fromUser: Option[String], tokenWallet: Option[String],
      amount: BigInt, minOut: BigInt, fromRealUser: Option[String],
      refAddress: Option[String])

  /** StonFi v1 swap#25938561 query_id:uint64 from_user:MsgAddress
    * token_wallet:MsgAddress amount:Coins min_out:Coins has_ref:bool
    * ^[from_real_user:MsgAddress (ref_address:MsgAddress)?]
    * (messages/swaps.py:8-24). */
  def stonfiSwap(bodyB64: String): StonfiSwapBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x25938561L)
    val qid = s.loadUint(64)
    val fromUser = s.loadAddress()
    val wallet = s.loadAddress()
    val amount = s.loadCoins()
    val minOut = s.loadCoins()
    val hasRef = s.loadBit()
    val ref = s.loadRef().beginParse()
    val fromReal = ref.loadAddress()
    StonfiSwapBody(qid, fromUser, wallet, amount, minOut, fromReal,
      if (hasRef) ref.loadAddress() else None)
  }

  final case class StonfiSwapPayload(
      jettonWallet: Option[String], minAmount: BigInt,
      userAddress: Option[String])

  /** The swap#25938561 body as it rides a TEP-74 FORWARD PAYLOAD:
    * jetton_wallet:MsgAddress min_amount:Coins user_address:MsgAddress
    * (messages/jettons.py:62-66 `stonfi_swap_body`). */
  def stonfiSwapPayload(payloadB64: String): StonfiSwapPayload = {
    val s = Boc.parseBase64(payloadB64).beginParse()
    expectOpcode(s, 0x25938561L)
    StonfiSwapPayload(s.loadAddress(), s.loadCoins(), s.loadAddress())
  }

  final case class StonfiPaymentRequestBody(
      queryId: BigInt, owner: Option[String], exitCode: Long,
      amount0Out: BigInt, token0Out: Option[String],
      amount1Out: BigInt, token1Out: Option[String])

  /** StonFi v1 payment request#f93bb43f query_id:u64 owner:MsgAddress
    * exit_code:u32 ^[amount0_out:Coins token0_out:MsgAddress
    * amount1_out:Coins token1_out:MsgAddress]
    * (messages/swaps.py:26-39). */
  def stonfiPaymentRequest(bodyB64: String): StonfiPaymentRequestBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xf93bb43fL)
    val qid = s.loadUint(64)
    val owner = s.loadAddress()
    val exit = s.loadUint(32).toLong
    val r = s.loadRef().beginParse()
    StonfiPaymentRequestBody(qid, owner, exit,
      r.loadCoins(), r.loadAddress(), r.loadCoins(), r.loadAddress())
  }

  // --------------------------------------------------------------- tonco

  final case class ToncoPoolInitBody(
      queryId: BigInt, tickSpacing: Int, initialPriceX96: BigInt,
      poolActive: Boolean, protocolFee: Int, lpFeeBase: Int,
      lpFeeCurrent: Int, jetton0Minter: Option[String],
      jetton1Minter: Option[String])

  /** POOLV3_INIT#441c39ed query_id:uint64 from_admin:bool has_admin:bool
    * admin:MsgAddress has_controller:bool controller:MsgAddress
    * set_spacing:bool tick_spacing:int24 set_price:bool price_x96:uint160
    * set_active:bool pool_active:bool protocol_fee:uint16
    * lp_fee_base:uint16 lp_fee_current:uint16 ^content ^item_content
    * minters:(Maybe ^[addr addr]) (messages/liquidity.py:289-343). */
  final case class ToncoCreatePoolBody(
      jettonWallet0: Option[String], jettonWallet1: Option[String],
      tickSpacing: Int, initialPriceX96: BigInt,
      protocolFee: Int, lpFeeBase: Int, lpFeeCurrent: Int,
      jetton0Minter: Option[String], jetton1Minter: Option[String])

  /** ROUTERV3_CREATE_POOL#2e3034ef query_id:uint64 jetton_wallet0/1:addr
    * tick_spacing:int24 initial_price_x96:uint160 protocol_fee:uint16
    * lp_fee_base:uint16 lp_fee_current:uint16 ^content ^item_content
    * ^[jetton0_minter jetton1_minter controller]
    * (messages/liquidity.py:345-390). */
  def toncoCreatePool(bodyB64: String): ToncoCreatePoolBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x2e3034efL)
    s.loadUint(64)
    val w0 = s.loadAddress(); val w1 = s.loadAddress()
    val spacing = s.loadInt(24).toInt
    val price = s.loadUint(160)
    val pFee = s.loadUint(16).toInt
    val lpBase = s.loadUint(16).toInt
    val lpCur = s.loadUint(16).toInt
    s.loadRef(); s.loadRef()
    val ms = s.loadRef().beginParse()
    ToncoCreatePoolBody(w0, w1, spacing, price, pFee, lpBase, lpCur,
      ms.loadAddress(), ms.loadAddress())
  }

  final case class ToncoPayToBody(
      exitCode: Long,
      amount0: BigInt, jetton0: Option[String],
      amount1: BigInt, jetton1: Option[String],
      receiver0: Option[String] = None, receiver1: Option[String] = None) {
    /** The actual output is the larger side (blocks/swaps.py:1066-1075
      * sorts the coinsinfo pair by amount desc). */
    def out: (BigInt, Option[String]) =
      if (amount0 >= amount1) (amount0, jetton0) else (amount1, jetton1)
  }

  /** ROUTERV3_PAY_TO#a1daa96d query_id:uint64 receiver0:addr
    * receiver1:addr exit_code:uint32 seqno:uint64 coinsinfo:(Maybe
    * ^[amount0 jetton0 amount1 jetton1]) (messages/swaps.py:307-360).
    * exit 200 = swap ok, 201 = burn. */
  def toncoPayTo(bodyB64: String): ToncoPayToBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xa1daa96dL)
    s.loadUint(64)
    val r0 = s.loadAddress(); val r1 = s.loadAddress()
    val exit = s.loadUint(32).toLong
    s.loadUint(64)
    if (s.remainingBits >= 1 && s.loadBit()) {
      val cs = s.loadRef().beginParse()
      val a0 = cs.loadCoins(); val j0 = cs.loadAddress()
      val a1 = cs.loadCoins(); val j1 = cs.loadAddress()
      ToncoPayToBody(exit, a0, j0, a1, j1, r0, r1)
    } else ToncoPayToBody(exit, BigInt(0), None, BigInt(0), None, r0, r1)
  }

  final case class ToncoStartBurnBody(
      burnedIndex: BigInt, liquidityToBurn: BigInt,
      tickLower: Int, tickUpper: Int)

  /** POOLV3_START_BURN#530b5f2c query_id:u64 burned_index:u64
    * liquidity_to_burn:u128 tick_lower:int24 tick_upper:int24
    * (messages/liquidity.py:165-184). */
  def toncoStartBurn(bodyB64: String): ToncoStartBurnBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x530b5f2cL)
    s.loadUint(64)
    ToncoStartBurnBody(s.loadUint(64), s.loadUint(128),
      s.loadInt(24).toInt, s.loadInt(24).toInt)
  }

  final case class JettonNotifyBody(
      queryId: BigInt, amount: BigInt, sender: Option[String],
      forwardPayload: Option[String])

  /** transfer_notification#7362d09c query_id:u64 amount:Coins
    * sender:MsgAddress forward_payload:(Either Cell ^Cell)
    * (messages/jettons.py JettonNotify). */
  def jettonNotify(bodyB64: String): JettonNotifyBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x7362d09cL)
    val qid = s.loadUint(64)
    val amount = s.loadCoins()
    val sender = s.loadAddress()
    val payload =
      if (s.remainingBits < 1) None
      else if (s.loadBit()) Some(s.loadRef())
      else {
        val b = new Boc.Builder()
        while (s.remainingBits > 0) b.storeBit(s.loadBit())
        while (s.remainingRefs > 0) b.storeRef(s.loadRef())
        val c = b.build()
        if (c.bitLen == 0 && c.refs.isEmpty) None else Some(c)
      }
    JettonNotifyBody(qid, amount, sender, payload.map(Boc.serializeBase64(_)))
  }

  final case class ToncoAddLiquidityBody(
      newAmount0: BigInt, newAmount1: BigInt,
      newEnough0: BigInt, newEnough1: BigInt,
      liquidity: BigInt, tickLower: Int, tickUpper: Int)

  /** ACCOUNTV3_ADD_LIQUIDITY#3ebe5431 query_id:u64 new_amount0:Coins
    * new_amount1:Coins new_enough0:Coins new_enough1:Coins
    * liquidity:u128 tick_lower:int24 tick_upper:int24
    * (messages/liquidity.py:465-492). */
  def toncoAddLiquidity(bodyB64: String): ToncoAddLiquidityBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x3ebe5431L)
    s.loadUint(64)
    ToncoAddLiquidityBody(s.loadCoins(), s.loadCoins(), s.loadCoins(),
      s.loadCoins(), s.loadUint(128), s.loadInt(24).toInt,
      s.loadInt(24).toInt)
  }

  final case class ToncoFundPayload(
      otherWallet: Option[String], amount0: BigInt, amount1: BigInt)

  /** POOLV3_FUND_ACCOUNT#4468de77 payload inside the funding transfer's
    * notify: other_jetton_wallet:MsgAddress amount0:Coins amount1:Coins
    * (messages/liquidity.py:257-286). */
  def toncoFundPayload(payloadB64: String): ToncoFundPayload = {
    val s = Boc.parseBase64(payloadB64).beginParse()
    expectOpcode(s, 0x4468de77L)
    ToncoFundPayload(s.loadAddress(), s.loadCoins(), s.loadCoins())
  }

  final case class ToncoPositionInitBody(
      liquidity: BigInt, nftIndex: BigInt)

  /** POSITIONNFTV3_POSITION_INIT#d5ecca2a query_id:u64
    * user_address:MsgAddress liquidity:u128 tick_lower:int24
    * tick_upper:int24 ^[fee0:u256 fee1:u256 nft_index:u64 ...]
    * (messages/liquidity.py:391-426). */
  /** POOLV3_SWAP#a7fb58f8 as a TEP-74 forward payload: target router
    * jetton wallet, price limit, min_out, recipient, maybe-ref inner
    * multicall payload of the same shape — recursion yields the
    * (wallet, min_out) chain; the LAST entry names the final target
    * (messages/swaps.py:245-300). */
  def toncoSwapPayloadTargets(payloadB64: String): Seq[(String, BigInt)] = {
    def walk(s: Boc.Slice): Seq[(String, BigInt)] = {
      if (s.remainingBits < 32 || s.loadUint(32) != BigInt(0xa7fb58f8L))
        return Nil
      val wallet = s.loadAddress()
      s.loadUint(160) // price limit sqrt
      val minOut = s.loadCoins()
      s.loadAddress() // recipient
      val inner =
        if (s.remainingBits >= 1 && s.loadBit() && s.remainingRefs > 0)
          Some(s.loadRef()) else None
      wallet.map(_ -> minOut).toSeq ++
        inner.toSeq.flatMap(c =>
          try walk(c.beginParse())
          catch { case scala.util.control.NonFatal(_) => Nil })
    }
    walk(Boc.parseBase64(payloadB64).beginParse())
  }

  def toncoPositionInit(bodyB64: String): ToncoPositionInitBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xd5ecca2aL)
    s.loadUint(64)
    s.loadAddress()
    val liquidity = s.loadUint(128)
    s.loadInt(24); s.loadInt(24)
    val fs = s.loadRef().beginParse()
    fs.loadUint(256); fs.loadUint(256)
    ToncoPositionInitBody(liquidity, fs.loadUint(64))
  }

  /** POSITIONNFTV3_POSITION_BURN#46ca335a query_id:u64 nft_owner:addr
    * liquidity_to_burn:u128 ... (messages/liquidity.py:432-457).
    * Returns the owner. */
  def toncoPositionBurnOwner(bodyB64: String): Option[String] = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x46ca335aL)
    s.loadUint(64)
    s.loadAddress()
  }

  def toncoPoolInit(bodyB64: String): ToncoPoolInitBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x441c39edL)
    val qid = s.loadUint(64)
    s.loadBit(); s.loadBit()
    s.loadAddress()
    s.loadBit()
    s.loadAddress()
    s.loadBit()
    val spacing = s.loadInt(24).toInt
    s.loadBit()
    val price = s.loadUint(160)
    s.loadBit()
    val active = s.loadBit()
    val pFee = s.loadUint(16).toInt
    val lpBase = s.loadUint(16).toInt
    val lpCur = s.loadUint(16).toInt
    s.loadRef(); s.loadRef()
    val (m0, m1) =
      if (s.remainingBits >= 1 && s.loadBit()) {
        val ms = s.loadRef().beginParse()
        (ms.loadAddress(), ms.loadAddress())
      } else (None, None)
    ToncoPoolInitBody(qid, spacing, price, active, pFee, lpBase, lpCur,
      m0, m1)
  }

  // -------------------------------------------------------------- jvault

  /** claim_rewards#78d9f109 query_id:uint64
    * jettons_to_claim:(HashmapE 267 Bit) — the dict KEYS are whole
    * MsgAddressStd values: tag(2)=10 anycast(1)=0 wc:int8 hash:bits256
    * (messages/jvault.py:6-13,82-95). */
  def jvaultClaimWallets(bodyB64: String): Seq[String] = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x78d9f109L)
    s.loadUint(64)
    // HashmapE 267 Bit — VALUES are inline bits, only the KEYS matter
    // (messages/jvault.py:82-97 load_address_list)
    val keys =
      if (s.remainingBits >= 1 && s.loadBit() && s.remainingRefs > 0)
        Boc.dictKeys(s.loadRef(), 267)
      else Seq.empty[BigInt]
    keys.flatMap { key =>
      val tag = (key >> 265).toInt & 0x3
      if (tag != 2) None
      else {
        val wc = ((key >> 256).toInt & 0xff).toByte.toInt
        val hash = (key & ((BigInt(1) << 256) - 1)).toString(16)
          .reverse.padTo(64, '0').reverse.toUpperCase
        Some(s"$wc:$hash")
      }
    }.sorted
  }

  // ---------------------------------------------------------------- evaa

  final case class EvaaSupplySuccessBody(
      queryId: BigInt, owner: Option[String], assetIdHex: String,
      amountSupplied: BigInt)

  /** supply_success#0000011a query_id:uint64 owner_address:MsgAddressInt
    * asset_id:uint256 amount_supplied:uint64 ...
    * (messages/evaa.py:75-95). asset_id serialized as 0x-prefixed hex
    * (block_tree_serializer.py:689: hex(asset_id)). */
  def evaaSupplySuccess(bodyB64: String): EvaaSupplySuccessBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x11aL)
    EvaaSupplySuccessBody(s.loadUint(64), s.loadAddress(),
      "0x" + s.loadUint(256).toString(16), s.loadUint(64))
  }

  final case class EvaaSupplyMasterBody(
      queryId: BigInt, supplyAmount: BigInt, recipient: Option[String])

  /** supply_master#00000001 query_id:uint64 include_user_code:int2
    * supply_amount:uint64 recipient_address:MsgAddressInt ...
    * (messages/evaa.py:8-26). */
  def evaaSupplyMaster(bodyB64: String): EvaaSupplyMasterBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x1L)
    val qid = s.loadUint(64)
    s.loadInt(2) // include_user_code
    EvaaSupplyMasterBody(qid, s.loadUint(64), s.loadAddress())
  }

  /** The jetton-supply forward payload: supply_master op WITHOUT query_id
    * (messages/evaa.py:27-49): op:32 include_user_code:int2
    * recipient_address:MsgAddressInt. Returns the recipient. */
  def evaaSupplyJettonForward(bodyB64: String): Option[String] = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x1L)
    s.loadInt(2)
    s.loadAddress()
  }

  final case class EvaaUserCallBody(
      opcode: Long, assetIdHex: String, amount: BigInt,
      recipient: Option[String])

  /** A call at the EVAA user contract. Real messages carry the user-smc
    * header (user_version:Coins upgrade_info:Maybe ^Cell
    * upgrade_exec:uint2, blocks/evaa.py:59-89) BEFORE the 32-bit op;
    * synthetic fixtures may omit it — try header-first, then plain.
    * Layouts (messages/evaa.py:52-72, 143-167):
    * supply_user#00000011 query_id:64 asset_id:256 amount:64;
    * withdraw_user#00000021 query_id:64 asset_id:256 amount:64
    * s_rate:64 b_rate:64 recipient:MsgAddressInt. */
  def evaaUserCall(bodyB64: String): EvaaUserCallBody = {
    val root = Boc.parseBase64(bodyB64)
    def parse(skipHeader: Boolean): EvaaUserCallBody = {
      val s = root.beginParse()
      if (skipHeader) {
        s.loadCoins() // user_version
        if (s.loadBit()) s.loadRef() // upgrade_info
        s.loadUint(2) // upgrade_exec
      }
      val op = s.loadUint(32).toLong
      require(op == 0x11L || op == 0x21L, s"not an evaa user call: $op")
      s.loadUint(64) // query_id
      val assetId = s.loadUint(256)
      val amount = s.loadUint(64)
      val recipient = if (op == 0x21L) {
        s.loadUint(64); s.loadUint(64) // s_rate, b_rate
        s.loadAddress()
      } else None
      EvaaUserCallBody(op, "0x" + assetId.toString(16), amount, recipient)
    }
    try parse(skipHeader = true)
    catch { case scala.util.control.NonFatal(_) => parse(skipHeader = false) }
  }

  final case class EvaaWithdrawMasterBody(
      queryId: BigInt, assetIdHex: String, amount: BigInt,
      recipient: Option[String])

  /** withdraw_master#00000002 query_id:uint64 asset_id:uint256
    * amount:uint64 recipient_addr:MsgAddressInt ...
    * (messages/evaa.py:121-140). */
  def evaaWithdrawMaster(bodyB64: String): EvaaWithdrawMasterBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x2L)
    val qid = s.loadUint(64)
    EvaaWithdrawMasterBody(qid, "0x" + s.loadUint(256).toString(16),
      s.loadUint(64), s.loadAddress())
  }

  /** withdraw_collateralized#00000211 query_id:uint64
    * owner_address:MsgAddressInt asset_id:uint256
    * withdraw_amount_current:uint64 ... (messages/evaa.py:169-189).
    * Returns the current (actual) withdraw amount. */
  def evaaWithdrawCollateralized(bodyB64: String): BigInt = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x211L)
    s.loadUint(64)
    s.loadAddress()
    s.loadUint(256)
    s.loadUint(64)
  }

  final case class EvaaLiquidateSatisfiedBody(
      transferredAssetIdHex: String, collateralAssetIdHex: String,
      liquidatableAmount: BigInt)

  /** liquidate_satisfied#00000311 query_id owner liquidator
    * transferred_asset_id:uint256 ^[delta_loan:int64 liquidatable:uint64
    * protocol_gift:uint64 new_user_loan:int64 collateral_asset_id:uint256
    * ...] (messages/evaa.py:317-368). debt_amount is the liquidatable
    * amount (blocks/evaa.py:797). */
  def evaaLiquidateSatisfied(bodyB64: String): EvaaLiquidateSatisfiedBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x311L)
    s.loadUint(64)
    s.loadAddress()
    s.loadAddress()
    val transferred = s.loadUint(256)
    val ref = s.loadRef().beginParse()
    ref.loadInt(64)
    val liquidatable = ref.loadUint(64)
    ref.loadUint(64)
    ref.loadInt(64)
    val collateral = ref.loadUint(256)
    EvaaLiquidateSatisfiedBody("0x" + transferred.toString(16),
      "0x" + collateral.toString(16), liquidatable)
  }

  // -------------------------------------------------------------- cocoon

  /** The cocoon family's shared `op:32 query_id:64` prefix
    * (messages/cocoon.py — every owner/proxy op starts this way). */
  def opQueryId(bodyB64: String): BigInt = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    s.loadUint(32)
    s.loadUint(64)
  }

  /** op:32 query_id:64 amount:Coins — the jvault unstake/unstake-request
    * prefix (messages/jvault.py:48-80). */
  def opQidCoins(bodyB64: String): BigInt = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    s.loadUint(32); s.loadUint(64)
    s.loadCoins()
  }

  /** swap.coffee asset: native$00 | jetton$01 chain:uint8 hash:uint256 |
    * extra$10 id:uint32 (messages/coffee.py:10-30). None = TON. */
  private def loadCoffeeAsset(s: Boc.Slice): Option[String] =
    s.loadUint(2).toInt match {
      case 0 => None
      case 1 =>
        val chain = s.loadUint(8).toInt
        val hash = s.loadUint(256)
        Some(s"$chain:" + hash.toString(16).toUpperCase.reverse
          .padTo(64, '0').reverse)
      case 2 => s.loadUint(32); None
      case t => throw new IllegalArgumentException(s"bad coffee asset: $t")
    }

  final case class CoffeeSwapEventBody(
      inputAsset: Option[String], inputAmount: BigInt, outputAmount: BigInt)

  /** swap_successful_event#c0ffee30 query_id:uint64 input:Asset
    * input_amount:Coins output_amount:Coins
    * (messages/coffee.py:387-403). */
  def coffeeSwapEvent(bodyB64: String): CoffeeSwapEventBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xc0ffee30L)
    s.loadUint(64)
    CoffeeSwapEventBody(loadCoffeeAsset(s), s.loadCoins(), s.loadCoins())
  }

  final case class CoffeePayoutInternalBody(
      recipient: Option[String], amount: BigInt)

  /** payout_internal#c0ffee21 query_id:uint64 recipient:MsgAddressInt
    * amount:Coins ... (messages/coffee.py:673-689). */
  def coffeePayoutInternal(bodyB64: String): CoffeePayoutInternalBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xc0ffee21L)
    s.loadUint(64)
    CoffeePayoutInternalBody(s.loadAddress(), s.loadCoins())
  }

  /** swap_native#c0ffee00 query_id:uint64 amount:Coins ...
    * (messages/coffee.py:331-345). Returns the swapped TON amount. */
  def coffeeSwapNativeAmount(bodyB64: String): BigInt = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xc0ffee00L)
    s.loadUint(64)
    s.loadCoins()
  }

  final case class TgbtcMintEventBody(
      amount: BigInt, recipient: Option[String], bitcoinTxidHex: String)

  /** TgBTCMintEvent#77a80ef3 amount:Coins recipient:addr txid:uint256
    * (messages/tgbtc.py:8-26). The txid serializes little-endian →
    * reverse the 32 big-endian bytes before hexing (blocks/tgbtc.py:
    * 128-132). */
  def tgbtcMintEvent(bodyB64: String): TgbtcMintEventBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x77a80ef3L)
    val amount = s.loadCoins()
    val recipient = s.loadAddress()
    val txid = s.loadUint(256)
    val be = txid.toByteArray.dropWhile(_ == 0)
    val bytes = Array.fill[Byte](32 - be.length)(0) ++ be
    TgbtcMintEventBody(amount, recipient,
      bytes.reverse.map(b => f"${b & 0xff}%02x").mkString)
  }

  final case class TgbtcBurnEventBody(
      amount: BigInt, sender: Option[String], pegout: Option[String])

  /** TgBTCBurnEvent#ca444ce6 amount:Coins [sender:addr pegout:addr] —
    * the address tail is absent in old schemas
    * (messages/tgbtc.py:29-57). */
  def tgbtcBurnEvent(bodyB64: String): TgbtcBurnEventBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xca444ce6L)
    val amount = s.loadCoins()
    // the sender can be addr_extern in "strange" pegout logs — pytoniq
    // load_address tolerates it and the reference still reads the pegout
    // address after it (messages/tgbtc.py:43-57)
    val (sender, pegout) =
      try { (s.loadAddressExt(), s.loadAddressExt()) }
      catch { case scala.util.control.NonFatal(_) => (None, None) }
    // extern addresses ("len;hex") are NOT Address instances — the
    // reference nulls them (isinstance gate, messages/tgbtc.py:52-57)
    TgbtcBurnEventBody(amount, sender.filterNot(_.contains(';')),
      pegout.filterNot(_.contains(';')))
  }

  final case class TgbtcNewKeyEventBody(
      amount: BigInt, pubkeyHex: String, pegout: Option[String])

  /** TgBTCNewKeyEvent#27756729 amount:Coins pubkey:uint256 pegout:addr
    * (messages/tgbtc.py:60-73). */
  def tgbtcNewKeyEvent(bodyB64: String): TgbtcNewKeyEventBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x27756729L)
    val amount = s.loadCoins()
    val pubkey = s.loadUint(256)
    TgbtcNewKeyEventBody(amount, pubkey.toString(16), s.loadAddress())
  }

  final case class TgbtcDkgEventBody(timestamp: BigInt, pubkeyHex: String)

  /** TgBTCDkgCompletedEvent#453443a6 timestamp:uint64 pubkey:uint256
    * (messages/tgbtc.py:76-87). */
  def tgbtcDkgEvent(bodyB64: String): TgbtcDkgEventBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x453443a6L)
    TgbtcDkgEventBody(s.loadUint(64), s.loadUint(256).toString(16))
  }

  final case class CocoonPayoutPayloadBody(
      queryId: BigInt, newTokens: BigInt, expectedAddress: Option[String])

  /** PayoutPayload#a040ad28 / LastPayoutPayload#f5f26a36: query_id:u64
    * new_tokens:u64 expected_my_address:addr (messages/cocoon.py:174-212).
    * Opcode-agnostic: both payloads share the layout. */
  def cocoonPayoutPayload(bodyB64: String): CocoonPayoutPayloadBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    val op = s.loadUint(32).toLong
    require(op == 0xa040ad28L || op == 0xf5f26a36L,
      s"not a payout payload: $op")
    CocoonPayoutPayloadBody(s.loadUint(64), s.loadUint(64),
      s.loadAddressExt())
  }

  final case class CocoonWorkerRequestBody(
      queryId: BigInt, owner: Option[String], state: Int, tokens: BigInt)

  /** WorkerProxyRequest#4d725d2c query_id:u64 owner:addr state:u2
    * tokens:u64 (messages/cocoon.py:36-54). */
  def cocoonWorkerRequest(bodyB64: String): CocoonWorkerRequestBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x4d725d2cL)
    CocoonWorkerRequestBody(s.loadUint(64), s.loadAddress(),
      s.loadUint(2).toInt, s.loadUint(64))
  }

  final case class CocoonTopUpBody(
      queryId: BigInt, amount: BigInt, sender: Option[String])

  /** ExtClientTopUp#f172e6c2 query_id:u64 top_up:coins
    * send_excesses_to:addr (messages/cocoon.py:576-590). */
  def cocoonExtClientTopUp(bodyB64: String): CocoonTopUpBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xf172e6c2L)
    CocoonTopUpBody(s.loadUint(64), s.loadCoins(), s.loadAddress())
  }

  final case class CocoonRegisterBody(
      queryId: BigInt, nonce: BigInt, owner: Option[String])

  /** OwnerClientRegister#c45f9f3b query_id:u64 nonce:u64
    * send_excesses_to:addr (messages/cocoon.py:612-626). */
  def cocoonOwnerClientRegister(bodyB64: String): CocoonRegisterBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xc45f9f3bL)
    CocoonRegisterBody(s.loadUint(64), s.loadUint(64), s.loadAddress())
  }

  final case class CocoonChargeBody(
      queryId: BigInt, newTokensUsed: BigInt, expectedAddress: Option[String])

  /** charge#bb63ff93 query_id:uint64 new_tokens_used:uint64
    * expected_my_address:MsgAddress (messages/cocoon.py:693-707). */
  def cocoonCharge(bodyB64: String): CocoonChargeBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    // ChargePayload#bb63ff93 and GrantRefundPayload#efd711e1 share the
    // layout (messages/cocoon.py:693-724)
    val op = s.loadUint(32).toLong
    require(op == 0xbb63ff93L || op == 0xefd711e1L,
      s"not a charge/grant-refund payload: $op")
    CocoonChargeBody(s.loadUint(64), s.loadUint(64), s.loadAddressExt())
  }

  /** ClientProxyRequest#65448ff4 → maybe-ref payload; a
    * RefundGranted#c68ebc7b payload carries the withdraw amount
    * (messages/cocoon.py:77-135, blocks/cocoon.py:1066-1075). */
  def cocoonRefundGrantedCoins(reqBodyB64: String): Option[BigInt] = {
    val s = Boc.parseBase64(reqBodyB64).beginParse()
    expectOpcode(s, 0x65448ff4L)
    s.loadUint(64)
    s.loadAddress()
    s.loadRef() // state data
    if (s.remainingBits >= 1 && s.loadBit() && s.remainingRefs > 0) {
      val p = s.loadRef().beginParse()
      if (p.remainingBits >= 32 && p.loadUint(32) == BigInt(0xc68ebc7bL))
        Some(p.loadCoins())
      else None
    } else None
  }

  final case class CocoonUnregisterBody(queryId: BigInt, seqno: Int)

  /** unregister_proxy#6d49eaf2 query_id:uint64 seqno:uint32
    * (messages/cocoon.py:321-333). */
  def cocoonUnregisterProxy(bodyB64: String): CocoonUnregisterBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x6d49eaf2L)
    CocoonUnregisterBody(s.loadUint(64), s.loadUint(32).toInt)
  }

  final case class CocoonSecretHashBody(queryId: BigInt, newSecretHashHex: String)

  /** change_secret_hash#a9357034 query_id:uint64 new_secret_hash:uint256 —
    * serialized as bare lowercase hex (block_tree_serializer.py:1133:
    * hex(int(...))[2:]). */
  def cocoonChangeSecretHash(bodyB64: String): CocoonSecretHashBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xa9357034L)
    CocoonSecretHashBody(s.loadUint(64), s.loadUint(256).toString(16))
  }

  final case class CocoonStakeBody(queryId: BigInt, newStake: BigInt,
      sendExcessesTo: Option[String] = None)

  /** increase_stake#6a1f6a60 query_id:uint64 new_stake:Coins
    * send_excesses_to:MsgAddress (messages/cocoon.py:646-660). */
  def cocoonIncreaseStake(bodyB64: String): CocoonStakeBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x6a1f6a60L)
    val qid = s.loadUint(64)
    val stake = s.loadCoins()
    val to = try s.loadAddress() catch {
      case scala.util.control.NonFatal(_) => None }
    CocoonStakeBody(qid, stake, to)
  }

  /** request_refund#fafa6cc1 query_id:uint64 send_excesses_to:MsgAddress
    * (messages/cocoon.py:678-690). */
  def cocoonRequestRefund(bodyB64: String): CocoonStakeBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xfafa6cc1L)
    val qid = s.loadUint(64)
    val to = try s.loadAddress() catch {
      case scala.util.control.NonFatal(_) => None }
    CocoonStakeBody(qid, BigInt(0), to)
  }

  // ------------------------------------------------------------- vesting

  final case class VestingSendMessageBody(
      queryId: BigInt, sendMode: Int, messageBoc: String,
      messageDestination: Option[String] = None,
      messageValue: Option[BigInt] = None)

  /** vesting send_message 0xa7733acd query_id:uint64 send_mode:uint8
    * message:^Cell (messages/vesting.py:11-29). The ordered message's
    * int_msg_info header yields the forwarded destination and value
    * (:27-28) — they become the action's destination_secondary and
    * amount (_fill_vesting_send_message,
    * block_tree_serializer.py:810-819). */
  def vestingSendMessage(bodyB64: String): VestingSendMessageBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xa7733acdL)
    val qid = s.loadUint(64)
    val mode = s.loadUint(8).toInt
    val msg = s.loadRef()
    val (dest, value) =
      try {
        val ms = msg.beginParse()
        require(!ms.loadBit(), "int_msg_info expected")
        ms.loadBit(); ms.loadBit(); ms.loadBit() // ihr_disabled/bounce/bounced
        ms.loadAddress() // src
        val d = ms.loadAddress()
        val v = ms.loadCoins()
        (d, Some(v))
      } catch { case scala.util.control.NonFatal(_) => (None, None) }
    VestingSendMessageBody(qid, mode,
      Boc.serializeBase64(msg, withCrc = false), dest, value)
  }

  final case class VestingAddWhitelistBody(
      queryId: BigInt, accounts: Seq[String])

  /** vesting add_whitelist 0x7258a69b query_id:uint64 then one address
    * per slice chained through single refs (messages/vesting.py:31-44). */
  def vestingAddWhitelist(bodyB64: String): VestingAddWhitelistBody = {
    val s0 = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s0, 0x7258a69bL)
    val qid = s0.loadUint(64)
    val accounts = scala.collection.mutable.ArrayBuffer[String]()
    var cur = s0
    while (cur.remainingRefs > 0) {
      cur.loadAddress().foreach(accounts += _)
      cur = cur.loadRef().beginParse()
    }
    cur.loadAddress().foreach(accounts += _)
    VestingAddWhitelistBody(qid, accounts.toSeq)
  }

  // ------------------------------------------------------------- TEP-64

  final case class TokenContent(
      kind: String, // onchain | offchain
      uri: Option[String],
      attributes: Map[String, String])

  private val knownAttrs = Seq("uri", "name", "description", "image",
    "image_data", "symbol", "decimals", "amount_style", "render_type")

  private lazy val attrKeyOf: Map[BigInt, String] = knownAttrs.map { a =>
    val md = java.security.MessageDigest.getInstance("SHA-256")
    BigInt(1, md.digest(a.getBytes("UTF-8"))) -> a
  }.toMap

  /** TEP-64 token content cell: offchain tag 0x01 + snake URI, or onchain
    * tag 0x00 + HashmapE 256 ^Cell keyed by sha256(attr-name). Values are
    * snake format (tag 0x00 + string, possibly continued through refs) or
    * CHUNKED format (tag 0x01 + HashmapE 32 of ^Cell chunks concatenated
    * in key order) — both per the TEP-64 standard; reference consumes the
    * same layout via pytoniq (jetton_content/collection_content columns,
    * database.py:825,873). */
  def tep64Content(b64: String): TokenContent = {
    val s = Boc.parseBase64(b64).beginParse()
    val tag = s.loadUint(8).toInt
    if (tag == 0x01) TokenContent("offchain", Some(s.loadSnakeString()), Map.empty)
    else {
      val dict = Boc.loadDictRefs(s, 256)
      val attrs = dict.flatMap { case (k, cell) =>
        attrKeyOf.get(k).flatMap { name =>
          val vs = cell.beginParse()
          if (vs.remainingBits < 8) None
          else vs.loadUint(8).toInt match {
            case 0x00 => Some(name -> vs.loadSnakeString())
            case 0x01 => // chunked_data: HashmapE 32 ^Cell, key order
              val chunks = Boc.loadDictRefs(vs, 32).toSeq.sortBy(_._1)
              val bytes = chunks.flatMap { case (_, chunk) =>
                val cs = chunk.beginParse()
                cs.loadBytes(cs.remainingBits / 8)
              }.toArray
              Some(name -> new String(bytes, "UTF-8"))
            case _ => None
          }
        }
      }
      TokenContent("onchain", attrs.get("uri"), attrs)
    }
  }

  // ------------------------------------------------- coffee create pool

  final case class CoffeePoolParams(
      first: Option[String], second: Option[String], amm: String)

  final case class CoffeeCreatePoolBody(
      amount: Option[BigInt], params: CoffeePoolParams,
      recipient: Option[String])

  final case class CoffeeCreatePoolRequestBody(
      queryId: BigInt, amount1: BigInt, amount2: BigInt,
      txInitiator: Option[String])

  final case class CoffeeDepositSuccessBody(
      queryId: BigInt, amount1: BigInt, amount2: BigInt, lpAmount: BigInt)

  /** swap.coffee Asset: native$00 | jetton$01 chain:u8 hash:u256 |
    * extra$10 id:u32 (messages/coffee.py:10-30). Native serializes as
    * null, like the reference's _addr(Asset with no jetton). */
  def coffeeAsset(s: Boc.Slice): Option[String] = s.loadUint(2).toInt match {
    case 0 => None
    case 1 =>
      val chain = s.loadUint(8).toInt
      val hash = s.loadBytes(32).map(b => f"${b & 0xff}%02X").mkString
      Some(s"$chain:$hash")
    case 2 => s.loadUint(32); None
    case other => throw new IllegalArgumentException(s"asset tag $other")
  }

  /** pool_params first:Asset second:Asset amm:u3 amm_settings:(Maybe ^)
    * (messages/coffee.py:163-182). */
  def coffeePoolParams(s: Boc.Slice): CoffeePoolParams = {
    val first = coffeeAsset(s)
    val second = coffeeAsset(s)
    val amm = s.loadUint(3).toInt match {
      case 0 => "constant_product"
      case 1 => "curve_fi_stable"
      case _ => "unknown"
    }
    if (s.loadBit()) s.loadRef() // amm_settings
    CoffeePoolParams(first, second, amm)
  }

  private def coffeeCreationRecipient(s: Boc.Slice): Option[String] = {
    val recipient = s.loadAddress()
    s.loadBit() // use_recipient_on_failure
    if (s.loadBit()) s.loadRef() // notification_data
    recipient
  }

  /** create_pool_native#c0ffee02 qid:u64 amount:Coins params
    * creation_params / create_pool_jetton#c0ffee11 params creation_params
    * / create_pool_extra#c0ffee03 qid params creation_params
    * (messages/coffee.py:426-472). */
  def coffeeCreatePool(bodyB64: String): CoffeeCreatePoolBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    val op = s.loadUint(32).toLong
    val amount = op match {
      case 0xc0ffee02L => s.loadUint(64); Some(s.loadCoins())
      case 0xc0ffee11L => None
      case 0xc0ffee03L => s.loadUint(64); None
      case other => throw new IllegalArgumentException(f"opcode 0x$other%08x")
    }
    val params = coffeePoolParams(s)
    CoffeeCreatePoolBody(amount, params, coffeeCreationRecipient(s))
  }

  /** The forward_payload subtree of a jetton transfer body (Either Cell
    * ^Cell) — the carrier for protocol payloads like
    * create_pool_jetton#c0ffee11. */
  def jettonTransferForwardPayload(bodyB64: String): Option[Boc.Cell] = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0x0f8a7ea5L)
    s.loadUint(64); s.loadCoins(); s.loadAddress(); s.loadAddress()
    if (s.loadBit()) s.loadRef() // custom_payload
    s.loadCoins() // forward_ton_amount
    if (s.loadBit()) Some(s.loadRef())
    else { // inline: rebuild the remainder as a cell
      val b = new Boc.Builder()
      while (s.remainingBits > 0) b.storeBit(s.loadBit())
      while (s.remainingRefs > 0) b.storeRef(s.loadRef())
      val c = b.build()
      if (c.bitLen == 0 && c.refs.isEmpty) None else Some(c)
    }
  }

  /** create_pool_jetton decoded from the funding transfer's forward
    * payload (CoffeeCreatePoolCreatorMatcher, blocks/liquidity.py:2086-2096). */
  def coffeeCreatePoolFromTransfer(bodyB64: String): CoffeeCreatePoolBody = {
    val payload = jettonTransferForwardPayload(bodyB64)
      .getOrElse(throw new IllegalArgumentException("no forward payload"))
    val s = payload.beginParse()
    expectOpcode(s, 0xc0ffee11L)
    val params = coffeePoolParams(s)
    CoffeeCreatePoolBody(None, params, coffeeCreationRecipient(s))
  }

  /** create_pool_request#c0ffee25 qid:u64 amount1:Coins amount2:Coins
    * tx_initiator:MsgAddress ^creation_params ^proof
    * (messages/coffee.py:752-772). */
  def coffeeCreatePoolRequest(bodyB64: String): CoffeeCreatePoolRequestBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xc0ffee25L)
    CoffeeCreatePoolRequestBody(s.loadUint(64), s.loadCoins(),
      s.loadCoins(), s.loadAddress())
  }

  final case class CoffeeDepositRequestBody(
      amount: BigInt, poolFirst: Option[String],
      poolSecond: Option[String], sender: Option[String])

  /** create_liquidity_depository_request#c0ffee27 query_id:u64
    * amount:Coins params:^DepositLiquidityParamsTrimmed
    * pool_params:^PoolParams sender:addr proof:^Cell
    * (messages/coffee.py:803-823). */
  def coffeeDepositRequest(bodyB64: String): CoffeeDepositRequestBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xc0ffee27L)
    s.loadUint(64)
    val amount = s.loadCoins()
    s.loadRef() // params
    val pp = coffeePoolParams(s.loadRef().beginParse())
    CoffeeDepositRequestBody(amount, pp.first, pp.second, s.loadAddress())
  }

  /** deposit_liquidity_successful_event#c0ffee33 qid:u64 amount1:Coins
    * amount2:Coins lp_amount:Coins … (messages/coffee.py:520-540). */
  def coffeeDepositSuccess(bodyB64: String): CoffeeDepositSuccessBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xc0ffee33L)
    CoffeeDepositSuccessBody(s.loadUint(64), s.loadCoins(), s.loadCoins(),
      s.loadCoins())
  }

  // ------------------------------------------------------ coffee staking

  final case class CoffeeStakingWithdraw2Body(
      queryId: BigInt, nftId: BigInt, owner: Option[String],
      points: BigInt, jettonWallet: Option[String], jettonAmount: BigInt)

  /** staking_position_withdraw_2#cb03bfaf query_id:u64 nft_id:u64
    * owner:MsgAddress points:Coins ^[wallet:MsgAddress amount:Coins]
    * (messages/coffee.py:1109-1127). */
  def coffeeStakingWithdraw2(bodyB64: String): CoffeeStakingWithdraw2Body = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xcb03bfafL)
    val qid = s.loadUint(64)
    val nftId = s.loadUint(64)
    val owner = s.loadAddress()
    val points = s.loadCoins()
    val jd = s.loadRef().beginParse()
    CoffeeStakingWithdraw2Body(qid, nftId, owner, points,
      jd.loadAddress(), jd.loadCoins())
  }

  final case class CoffeeStakingWithdraw3Body(
      queryId: BigInt, jettonWallet: Option[String], jettonAmount: BigInt,
      owner: Option[String])

  /** staking_position_withdraw_3#cb03bfaf query_id:u64
    * jetton_wallet:MsgAddress jetton_amount:Coins owner:MsgAddress
    * (messages/coffee.py:1130-1144). */
  def coffeeStakingWithdraw3(bodyB64: String): CoffeeStakingWithdraw3Body = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xcb03bfafL)
    CoffeeStakingWithdraw3Body(s.loadUint(64), s.loadAddress(),
      s.loadCoins(), s.loadAddress())
  }

  final case class CoffeeStakingClaimBody(
      queryId: BigInt, jettonWallet: Option[String], jettonAmount: BigInt,
      receiver: Option[String])

  /** staking_claim_rewards#b30c7310 query_id:u64 jetton_wallet:MsgAddress
    * jetton_amount:Coins receiver:MsgAddress payload:(Maybe ^Cell)
    * (messages/coffee.py:1075-1094). */
  def coffeeStakingClaimRewards(bodyB64: String): CoffeeStakingClaimBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xb30c7310L)
    CoffeeStakingClaimBody(s.loadUint(64), s.loadAddress(), s.loadCoins(),
      s.loadAddress())
  }

  /** create_vault#c0ffee06 query_id:u64 asset:Asset — returns the vault
    * asset, None for native (messages/coffee.py:628-639). */
  def coffeeCreateVault(bodyB64: String): Option[String] = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xc0ffee06L)
    s.loadUint(64)
    coffeeAsset(s)
  }

  final case class CoffeeWithdrawEventBody(
      amount1: BigInt, amount2: BigInt, lpAmount: BigInt)

  /** liquidity_withdrawal_event#c0ffee35 qid:u64 amount1:Coins
    * amount2:Coins lp_amount:Coins total_supply reserves
    * (messages/coffee.py:563-581). */
  def coffeeWithdrawalEvent(bodyB64: String): CoffeeWithdrawEventBody = {
    val s = Boc.parseBase64(bodyB64).beginParse()
    expectOpcode(s, 0xc0ffee35L)
    s.loadUint(64)
    CoffeeWithdrawEventBody(s.loadCoins(), s.loadCoins(), s.loadCoins())
  }

  // ----------------------------------------------------------- layerzero

  final case class LzPath(
      srcEid: Int, srcOapp: String, dstEid: Int, dstOapp: String)

  final case class LzPacket(
      path: LzPath, message: String, nonce: BigInt, guid: String)

  final case class LzSendMd(
      sendRequestId: BigInt, msglibManager: String, msglib: String,
      packet: LzPacket, nativeFee: BigInt, zroFee: BigInt)

  final case class LzVerifyStatus(nonce: BigInt, status: String)

  // Cell-header constants from the protocol's FunC builders
  // (messages/layerzero.py LayerZeroMDLzSend/LayerZeroPacket/
  // LayerZeroPath/UlnConnectionVerifyCallbackParser).
  private val LzSendName = BigInt("6c7a53656e64", 16) // "lzSend" big-endian
  private val LzSendHeader = BigInt("582890735024998957421269964955452773563747974476099581")
  private val LzPacketHeader = BigInt("417359019239977417716476838698419835")
  private val LzPathHeader = BigInt("8903714975572488637007080065659")
  private val LzVerifyHeader = BigInt("38421788582694199859296615363593851")

  private def lzHex(v: BigInt): String = "0x" + v.toString(16)

  /** The cell's data bits as '0x…' hex, zero-padded to a byte boundary
    * (LayerZeroPacket.message — python bits.tobytes().hex()). */
  private def cellBitsHex(c: Boc.Cell): String = {
    val nBytes = (c.bitLen + 7) / 8
    val bytes = java.util.Arrays.copyOf(c.data, nBytes)
    val tail = c.bitLen & 7
    if (tail != 0) // zero the completion bits beyond bitLen
      bytes(nBytes - 1) = (bytes(nBytes - 1) & (0xff << (8 - tail))).toByte
    "0x" + bytes.map(b => f"${b & 0xff}%02x").mkString
  }

  /** lz::Path: header(152) ones(198) srcEid:u32 srcOApp:u256 dstEid:u32
    * dstOApp:u256 (messages/layerzero.py:186-203). */
  def lzPath(c: Boc.Cell): LzPath = {
    val s = c.beginParse()
    require(s.loadUint(152) == LzPathHeader, "lz path header")
    s.loadInt(198)
    LzPath(s.loadUint(32).toInt, lzHex(s.loadUint(256)),
      s.loadUint(32).toInt, lzHex(s.loadUint(256)))
  }

  /** lz::Packet: header(152) ones(198) ^path ^message nonce:u64 guid:u256
    * (messages/layerzero.py:149-167). */
  def lzPacket(c: Boc.Cell): LzPacket = {
    val s = c.beginParse()
    require(s.loadUint(152) == LzPacketHeader, "lz packet header")
    s.loadInt(198)
    val path = lzPath(s.loadRef())
    val message = cellBitsHex(s.loadRef())
    LzPacket(path, message, s.loadUint(64), lzHex(s.loadUint(256)))
  }

  /** md::LzSend: "lzSend":u80 header(180) ones(90) sendRequestId:u64
    * msglibManager:u256 msglib:u256 ^packet ^extraOptions
    * ^[connection:u256 nativeFee:u128 zroFee:u128 …]
    * (messages/layerzero.py:86-117). */
  def lzSendMd(c: Boc.Cell): LzSendMd = {
    val s = c.beginParse()
    require(s.loadUint(80) == LzSendName, "lzSend name")
    require(s.loadUint(180) == LzSendHeader, "lzSend header")
    s.loadInt(90)
    val reqId = s.loadUint(64)
    val manager = lzHex(s.loadUint(256))
    val msglib = lzHex(s.loadUint(256))
    val packet = lzPacket(s.loadRef())
    s.loadRef() // extraOptions
    val fees = s.loadRef().beginParse()
    fees.loadUint(256) // msglibConnection
    LzSendMd(reqId, manager, msglib, packet,
      fees.loadUint(128), fees.loadUint(128))
  }

  /** Layerzero::OP::CHANNEL_SEND_CALLBACK a2b5fbae — the LzSend MD sits
    * at ref path [0][0][0] of the body
    * (messages/layerzero.py:592-610 LayerzeroChannelSendCallback). */
  def lzChannelSendCallback(bodyB64: String): LzSendMd = {
    val c = Boc.parseBase64(bodyB64)
    expectOpcode(c.beginParse(), 0xa2b5fbaeL)
    lzSendMd(c.refs(0).refs(0).refs(0))
  }

  /** Channel::OP::CHANNEL_COMMIT_PACKET 5388cd88 — extended-md ref whose
    * first ref is the packet (messages/layerzero.py:383-390). */
  def lzChannelCommitPacket(bodyB64: String): LzPacket = {
    val c = Boc.parseBase64(bodyB64)
    expectOpcode(c.beginParse(), 0x5388cd88L)
    lzPacket(c.refs(0).refs(0))
  }

  /** Channel::OP::LZ_RECEIVE_EXECUTE_CALLBACK caae25a1 — packet at ref
    * path [0][0] (messages/layerzero.py:1377-1383). */
  def lzOappExecuteCallback(bodyB64: String): LzPacket = {
    // the reference parser takes refs[0].refs[0] without any opcode
    // check (messages/layerzero.py:1377-1383) — the receive matcher
    // feeds it the LZ_RECEIVE_EXECUTE body via its double
    // 'execute_callback' label (blocks/layerzero.py:363-379)
    val c = Boc.parseBase64(bodyB64)
    lzPacket(c.refs(0).refs(0))
  }

  /** UltraLightNode::OP::ULN_CONNECTION_VERIFY_CALLBACK 3cb38090 —
    * md::MdObj ref0 = md::VerificationStatus(header(116) ones(234)
    * nonce:u64 status:u32), status code → label
    * (messages/layerzero.py:925-960). */
  def lzVerifyCallback(bodyB64: String): LzVerifyStatus = {
    val c = Boc.parseBase64(bodyB64)
    expectOpcode(c.beginParse(), 0x3cb38090L)
    val vs = c.refs(0).refs(0).beginParse()
    require(vs.loadUint(116) == LzVerifyHeader, "verify status header")
    vs.loadInt(234)
    val nonce = vs.loadUint(64)
    val status = vs.loadUint(32).toLong match {
      case 0x3bbc306bL => "succeeded"
      case 0x7fcbb4acL => "nonce_out_of_range"
      case 0x29c53fabL => "dvn_not_configured"
      case other => s"unknown_$other"
    }
    LzVerifyStatus(nonce, status)
  }

  /** Register decode UDFs (null on malformed input — decoders must never
    * kill a query; reference wraps the same way). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    def safe[T](f: String => T): String => T =
      s => try { if (s == null) null.asInstanceOf[T] else f(s) }
           catch { case scala.util.control.NonFatal(_) => null.asInstanceOf[T] }
    spark.udf.register("tlb_jetton_transfer_amount",
      safe(b => jettonTransfer(b).amount.bigInteger.toString))
    spark.udf.register("tlb_jetton_transfer_destination",
      safe(b => jettonTransfer(b).destination.orNull))
    spark.udf.register("tlb_comment", safe(b => comment(b).orNull))
  }
}
