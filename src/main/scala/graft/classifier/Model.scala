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
    body: Option[String],
    // init_state_boc of the message that deployed the destination —
    // feeds the getgems get_sale_data/get_auction_data parse (reference
    // messages/getgems.py:64-119)
    initState: Option[String] = None,
    // unixtime the message was created — feeds the action start_utime
    // (EventNode.get_utime, tree_utils.py:83-89); tx.now stands in when
    // absent
    createdAt: Option[Long] = None,
    // position of the message within its transaction's message list —
    // the reference's tree children follow tx.messages order verbatim
    // (to_tree, tree_utils.py:107-116), which on the golden fixtures is
    // the dump order, NOT created_lt order. Callers with a meaningful
    // source order (GoldenCorpus) set it; the distributed path leaves it
    // None and TxTree falls back to the deterministic created_lt sort.
    seqNo: Option[Int] = None)

/** Pre-joined nft_items dim row (the reference resolves these through
  * the interface repository at classify time, blocks/nft.py:54-75 — here
  * the repository becomes a broadcast map, no IO inside matchers). */
case class NftItemInfo(index: Option[String], collection: Option[String])

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
    descr: String,
    // masterchain seqno of the tx's block (action.mc_seqno_end = the
    // max over the action's txs, block_tree_serializer.py:114)
    mcSeqno: Option[Int] = None)

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

    val roots = scala.collection.mutable.ArrayBuffer[String]()
    val txByHash = txs.map(t => t.hash -> t).toMap
    val sortedTxs = txs.sortBy(t => (t.lt, t.account))
    // which tx consumed each message (by in-msg hash)
    val consumerOf: Map[String, String] = (for {
      t <- sortedTxs
      m <- byTx.getOrElse(t.hash, Nil) if m.direction == "in"
    } yield m.msgHash -> t.hash).toMap
    sortedTxs.foreach { t =>
      val in = byTx.getOrElse(t.hash, Nil).find(_.direction == "in")
      if (!in.flatMap(m => producerOf.get(m.msgHash)).exists(_ != t.hash))
        roots += t.hash
    }
    // tx.messages order when the caller supplied one (the reference's
    // to_tree children follow it verbatim, tree_utils.py:107-116);
    // deterministic created_lt sort otherwise (distributed path — shuffle
    // arrival order is not reproducible)
    def orderedOuts(ms: Seq[MsgLite]): Seq[MsgLite] = {
      val outs = ms.filter(_.direction == "out")
      if (outs.nonEmpty && outs.forall(_.seqNo.isDefined))
        outs.sortBy(_.seqNo.get)
      else
        // msg_hash tie-break: created_lt is unique per account on-chain,
        // but the shuffle arrival order must never leak into the tree
        outs.sortBy(m => (m.createdLt.isDefined,
          m.createdLt.getOrElse(0L), m.msgHash))
    }
    def mk(hash: String): TxNode = {
      val t = txByHash(hash)
      val ms = byTx.getOrElse(hash, Nil)
      val outs = orderedOuts(ms)
      // EXTERNAL-OUT messages (no destination — log events) become leaf
      // child nodes wrapping the emitting tx, exactly as the reference
      // tree does (tree_utils.py:111-113: `if m.destination is None:
      // add_child(EventNode(m))`) — the tgBTC/LayerZero event matchers
      // anchor on them. The framed hash keeps the node distinct while
      // txHashes/accounts report the real emitting tx.
      val extOutKids = outs.filter(_.destination.isEmpty).map { m =>
        TxNode(t.copy(hash = s"extout:${t.hash}:${m.msgHash}"),
          Some(m), Nil, Nil)
      }
      // children in the parent's out-message order (each out message's
      // consuming tx), mirroring to_tree's add_child sequence
      val kids = outs.filter(_.destination.nonEmpty)
        .flatMap(m => consumerOf.get(m.msgHash)).filter(_ != hash)
        .distinct.map(mk)
      TxNode(t,
        ms.find(_.direction == "in"),
        outs,
        kids ++ extOutKids)
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

  // DEX — StonFi v1 (messages/swaps.py:9,27) and DeDust (:121-130)
  val StonfiSwap = 0x25938561L
  val StonfiPayment = 0xf93bb43fL

  // StonFi v2 (blocks/swaps.py:233-237; liquidity.py:687-905). ProvideLp
  // (0x37c096df) is shared with v1 — the required 0x50c6a654 child chain
  // is what discriminates the versions.
  val StonfiV2Swap = 0x6664de2aL
  val StonfiV2PayTo = 0x657b54f5L
  val StonfiV2PayVault = 0x63381632L
  val StonfiV2DepositRefFee = 0x0490f09bL
  val StonfiV2AddLiquidity = 0x50c6a654L
  val StonfiV2CbAddLiquidity = 0x06ecd527L
  val StonfiV2WithdrawLiquidity = 0x297437cfL
  val StonfiV2WithdrawPrepare = 0x132b9a2cL
  val StonfiV2WithdrawRefunded = 0x0f98e2b8L
  val PTonTransferOp = 0x01f3835dL
  val DedustSwap = 0xea06185dL
  val DedustSwapPeer = 0x72aca8aaL
  val DedustSwapExternal = 0x61ee542dL
  val DedustSwapNotification = 0x9c610de3L
  val DedustPayout = 0x474f86cfL
  val DedustPayoutFromPool = 0xad4eb6f5L

  // staking — TONStakers + elector (messages/staking.py:6-40)
  val TonstakersDeposit = 0x47d54391L
  val TonstakersWithdraw = 0x319b0cdcL
  val TonstakersMint = 0x1674b0a0L // MintJettons AND MintNFT share the opcode
  val TonstakersInitNft = 0x132f9a45L
  val TonstakersPoolWithdrawal = 0x0a77535cL
  val TonstakersNftBurn = 0xf127fe4eL
  val TonstakersNftBurnNotification = 0xed58b0b2L
  val TonstakersDistributedAsset = 0xdb3b8abdL
  // pool → payout collection: start asset distribution
  // (TONStakersDelayedWithdrawalMatcher._try_find_pool_addr,
  // blocks/staking.py:290)
  val TonstakersStartDistribution = 0x1140a64fL
  val ElectorDeposit = 0x4e73744bL
  val ElectorDepositConfirm = 0xf374484cL
  val ElectorRecover = 0x47657424L
  val ElectorRecoverConfirm = 0xf96f7324L

  // multisig (messages/multisig.py:14-103)
  val MultisigNewOrder = 0xf718510fL
  val MultisigInitOrder = 0x9c73fba2L
  val MultisigApprove = 0xa762230fL
  val MultisigApproveAccepted = 0x82609bf6L
  val MultisigApproveRejected = 0xafaf283eL
  val MultisigExecute = 0x75097f5dL

  // liquidity — DeDust deposit chain + StonFi provide
  // (messages/liquidity.py:18,58-74,100)
  val DedustDepositTonToVault = 0xd55e4686L
  val DedustDeployDepositContract = 0x9b3aa3faL
  val DedustTopUpDepositContract = 0x54240fe5L
  val DedustDepositToPool = 0xb56b9598L
  val DedustAskLiquidityFactory = 0xf04ec526L
  val DedustRejectDeposit = 0xe1a36cd4L // blocks/liquidity.py:383
  val DedustDestroyDepositContract = 0xaae79256L // messages/liquidity.py:92
  val DedustReturnExcessFromVault = 0x6b0b787fL // messages/liquidity.py:96
  val DedustDepositJettonFwd = 0x40e108d6L // messages/liquidity.py:41
  val StonfiProvideLp = 0x37c096dfL

  // NFT auctions (messages/nft.py:105,137)
  val TeleitemStartAuction = 0x487a8e81L
  val AuctionFillUp = 0x370fec51L

  // jvault staking (messages/jvault.py:27-101)
  val JvaultReceiveJettons = 0xd68a4ac1L
  val JvaultUnstakeJettons = 0x499a9262L
  val JvaultUnstakeRequest = 0x0168d4b7L
  val JvaultClaim = 0x78d9f109L
  val JvaultSendClaimedRewards = 0x44bc1fe3L
  val JvaultRequestUpdateRewards = 0xf5c5baa3L
  val JvaultCancelStake = 0x9eada1d9L
  val JvaultUpdateRewards = 0xae9307ceL // messages/jvault.py:111
  val JvaultRequestUpdateReferrer = 0x55c35b40L // messages/jvault.py:115
  val JvaultUpdateReferrer = 0x076ee4e0L // messages/jvault.py:119
  val JvaultSetData = 0x383411eaL // messages/jvault.py:124

  // tgBTC bridge events (messages/tgbtc.py:20-82) and the full-chain
  // anchor calls with their auxiliaries (blocks/tgbtc.py:54-268)
  val TgbtcMint = 0x77a80ef3L
  val TgbtcBurn = 0xca444ce6L
  val TgbtcNewKey = 0x27756729L
  val TgbtcDkgCompleted = 0x453443a6L
  val TgbtcMintCall = 0xe42a879bL
  val TgbtcMintHead = 0x3f781d24L
  val TgbtcNewKeyAnchor = 0x690f357aL
  val TgbtcBurnCall = 0xbe44e7a6L
  val TgbtcBurnAux1 = 0x1a84c0e0L
  val TgbtcBurnAux2 = 0x587643a2L

  // nominator pool (messages/staking.py:59-60; comment-anchored deposit
  // 'd' / withdraw-request 'w', blocks/staking.py:302-410)
  val NominatorPoolProcessWithdrawRequests = 0x00000002L

  // getgems sale/auction lifecycle (blocks/auction.py:359-545)
  val NftCancelSaleOp = 0x00000003L
  val AuctionCancelOp = 0x5616c572L
  val AuctionFinishOp = 0x20c9eb18L
  val AuctionStopOp = 0xb95616b6L
  val TeleitemCancelAuction = 0x371638aeL
  val TeleitemOk = 0xa37a0983L
  val SaleUpdate = 0x6c6c2080L

  // TONCO v3 liquidity deposit chain (messages/liquidity.py:139,227,465)
  val ToncoPoolV3FundAccount = 0x4468de77L
  val ToncoAccountV3AddLiquidity = 0x3ebe5431L
  val ToncoPoolV3MintAndRefund = 0x81702ef8L

  // TONCO v3 swap (messages/swaps.py:226,345)
  val ToncoPoolV3Swap = 0xa7fb58f8L
  val ToncoRouterV3PayTo = 0xa1daa96dL
  val ToncoPositionInit = 0xd5ecca2aL

  // EVAA lending (messages/evaa.py:13-151) — tiny opcodes, matched only
  // with their required child pattern
  val EvaaSupplyMaster = 0x1L
  val EvaaSupplyUser = 0x11L
  val EvaaSupplySuccess = 0x11aL
  val EvaaSupplyFail = 0x11fL
  val EvaaWithdrawMaster = 0x2L
  val EvaaWithdrawUser = 0x21L
  val EvaaWithdrawCollateralized = 0x211L
  val EvaaWithdrawSuccess = 0x211aL
  val EvaaWithdrawFail = 0x211fL
  val EvaaWithdrawNoFundsExcess = 0x211fe8L
  /** user-contract fail excesses → reason (messages/evaa.py:228-246). */
  val EvaaWithdrawFailExcessReasons: Map[Long, String] = Map(
    0x21e6L -> "withdraw_locked_excess",
    0x21e7L -> "withdraw_not_collateralized_excess",
    0x21e8L -> "withdraw_missing_prices_excess",
    0x21ecL -> "withdraw_execution_crashed")
  /** sha256('TON') — the native-asset id (blocks/evaa.py:51). */
  val EvaaTonAssetId: BigInt =
    BigInt("1A4219FE5E60D63AF2A3CC7DCE6FEC69B45C6B5718497A6148E7C232AC87BD8A", 16)

  // Coffee DEX (messages/coffee.py:338-590)
  val CoffeeSwapNative = 0xc0ffee00L
  val CoffeeSwapInternal = 0xc0ffee20L
  val CoffeePayoutInternal = 0xc0ffee21L
  val CoffeePayoutOut = 0xc0ffee32L
  val CoffeeNotification = 0xc0ffee36L
  val CoffeeSwapJetton = 0xc0ffee10L
  val CoffeeSwapSuccess = 0xc0ffee30L
  val CoffeeSwapFailed = 0xc0ffee31L
  val CoffeeCreatePoolNative = 0xc0ffee02L
  val CoffeeDepositLiquidityNative = 0xc0ffee04L
  val CoffeeDepositRequest = 0xc0ffee27L
  val CoffeeDepositInternal = 0xc0ffee29L
  val CoffeeDepositLiquiditySuccess = 0xc0ffee33L
  val CoffeeLiquidityWithdrawalEvent = 0xc0ffee35L

  // LayerZero endpoint/channel (messages/layerzero.py:384,477-482)
  val LayerZeroEndpointSend = 0xdd4ea3b4L
  val LayerZeroChannelCommitPacket = 0x5388cd88L
  val LayerZeroEventMsg = 0xe33b9873L
  // LayerZero send chain (messages/layerzero.py:515-655,779-784)
  val LayerZeroChannelSend = 0x536feb09L
  val LayerZeroMsglibConnectionSend = 0x4002b790L
  val LayerZeroUlnSend = 0x5de68393L
  val LayerZeroMsglibSendCallback = 0x421c1a25L
  val LayerZeroChannelSendCallback = 0xa2b5fbaeL
  // LayerZero commit chain (messages/layerzero.py:470-475,640-648,
  // 765-770,828-833)
  val LayerZeroUlnCommitPacket = 0x28b97077L
  val LayerZeroUlnConnectionCommitPacket = 0xf9d37b80L
  val LayerZeroEndpointCommitPacket = 0x5dab749aL
  val LayerZeroMsglibCommitCallback = 0x5e178f33L
  // LayerZero verify chain (messages/layerzero.py:835-840,912-916,1227-1232)
  val LayerZeroProxyCall = 0x09f047d9L
  val LayerZeroUlnConnectionVerify = 0x4ec8f80aL
  val LayerZeroUlnVerifyCallback = 0x3cb38090L

  // Ethena staking (blocks/ethena_staking.py:61-64; messages/jettons.py:143)
  val JettonMint = 0x642b7d07L
  // minter-style mint call (messages/jettons.py:156)
  val MinterJettonMint = 0x00000015L
  val EthenaTsUsdeTransfer = 0xb2583ed5L

  // cocoon payment proxies (messages/cocoon.py:13-130)
  val CocoonReturnExcesses = 0x2565934cL
  val CocoonPayout = 0xc59a7cd3L
  val CocoonClientTopUp = 0x5cfc6b87L
  val CocoonClientRegister = 0xa35cb580L
  val CocoonRefundGranted = 0xc68ebc7bL

  // dns (messages/dns.py:7; release messages/nft.py:148)
  val ChangeDnsRecord = 0x4eb1f0f9L
  val DnsReleaseBalance = 0x4ed14b65L

  // NFT discovery protocol (messages/nft.py:79,92)
  val NftDiscovery = 0x2fcb26a2L
  val NftReportStaticData = 0x8b771735L

  // TONCO pool lifecycle (messages/liquidity.py:289-350; burn chain
  // blocks/liquidity.py ToncoWithdrawLiquidityMatcher)
  val ToncoRouterV3CreatePool = 0x2e3034efL
  val ToncoPoolV3Init = 0x441c39edL
  val ToncoPoolV3StartBurn = 0x530b5f2cL
  val ToncoPositionNftBurn = 0x46ca335aL
  val ToncoPoolV3Burn = 0xd73ac09dL

  // EVAA liquidation (messages/evaa.py:257-472)
  val EvaaLiquidateMaster = 0x3L
  val EvaaLiquidateUser = 0x31L
  val EvaaLiquidateSatisfied = 0x311L
  val EvaaLiquidateUnsatisfied = 0x31fL
  val EvaaLiquidateSuccess = 0x311aL
  val EvaaLiquidateFail = 0x311fL

  // LayerZero receive/verify path (messages/layerzero.py:543-555,
  // 1045-1113,1377)
  val LayerZeroChannelLzReceivePrepare = 0x22f3ac09L
  val LayerZeroLzReceivePrepare = 0x97df404cL
  val LayerZeroChannelLzReceiveLock = 0xb7680bc6L
  val LayerZeroLzReceiveExecute = 0x0c7b8418L
  val LayerZeroOappExecuteCallback = 0xcaae25a1L
  val LayerZeroDvnVerify = 0xa0d51a8dL
  val LayerZeroUlnVerify = 0x994aaf4eL

  // Coffee vault / pool-creator / MEV / staking (messages/coffee.py:
  // 628-742,868-905,946-978,1026-1140)
  val CoffeeCreateVault = 0xc0ffee06L
  val CoffeeCreateVaultInternal = 0xc0ffee2aL
  val CoffeeActivateVaultInternal = 0xc0ffee2cL
  val CoffeeCreatePoolCreator = 0xc0ffee23L
  val CoffeeCreatePoolCreatorInternal = 0xc0ffee24L
  val CoffeeCreatePoolJetton = 0xc0ffee11L // jetton forward payload
  val CoffeeCreatePoolExtra = 0xc0ffee03L
  val CoffeeDeploy = 0xc0ffee22L
  val CoffeeCreatePoolRequest = 0xc0ffee25L
  val CoffeeMevProtectHoldFunds = 0x6bc79e7eL
  val CoffeeMevProtectFailedSwap = 0xee51ce51L
  val CoffeeStakingDeposit = 0xf9471134L
  val CoffeeStakingWithdraw = 0xcb03bfafL // withdraw_1/2/3 share the opcode
  val CoffeeStakingClaimRewards = 0xb30c7310L

  // Cocoon long tail (messages/cocoon.py:496-703)
  val CocoonPayoutPayload = 0xa040ad28L
  val CocoonLastPayoutPayload = 0xf5f26a36L
  val CocoonWorkerProxyRequest = 0x4d725d2cL
  val CocoonClientProxyRequest = 0x65448ff4L
  val CocoonExtClientTopUp = 0xf172e6c2L
  val CocoonOwnerClientRegister = 0xc45f9f3bL
  val CocoonGrantRefundPayload = 0xefd711e1L
  val CocoonExtProxyPayoutRequest = 0x7610e6ebL
  val CocoonChargePayload = 0xbb63ff93L
  val CocoonRegisterProxy = 0x927c7cb5L
  val CocoonUnregisterProxy = 0x6d49eaf2L
  val CocoonClientChangeSecretHash = 0xa9357034L
  val CocoonClientIncreaseStake = 0x6a1f6a60L
  val CocoonClientWithdraw = 0xda068e78L
  val CocoonClientRequestRefund = 0xfafa6cc1L
  val CocoonOwnerWalletSendMessage = 0x9c69f376L // messages/cocoon.py:735

  // vesting (messages/vesting.py:12-34)
  val VestingSendMessage = 0xa7733acdL
  val VestingSendMessageResponse = 0xf7733acdL
  val VestingAddWhitelist = 0x7258a69bL
  val VestingAddWhitelistResponse = 0xf258a69bL

  // subscriptions / wallet plugins (messages/subscriptions.py:7-24)
  val SubscriptionPaymentRequest = 0x706c7567L
  val SubscriptionPaymentRequestResponse = 0xf06c7567L
  val SubscriptionPayment = 0x73756273L
  val WalletPluginDestruct = 0x64737472L

  /** opcode column is signed int32; compare on the unsigned 32-bit value. */
  def matches(op: Option[Long], wanted: Long): Boolean =
    op.exists(o => (o & 0xffffffffL) == (wanted & 0xffffffffL))
}
