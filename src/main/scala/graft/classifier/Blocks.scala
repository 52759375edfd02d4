package graft.classifier

/** Ghost-hash codec shared by the unroll path and the serializer. */
object Ghost {
  /** "ghost:<realTxHash>:<i>" → "<realTxHash>" and
    * "extout:<realTxHash>:<msgHash>" → "<realTxHash>" (base64 hashes
    * carry no ':', so the frames are unambiguous); anything else passes
    * through. */
  def realHash(h: String): String =
    if (h.startsWith("ghost:")) h.substring(6, h.lastIndexOf(':'))
    else if (h.startsWith("extout:")) h.substring(7, h.lastIndexOf(':'))
    else h
}

/** Block tree — the classifier's working representation (reference:
  * indexer/indexer/events/blocks/core.py). Each block wraps ≥1 tree nodes;
  * matchers rewrite the tree by merging children into typed blocks.
  */
sealed trait Block {
  def btype: String
  def nodes: Seq[TxNode] // transactions this block spans
  def children: Seq[Block]
  def failed: Boolean
  def withChildren(cs: Seq[Block]): Block
  /** Data-integrity flag (core.py:120): set when a matcher detects the
    * on-chain data contradicts the repository (e.g. a jetton transfer
    * whose stated receiver disagrees with the receiver wallet's owner
    * row, jettons.py:75-77). Any broken block makes the whole trace's
    * classification_state 'broken' (block_tree_serializer.py:1537-1538). */
  def broken: Boolean = false

  /** Ghost nodes (forged by ExternalUnroll, hash "ghost:<real>:<i>")
    * report the REAL wallet tx hash — the reference's ghost EventNode
    * carries the wallet transaction itself (event_processing.py:186). */
  def txHashes: Seq[String] = nodes.map(n => Ghost.realHash(n.tx.hash)).distinct
  /** is_ghost_block (core.py:132-134): any forged node makes the block a
    * ghost — an intended-but-never-started operation. */
  def isGhost: Boolean = nodes.exists(_.tx.hash.startsWith("ghost:"))
  /** EventNode.get_lt (tree_utils.py:75-81): the in-message's created_lt
    * when present (external-in and tick-tock fall back to the tx lt). The
    * action's start_lt therefore begins at message CREATION, one or two
    * lts before the consuming tx. */
  private def nodeLt(n: TxNode): Long =
    n.inMsg.flatMap(_.createdLt).getOrElse(n.tx.lt)
  private def nodeUtime(n: TxNode): Long =
    n.inMsg.filter(_.createdLt.nonEmpty).flatMap(_.createdAt)
      .getOrElse(n.tx.now.toLong)
  def minLt: Long = nodes.map(nodeLt).min
  def maxLt: Long = nodes.map(_.tx.lt).max
  def minUtime: Long = nodes.map(nodeUtime).min
  def maxUtime: Long = nodes.map(_.tx.now.toLong).max
  /** Root event node: min by get_lt (_calc_action_id,
    * block_tree_serializer.py:99-108). */
  def anchorNode: TxNode = nodes.minBy(nodeLt)
  /** Earliest in-message hash — seed for the deterministic action id. */
  def anchorMsgHash: String = {
    val n = anchorNode
    n.inMsg.map(_.msgHash).getOrElse(n.tx.hash)
  }
  def bfs: Seq[Block] = {
    val buf = scala.collection.mutable.ArrayBuffer[Block](this)
    var i = 0
    while (i < buf.length) { buf ++= buf(i).children; i += 1 }
    buf.toSeq
  }
}

/** Synthetic root holding a trace's root blocks. */
case class RootBlock(children: Seq[Block]) extends Block {
  val btype = "root"
  val nodes: Seq[TxNode] = children.flatMap(_.nodes)
  val failed = false
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

/** G3b seed blocks (reference: blocks/basic_blocks.py:28-121). */
case class TickTockBlock(node: TxNode, children: Seq[Block]) extends Block {
  val btype = "tick_tock"
  val nodes = Seq(node)
  val failed = false
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

case class TonTransferBlock(node: TxNode, failed: Boolean,
    comment: Option[String], encrypted: Boolean,
    children: Seq[Block]) extends Block {
  val btype = "ton_transfer"
  val nodes = Seq(node)
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

case class CallContractBlock(node: TxNode, failed: Boolean,
    children: Seq[Block]) extends Block {
  val btype = "call_contract"
  val nodes = Seq(node)
  def opcode: Option[Long] = node.inMsg.flatMap(_.opcode)
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

case class ContractDeployBlock(node: TxNode) extends Block {
  val btype = "contract_deploy"
  val nodes = Seq(node)
  val children: Seq[Block] = Nil
  val failed = false
  def withChildren(cs: Seq[Block]): Block = this
}

/** Typed protocol blocks produced by matchers (G6/G7). */
case class JettonTransferBlock(
    sender: Option[String], senderWallet: String,
    receiver: Option[String], receiverWallet: Option[String],
    amount: BigDecimal, comment: Option[String],
    failed: Boolean, nodes: Seq[TxNode],
    children: Seq[Block],
    decoded: Option[graft.functions.TlbDecoders.JettonTransferBody] = None,
    // repository-resolved master (or "TON"); wallet address stands in
    // downstream when absent
    asset: Option[String] = None,
    // false for pTON rewrites — the transfer executed directly, with no
    // wallet→wallet internal_transfer leg (jettons.py:141 'has_internal_
    // transfer'); v1 swap fills null their wallet columns off this flag
    hasInternalTransfer: Boolean = true,
    // forward payload of a pTON v2 ton_transfer leg (decoded has none —
    // the TONCO failed-swap target extraction reads it,
    // swaps.py:1155-1199)
    ptonForwardPayload: Option[String] = None,
    // pTON rewrites serialize with NULL wallet secondaries
    // (PTonTransferMatcher data, jettons.py:142-146: sender_wallet and
    // receiver_wallet both None) while keeping the wallet internally for
    // asset resolution
    walletsHidden: Boolean = false,
    // owner-validation outcome (jettons.py:75-77): stated receiver ≠
    // the receiver wallet row's owner — receiver was substituted and
    // the trace classifies as 'broken'
    override val broken: Boolean = false)
  extends Block {
  val btype = "jetton_transfer"
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

case class JettonBurnBlock(
    owner: Option[String], ownerWallet: String, amount: BigDecimal,
    failed: Boolean, nodes: Seq[TxNode], children: Seq[Block],
    // repository-resolved master; the wallet stands in when absent
    asset: Option[String] = None) extends Block {
  val btype = "jetton_burn"
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

case class NftTransferBlock(
    oldOwner: Option[String], newOwner: Option[String], nftItem: String,
    failed: Boolean, nodes: Seq[TxNode], children: Seq[Block],
    decoded: Option[graft.functions.TlbDecoders.NftTransferBody] = None,
    // fragment/marketplace purchase detail (TelegramNftPurchase path;
    // getgems enrichment from the sale/auction dim, blocks/nft.py:142-158)
    isPurchase: Option[Boolean] = None,
    price: Option[BigDecimal] = None,
    marketplace: Option[String] = None,
    marketplaceAddress: Option[String] = None,
    realPrevOwner: Option[String] = None,
    // nft_items-dim payloads (index + collection, blocks/nft.py:54-75)
    itemIndex: Option[String] = None,
    collection: Option[String] = None,
    // ownership-assigned-anchored path (fragment): query id + raw
    // forward payload from the OA body — the reference fills these with
    // forward_amount/response/custom left null (blocks/nft.py:316-331)
    oaQueryId: Option[String] = None,
    oaForwardPayload: Option[String] = None)
  extends Block {
  val btype = "nft_transfer"
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

/** Jetton mint: internal_transfer arriving WITHOUT a preceding wallet
  * transfer (master-initiated; reference test corpus jetton-mints.yaml).
  * The mint-call matcher upgrades it with the call anchor's data: the
  * master as asset and the attached ton_amount
  * (_get_jetton_mint_data, blocks/jettons.py:179-230). */
case class JettonMintBlock(
    receiver: Option[String], receiverWallet: Option[String],
    amount: BigDecimal,
    failed: Boolean, nodes: Seq[TxNode], children: Seq[Block],
    master: Option[String] = None,
    tonAmount: Option[BigDecimal] = None) extends Block {
  val btype = "jetton_mint"
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

/** Generic DEX swap: two jetton transfers chained through a router
  * (built on REWRITTEN jetton_transfer blocks — second-pass matching). */
case class JettonSwapBlock(
    dex: String, sender: Option[String], router: Option[String],
    inTransfer: JettonTransferBlock, outTransfer: JettonTransferBlock,
    failed: Boolean, nodes: Seq[TxNode], children: Seq[Block],
    // multi-hop routes (StonFi v2): already []-gated for <=1 hop by the
    // matcher (blocks/swaps.py:459: peer_swaps if len>1 else [])
    peerSwaps: Seq[PeerSwapData] = Nil) extends Block {
  val btype = "jetton_swap"
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

/** A jetton_swap carrying a pre-built detail struct — for DEXes whose
  * in/out legs may be native TON movements with no JettonTransferBlock
  * to hang data on (swap.coffee, blocks/swaps.py:1231-1458). Endpoint
  * columns follow _fill_jetton_swap_action. */
case class JettonSwapDirectBlock(
    data: JettonSwapData,
    source: Option[String], destination: Option[String],
    asset: Option[String], asset2: Option[String],
    sourceSecondary: Option[String], destinationSecondary: Option[String],
    failed: Boolean, nodes: Seq[TxNode], children: Seq[Block]) extends Block {
  val btype = "jetton_swap"
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

/** Generic typed protocol block built from an opcode-chain match — the
  * Scala analogue of the reference's per-protocol Block subclasses with
  * `data` dicts (e.g. SubscriptionBlock, blocks/subscriptions.py:12-26;
  * staking blocks, blocks/staking.py; multisig/vesting/dns blocks). The
  * btype carries the canonical action-type name used by the reference
  * serializer (blocks/utils/block_tree_serializer.py:1302-1446). */
case class ProtocolOpBlock(
    btype: String,
    source: Option[String], destination: Option[String],
    asset: Option[String], value: Option[BigDecimal],
    failed: Boolean, nodes: Seq[TxNode], children: Seq[Block],
    dex: Option[String] = None,
    peerSwapCount: Int = 0,
    peerSwaps: Seq[PeerSwapData] = Nil,
    tsNft: Option[String] = None,
    tokensBurnt: Option[BigDecimal] = None,
    tokensMinted: Option[BigDecimal] = None,
    provider: Option[String] = None,
    listing: Option[NftListingData] = None,
    // secondary endpoints (reference Action.source_secondary /
    // destination_secondary, database.py:203-206)
    sourceSecondary: Option[String] = None,
    destinationSecondary: Option[String] = None,
    // typed detail payloads, filled by the family's matcher
    changeDns: Option[ChangeDnsRecordData] = None,
    msigCreate: Option[MultisigCreateOrderData] = None,
    msigApprove: Option[MultisigApproveData] = None,
    msigExecute: Option[MultisigExecuteData] = None,
    vestingSend: Option[VestingSendMessageData] = None,
    vestingWhitelist: Option[VestingAddWhitelistData] = None,
    depositLiquidity: Option[DexDepositLiquidityData] = None,
    withdrawLiquidity: Option[DexWithdrawLiquidityData] = None,
    // the minted position item of a coffee staking deposit (matcher-known)
    mintedItem: Option[String] = None,
    // swap slippage bound (TONCO-only in the reference serializer:387-395)
    minOut: Option[BigDecimal] = None,
    // LayerZero detail payloads (matcher-decoded from the chain bodies)
    assetSecondary: Option[String] = None,
    lzSend: Option[LayerZeroSendData] = None,
    lzPacket: Option[LayerZeroPacketData] = None,
    lzDvn: Option[LayerZeroDvnVerifyData] = None,
    // nft_items-dim payloads (mint index; coffee staking position)
    nftMint: Option[NftMintData] = None,
    mintedItemIndex: Option[String] = None,
    coffeeWithdraw: Option[CoffeeStakingWithdrawData] = None,
    // TONCO pool deploy: full parameter struct decoded from the
    // create-pool body (liquidity.py:1557-1620)
    toncoDeploy: Option[ToncoDeployPoolData] = None,
    // getgems purchase: the full transfer-detail payload
    // (_fill_nft_purchase_action, block_tree_serializer.py:235-257)
    nftPurchase: Option[NftTransferData] = None,
    // jvault matcher-decoded payloads (blocks/jvault.py fills); the
    // opcode override carries the exit code of failed unstakes
    // (_fill_jvault_unstake:743)
    jvaultStake: Option[JvaultStakeData] = None,
    jvaultClaim: Option[JvaultClaimData] = None,
    opcodeOverride: Option[Long] = None,
    // cocoon matcher-decoded payloads (blocks/cocoon.py fills)
    cocoonWorkerPayout: Option[CocoonWorkerPayoutData] = None,
    cocoonRegister: Option[CocoonClientRegisterData] = None,
    cocoonGrantRefund: Option[CocoonChargeData] = None,
    cocoonRefund: Option[CocoonRequestRefundData] = None,
    cocoonClientWithdraw: Option[CocoonClientWithdrawData] = None,
    cocoonCharge: Option[CocoonChargeData] = None,
    // coffee create-pool pair columns + detail struct
    asset2: Option[String] = None,
    asset2Secondary: Option[String] = None,
    coffeePool: Option[CoffeeCreatePoolData] = None,
    // multisig signer set (accounts-list extras,
    // block_tree_serializer.py:781/:792/:807)
    signers: Seq[String] = Nil,
    // token quantity when it differs from `value` (the reference's
    // action.amount vs action.value split — e.g. jetton mint carries
    // both the minted amount and the attached ton_amount)
    amount: Option[BigDecimal] = None) extends Block {
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

/** EVAA supply (blocks/evaa.py:93-309): ton or jetton deposit into the
  * lending pool, resolved through the user-contract round trip. Field
  * names mirror EvaaSupplyData; the serializer applies
  * _fill_evaa_supply_action (block_tree_serializer.py:677-693). */
case class EvaaSupplyActionBlock(
    sender: Option[String], senderJettonWallet: Option[String],
    recipient: Option[String], recipientContract: Option[String],
    recipientJettonWallet: Option[String],
    masterJettonWallet: Option[String],
    master: Option[String], asset: Option[String],
    amount: Option[BigDecimal], assetIdHex: Option[String],
    isTon: Boolean, isSuccess: Boolean,
    failed: Boolean, nodes: Seq[TxNode], children: Seq[Block]) extends Block {
  val btype = "evaa_supply"
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

/** EVAA withdraw (blocks/evaa.py:340-566): the user-contract decision
  * round trip ending in a payout (success), a master-side no-funds
  * revert, or a user-contract fail excess. Serializer fill:
  * _fill_evaa_withdraw_action (block_tree_serializer.py:695-711). */
case class EvaaWithdrawActionBlock(
    owner: Option[String], ownerContract: Option[String],
    recipient: Option[String],
    recipientJettonWallet: Option[String],
    masterJettonWallet: Option[String],
    master: Option[String], asset: Option[String],
    amount: Option[BigDecimal], assetIdHex: Option[String],
    isTon: Boolean, isSuccess: Boolean, failReason: Option[String],
    failed: Boolean, nodes: Seq[TxNode], children: Seq[Block]) extends Block {
  val btype = "evaa_withdraw"
  def withChildren(cs: Seq[Block]): Block = copy(children = cs)
}

/** Terminal fallback (G9, block_tree_serializer.py:1564-1587). */
case class UnknownBlock(nodes: Seq[TxNode]) extends Block {
  val btype = "unknown"
  val children: Seq[Block] = Nil
  val failed = false
  def withChildren(cs: Seq[Block]): Block = this
}

object Seeder {

  /** G3b: one seed block per tree node, with the reference's failure
    * heuristics (basic_blocks.py:56-64,88-89) and ContractDeploy children
    * on uninit→active transitions (:69-71,91-93). */
  def seed(node: TxNode): Block = {
    val tx = node.tx
    val in = node.inMsg
    val children = node.children.map(seed) ++ deployChild(node)
    if (tx.descr == "tick_tock") {
      TickTockBlock(node, children)
    } else {
      val op = in.flatMap(_.opcode)
      val isTransfer = in.nonEmpty &&
        (op.isEmpty || op.contains(Opcodes.TextComment) ||
          Opcodes.matches(op, Opcodes.EncryptedComment)) &&
        in.exists(m => m.source.nonEmpty && m.destination.nonEmpty)
      if (isTransfer) {
        val bounced = in.exists(_.bounced)
        // bounced ⇒ failed; but uninit destination / no_gas ⇒ not failed
        val failed = (tx.aborted || bounced) &&
          !(tx.endStatus != "active" && tx.origStatus != "active") &&
          !tx.computeExitCode.exists(_ == -14)
        val encrypted = Opcodes.matches(op, Opcodes.EncryptedComment)
        val comment =
          if (encrypted) None
          else in.flatMap(_.body).flatMap { b64 =>
            try graft.functions.TlbDecoders.comment(b64)
            catch { case scala.util.control.NonFatal(_) => None }
          }
        TonTransferBlock(node, failed, comment, encrypted, children)
      } else {
        val hasValue = in.exists(_.value > 0)
        // failed call with no value attached ⇒ not failed (basic_blocks.py:88-89)
        val failed = tx.aborted && hasValue
        CallContractBlock(node, failed, children)
      }
    }
  }

  private def deployChild(node: TxNode): Seq[Block] = {
    val tx = node.tx
    // external-out leaf nodes copy the emitting tx's status row — only
    // the REAL node spawns the deploy child
    if (tx.endStatus == "active" && tx.origStatus != "active"
        && tx.origStatus != "frozen" && !tx.hash.startsWith("extout:"))
      Seq(ContractDeployBlock(node))
    else Nil
  }

  def seedTrace(roots: Seq[TxNode]): RootBlock = RootBlock(roots.map(seed))
}
