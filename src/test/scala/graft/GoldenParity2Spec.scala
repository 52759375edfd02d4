package graft

import graft.classifier._
import graft.functions.Boc

/** Field-level golden parity, part 2 — fixture traces replicating the
  * reference YAML expectation families not covered by GoldenParitySpec:
  * ton-transfers, ethena, evaa, stonfi-v2-swaps, tonco, cocoon, coffee,
  * nft, tgbtc, jvault (indexer/tests/test_cases/ YAMLs). Each test
  * asserts the SAME dot-path fields the YAML pins, per the semantics of
  * tests/utils/generic_yaml_test.py:17-120 (find the action of the
  * expected type, compare every pinned value).
  */
class GoldenParity2Spec extends SparkSpec {

  private def tx(hash: String, account: String, lt: Long): TxLite =
    TxLite(hash, account, lt, lt.toInt, "active", "active", false, None, None,
      0L, "ord")

  private def in(h: String, src: String, dst: String, op: Option[Long],
      value: Long = 100, body: Option[String] = None): MsgLite =
    MsgLite(h, "in", Option(src), Option(dst), value, op, bounce = false,
      bounced = false, Some(1L), body)

  private def out(h: String, src: String, dst: String, op: Option[Long],
      value: Long = 100, createdLt: Long = 2L, body: Option[String] = None)
      : MsgLite =
    MsgLite(h, "out", Option(src), Option(dst), value, op, bounce = false,
      bounced = false, Some(createdLt), body)

  /** TextComment body: 0x00000000 ++ utf8 text. */
  private def commentBody(text: String): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0), 32).storeBytes(text.getBytes("UTF-8")).build())

  /** Full TEP-74 jetton transfer body, optionally with a forward-payload
    * ref cell. */
  private def transferBody(qid: Long, amount: Long, dest: String,
      resp: String, fwd: Long, comment: Option[String] = None,
      forwardPayload: Option[Boc.Cell] = None): String = {
    val b = new Boc.Builder()
      .storeUint(BigInt(0x0f8a7ea5L), 32)
      .storeUint(BigInt(qid), 64)
      .storeCoins(BigInt(amount))
      .storeAddress(Some(dest))
      .storeAddress(Some(resp))
      .storeBit(false)
      .storeCoins(BigInt(fwd))
    (comment, forwardPayload) match {
      case (Some(c), _) =>
        b.storeBit(true).storeRef(new Boc.Builder()
          .storeUint(BigInt(0), 32).storeBytes(c.getBytes("UTF-8")).build())
      case (None, Some(p)) => b.storeBit(true).storeRef(p)
      case (None, None) => b.storeBit(false)
    }
    Boc.serializeBase64(b.build())
  }

  // ----------------------------------------------------------------------
  // ton-transfers.yaml
  // ----------------------------------------------------------------------

  test("ton-transfers.yaml parity ('Simple ton transfer'): endpoint " +
      "columns, value and ton_transfer_data{content:null,encrypted:false}") {
    val src = "-1:" + "00" * 32
    val dst = "-1:" + "33" * 32
    val txs = Seq(tx("T1", dst, 10))
    val msgs = Map("T1" -> Seq(
      in("m1", src, dst, None, value = 2630055735L)))
    val actions = Classifier.classify("gtt1", txs, msgs)
    val a = actions.find(_.`type` == "ton_transfer").get
    assert(a.source.contains(src))
    assert(a.destination.contains(dst))
    assert(a.value.contains(BigDecimal(2630055735L)))
    assert(a.success)
    assert(a.tx_hashes == Seq("T1"))
    val d = a.ton_transfer_data.get
    assert(d.content.isEmpty)
    assert(!d.encrypted)
  }

  test("ton-transfers.yaml parity ('Failed ton transfer (external-in " +
      "only)'): ghost transfer is failed, carries the REAL tx hash, the " +
      "ordered value/comment, and accounts exclude the unreached " +
      "destination") {
    val wallet = "0:" + "9E" * 32
    val target = "0:" + "F9" * 32
    // ordered message: int_msg_info to `target`, 17192063 nanoton, body =
    // comment '109872119' in a ref
    val inner = new Boc.Builder()
      .storeBit(false) // int_msg_info$0
      .storeBit(true)  // ihr_disabled
      .storeBit(false).storeBit(false) // bounce/bounced
      .storeAddress(None).storeAddress(Some(target))
      .storeCoins(BigInt(17192063L))
      .storeBit(false) // no extra currencies
      .storeCoins(BigInt(0)).storeCoins(BigInt(0)) // ihr_fee, fwd_fee
      .storeUint(BigInt(0), 64).storeUint(BigInt(0), 32) // lt, at
      .storeBit(false).storeBit(true) // no init, body in ref
      .storeRef(Boc.parseBase64(commentBody("109872119")))
      .build()
    val walletBody = new Boc.Builder()
      .storeUint(BigInt(0), 512) // signature
      .storeUint(BigInt(698983191L), 32) // subwallet
      .storeUint(BigInt(0xffffffffL), 32) // valid_until
      .storeUint(BigInt(7), 32) // seqno
      .storeUint(BigInt(0), 8) // send_mode
      .storeRef(inner)
      .build()
    val txs = Seq(tx("TX", wallet, 10))
    val msgs = Map("TX" -> Seq(
      in("m1", null, wallet, None).copy(
        source = None, body = Some(Boc.serializeBase64(walletBody)))))
    val actions = Classifier.classify("gtt2", txs, msgs)
    val a = actions.find(_.`type` == "ton_transfer").get
    // YAML: success=False, value, source=wallet, destination=target,
    // ton_transfer_data.content='109872119', encrypted=False
    assert(!a.success)
    assert(a.value.contains(BigDecimal(17192063L)))
    assert(a.source.contains(wallet))
    assert(a.destination.contains(target))
    val d = a.ton_transfer_data.get
    assert(d.content.contains("109872119"))
    assert(!d.encrypted)
    // tx_hashes = the REAL wallet tx hash (the ghost node wraps it)
    assert(a.tx_hashes == Seq("TX"))
    // accounts = [wallet] only — the never-reached destination is
    // excluded for ghost blocks (block_tree_serializer.py:1462-1466)
    assert(a.accounts == Seq(wallet), s"accounts: ${a.accounts}")
  }

  // ----------------------------------------------------------------------
  // ethena.yaml
  // ----------------------------------------------------------------------

  private val ethUser = "0:" + "C2" * 32
  private val ethUserUsdeWallet = "0:" + "B2" * 32
  private val ethPool = "0:" + "A1" * 32
  private val ethPoolUsdeWallet = "0:" + "FC" * 32
  private val ethTsUsdeMaster = "0:" + "D0" * 32
  private val ethUserTsWallet = "0:" + "B8" * 32
  private val ethUsdeMaster = "0:" + "08" * 32

  test("ethena.yaml parity ('Deposit'): stake_deposit with asset=tsUSDe " +
      "master, asset2=USDe master, wallet secondaries, amount and " +
      "staking_data.tokens_minted") {
    val xfer = transferBody(7, 2500300127L, ethPool, ethUser, 1)
    val mintCall = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JettonMint), 32)
      .storeUint(BigInt(7), 64)
      .storeAddress(Some(ethUser))
      .storeCoins(BigInt(100000000L))
      .build())
    val mintXfer = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JettonInternalTransfer), 32)
      .storeUint(BigInt(7), 64)
      .storeCoins(BigInt(1994155249L))
      .storeAddress(None).storeAddress(None)
      .storeCoins(BigInt(0)).build())
    val txs = Seq(tx("T1", ethUserUsdeWallet, 10),
      tx("T2", ethPoolUsdeWallet, 20), tx("T3", ethPool, 30),
      tx("T4", ethTsUsdeMaster, 40), tx("T5", ethUserTsWallet, 50))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", ethUser, ethUserUsdeWallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer)),
        out("m2", ethUserUsdeWallet, ethPoolUsdeWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", ethUserUsdeWallet, ethPoolUsdeWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", ethPoolUsdeWallet, ethPool, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", ethPoolUsdeWallet, ethPool, Some(Opcodes.JettonNotify)),
        out("m4", ethPool, ethTsUsdeMaster, Some(Opcodes.JettonMint),
          body = Some(mintCall))),
      "T4" -> Seq(
        in("m4", ethPool, ethTsUsdeMaster, Some(Opcodes.JettonMint),
          body = Some(mintCall)),
        out("m5", ethTsUsdeMaster, ethUserTsWallet,
          Some(Opcodes.JettonInternalTransfer), body = Some(mintXfer))),
      "T5" -> Seq(in("m5", ethTsUsdeMaster, ethUserTsWallet,
        Some(Opcodes.JettonInternalTransfer), body = Some(mintXfer))))
    val actions = Classifier.classify("geth1", txs, msgs,
      interfaces = Map(ethUserTsWallet -> "ethena_tsusde_wallet"),
      // the pool's USDe wallet row must exist or the transfer matcher
      // refuses the leg (jettons.py:70-74)
      jettonWallets = Map(ethUserUsdeWallet -> ethUsdeMaster,
        ethPoolUsdeWallet -> ethUsdeMaster,
        ethUserTsWallet -> ethTsUsdeMaster))
    val a = actions.find(_.`type` == "stake_deposit").get
    // YAML: source/source_secondary/destination/amount/asset/asset2
    assert(a.source.contains(ethUser))
    assert(a.source_secondary.contains(ethUserUsdeWallet))
    assert(a.destination.contains(ethPool))
    assert(a.amount.contains(BigDecimal(2500300127L)))
    assert(a.asset.contains(ethTsUsdeMaster))
    assert(a.asset2.contains(ethUsdeMaster))
    assert(a.success)
    val sd = a.staking_data.get
    assert(sd.provider.contains("ethena"))
    assert(sd.tokens_minted.contains(BigDecimal(1994155249L)))
    // YAML accounts list (6): exactly the involved set
    assert(a.accounts.toSet == Set(ethUserTsWallet, ethPoolUsdeWallet,
      ethTsUsdeMaster, ethUser, ethPool, ethUserUsdeWallet),
      s"accounts: ${a.accounts}")
  }

  test("ethena.yaml parity ('Unstake request'): stake_withdrawal_request " +
      "with destination=pool, asset=tsUSDe master, amount and the " +
      "timelocked tokens_minted") {
    val user = "0:" + "28" * 32
    val wallet = "0:" + "29" * 32 // user's tsUSDe wallet (source AND receiver)
    val xfer = transferBody(9, 199179780L, ethPool, user, 1)
    val tsBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.EthenaTsUsdeTransfer), 32)
      .storeUint(BigInt(9), 64)
      .storeCoins(BigInt(250729913L))
      .storeAddress(None).storeAddress(None)
      .storeCoins(BigInt(0)).build())
    val txs = Seq(tx("T1", wallet, 10), tx("T2", ethTsUsdeMaster, 20),
      tx("T3", ethPool, 30), tx("T4", ethTsUsdeMaster, 40),
      tx("T5", wallet, 50))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, wallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer)),
        out("m2", wallet, ethTsUsdeMaster,
          Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", wallet, ethTsUsdeMaster,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", ethTsUsdeMaster, ethPool, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", ethTsUsdeMaster, ethPool, Some(Opcodes.JettonNotify)),
        out("m4", ethPool, ethTsUsdeMaster, Some(Opcodes.JettonMint))),
      "T4" -> Seq(
        in("m4", ethPool, ethTsUsdeMaster, Some(Opcodes.JettonMint)),
        out("m5", ethTsUsdeMaster, wallet,
          Some(Opcodes.EthenaTsUsdeTransfer), body = Some(tsBody))),
      "T5" -> Seq(in("m5", ethTsUsdeMaster, wallet,
        Some(Opcodes.EthenaTsUsdeTransfer), body = Some(tsBody))))
    val actions = Classifier.classify("geth2", txs, msgs,
      jettonWallets = Map(wallet -> ethTsUsdeMaster))
    val a = actions.find(_.`type` == "stake_withdrawal_request").get
    // YAML: source/source_secondary/destination=pool/amount/asset +
    // staking_data{provider, tokens_minted}
    assert(a.source.contains(user))
    assert(a.source_secondary.contains(wallet))
    assert(a.destination.contains(ethPool))
    assert(a.amount.contains(BigDecimal(199179780L)))
    assert(a.asset.contains(ethTsUsdeMaster))
    val sd = a.staking_data.get
    assert(sd.provider.contains("ethena"))
    assert(sd.tokens_minted.contains(BigDecimal(250729913L)))
    // YAML accounts (4): pool, user, master, user wallet
    assert(a.accounts.toSet == Set(ethPool, user, ethTsUsdeMaster, wallet),
      s"accounts: ${a.accounts}")
  }

  // ----------------------------------------------------------------------
  // evaa.yaml
  // ----------------------------------------------------------------------

  private val evaaMaster = "0:" + "BC" * 32
  private val evaaTonId = graft.classifier.Opcodes.EvaaTonAssetId
  private val evaaJettonId =
    BigInt("ca9006bd3fb03d355daeeff93b24be90afaa6e3ca0073ff5720f8a852c933278", 16)

  private def evaaSupplyMasterBody(amount: Long, recipient: String): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(1), 32).storeUint(BigInt(5), 64)
      .storeInt(BigInt(-1), 2) // include_user_code
      .storeUint(BigInt(amount), 64)
      .storeAddress(Some(recipient)).build())

  private def evaaUserBody(op: Long, assetId: BigInt, amount: Long,
      recipient: Option[String] = None): String = {
    val b = new Boc.Builder()
      .storeUint(BigInt(op), 32).storeUint(BigInt(5), 64)
      .storeUint(assetId, 256).storeUint(BigInt(amount), 64)
    recipient.foreach { r =>
      b.storeUint(BigInt(0), 64).storeUint(BigInt(0), 64) // s_rate, b_rate
      b.storeAddress(Some(r))
    }
    Boc.serializeBase64(b.build())
  }

  private def evaaSuccessBody(owner: String, assetId: BigInt,
      amount: Long): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x11a), 32).storeUint(BigInt(5), 64)
      .storeAddress(Some(owner))
      .storeUint(assetId, 256).storeUint(BigInt(amount), 64).build())

  private def evaaWithdrawMasterBody(assetId: BigInt, amount: BigInt,
      recipient: String): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(2), 32).storeUint(BigInt(5), 64)
      .storeUint(assetId, 256).storeUint(amount, 64)
      .storeAddress(Some(recipient)).build())

  private def evaaCollateralizedBody(owner: String, assetId: BigInt,
      amount: Long): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x211), 32).storeUint(BigInt(5), 64)
      .storeAddress(Some(owner))
      .storeUint(assetId, 256).storeUint(BigInt(amount), 64).build())

  test("evaa.yaml parity ('Ton supply'): source=destination=user, " +
      "user-contract secondary, amount and evaa_supply_data.master") {
    val user = "0:" + "8F" * 32
    val uc = "0:" + "B9" * 32
    val txs = Seq(tx("T1", evaaMaster, 10), tx("T2", uc, 20),
      tx("T3", evaaMaster, 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, evaaMaster, Some(1L),
          body = Some(evaaSupplyMasterBody(1000000000L, user))),
        out("m2", evaaMaster, uc, Some(0x11L),
          body = Some(evaaUserBody(0x11L, evaaTonId, 1000000000L)))),
      "T2" -> Seq(
        in("m2", evaaMaster, uc, Some(0x11L),
          body = Some(evaaUserBody(0x11L, evaaTonId, 1000000000L))),
        out("m3", uc, evaaMaster, Some(0x11aL),
          body = Some(evaaSuccessBody(user, evaaTonId, 1000000000L)))),
      "T3" -> Seq(in("m3", uc, evaaMaster, Some(0x11aL),
        body = Some(evaaSuccessBody(user, evaaTonId, 1000000000L)))))
    val a = Classifier.classify("gev1", txs, msgs)
      .find(_.`type` == "evaa_supply").get
    assert(a.source.contains(user))
    assert(a.destination.contains(user))
    assert(a.destination_secondary.contains(uc))
    assert(a.amount.contains(BigDecimal(1000000000L)))
    assert(a.success)
    val d = a.evaa_supply_data.get
    assert(d.master.contains(evaaMaster))
    assert(d.is_ton.contains(true))
  }

  test("evaa.yaml parity ('Jetton supply'): wallet secondaries, asset " +
      "from the repository and the recipient/master jetton wallets") {
    val user = "0:" + "99" * 32
    val userWallet = "0:" + "1C" * 32
    val masterWallet = "0:" + "91" * 32
    val uc = "0:" + "86" * 32
    val usdtMaster = "0:" + "BD" * 32
    val fwd = Boc.parseBase64(Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(1), 32).storeInt(BigInt(-1), 2)
      .storeAddress(Some(user)).build()))
    val xfer = transferBody(5, 47133134852L, evaaMaster, user, 1,
      forwardPayload = Some(fwd))
    val userCall = evaaUserBody(0x11L, evaaJettonId, 47133134852L)
    val success = evaaSuccessBody(user, evaaJettonId, 47133134852L)
    val txs = Seq(tx("T1", userWallet, 10), tx("T2", masterWallet, 20),
      tx("T3", evaaMaster, 30), tx("T4", uc, 40), tx("T5", evaaMaster, 50))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, userWallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer)),
        out("m2", userWallet, masterWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", userWallet, masterWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", masterWallet, evaaMaster, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", masterWallet, evaaMaster, Some(Opcodes.JettonNotify)),
        out("m4", evaaMaster, uc, Some(0x11L), body = Some(userCall))),
      "T4" -> Seq(
        in("m4", evaaMaster, uc, Some(0x11L), body = Some(userCall)),
        out("m5", uc, evaaMaster, Some(0x11aL), body = Some(success))),
      "T5" -> Seq(in("m5", uc, evaaMaster, Some(0x11aL),
        body = Some(success))))
    val a = Classifier.classify("gev2", txs, msgs,
      jettonWallets = Map(userWallet -> usdtMaster,
        masterWallet -> usdtMaster))
      .find(_.`type` == "evaa_supply").get
    assert(a.source.contains(user))
    assert(a.source_secondary.contains(userWallet))
    assert(a.destination.contains(user))
    assert(a.destination_secondary.contains(uc))
    assert(a.asset.contains(usdtMaster))
    assert(a.amount.contains(BigDecimal(47133134852L)))
    val d = a.evaa_supply_data.get
    assert(d.master.contains(evaaMaster))
    assert(d.master_jetton_wallet.contains(masterWallet))
    assert(d.recipient_jetton_wallet.contains(userWallet))
    assert(d.is_ton.contains(false))
  }

  test("evaa.yaml parity ('Withdraw tsTon'): successful jetton withdraw " +
      "with payout-derived wallets, repository asset and exact accounts") {
    val user = "0:" + "B9" * 32
    val uc = "0:" + "A3" * 32
    val masterWallet = "0:" + "91" * 32
    val recipWallet = "0:" + "FC" * 32
    val tsTonMaster = "0:" + "BD" * 32
    val wm = evaaWithdrawMasterBody(evaaJettonId, BigInt(1000000040L), user)
    val userCall = evaaUserBody(0x21L, evaaJettonId, 1000000040L, Some(user))
    val coll = evaaCollateralizedBody(user, evaaJettonId, 1000000040L)
    val payout = transferBody(5, 1000000040L, user, user, 1)
    val txs = Seq(tx("T1", evaaMaster, 10), tx("T2", uc, 20),
      tx("T3", evaaMaster, 30), tx("T4", masterWallet, 40),
      tx("T5", recipWallet, 50), tx("T6", uc, 60))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, evaaMaster, Some(2L), body = Some(wm)),
        out("m2", evaaMaster, uc, Some(0x21L), body = Some(userCall))),
      "T2" -> Seq(
        in("m2", evaaMaster, uc, Some(0x21L), body = Some(userCall)),
        out("m3", uc, evaaMaster, Some(0x211L), body = Some(coll))),
      "T3" -> Seq(
        in("m3", uc, evaaMaster, Some(0x211L), body = Some(coll)),
        out("m4", evaaMaster, masterWallet, Some(Opcodes.JettonTransfer),
          body = Some(payout), createdLt = 31),
        out("m5", evaaMaster, uc, Some(0x211aL), createdLt = 32)),
      "T4" -> Seq(
        in("m4", evaaMaster, masterWallet, Some(Opcodes.JettonTransfer),
          body = Some(payout)),
        out("m6", masterWallet, recipWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T5" -> Seq(in("m6", masterWallet, recipWallet,
        Some(Opcodes.JettonInternalTransfer))),
      "T6" -> Seq(in("m5", evaaMaster, uc, Some(0x211aL))))
    val a = Classifier.classify("gev3", txs, msgs,
      jettonWallets = Map(masterWallet -> tsTonMaster,
        recipWallet -> tsTonMaster))
      .find(_.`type` == "evaa_withdraw").get
    assert(a.success)
    assert(a.amount.contains(BigDecimal(1000000040L)))
    assert(a.source.contains(user))
    assert(a.destination.contains(user))
    assert(a.destination_secondary.contains(uc))
    assert(a.asset.contains(tsTonMaster))
    val d = a.evaa_withdraw_data.get
    assert(d.master.contains(evaaMaster))
    assert(d.recipient_jetton_wallet.contains(recipWallet))
    assert(d.master_jetton_wallet.contains(masterWallet))
    // YAML accounts (5)
    assert(a.accounts.toSet ==
      Set(masterWallet, user, uc, recipWallet, evaaMaster),
      s"accounts: ${a.accounts}")
  }

  test("evaa.yaml parity ('Ton withdrawal (no funds)'): failed withdraw " +
      "with fail_reason=withdraw_no_funds_excess, is_ton and asset_id") {
    val user = "0:" + "FD" * 32
    val uc = "0:" + "39" * 32
    val wm = evaaWithdrawMasterBody(evaaTonId, BigInt(1628764327L), user)
    val txs = Seq(tx("T1", evaaMaster, 10), tx("T2", uc, 20),
      tx("T3", evaaMaster, 30), tx("T4", uc, 40), tx("T5", user, 50))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, evaaMaster, Some(2L), body = Some(wm)),
        out("m2", evaaMaster, uc, Some(0x21L))),
      "T2" -> Seq(
        in("m2", evaaMaster, uc, Some(0x21L)),
        out("m3", uc, evaaMaster, Some(0x211L))),
      "T3" -> Seq(
        in("m3", uc, evaaMaster, Some(0x211L)),
        out("m4", evaaMaster, uc, Some(0x211fL))),
      "T4" -> Seq(
        in("m4", evaaMaster, uc, Some(0x211fL)),
        out("m5", uc, user, Some(0x211fe8L))),
      "T5" -> Seq(in("m5", uc, user, Some(0x211fe8L))))
    val a = Classifier.classify("gev4", txs, msgs)
      .find(_.`type` == "evaa_withdraw").get
    assert(!a.success)
    assert(a.source.contains(user))
    assert(a.destination.contains(user))
    assert(a.destination_secondary.contains(uc))
    assert(a.amount.contains(BigDecimal(1628764327L)))
    val d = a.evaa_withdraw_data.get
    assert(d.fail_reason.contains("withdraw_no_funds_excess"))
    assert(d.master.contains(evaaMaster))
    assert(d.asset_id.contains("0x" + evaaTonId.toString(16)))
    assert(d.is_ton.contains(true))
    assert(d.recipient_jetton_wallet.isEmpty)
    assert(d.master_jetton_wallet.isEmpty)
  }

  test("evaa.yaml parity ('Jetton withdrawal (locked)'): user-contract " +
      "fail excess maps to withdraw_locked_excess with null asset") {
    val user = "0:" + "4F" * 32
    val uc = "0:" + "31" * 32
    val wm = evaaWithdrawMasterBody(evaaJettonId, BigInt(3736185L), user)
    val txs = Seq(tx("T1", evaaMaster, 10), tx("T2", uc, 20),
      tx("T3", user, 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, evaaMaster, Some(2L), body = Some(wm)),
        out("m2", evaaMaster, uc, Some(0x21L))),
      "T2" -> Seq(
        in("m2", evaaMaster, uc, Some(0x21L)),
        out("m3", uc, user, Some(0x21e6L))),
      "T3" -> Seq(in("m3", uc, user, Some(0x21e6L))))
    val a = Classifier.classify("gev5", txs, msgs)
      .find(_.`type` == "evaa_withdraw").get
    assert(!a.success)
    assert(a.amount.contains(BigDecimal(3736185L)))
    assert(a.asset.isEmpty)
    assert(a.destination_secondary.contains(uc))
    val d = a.evaa_withdraw_data.get
    assert(d.fail_reason.contains("withdraw_locked_excess"))
    assert(d.is_ton.contains(false))
    assert(d.asset_id.contains("0x" + evaaJettonId.toString(16)))
    assert(d.master.contains(evaaMaster))
  }

  // ----------------------------------------------------------------------
  // stonfi-v2-swaps.yaml
  // ----------------------------------------------------------------------

  /** pay_to#657b54f5 body (messages/swaps.py:64-78). */
  private def payToBody(exit: Long, amount0: Long, token0: String,
      amount1: Long, token1: String): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x657b54f5L), 32)
      .storeUint(BigInt(1), 64)
      .storeAddress(Some("0:" + "01" * 32))
      .storeAddress(Some("0:" + "02" * 32))
      .storeAddress(Some("0:" + "03" * 32))
      .storeUint(BigInt(exit), 32)
      .storeBit(false)
      .storeRef(new Boc.Builder()
        .storeCoins(BigInt(0))
        .storeCoins(BigInt(amount0)).storeAddress(Some(token0))
        .storeCoins(BigInt(amount1)).storeAddress(Some(token1))
        .build())
      .build())

  private val v2Ok = graft.functions.TlbDecoders.StonfiV2SwapOkCode

  test("stonfi-v2-swaps.yaml parity ('Jetton -> Jetton'): full swap with " +
      "asset/asset2 columns, wallet secondaries, both dex transfers and " +
      "empty peer_swaps") {
    val user = "0:" + "A9" * 32
    val userInWallet = "0:" + "31" * 32
    val router = "0:" + "70" * 32
    val routerInWallet = "0:" + "B9" * 32
    val pool = "0:" + "94" * 32
    val routerOutWallet = "0:" + "92" * 32
    val userOutWallet = "0:" + "06" * 32
    val assetIn = "0:" + "CE" * 32
    val assetOut = "0:" + "C9" * 32
    val inXfer = transferBody(1, 100000000L, router, user, 1)
    val outXfer = transferBody(1, 167438006L, user, router, 1)
    val payTo = payToBody(v2Ok, 167438006L, routerOutWallet, 0, routerOutWallet)
    val txs = Seq(tx("T1", userInWallet, 10), tx("T2", routerInWallet, 20),
      tx("T3", router, 30), tx("T4", pool, 40), tx("T5", router, 50),
      tx("T6", routerOutWallet, 60), tx("T7", userOutWallet, 70))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, userInWallet, Some(Opcodes.JettonTransfer),
          body = Some(inXfer)),
        out("m2", userInWallet, routerInWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", userInWallet, routerInWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", routerInWallet, router, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", routerInWallet, router, Some(Opcodes.JettonNotify)),
        out("m4", router, pool, Some(Opcodes.StonfiV2Swap))),
      "T4" -> Seq(
        in("m4", router, pool, Some(Opcodes.StonfiV2Swap)),
        out("m5", pool, router, Some(Opcodes.StonfiV2PayTo),
          body = Some(payTo))),
      "T5" -> Seq(
        in("m5", pool, router, Some(Opcodes.StonfiV2PayTo),
          body = Some(payTo)),
        out("m6", router, routerOutWallet, Some(Opcodes.JettonTransfer),
          body = Some(outXfer))),
      "T6" -> Seq(
        in("m6", router, routerOutWallet, Some(Opcodes.JettonTransfer),
          body = Some(outXfer)),
        out("m7", routerOutWallet, userOutWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T7" -> Seq(in("m7", routerOutWallet, userOutWallet,
        Some(Opcodes.JettonInternalTransfer))))
    val a = Classifier.classify("gsv1", txs, msgs,
      jettonWallets = Map(userInWallet -> assetIn,
        routerInWallet -> assetIn, routerOutWallet -> assetOut,
        userOutWallet -> assetOut))
      .find(_.`type` == "jetton_swap").get
    assert(a.success)
    assert(a.asset.contains(assetIn))
    assert(a.asset2.contains(assetOut))
    assert(a.source.contains(user))
    assert(a.source_secondary.contains(userInWallet))
    assert(a.destination.contains(user))
    assert(a.destination_secondary.contains(userOutWallet))
    val sd = a.jetton_swap_data.get
    assert(sd.dex == "stonfi_v2")
    assert(sd.sender.contains(user))
    val inc = sd.dex_incoming_transfer.get
    assert(inc.amount.contains(BigDecimal(100000000L)))
    assert(inc.source.contains(user))
    assert(inc.source_jetton_wallet.contains(userInWallet))
    assert(inc.destination.contains(router))
    assert(inc.destination_jetton_wallet.contains(routerInWallet))
    assert(inc.asset.contains(assetIn))
    val outT = sd.dex_outgoing_transfer.get
    assert(outT.amount.contains(BigDecimal(167438006L)))
    assert(outT.source.contains(router))
    assert(outT.source_jetton_wallet.contains(routerOutWallet))
    assert(outT.destination.contains(user))
    assert(outT.destination_jetton_wallet.contains(userOutWallet))
    assert(outT.asset.contains(assetOut))
    assert(sd.peer_swaps.isEmpty)
    // YAML accounts (7): all involved wallets + router + pool + user
    assert(a.accounts.toSet == Set(pool, routerOutWallet, routerInWallet,
      userInWallet, router, userOutWallet, user),
      s"accounts: ${a.accounts}")
  }

  test("stonfi-v2-swaps.yaml parity ('multirouter'): two-hop route " +
      "chains peer_swaps from the in-transfer and keeps deposit-fee " +
      "calls as separate call_contract actions") {
    val user = "0:" + "1F" * 32
    val userInWallet = "0:" + "A0" * 32
    val router = "0:" + "62" * 32
    val routerInWallet = "0:" + "0D" * 32
    val pool1 = "0:" + "5B" * 32
    val pool2 = "0:" + "F1" * 32
    val routerOutWallet = "0:" + "CB" * 32
    val userOutWallet = "0:" + "ED" * 32
    val hopWalletB = "0:" + "B1" * 32
    val assetA = "0:" + "36" * 32
    val assetB = "0:" + "BB" * 32
    val assetC = "0:" + "AE" * 32
    val feeVault = "0:" + "F4" * 32
    val inXfer = transferBody(1, 7205784725L, router, user, 1)
    val outXfer = transferBody(1, 33957063173L, user, router, 1)
    val payTo1 = payToBody(v2Ok, 37841924L, hopWalletB, 0, hopWalletB)
    val payTo2 = payToBody(v2Ok, 33957063173L, routerOutWallet, 0,
      routerOutWallet)
    val txs = Seq(tx("T1", userInWallet, 10), tx("T2", routerInWallet, 20),
      tx("T3", router, 30), tx("T4", pool1, 40), tx("T5", router, 50),
      tx("T6", pool2, 60), tx("T7", router, 70),
      tx("T8", routerOutWallet, 80), tx("T9", userOutWallet, 90),
      tx("TF", feeVault, 95))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, userInWallet, Some(Opcodes.JettonTransfer),
          body = Some(inXfer)),
        out("m2", userInWallet, routerInWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", userInWallet, routerInWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", routerInWallet, router, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", routerInWallet, router, Some(Opcodes.JettonNotify)),
        out("m4", router, pool1, Some(Opcodes.StonfiV2Swap))),
      "T4" -> Seq(
        in("m4", router, pool1, Some(Opcodes.StonfiV2Swap)),
        out("m5", pool1, router, Some(Opcodes.StonfiV2PayTo),
          body = Some(payTo1))),
      "T5" -> Seq(
        in("m5", pool1, router, Some(Opcodes.StonfiV2PayTo),
          body = Some(payTo1)),
        out("m6", router, pool2, Some(Opcodes.StonfiV2Swap))),
      "T6" -> Seq(
        in("m6", router, pool2, Some(Opcodes.StonfiV2Swap)),
        out("m7", pool2, router, Some(Opcodes.StonfiV2PayTo),
          body = Some(payTo2))),
      "T7" -> Seq(
        in("m7", pool2, router, Some(Opcodes.StonfiV2PayTo),
          body = Some(payTo2)),
        out("m8", router, routerOutWallet, Some(Opcodes.JettonTransfer),
          body = Some(outXfer), createdLt = 71),
        out("mf", router, feeVault, Some(Opcodes.StonfiV2DepositRefFee),
          createdLt = 72)),
      "T8" -> Seq(
        in("m8", router, routerOutWallet, Some(Opcodes.JettonTransfer),
          body = Some(outXfer)),
        out("m9", routerOutWallet, userOutWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T9" -> Seq(in("m9", routerOutWallet, userOutWallet,
        Some(Opcodes.JettonInternalTransfer))),
      "TF" -> Seq(in("mf", router, feeVault,
        Some(Opcodes.StonfiV2DepositRefFee))))
    val actions = Classifier.classify("gsv2", txs, msgs,
      jettonWallets = Map(userInWallet -> assetA, hopWalletB -> assetB,
        routerInWallet -> assetA, routerOutWallet -> assetC,
        userOutWallet -> assetC))
    val a = actions.find(_.`type` == "jetton_swap").get
    assert(a.asset.contains(assetA))
    assert(a.asset2.contains(assetC))
    assert(a.source.contains(user))
    assert(a.destination.contains(user))
    assert(a.source_secondary.contains(userInWallet))
    assert(a.destination_secondary.contains(userOutWallet))
    val sd = a.jetton_swap_data.get
    assert(sd.dex == "stonfi_v2")
    // peer_swaps[0]: in = the in-transfer itself (amount + asset)
    val ps = sd.peer_swaps
    assert(ps.size == 2, s"peer_swaps: $ps")
    assert(ps(0).amount_in.contains(BigDecimal(7205784725L)))
    assert(ps(0).asset_in.contains(assetA))
    assert(ps(0).amount_out.contains(BigDecimal(37841924L)))
    assert(ps(0).asset_out.contains(assetB))
    assert(ps(1).amount_in.contains(BigDecimal(37841924L)))
    assert(ps(1).asset_in.contains(assetB))
    assert(ps(1).amount_out.contains(BigDecimal(33957063173L)))
    assert(ps(1).asset_out.contains(assetC))
    // the deposit-fee call survives as its own call_contract action
    // (the YAML's 'Deposit fee' expected-actions)
    val fee = actions.find(x => x.`type` == "call_contract" &&
      x.destination.contains(feeVault))
    assert(fee.isDefined, s"got ${actions.map(_.`type`)}")
    assert(fee.get.source.contains(router))
  }

  // ----------------------------------------------------------------------
  // tonco.yaml
  // ----------------------------------------------------------------------

  test("tonco.yaml parity ('Tonco deploy pools'): endpoint columns and " +
      "every tonco_deploy_pool_data field from the create-pool body") {
    val deployer = "0:" + "91" * 32
    val router = "0:" + "BF" * 32
    val pool = "0:" + "F6" * 32
    val w0 = "0:" + "87" * 32
    val w1 = "0:" + "AC" * 32
    val m0 = "0:" + "94" * 32
    val m1 = "0:" + "B1" * 32
    val price = BigInt("5919263403564396162379850192")
    val createBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x2e3034efL), 32)
      .storeUint(BigInt(1), 64)
      .storeAddress(Some(w0)).storeAddress(Some(w1))
      .storeInt(BigInt(60), 24)
      .storeUint(price, 160)
      .storeUint(BigInt(33268), 16)
      .storeUint(BigInt(15), 16)
      .storeUint(BigInt(15), 16)
      .storeRef(new Boc.Builder().storeUint(BigInt(0), 8).build())
      .storeRef(new Boc.Builder().storeUint(BigInt(0), 8).build())
      .storeRef(new Boc.Builder()
        .storeAddress(Some(m0)).storeAddress(Some(m1))
        .storeAddress(None).build())
      .build())
    val txs = Seq(tx("T1", router, 10), tx("T2", pool, 20))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", deployer, router,
          Some(Opcodes.ToncoRouterV3CreatePool), body = Some(createBody)),
        out("m2", router, pool, Some(Opcodes.ToncoPoolV3Init))),
      "T2" -> Seq(in("m2", router, pool, Some(Opcodes.ToncoPoolV3Init))))
    val a = Classifier.classify("gtc1", txs, msgs)
      .find(_.`type` == "tonco_deploy_pool").get
    assert(a.source.contains(deployer))
    assert(a.destination.contains(router))
    assert(a.destination_secondary.contains(pool))
    assert(a.success)
    val d = a.tonco_deploy_pool_data.get
    assert(d.jetton0_router_wallet.contains(w0))
    assert(d.jetton1_router_wallet.contains(w1))
    assert(d.jetton0_minter.contains(m0))
    assert(d.jetton1_minter.contains(m1))
    assert(d.tick_spacing.contains(60))
    assert(d.initial_price_x96.contains(BigDecimal(price)))
    assert(d.protocol_fee.contains(33268))
    assert(d.lp_fee_base.contains(15))
  }

  /** ROUTERV3_PAY_TO body with coinsinfo (messages/swaps.py:307-360). */
  private def toncoPayToBody(exit: Long, amount0: Long, jetton0: String)
      : String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xa1daa96dL), 32)
      .storeUint(BigInt(1), 64)
      .storeAddress(Some("0:" + "01" * 32))
      .storeAddress(None)
      .storeUint(BigInt(exit), 32)
      .storeUint(BigInt(7), 64)
      .storeBit(true)
      .storeRef(new Boc.Builder()
        .storeCoins(BigInt(amount0)).storeAddress(Some(jetton0))
        .storeCoins(BigInt(0)).storeAddress(None)
        .build())
      .build())

  test("tonco.yaml parity ('swap with hop' shape): dex=tonco swap with " +
      "chained peer_swaps, dex transfer wallets and min_out") {
    val user = "0:" + "E3" * 32
    val userInWallet = "0:" + "66" * 32
    val router = "0:" + "BF" * 32
    val routerInWallet = "0:" + "AC" * 32
    val pool1 = "0:" + "11" * 32
    val pool2 = "0:" + "22" * 32
    val hopWallet = "0:" + "33" * 32
    val routerOutWallet = "0:" + "3E" * 32
    val userOutWallet = "0:" + "AB" * 32
    val assetIn = "0:" + "B1" * 32
    val assetB = "0:" + "44" * 32
    val assetOut = "0:" + "6C" * 32
    val inXfer = transferBody(1, 10000000L, router, user, 1)
    val midXfer = transferBody(1, 2907640091L, router, router, 1)
    val outXfer = transferBody(1, 541070180798L, user, router, 1)
    val payTo1 = toncoPayToBody(200, 2907640091L, hopWallet)
    val payTo2 = toncoPayToBody(200, 541070180798L, routerOutWallet)
    val txs = Seq(tx("T1", userInWallet, 10), tx("T2", routerInWallet, 20),
      tx("T3", router, 30), tx("T4", pool1, 40), tx("T5", router, 50),
      tx("T6", hopWallet, 60), tx("T7", router, 70), tx("T8", pool2, 80),
      tx("T9", router, 90), tx("T10", routerOutWallet, 100),
      tx("T11", userOutWallet, 110))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, userInWallet, Some(Opcodes.JettonTransfer),
          body = Some(inXfer)),
        out("m2", userInWallet, routerInWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", userInWallet, routerInWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", routerInWallet, router, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", routerInWallet, router, Some(Opcodes.JettonNotify)),
        out("m4", router, pool1, Some(Opcodes.ToncoPoolV3Swap))),
      "T4" -> Seq(
        in("m4", router, pool1, Some(Opcodes.ToncoPoolV3Swap)),
        out("m5", pool1, router, Some(Opcodes.ToncoRouterV3PayTo),
          body = Some(payTo1))),
      "T5" -> Seq(
        in("m5", pool1, router, Some(Opcodes.ToncoRouterV3PayTo),
          body = Some(payTo1)),
        out("m6", router, hopWallet, Some(Opcodes.JettonTransfer),
          body = Some(midXfer))),
      "T6" -> Seq(
        in("m6", router, hopWallet, Some(Opcodes.JettonTransfer),
          body = Some(midXfer)),
        out("m7", hopWallet, router, Some(Opcodes.JettonNotify))),
      "T7" -> Seq(
        in("m7", hopWallet, router, Some(Opcodes.JettonNotify)),
        out("m8", router, pool2, Some(Opcodes.ToncoPoolV3Swap))),
      "T8" -> Seq(
        in("m8", router, pool2, Some(Opcodes.ToncoPoolV3Swap)),
        out("m9", pool2, router, Some(Opcodes.ToncoRouterV3PayTo),
          body = Some(payTo2))),
      "T9" -> Seq(
        in("m9", pool2, router, Some(Opcodes.ToncoRouterV3PayTo),
          body = Some(payTo2)),
        out("m10", router, routerOutWallet, Some(Opcodes.JettonTransfer),
          body = Some(outXfer))),
      "T10" -> Seq(
        in("m10", router, routerOutWallet, Some(Opcodes.JettonTransfer),
          body = Some(outXfer)),
        out("m11", routerOutWallet, userOutWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T11" -> Seq(in("m11", routerOutWallet, userOutWallet,
        Some(Opcodes.JettonInternalTransfer))))
    val a = Classifier.classify("gtc2", txs, msgs,
      jettonWallets = Map(userInWallet -> assetIn, hopWallet -> assetB,
        routerInWallet -> assetIn, routerOutWallet -> assetOut,
        userOutWallet -> assetOut))
      .find(_.`type` == "jetton_swap").get
    assert(a.success)
    val sd = a.jetton_swap_data.get
    assert(sd.dex == "tonco")
    assert(sd.sender.contains(user))
    val inc = sd.dex_incoming_transfer.get
    assert(inc.asset.contains(assetIn))
    assert(inc.amount.contains(BigDecimal(10000000L)))
    assert(inc.source.contains(user))
    assert(inc.source_jetton_wallet.contains(userInWallet))
    assert(inc.destination.contains(router))
    assert(inc.destination_jetton_wallet.contains(routerInWallet))
    val outT = sd.dex_outgoing_transfer.get
    assert(outT.asset.contains(assetOut))
    assert(outT.amount.contains(BigDecimal(541070180798L)))
    assert(outT.source.contains(router))
    assert(outT.source_jetton_wallet.contains(routerOutWallet))
    assert(outT.destination.contains(user))
    assert(outT.destination_jetton_wallet.contains(userOutWallet))
    // min_out_amount = the successful out amount (swaps.py:1155)
    assert(sd.min_out_amount.contains(BigDecimal(541070180798L)))
    val ps = sd.peer_swaps
    assert(ps.size == 2, s"peer_swaps: $ps")
    assert(ps(0).amount_in.contains(BigDecimal(10000000L)))
    assert(ps(0).asset_in.contains(assetIn))
    assert(ps(0).amount_out.contains(BigDecimal(2907640091L)))
    assert(ps(0).asset_out.contains(assetB))
    assert(ps(1).amount_in.contains(BigDecimal(2907640091L)))
    assert(ps(1).asset_in.contains(assetB))
    assert(ps(1).amount_out.contains(BigDecimal(541070180798L)))
    assert(ps(1).asset_out.contains(assetOut))
  }

  // ----------------------------------------------------------------------
  // cocoon.yaml
  // ----------------------------------------------------------------------

  test("cocoon.yaml parity ('Cocoon Worker Payout'): proxy->owner " +
      "endpoints, worker secondary, payout amount and every " +
      "cocoon_worker_payout_data field") {
    val proxy = "0:" + "B1" * 32
    val worker = "0:" + "31" * 32
    val owner = "0:" + "E5" * 32
    val payload = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xa040ad28L), 32)
      .storeUint(BigInt("10553886210694500674"), 64)
      .storeUint(BigInt("9229614747703451079"), 64)
      .storeAddress(Some(worker)).build())
    val request = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x4d725d2cL), 32)
      .storeUint(BigInt("10553886210694500674"), 64)
      .storeAddress(Some(owner))
      .storeUint(BigInt(0), 2)
      .storeUint(BigInt(73063940556L), 64)
      .storeBit(false).build())
    val txs = Seq(tx("T1", worker, 10), tx("T2", proxy, 20),
      tx("T3", owner, 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", proxy, worker, Some(Opcodes.CocoonPayoutPayload),
          body = Some(payload)),
        out("m2", worker, proxy, Some(Opcodes.CocoonWorkerProxyRequest),
          body = Some(request))),
      "T2" -> Seq(
        in("m2", worker, proxy, Some(Opcodes.CocoonWorkerProxyRequest),
          body = Some(request)),
        out("m3", proxy, owner, Some(Opcodes.CocoonPayout),
          value = 4500148290L)),
      "T3" -> Seq(in("m3", proxy, owner, Some(Opcodes.CocoonPayout),
        value = 4500148290L)))
    val a = Classifier.classify("gcw1", txs, msgs)
      .find(_.`type` == "cocoon_worker_payout").get
    assert(a.success)
    assert(a.source.contains(proxy))
    assert(a.source_secondary.contains(worker))
    assert(a.destination.contains(owner))
    assert(a.amount.contains(BigDecimal(4500148290L)))
    val d = a.cocoon_worker_payout_data.get
    assert(d.payout_type.contains("regular"))
    assert(d.query_id.contains("10553886210694500674"))
    assert(d.new_tokens.contains(BigDecimal(BigInt("9229614747703451079"))))
    assert(d.worker_state.contains(0))
    assert(d.worker_tokens.contains(BigDecimal(73063940556L)))
  }

  test("cocoon.yaml parity ('Cocoon Proxy Payout'): proxy->owner with " +
      "the excesses recipient as destination secondary") {
    val proxy = "0:" + "B9" * 32
    val owner = "0:" + "E7" * 32
    val excessesTo = "0:" + "3C" * 32
    val request = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x7610e6ebL), 32)
      .storeUint(BigInt("12731543016903973642"), 64)
      .storeAddress(Some(excessesTo)).build())
    val txs = Seq(tx("T1", proxy, 10), tx("T2", owner, 20),
      tx("T3", excessesTo, 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", null, proxy, Some(Opcodes.CocoonExtProxyPayoutRequest),
          body = Some(request)).copy(source = None),
        out("m2", proxy, owner, Some(Opcodes.CocoonPayout), createdLt = 11),
        out("m3", proxy, excessesTo, Some(Opcodes.CocoonReturnExcesses),
          createdLt = 12)),
      "T2" -> Seq(in("m2", proxy, owner, Some(Opcodes.CocoonPayout))),
      "T3" -> Seq(in("m3", proxy, excessesTo,
        Some(Opcodes.CocoonReturnExcesses))))
    val a = Classifier.classify("gcp1", txs, msgs)
      .find(_.`type` == "cocoon_proxy_payout").get
    assert(a.success)
    assert(a.source.contains(proxy))
    assert(a.destination.contains(owner))
    assert(a.destination_secondary.contains(excessesTo))
    assert(a.cocoon_proxy_payout_data.get.query_id
      .contains("12731543016903973642"))
  }

  test("cocoon.yaml parity ('Cocoon Client Top Up'): sender from the " +
      "body, client destination, proxy secondary and the top-up amount") {
    val client = "0:" + "E4" * 32
    val proxy = "0:" + "2A" * 32
    val sender = "0:" + "EE" * 32
    val topUp = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xf172e6c2L), 32)
      .storeUint(BigInt("11691960163567649532"), 64)
      .storeCoins(BigInt(1000000000L))
      .storeAddress(Some(sender)).build())
    val txs = Seq(tx("T1", client, 10), tx("T2", proxy, 20))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", sender, client, Some(Opcodes.CocoonExtClientTopUp),
          body = Some(topUp)),
        out("m2", client, proxy, Some(Opcodes.CocoonClientProxyRequest))),
      "T2" -> Seq(in("m2", client, proxy,
        Some(Opcodes.CocoonClientProxyRequest))))
    val a = Classifier.classify("gct1", txs, msgs)
      .find(_.`type` == "cocoon_client_top_up").get
    assert(a.success)
    assert(a.source.contains(sender))
    assert(a.destination.contains(client))
    assert(a.destination_secondary.contains(proxy))
    assert(a.amount.contains(BigDecimal(1000000000L)))
    assert(a.cocoon_client_top_up_data.get.query_id
      .contains("11691960163567649532"))
  }

  test("cocoon.yaml parity ('Cocoon Client Register'): owner->client " +
      "with query_id and nonce from the register body") {
    val client = "0:" + "22" * 32
    val owner = "0:" + "0A" * 32
    val proxy = "0:" + "99" * 32
    val reg = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xc45f9f3bL), 32)
      .storeUint(BigInt("1821011912409218354"), 64)
      .storeUint(BigInt("11924145372215500834"), 64)
      .storeAddress(Some(owner)).build())
    val txs = Seq(tx("T1", client, 10), tx("T2", proxy, 20))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", owner, client, Some(Opcodes.CocoonOwnerClientRegister),
          body = Some(reg)),
        out("m2", client, proxy, Some(Opcodes.CocoonClientProxyRequest))),
      "T2" -> Seq(in("m2", client, proxy,
        Some(Opcodes.CocoonClientProxyRequest))))
    val a = Classifier.classify("gcr1", txs, msgs)
      .find(_.`type` == "cocoon_client_register").get
    assert(a.success)
    assert(a.source.contains(owner))
    assert(a.destination.contains(client))
    val d = a.cocoon_client_register_data.get
    assert(d.query_id.contains("1821011912409218354"))
    assert(d.nonce.contains("11924145372215500834"))
  }

  test("cocoon.yaml parity ('Cocoon Grant Refund'): proxy source with " +
      "client secondary, refund recipient destination and amount") {
    val proxy = "0:" + "48" * 32
    val client = "0:" + "B9" * 32
    val recipient = "0:" + "29" * 32
    val grant = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xefd711e1L), 32)
      .storeUint(BigInt("8779794170130083123"), 64)
      .storeUint(BigInt("9225483487327049292"), 64)
      .storeAddress(None).build())
    // the payout hangs under the CLIENT's proxy request
    // (blocks/cocoon.py:1128-1152)
    val txs = Seq(tx("T1", proxy, 10), tx("T2", client, 20),
      tx("T3", recipient, 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", null, proxy, Some(Opcodes.CocoonGrantRefundPayload),
          body = Some(grant)).copy(source = None),
        out("m2", proxy, client, Some(Opcodes.CocoonClientProxyRequest),
          createdLt = 11)),
      "T2" -> Seq(in("m2", proxy, client,
        Some(Opcodes.CocoonClientProxyRequest)),
        out("m3", client, recipient, Some(Opcodes.CocoonPayout),
          value = 14999630120L, createdLt = 12)),
      "T3" -> Seq(in("m3", client, recipient, Some(Opcodes.CocoonPayout),
        value = 14999630120L)))
    val a = Classifier.classify("gcg1", txs, msgs)
      .find(_.`type` == "cocoon_grant_refund").get
    assert(a.success)
    assert(a.source.contains(proxy))
    assert(a.source_secondary.contains(client))
    assert(a.destination.contains(recipient))
    assert(a.amount.contains(BigDecimal(14999630120L)))
    val d = a.cocoon_grant_refund_data.get
    assert(d.query_id.contains("8779794170130083123"))
    assert(d.new_tokens_used.contains(BigDecimal(BigInt("9225483487327049292"))))
  }

  // ----------------------------------------------------------------------
  // nft.yaml
  // ----------------------------------------------------------------------

  test("nft.yaml parity ('Getgems purchase'): BOTH nft_transfer and " +
      "nft_purchase actions with the full sale-enriched detail struct") {
    val sale = "0:" + "CE" * 32
    val buyer = "0:" + "B9" * 32
    val item = "0:" + "5B" * 32
    val seller = "0:" + "0D" * 32
    val mp = "0:" + "58" * 32
    val coll = "0:" + "BA" * 32
    val fwdPayload = new Boc.Builder().storeUint(BigInt(0x4cacb9cdL), 32).build()
    val xfer = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x5fcc3d14L), 32)
      .storeUint(BigInt(0), 64)
      .storeAddress(Some(buyer))
      .storeAddress(Some(buyer))
      .storeBit(false) // no custom payload
      .storeCoins(BigInt(30000000L))
      .storeBit(true).storeRef(fwdPayload)
      .build())
    val txs = Seq(tx("T1", sale, 10), tx("T2", item, 20),
      tx("T3", buyer, 30), tx("T4", mp, 40), tx("T5", seller, 50))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", buyer, sale, None, value = 1350000000L),
        out("m2", sale, item, Some(Opcodes.NftTransfer),
          body = Some(xfer), createdLt = 11),
        out("m3", sale, mp, None, value = 67500000L, createdLt = 12),
        out("m4", sale, seller, None, value = 1372369010L, createdLt = 13)),
      "T2" -> Seq(
        in("m2", sale, item, Some(Opcodes.NftTransfer), body = Some(xfer)),
        out("m5", item, buyer, Some(Opcodes.NftOwnershipAssigned))),
      "T3" -> Seq(in("m5", item, buyer, Some(Opcodes.NftOwnershipAssigned))),
      "T4" -> Seq(in("m3", sale, mp, None, value = 67500000L)),
      "T5" -> Seq(in("m4", sale, seller, None, value = 1372369010L)))
    val actions = Classifier.classify("gnft1", txs, msgs,
      interfaces = Map(sale -> s"nft_sale|$seller|$mp|$item|1350000000"),
      nftItems = Map(item -> NftItemInfo(Some("7"), Some(coll))))
    // the nft_purchase action (reference NftPurchaseBlock)
    val p = actions.find(_.`type` == "nft_purchase").get
    assert(p.success)
    assert(p.source.contains(sale)) // prev_owner = the sale contract
    assert(p.destination.contains(buyer))
    assert(p.asset.contains(coll))
    assert(p.asset_secondary.contains(item))
    val pd = p.nft_transfer_data.get
    assert(pd.query_id.contains("0"))
    assert(pd.is_purchase.contains(true))
    assert(pd.price.contains(BigDecimal(1350000000L)))
    assert(pd.forward_amount.contains(BigDecimal(30000000L)))
    assert(pd.custom_payload.isEmpty)
    assert(pd.forward_payload.contains(Boc.serializeBase64(fwdPayload)))
    assert(pd.response_destination.contains(buyer))
    assert(pd.marketplace.contains("getgems"))
    assert(pd.real_prev_owner.contains(seller))
    assert(pd.marketplace_address.contains(mp))
    assert(pd.payout_amount.contains(BigDecimal(1372369010L)))
    assert(pd.payout_comment_encoded.contains(false))
    assert(pd.payout_comment_encrypted.contains(false))
    assert(pd.payout_comment.isEmpty)
    // accounts: sale, buyer, item + the real seller (via the payout node)
    for (acct <- Seq(sale, buyer, item, seller))
      assert(p.accounts.contains(acct), s"missing $acct in ${p.accounts}")
    // the enriched nft_transfer action ALSO survives (the reference
    // serializes merged sub-blocks; generic_yaml_test expects both)
    val t = actions.find(_.`type` == "nft_transfer").get
    assert(t.source.contains(sale))
    assert(t.destination.contains(buyer))
    assert(t.asset.contains(coll))
    assert(t.asset_secondary.contains(item))
    val td = t.nft_transfer_data.get
    assert(td.query_id.contains("0"))
    assert(td.is_purchase.contains(true))
    assert(td.price.contains(BigDecimal(1350000000L)))
    assert(td.forward_amount.contains(BigDecimal(30000000L)))
    assert(td.response_destination.contains(buyer))
    assert(td.marketplace.contains("getgems"))
    assert(td.real_prev_owner.contains(seller))
    assert(td.marketplace_address.contains(mp))
    assert(td.payout_comment.isEmpty)
  }

  // ----------------------------------------------------------------------
  // tgbtc.yaml
  // ----------------------------------------------------------------------

  test("tgbtc.yaml parity ('tgBTC new key'): teleport->coordinator with " +
      "pubkey/pegout secondaries, DKG timestamp value and key amount") {
    val teleport = "0:" + "F8" * 32
    val coordinator = "0:" + "E1" * 32
    val pegout = "0:" + "87" * 32
    val pubkey = BigInt(
      "382e9d762046f4bb5cde2ce1b7780cb499b5394972163930cf88bc55463acb70", 16)
    val dkgBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x453443a6L), 32)
      .storeUint(BigInt(1748633438L), 64)
      .storeUint(pubkey, 256).build())
    val keyBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x27756729L), 32)
      .storeCoins(BigInt(425489053588L))
      .storeUint(pubkey, 256)
      .storeAddress(Some(pegout)).build())
    val sink1 = "0:" + "01" * 32
    val sink2 = "0:" + "02" * 32
    val txs = Seq(tx("T1", teleport, 10), tx("T2", sink1, 20),
      tx("T3", coordinator, 30), tx("T4", sink2, 40))
    val msgs = Map(
      "T1" -> Seq(
        in("m0", "0:" + "99" * 32, teleport, Some(0x12345678L)),
        out("m1", teleport, sink1, Some(Opcodes.TgbtcDkgCompleted),
          body = Some(dkgBody), createdLt = 11),
        out("m2", teleport, coordinator, Some(Opcodes.TgbtcNewKeyAnchor),
          createdLt = 12)),
      "T2" -> Seq(in("m1", teleport, sink1, Some(Opcodes.TgbtcDkgCompleted),
        body = Some(dkgBody))),
      "T3" -> Seq(
        in("m2", teleport, coordinator, Some(Opcodes.TgbtcNewKeyAnchor)),
        out("m3", coordinator, sink2, Some(Opcodes.TgbtcNewKey),
          body = Some(keyBody))),
      "T4" -> Seq(in("m3", coordinator, sink2, Some(Opcodes.TgbtcNewKey),
        body = Some(keyBody))))
    val a = Classifier.classify("gtb1", txs, msgs)
      .find(_.`type` == "tgbtc_new_key").get
    assert(a.source.contains(teleport))
    assert(a.source_secondary.contains(pubkey.toString(16)))
    assert(a.destination.contains(coordinator))
    assert(a.destination_secondary.contains(pegout))
    assert(a.value.contains(BigDecimal(1748633438L)))
    assert(a.amount.contains(BigDecimal(425489053588L)))
  }

  test("tgbtc.yaml parity ('tgBTC mint'): caller endpoints, teleport and " +
      "recipient-wallet secondaries, master asset and the little-endian " +
      "bitcoin txid") {
    val caller = "0:" + "21" * 32
    val teleport = "0:" + "E1" * 32
    val master = "0:" + "AD" * 32
    val wallet = "0:" + "AE" * 32
    val headAcct = "0:" + "77" * 32
    val sink = "0:" + "03" * 32
    val txidHex =
      "29473eb71be95904599a5cecd24f602f07942b1da2b4c5eb3c5551367c2e4023"
    val txidLe = BigInt(1,
      txidHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray.reverse)
    val logBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x77a80ef3L), 32)
      .storeCoins(BigInt(9850L))
      .storeAddress(Some(caller))
      .storeUint(txidLe, 256).build())
    val mintCall = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JettonMint), 32)
      .storeUint(BigInt(1), 64)
      .storeAddress(Some(caller))
      .storeCoins(BigInt(1000L)).build())
    val mintXfer = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JettonInternalTransfer), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(9850L))
      .storeAddress(None).storeAddress(None)
      .storeCoins(BigInt(0)).build())
    val txs = Seq(tx("T1", headAcct, 10), tx("T2", teleport, 20),
      tx("T3", sink, 30), tx("T4", master, 40), tx("T5", wallet, 50))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", caller, headAcct, Some(Opcodes.TgbtcMintHead)),
        out("m2", headAcct, teleport, Some(Opcodes.TgbtcMintCall))),
      "T2" -> Seq(
        in("m2", headAcct, teleport, Some(Opcodes.TgbtcMintCall)),
        out("m3", teleport, sink, Some(Opcodes.TgbtcMint),
          body = Some(logBody), createdLt = 21),
        out("m4", teleport, master, Some(Opcodes.JettonMint),
          body = Some(mintCall), createdLt = 22)),
      "T3" -> Seq(in("m3", teleport, sink, Some(Opcodes.TgbtcMint),
        body = Some(logBody))),
      "T4" -> Seq(
        in("m4", teleport, master, Some(Opcodes.JettonMint),
          body = Some(mintCall)),
        out("m5", master, wallet, Some(Opcodes.JettonInternalTransfer),
          body = Some(mintXfer))),
      "T5" -> Seq(in("m5", master, wallet,
        Some(Opcodes.JettonInternalTransfer), body = Some(mintXfer))))
    val a = Classifier.classify("gtb2", txs, msgs)
      .find(_.`type` == "tgbtc_mint").get
    assert(a.success)
    assert(a.source.contains(caller))
    assert(a.destination.contains(caller))
    assert(a.source_secondary.contains(teleport))
    assert(a.destination_secondary.contains(wallet))
    assert(a.amount.contains(BigDecimal(9850L)))
    assert(a.asset.contains(master))
    assert(a.asset_secondary.contains(txidHex))
  }

  test("tgbtc.yaml parity ('tgBTC burn'): owner/wallet endpoints, " +
      "repository master asset, log amount and the pegout destination") {
    val owner = "0:" + "21" * 32
    val wallet = "0:" + "AE" * 32
    val master = "0:" + "AD" * 32
    val teleport = "0:" + "E1" * 32
    val pegout = "0:" + "AF" * 32
    val sink = "0:" + "04" * 32
    val burnBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x595f07bcL), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(9637L)).storeAddress(None).build())
    val logBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xca444ce6L), 32)
      .storeCoins(BigInt(9637L))
      .storeAddress(Some(owner))
      .storeAddress(Some(pegout)).build())
    val txs = Seq(tx("T1", wallet, 10), tx("T2", teleport, 20),
      tx("T3", sink, 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", owner, wallet, Some(Opcodes.JettonBurn),
          body = Some(burnBody)),
        out("m2", wallet, teleport, Some(Opcodes.JettonBurnNotification))),
      "T2" -> Seq(
        in("m2", wallet, teleport, Some(Opcodes.JettonBurnNotification)),
        out("m3", teleport, sink, Some(Opcodes.TgbtcBurn),
          body = Some(logBody))),
      "T3" -> Seq(in("m3", teleport, sink, Some(Opcodes.TgbtcBurn),
        body = Some(logBody))))
    val a = Classifier.classify("gtb3", txs, msgs,
      jettonWallets = Map(wallet -> master))
      .find(_.`type` == "tgbtc_burn").get
    assert(a.source.contains(owner))
    assert(a.source_secondary.contains(wallet))
    assert(a.asset.contains(master))
    assert(a.amount.contains(BigDecimal(9637L)))
    assert(a.destination.contains(pegout))
  }

  test("tgbtc.yaml parity ('tgBTC dkg log (fallback)'): source, pubkey " +
      "asset and timestamp value") {
    val coordinator = "0:" + "E7" * 32
    val sink = "0:" + "05" * 32
    val pubkey = BigInt(
      "bb3a21df270dd0e6dc1169f4afb93be5eb2945df81c011f2b29f648daf64d150", 16)
    val dkgBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x453443a6L), 32)
      .storeUint(BigInt(1744132682L), 64)
      .storeUint(pubkey, 256).build())
    val txs = Seq(tx("T1", sink, 10))
    val msgs = Map("T1" -> Seq(
      in("m1", coordinator, sink, Some(Opcodes.TgbtcDkgCompleted),
        body = Some(dkgBody))))
    val a = Classifier.classify("gtb4", txs, msgs)
      .find(_.`type` == "tgbtc_dkg_log_fallback").get
    assert(a.source.contains(coordinator))
    assert(a.asset.contains(pubkey.toString(16)))
    assert(a.value.contains(BigDecimal(1744132682L)))
  }

  // ----------------------------------------------------------------------
  // jvault.yaml
  // ----------------------------------------------------------------------

  test("jvault.yaml parity ('Stake (simple)'): sender/wallet endpoints, " +
      "repository asset, pool destination, amount and period/stake_wallet") {
    val user = "0:" + "DA" * 32
    val userWallet = "0:" + "2D" * 32
    val poolWallet = "0:" + "93" * 32
    val pool = "0:" + "A2" * 32
    val stakeWallet = "0:" + "79" * 32
    val master = "0:" + "DC" * 32
    val fwd = Boc.parseBase64(Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xdeadbeefL), 32)
      .storeUint(BigInt(2592000L), 32).build()))
    val xfer = transferBody(1, 0, pool, user, 1, forwardPayload = Some(fwd))
    // amount rides the TEP-74 coins field — rebuild with the real amount
    val xfer2 = {
      val b = new Boc.Builder()
        .storeUint(BigInt(0x0f8a7ea5L), 32)
        .storeUint(BigInt(1), 64)
        .storeCoins(BigInt(12266000000000L))
        .storeAddress(Some(pool)).storeAddress(Some(user))
        .storeBit(false).storeCoins(BigInt(1))
        .storeBit(true).storeRef(fwd)
      Boc.serializeBase64(b.build())
    }
    val txs = Seq(tx("T1", userWallet, 10), tx("T2", poolWallet, 20),
      tx("T3", pool, 30), tx("T4", stakeWallet, 40), tx("T5", pool, 50))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, userWallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer2)),
        out("m2", userWallet, poolWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", userWallet, poolWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", poolWallet, pool, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", poolWallet, pool, Some(Opcodes.JettonNotify)),
        out("m4", pool, stakeWallet, Some(Opcodes.JvaultReceiveJettons))),
      "T4" -> Seq(
        in("m4", pool, stakeWallet, Some(Opcodes.JvaultReceiveJettons)),
        out("m5", stakeWallet, pool,
          Some(Opcodes.JvaultRequestUpdateRewards))),
      "T5" -> Seq(in("m5", stakeWallet, pool,
        Some(Opcodes.JvaultRequestUpdateRewards))))
    val a = Classifier.classify("gjv1", txs, msgs,
      jettonWallets = Map(userWallet -> master, poolWallet -> master))
      .find(_.`type` == "jvault_stake").get
    assert(a.success)
    assert(a.source.contains(user))
    assert(a.source_secondary.contains(userWallet))
    assert(a.asset.contains(master))
    assert(a.destination.contains(pool))
    assert(a.amount.contains(BigDecimal(12266000000000L)))
    val d = a.jvault_stake_data.get
    assert(d.period.contains(BigDecimal(2592000L)))
    assert(d.stake_wallet.contains(stakeWallet))
  }

  test("jvault.yaml parity ('Unstake request'): stake-wallet interface " +
      "row resolves pool/asset/jvault-asset; amount from the body") {
    val user = "0:" + "F6" * 32
    val stakeWallet = "0:" + "E9" * 32
    val pool = "0:" + "A2" * 32
    val asset = "0:" + "90" * 32
    val jvAsset = "0:" + "26" * 32
    val body = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JvaultUnstakeRequest), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(246742586340L)).build())
    val txs = Seq(tx("T1", stakeWallet, 10), tx("T2", pool, 20))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, stakeWallet, Some(Opcodes.JvaultUnstakeRequest),
          body = Some(body)),
        out("m2", stakeWallet, pool,
          Some(Opcodes.JvaultRequestUpdateRewards))),
      "T2" -> Seq(in("m2", stakeWallet, pool,
        Some(Opcodes.JvaultRequestUpdateRewards))))
    val a = Classifier.classify("gjv2", txs, msgs,
      interfaces = Map(stakeWallet ->
        s"jvault_stake_wallet|$pool|$asset|$jvAsset"))
      .find(_.`type` == "jvault_unstake_request").get
    assert(a.success)
    assert(a.source.contains(user))
    assert(a.source_secondary.contains(stakeWallet))
    assert(a.destination.contains(pool))
    assert(a.amount.contains(BigDecimal(246742586340L)))
    assert(a.asset.contains(asset))
    assert(a.asset2.contains(jvAsset))
  }

  test("jvault.yaml parity ('Unstake (failed)'): no request-update leg " +
      "puts the compute exit code on the opcode column") {
    val user = "0:" + "65" * 32
    val stakeWallet = "0:" + "E3" * 32
    val pool = "0:" + "B7" * 32
    val body = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JvaultUnstakeJettons), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(716000000000L)).storeBit(false).build())
    val txs = Seq(
      TxLite("T1", stakeWallet, 10, 10, "active", "active", false,
        Some(56), None, 0L, "ord"))
    val msgs = Map("T1" -> Seq(
      in("m1", user, stakeWallet, Some(Opcodes.JvaultUnstakeJettons),
        body = Some(body))))
    val a = Classifier.classify("gjv3", txs, msgs,
      interfaces = Map(stakeWallet ->
        s"jvault_stake_wallet|$pool|0:AA|0:BB"))
      .find(_.`type` == "jvault_unstake").get
    assert(a.source.contains(user))
    assert(a.source_secondary.contains(stakeWallet))
    assert(a.destination.contains(pool))
    assert(a.amount.contains(BigDecimal(716000000000L)))
    assert(a.opcode.contains(56L))
  }

  test("jvault.yaml parity ('Claim rewards'): claim wallets + withdrawn " +
      "amounts with the pool destination") {
    val user = "0:" + "D9" * 32
    val stakeWallet = "0:" + "32" * 32
    val pool = "0:" + "AA" * 32
    val rewardWallet = "0:" + "A0" * 32
    val poolRewardWallet = "0:" + "55" * 32
    val userRewardWallet = "0:" + "66" * 32
    def addrKey(a: String): BigInt = {
      val Array(wc, hex) = a.split(":")
      (BigInt(2) << 265) | (BigInt(wc.toInt & 0xff) << 256) | BigInt(hex, 16)
    }
    val ds = Boc.buildDictRefs(
      Map(addrKey(rewardWallet) -> new Boc.Builder().build()), 267)
      .beginParse()
    assert(ds.loadBit())
    val claimBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JvaultClaim), 32)
      .storeUint(BigInt(1), 64)
      .storeBit(true).storeRef(ds.loadRef())
      .build())
    val payout = transferBody(1, 7919563L, user, user, 1)
    val txs = Seq(tx("T1", stakeWallet, 10), tx("T2", pool, 20),
      tx("T3", poolRewardWallet, 30), tx("T4", userRewardWallet, 40))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, stakeWallet, Some(Opcodes.JvaultClaim),
          body = Some(claimBody)),
        out("m2", stakeWallet, pool,
          Some(Opcodes.JvaultSendClaimedRewards))),
      "T2" -> Seq(
        in("m2", stakeWallet, pool, Some(Opcodes.JvaultSendClaimedRewards)),
        out("m3", pool, poolRewardWallet, Some(Opcodes.JettonTransfer),
          body = Some(payout))),
      "T3" -> Seq(
        in("m3", pool, poolRewardWallet, Some(Opcodes.JettonTransfer),
          body = Some(payout)),
        out("m4", poolRewardWallet, userRewardWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T4" -> Seq(in("m4", poolRewardWallet, userRewardWallet,
        Some(Opcodes.JettonInternalTransfer))))
    val a = Classifier.classify("gjv4", txs, msgs)
      .find(_.`type` == "jvault_claim").get
    assert(a.success)
    assert(a.source.contains(user))
    assert(a.source_secondary.contains(stakeWallet))
    assert(a.destination.contains(pool))
    val d = a.jvault_claim_data.get
    assert(d.claimed_jettons == Seq(rewardWallet))
    assert(d.claimed_amounts == Seq(BigDecimal(7919563L)))
  }

  // ----------------------------------------------------------------------
  // coffee.yaml
  // ----------------------------------------------------------------------

  /** swap_successful_event#c0ffee30 with a jetton or native input. */
  private def coffeeEventBody(inputJetton: Option[String], inputAmount: Long,
      outputAmount: Long): String = {
    val b = new Boc.Builder()
      .storeUint(BigInt(0xc0ffee30L), 32)
      .storeUint(BigInt(1), 64)
    inputJetton match {
      case Some(a) =>
        val Array(wc, hex) = a.split(":")
        b.storeUint(BigInt(1), 2).storeUint(BigInt(wc.toInt), 8)
          .storeUint(BigInt(hex, 16), 256)
      case None => b.storeUint(BigInt(0), 2)
    }
    b.storeCoins(BigInt(inputAmount)).storeCoins(BigInt(outputAmount))
    Boc.serializeBase64(b.build())
  }

  private def coffeePayoutInternalBody(recipient: String, amount: Long)
      : String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xc0ffee21L), 32)
      .storeUint(BigInt(1), 64)
      .storeAddress(Some(recipient))
      .storeCoins(BigInt(amount))
      .storeBit(false).storeBit(false)
      .build())

  test("coffee.yaml parity ('Swap USDT -> TON'): jetton in, native " +
      "payout out, empty peer_swaps and both dex transfers") {
    val user = "0:" + "E3" * 32
    val userWallet = "0:" + "66" * 32
    val vault = "0:" + "FF" * 32
    val vaultWallet = "0:" + "F7" * 32
    val pool = "0:" + "C4" * 32
    val sink = "0:" + "06" * 32
    val assetIn = "0:" + "B1" * 32
    val xfer = transferBody(1, 5489694L, vault, user, 1)
    val event = coffeeEventBody(Some(assetIn), 5489694L, 1712374663L)
    val poBody = coffeePayoutInternalBody(user, 1712374663L)
    val txs = Seq(tx("T1", userWallet, 10), tx("T2", vaultWallet, 20),
      tx("T3", vault, 30), tx("T4", pool, 40), tx("T5", sink, 50),
      tx("T6", pool, 60), tx("T7", user, 70))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, userWallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer)),
        out("m2", userWallet, vaultWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", userWallet, vaultWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", vaultWallet, vault, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", vaultWallet, vault, Some(Opcodes.JettonNotify)),
        out("m4", vault, pool, Some(Opcodes.CoffeeSwapInternal))),
      "T4" -> Seq(
        in("m4", vault, pool, Some(Opcodes.CoffeeSwapInternal)),
        out("m5", pool, sink, Some(Opcodes.CoffeeSwapSuccess),
          body = Some(event), createdLt = 41),
        out("m6", pool, pool, Some(Opcodes.CoffeePayoutInternal),
          body = Some(poBody), createdLt = 42)),
      "T5" -> Seq(in("m5", pool, sink, Some(Opcodes.CoffeeSwapSuccess),
        body = Some(event))),
      "T6" -> Seq(
        in("m6", pool, pool, Some(Opcodes.CoffeePayoutInternal),
          body = Some(poBody)),
        out("m7", pool, user, Some(Opcodes.CoffeePayoutOut))),
      "T7" -> Seq(in("m7", pool, user, Some(Opcodes.CoffeePayoutOut))))
    val a = Classifier.classify("gcf1", txs, msgs,
      jettonWallets = Map(userWallet -> assetIn,
        vaultWallet -> assetIn))
      .find(_.`type` == "jetton_swap").get
    assert(a.success)
    val sd = a.jetton_swap_data.get
    assert(sd.dex == "coffee")
    assert(sd.sender.contains(user))
    val inc = sd.dex_incoming_transfer.get
    assert(inc.asset.contains(assetIn))
    assert(inc.amount.contains(BigDecimal(5489694L)))
    assert(inc.source.contains(user))
    assert(inc.source_jetton_wallet.contains(userWallet))
    assert(inc.destination.contains(vault))
    assert(inc.destination_jetton_wallet.contains(vaultWallet))
    val outT = sd.dex_outgoing_transfer.get
    assert(outT.asset.isEmpty)
    assert(outT.amount.contains(BigDecimal(1712374663L)))
    assert(outT.source.contains(pool))
    assert(outT.source_jetton_wallet.isEmpty)
    assert(outT.destination.contains(user))
    assert(outT.destination_jetton_wallet.isEmpty)
    assert(sd.peer_swaps.isEmpty)
  }

  test("coffee.yaml parity ('Swap USDT -> TON (hop) -> CES'): two-hop " +
      "chain with native intermediate, peer_swaps chained from the " +
      "success events and the out jetton leg") {
    val user = "0:" + "E3" * 32
    val userWallet = "0:" + "66" * 32
    val vault = "0:" + "FF" * 32
    val vaultWallet = "0:" + "F7" * 32
    val pool1 = "0:" + "AA" * 32
    val pool2 = "0:" + "E9" * 32
    val cesVault = "0:" + "BB" * 32
    val cesVaultWallet = "0:" + "A2" * 32
    val userCesWallet = "0:" + "8E" * 32
    val sink1 = "0:" + "07" * 32
    val sink2 = "0:" + "08" * 32
    val assetIn = "0:" + "B1" * 32
    val assetOut = "0:" + "A5" * 32
    val xfer = transferBody(1, 10000000L, vault, user, 1)
    val event1 = coffeeEventBody(Some(assetIn), 10000000L, 3110612273L)
    val event2 = coffeeEventBody(None, 3110612273L, 13876673279L)
    val poBody = coffeePayoutInternalBody(user, 13876673279L)
    val outXfer = transferBody(1, 13876673279L, user, user, 1)
    val txs = Seq(tx("T1", userWallet, 10), tx("T2", vaultWallet, 20),
      tx("T3", vault, 30), tx("T4", pool1, 40), tx("T5", sink1, 50),
      tx("T6", pool2, 60), tx("T7", sink2, 70), tx("T8", cesVault, 80),
      tx("T9", cesVaultWallet, 90), tx("T10", userCesWallet, 100))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, userWallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer)),
        out("m2", userWallet, vaultWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", userWallet, vaultWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", vaultWallet, vault, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", vaultWallet, vault, Some(Opcodes.JettonNotify)),
        out("m4", vault, pool1, Some(Opcodes.CoffeeSwapInternal))),
      "T4" -> Seq(
        in("m4", vault, pool1, Some(Opcodes.CoffeeSwapInternal)),
        out("m5", pool1, sink1, Some(Opcodes.CoffeeSwapSuccess),
          body = Some(event1), createdLt = 41),
        out("m6", pool1, pool2, Some(Opcodes.CoffeeSwapInternal),
          createdLt = 42)),
      "T5" -> Seq(in("m5", pool1, sink1, Some(Opcodes.CoffeeSwapSuccess),
        body = Some(event1))),
      "T6" -> Seq(
        in("m6", pool1, pool2, Some(Opcodes.CoffeeSwapInternal)),
        out("m7", pool2, sink2, Some(Opcodes.CoffeeSwapSuccess),
          body = Some(event2), createdLt = 61),
        out("m8", pool2, cesVault, Some(Opcodes.CoffeePayoutInternal),
          body = Some(poBody), createdLt = 62)),
      "T7" -> Seq(in("m7", pool2, sink2, Some(Opcodes.CoffeeSwapSuccess),
        body = Some(event2))),
      "T8" -> Seq(
        in("m8", pool2, cesVault, Some(Opcodes.CoffeePayoutInternal),
          body = Some(poBody)),
        out("m9", cesVault, cesVaultWallet, Some(Opcodes.JettonTransfer),
          body = Some(outXfer))),
      "T9" -> Seq(
        in("m9", cesVault, cesVaultWallet, Some(Opcodes.JettonTransfer),
          body = Some(outXfer)),
        out("m10", cesVaultWallet, userCesWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T10" -> Seq(in("m10", cesVaultWallet, userCesWallet,
        Some(Opcodes.JettonInternalTransfer))))
    val a = Classifier.classify("gcf2", txs, msgs,
      jettonWallets = Map(userWallet -> assetIn, vaultWallet -> assetIn,
        cesVaultWallet -> assetOut, userCesWallet -> assetOut))
      .find(_.`type` == "jetton_swap").get
    val sd = a.jetton_swap_data.get
    assert(sd.dex == "coffee")
    assert(sd.sender.contains(user))
    val inc = sd.dex_incoming_transfer.get
    assert(inc.asset.contains(assetIn))
    assert(inc.amount.contains(BigDecimal(10000000L)))
    val outT = sd.dex_outgoing_transfer.get
    assert(outT.asset.contains(assetOut))
    assert(outT.amount.contains(BigDecimal(13876673279L)))
    assert(outT.source.contains(cesVault))
    assert(outT.source_jetton_wallet.contains(cesVaultWallet))
    assert(outT.destination.contains(user))
    assert(outT.destination_jetton_wallet.contains(userCesWallet))
    val ps = sd.peer_swaps
    assert(ps.size == 2, s"peer_swaps: $ps")
    assert(ps(0).asset_in.map(_.toUpperCase)
      .contains(assetIn.toUpperCase))
    assert(ps(0).amount_in.contains(BigDecimal(10000000L)))
    assert(ps(0).asset_out.isEmpty)
    assert(ps(0).amount_out.contains(BigDecimal(3110612273L)))
    assert(ps(1).asset_in.isEmpty)
    assert(ps(1).amount_in.contains(BigDecimal(3110612273L)))
    assert(ps(1).asset_out.contains(assetOut))
    assert(ps(1).amount_out.contains(BigDecimal(13876673279L)))
  }

  test("tonco.yaml parity ('Tonco withdraw liquidity'): burn chain " +
      "with per-side payout fills, nft/tick detail and the TON-side " +
      "router fallback") {
    val owner = "0:" + "3F" * 32
    val pool = "0:" + "F6" * 32
    val router = "0:" + "BF" * 32
    val nft = "0:" + "25" * 32
    val routerJW = "0:" + "AC" * 32
    val userJW = "0:" + "1D" * 32
    val master = "0:" + "B1" * 32
    val startBurn = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x530b5f2cL), 32).storeUint(BigInt(1), 64)
      .storeUint(BigInt(1204), 64)
      .storeUint(BigInt(557736918L), 128)
      .storeInt(BigInt(-51720), 24).storeInt(BigInt(-49380), 24).build())
    val posBurn = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x46ca335aL), 32).storeUint(BigInt(1), 64)
      .storeAddress(Some(owner))
      .storeUint(BigInt(557736918L), 128)
      .storeInt(BigInt(-51720), 24).storeInt(BigInt(-49380), 24).build())
    // the TON side pays out through the router's wTTON wallet (the
    // reference's TONCO_ROUTER_WTTON_WALLET_ADDR, liquidity.py:1183);
    // the slot records that wallet and the payout rides a pTON
    // ton_transfer child
    val wttonJW = "0:871DA9215B14902166F0EA2A16DB56278D528108377F8158C5F4CCFDFDD22E17"
    val wttonMaster = "0:949C4C66760C002800E2FA3D8A3CA4E1C90A9373B53AE7472033483BF14CD95E"
    val payTo = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xa1daa96dL), 32).storeUint(BigInt(1), 64)
      .storeAddress(Some(owner)).storeAddress(Some(owner))
      .storeUint(BigInt(201), 32).storeUint(BigInt(7), 64)
      .storeBit(true)
      .storeRef(new Boc.Builder()
        .storeCoins(BigInt(324026863L)).storeAddress(Some(wttonJW))
        .storeCoins(BigInt(2999999L)).storeAddress(Some(routerJW)).build())
      .build())
    val payout = transferBody(1, 2999999L, owner, owner, 1)
    val payoutTon = transferBody(2, 324026863L, owner, owner, 1)
    val ptonBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x01f3835dL), 32).storeUint(BigInt(2), 64)
      .storeCoins(BigInt(324026863L)).storeAddress(Some(owner)).build())
    val txs = Seq(tx("T1", pool, 10), tx("T2", nft, 20), tx("T3", pool, 30),
      tx("T4", router, 40), tx("T5", routerJW, 50), tx("T6", userJW, 60),
      tx("T7", wttonJW, 70), tx("T8", router, 80))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", router, pool, Some(Opcodes.ToncoPoolV3StartBurn),
          body = Some(startBurn)),
        out("m2", pool, nft, Some(Opcodes.ToncoPositionNftBurn),
          body = Some(posBurn))),
      "T2" -> Seq(
        in("m2", pool, nft, Some(Opcodes.ToncoPositionNftBurn),
          body = Some(posBurn)),
        out("m3", nft, pool, Some(Opcodes.ToncoPoolV3Burn))),
      "T3" -> Seq(
        in("m3", nft, pool, Some(Opcodes.ToncoPoolV3Burn)),
        out("m4", pool, router, Some(Opcodes.ToncoRouterV3PayTo),
          body = Some(payTo))),
      "T4" -> Seq(
        in("m4", pool, router, Some(Opcodes.ToncoRouterV3PayTo),
          body = Some(payTo)),
        out("m7", router, wttonJW, Some(Opcodes.JettonTransfer),
          body = Some(payoutTon), createdLt = 2L),
        out("m5", router, routerJW, Some(Opcodes.JettonTransfer),
          body = Some(payout), createdLt = 3L)),
      "T5" -> Seq(
        in("m5", router, routerJW, Some(Opcodes.JettonTransfer),
          body = Some(payout)),
        out("m6", routerJW, userJW, Some(Opcodes.JettonInternalTransfer))),
      "T6" -> Seq(in("m6", routerJW, userJW,
        Some(Opcodes.JettonInternalTransfer))),
      "T7" -> Seq(
        in("m7", router, wttonJW, Some(Opcodes.JettonTransfer),
          body = Some(payoutTon)),
        out("m8", wttonJW, router, Some(Opcodes.PTonTransferOp),
          body = Some(ptonBody))),
      "T8" -> Seq(in("m8", wttonJW, router, Some(Opcodes.PTonTransferOp),
        body = Some(ptonBody))))
    val a = Classifier.classify("gtcw1", txs, msgs,
      jettonWallets = Map(routerJW -> master, userJW -> master,
        wttonJW -> wttonMaster))
      .find(_.`type` == "dex_withdraw_liquidity").get
    assert(a.source.contains(owner))
    assert(a.destination.contains(pool))
    val d = a.dex_withdraw_liquidity_data.get
    assert(d.dex.contains("tonco"))
    assert(d.lp_tokens_burnt.contains(BigDecimal(557736918L)))
    assert(d.amount1.contains(BigDecimal(324026863L)))
    assert(d.amount2.contains(BigDecimal(2999999L)))
    assert(d.asset1_out.isEmpty)
    assert(d.asset2_out.contains(master))
    assert(d.user_jetton_wallet_1.isEmpty)
    assert(d.user_jetton_wallet_2.contains(userJW))
    assert(d.dex_jetton_wallet_1.isEmpty)
    assert(d.dex_jetton_wallet_2.contains(routerJW))
    assert(d.dex_wallet_1.contains(router))
    assert(d.dex_wallet_2.contains(router))
    assert(d.burned_nft_index.contains("1204"))
    assert(d.burned_nft_address.contains(nft))
    assert(d.tick_lower.contains("-51720"))
    assert(d.tick_upper.contains("-49380"))
  }

  test("coffee.yaml parity ('deposit liquidity TON + CES'): two deposit " +
      "actions — the TON leg without completion, the jetton leg carrying " +
      "the pool, LP mint and target assets") {
    val user = "0:" + "E3" * 32
    val tonVault = "0:" + "AA" * 32
    val factory1 = "0:" + "F1" * 32
    val factory2 = "0:" + "F2" * 32
    val depc = "0:" + "66" * 32
    val pool = "0:" + "39" * 32
    val ces = "0:" + "A5" * 32
    val userCesWallet = "0:" + "8E" * 32
    val cesVaultWallet = "0:" + "CC" * 32
    val cesVault = "0:" + "CD" * 32
    val userLpWallet = "0:" + "77" * 32
    val sink = "0:" + "09" * 32
    def requestBody(amount: Long): String = {
      val pp = new Boc.Builder()
        .storeUint(BigInt(0), 2) // first: native (TON)
        .storeUint(BigInt(1), 2).storeUint(BigInt(0), 8) // second: jetton
        .storeUint(BigInt(ces.split(':')(1), 16), 256)
        .storeUint(BigInt(0), 3) // amm
        .storeBit(false)
      Boc.serializeBase64(new Boc.Builder()
        .storeUint(BigInt(0xc0ffee27L), 32).storeUint(BigInt(1), 64)
        .storeCoins(BigInt(amount))
        .storeRef(new Boc.Builder().storeUint(BigInt(0), 8).build())
        .storeRef(pp.build())
        .storeAddress(Some(user))
        .storeRef(new Boc.Builder().storeUint(BigInt(0), 8).build())
        .build())
    }
    val successBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xc0ffee33L), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(3129892658L)).storeCoins(BigInt(13876673279L))
      .storeCoins(BigInt(6589203740L)).build())
    val lpXfer = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JettonInternalTransfer), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(6589203740L))
      .storeAddress(None).storeAddress(None).storeCoins(BigInt(0)).build())
    val cesXfer = transferBody(1, 13876673279L, cesVault, user, 1)
    val txs = Seq(tx("T1", tonVault, 10), tx("T2", factory1, 20),
      tx("T3", depc, 30),
      tx("T4", userCesWallet, 40), tx("T5", cesVaultWallet, 50),
      tx("T6", cesVault, 60), tx("T7", factory2, 70), tx("T8", depc, 80),
      tx("T9", pool, 90), tx("T10", userLpWallet, 100),
      tx("T11", sink, 110))
    val msgs = Map(
      // TON leg: native deposit -> request -> deploy (no completion)
      "T1" -> Seq(
        in("m1", user, tonVault, Some(Opcodes.CoffeeDepositLiquidityNative)),
        out("m2", tonVault, factory1, Some(Opcodes.CoffeeDepositRequest),
          body = Some(requestBody(3129892658L)))),
      "T2" -> Seq(
        in("m2", tonVault, factory1, Some(Opcodes.CoffeeDepositRequest),
          body = Some(requestBody(3129892658L))),
        out("m3", factory1, depc, Some(Opcodes.CoffeeDeploy))),
      "T3" -> Seq(in("m3", factory1, depc, Some(Opcodes.CoffeeDeploy))),
      // CES leg: jetton transfer -> request -> deploy -> deposit internal
      // -> LP mint + success event
      "T4" -> Seq(
        in("m4", user, userCesWallet, Some(Opcodes.JettonTransfer),
          body = Some(cesXfer)),
        out("m5", userCesWallet, cesVaultWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T5" -> Seq(
        in("m5", userCesWallet, cesVaultWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m6", cesVaultWallet, cesVault, Some(Opcodes.JettonNotify))),
      "T6" -> Seq(
        in("m6", cesVaultWallet, cesVault, Some(Opcodes.JettonNotify)),
        out("m7", cesVault, factory2, Some(Opcodes.CoffeeDepositRequest),
          body = Some(requestBody(13876673279L)))),
      "T7" -> Seq(
        in("m7", cesVault, factory2, Some(Opcodes.CoffeeDepositRequest),
          body = Some(requestBody(13876673279L))),
        out("m8", factory2, depc, Some(Opcodes.CoffeeDeploy))),
      "T8" -> Seq(
        in("m8", factory2, depc, Some(Opcodes.CoffeeDeploy)),
        out("m9", depc, pool, Some(Opcodes.CoffeeDepositInternal))),
      "T9" -> Seq(
        in("m9", depc, pool, Some(Opcodes.CoffeeDepositInternal)),
        out("m10", pool, userLpWallet, Some(Opcodes.JettonInternalTransfer),
          body = Some(lpXfer), createdLt = 91),
        out("m11", pool, sink, Some(Opcodes.CoffeeDepositLiquiditySuccess),
          body = Some(successBody), createdLt = 92)),
      "T10" -> Seq(in("m10", pool, userLpWallet,
        Some(Opcodes.JettonInternalTransfer), body = Some(lpXfer))),
      "T11" -> Seq(in("m11", pool, sink,
        Some(Opcodes.CoffeeDepositLiquiditySuccess), body = Some(successBody))))
    val actions = Classifier.classify("gcd1", txs, msgs,
      jettonWallets = Map(userCesWallet -> ces, cesVaultWallet -> ces))
      .filter(_.`type` == "dex_deposit_liquidity")
    assert(actions.size == 2, s"got ${actions.map(_.`type`)}")
    // first part: TON leg, no completion
    val p1 = actions.find(_.destination.isEmpty).get
    assert(p1.source.contains(user))
    assert(p1.destination_secondary.contains(depc))
    val d1 = p1.dex_deposit_liquidity_data.get
    assert(d1.dex.contains("coffee"))
    assert(d1.vault_excesses.isEmpty)
    assert(d1.asset1.isEmpty)
    assert(d1.amount1.contains(BigDecimal(3129892658L)))
    assert(d1.user_jetton_wallet_1.isEmpty)
    assert(d1.amount2.isEmpty)
    assert(d1.target_asset_1.isEmpty)
    assert(d1.target_asset_2.contains(ces))
    assert(d1.lp_tokens_minted.isEmpty)
    // last part: CES leg with the pool + LP mint
    val p2 = actions.find(_.destination.nonEmpty).get
    assert(p2.source.contains(user))
    assert(p2.destination.contains(pool))
    assert(p2.destination_secondary.contains(depc))
    val d2 = p2.dex_deposit_liquidity_data.get
    assert(d2.amount1.isEmpty)
    assert(d2.asset2.contains(ces))
    assert(d2.amount2.contains(BigDecimal(13876673279L)))
    assert(d2.user_jetton_wallet_2.contains(userCesWallet))
    assert(d2.target_asset_1.contains(ces))
    assert(d2.target_asset_2.isEmpty)
    assert(d2.lp_tokens_minted.contains(BigDecimal(6589203740L)))
  }
}
