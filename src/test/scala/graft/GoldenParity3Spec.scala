package graft

import graft.classifier._
import graft.functions.Boc

/** Field-level golden parity, part 3 — the coffee.yaml long tail:
  * withdraw liquidity, create pool creator / create pool, create vault,
  * MEV-protect hold funds and the staking family
  * (indexer/tests/test_cases/coffee.yaml cases at lines 439-601; assert
  * semantics per tests/utils/generic_yaml_test.py:17-120).
  */
class GoldenParity3Spec extends SparkSpec {

  private def tx(hash: String, account: String, lt: Long): TxLite =
    TxLite(hash, account, lt, lt.toInt, "active", "active", false, None, None,
      0L, "ord")

  /** Deploying transaction (orig uninit → end active). */
  private def deployTx(hash: String, account: String, lt: Long): TxLite =
    tx(hash, account, lt).copy(origStatus = "uninit")

  private def in(h: String, src: String, dst: String, op: Option[Long],
      value: Long = 100, body: Option[String] = None): MsgLite =
    MsgLite(h, "in", Option(src), Option(dst), value, op, bounce = false,
      bounced = false, Some(1L), body)

  private def out(h: String, src: String, dst: String, op: Option[Long],
      value: Long = 100, createdLt: Long = 2L, body: Option[String] = None)
      : MsgLite =
    MsgLite(h, "out", Option(src), Option(dst), value, op, bounce = false,
      bounced = false, Some(createdLt), body)

  /** Full TEP-74 jetton transfer body, optionally with a forward-payload
    * ref cell. */
  private def transferBody(qid: Long, amount: Long, dest: String,
      resp: String, fwd: Long,
      forwardPayload: Option[Boc.Cell] = None): String = {
    val b = new Boc.Builder()
      .storeUint(BigInt(0x0f8a7ea5L), 32)
      .storeUint(BigInt(qid), 64)
      .storeCoins(BigInt(amount))
      .storeAddress(Some(dest))
      .storeAddress(Some(resp))
      .storeBit(false)
      .storeCoins(BigInt(fwd))
    forwardPayload match {
      case Some(p) => b.storeBit(true).storeRef(p)
      case None => b.storeBit(false)
    }
    Boc.serializeBase64(b.build())
  }

  /** TEP-74 burn#595f07bc qid amount response. */
  private def burnBody(amount: Long, resp: String): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x595f07bcL), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(amount)).storeAddress(Some(resp)).build())

  /** swap.coffee Asset: native$00 | jetton$01 chain:u8 hash:u256. */
  private def storeAsset(b: Boc.Builder, asset: Option[String]): Boc.Builder =
    asset match {
      case Some(a) =>
        val Array(wc, hex) = a.split(":")
        b.storeUint(BigInt(1), 2).storeUint(BigInt(wc.toInt), 8)
          .storeUint(BigInt(hex, 16), 256)
      case None => b.storeUint(BigInt(0), 2)
    }

  /** liquidity_withdrawal_event#c0ffee35 qid amount1 amount2 lp. */
  private def withdrawalEventBody(a1: Long, a2: Long, lp: Long): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xc0ffee35L), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(a1)).storeCoins(BigInt(a2)).storeCoins(BigInt(lp))
      .build())

  // ----------------------------------------------------------------------
  // Coffee withdraw liquidity (jetton - jetton)
  // ----------------------------------------------------------------------

  test("coffee.yaml parity ('Coffee withdraw liquidity (jetton - " +
      "jetton)'): burn-anchored withdraw with both payout sides, " +
      "event amounts and per-side wallet columns") {
    val sender = "0:" + "7B" * 32
    val lpWallet = "0:" + "37" * 32
    val pool = "0:" + "BC" * 32
    val asset1 = "0:" + "F6" * 32
    val asset2 = "0:" + "B1" * 32
    val dexJw1 = "0:" + "63" * 32
    val dexJw2 = "0:" + "FD" * 32
    val userJw1 = "0:" + "CE" * 32
    val userJw2 = "0:" + "A7" * 32
    val sink = "0:" + "05" * 32
    val burn = burnBody(3162270L, sender)
    val event = withdrawalEventBody(100000L, 100000000L, 3162270L)
    val xfer1 = transferBody(1, 100000L, sender, sender, 1)
    val xfer2 = transferBody(2, 100000000L, sender, sender, 1)
    val txs = Seq(tx("T1", lpWallet, 10), tx("T2", pool, 20),
      tx("T3", pool, 30), tx("T4", dexJw1, 40), tx("T5", userJw1, 50),
      tx("T6", pool, 60), tx("T7", dexJw2, 70), tx("T8", userJw2, 80),
      tx("T9", sink, 90))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", sender, lpWallet, Some(Opcodes.JettonBurn),
          body = Some(burn)),
        out("m2", lpWallet, pool, Some(Opcodes.JettonBurnNotification))),
      "T2" -> Seq(
        in("m2", lpWallet, pool, Some(Opcodes.JettonBurnNotification)),
        out("m3", pool, pool, Some(Opcodes.CoffeePayoutInternal),
          createdLt = 21),
        out("m4", pool, pool, Some(Opcodes.CoffeePayoutInternal),
          createdLt = 22),
        out("m5", pool, sink, Some(Opcodes.CoffeeLiquidityWithdrawalEvent),
          body = Some(event), createdLt = 23)),
      "T3" -> Seq(
        in("m3", pool, pool, Some(Opcodes.CoffeePayoutInternal)),
        out("m6", pool, dexJw1, Some(Opcodes.JettonTransfer),
          body = Some(xfer1))),
      "T4" -> Seq(
        in("m6", pool, dexJw1, Some(Opcodes.JettonTransfer),
          body = Some(xfer1)),
        out("m7", dexJw1, userJw1, Some(Opcodes.JettonInternalTransfer))),
      "T5" -> Seq(in("m7", dexJw1, userJw1,
        Some(Opcodes.JettonInternalTransfer))),
      "T6" -> Seq(
        in("m4", pool, pool, Some(Opcodes.CoffeePayoutInternal)),
        out("m8", pool, dexJw2, Some(Opcodes.JettonTransfer),
          body = Some(xfer2))),
      "T7" -> Seq(
        in("m8", pool, dexJw2, Some(Opcodes.JettonTransfer),
          body = Some(xfer2)),
        out("m9", dexJw2, userJw2, Some(Opcodes.JettonInternalTransfer))),
      "T8" -> Seq(in("m9", dexJw2, userJw2,
        Some(Opcodes.JettonInternalTransfer))),
      "T9" -> Seq(in("m5", pool, sink,
        Some(Opcodes.CoffeeLiquidityWithdrawalEvent), body = Some(event))))
    val a = Classifier.classify("gcw1", txs, msgs,
      jettonWallets = Map(lpWallet -> pool, dexJw1 -> asset1,
        dexJw2 -> asset2))
      .find(_.`type` == "dex_withdraw_liquidity").get
    assert(a.success)
    assert(a.source.contains(sender))
    assert(a.source_secondary.contains(lpWallet))
    assert(a.destination.contains(pool))
    assert(a.asset.contains(pool)) // lp_asset = the pool's LP master
    val d = a.dex_withdraw_liquidity_data.get
    assert(d.dex.contains("coffee"))
    assert(d.lp_tokens_burnt.contains(BigDecimal(3162270L)))
    assert(d.amount1.contains(BigDecimal(100000L)))
    assert(d.asset1_out.contains(asset1))
    assert(d.dex_wallet_1.contains(pool))
    assert(d.dex_jetton_wallet_1.contains(dexJw1))
    assert(d.user_jetton_wallet_1.contains(userJw1))
    assert(d.amount2.contains(BigDecimal(100000000L)))
    assert(d.asset2_out.contains(asset2))
    assert(d.dex_wallet_2.contains(pool))
    assert(d.dex_jetton_wallet_2.contains(dexJw2))
    assert(d.user_jetton_wallet_2.contains(userJw2))
  }

  // ----------------------------------------------------------------------
  // Coffee create pool creator / create pool
  // ----------------------------------------------------------------------

  /** create_pool_jetton#c0ffee11 params creation_params payload for a
    * funding jetton transfer. */
  private def createPoolPayload(first: Option[String], second: Option[String],
      recipient: String): Boc.Cell = {
    val b = new Boc.Builder().storeUint(BigInt(0xc0ffee11L), 32)
    storeAsset(b, first)
    storeAsset(b, second)
    b.storeUint(BigInt(0), 3) // amm: constant_product
      .storeBit(false) // no amm_settings
      .storeAddress(Some(recipient))
      .storeBit(false) // use_recipient_on_failure
      .storeBit(false) // no notification_data
      .build()
  }

  /** create_pool_native#c0ffee02 qid amount params creation_params. */
  private def createPoolNativeBody(amount: Long, first: Option[String],
      second: Option[String], recipient: String): String = {
    val b = new Boc.Builder()
      .storeUint(BigInt(0xc0ffee02L), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(amount))
    storeAsset(b, first)
    storeAsset(b, second)
    b.storeUint(BigInt(0), 3).storeBit(false)
      .storeAddress(Some(recipient)).storeBit(false).storeBit(false)
    Boc.serializeBase64(b.build())
  }

  /** create_pool_request#c0ffee25 qid amount1 amount2 tx_initiator ^ ^ . */
  private def poolRequestBody(a1: Long, a2: Long, initiator: String): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xc0ffee25L), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(a1)).storeCoins(BigInt(a2))
      .storeAddress(Some(initiator))
      .storeRef(new Boc.Builder().build())
      .storeRef(new Boc.Builder().build()).build())

  /** deposit_liquidity_successful_event#c0ffee33 qid a1 a2 lp. */
  private def depositSuccessBody(a1: Long, a2: Long, lp: Long): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xc0ffee33L), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(a1)).storeCoins(BigInt(a2)).storeCoins(BigInt(lp))
      .build())

  test("coffee.yaml parity ('Coffee create pool creator (only create)'): " +
      "jetton-funded creator with provided asset, pool-param assets and " +
      "the deposit recipient") {
    val sender = "0:" + "F9" * 32
    val senderWallet = "0:" + "3C" * 32
    val provided = "0:" + "A5" * 32
    val creator = "0:" + "2B" * 32
    val paramFirst = "0:" + "72" * 32
    val factoryWallet = "0:" + "4E" * 32
    val factory = "0:" + "FA" * 32
    val xfer = transferBody(1, 2000000000L, factory, sender, 1,
      forwardPayload = Some(createPoolPayload(
        Some(paramFirst), Some(provided), sender)))
    val txs = Seq(tx("T1", senderWallet, 10), tx("T2", factoryWallet, 20),
      tx("T3", factory, 30), tx("T4", factory, 40),
      deployTx("T5", creator, 50))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", sender, senderWallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer)),
        out("m2", senderWallet, factoryWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", senderWallet, factoryWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", factoryWallet, factory, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", factoryWallet, factory, Some(Opcodes.JettonNotify)),
        out("m4", factory, factory, Some(Opcodes.CoffeeCreatePoolCreator))),
      "T4" -> Seq(
        in("m4", factory, factory, Some(Opcodes.CoffeeCreatePoolCreator)),
        out("m5", factory, creator, Some(Opcodes.CoffeeDeploy))),
      "T5" -> Seq(in("m5", factory, creator, Some(Opcodes.CoffeeDeploy))))
    val a = Classifier.classify("gcp1", txs, msgs,
      jettonWallets = Map(senderWallet -> provided))
      .find(_.`type` == "coffee_create_pool_creator").get
    assert(a.success)
    assert(a.source.contains(sender))
    assert(a.source_secondary.contains(senderWallet))
    assert(a.asset.contains(provided))
    assert(a.destination_secondary.contains(creator))
    assert(a.destination.contains(sender)) // deposit_recipient
    assert(a.asset2.contains(paramFirst))
    assert(a.asset2_secondary.contains(provided))
  }

  test("coffee.yaml parity ('Coffee create pool (full and simple)'): " +
      "top-level native creator plus the completed coffee_create_pool " +
      "with provided-asset-first ordering and lp_tokens_minted") {
    val user = "0:" + "D9" * 32
    val userWallet = "0:" + "4A" * 32 // jetton-side sender wallet
    val creator = "0:" + "DF" * 32
    val jetton = "0:" + "44" * 32
    val pool = "0:" + "57" * 32
    val factory = "0:" + "FA" * 32
    val factoryWallet = "0:" + "4E" * 32
    val poolLpWallet = "0:" + "99" * 32
    // leg 1: native create (params: first=native, second=jetton)
    val nativeBody = createPoolNativeBody(2005112716L, None, Some(jetton), user)
    // leg 2: jetton transfer funding the same creator
    val xfer = transferBody(2, 1000000000000000L, factory, user, 1,
      forwardPayload = Some(createPoolPayload(None, Some(jetton), user)))
    val request = poolRequestBody(2005112716L, 1000000000000000L, user)
    val success = depositSuccessBody(2005112716L, 1000000000000000L,
      1416020025694L)
    val txs = Seq(
      tx("N1", factory, 10), tx("N2", factory, 20), deployTx("N3", creator, 30),
      tx("T1", userWallet, 40), tx("T2", factoryWallet, 50),
      tx("T3", factory, 60), tx("T4", factory, 70), tx("T5", creator, 80),
      tx("T6", factory, 90), deployTx("T7", pool, 100),
      tx("T8", poolLpWallet, 110), tx("T9", factory, 120))
    val msgs = Map(
      // native leg: user → factory create_pool_native → creator deploy
      "N1" -> Seq(
        in("n1", user, factory, Some(Opcodes.CoffeeCreatePoolNative),
          body = Some(nativeBody)),
        out("n2", factory, factory, Some(Opcodes.CoffeeCreatePoolCreator))),
      "N2" -> Seq(
        in("n2", factory, factory, Some(Opcodes.CoffeeCreatePoolCreator)),
        out("n3", factory, creator, Some(Opcodes.CoffeeDeploy))),
      "N3" -> Seq(in("n3", factory, creator, Some(Opcodes.CoffeeDeploy))),
      // jetton leg funds the creator, which emits the pool request
      "T1" -> Seq(
        in("m1", user, userWallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer)),
        out("m2", userWallet, factoryWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", userWallet, factoryWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", factoryWallet, factory, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", factoryWallet, factory, Some(Opcodes.JettonNotify)),
        out("m4", factory, factory, Some(Opcodes.CoffeeCreatePoolCreator))),
      "T4" -> Seq(
        in("m4", factory, factory, Some(Opcodes.CoffeeCreatePoolCreator)),
        out("m5", factory, creator, Some(Opcodes.CoffeeDeploy))),
      "T5" -> Seq(
        in("m5", factory, creator, Some(Opcodes.CoffeeDeploy)),
        out("m6", creator, factory, Some(Opcodes.CoffeeCreatePoolRequest),
          body = Some(request))),
      "T6" -> Seq(
        in("m6", creator, factory, Some(Opcodes.CoffeeCreatePoolRequest),
          body = Some(request)),
        out("m7", factory, pool, Some(Opcodes.CoffeeDeploy))),
      "T7" -> Seq(
        in("m7", factory, pool, Some(Opcodes.CoffeeDeploy)),
        out("m8", pool, poolLpWallet, Some(Opcodes.JettonInternalTransfer),
          createdLt = 101),
        out("m9", pool, factory, Some(Opcodes.CoffeeDepositLiquiditySuccess),
          body = Some(success), createdLt = 102)),
      "T8" -> Seq(in("m8", pool, poolLpWallet,
        Some(Opcodes.JettonInternalTransfer))),
      "T9" -> Seq(in("m9", pool, factory,
        Some(Opcodes.CoffeeDepositLiquiditySuccess), body = Some(success))))
    val actions = Classifier.classify("gcp2", txs, msgs,
      jettonWallets = Map(userWallet -> jetton))
    // YAML block 1: the surviving creator action with no ancestor — the
    // native leg (asset null, pool params first=native)
    val creatorA = actions.filter(_.`type` == "coffee_create_pool_creator")
      .find(_.ancestor_type.isEmpty).get
    assert(creatorA.source.contains(user))
    assert(creatorA.asset.isEmpty)
    assert(creatorA.destination_secondary.contains(creator))
    assert(creatorA.destination.contains(user))
    assert(creatorA.asset2.isEmpty)
    assert(creatorA.asset2_secondary.contains(jetton))
    // YAML block 2: the completed pool
    val poolA = actions.find(_.`type` == "coffee_create_pool").get
    assert(poolA.source.contains(user))
    assert(poolA.source_secondary.contains(userWallet))
    assert(poolA.destination.contains(pool))
    assert(poolA.asset.contains(jetton))
    assert(poolA.asset2.isEmpty)
    val d = poolA.coffee_create_pool_data.get
    assert(d.amount_1.contains(BigDecimal(1000000000000000L)))
    assert(d.amount_2.contains(BigDecimal(2005112716L)))
    assert(d.lp_tokens_minted.contains(BigDecimal(1416020025694L)))
  }

  // ----------------------------------------------------------------------
  // Coffee create vault / MEV protect
  // ----------------------------------------------------------------------

  test("coffee.yaml parity ('Coffee create vault'): source, the DEPLOY " +
      "destination as the vault and the asset from the create body") {
    val sender = "0:" + "89" * 32
    val vault = "0:" + "A4" * 32
    val asset = "0:" + "A9" * 32
    val factory = "0:" + "FA" * 32
    val b = new Boc.Builder()
      .storeUint(BigInt(0xc0ffee06L), 32).storeUint(BigInt(1), 64)
    storeAsset(b, Some(asset))
    val body = Boc.serializeBase64(b.build())
    val txs = Seq(tx("T1", factory, 10), deployTx("T2", vault, 20),
      tx("T3", vault, 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", sender, factory, Some(Opcodes.CoffeeCreateVault),
          body = Some(body)),
        out("m2", factory, vault, Some(Opcodes.CoffeeDeploy))),
      "T2" -> Seq(
        in("m2", factory, vault, Some(Opcodes.CoffeeDeploy)),
        out("m3", vault, vault, Some(Opcodes.CoffeeCreateVaultInternal))),
      "T3" -> Seq(in("m3", vault, vault,
        Some(Opcodes.CoffeeCreateVaultInternal))))
    val a = Classifier.classify("gcv1", txs, msgs)
      .find(_.`type` == "coffee_create_vault").get
    assert(a.success)
    assert(a.source.contains(sender))
    assert(a.destination.contains(vault))
    assert(a.asset.contains(asset))
  }

  test("coffee.yaml parity ('Coffee mev protect hold funds (TON)'): " +
      "null asset and wallets, amount = the held message value") {
    val sender = "0:" + "B7" * 32
    val mev = "0:" + "05" * 32
    val txs = Seq(tx("T1", mev, 10))
    val msgs = Map("T1" -> Seq(
      in("m1", sender, mev, Some(Opcodes.CoffeeMevProtectHoldFunds),
        value = 15590000000L)))
    val a = Classifier.classify("gmev1", txs, msgs)
      .find(_.`type` == "coffee_mev_protect_hold_funds").get
    assert(a.success)
    assert(a.source.contains(sender))
    assert(a.destination.contains(mev))
    assert(a.asset.isEmpty)
    assert(a.source_secondary.isEmpty)
    assert(a.destination_secondary.isEmpty)
    assert(a.amount.contains(BigDecimal(15590000000L)))
  }

  // ----------------------------------------------------------------------
  // Coffee staking
  // ----------------------------------------------------------------------

  test("coffee.yaml parity ('Coffee staking deposit'): wallet " +
      "secondaries, the master asset, amount = the transferred value " +
      "and the minted position item") {
    val user = "0:" + "62" * 32
    val userWallet = "0:" + "E2" * 32
    val poolWallet = "0:" + "7C" * 32
    val pool = "0:" + "8C" * 32
    val receiver = "0:" + "77" * 32 // the staking vault owning poolWallet
    val item = "0:" + "B6" * 32 // the minted position NFT
    val asset = "0:" + "A5" * 32
    val xfer = transferBody(1, 54999439792L, receiver, user, 1)
    val txs = Seq(tx("T1", userWallet, 10), tx("T2", poolWallet, 20),
      tx("T3", receiver, 30), tx("T4", pool, 40),
      deployTx("T5", item, 50))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, userWallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer)),
        out("m2", userWallet, poolWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", userWallet, poolWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", poolWallet, receiver, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", poolWallet, receiver, Some(Opcodes.JettonNotify)),
        out("m4", receiver, pool, Some(Opcodes.CoffeeStakingDeposit))),
      "T4" -> Seq(
        in("m4", receiver, pool, Some(Opcodes.CoffeeStakingDeposit)),
        out("m5", pool, item, None)),
      "T5" -> Seq(in("m5", pool, item, None)))
    val a = Classifier.classify("gcs1", txs, msgs,
      interfaces = Map(item -> "nft_item"),
      jettonWallets = Map(userWallet -> asset),
      nftItems = Map(item -> NftItemInfo(Some("1317"), Some(pool))))
      .find(_.`type` == "coffee_staking_deposit").get
    assert(a.success)
    assert(a.source.contains(user))
    assert(a.source_secondary.contains(userWallet))
    assert(a.destination_secondary.contains(poolWallet))
    assert(a.destination.contains(pool))
    assert(a.amount.contains(BigDecimal(54999439792L)))
    assert(a.asset.contains(asset))
    val d = a.coffee_staking_deposit_data.get
    assert(d.minted_item_address.contains(item))
    assert(d.minted_item_index.contains("1317"))
  }

  /** staking_position_withdraw_2#cb03bfaf qid nft_id owner points
    * ^[wallet amount]. */
  private def withdraw2Body(nftId: Long, owner: String, points: Long,
      wallet: String, amount: Long): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xcb03bfafL), 32).storeUint(BigInt(1), 64)
      .storeUint(BigInt(nftId), 64).storeAddress(Some(owner))
      .storeCoins(BigInt(points))
      .storeRef(new Boc.Builder().storeAddress(Some(wallet))
        .storeCoins(BigInt(amount)).build()).build())

  /** staking_position_withdraw_3#cb03bfaf qid wallet amount owner. */
  private def withdraw3Body(wallet: String, amount: Long, owner: String)
      : String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xcb03bfafL), 32).storeUint(BigInt(1), 64)
      .storeAddress(Some(wallet)).storeCoins(BigInt(amount))
      .storeAddress(Some(owner)).build())

  test("coffee.yaml parity ('Coffee staking withdraw'): owner source, " +
      "the withdraw_2 sender as destination, payout wallets and " +
      "nft/points detail") {
    val owner = "0:" + "D6" * 32
    val nft = "0:" + "BB" * 32
    val manager = "0:" + "8C" * 32
    val poolWallet = "0:" + "7C" * 32
    val userWallet = "0:" + "2E" * 32
    val asset = "0:" + "A5" * 32
    val w1 = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xcb03bfafL), 32).storeUint(BigInt(1), 64).build())
    val w2 = withdraw2Body(451L, owner, 5945779396400L, poolWallet,
      59457793964L)
    val w3 = withdraw3Body(poolWallet, 59457793964L, owner)
    val xfer = transferBody(1, 59457793964L, owner, owner, 1)
    val txs = Seq(tx("T1", nft, 10), tx("T2", manager, 20),
      tx("T3", manager, 30), tx("T4", poolWallet, 40),
      tx("T5", userWallet, 50))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", owner, nft, Some(Opcodes.CoffeeStakingWithdraw),
          body = Some(w1)),
        out("m2", nft, manager, Some(Opcodes.CoffeeStakingWithdraw),
          body = Some(w2))),
      "T2" -> Seq(
        in("m2", nft, manager, Some(Opcodes.CoffeeStakingWithdraw),
          body = Some(w2)),
        out("m3", manager, manager, Some(Opcodes.CoffeeStakingWithdraw),
          body = Some(w3))),
      "T3" -> Seq(
        in("m3", manager, manager, Some(Opcodes.CoffeeStakingWithdraw),
          body = Some(w3)),
        out("m4", manager, poolWallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer))),
      "T4" -> Seq(
        in("m4", manager, poolWallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer)),
        out("m5", poolWallet, userWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T5" -> Seq(in("m5", poolWallet, userWallet,
        Some(Opcodes.JettonInternalTransfer))))
    val a = Classifier.classify("gcs2", txs, msgs,
      jettonWallets = Map(poolWallet -> asset))
      .find(_.`type` == "coffee_staking_withdraw").get
    assert(a.success)
    assert(a.source.contains(owner))
    assert(a.destination.contains(nft)) // the withdraw_2 sender
    assert(a.asset.contains(asset))
    assert(a.amount.contains(BigDecimal(59457793964L)))
    assert(a.source_secondary.contains(userWallet))
    assert(a.destination_secondary.contains(poolWallet))
    val d = a.coffee_staking_withdraw_data.get
    assert(d.nft_address.contains(nft))
    assert(d.nft_index.contains("451"))
    assert(d.points.contains(BigDecimal(5945779396400L)))
  }

  test("coffee.yaml parity ('Coffee staking claim rewards (another)'): " +
      "pool source (the admin is not stored), body-decoded pool wallet " +
      "and receiver, transfer-side recipient wallet") {
    val admin = "0:" + "AD" * 32
    val pool = "0:" + "8C" * 32
    val recipient = "0:" + "29" * 32
    val poolWallet = "0:" + "61" * 32
    val recipientWallet = "0:" + "37" * 32
    val asset = "0:" + "B1" * 32
    val claim = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xb30c7310L), 32).storeUint(BigInt(1), 64)
      .storeAddress(Some(poolWallet)).storeCoins(BigInt(17686745L))
      .storeAddress(Some(recipient)).storeBit(false).build())
    val xfer = transferBody(1, 17686745L, recipient, recipient, 1)
    val txs = Seq(tx("T1", pool, 10), tx("T2", poolWallet, 20),
      tx("T3", recipientWallet, 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", admin, pool, Some(Opcodes.CoffeeStakingClaimRewards),
          body = Some(claim)),
        out("m2", pool, poolWallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer))),
      "T2" -> Seq(
        in("m2", pool, poolWallet, Some(Opcodes.JettonTransfer),
          body = Some(xfer)),
        out("m3", poolWallet, recipientWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "T3" -> Seq(in("m3", poolWallet, recipientWallet,
        Some(Opcodes.JettonInternalTransfer))))
    val a = Classifier.classify("gcs3", txs, msgs,
      jettonWallets = Map(poolWallet -> asset))
      .find(_.`type` == "coffee_staking_claim_rewards").get
    assert(a.success)
    assert(a.source.contains(pool))
    assert(a.destination.contains(recipient))
    assert(a.asset.contains(asset))
    assert(a.amount.contains(BigDecimal(17686745L)))
    assert(a.source_secondary.contains(poolWallet))
    assert(a.destination_secondary.contains(recipientWallet))
  }
}
