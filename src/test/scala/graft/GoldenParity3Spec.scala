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
        userJw1 -> asset1, dexJw2 -> asset2, userJw2 -> asset2))
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
      jettonWallets = Map(senderWallet -> provided,
        factoryWallet -> provided))
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
      jettonWallets = Map(userWallet -> jetton, factoryWallet -> jetton))
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
      jettonWallets = Map(userWallet -> asset, poolWallet -> asset),
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

  // ----------------------------------------------------------------------
  // nft.yaml — Fragment and auction purchases
  // ----------------------------------------------------------------------

  test("nft.yaml parity ('Fragment purchase'): bare ownership-assigned " +
      "with TeleitemBidInfo — fragment marketplace, bid price, OA query " +
      "id and raw forward payload; null forward_amount/response") {
    val prevOwner = "0:" + "C2" * 32
    val winner = "0:" + "DE" * 32
    val item = "0:" + "64" * 32
    val coll = "0:" + "80" * 32
    val feeDst = "0:" + "11" * 32
    // forward payload: teleitem_bid_info#38127de1 bid:Coins bid_ts:u32
    val bidInfo = new Boc.Builder()
      .storeUint(BigInt(0x38127de1L), 32)
      .storeCoins(BigInt(111000000000L)).storeUint(BigInt(1700000000L), 32)
      .build()
    val oa = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x05138d91L), 32)
      .storeUint(BigInt(42799341000003L), 64)
      .storeAddress(Some(prevOwner))
      .storeBit(true).storeRef(bidInfo).build())
    val txs = Seq(tx("T1", item, 10), tx("T2", winner, 20),
      tx("T3", feeDst, 30), tx("T4", prevOwner, 40))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", null, item, None).copy(source = None),
        out("m2", item, winner, Some(Opcodes.NftOwnershipAssigned),
          body = Some(oa), createdLt = 11),
        out("m3", item, feeDst, Some(Opcodes.AuctionFillUp),
          value = 5550000000L, createdLt = 12),
        out("m4", item, prevOwner, Some(Opcodes.AuctionFillUp),
          value = 105000000000L, createdLt = 13)),
      "T2" -> Seq(in("m2", item, winner, Some(Opcodes.NftOwnershipAssigned),
        body = Some(oa))),
      "T3" -> Seq(in("m3", item, feeDst, Some(Opcodes.AuctionFillUp),
        value = 5550000000L)),
      "T4" -> Seq(in("m4", item, prevOwner, Some(Opcodes.AuctionFillUp),
        value = 105000000000L)))
    val a = Classifier.classify("gfr1", txs, msgs,
      interfaces = Map(item -> "teleitem"),
      nftItems = Map(item -> NftItemInfo(Some("3"), Some(coll))))
      .find(_.`type` == "nft_transfer").get
    assert(a.source.contains(prevOwner))
    assert(a.destination.contains(winner))
    assert(a.asset_secondary.contains(item))
    assert(a.asset.contains(coll))
    val d = a.nft_transfer_data.get
    assert(d.query_id.contains("42799341000003"))
    assert(d.is_purchase.contains(true))
    assert(d.price.contains(BigDecimal(111000000000L)))
    assert(d.forward_amount.isEmpty)
    assert(d.custom_payload.isEmpty)
    assert(d.forward_payload.contains(Boc.serializeBase64(bidInfo)))
    assert(d.response_destination.isEmpty)
    assert(d.marketplace.contains("fragment"))
    assert(d.real_prev_owner.isEmpty)
    // the action spans the bid leg, the OA and both fill-up payouts
    assert(Set("T1", "T2", "T3", "T4").subsetOf(a.tx_hashes.toSet),
      s"tx span: ${a.tx_hashes}")
  }

  test("nft.yaml parity ('Getgems auction purchase'): auction-dim row " +
      "enriches the transfer — getgems marketplace, last-bid price, " +
      "seller real_prev_owner and marketplace address") {
    val auction = "0:" + "41" * 32
    val winner = "0:" + "35" * 32
    val item = "0:" + "14" * 32
    val coll = "0:" + "5A" * 32
    val seller = "0:" + "CF" * 32
    val mp = "0:" + "58" * 32
    val fwdPayload = new Boc.Builder()
      .storeUint(BigInt(0x4cacb9cdL), 32).build()
    val xfer = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x5fcc3d14L), 32)
      .storeUint(BigInt(59258595000001L), 64)
      .storeAddress(Some(winner))
      .storeAddress(Some(seller)) // response_destination = the seller
      .storeBit(false)
      .storeCoins(BigInt(1))
      .storeBit(true).storeRef(fwdPayload)
      .build())
    val txs = Seq(tx("T1", auction, 10), tx("T2", item, 20),
      tx("T3", winner, 30), tx("T4", seller, 40))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", null, auction, None).copy(source = None),
        out("m2", auction, item, Some(Opcodes.NftTransfer),
          body = Some(xfer), createdLt = 11),
        out("m3", auction, seller, None, value = 37100000000L,
          createdLt = 12)),
      "T2" -> Seq(
        in("m2", auction, item, Some(Opcodes.NftTransfer),
          body = Some(xfer)),
        out("m4", item, winner, Some(Opcodes.NftOwnershipAssigned))),
      "T3" -> Seq(in("m4", item, winner,
        Some(Opcodes.NftOwnershipAssigned))),
      "T4" -> Seq(in("m3", auction, seller, None, value = 37100000000L)))
    val actions = Classifier.classify("gau1", txs, msgs,
      interfaces = Map(
        auction -> s"nft_auction|$seller|$mp|$item|37970000000"),
      nftItems = Map(item -> NftItemInfo(Some("9"), Some(coll))))
    val t = actions.find(_.`type` == "nft_transfer").get
    assert(t.success)
    assert(t.source.contains(auction))
    assert(t.destination.contains(winner))
    assert(t.asset_secondary.contains(item))
    assert(t.asset.contains(coll))
    val td = t.nft_transfer_data.get
    assert(td.query_id.contains("59258595000001"))
    assert(td.is_purchase.contains(true))
    assert(td.price.contains(BigDecimal(37970000000L))) // the last bid
    assert(td.forward_amount.contains(BigDecimal(1)))
    assert(td.custom_payload.isEmpty)
    assert(td.forward_payload.contains(Boc.serializeBase64(fwdPayload)))
    assert(td.response_destination.contains(seller))
    assert(td.marketplace.contains("getgems"))
    assert(td.real_prev_owner.contains(seller))
    assert(td.marketplace_address.contains(mp))
    // accounts cover the auction, seller, item and winner ('Getgems
    // auction purchase 2' pins the same four-way span)
    val p = actions.find(_.`type` == "nft_purchase").get
    for (acct <- Seq(auction, seller, item, winner))
      assert(p.accounts.contains(acct), s"missing $acct in ${p.accounts}")
  }

  // ----------------------------------------------------------------------
  // Tonco deposit liquidity
  // ----------------------------------------------------------------------

  /** POOLV3_FUND_ACCOUNT#4468de77 payload: other_wallet amount0 amount1. */
  private def fundPayload(otherWallet: String, a0: Long, a1: Long): Boc.Cell =
    new Boc.Builder().storeUint(BigInt(0x4468de77L), 32)
      .storeAddress(Some(otherWallet)).storeCoins(BigInt(a0))
      .storeCoins(BigInt(a1)).build()

  /** transfer_notification#7362d09c qid amount sender payload-in-ref. */
  private def notifyBody(amount: Long, sender: String,
      payload: Boc.Cell): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x7362d09cL), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(amount)).storeAddress(Some(sender))
      .storeBit(true).storeRef(payload).build())

  /** ACCOUNTV3_ADD_LIQUIDITY#3ebe5431 qid n0 n1 e0 e1 liq tl tu. */
  private def addLiquidityBody(n0: Long, n1: Long, e0: Long, e1: Long,
      liq: Long, tl: Int, tu: Int): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x3ebe5431L), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(n0)).storeCoins(BigInt(n1))
      .storeCoins(BigInt(e0)).storeCoins(BigInt(e1))
      .storeUint(BigInt(liq), 128)
      .storeInt(BigInt(tl), 24).storeInt(BigInt(tu), 24).build())

  /** POSITIONNFTV3_POSITION_INIT#d5ecca2a qid user liq tl tu ^[f0 f1 idx]. */
  private def positionInitBody(user: String, liq: Long, tl: Int, tu: Int,
      nftIndex: Long): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xd5ecca2aL), 32).storeUint(BigInt(1), 64)
      .storeAddress(Some(user)).storeUint(BigInt(liq), 128)
      .storeInt(BigInt(tl), 24).storeInt(BigInt(tu), 24)
      .storeRef(new Boc.Builder()
        .storeUint(BigInt(0), 256).storeUint(BigInt(0), 256)
        .storeUint(BigInt(nftIndex), 64).build()).build())

  /** pTON ton_transfer#01f3835d qid ton_amount refund. */
  private def ptonBody(amount: Long, refund: String): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x01f3835dL), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(amount)).storeAddress(Some(refund)).build())

  test("tonco.yaml parity ('Tonco deposit liquidity (normal)'): per-leg " +
      "dex_deposit_liquidity actions — incomplete TON leg (null asset1, " +
      "no wallets) and the completing jetton leg with compacted " +
      "amounts, position NFT and both vault excesses") {
    val user = "0:" + "40" * 32
    val pool = "0:" + "F6" * 32
    val account = "0:" + "55" * 32
    val router = "0:" + "12" * 32
    val routerPton = "0:" + "87" * 32 // router's pTON (wTTON) wallet
    val routerUsdt = "0:" + "9A" * 32 // router's USDT wallet
    val userUsdt = "0:" + "2C" * 32 // 0:2BC2-analogue sender wallet
    val usdt = "0:" + "B1" * 32
    val item = "0:" + "A7" * 32
    val tl = -57180; val tu = -52980
    // TON leg: pton transfer → notify(payload other=USDT wallet) →
    // fund → add (newAmount0 > 0 → first slot, no completion)
    val notifyTon = notifyBody(3029999999827L, user,
      fundPayload(routerUsdt, 3029999999827L, 0L))
    val addTon = addLiquidityBody(3029999999827L, 0L,
      2999999999829L, 5708578661L, 0L, tl, tu)
    // jetton leg: USDT transfer (payload other=pTON wallet) → fund →
    // add (newAmount0 = 0 → second slot) + mint-and-refund completion
    val xfer = transferBody(2, 5765664447L, router, user, 1,
      forwardPayload = Some(fundPayload(routerPton, 0L, 5765664447L)))
    val addJet = addLiquidityBody(0L, 5765664447L,
      2999999999829L, 5708578661L, 0L, tl, tu)
    val posInit = positionInitBody(user, 1398855824493L, tl, tu, 3086L)
    val excessTon = transferBody(3, 29999999998L, user, user, 1)
    val pton = ptonBody(29999999998L, user)
    val excessUsdt = transferBody(4, 57085786L, user, user, 1)
    val txs = Seq(
      tx("P1", router, 10), tx("P2", pool, 20), tx("P3", account, 30),
      tx("T1", userUsdt, 40), tx("T2", routerUsdt, 50), tx("T3", router, 60),
      tx("T4", pool, 70), tx("T5", account, 80), tx("T6", pool, 90),
      tx("T7", router, 100), deployTx("T8", item, 110),
      tx("T9", routerPton, 120), tx("TA", user, 130),
      tx("TB", routerUsdt, 140), tx("TC", userUsdt, 150))
    val msgs = Map(
      // --- TON leg
      "P1" -> Seq(
        in("p1", routerPton, router, Some(Opcodes.JettonNotify),
          body = Some(notifyTon)),
        out("p2", router, pool, Some(Opcodes.ToncoPoolV3FundAccount))),
      "P2" -> Seq(
        in("p2", router, pool, Some(Opcodes.ToncoPoolV3FundAccount)),
        out("p3", pool, account, Some(Opcodes.ToncoAccountV3AddLiquidity),
          body = Some(addTon))),
      "P3" -> Seq(in("p3", pool, account,
        Some(Opcodes.ToncoAccountV3AddLiquidity), body = Some(addTon))),
      // --- jetton leg
      "T1" -> Seq(
        in("m1", user, userUsdt, Some(Opcodes.JettonTransfer),
          body = Some(xfer)),
        out("m2", userUsdt, routerUsdt, Some(Opcodes.JettonInternalTransfer))),
      "T2" -> Seq(
        in("m2", userUsdt, routerUsdt, Some(Opcodes.JettonInternalTransfer)),
        out("m3", routerUsdt, router, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(
        in("m3", routerUsdt, router, Some(Opcodes.JettonNotify)),
        out("m4", router, pool, Some(Opcodes.ToncoPoolV3FundAccount))),
      "T4" -> Seq(
        in("m4", router, pool, Some(Opcodes.ToncoPoolV3FundAccount)),
        out("m5", pool, account, Some(Opcodes.ToncoAccountV3AddLiquidity),
          body = Some(addJet))),
      "T5" -> Seq(
        in("m5", pool, account, Some(Opcodes.ToncoAccountV3AddLiquidity),
          body = Some(addJet)),
        out("m6", account, pool, Some(Opcodes.ToncoPoolV3MintAndRefund))),
      "T6" -> Seq(
        in("m6", account, pool, Some(Opcodes.ToncoPoolV3MintAndRefund)),
        out("m7", pool, router, Some(Opcodes.ToncoRouterV3PayTo),
          createdLt = 91),
        out("m8", pool, item, Some(Opcodes.ToncoPositionInit),
          body = Some(posInit), createdLt = 92)),
      "T7" -> Seq(
        in("m7", pool, router, Some(Opcodes.ToncoRouterV3PayTo)),
        out("m9", router, routerPton, Some(Opcodes.JettonTransfer),
          body = Some(excessTon), createdLt = 101),
        out("mB", router, routerUsdt, Some(Opcodes.JettonTransfer),
          body = Some(excessUsdt), createdLt = 102)),
      "T8" -> Seq(in("m8", pool, item, Some(Opcodes.ToncoPositionInit),
        body = Some(posInit))),
      // excess 1: pTON payout (native)
      "T9" -> Seq(
        in("m9", router, routerPton, Some(Opcodes.JettonTransfer),
          body = Some(excessTon)),
        out("mA", routerPton, user, Some(Opcodes.PTonTransferOp),
          body = Some(pton))),
      "TA" -> Seq(in("mA", routerPton, user, Some(Opcodes.PTonTransferOp),
        body = Some(pton))),
      // excess 2: plain USDT payout
      "TB" -> Seq(
        in("mB", router, routerUsdt, Some(Opcodes.JettonTransfer),
          body = Some(excessUsdt)),
        out("mC", routerUsdt, userUsdt,
          Some(Opcodes.JettonInternalTransfer))),
      "TC" -> Seq(in("mC", routerUsdt, userUsdt,
        Some(Opcodes.JettonInternalTransfer))))
    val actions = Classifier.classify("gtd1", txs, msgs,
      jettonWallets = Map(routerPton -> "TON", routerUsdt -> usdt,
        userUsdt -> usdt))
      .filter(_.`type` == "dex_deposit_liquidity")
    assert(actions.size == 2, s"got ${actions.map(_.`type`)}")
    // YAML selector: lp_tokens_minted == None → the TON leg
    val tonLeg = actions
      .find(_.dex_deposit_liquidity_data.get.lp_tokens_minted.isEmpty).get
    assert(tonLeg.source.contains(user))
    assert(tonLeg.source_secondary.isEmpty)
    assert(tonLeg.destination.contains(pool))
    assert(tonLeg.destination_secondary.contains(account))
    assert(tonLeg.success)
    val td = tonLeg.dex_deposit_liquidity_data.get
    assert(td.vault_excesses.isEmpty)
    assert(td.target_amount_1.contains(BigDecimal(2999999999829L)))
    assert(td.target_amount_2.contains(BigDecimal(5708578661L)))
    assert(td.tick_lower.contains("-57180"))
    assert(td.tick_upper.contains("-52980"))
    assert(td.nft_index.isEmpty && td.nft_address.isEmpty)
    assert(td.amount1.contains(BigDecimal(3029999999827L)))
    assert(td.asset1.isEmpty) // TON
    assert(td.user_jetton_wallet_1.isEmpty)
    assert(td.amount2.isEmpty && td.asset2.isEmpty)
    assert(td.user_jetton_wallet_2.isEmpty)
    // YAML selector: lp_tokens_minted != None → the completing leg
    val jetLeg = actions
      .find(_.dex_deposit_liquidity_data.get.lp_tokens_minted.nonEmpty).get
    assert(jetLeg.source.contains(user))
    assert(jetLeg.source_secondary.contains(userUsdt))
    assert(jetLeg.destination.contains(pool))
    assert(jetLeg.destination_secondary.contains(account))
    val jd = jetLeg.dex_deposit_liquidity_data.get
    assert(jd.vault_excesses.map(e => (e.asset, e.amount)) == Seq(
      (None, Some(BigDecimal(29999999998L))),
      (Some(usdt), Some(BigDecimal(57085786L)))))
    assert(jd.target_amount_1.contains(BigDecimal(2999999999829L)))
    assert(jd.target_amount_2.contains(BigDecimal(5708578661L)))
    assert(jd.lp_tokens_minted.contains(BigDecimal(1398855824493L)))
    assert(jd.tick_lower.contains("-57180"))
    assert(jd.tick_upper.contains("-52980"))
    assert(jd.nft_index.contains("3086"))
    assert(jd.nft_address.contains(item))
    assert(jd.amount1.contains(BigDecimal(5765664447L)))
    assert(jd.asset1.contains(usdt))
    assert(jd.user_jetton_wallet_1.isEmpty)
    assert(jd.amount2.isEmpty && jd.asset2.isEmpty)
    assert(jd.user_jetton_wallet_2.contains(userUsdt))
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
      jettonWallets = Map(poolWallet -> asset, userWallet -> asset))
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
      jettonWallets = Map(poolWallet -> asset, recipientWallet -> asset))
      .find(_.`type` == "coffee_staking_claim_rewards").get
    assert(a.success)
    assert(a.source.contains(pool))
    assert(a.destination.contains(recipient))
    assert(a.asset.contains(asset))
    assert(a.amount.contains(BigDecimal(17686745L)))
    assert(a.source_secondary.contains(poolWallet))
    assert(a.destination_secondary.contains(recipientWallet))
  }

  // ----------------------------------------------------------------------
  // evaa.yaml — the remaining withdraw/supply variants
  // ----------------------------------------------------------------------

  private val evaaMaster = "0:" + "BC" * 32
  private val evaaTonId = Opcodes.EvaaTonAssetId
  private val evaaJettonId = BigInt(
    "ca9006bd3fb03d355daeeff93b24be90afaa6e3ca0073ff5720f8a852c933278", 16)

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

  test("evaa.yaml parity ('Withdraw Ton'): successful native withdraw — " +
      "null asset, TON-success payout leg and the collateralized amount") {
    val user = "0:" + "F4" * 32
    val uc = "0:" + "CE" * 32
    val wm = evaaWithdrawMasterBody(evaaTonId, BigInt(417016017L), user)
    val userCall = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x21), 32).storeUint(BigInt(5), 64)
      .storeUint(evaaTonId, 256).storeUint(BigInt(417016017L), 64)
      .storeUint(BigInt(0), 64).storeUint(BigInt(0), 64)
      .storeAddress(Some(user)).build())
    val coll = evaaCollateralizedBody(user, evaaTonId, 417016017L)
    val txs = Seq(tx("T1", evaaMaster, 10), tx("T2", uc, 20),
      tx("T3", evaaMaster, 30), tx("T4", user, 40), tx("T5", uc, 50))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, evaaMaster, Some(2L), body = Some(wm)),
        out("m2", evaaMaster, uc, Some(0x21L), body = Some(userCall))),
      "T2" -> Seq(
        in("m2", evaaMaster, uc, Some(0x21L), body = Some(userCall)),
        out("m3", uc, evaaMaster, Some(0x211L), body = Some(coll))),
      "T3" -> Seq(
        in("m3", uc, evaaMaster, Some(0x211L), body = Some(coll)),
        out("m4", evaaMaster, user, Some(0x211aL), value = 417016017L,
          createdLt = 31),
        out("m5", evaaMaster, uc, Some(0x211aL), createdLt = 32)),
      "T4" -> Seq(in("m4", evaaMaster, user, Some(0x211aL),
        value = 417016017L)),
      "T5" -> Seq(in("m5", evaaMaster, uc, Some(0x211aL))))
    val a = Classifier.classify("gev6", txs, msgs)
      .find(_.`type` == "evaa_withdraw").get
    assert(a.success)
    assert(a.amount.contains(BigDecimal(417016017L)))
    assert(a.source.contains(user))
    assert(a.destination.contains(user))
    assert(a.destination_secondary.contains(uc))
    assert(a.asset.isEmpty)
    val d = a.evaa_withdraw_data.get
    assert(d.master.contains(evaaMaster))
    assert(d.is_ton.contains(true))
    assert(d.recipient_jetton_wallet.isEmpty)
    assert(d.master_jetton_wallet.isEmpty)
  }

  test("evaa.yaml parity ('Jetton supply (failed)'): supply-fail leg — " +
      "success=false with wallet secondaries, master detail and the " +
      "five-account span") {
    val user = "0:" + "87" * 32
    val userWallet = "0:" + "F8" * 32
    val masterWallet = "0:" + "70" * 32
    val uc = "0:" + "48" * 32
    val jetton = "0:" + "72" * 32
    val fwd = new Boc.Builder()
      .storeUint(BigInt(1), 32).storeInt(BigInt(-1), 2)
      .storeAddress(Some(user)).build()
    val xfer = transferBody(5, 1500000000L, evaaMaster, user, 1,
      forwardPayload = Some(fwd))
    val userCall = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x11), 32).storeUint(BigInt(5), 64)
      .storeUint(evaaJettonId, 256).storeUint(BigInt(1500000000L), 64)
      .build())
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
        out("m5", uc, evaaMaster, Some(0x11fL))),
      "T5" -> Seq(in("m5", uc, evaaMaster, Some(0x11fL))))
    val a = Classifier.classify("gev7", txs, msgs,
      jettonWallets = Map(userWallet -> jetton, masterWallet -> jetton))
      .find(_.`type` == "evaa_supply").get
    assert(!a.success)
    assert(a.source.contains(user))
    assert(a.source_secondary.contains(userWallet))
    assert(a.destination.contains(user))
    assert(a.destination_secondary.contains(uc))
    assert(a.amount.contains(BigDecimal(1500000000L)))
    assert(a.asset.contains(jetton))
    val d = a.evaa_supply_data.get
    assert(d.master.contains(evaaMaster))
    assert(d.recipient_jetton_wallet.contains(userWallet))
    assert(d.master_jetton_wallet.contains(masterWallet))
    assert(d.is_ton.contains(false))
    assert(a.accounts.toSet ==
      Set(evaaMaster, user, uc, masterWallet, userWallet),
      s"accounts: ${a.accounts}")
  }

  test("evaa.yaml parity ('Jetton withdrawal " +
      "(withdraw_not_collateralized_excess)'): 0x21e7 user-contract " +
      "excess maps to the not-collateralized reason") {
    val user = "0:" + "5A" * 32
    val uc = "0:" + "C5" * 32
    val wm = evaaWithdrawMasterBody(evaaJettonId, BigInt(20377210L), user)
    val txs = Seq(tx("T1", evaaMaster, 10), tx("T2", uc, 20),
      tx("T3", user, 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, evaaMaster, Some(2L), body = Some(wm)),
        out("m2", evaaMaster, uc, Some(0x21L))),
      "T2" -> Seq(
        in("m2", evaaMaster, uc, Some(0x21L)),
        out("m3", uc, user, Some(0x21e7L))),
      "T3" -> Seq(in("m3", uc, user, Some(0x21e7L))))
    val a = Classifier.classify("gev8", txs, msgs)
      .find(_.`type` == "evaa_withdraw").get
    assert(!a.success)
    assert(a.source.contains(user))
    assert(a.destination.contains(user))
    assert(a.destination_secondary.contains(uc))
    assert(a.amount.contains(BigDecimal(20377210L)))
    assert(a.asset.isEmpty)
    val d = a.evaa_withdraw_data.get
    assert(d.is_ton.contains(false))
    assert(d.recipient_jetton_wallet.isEmpty)
    assert(d.master_jetton_wallet.isEmpty)
    assert(d.fail_reason.contains("withdraw_not_collateralized_excess"))
    assert(d.master.contains(evaaMaster))
    assert(d.asset_id.contains("0x" + evaaJettonId.toString(16)))
  }

  test("evaa.yaml parity ('Ton withdrawal " +
      "(withdraw_missing_prices_excess)'): 0x21e8 excess with is_ton " +
      "and the max-uint64 sentinel amount") {
    val user = "0:" + "74" * 32
    val uc = "0:" + "7D" * 32
    val maxU64 = BigInt("18446744073709551615")
    val wm = evaaWithdrawMasterBody(evaaTonId, maxU64, user)
    val txs = Seq(tx("T1", evaaMaster, 10), tx("T2", uc, 20),
      tx("T3", user, 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", user, evaaMaster, Some(2L), body = Some(wm)),
        out("m2", evaaMaster, uc, Some(0x21L))),
      "T2" -> Seq(
        in("m2", evaaMaster, uc, Some(0x21L)),
        out("m3", uc, user, Some(0x21e8L))),
      "T3" -> Seq(in("m3", uc, user, Some(0x21e8L))))
    val a = Classifier.classify("gev9", txs, msgs)
      .find(_.`type` == "evaa_withdraw").get
    assert(!a.success)
    assert(a.source.contains(user))
    assert(a.destination.contains(user))
    assert(a.destination_secondary.contains(uc))
    assert(a.amount.contains(BigDecimal(maxU64)))
    assert(a.asset.isEmpty)
    val d = a.evaa_withdraw_data.get
    assert(d.is_ton.contains(true))
    assert(d.recipient_jetton_wallet.isEmpty)
    assert(d.master_jetton_wallet.isEmpty)
    assert(d.fail_reason.contains("withdraw_missing_prices_excess"))
    assert(d.master.contains(evaaMaster))
    assert(d.asset_id.contains("0x" + evaaTonId.toString(16)))
  }
}
