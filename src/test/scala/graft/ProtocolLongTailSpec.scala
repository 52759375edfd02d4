package graft

import graft.classifier._

/** G6 long tail added in round 4: nominator pool (incl. the multi-block
  * build), getgems sale/auction lifecycle, teleitem cancel, DNS purchase,
  * TONCO liquidity deposit, full tgBTC chains. */
class ProtocolLongTailSpec extends SparkSpec {

  private def tx(hash: String, account: String, lt: Long): TxLite =
    TxLite(hash, account, lt, lt.toInt, "active", "active", false, None, None,
      0L, "ord")

  private def in(h: String, src: String, dst: String, op: Option[Long],
      value: Long = 100, body: Option[String] = None): MsgLite =
    MsgLite(h, "in", Option(src), Option(dst), value, op, bounce = false,
      bounced = false, Some(1L), body)

  private def out(h: String, src: String, dst: String, op: Option[Long],
      value: Long = 100, createdLt: Long = 2L): MsgLite =
    MsgLite(h, "out", Option(src), Option(dst), value, op, bounce = false,
      bounced = false, Some(createdLt), None)

  private def commentBody(s: String): String = {
    import graft.functions.Boc
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0), 32)
      .storeBytes(s.getBytes("UTF-8"))
      .build())
  }

  /** Real TEP-62 transfer body — new_owner travels in the payload. */
  private def nftTransferBody(newOwner: String): String = {
    import graft.functions.Boc
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x5fcc3d14L), 32)
      .storeUint(BigInt(7), 64)
      .storeAddress(Some(newOwner))
      .storeAddress(None)
      .storeBit(false)
      .storeCoins(BigInt(0))
      .build())
  }

  test("nominator pool deposit: comment 'd' into a pool-interface account") {
    val actions = Classifier.classify("np1",
      Seq(tx("T1", "0:POOL", 10)),
      Map("T1" -> Seq(in("m1", "0:U", "0:POOL", None,
        body = Some(commentBody("d"))))),
      interfaces = Map("0:POOL" -> "nominator_pool"))
    // serialized as stake_deposit/provider=nominator; the block type
    // (and action_id key) stays nominator_pool_deposit
    // (block_tree_serializer.py:653-660)
    assert(actions.map(_.`type`) == Seq("stake_deposit"))
    assert(actions.head.staking_data.flatMap(_.provider).contains("nominator"))
    assert(actions.head.source.contains("0:U"))
    // without the interface it stays a plain transfer
    val plain = Classifier.classify("np1p",
      Seq(tx("T1", "0:POOL", 10)),
      Map("T1" -> Seq(in("m1", "0:U", "0:POOL", None,
        body = Some(commentBody("d"))))))
    assert(plain.map(_.`type`) == Seq("ton_transfer"))
  }

  test("nominator pool withdraw request: 'w' + immediate payout merged") {
    val txs = Seq(tx("T1", "0:POOL", 10), tx("T2", "0:U", 20))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:U", "0:POOL", None, value = 100,
          body = Some(commentBody("w"))),
        out("m2", "0:POOL", "0:U", None, value = 5000)),
      "T2" -> Seq(in("m2", "0:POOL", "0:U", None, value = 5000)))
    val actions = Classifier.classify("np2", txs, msgs,
      interfaces = Map("0:POOL" -> "nominator_pool"))
    // merged payout ⇒ completed withdrawal (serializer.py:662-667)
    assert(actions.map(_.`type`) == Seq("stake_withdrawal"))
    assert(actions.head.staking_data.flatMap(_.provider).contains("nominator"))
    assert(actions.head.value.contains(BigDecimal(5000)))
  }

  test("owner-initiated pool withdrawals emit one action per payout " +
      "(multi-block build, staking.py:383-410)") {
    val txs = Seq(tx("T1", "0:POOL", 10),
      tx("T2", "0:N1", 20), tx("T3", "0:N2", 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:OWNER", "0:POOL",
          Some(Opcodes.NominatorPoolProcessWithdrawRequests)),
        out("m2", "0:POOL", "0:N1", None, value = 700),
        out("m3", "0:POOL", "0:N2", None, value = 900, createdLt = 3L)),
      "T2" -> Seq(in("m2", "0:POOL", "0:N1", None, value = 700)),
      "T3" -> Seq(in("m3", "0:POOL", "0:N2", None, value = 900)))
    val actions = Classifier.classify("np3", txs, msgs,
      interfaces = Map("0:POOL" -> "nominator_pool"))
    val reqs = actions.filter(_.`type` == "stake_withdrawal")
    assert(reqs.size == 2, s"got ${actions.map(_.`type`)}")
    assert(reqs.flatMap(_.value).toSet == Set(BigDecimal(700), BigDecimal(900)))
    assert(reqs.flatMap(_.source).toSet == Set("0:N1", "0:N2"))
  }

  test("getgems put-on-sale: listing transfer + sale deploy + transfer to " +
      "sale collapse into nft_put_on_sale") {
    // the TEP-62 body decoder emits canonical hex — the sale account must
    // round-trip through storeAddress/loadAddress
    val sale = "0:" + "AB" * 32
    // owner -> nft (transfer to listing); listing deploys sale contract and
    // transfers the nft to it
    val txs = Seq(tx("T1", "0:NFT", 10), tx("T2", sale, 20),
      tx("T3", "0:NFT", 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:OWNER", "0:NFT", Some(Opcodes.NftTransfer)),
        out("m2", "0:NFT", sale, None),
        out("m3", "0:NFT", "0:NFT", Some(Opcodes.NftTransfer), createdLt = 3L)),
      "T2" -> Seq(in("m2", "0:NFT", sale, None)),
      "T3" -> Seq(in("m3", "0:NFT", "0:NFT", Some(Opcodes.NftTransfer),
        body = Some(nftTransferBody(sale)))))
    // T2 deploys the sale contract
    val txs2 = txs.map(t => if (t.hash == "T2")
      t.copy(origStatus = "uninit", endStatus = "active") else t)
    val actions = Classifier.classify("ps1", txs2, msgs,
      interfaces = Map(sale -> "nft_sale|0:OWNER"))
    assert(actions.map(_.`type`).contains("nft_put_on_sale"),
      s"got ${actions.map(_.`type`)}")
    // auction interface flips the action type
    val actions2 = Classifier.classify("ps2", txs2, msgs,
      interfaces = Map(sale -> "nft_auction|0:OWNER"))
    assert(actions2.map(_.`type`).contains("nft_put_on_auction"))
  }

  /** StateInit wrapper (no split_depth/special, code+data refs). */
  private def stateInit(data: graft.functions.Boc.Cell): String = {
    import graft.functions.Boc
    Boc.serializeBase64(new Boc.Builder()
      .storeBit(false).storeBit(false)
      .storeBit(true).storeRef(new Boc.Builder().storeUint(BigInt(1), 8).build())
      .storeBit(true).storeRef(data)
      .storeBit(false)
      .build())
  }

  /** Getgems fix-price v3 storage (messages/getgems.py:92-115). */
  private def saleStateInit(fullPrice: Long, mpFee: Long,
      royalty: Long): String = {
    import graft.functions.Boc
    stateInit(new Boc.Builder()
      .storeBit(false) // is_complete
      .storeUint(BigInt(111), 32) // created_at
      .storeAddress(Some("0:" + "11" * 32)) // marketplace
      .storeAddress(Some("0:" + "22" * 32)) // nft
      .storeAddress(Some("0:" + "33" * 32)) // owner
      .storeCoins(BigInt(fullPrice))
      .storeRef(new Boc.Builder()
        .storeAddress(Some("0:" + "44" * 32)) // mp fee addr
        .storeCoins(BigInt(mpFee))
        .storeAddress(Some("0:" + "55" * 32)) // royalty addr
        .storeCoins(BigInt(royalty))
        .build())
      .build())
  }

  /** Getgems auction v3r3 storage (messages/getgems.py:194-219). */
  private def auctionStateInit(minBid: Long, maxBid: Long): String = {
    import graft.functions.Boc
    stateInit(new Boc.Builder()
      .storeUint(BigInt(0), 2) // end?, is_canceled?
      .storeAddress(None) // last_member
      .storeCoins(BigInt(0)).storeUint(BigInt(0), 32) // last_bid(_at)
      .storeUint(BigInt(999), 32) // end_time
      .storeAddress(Some("0:" + "33" * 32)) // nft_owner
      .storeUint(BigInt(0), 64) // last_query_id
      .storeUint(BigInt(500), 32) // mp_fee_factor
      .storeUint(BigInt(10000), 32) // mp_fee_base
      .storeUint(BigInt(250), 32) // royalty_fee_factor
      .storeUint(BigInt(10000), 32) // royalty_fee_base
      .storeRef(new Boc.Builder()
        .storeAddress(Some("0:" + "44" * 32))
        .storeAddress(Some("0:" + "55" * 32)).build())
      .storeRef(new Boc.Builder()
        .storeAddress(Some("0:" + "11" * 32))
        .storeCoins(BigInt(minBid)).storeCoins(BigInt(maxBid))
        .storeCoins(BigInt(100)) // min_step
        .storeUint(BigInt(300), 32) // step_time
        .build())
      .build())
  }

  test("put-on-sale parses the sale state init into nft_listing_data " +
      "(get_sale_data, messages/getgems.py:92-115)") {
    val sale = "0:" + "AB" * 32
    val txs = Seq(tx("T1", "0:NFT", 10),
      TxLite("T2", sale, 20, 20, "uninit", "active", false, None, None,
        0L, "ord"),
      tx("T3", "0:NFT", 30))
    def msgsWith(init: String) = Map(
      "T1" -> Seq(
        in("m1", "0:OWNER", "0:NFT", Some(Opcodes.NftTransfer)),
        out("m2", "0:NFT", sale, None),
        out("m3", "0:NFT", "0:NFT", Some(Opcodes.NftTransfer), createdLt = 3L)),
      "T2" -> Seq(MsgLite("m2", "in", Some("0:NFT"), Some(sale), 100, None,
        bounce = false, bounced = false, Some(1L), None,
        initState = Some(init))),
      "T3" -> Seq(in("m3", "0:NFT", "0:NFT", Some(Opcodes.NftTransfer),
        body = Some(nftTransferBody(sale)))))
    // the dim row's 6th field is the contract code hash — v3r3 here, so
    // the v2/v3-family layout is selected (get_sale_data version
    // dispatch, messages/getgems.py:20-27,66-70)
    val v3r3Hash = "JCIfpXHlQuBVx3vt/b9SfHr0YM/cfzRMRQeHtM+h600="
    val actions = Classifier.classify("ps3", txs,
      msgsWith(saleStateInit(777000L, 5000L, 2500L)),
      interfaces = Map(sale -> s"nft_sale|0:OWNER||||$v3r3Hash"),
      nftItems = Map("0:NFT" -> NftItemInfo(Some("8"), Some("0:COLL"))))
    val act = actions.find(_.`type` == "nft_put_on_sale").get
    // collection/item/index resolve through the nft_items dim
    // (_fill_nft_put_on_sale_action:280-291)
    assert(act.asset.contains("0:COLL"))
    assert(act.asset_secondary.contains("0:NFT"))
    val ld = act.nft_listing_data.get
    assert(ld.nft_item_index.contains("8"))
    assert(ld.full_price.contains(BigDecimal(777000L)))
    assert(ld.marketplace_fee.contains(BigDecimal(5000L)))
    assert(ld.royalty_amount.contains(BigDecimal(2500L)))
    assert(ld.marketplace_fee_address.exists(_.startsWith("0:44")))
    assert(ld.royalty_address.exists(_.startsWith("0:55")))
    assert(ld.marketplace.contains("getgems"))
    assert(ld.max_bid.isEmpty)

    val actions2 = Classifier.classify("ps4", txs,
      msgsWith(auctionStateInit(1000L, 90000L)),
      interfaces = Map(sale -> "nft_auction|0:OWNER"))
    val la = actions2.find(_.`type` == "nft_put_on_auction").get
      .nft_listing_data.get
    assert(la.min_bid.contains(BigDecimal(1000L)))
    assert(la.max_bid.contains(BigDecimal(90000L)))
    assert(la.mp_fee_factor.contains(BigDecimal(500)))
    assert(la.mp_fee_base.contains(BigDecimal(10000)))
    assert(la.royalty_fee_base.contains(BigDecimal(10000)))
    assert(la.full_price.isEmpty)
  }

  test("sale state init with no dim code hash parses as v4r1 — the " +
      "reference's 'latest' default (getgems.py:66-90): percent fees, " +
      "no absolute marketplace_fee") {
    import graft.functions.Boc
    val sale = "0:" + "AB" * 32
    val v4 = stateInit(new Boc.Builder()
      .storeBit(false) // is_complete
      .storeAddress(Some("0:" + "11" * 32)) // marketplace
      .storeAddress(Some("0:" + "33" * 32)) // nft_owner
      .storeCoins(BigInt(555000L)) // full_price
      .storeUint(BigInt(0), 32) // sold_at
      .storeUint(BigInt(0), 64) // query_id
      .storeRef(new Boc.Builder()
        .storeAddress(Some("0:" + "44" * 32)) // mp_fee_addr
        .storeAddress(Some("0:" + "55" * 32)) // royalty_addr
        .storeUint(BigInt(5000), 17) // fee_percent
        .storeUint(BigInt(250), 17) // royalty_percent
        .build())
      .build())
    val txs = Seq(tx("T1", "0:NFT", 10),
      TxLite("T2", sale, 20, 20, "uninit", "active", false, None, None,
        0L, "ord"),
      tx("T3", "0:NFT", 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:OWNER", "0:NFT", Some(Opcodes.NftTransfer)),
        out("m2", "0:NFT", sale, None),
        out("m3", "0:NFT", "0:NFT", Some(Opcodes.NftTransfer), createdLt = 3L)),
      "T2" -> Seq(MsgLite("m2", "in", Some("0:NFT"), Some(sale), 100, None,
        bounce = false, bounced = false, Some(1L), None,
        initState = Some(v4))),
      "T3" -> Seq(in("m3", "0:NFT", "0:NFT", Some(Opcodes.NftTransfer),
        body = Some(nftTransferBody(sale)))))
    val actions = Classifier.classify("ps5", txs, msgs,
      interfaces = Map(sale -> "nft_sale|0:OWNER"))
    val ld = actions.find(_.`type` == "nft_put_on_sale").get
      .nft_listing_data.get
    assert(ld.full_price.contains(BigDecimal(555000L)))
    // v4r1 stores fee PERCENTAGES; NftSaleData.marketplace_fee stays
    // None, so the serialized listing carries no absolute fee
    assert(ld.marketplace_fee.isEmpty)
    assert(ld.royalty_amount.isEmpty)
    assert(ld.marketplace_fee_address.exists(_.startsWith("0:44")))
    assert(ld.royalty_address.exists(_.startsWith("0:55")))
  }

  test("getgems cancel-sale keeps the returned nft_transfer as its own " +
      "action (auction.py:359-380 merges only the cancel call)") {
    val txs = Seq(tx("T1", "0:SALE", 10), tx("T2", "0:NFT", 20))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:OWNER", "0:SALE", Some(Opcodes.NftCancelSaleOp)),
        out("m2", "0:SALE", "0:NFT", Some(Opcodes.NftTransfer))),
      "T2" -> Seq(in("m2", "0:SALE", "0:NFT", Some(Opcodes.NftTransfer))))
    val actions = Classifier.classify("cs1", txs, msgs,
      interfaces = Map("0:SALE" -> "nft_sale|0:OWNER"))
    assert(actions.map(_.`type`).sorted == Seq("nft_cancel_sale", "nft_transfer"),
      s"got ${actions.map(_.`type`)}")
  }

  test("auction finish via 'stop' comment → nft_finish_auction; 'cancel' " +
      "→ nft_cancel_auction") {
    def run(comment: String) = {
      val txs = Seq(tx("T1", "0:AUC", 10), tx("T2", "0:NFT", 20))
      val msgs = Map(
        "T1" -> Seq(
          in("m1", "0:OWNER", "0:AUC", None,
            body = Some(commentBody(comment))),
          out("m2", "0:AUC", "0:NFT", Some(Opcodes.NftTransfer))),
        "T2" -> Seq(in("m2", "0:AUC", "0:NFT", Some(Opcodes.NftTransfer))))
      Classifier.classify(s"ca_$comment", txs, msgs,
        interfaces = Map("0:AUC" -> "nft_auction|0:OWNER"))
    }
    assert(run("stop").map(_.`type`).contains("nft_finish_auction"))
    assert(run("cancel").map(_.`type`).contains("nft_cancel_auction"))
  }

  /** NftOwnershipAssigned body with an optional TeleitemBidInfo payload. */
  private def oaBody(prevOwner: String, bid: Option[Long]): String = {
    import graft.functions.Boc
    val b = new Boc.Builder()
      .storeUint(BigInt(0x05138d91L), 32)
      .storeUint(BigInt(3), 64)
      .storeAddress(Some(prevOwner))
    bid match {
      case Some(v) =>
        b.storeBit(false) // payload inline
          .storeUint(BigInt(0x38127de1L), 32)
          .storeCoins(BigInt(v))
          .storeUint(BigInt(1700000000L), 32)
      case None => b.storeBit(false)
    }
    Boc.serializeBase64(b.build())
  }

  test("fragment purchase: bare ownership_assigned with TeleitemBidInfo " +
      "consumes the bid leg and payouts; price = the bid") {
    val prev = "0:" + "CD" * 32
    val txs = Seq(tx("T1", "0:ITEM", 10), tx("T2", "0:BUYER", 20),
      tx("T3", "0:FEE", 30), tx("T4", "0:SELLER", 40))
    val msgs = Map(
      // external bid into the teleitem
      "T1" -> Seq(
        in("m1", null, "0:ITEM", None, value = 500000),
        out("m2", "0:ITEM", "0:BUYER", Some(Opcodes.NftOwnershipAssigned)),
        out("m3", "0:ITEM", "0:FEE", Some(Opcodes.AuctionFillUp),
          value = 100, createdLt = 3L),
        out("m4", "0:ITEM", "0:SELLER", Some(Opcodes.AuctionFillUp),
          value = 400000, createdLt = 4L)),
      "T2" -> Seq(in("m2", "0:ITEM", "0:BUYER",
        Some(Opcodes.NftOwnershipAssigned),
        body = Some(oaBody(prev, Some(450000L))))),
      "T3" -> Seq(in("m3", "0:ITEM", "0:FEE", Some(Opcodes.AuctionFillUp),
        value = 100)),
      "T4" -> Seq(in("m4", "0:ITEM", "0:SELLER", Some(Opcodes.AuctionFillUp),
        value = 400000)))
    // T1's in-msg source null => ton_transfer (ext) parent block
    val actions = Classifier.classify("fp1", txs, msgs,
      interfaces = Map("0:ITEM" -> "teleitem"))
    assert(actions.map(_.`type`) == Seq("nft_transfer"),
      s"got ${actions.map(_.`type`)}")
    val a = actions.head
    assert(a.nft_transfer_data.flatMap(_.is_purchase).contains(true))
    assert(a.nft_transfer_data.flatMap(_.price).contains(BigDecimal(450000)))
    assert(a.nft_transfer_data.flatMap(_.marketplace).contains("fragment"))
    assert(a.source.contains(prev)) // prev owner from the decoded body
    assert(a.destination.contains("0:BUYER"))
  }

  test("fragment ownership_assigned without bid payload is not a purchase") {
    val prev = "0:" + "CD" * 32
    val actions = Classifier.classify("fp2",
      Seq(tx("T2", "0:BUYER", 20)),
      Map("T2" -> Seq(in("m2", "0:ITEM", "0:BUYER",
        Some(Opcodes.NftOwnershipAssigned),
        body = Some(oaBody(prev, None))))),
      interfaces = Map("0:ITEM" -> "teleitem"))
    assert(actions.map(_.`type`) == Seq("nft_transfer"))
    assert(actions.head.nft_transfer_data.flatMap(_.is_purchase)
      .contains(false))
  }

  test("sale-terms update into a sale contract becomes nft_update_sale") {
    val actions = Classifier.classify("us1",
      Seq(tx("T1", "0:SALE", 10)),
      Map("T1" -> Seq(in("m1", "0:OWNER", "0:SALE", Some(Opcodes.SaleUpdate)))),
      interfaces = Map("0:SALE" -> "nft_sale|0:OWNER"))
    assert(actions.map(_.`type`) == Seq("nft_update_sale"))
  }

  test("teleitem cancel-auction consumes the ok reply") {
    val txs = Seq(tx("T1", "0:ITEM", 10), tx("T2", "0:OWNER", 20))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:OWNER", "0:ITEM", Some(Opcodes.TeleitemCancelAuction)),
        out("m2", "0:ITEM", "0:OWNER", Some(Opcodes.TeleitemOk))),
      "T2" -> Seq(in("m2", "0:ITEM", "0:OWNER", Some(Opcodes.TeleitemOk))))
    val actions = Classifier.classify("tc1", txs, msgs,
      interfaces = Map("0:ITEM" -> "teleitem"))
    assert(actions.map(_.`type`) == Seq("teleitem_cancel_auction"))
  }

  test("dns purchase: fill-up from a dns item under a claim call becomes " +
      "dns_purchase with the claimer as new owner") {
    val txs = Seq(tx("T1", "0:DNSITEM", 10), tx("T2", "0:BENEF", 20))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:CLAIMER", "0:DNSITEM", Some(0x123456L)),
        out("m2", "0:DNSITEM", "0:BENEF", Some(Opcodes.AuctionFillUp),
          value = 77777)),
      "T2" -> Seq(in("m2", "0:DNSITEM", "0:BENEF", Some(Opcodes.AuctionFillUp),
        value = 77777)))
    val actions = Classifier.classify("dp1", txs, msgs,
      interfaces = Map("0:DNSITEM" -> "dns_item"))
    val types = actions.map(_.`type`)
    assert(types.contains("dns_purchase"), s"got $types")
    assert(!types.contains("auction_bid"), s"bid must be rewritten: $types")
    val p = actions.find(_.`type` == "dns_purchase").get
    assert(p.source.contains("0:CLAIMER"))
    assert(p.value.contains(BigDecimal(77777)))
  }

  test("dedust first-asset deposit: jetton chain -> factory ask -> deploy " +
      "+ top-up collapses into a dedust dex_deposit_liquidity") {
    val txs = Seq(tx("TW1", "0:WA", 10), tx("TW2", "0:WB", 20),
      tx("TFACT", "0:FACT", 30), tx("TDEP", "0:DEPC", 40))
    val msgs = Map(
      "TW1" -> Seq(
        in("m1", "0:USER", "0:WA", Some(Opcodes.JettonTransfer)),
        out("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer))),
      "TW2" -> Seq(
        in("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer)),
        out("m3", "0:WB", "0:FACT", Some(Opcodes.DedustAskLiquidityFactory))),
      "TFACT" -> Seq(
        in("m3", "0:WB", "0:FACT", Some(Opcodes.DedustAskLiquidityFactory)),
        out("m4", "0:FACT", "0:DEPC",
          Some(Opcodes.DedustDeployDepositContract))),
      "TDEP" -> Seq(in("m4", "0:FACT", "0:DEPC",
        Some(Opcodes.DedustDeployDepositContract))))
    val actions = Classifier.classify("dd1", txs, msgs)
    assert(actions.map(_.`type`) == Seq("dex_deposit_liquidity"),
      s"got ${actions.map(_.`type`)}")
  }

  /** Minimal deposit-to-pool body (messages/liquidity.py:73-89) — the
    * final matcher decodes owner + target pair from it. */
  private lazy val dedustPoolBody: String = {
    import graft.functions.Boc
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xb56b9598L), 32).storeUint(BigInt(1), 64)
      .storeRef(Boc.Cell.empty)
      .storeAddress(Some("0:" + "AA" * 32)).storeCoins(BigInt(0))
      .storeRef(new Boc.Builder()
        .storeUint(BigInt(0), 4).storeCoins(BigInt(1000))
        .storeUint(BigInt(1), 4).storeInt(BigInt(0), 8)
        .storeBytes(Array.fill[Byte](32)(0xab.toByte))
        .storeCoins(BigInt(2000)).build())
      .storeBit(false).storeBit(false)
      .build())
  }

  test("dedust two-leg deposit in one trace merges partial into final " +
      "(post_process_dedust_liquidity, liquidity.py:473-508)") {
    // one wallet external orders both legs: jetton leg (first asset,
    // deploys deposit contract 0:DEPC) and TON leg (vault -> same 0:DEPC
    // top-up -> deposit-to-pool)
    val txs = Seq(
      tx("TROOT", "0:USER", 5),
      // leg A: jetton chain -> factory -> deploy deposit contract
      tx("TW1", "0:WA", 10), tx("TW2", "0:WB", 20),
      tx("TFACT", "0:FACT", 30), tx("TDEP1", "0:DEPC", 40),
      // leg B: TON to vault -> factory ask -> top-up same deposit
      // contract -> pool
      tx("TVAULT", "0:VAULT", 50), tx("TFACT2", "0:FACT2", 55),
      tx("TDEP2", "0:DEPC", 60), tx("TPOOL", "0:POOL", 70),
      tx("TLP", "0:LPW", 80))
    val msgs = Map(
      "TROOT" -> Seq(
        in("mr", null, "0:USER", None).copy(source = None),
        out("m1", "0:USER", "0:WA", Some(Opcodes.JettonTransfer)),
        out("m5", "0:USER", "0:VAULT", Some(Opcodes.DedustDepositTonToVault),
          createdLt = 3L)),
      "TW1" -> Seq(
        in("m1", "0:USER", "0:WA", Some(Opcodes.JettonTransfer)),
        out("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer))),
      "TW2" -> Seq(
        in("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer)),
        out("m3", "0:WB", "0:FACT", Some(Opcodes.DedustAskLiquidityFactory))),
      "TFACT" -> Seq(
        in("m3", "0:WB", "0:FACT", Some(Opcodes.DedustAskLiquidityFactory)),
        out("m4", "0:FACT", "0:DEPC",
          Some(Opcodes.DedustDeployDepositContract))),
      "TDEP1" -> Seq(in("m4", "0:FACT", "0:DEPC",
        Some(Opcodes.DedustDeployDepositContract))),
      "TVAULT" -> Seq(
        in("m5", "0:USER", "0:VAULT", Some(Opcodes.DedustDepositTonToVault)),
        out("m5a", "0:VAULT", "0:FACT2", Some(Opcodes.DedustAskLiquidityFactory))),
      "TFACT2" -> Seq(
        in("m5a", "0:VAULT", "0:FACT2", Some(Opcodes.DedustAskLiquidityFactory)),
        out("m6", "0:FACT2", "0:DEPC", Some(Opcodes.DedustTopUpDepositContract))),
      "TDEP2" -> Seq(
        in("m6", "0:FACT2", "0:DEPC", Some(Opcodes.DedustTopUpDepositContract)),
        out("m7", "0:DEPC", "0:POOL", Some(Opcodes.DedustDepositToPool))),
      "TPOOL" -> Seq(in("m7", "0:DEPC", "0:POOL",
        Some(Opcodes.DedustDepositToPool)).copy(body = Some(dedustPoolBody)),
        out("m9", "0:POOL", "0:LPW", Some(Opcodes.JettonInternalTransfer))),
      "TLP" -> Seq(in("m9", "0:POOL", "0:LPW",
        Some(Opcodes.JettonInternalTransfer))))
    val actions = Classifier.classify("dd2", txs, msgs)
    val deposits = actions.filter(_.`type` == "dex_deposit_liquidity")
    assert(deposits.size == 1,
      s"partial+final must merge, got ${actions.map(_.`type`)}")
    // the merged action spans BOTH legs' transactions
    val spanned = deposits.head.tx_hashes.toSet
    assert(Set("TVAULT", "TFACT2", "TDEP2", "TPOOL", "TW1", "TW2", "TFACT",
      "TDEP1").subsetOf(spanned), s"merged deposit spans $spanned")
  }

  test("tonco liquidity deposit: jetton transfer -> fund-account -> " +
      "add-liquidity collapses into tonco_deposit_liquidity") {
    val txs = Seq(tx("TW1", "0:WA", 10), tx("TW2", "0:WB", 20),
      tx("TF", "0:POOL", 30), tx("TA", "0:ACC", 40))
    val msgs = Map(
      "TW1" -> Seq(
        in("m1", "0:USER", "0:WA", Some(Opcodes.JettonTransfer)),
        out("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer))),
      "TW2" -> Seq(
        in("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer)),
        out("m3", "0:WB", "0:POOL", Some(Opcodes.ToncoPoolV3FundAccount))),
      "TF" -> Seq(
        in("m3", "0:WB", "0:POOL", Some(Opcodes.ToncoPoolV3FundAccount)),
        out("m4", "0:POOL", "0:ACC", Some(Opcodes.ToncoAccountV3AddLiquidity))),
      "TA" -> Seq(in("m4", "0:POOL", "0:ACC",
        Some(Opcodes.ToncoAccountV3AddLiquidity))))
    val actions = Classifier.classify("tl1", txs, msgs)
    // serialized as the generic dex op (block_tree_serializer.py:894)
    assert(actions.map(_.`type`) == Seq("dex_deposit_liquidity"),
      s"got ${actions.map(_.`type`)}")
  }

  test("full tgBTC mint chain consumes the success log and the minted " +
      "jettons; bare event still falls back to log-only") {
    val txs = Seq(tx("T1", "0:TEL", 10), tx("T2", "0:LOG", 20),
      tx("T3", "0:JW", 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:BTC", "0:TEL", Some(Opcodes.TgbtcMintCall)),
        out("m2", "0:TEL", "0:LOG", Some(Opcodes.TgbtcMint)),
        out("m3", "0:TEL", "0:JW", Some(Opcodes.JettonInternalTransfer),
          createdLt = 3L)),
      "T2" -> Seq(in("m2", "0:TEL", "0:LOG", Some(Opcodes.TgbtcMint))),
      "T3" -> Seq(in("m3", "0:TEL", "0:JW",
        Some(Opcodes.JettonInternalTransfer))))
    val actions = Classifier.classify("tg1", txs, msgs)
    assert(actions.map(_.`type`) == Seq("tgbtc_mint"),
      s"got ${actions.map(_.`type`)}")
    // log-only fallback: partial trace with just the event
    val partial = Classifier.classify("tg2",
      Seq(tx("T2", "0:LOG", 20)),
      Map("T2" -> Seq(in("m2", "0:TEL", "0:LOG", Some(Opcodes.TgbtcMint)))))
    assert(partial.map(_.`type`) == Seq("tgbtc_mint_fallback"))
  }

  test("full tgBTC burn chain: jetton burn with the event log in its " +
      "notification tail") {
    val txs = Seq(tx("TW", "0:JW", 10), tx("TM", "0:MASTER", 20),
      tx("TL", "0:LOG", 30))
    val msgs = Map(
      "TW" -> Seq(
        in("m1", "0:OWNER", "0:JW", Some(Opcodes.JettonBurn)),
        out("m2", "0:JW", "0:MASTER", Some(Opcodes.JettonBurnNotification))),
      "TM" -> Seq(
        in("m2", "0:JW", "0:MASTER", Some(Opcodes.JettonBurnNotification)),
        out("m3", "0:MASTER", "0:LOG", Some(Opcodes.TgbtcBurn))),
      "TL" -> Seq(in("m3", "0:MASTER", "0:LOG", Some(Opcodes.TgbtcBurn))))
    val actions = Classifier.classify("tb1", txs, msgs)
    assert(actions.map(_.`type`) == Seq("tgbtc_burn"),
      s"got ${actions.map(_.`type`)}")
  }

  // ------------------------------------------------------- StonFi v2

  /** Real TEP-74 transfer body (what the ghost/pTON matchers decode). */
  private def jettonTransferBody(dest: String, amount: Long,
      comment: Option[String] = None): String = {
    import graft.functions.Boc
    val b = new Boc.Builder()
      .storeUint(BigInt(0x0f8a7ea5L), 32)
      .storeUint(BigInt(42), 64)
      .storeCoins(BigInt(amount))
      .storeAddress(Some(dest))
      .storeAddress(None)
      .storeBit(false) // no custom payload
      .storeCoins(BigInt(0))
    comment match {
      case Some(c) => b.storeBit(true).storeRef(new Boc.Builder()
        .storeUint(BigInt(0), 32).storeBytes(c.getBytes("UTF-8")).build())
      case None => b.storeBit(false)
    }
    graft.functions.Boc.serializeBase64(b.build())
  }

  test("stonfi v2 swap: swap -> pay_to chain, multi-pool hop count") {
    // single pool: U -> pool swap -> router pay_to
    val txs = Seq(tx("TP", "0:POOL", 10), tx("TR", "0:ROUTER", 20))
    val msgs = Map(
      "TP" -> Seq(
        in("m1", "0:U", "0:POOL", Some(Opcodes.StonfiV2Swap)),
        out("m2", "0:POOL", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))),
      "TR" -> Seq(in("m2", "0:POOL", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))))
    val actions = Classifier.classify("sv1", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_swap"),
      s"got ${actions.map(_.`type`)}")
    assert(actions.head.jetton_swap_data.map(_.dex).contains("stonfi_v2"))
    assert(actions.head.jetton_swap_data.exists(_.peer_swaps.isEmpty))

    // cross-pool: swap -> pay_to -> swap -> pay_to => 2 hops recorded
    val txs2 = Seq(tx("TP1", "0:POOL1", 10), tx("TR1", "0:ROUTER", 20),
      tx("TP2", "0:POOL2", 30), tx("TR2", "0:ROUTER", 40))
    val msgs2 = Map(
      "TP1" -> Seq(
        in("m1", "0:U", "0:POOL1", Some(Opcodes.StonfiV2Swap)),
        out("m2", "0:POOL1", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))),
      "TR1" -> Seq(
        in("m2", "0:POOL1", "0:ROUTER", Some(Opcodes.StonfiV2PayTo)),
        out("m3", "0:ROUTER", "0:POOL2", Some(Opcodes.StonfiV2Swap))),
      "TP2" -> Seq(
        in("m3", "0:ROUTER", "0:POOL2", Some(Opcodes.StonfiV2Swap)),
        out("m4", "0:POOL2", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))),
      "TR2" -> Seq(in("m4", "0:POOL2", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))))
    val actions2 = Classifier.classify("sv2", txs2, msgs2)
    assert(actions2.map(_.`type`) == Seq("jetton_swap"),
      s"got ${actions2.map(_.`type`)}")
    assert(actions2.head.jetton_swap_data.exists(_.peer_swaps.size == 2))
  }

  /** Real pay_to#657b54f5 body (messages/swaps.py:64-78). */
  private def payToBody(exitCode: Long, amount0: Long, token0: String,
      amount1: Long, token1: String): String = {
    import graft.functions.Boc
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x657b54f5L), 32)
      .storeUint(BigInt(1), 64) // query_id
      .storeAddress(Some("0:" + "01" * 32)) // to
      .storeAddress(Some("0:" + "02" * 32)) // excesses
      .storeAddress(Some("0:" + "03" * 32)) // original_caller
      .storeUint(BigInt(exitCode), 32)
      .storeBit(false) // no custom payload
      .storeRef(new Boc.Builder()
        .storeCoins(BigInt(0)) // fwd_ton_amount
        .storeCoins(BigInt(amount0)).storeAddress(Some(token0))
        .storeCoins(BigInt(amount1)).storeAddress(Some(token1))
        .build())
      .build())
  }

  test("stonfi v2 multi-hop swap decodes pay_to amounts into peer_swaps") {
    val tokA = "0:" + "0A" * 32
    val tokB = "0:" + "0B" * 32
    val txs = Seq(tx("TP1", "0:POOL1", 10), tx("TR1", "0:ROUTER", 20),
      tx("TP2", "0:POOL2", 30), tx("TR2", "0:ROUTER", 40))
    val ok = graft.functions.TlbDecoders.StonfiV2SwapOkCode
    val msgs = Map(
      "TP1" -> Seq(
        in("m1", "0:U", "0:POOL1", Some(Opcodes.StonfiV2Swap)),
        out("m2", "0:POOL1", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))),
      "TR1" -> Seq(
        in("m2", "0:POOL1", "0:ROUTER", Some(Opcodes.StonfiV2PayTo),
          body = Some(payToBody(ok, 1000, tokA, 0, tokB))),
        out("m3", "0:ROUTER", "0:POOL2", Some(Opcodes.StonfiV2Swap))),
      "TP2" -> Seq(
        in("m3", "0:ROUTER", "0:POOL2", Some(Opcodes.StonfiV2Swap)),
        out("m4", "0:POOL2", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))),
      "TR2" -> Seq(in("m4", "0:POOL2", "0:ROUTER", Some(Opcodes.StonfiV2PayTo),
        body = Some(payToBody(ok, 0, tokA, 2000, tokB)))))
    val actions = Classifier.classify("sv5", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_swap"),
      s"got ${actions.map(_.`type`)}")
    val peers = actions.head.jetton_swap_data.get.peer_swaps
    assert(peers.size == 2)
    assert(peers(0).amount_out.contains(BigDecimal(1000)))
    assert(peers(0).asset_out.contains(tokA))
    assert(peers(1).amount_in.contains(BigDecimal(1000)))
    assert(peers(1).amount_out.contains(BigDecimal(2000)))
    assert(peers(1).asset_out.contains(tokB))
  }

  test("stonfi v2 provide liquidity: add_liquidity chain; refund = failed") {
    def chain(tail: (String, Long)): Seq[ActionRow] = {
      val txs = Seq(tx("TR", "0:ROUTER", 10), tx("TP", "0:POOL", 20),
        tx("TA", "0:ACCT", 30), tx("TT", tail._1, 40))
      val msgs = Map(
        "TR" -> Seq(
          in("m1", "0:U", "0:ROUTER", Some(Opcodes.StonfiProvideLp)),
          out("m2", "0:ROUTER", "0:POOL", Some(Opcodes.StonfiV2AddLiquidity))),
        "TP" -> Seq(
          in("m2", "0:ROUTER", "0:POOL", Some(Opcodes.StonfiV2AddLiquidity)),
          out("m3", "0:POOL", "0:ACCT", Some(Opcodes.StonfiV2CbAddLiquidity))),
        "TA" -> Seq(
          in("m3", "0:POOL", "0:ACCT", Some(Opcodes.StonfiV2CbAddLiquidity)),
          out("m4", "0:ACCT", tail._1, Some(tail._2))),
        "TT" -> Seq(in("m4", "0:ACCT", tail._1, Some(tail._2))))
      Classifier.classify("sv3", txs, msgs)
    }
    val ok = chain(("0:LPWALLET", Opcodes.JettonInternalTransfer))
    assert(ok.map(_.`type`) == Seq("dex_deposit_liquidity"),
      s"got ${ok.map(_.`type`)}")
    assert(ok.head.success)
    val refunded = chain(("0:REFUND", Opcodes.StonfiV2AddLiquidity))
    assert(refunded.map(_.`type`) == Seq("dex_deposit_liquidity"))
    assert(!refunded.head.success)
  }

  test("stonfi v2 withdraw liquidity: LP burn -> withdraw -> pay_to payouts") {
    val txs = Seq(tx("TB", "0:LPW", 10), tx("TP", "0:POOL", 20),
      tx("TR", "0:ROUTER", 30))
    val msgs = Map(
      "TB" -> Seq(
        in("m1", "0:U", "0:LPW", Some(Opcodes.JettonBurn)),
        out("m2", "0:LPW", "0:POOL", Some(Opcodes.StonfiV2WithdrawLiquidity))),
      "TP" -> Seq(
        in("m2", "0:LPW", "0:POOL", Some(Opcodes.StonfiV2WithdrawLiquidity)),
        out("m3", "0:POOL", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))),
      "TR" -> Seq(in("m3", "0:POOL", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))))
    val actions = Classifier.classify("sv4", txs, msgs)
    assert(actions.map(_.`type`) == Seq("dex_withdraw_liquidity"),
      s"got ${actions.map(_.`type`)}")
  }

  test("pTON transfer: jetton-transfer call into a pton wallet, no " +
      "internal_transfer leg") {
    val txs = Seq(tx("TW", "0:PTONW", 10), tx("TN", "0:RECV", 20))
    val body = jettonTransferBody("0:" + "AA" * 32, 777, Some("hi"))
    val msgs = Map(
      "TW" -> Seq(
        in("m1", "0:U", "0:PTONW", Some(Opcodes.JettonTransfer),
          body = Some(body)),
        out("m2", "0:PTONW", "0:RECV", Some(Opcodes.JettonNotify))),
      "TN" -> Seq(in("m2", "0:PTONW", "0:RECV", Some(Opcodes.JettonNotify))))
    val actions = Classifier.classify("pt1", txs, msgs,
      interfaces = Map("0:PTONW" -> "pton_wallet"))
    assert(actions.map(_.`type`) == Seq("jetton_transfer"),
      s"got ${actions.map(_.`type`)}")
    assert(actions.head.value.contains(BigDecimal(777)))
    assert(actions.head.destination.contains("0:" + "AA" * 32))
    // without the interface the bare call stays call_contract (the base
    // jetton matcher still requires the internal_transfer leg)
    val plain = Classifier.classify("pt2", txs, msgs)
    assert(plain.map(_.`type`).forall(_ == "call_contract"))
  }

  test("dedust two-leg deposit merges when the FINAL leg also routes " +
      "through the factory ask (reference final chain, liquidity.py:335-370)") {
    // Like the plain two-leg test, but leg B (the final) goes
    // vault -> ASK FACTORY -> top-up -> deposit-to-pool: both legs now
    // carry 0xf04ec526, so only a deposit-to-pool discriminator finds
    // the final leg.
    val txs = Seq(
      tx("TROOT", "0:USER", 5),
      tx("TW1", "0:WA", 10), tx("TW2", "0:WB", 20),
      tx("TFACT", "0:FACT", 30), tx("TDEP1", "0:DEPC", 40),
      tx("TVAULT", "0:VAULT", 50), tx("TFACT2", "0:FACT", 55),
      tx("TDEP2", "0:DEPC", 60), tx("TPOOL", "0:POOL", 70),
      tx("TLP", "0:LPW", 80))
    val msgs = Map(
      "TROOT" -> Seq(
        in("mr", null, "0:USER", None).copy(source = None),
        out("m1", "0:USER", "0:WA", Some(Opcodes.JettonTransfer)),
        out("m5", "0:USER", "0:VAULT", Some(Opcodes.DedustDepositTonToVault),
          createdLt = 3L)),
      "TW1" -> Seq(
        in("m1", "0:USER", "0:WA", Some(Opcodes.JettonTransfer)),
        out("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer))),
      "TW2" -> Seq(
        in("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer)),
        out("m3", "0:WB", "0:FACT", Some(Opcodes.DedustAskLiquidityFactory))),
      "TFACT" -> Seq(
        in("m3", "0:WB", "0:FACT", Some(Opcodes.DedustAskLiquidityFactory)),
        out("m4", "0:FACT", "0:DEPC",
          Some(Opcodes.DedustDeployDepositContract))),
      "TDEP1" -> Seq(in("m4", "0:FACT", "0:DEPC",
        Some(Opcodes.DedustDeployDepositContract))),
      "TVAULT" -> Seq(
        in("m5", "0:USER", "0:VAULT", Some(Opcodes.DedustDepositTonToVault)),
        out("m6", "0:VAULT", "0:FACT",
          Some(Opcodes.DedustAskLiquidityFactory))),
      "TFACT2" -> Seq(
        in("m6", "0:VAULT", "0:FACT", Some(Opcodes.DedustAskLiquidityFactory)),
        out("m7", "0:FACT", "0:DEPC",
          Some(Opcodes.DedustTopUpDepositContract))),
      "TDEP2" -> Seq(
        in("m7", "0:FACT", "0:DEPC", Some(Opcodes.DedustTopUpDepositContract)),
        out("m8", "0:DEPC", "0:POOL", Some(Opcodes.DedustDepositToPool))),
      "TPOOL" -> Seq(in("m8", "0:DEPC", "0:POOL",
        Some(Opcodes.DedustDepositToPool)).copy(body = Some(dedustPoolBody)),
        out("m9", "0:POOL", "0:LPW", Some(Opcodes.JettonInternalTransfer))),
      "TLP" -> Seq(in("m9", "0:POOL", "0:LPW",
        Some(Opcodes.JettonInternalTransfer))))
    val actions = Classifier.classify("dd3", txs, msgs)
    val deposits = actions.filter(_.`type` == "dex_deposit_liquidity")
    assert(deposits.size == 1,
      s"ask-factory on BOTH legs must still merge, got ${actions.map(_.`type`)}")
    val spanned = deposits.head.tx_hashes.toSet
    assert(Set("TVAULT", "TFACT2", "TDEP2", "TPOOL", "TW1", "TW2", "TFACT",
      "TDEP1").subsetOf(spanned), s"merged deposit spans $spanned")
  }

  test("stonfi v2 mixed-success route: failed hop is skipped and the next " +
      "hop chains amount_in from the last SUCCESSFUL hop") {
    val tokA = "0:" + "0A" * 32
    val tokB = "0:" + "0B" * 32
    val tokC = "0:" + "0C" * 32
    val ok = graft.functions.TlbDecoders.StonfiV2SwapOkCode
    val txs = Seq(tx("TP1", "0:POOL1", 10), tx("TR1", "0:ROUTER", 20),
      tx("TP2", "0:POOL2", 30), tx("TR2", "0:ROUTER", 40),
      tx("TP3", "0:POOL3", 50), tx("TR3", "0:ROUTER", 60))
    val msgs = Map(
      "TP1" -> Seq(
        in("m1", "0:U", "0:POOL1", Some(Opcodes.StonfiV2Swap)),
        out("m2", "0:POOL1", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))),
      "TR1" -> Seq(
        in("m2", "0:POOL1", "0:ROUTER", Some(Opcodes.StonfiV2PayTo),
          body = Some(payToBody(ok, 1000, tokA, 0, tokB))),
        out("m3", "0:ROUTER", "0:POOL2", Some(Opcodes.StonfiV2Swap))),
      "TP2" -> Seq(
        in("m3", "0:ROUTER", "0:POOL2", Some(Opcodes.StonfiV2Swap)),
        out("m4", "0:POOL2", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))),
      "TR2" -> Seq(
        // middle hop FAILED: refund pay_to with a non-ok exit code
        in("m4", "0:POOL2", "0:ROUTER", Some(Opcodes.StonfiV2PayTo),
          body = Some(payToBody(0xdeadL, 500, tokB, 0, tokA))),
        out("m5", "0:ROUTER", "0:POOL3", Some(Opcodes.StonfiV2Swap))),
      "TP3" -> Seq(
        in("m5", "0:ROUTER", "0:POOL3", Some(Opcodes.StonfiV2Swap)),
        out("m6", "0:POOL3", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))),
      "TR3" -> Seq(in("m6", "0:POOL3", "0:ROUTER", Some(Opcodes.StonfiV2PayTo),
        body = Some(payToBody(ok, 0, tokA, 2000, tokC)))))
    val actions = Classifier.classify("sv6", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_swap"),
      s"got ${actions.map(_.`type`)}")
    val peers = actions.head.jetton_swap_data.get.peer_swaps
    assert(peers.size == 2, s"failed hop must drop out, got $peers")
    assert(peers(0).amount_out.contains(BigDecimal(1000)))
    assert(peers(0).asset_out.contains(tokA))
    // NOT 500/tokB — the failed hop's output must not leak into the chain
    assert(peers(1).amount_in.contains(BigDecimal(1000)), s"got ${peers(1)}")
    assert(peers(1).asset_in.contains(tokA))
    assert(peers(1).amount_out.contains(BigDecimal(2000)))

    // a FAILED FIRST hop gates off every later entry (swaps.py:404)
    val msgsFailFirst = msgs ++ Map(
      "TR1" -> Seq(
        in("m2", "0:POOL1", "0:ROUTER", Some(Opcodes.StonfiV2PayTo),
          body = Some(payToBody(0xdeadL, 1000, tokA, 0, tokB))),
        out("m3", "0:ROUTER", "0:POOL2", Some(Opcodes.StonfiV2Swap))))
    val actions2 = Classifier.classify("sv7", txs, msgsFailFirst)
    val peers2 = actions2.head.jetton_swap_data.get.peer_swaps
    assert(peers2.size == 1, s"first hop failed => only its entry: $peers2")
  }

  test("stonfi v2 swap resolves peer assets through the jetton-wallet " +
      "repository: master address out, TON for pTON wallets") {
    val walletA = "0:" + "0A" * 32
    val walletB = "0:" + "0B" * 32
    val masterA = "0:" + "AA" * 32
    val ptonMaster = ProtocolMatchers.PtonMasters.head
    val wallets = Map(walletA -> masterA, walletB -> ptonMaster)
    val ok = graft.functions.TlbDecoders.StonfiV2SwapOkCode
    val txs = Seq(tx("TP1", "0:POOL1", 10), tx("TR1", "0:ROUTER", 20),
      tx("TP2", "0:POOL2", 30), tx("TR2", "0:ROUTER", 40))
    val msgs = Map(
      "TP1" -> Seq(
        in("m1", "0:U", "0:POOL1", Some(Opcodes.StonfiV2Swap)),
        out("m2", "0:POOL1", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))),
      "TR1" -> Seq(
        in("m2", "0:POOL1", "0:ROUTER", Some(Opcodes.StonfiV2PayTo),
          body = Some(payToBody(ok, 1000, walletA, 0, walletB))),
        out("m3", "0:ROUTER", "0:POOL2", Some(Opcodes.StonfiV2Swap))),
      "TP2" -> Seq(
        in("m3", "0:ROUTER", "0:POOL2", Some(Opcodes.StonfiV2Swap)),
        out("m4", "0:POOL2", "0:ROUTER", Some(Opcodes.StonfiV2PayTo))),
      "TR2" -> Seq(in("m4", "0:POOL2", "0:ROUTER", Some(Opcodes.StonfiV2PayTo),
        body = Some(payToBody(ok, 0, walletA, 2000, walletB)))))
    val actions = Classifier.classify("sv8", txs, msgs,
      jettonWallets = wallets)
    val peers = actions.head.jetton_swap_data.get.peer_swaps
    assert(peers.size == 2)
    assert(peers(0).asset_out.contains(masterA), s"resolved master: $peers")
    assert(peers(1).asset_in.contains(masterA))
    assert(peers(1).asset_out.contains("TON"), s"pTON wallet => TON: $peers")
    // without the repository the wallet addresses stand in
    val bare = Classifier.classify("sv9", txs, msgs)
      .head.jetton_swap_data.get.peer_swaps
    assert(bare(0).asset_out.contains(walletA))
  }

  /** pTON v2 ton_transfer#01f3835d body (messages/swaps.py:50-61). */
  private def ptonTransferBody(tonAmount: Long, refund: String): String = {
    import graft.functions.Boc
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x01f3835dL), 32)
      .storeUint(BigInt(9), 64)
      .storeCoins(BigInt(tonAmount))
      .storeAddress(Some(refund))
      .storeBit(false) // forward_payload Either: inline (empty)
      .build())
  }

  test("pTON v2 ton_transfer rewrites to jetton_transfer with the body's " +
      "ton_amount, not the gas-inclusive message value") {
    val txs = Seq(tx("TW", "0:PTONW", 10), tx("TN", "0:ROUTER", 20))
    val msgs = Map(
      "TW" -> Seq(
        in("m1", "0:U", "0:PTONW", Some(Opcodes.PTonTransferOp),
          value = 5000000000L, // ton_amount + gas
          body = Some(ptonTransferBody(1234, "0:" + "EE" * 32))),
        out("m2", "0:PTONW", "0:ROUTER", Some(Opcodes.JettonNotify))),
      "TN" -> Seq(in("m2", "0:PTONW", "0:ROUTER", Some(Opcodes.JettonNotify))))
    val actions = Classifier.classify("pt3", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_transfer"),
      s"got ${actions.map(_.`type`)}")
    assert(actions.head.value.contains(BigDecimal(1234)),
      s"true amount is the body's ton_amount: ${actions.head.value}")
    assert(actions.head.source.contains("0:U"))
    assert(actions.head.destination.contains("0:ROUTER"))
  }

  test("failed-external fallback: ghost jetton-transfer call decodes into " +
      "a jetton_transfer action") {
    import graft.functions.Boc
    val dest = "0:" + "BB" * 32
    val transferBody = Boc.parseBase64(jettonTransferBody(dest, 555))
    val inner = new Boc.Builder()
      .storeBit(false).storeBit(true).storeBit(false).storeBit(false)
      .storeAddress(None).storeAddress(Some("0:" + "CC" * 32))
      .storeCoins(BigInt(100000000L))
      .storeBit(false)
      .storeCoins(BigInt(0)).storeCoins(BigInt(0))
      .storeUint(BigInt(0), 64).storeUint(BigInt(0), 32)
      .storeBit(false).storeBit(true) // no init, body in ref
      .storeRef(transferBody)
      .build()
    val walletBody = new Boc.Builder()
      .storeUint(BigInt(0), 512)
      .storeUint(BigInt(698983191L), 32)
      .storeUint(BigInt(0xffffffffL), 32)
      .storeUint(BigInt(7), 32)
      .storeUint(BigInt(0), 8)
      .storeRef(inner)
      .build()
    val txs = Seq(tx("TX", "0:WALLET", 10))
    val msgs = Map("TX" -> Seq(
      in("m1", null, "0:WALLET", None).copy(
        source = None, body = Some(Boc.serializeBase64(walletBody)))))
    val actions = Classifier.classify("gf1", txs, msgs)
    assert(actions.map(_.`type`).contains("jetton_transfer"),
      s"got ${actions.map(_.`type`)}")
    val jt = actions.find(_.`type` == "jetton_transfer").get
    assert(jt.value.contains(BigDecimal(555)))
    assert(jt.destination.contains(dest))
  }
}
