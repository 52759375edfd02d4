package graft

import graft.classifier._
import graft.functions.Boc

/** Round-5 action detail structs (reference database.py:275-569 composite
  * types; fills at block_tree_serializer.py:400-829): multisig
  * create/approve/execute, change_dns, vesting, dex liquidity. Bodies are
  * REAL BOCs built with the engine's writer and decoded back inside the
  * matchers.
  */
class DetailStructsSpec extends SparkSpec {

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

  private val orderCell =
    new Boc.Builder().storeUint(BigInt(0xdeadL), 32).build()
  private val orderBoc = Boc.serializeBase64(orderCell, withCrc = false)

  private def newOrderBody(qid: Long, seqno: Long, isSigner: Boolean,
      idx: Int, exp: Long): String =
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xf718510fL), 32)
      .storeUint(BigInt(qid), 64)
      .storeUint(BigInt(seqno), 256)
      .storeBit(isSigner)
      .storeUint(BigInt(idx), 8)
      .storeUint(BigInt(exp), 48)
      .storeRef(orderCell)
      .build())

  private def initOrderBody(qid: Long, approveOnInit: Boolean): String = {
    val b = new Boc.Builder()
      .storeUint(BigInt(0x9c73fba2L), 32)
      .storeUint(BigInt(qid), 64)
      .storeUint(BigInt(2), 8) // threshold
      .storeRef(new Boc.Builder().storeUint(BigInt(0), 1).build()) // signers
      .storeUint(BigInt(99), 48)
      .storeRef(orderCell)
      .storeBit(approveOnInit)
    if (approveOnInit) b.storeUint(BigInt(0), 8)
    Boc.serializeBase64(b.build())
  }

  test("multisig create order: new_order + init child fill " +
      "multisig_create_order_data and the order contract address") {
    val txs = Seq(tx("TM", "0:MSIG", 10), tx("TO", "0:ORDER", 20))
    val msgs = Map(
      "TM" -> Seq(
        in("m1", "0:CREATOR", "0:MSIG", Some(Opcodes.MultisigNewOrder),
          body = Some(newOrderBody(7, 42, isSigner = true, idx = 3,
            exp = 1234567))),
        out("m2", "0:MSIG", "0:ORDER", Some(Opcodes.MultisigInitOrder),
          body = Some(initOrderBody(7, approveOnInit = true)))),
      "TO" -> Seq(in("m2", "0:MSIG", "0:ORDER", Some(Opcodes.MultisigInitOrder),
        body = Some(initOrderBody(7, approveOnInit = true)))))
    val actions = Classifier.classify("ms1", txs, msgs)
    assert(actions.map(_.`type`) == Seq("multisig_create_order"))
    val d = actions.head.multisig_create_order_data.get
    assert(d.query_id.contains("7"))
    assert(d.order_seqno.contains("42"))
    assert(d.is_created_by_signer.contains(true))
    assert(d.is_signed_by_creator.contains(true))
    assert(d.creator_index.contains(3))
    assert(d.expiration_date.contains(1234567L))
    assert(d.order_boc.contains(orderBoc))
    assert(actions.head.destination_secondary.contains("0:ORDER"))
  }

  test("multisig create order: init-body signers dict lands in the " +
      "action accounts list (block_tree_serializer.py:781)") {
    val sigA = "0:" + "AA" * 32
    val sigB = "0:" + "BB" * 32
    def leaf(addr: String) = new Boc.Builder()
      .storeBit(false).storeBit(false) // hml_short, len 0
      .storeAddress(Some(addr)).build()
    val dictRoot = new Boc.Builder()
      .storeBit(false) // hml_short
      .storeUint(BigInt("1111111", 2), 7).storeBit(false) // unary len 7
      .storeUint(BigInt(0), 7) // label bits
      .storeRef(leaf(sigA)).storeRef(leaf(sigB)).build()
    val signersCell = new Boc.Builder()
      .storeBit(true).storeRef(dictRoot).build() // HashmapE non-empty
    val body = {
      val b = new Boc.Builder()
        .storeUint(BigInt(0x9c73fba2L), 32)
        .storeUint(BigInt(7), 64)
        .storeUint(BigInt(2), 8)
        .storeRef(signersCell)
        .storeUint(BigInt(99), 48)
        .storeRef(orderCell)
        .storeBit(true).storeUint(BigInt(0), 8)
      Boc.serializeBase64(b.build())
    }
    val decoded = graft.functions.TlbDecoders.multisigInitOrder(body)
    assert(decoded.signers == Seq(sigA, sigB))
    val txs = Seq(tx("TM", "0:MSIG", 10), tx("TO", "0:ORDER", 20))
    val msgs = Map(
      "TM" -> Seq(
        in("m1", "0:CREATOR", "0:MSIG", Some(Opcodes.MultisigNewOrder),
          body = Some(newOrderBody(7, 42, isSigner = true, idx = 3,
            exp = 1234567))),
        out("m2", "0:MSIG", "0:ORDER", Some(Opcodes.MultisigInitOrder),
          body = Some(body))),
      "TO" -> Seq(in("m2", "0:MSIG", "0:ORDER", Some(Opcodes.MultisigInitOrder),
        body = Some(body))))
    val a = Classifier.classify("ms-sig", txs, msgs).head
    assert(a.`type` == "multisig_create_order")
    // node accounts + endpoints + secondaries + signers, deduped
    for (acct <- Seq("0:MSIG", "0:ORDER", "0:CREATOR", sigA, sigB))
      assert(a.accounts.contains(acct), s"missing $acct in ${a.accounts}")
  }

  test("multisig approve: accepted => exit 0; rejected => decoded exit " +
      "code and failed action") {
    def approveBody(idx: Int): String =
      Boc.serializeBase64(new Boc.Builder()
        .storeUint(BigInt(0xa762230fL), 32)
        .storeUint(BigInt(5), 64).storeUint(BigInt(idx), 8).build())
    def rejectedBody(code: Long): String =
      Boc.serializeBase64(new Boc.Builder()
        .storeUint(BigInt(0xafaf283eL), 32)
        .storeUint(BigInt(5), 64).storeUint(BigInt(code), 32).build())
    def run(childOp: Long, childBody: Option[String]): ActionRow = {
      val txs = Seq(tx("T1", "0:ORDER", 10), tx("T2", "0:SIGNER", 20))
      val msgs = Map(
        "T1" -> Seq(
          in("m1", "0:SIGNER", "0:ORDER", Some(Opcodes.MultisigApprove),
            body = Some(approveBody(4))),
          out("m2", "0:ORDER", "0:SIGNER", Some(childOp), body = childBody)),
        "T2" -> Seq(in("m2", "0:ORDER", "0:SIGNER", Some(childOp),
          body = childBody)))
      Classifier.classify("ma", txs, msgs)
        .find(_.`type` == "multisig_approve").get
    }
    val ok = run(Opcodes.MultisigApproveAccepted, None)
    assert(ok.success)
    assert(ok.multisig_approve_data.get.signer_index.contains(4))
    assert(ok.multisig_approve_data.get.exit_code.contains(0))
    val bad = run(Opcodes.MultisigApproveRejected, Some(rejectedBody(101)))
    assert(!bad.success)
    assert(bad.multisig_approve_data.get.exit_code.contains(101))
  }

  test("multisig execute decodes order seqno, approvals, signers hash") {
    val hashBytes = Array.tabulate[Byte](32)(i => (i + 1).toByte)
    val body = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x75097f5dL), 32)
      .storeUint(BigInt(9), 64)
      .storeUint(BigInt(42), 256)
      .storeUint(BigInt(777), 48)
      .storeUint(BigInt(2), 8)
      .storeBytes(hashBytes)
      .storeRef(orderCell)
      .build())
    val actions = Classifier.classify("me1",
      Seq(tx("T1", "0:MSIG", 10)),
      Map("T1" -> Seq(in("m1", "0:ORDER", "0:MSIG",
        Some(Opcodes.MultisigExecute), body = Some(body)))))
    assert(actions.map(_.`type`) == Seq("multisig_execute"))
    val d = actions.head.multisig_execute_data.get
    assert(d.query_id.contains("9"))
    assert(d.order_seqno.contains("42"))
    assert(d.expiration_date.contains(777L))
    assert(d.approvals_num.contains(2))
    assert(d.signers_hash.contains(
      java.util.Base64.getEncoder.encodeToString(hashBytes)))
    assert(d.order_boc.contains(orderBoc))
  }

  private def dnsBody(key: Long, value: Option[Boc.Cell]): String = {
    val b = new Boc.Builder()
      .storeUint(BigInt(0x4eb1f0f9L), 32)
      .storeUint(BigInt(11), 64)
      .storeUint(BigInt(key), 256)
    value.foreach(b.storeRef)
    Boc.serializeBase64(b.build())
  }

  test("change_dns decodes the record value by schema tag; delete keeps " +
      "only the key; renew carries no struct") {
    val wallet = "0:" + "AB" * 32
    val smcValue = new Boc.Builder()
      .storeUint(BigInt(0x9fd3L), 16)
      .storeAddress(Some(wallet))
      .storeUint(BigInt(1), 8)
      .build()
    def classifyOne(key: Long, value: Option[Boc.Cell]): ActionRow =
      Classifier.classify("dns",
        Seq(tx("T1", "0:ITEM", 10)),
        Map("T1" -> Seq(in("m1", "0:OWNER", "0:ITEM",
          Some(Opcodes.ChangeDnsRecord), body = Some(dnsBody(key, value)))))).head
    val change = classifyOne(5, Some(smcValue))
    assert(change.`type` == "change_dns")
    val d = change.change_dns_record_data.get
    assert(d.key.contains("0" * 63 + "5"))
    assert(d.value_schema.contains("DNSSmcAddress"))
    assert(d.value.contains(wallet))
    assert(d.flags.contains(1))
    val delete = classifyOne(5, None)
    assert(delete.`type` == "delete_dns")
    assert(delete.change_dns_record_data.get.value_schema.isEmpty)
    assert(delete.change_dns_record_data.get.key.contains("0" * 63 + "5"))
    val renew = classifyOne(0, None)
    assert(renew.`type` == "renew_dns")
    assert(renew.change_dns_record_data.isEmpty)
  }

  test("dns text record decodes the chunked DNSText value") {
    val textValue = new Boc.Builder()
      .storeUint(BigInt(0x1edaL), 16)
      .storeUint(BigInt(1), 8) // one chunk
      .storeUint(BigInt(5), 8)
      .storeBytes("hello".getBytes("UTF-8"))
      .build()
    val a = Classifier.classify("dns2",
      Seq(tx("T1", "0:ITEM", 10)),
      Map("T1" -> Seq(in("m1", "0:OWNER", "0:ITEM",
        Some(Opcodes.ChangeDnsRecord), body = Some(dnsBody(6, Some(textValue))))))).head
    assert(a.change_dns_record_data.get.value_schema.contains("DNSText"))
    assert(a.change_dns_record_data.get.value.contains("hello"))
  }

  test("vesting send-message and add-whitelist carry their detail structs") {
    val inner = new Boc.Builder().storeUint(BigInt(0), 8).build()
    val sendBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xa7733acdL), 32)
      .storeUint(BigInt(13), 64)
      .storeUint(BigInt(3), 8) // send_mode
      .storeRef(inner)
      .build())
    val send = Classifier.classify("vs1",
      Seq(tx("T1", "0:VEST", 10)),
      Map("T1" -> Seq(in("m1", "0:OWNER", "0:VEST",
        Some(Opcodes.VestingSendMessage), body = Some(sendBody))))).head
    assert(send.`type` == "vesting_send_message")
    assert(send.vesting_send_message_data.get.query_id.contains("13"))
    assert(send.vesting_send_message_data.get.message_boc
      .contains(Boc.serializeBase64(inner, withCrc = false)))

    val a1 = "0:" + "01" * 32
    val a2 = "0:" + "02" * 32
    val wlBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x7258a69bL), 32)
      .storeUint(BigInt(14), 64)
      .storeAddress(Some(a1))
      .storeRef(new Boc.Builder().storeAddress(Some(a2)).build())
      .build())
    val wl = Classifier.classify("vw1",
      Seq(tx("T1", "0:VEST", 10)),
      Map("T1" -> Seq(in("m1", "0:CREATOR", "0:VEST",
        Some(Opcodes.VestingAddWhitelist), body = Some(wlBody))))).head
    assert(wl.`type` == "vesting_add_whitelist")
    assert(wl.vesting_add_whitelist_data.get.query_id.contains("14"))
    assert(wl.vesting_add_whitelist_data.get.accounts_added == Seq(a1, a2))
  }

  test("merged dedust two-leg deposit carries both legs' amounts in " +
      "dex_deposit_liquidity_data") {
    // same trace shape as ProtocolLongTailSpec dd2: jetton partial leg +
    // TON final leg against one deposit contract
    val txs = Seq(
      tx("TROOT", "0:USER", 5),
      tx("TW1", "0:WA", 10), tx("TW2", "0:WB", 20),
      tx("TFACT", "0:FACT", 30), tx("TDEP1", "0:DEPC", 40),
      tx("TVAULT", "0:VAULT", 50), tx("TFACT2", "0:FACT2", 55),
      tx("TDEP2", "0:DEPC", 60), tx("TPOOL", "0:POOL", 70),
      tx("TLP", "0:LPW", 80))
    val jettonMaster = "0:" + "AB" * 32
    val vaultBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xd55e4686L), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(9999)).storeBit(false)
      .storeUint(BigInt(0), 4)
      .storeUint(BigInt(1), 4).storeInt(BigInt(0), 8)
      .storeBytes(Array.fill[Byte](32)(0xab.toByte))
      .storeRef(new Boc.Builder().storeCoins(BigInt(0))
        .storeCoins(BigInt(9999)).storeCoins(BigInt(5555)).build())
      .build())
    val poolBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xb56b9598L), 32).storeUint(BigInt(1), 64)
      .storeRef(Boc.Cell.empty)
      .storeAddress(Some("0:" + "AA" * 32)).storeCoins(BigInt(0))
      .storeRef(new Boc.Builder()
        .storeUint(BigInt(0), 4).storeCoins(BigInt(9999))
        .storeUint(BigInt(1), 4).storeInt(BigInt(0), 8)
        .storeBytes(Array.fill[Byte](32)(0xab.toByte))
        .storeCoins(BigInt(5555)).build())
      .storeBit(false).storeBit(false)
      .build())
    val jtBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x0f8a7ea5L), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(5555)) // jetton amount
      .storeAddress(Some("0:" + "0D" * 32))
      .storeAddress(None)
      .storeBit(false)
      .storeCoins(BigInt(0))
      .storeBit(false)
      .build())
    val msgs = Map(
      "TROOT" -> Seq(
        in("mr", null, "0:USER", None).copy(source = None),
        out("m1", "0:USER", "0:WA", Some(Opcodes.JettonTransfer),
          body = Some(jtBody)),
        out("m5", "0:USER", "0:VAULT", Some(Opcodes.DedustDepositTonToVault),
          value = 9999, createdLt = 3L)),
      "TW1" -> Seq(
        in("m1", "0:USER", "0:WA", Some(Opcodes.JettonTransfer),
          body = Some(jtBody)),
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
        in("m5", "0:USER", "0:VAULT", Some(Opcodes.DedustDepositTonToVault),
          value = 9999).copy(body = Some(vaultBody)),
        out("m5a", "0:VAULT", "0:FACT2", Some(Opcodes.DedustAskLiquidityFactory))),
      "TFACT2" -> Seq(
        in("m5a", "0:VAULT", "0:FACT2", Some(Opcodes.DedustAskLiquidityFactory)),
        out("m6", "0:FACT2", "0:DEPC", Some(Opcodes.DedustTopUpDepositContract))),
      "TDEP2" -> Seq(
        in("m6", "0:FACT2", "0:DEPC", Some(Opcodes.DedustTopUpDepositContract)),
        out("m7", "0:DEPC", "0:POOL", Some(Opcodes.DedustDepositToPool))),
      "TPOOL" -> Seq(in("m7", "0:DEPC", "0:POOL",
        Some(Opcodes.DedustDepositToPool)).copy(body = Some(poolBody)),
        out("m9", "0:POOL", "0:LPW", Some(Opcodes.JettonInternalTransfer))),
      "TLP" -> Seq(in("m9", "0:POOL", "0:LPW",
        Some(Opcodes.JettonInternalTransfer))))
    val actions = Classifier.classify("dd4", txs, msgs,
      jettonWallets = Map("0:WA" -> jettonMaster, "0:WB" -> jettonMaster))
    val deposits = actions.filter(_.`type` == "dex_deposit_liquidity")
    assert(deposits.size == 1)
    val d = deposits.head.dex_deposit_liquidity_data.get
    assert(d.dex.contains("dedust"))
    // combine_deposits slotting (liquidity.py:510-560): the FIRST
    // (jetton) leg takes slot 1, the final TON leg slot 2; TON renders
    // as a null asset
    assert(d.amount1.contains(BigDecimal(5555)), s"jetton leg amount: $d")
    assert(d.asset1.contains(jettonMaster))
    assert(d.user_jetton_wallet_1.contains("0:WA"))
    assert(d.amount2.contains(BigDecimal(9999)), s"TON leg amount: $d")
    assert(d.asset2.isEmpty)
    assert(deposits.head.destination_secondary.contains("0:DEPC"))
  }

  test("evaa supply/liquidate details decode from the success/satisfied leg") {
    val owner = "0:" + "AA" * 32
    // supply: user -> master 0x1 -> user contract 0x11 -> success 0x11a
    val successBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x11aL), 32)
      .storeUint(BigInt(1), 64)
      .storeAddress(Some(owner))
      .storeUint(BigInt(0xdeadL), 256)
      .storeUint(BigInt(777), 64)
      .build())
    val sTxs = Seq(tx("TM", "0:MASTER", 10), tx("TU", "0:UC", 20),
      tx("TM2", "0:MASTER", 30))
    val sMsgs = Map(
      "TM" -> Seq(
        in("m1", owner, "0:MASTER", Some(Opcodes.EvaaSupplyMaster),
          body = Some(Boc.serializeBase64(new Boc.Builder()
            .storeUint(BigInt(1), 32).storeUint(BigInt(1), 64).build()))),
        out("m2", "0:MASTER", "0:UC", Some(Opcodes.EvaaSupplyUser))),
      "TU" -> Seq(
        in("m2", "0:MASTER", "0:UC", Some(Opcodes.EvaaSupplyUser)),
        out("m3", "0:UC", "0:MASTER", Some(Opcodes.EvaaSupplySuccess),
          body = Some(successBody))),
      "TM2" -> Seq(in("m3", "0:UC", "0:MASTER",
        Some(Opcodes.EvaaSupplySuccess), body = Some(successBody))))
    val supply = Classifier.classify("ev1", sTxs, sMsgs)
      .find(_.`type` == "evaa_supply").get
    val sd = supply.evaa_supply_data.get
    assert(sd.master.contains("0:MASTER"))
    assert(sd.asset_id.contains("0xdead"), s"got $sd")

    // liquidate: 0x3 -> 0x31 -> satisfied 0x311 carrying debt + collateral
    val satBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x311L), 32)
      .storeUint(BigInt(1), 64)
      .storeAddress(Some(owner))
      .storeAddress(Some(owner))
      .storeUint(BigInt(5), 256)
      .storeRef(new Boc.Builder()
        .storeInt(BigInt(0), 64)
        .storeUint(BigInt(999), 64)
        .storeUint(BigInt(0), 64)
        .storeInt(BigInt(0), 64)
        .storeUint(BigInt(7), 256)
        .storeInt(BigInt(0), 64)
        .storeUint(BigInt(0), 64)
        .build())
      .build())
    val lTxs = Seq(tx("TM", "0:MASTER", 10), tx("TU", "0:UC", 20),
      tx("TM2", "0:MASTER", 30))
    val lMsgs = Map(
      "TM" -> Seq(
        in("m1", owner, "0:MASTER", Some(Opcodes.EvaaLiquidateMaster)),
        out("m2", "0:MASTER", "0:UC", Some(Opcodes.EvaaLiquidateUser))),
      "TU" -> Seq(
        in("m2", "0:MASTER", "0:UC", Some(Opcodes.EvaaLiquidateUser)),
        out("m3", "0:UC", "0:MASTER", Some(Opcodes.EvaaLiquidateSatisfied),
          body = Some(satBody))),
      "TM2" -> Seq(in("m3", "0:UC", "0:MASTER",
        Some(Opcodes.EvaaLiquidateSatisfied), body = Some(satBody))))
    val liq = Classifier.classify("ev2", lTxs, lMsgs)
      .find(_.`type` == "evaa_liquidate").get
    val ld = liq.evaa_liquidate_data.get
    assert(ld.debt_amount.contains(BigDecimal(999)), s"got $ld")
    assert(ld.asset_id.contains("0x7"))
  }

  test("cocoon details decode the shared query-id prefix and per-op " +
      "payloads") {
    def run(op: Long, body: Boc.Builder => Boc.Builder): Seq[ActionRow] = {
      val b = body(new Boc.Builder().storeUint(BigInt(op), 32)
        .storeUint(BigInt(42), 64))
      Classifier.classify("cc", Seq(tx("T1", "0:C", 10)),
        Map("T1" -> Seq(in("m1", "0:U", "0:C", Some(op),
          body = Some(Boc.serializeBase64(b.build()))))))
    }
    // the charge requires the client proxy-request child
    // (blocks/cocoon.py:336-360)
    val chargeBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xbb63ff93L), 32).storeUint(BigInt(42), 64)
      .storeUint(BigInt(84), 64).storeAddress(Some("0:" + "AB" * 32))
      .build())
    val charge = Classifier.classify("ccq",
      Seq(tx("T1", "0:C", 10), tx("T2", "0:CL", 20)),
      Map(
        "T1" -> Seq(in("m1", "0:U", "0:C", Some(0xbb63ff93L),
          body = Some(chargeBody)),
          out("m2", "0:C", "0:CL", Some(Opcodes.CocoonClientProxyRequest))),
        "T2" -> Seq(in("m2", "0:C", "0:CL",
          Some(Opcodes.CocoonClientProxyRequest)))))
      .find(_.`type` == "cocoon_proxy_charge").get
    assert(charge.cocoon_proxy_charge_data.get ==
      CocoonChargeData(Some("42"), Some(BigDecimal(84)),
        Some("0:" + "AB" * 32)))
    assert(charge.source.contains("0:C"))
    assert(charge.destination.contains("0:CL"))
    val unreg = run(0x6d49eaf2L, _.storeUint(BigInt(7), 32))
      .find(_.`type` == "cocoon_unregister_proxy").get
    assert(unreg.cocoon_unregister_proxy_data.get ==
      CocoonUnregisterProxyData(Some("42"), Some(7)))
    val hash = run(0xa9357034L,
      _.storeUint(BigInt(0xbeefL), 256).storeAddress(None))
      .find(_.`type` == "cocoon_client_change_secret_hash").get
    assert(hash.cocoon_client_change_secret_hash_data.get ==
      CocoonChangeSecretHashData(Some("42"), Some("beef")))
    val stake = run(0x6a1f6a60L,
      _.storeCoins(BigInt(12345)).storeAddress(None))
      .find(_.`type` == "cocoon_client_increase_stake").get
    assert(stake.cocoon_client_increase_stake_data.get ==
      CocoonIncreaseStakeData(Some("42"), Some(BigDecimal(12345))))
  }

  test("tonco full-context swap merges transfers and records min_out as " +
      "the out amount") {
    val user = "0:" + "1A" * 32
    def jtBody(amount: Long, dest: String): String =
      Boc.serializeBase64(new Boc.Builder()
        .storeUint(BigInt(0x0f8a7ea5L), 32)
        .storeUint(BigInt(1), 64)
        .storeCoins(BigInt(amount))
        .storeAddress(Some(dest))
        .storeAddress(None)
        .storeBit(false).storeCoins(BigInt(0)).storeBit(false)
        .build())
    val txs = Seq(tx("TA", "0:UW", 10), tx("TB", "0:RIW", 20),
      tx("TR", "0:ROUTER", 30), tx("TP", "0:POOL", 40),
      tx("TR2", "0:ROUTER", 50), tx("TC", "0:ROW", 60),
      tx("TD", "0:UOW", 70))
    val msgs = Map(
      "TA" -> Seq(in("m1", user, "0:UW", Some(Opcodes.JettonTransfer),
          body = Some(jtBody(500, "0:" + "1B" * 32))),
        out("m2", "0:UW", "0:RIW", Some(Opcodes.JettonInternalTransfer))),
      "TB" -> Seq(in("m2", "0:UW", "0:RIW",
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", "0:RIW", "0:ROUTER", Some(Opcodes.JettonNotify))),
      "TR" -> Seq(in("m3", "0:RIW", "0:ROUTER", Some(Opcodes.JettonNotify)),
        out("m4", "0:ROUTER", "0:POOL", Some(Opcodes.ToncoPoolV3Swap))),
      "TP" -> Seq(in("m4", "0:ROUTER", "0:POOL", Some(Opcodes.ToncoPoolV3Swap)),
        out("m5", "0:POOL", "0:ROUTER", Some(Opcodes.ToncoRouterV3PayTo))),
      "TR2" -> Seq(in("m5", "0:POOL", "0:ROUTER",
          Some(Opcodes.ToncoRouterV3PayTo)),
        out("m6", "0:ROUTER", "0:ROW", Some(Opcodes.JettonTransfer),
          body = Some(jtBody(650, user)))),
      "TC" -> Seq(in("m6", "0:ROUTER", "0:ROW", Some(Opcodes.JettonTransfer),
          body = Some(jtBody(650, user))),
        out("m7", "0:ROW", "0:UOW", Some(Opcodes.JettonInternalTransfer))),
      "TD" -> Seq(in("m7", "0:ROW", "0:UOW",
        Some(Opcodes.JettonInternalTransfer))))
    val acts = Classifier.classify("tc1", txs, msgs)
    val a = acts.find(_.`type` == "jetton_swap").get
    val d = a.jetton_swap_data.get
    assert(d.dex == "tonco")
    assert(d.dex_incoming_transfer.get.amount.contains(BigDecimal(500)))
    assert(d.dex_outgoing_transfer.get.amount.contains(BigDecimal(650)))
    // TONCO records min_out as the successful out amount
    // (blocks/swaps.py:1155)
    assert(d.min_out_amount.contains(BigDecimal(650)))
    assert(acts.count(_.`type` == "jetton_transfer") == 0)
  }

  test("stonfi v1 full-context swap merges in/out transfers with payment " +
      "amounts and the failed flag follows the exit code") {
    val user = "0:" + "0A" * 32
    val realUser = "0:" + "0B" * 32
    def jtBody(amount: Long, dest: String): String =
      Boc.serializeBase64(new Boc.Builder()
        .storeUint(BigInt(0x0f8a7ea5L), 32)
        .storeUint(BigInt(1), 64)
        .storeCoins(BigInt(amount))
        .storeAddress(Some(dest))
        .storeAddress(None)
        .storeBit(false).storeCoins(BigInt(0)).storeBit(false)
        .build())
    def swapBody: String = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x25938561L), 32)
      .storeUint(BigInt(1), 64)
      .storeAddress(Some(user))
      .storeAddress(Some("0:" + "0C" * 32))
      .storeCoins(BigInt(27051))
      .storeCoins(BigInt(1))
      .storeBit(false)
      .storeRef(new Boc.Builder().storeAddress(Some(realUser)).build())
      .build())
    def payBody(exit: Long, amount: Long): String =
      Boc.serializeBase64(new Boc.Builder()
        .storeUint(BigInt(0xf93bb43fL), 32)
        .storeUint(BigInt(1), 64)
        .storeAddress(Some(user))
        .storeUint(BigInt(exit), 32)
        .storeRef(new Boc.Builder()
          .storeCoins(BigInt(amount)).storeAddress(Some("0:" + "0D" * 32))
          .storeCoins(BigInt(0)).storeAddress(None).build())
        .build())
    def trace(exit: Long) = {
      val txs = Seq(tx("TA", "0:UW", 10), tx("TB", "0:RIW", 20),
        tx("TR", "0:ROUTER", 30), tx("TP", "0:POOL", 40),
        tx("TR2", "0:ROUTER", 50), tx("TC", "0:ROW", 60),
        tx("TD", "0:UOW", 70))
      val msgs = Map(
        "TA" -> Seq(in("m1", user, "0:UW", Some(Opcodes.JettonTransfer),
            body = Some(jtBody(27051, "0:" + "0E" * 32))),
          out("m2", "0:UW", "0:RIW", Some(Opcodes.JettonInternalTransfer))),
        "TB" -> Seq(in("m2", "0:UW", "0:RIW",
            Some(Opcodes.JettonInternalTransfer)),
          out("m3", "0:RIW", "0:ROUTER", Some(Opcodes.JettonNotify))),
        "TR" -> Seq(in("m3", "0:RIW", "0:ROUTER", Some(Opcodes.JettonNotify)),
          out("m4", "0:ROUTER", "0:POOL", Some(Opcodes.StonfiSwap),
            body = Some(swapBody))),
        "TP" -> Seq(in("m4", "0:ROUTER", "0:POOL", Some(Opcodes.StonfiSwap),
            body = Some(swapBody)),
          out("m5", "0:POOL", "0:ROUTER", Some(Opcodes.StonfiPayment),
            body = Some(payBody(exit, 28517)))),
        "TR2" -> Seq(in("m5", "0:POOL", "0:ROUTER",
            Some(Opcodes.StonfiPayment), body = Some(payBody(exit, 28517))),
          out("m6", "0:ROUTER", "0:ROW", Some(Opcodes.JettonTransfer),
            body = Some(jtBody(28517, user)))),
        "TC" -> Seq(in("m6", "0:ROUTER", "0:ROW", Some(Opcodes.JettonTransfer),
            body = Some(jtBody(28517, user))),
          out("m7", "0:ROW", "0:UOW", Some(Opcodes.JettonInternalTransfer))),
        "TD" -> Seq(in("m7", "0:ROW", "0:UOW",
          Some(Opcodes.JettonInternalTransfer))))
      (txs, msgs)
    }
    val (txs, msgs) = trace(0xc64370e5L) // ok
    val acts = Classifier.classify("sv1", txs, msgs)
    val a = acts.find(_.`type` == "jetton_swap").get
    assert(a.success)
    val d = a.jetton_swap_data.get
    assert(d.dex == "stonfi")
    assert(d.sender.contains(realUser))
    assert(d.dex_incoming_transfer.get.amount.contains(BigDecimal(27051)))
    assert(d.dex_incoming_transfer.get.source_jetton_wallet.contains("0:UW"))
    assert(d.dex_outgoing_transfer.get.amount.contains(BigDecimal(28517)))
    assert(d.dex_outgoing_transfer.get.source_jetton_wallet.contains("0:ROW"))
    // the whole route collapses into the one swap action
    assert(acts.count(_.`type` == "jetton_transfer") == 0)
    // a no-liquidity exit code marks the swap failed (swaps.py:63-70)
    val (ftxs, fmsgs) = trace(0x5ffe1295L)
    val f = Classifier.classify("sv1f", ftxs, fmsgs)
      .find(_.`type` == "jetton_swap").get
    assert(!f.success)
  }

  test("stonfi v1 swap takes from_real_user as sender; min_out stays null") {
    val realUser = "0:" + "03" * 32
    val swapBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x25938561L), 32)
      .storeUint(BigInt(1), 64)
      .storeAddress(Some("0:" + "01" * 32))
      .storeAddress(Some("0:" + "02" * 32))
      .storeCoins(BigInt(1000))
      .storeCoins(BigInt(950))
      .storeBit(false) // has_ref
      .storeRef(new Boc.Builder().storeAddress(Some(realUser)).build())
      .build())
    val txs = Seq(tx("TP", "0:POOL", 10), tx("TR", "0:ROUTER", 20))
    val msgs = Map(
      "TP" -> Seq(
        in("m1", "0:U", "0:POOL", Some(Opcodes.StonfiSwap),
          body = Some(swapBody)),
        out("m2", "0:POOL", "0:ROUTER", Some(Opcodes.StonfiPayment))),
      "TR" -> Seq(in("m2", "0:POOL", "0:ROUTER",
        Some(Opcodes.StonfiPayment))))
    val a = Classifier.classify("sf1", txs, msgs)
      .find(_.`type` == "jetton_swap").get
    // the reference's stonfi v1 dict carries NO min_out key
    // (swaps.py:175-186) — min_out_amount serializes null
    assert(a.jetton_swap_data.get.min_out_amount.isEmpty)
    assert(a.jetton_swap_data.get.dex == "stonfi")
    // sender = from_real_user from the body ref, not the router
    assert(a.source.contains(realUser))
    assert(a.jetton_swap_data.get.sender.contains(realUser))
  }

  test("jetton transfer payload cells serialize; encrypted comment stays base64") {
    import graft.functions.TlbDecoders
    val payload = new Boc.Builder()
      .storeUint(BigInt(0x2167da4bL), 32)
      .storeBytes(Array[Byte](1, 2, 3)).build()
    val custom = new Boc.Builder().storeUint(BigInt(7), 8).build()
    val body = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x0f8a7ea5L), 32)
      .storeUint(BigInt(5), 64)
      .storeCoins(BigInt(100))
      .storeAddress(Some("0:" + "0D" * 32))
      .storeAddress(None)
      .storeBit(true).storeRef(custom)
      .storeCoins(BigInt(0))
      .storeBit(true).storeRef(payload)
      .build())
    val d = TlbDecoders.jettonTransfer(body)
    // payload cells round-trip as base64 BOCs (blocks/jettons.py:88-97)
    assert(d.customPayload.contains(Boc.serializeBase64(custom)))
    assert(d.forwardPayload.contains(Boc.serializeBase64(payload)))
    // encrypted comment: base64 of the snake bytes, flag set
    assert(d.encryptedComment)
    assert(d.comment.contains(java.util.Base64.getEncoder
      .encodeToString(Array[Byte](1, 2, 3))))
    // plain comment still decodes as text with the flag down
    val plain = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x0f8a7ea5L), 32)
      .storeUint(BigInt(5), 64)
      .storeCoins(BigInt(100))
      .storeAddress(Some("0:" + "0D" * 32))
      .storeAddress(None)
      .storeBit(false)
      .storeCoins(BigInt(0))
      .storeBit(false)
      .storeUint(BigInt(0), 32)
      .storeBytes("hi".getBytes("UTF-8"))
      .build())
    val p = TlbDecoders.jettonTransfer(plain)
    assert(p.comment.contains("hi") && !p.encryptedComment)
    assert(p.forwardPayload.nonEmpty && p.customPayload.isEmpty)
  }

  test("nft transfer resolves index/collection via the nft_items dim and " +
      "serializes payload cells") {
    val newOwner = "0:" + "1D" * 32
    val fwd = new Boc.Builder().storeUint(BigInt(0xdeadL), 32).build()
    val body = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x5fcc3d14L), 32)
      .storeUint(BigInt(9), 64)
      .storeAddress(Some(newOwner))
      .storeAddress(None)
      .storeBit(false)
      .storeCoins(BigInt(1))
      .storeBit(true).storeRef(fwd)
      .build())
    val txs = Seq(tx("T1", "0:ITEM", 10))
    val msgs = Map("T1" -> Seq(
      in("m1", "0:OWNER", "0:ITEM", Some(Opcodes.NftTransfer),
        body = Some(body))))
    val a = Classifier.classify("nti", txs, msgs,
      nftItems = Map("0:ITEM" -> NftItemInfo(Some("5"), Some("0:COLL"))))
      .find(_.`type` == "nft_transfer").get
    assert(a.asset.contains("0:COLL"))
    assert(a.asset_secondary.contains("0:ITEM"))
    val d = a.nft_transfer_data.get
    assert(d.nft_item_index.contains("5"))
    assert(d.forward_payload.contains(Boc.serializeBase64(fwd)))
    assert(d.custom_payload.isEmpty)
    // without the dim the item itself stands in for the asset
    val bare = Classifier.classify("nti2", txs, msgs)
      .find(_.`type` == "nft_transfer").get
    assert(bare.asset.contains("0:ITEM"))
    assert(bare.nft_transfer_data.get.nft_item_index.isEmpty)
  }

  test("coffee create pool: two-stage creator + request/deploy/success") {
    val jettonHash = "1A" * 32
    val user2 = "0:" + "2B" * 32
    val rcpt = "0:" + "3C" * 32
    // pool_params: first=native, second=jetton; amm constant_product
    def storeParams(b: Boc.Builder): Boc.Builder = b
      .storeUint(BigInt(0), 2) // native$00
      .storeUint(BigInt(1), 2).storeUint(BigInt(0), 8) // jetton$01 wc 0
      .storeBytes(jettonHash.grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray)
      .storeUint(BigInt(0), 3) // constant_product
      .storeBit(false) // no amm_settings
    val nativeBody = Boc.serializeBase64 {
      val b = new Boc.Builder()
        .storeUint(BigInt(0xc0ffee02L), 32)
        .storeUint(BigInt(1), 64)
        .storeCoins(BigInt(111))
      storeParams(b)
        .storeAddress(Some(rcpt)) // creation_params.public.recipient
        .storeBit(false).storeBit(false) // use_on_failure, no notification
        .build()
    }
    val reqBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xc0ffee25L), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(111)).storeCoins(BigInt(222))
      .storeAddress(Some(user2))
      .storeRef(Boc.Cell.empty).storeRef(Boc.Cell.empty)
      .build())
    val successBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xc0ffee33L), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(111)).storeCoins(BigInt(222))
      .storeCoins(BigInt(777)) // lp minted
      .build())
    val txs = Seq(tx("T1", "0:FAC", 10), tx("T2", "0:CRM", 20),
      tx("T3", "0:CRC", 30), tx("T4", "0:PM", 40), tx("T5", "0:POOL", 50),
      tx("T6", "0:EVT", 60))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:USER", "0:FAC", Some(Opcodes.CoffeeCreatePoolNative),
          body = Some(nativeBody)),
        out("m2", "0:FAC", "0:CRM", Some(Opcodes.CoffeeCreatePoolCreator))),
      "T2" -> Seq(in("m2", "0:FAC", "0:CRM",
          Some(Opcodes.CoffeeCreatePoolCreator)),
        out("m3", "0:CRM", "0:CRC", Some(Opcodes.CoffeeDeploy))),
      "T3" -> Seq(in("m3", "0:CRM", "0:CRC", Some(Opcodes.CoffeeDeploy)),
        out("m4", "0:CRC", "0:PM", Some(Opcodes.CoffeeCreatePoolRequest),
          body = Some(reqBody))),
      "T4" -> Seq(in("m4", "0:CRC", "0:PM",
          Some(Opcodes.CoffeeCreatePoolRequest), body = Some(reqBody)),
        out("m5", "0:PM", "0:POOL", Some(Opcodes.CoffeeDeploy))),
      "T5" -> Seq(in("m5", "0:PM", "0:POOL", Some(Opcodes.CoffeeDeploy)),
        out("m6", "0:POOL", "0:EVT",
          Some(Opcodes.CoffeeDepositLiquiditySuccess),
          body = Some(successBody))),
      "T6" -> Seq(in("m6", "0:POOL", "0:EVT",
        Some(Opcodes.CoffeeDepositLiquiditySuccess),
        body = Some(successBody))))
    val acts = Classifier.classify("ccp", txs, msgs)
    val a = acts.find(_.`type` == "coffee_create_pool").get
    val d = a.coffee_create_pool_data.get
    assert(d.amount_1.contains(BigDecimal(111)))
    assert(d.amount_2.contains(BigDecimal(222)))
    assert(d.initiator_1.contains("0:USER"))
    assert(d.initiator_2.contains(user2))
    assert(d.provided_asset.isEmpty) // native TON serializes as null
    assert(d.lp_tokens_minted.contains(BigDecimal(777)))
    assert(a.destination.contains("0:POOL"))
    assert(a.destination_secondary.contains("0:CRC"))
    assert(a.asset2.contains("0:" + jettonHash)) // the pool's second asset
    assert(!acts.exists(_.`type` == "coffee_create_pool_creator"))
  }

  test("coffee staking withdraw decodes nft/points from withdraw_2") {
    val owner = "0:" + "0E" * 32
    val poolJw = "0:" + "0F" * 32
    val w2Body = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xcb03bfafL), 32)
      .storeUint(BigInt(1), 64)
      .storeUint(BigInt(77), 64) // nft_id
      .storeAddress(Some(owner))
      .storeCoins(BigInt(1234)) // points
      .storeRef(new Boc.Builder()
        .storeAddress(Some(poolJw)).storeCoins(BigInt(5000)).build())
      .build())
    val w3Body = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xcb03bfafL), 32)
      .storeUint(BigInt(1), 64)
      .storeAddress(Some(poolJw))
      .storeCoins(BigInt(5000))
      .storeAddress(Some(owner))
      .build())
    val jtBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x0f8a7ea5L), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(5000))
      .storeAddress(Some(owner))
      .storeAddress(None)
      .storeBit(false)
      .storeCoins(BigInt(0))
      .storeBit(false)
      .build())
    val txs = Seq(tx("T1", "0:NFT", 10), tx("T2", "0:MASTER", 20),
      tx("T3", "0:C", 30), tx("T4", "0:JW", 40), tx("T5", "0:UJW", 50))
    val op = Some(Opcodes.CoffeeStakingWithdraw)
    val msgs = Map(
      "T1" -> Seq(in("m1", "0:USER", "0:NFT", op),
        out("m2", "0:NFT", "0:MASTER", op, body = Some(w2Body))),
      "T2" -> Seq(in("m2", "0:NFT", "0:MASTER", op, body = Some(w2Body)),
        out("m3", "0:MASTER", "0:C", op, body = Some(w3Body))),
      "T3" -> Seq(in("m3", "0:MASTER", "0:C", op, body = Some(w3Body)),
        out("m4", "0:C", "0:JW", Some(Opcodes.JettonTransfer),
          body = Some(jtBody))),
      "T4" -> Seq(in("m4", "0:C", "0:JW", Some(Opcodes.JettonTransfer),
          body = Some(jtBody)),
        out("m5", "0:JW", "0:UJW", Some(Opcodes.JettonInternalTransfer))),
      "T5" -> Seq(in("m5", "0:JW", "0:UJW",
        Some(Opcodes.JettonInternalTransfer))))
    val a = Classifier.classify("csw", txs, msgs)
      .find(_.`type` == "coffee_staking_withdraw").get
    val d = a.coffee_staking_withdraw_data.get
    assert(d.nft_address.contains("0:NFT"))
    assert(d.nft_index.contains("77"))
    assert(d.points.contains(BigDecimal(1234)))
    assert(a.source.contains(owner))
    assert(a.destination.contains("0:NFT")) // withdraw_2 msg source
    assert(a.value.contains(BigDecimal(5000)))
    assert(a.destination_secondary.contains(poolJw))
  }

  // ---------------------------------------------------------- layerzero
  // Cell fixtures mirror the protocol's FunC builders
  // (messages/layerzero.py:86-203,925-960)

  private def ones(b: Boc.Builder, n: Int): Boc.Builder =
    b.storeUint((BigInt(1) << n) - 1, n)

  private val lzSrcOapp = BigInt("12" * 32, 16)
  private val lzDstOapp = BigInt("0b" * 32, 16)
  private val lzGuid = BigInt("cd" * 32, 16)

  private def lzPathCell: Boc.Cell =
    ones(new Boc.Builder()
      .storeUint(BigInt("8903714975572488637007080065659"), 152), 198)
      .storeUint(BigInt(30343), 32).storeUint(lzSrcOapp, 256)
      .storeUint(BigInt(30102), 32).storeUint(lzDstOapp, 256)
      .build()

  private def lzPacketCell: Boc.Cell =
    ones(new Boc.Builder()
      .storeUint(BigInt("417359019239977417716476838698419835"), 152), 198)
      .storeRef(lzPathCell)
      .storeRef(new Boc.Builder()
        .storeBytes(Array(0xde, 0xad, 0xbe, 0xef).map(_.toByte)).build())
      .storeUint(BigInt(99), 64).storeUint(lzGuid, 256)
      .build()

  private def lzSendMdCell: Boc.Cell =
    ones(new Boc.Builder()
      .storeUint(BigInt("6c7a53656e64", 16), 80)
      .storeUint(BigInt("582890735024998957421269964955452773563747974476099581"), 180), 90)
      .storeUint(BigInt(7), 64)                 // sendRequestId
      .storeUint(BigInt("ab" * 32, 16), 256)    // msglibManager
      .storeUint(BigInt("ef" * 32, 16), 256)    // msglib
      .storeRef(lzPacketCell)
      .storeRef(Boc.Cell.empty)                 // extraOptions
      .storeRef(new Boc.Builder()
        .storeUint(BigInt(0), 256)              // msglibConnection
        .storeUint(BigInt(1000), 128).storeUint(BigInt(5), 128)
        .build())
      .build()

  test("layerzero send decodes the LzSend MD through the full chain") {
    val cbBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xa2b5fbaeL), 32)
      .storeRef(new Boc.Builder().storeRef(
        new Boc.Builder().storeRef(lzSendMdCell).build()).build())
      .build())
    val txs = Seq(tx("T1", "0:EP", 10), tx("T2", "0:CH", 20),
      tx("T3", "0:MLC", 30), tx("T4", "0:ULN", 40),
      tx("T5", "0:CH", 50), tx("T6", "0:OAPP", 60))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:OAPP", "0:EP", Some(Opcodes.LayerZeroEndpointSend)),
        out("m2", "0:EP", "0:CH", Some(Opcodes.LayerZeroChannelSend))),
      "T2" -> Seq(in("m2", "0:EP", "0:CH", Some(Opcodes.LayerZeroChannelSend)),
        out("m3", "0:CH", "0:MLC", Some(Opcodes.LayerZeroMsglibConnectionSend))),
      "T3" -> Seq(in("m3", "0:CH", "0:MLC", Some(Opcodes.LayerZeroMsglibConnectionSend)),
        out("m4", "0:MLC", "0:ULN", Some(Opcodes.LayerZeroUlnSend))),
      "T4" -> Seq(in("m4", "0:MLC", "0:ULN", Some(Opcodes.LayerZeroUlnSend)),
        out("m5", "0:ULN", "0:CH", Some(Opcodes.LayerZeroMsglibSendCallback))),
      "T5" -> Seq(in("m5", "0:ULN", "0:CH", Some(Opcodes.LayerZeroMsglibSendCallback)),
        out("m6", "0:CH", "0:OAPP", Some(Opcodes.LayerZeroChannelSendCallback),
          body = Some(cbBody))),
      "T6" -> Seq(in("m6", "0:CH", "0:OAPP",
        Some(Opcodes.LayerZeroChannelSendCallback), body = Some(cbBody))))
    val acts = Classifier.classify("lzs", txs, msgs)
    val a = acts.find(_.`type` == "layerzero_send").get
    val sd = a.layerzero_send_data.get
    assert(sd.send_request_id.contains(BigDecimal(7)))
    assert(sd.msglib_manager.contains("0x" + "ab" * 32))
    assert(sd.msglib.contains("0x" + "ef" * 32))
    assert(sd.uln.contains("0:ULN"))
    assert(sd.native_fee.contains(BigDecimal(1000)))
    assert(sd.zro_fee.contains(BigDecimal(5)))
    assert(sd.endpoint.contains("0:EP"))
    assert(sd.channel.contains("0:CH"))
    val pd = a.layerzero_packet_data.get
    assert(pd.src_eid.contains(30343) && pd.dst_eid.contains(30102))
    assert(pd.src_oapp.contains("0x" + "12" * 32))
    // hex() drops leading zeros, like the reference's hex(uint256)
    assert(pd.dst_oapp.contains("0x" + lzDstOapp.toString(16)))
    assert(pd.nonce.contains(BigDecimal(99)))
    assert(pd.guid.contains("0x" + "cd" * 32))
    assert(pd.message.contains("0xdeadbeef"))
    assert(a.source.contains("0:OAPP") && a.destination.isEmpty)
    // the whole chain collapses into the one action
    assert(acts.count(_.`type` == "call_contract") == 0)
  }

  test("layerzero commit packet decodes the packet from the channel body") {
    val commitBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x5388cd88L), 32)
      .storeRef(new Boc.Builder().storeRef(lzPacketCell).build())
      .build())
    val txs = Seq(tx("T1", "0:ULN", 10), tx("T2", "0:UC", 20),
      tx("T3", "0:EP", 30), tx("T4", "0:CH", 40), tx("T5", "0:MLC", 50))
    val msgs = Map(
      "T1" -> Seq(in("m1", "0:EXEC", "0:ULN", Some(Opcodes.LayerZeroUlnCommitPacket)),
        out("m2", "0:ULN", "0:UC", Some(Opcodes.LayerZeroUlnConnectionCommitPacket))),
      "T2" -> Seq(in("m2", "0:ULN", "0:UC", Some(Opcodes.LayerZeroUlnConnectionCommitPacket)),
        out("m3", "0:UC", "0:EP", Some(Opcodes.LayerZeroEndpointCommitPacket))),
      "T3" -> Seq(in("m3", "0:UC", "0:EP", Some(Opcodes.LayerZeroEndpointCommitPacket)),
        out("m4", "0:EP", "0:CH", Some(Opcodes.LayerZeroChannelCommitPacket),
          body = Some(commitBody))),
      "T4" -> Seq(in("m4", "0:EP", "0:CH", Some(Opcodes.LayerZeroChannelCommitPacket),
          body = Some(commitBody)),
        out("m5", "0:CH", "0:MLC", Some(Opcodes.LayerZeroMsglibCommitCallback))),
      "T5" -> Seq(in("m5", "0:CH", "0:MLC",
        Some(Opcodes.LayerZeroMsglibCommitCallback))))
    val a = Classifier.classify("lzc", txs, msgs)
      .find(_.`type` == "layerzero_commit_packet").get
    assert(a.source.contains("0:EXEC"))
    assert(a.destination.contains("0:UC"))
    assert(a.source_secondary.contains("0:EP"))
    assert(a.destination_secondary.contains("0:UC"))
    assert(a.asset.contains("0:CH"))
    assert(a.asset_secondary.contains("0:MLC"))
    assert(a.layerzero_packet_data.get.nonce.contains(BigDecimal(99)))
    assert(a.layerzero_packet_data.get.message.contains("0xdeadbeef"))
  }

  test("layerzero receive requires the executing oapp to match dst_oapp") {
    val execBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xcaae25a1L), 32)
      .storeRef(new Boc.Builder().storeRef(lzPacketCell).build())
      .build())
    val oapp = "0:" + "0B" * 32 // == packet dst_oapp
    def fixture(dest: String) = {
      val txs = Seq(tx("T1", "0:CH", 10), tx("T2", dest, 20),
        tx("T3", "0:CH", 30), tx("T4", dest, 40), tx("T5", "0:CH", 50))
      // the packet rides the LZ_RECEIVE_EXECUTE body, which goes
      // channel -> OApp (blocks/layerzero.py:392-401)
      val msgs = Map(
        "T1" -> Seq(in("m1", "0:EXEC", "0:CH", Some(Opcodes.LayerZeroChannelLzReceivePrepare)),
          out("m2", "0:CH", dest, Some(Opcodes.LayerZeroLzReceivePrepare))),
        "T2" -> Seq(in("m2", "0:CH", dest, Some(Opcodes.LayerZeroLzReceivePrepare)),
          out("m3", dest, "0:CH", Some(Opcodes.LayerZeroChannelLzReceiveLock))),
        "T3" -> Seq(in("m3", dest, "0:CH", Some(Opcodes.LayerZeroChannelLzReceiveLock)),
          out("m4", "0:CH", dest, Some(Opcodes.LayerZeroLzReceiveExecute),
            body = Some(execBody))),
        "T4" -> Seq(in("m4", "0:CH", dest, Some(Opcodes.LayerZeroLzReceiveExecute),
          body = Some(execBody)),
          out("m5", dest, "0:CH", Some(Opcodes.LayerZeroOappExecuteCallback),
            body = Some(execBody))),
        "T5" -> Seq(in("m5", dest, "0:CH",
          Some(Opcodes.LayerZeroOappExecuteCallback), body = Some(execBody))))
      (txs, msgs)
    }
    val (txs, msgs) = fixture(oapp)
    val a = Classifier.classify("lzr", txs, msgs)
      .find(_.`type` == "layerzero_receive").get
    assert(a.destination.contains(oapp))
    assert(a.destination_secondary.contains("0:CH"))
    assert(a.layerzero_packet_data.get.guid.contains("0x" + "cd" * 32))
    // wrong executing OApp ⇒ no receive action (reference guard :399-401)
    val (wtxs, wmsgs) = fixture("0:" + "0C" * 32)
    assert(!Classifier.classify("lzr2", wtxs, wmsgs)
      .exists(_.`type` == "layerzero_receive"))
  }

  test("layerzero dvn verify decodes nonce and status from the callback") {
    val verifyBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x3cb38090L), 32)
      .storeRef(new Boc.Builder().storeRef(
        ones(new Boc.Builder()
          .storeUint(BigInt("38421788582694199859296615363593851"), 116), 234)
          .storeUint(BigInt(42), 64).storeUint(BigInt(0x3bbc306bL), 32)
          .build()).build())
      .build())
    val txs = Seq(tx("T1", "0:DVN", 10), tx("T2", "0:PRX", 20),
      tx("T3", "0:ULN", 30), tx("T4", "0:UC", 40), tx("T5", "0:ULN", 50))
    val msgs = Map(
      "T1" -> Seq(in("m1", "0:ADMIN", "0:DVN", Some(Opcodes.LayerZeroDvnVerify)),
        out("m2", "0:DVN", "0:PRX", Some(Opcodes.LayerZeroProxyCall))),
      "T2" -> Seq(in("m2", "0:DVN", "0:PRX", Some(Opcodes.LayerZeroProxyCall)),
        out("m3", "0:PRX", "0:ULN", Some(Opcodes.LayerZeroUlnVerify))),
      "T3" -> Seq(in("m3", "0:PRX", "0:ULN", Some(Opcodes.LayerZeroUlnVerify)),
        out("m4", "0:ULN", "0:UC", Some(Opcodes.LayerZeroUlnConnectionVerify))),
      "T4" -> Seq(in("m4", "0:ULN", "0:UC", Some(Opcodes.LayerZeroUlnConnectionVerify)),
        out("m5", "0:UC", "0:ULN", Some(Opcodes.LayerZeroUlnVerifyCallback),
          body = Some(verifyBody))),
      "T5" -> Seq(in("m5", "0:UC", "0:ULN",
        Some(Opcodes.LayerZeroUlnVerifyCallback), body = Some(verifyBody))))
    val a = Classifier.classify("lzv", txs, msgs)
      .find(_.`type` == "layerzero_dvn_verify").get
    val d = a.layerzero_dvn_verify_data.get
    assert(d.nonce.contains(BigDecimal(42)))
    assert(d.status.contains("succeeded"))
    assert(d.dvn.contains("0:DVN"))
    assert(d.proxy.contains("0:PRX"))
    assert(d.uln.contains("0:ULN"))
    assert(d.uln_connection.contains("0:UC"))
    assert(a.source.contains("0:ADMIN"))
  }

  test("tonco deploy pool decodes the init body's pool parameters") {
    val m0 = "0:" + "0A" * 32
    val m1 = "0:" + "0B" * 32
    val initBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x441c39edL), 32)
      .storeUint(BigInt(1), 64)
      .storeBit(true).storeBit(false)
      .storeAddress(None)
      .storeBit(false)
      .storeAddress(None)
      .storeBit(true)
      .storeInt(BigInt(-60), 24)
      .storeBit(true)
      .storeUint(BigInt(12345), 160)
      .storeBit(true).storeBit(true)
      .storeUint(BigInt(30), 16)
      .storeUint(BigInt(100), 16)
      .storeUint(BigInt(90), 16)
      .storeRef(new Boc.Builder().build())
      .storeRef(new Boc.Builder().build())
      .storeBit(true)
      .storeRef(new Boc.Builder()
        .storeAddress(Some(m0)).storeAddress(Some(m1)).build())
      .build())
    val txs = Seq(tx("TR", "0:ROUTER", 10), tx("TP", "0:POOL", 20))
    val msgs = Map(
      "TR" -> Seq(
        in("m1", "0:DEPLOYER", "0:ROUTER",
          Some(Opcodes.ToncoRouterV3CreatePool)),
        out("m2", "0:ROUTER", "0:POOL", Some(Opcodes.ToncoPoolV3Init),
          body = Some(initBody))),
      "TP" -> Seq(in("m2", "0:ROUTER", "0:POOL",
        Some(Opcodes.ToncoPoolV3Init), body = Some(initBody))))
    val a = Classifier.classify("tp1", txs, msgs)
      .find(_.`type` == "tonco_deploy_pool").get
    val d = a.tonco_deploy_pool_data.get
    assert(d.tick_spacing.contains(-60))
    assert(d.initial_price_x96.contains(BigDecimal(12345)))
    assert(d.protocol_fee.contains(30))
    assert(d.lp_fee_base.contains(100))
    assert(d.lp_fee_current.contains(90))
    assert(d.pool_active.contains(true))
    assert(d.jetton0_minter.contains(m0))
    assert(d.jetton1_minter.contains(m1))
  }

  test("jvault claim decodes the 267-bit wallet-address dict; stake " +
      "carries its wallet") {
    val w1 = "0:" + "11" * 32
    val w2 = "0:" + "22" * 32
    def addrKey(a: String): BigInt = {
      val Array(wc, hex) = a.split(":")
      (BigInt(2) << 265) | (BigInt(wc.toInt & 0xff) << 256) | BigInt(hex, 16)
    }
    // buildDictRefs emits the full HashmapE fragment (maybe-bit + root
    // ref) — splice its parts into the body
    val ds = Boc.buildDictRefs(
      Map(addrKey(w1) -> new Boc.Builder().build(),
        addrKey(w2) -> new Boc.Builder().build()), 267).beginParse()
    assert(ds.loadBit())
    val claimBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x78d9f109L), 32)
      .storeUint(BigInt(1), 64)
      .storeBit(true).storeRef(ds.loadRef())
      .build())
    val claim = Classifier.classify("jv1",
      Seq(tx("T1", "0:SW", 10)),
      Map("T1" -> Seq(in("m1", "0:U", "0:SW", Some(Opcodes.JvaultClaim),
        body = Some(claimBody))))).head
    assert(claim.`type` == "jvault_claim")
    assert(claim.jvault_claim_data.get.claimed_jettons == Seq(w1, w2).sorted,
      s"got ${claim.jvault_claim_data}")

    val stake = Classifier.classify("jv2",
      Seq(tx("T1", "0:STAKEW", 10)),
      Map("T1" -> Seq(in("m1", "0:U", "0:STAKEW",
        Some(Opcodes.JvaultReceiveJettons))))).head
    assert(stake.`type` == "jvault_stake")
    assert(stake.jvault_stake_data.get.stake_wallet.contains("0:STAKEW"))
  }

  test("dedust withdraw decodes both payout amounts and the burnt LP") {
    def payoutBody(amount: Long): String =
      Boc.serializeBase64(new Boc.Builder()
        .storeUint(BigInt(0x474f86cfL), 32)
        .storeUint(BigInt(1), 64)
        .storeRef(new Boc.Builder().storeUint(BigInt(0), 1).build())
        .storeCoins(BigInt(amount))
        .build())
    val burnBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x595f07bcL), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(333)) // LP burnt
      .storeAddress(None)
      .build())
    val txs = Seq(tx("TB", "0:LPW", 10), tx("TP1", "0:V1", 20),
      tx("TP2", "0:V2", 30))
    val msgs = Map(
      "TB" -> Seq(
        in("m1", "0:OWNER", "0:LPW", Some(Opcodes.JettonBurn),
          body = Some(burnBody)),
        out("m2", "0:LPW", "0:V1", Some(Opcodes.DedustPayout),
          body = Some(payoutBody(100))),
        out("m3", "0:LPW", "0:V2", Some(Opcodes.DedustPayout),
          createdLt = 3L, body = Some(payoutBody(200)))),
      "TP1" -> Seq(in("m2", "0:LPW", "0:V1", Some(Opcodes.DedustPayout),
        body = Some(payoutBody(100)))),
      "TP2" -> Seq(in("m3", "0:LPW", "0:V2", Some(Opcodes.DedustPayout),
        body = Some(payoutBody(200)))))
    val actions = Classifier.classify("dw1", txs, msgs)
    val w = actions.find(_.`type` == "dex_withdraw_liquidity").get
    val d = w.dex_withdraw_liquidity_data.get
    assert(d.dex.contains("dedust"))
    assert(d.lp_tokens_burnt.contains(BigDecimal(333)))
    assert(Set(d.amount1, d.amount2) ==
      Set(Some(BigDecimal(100)), Some(BigDecimal(200))), s"got $d")
  }
}
