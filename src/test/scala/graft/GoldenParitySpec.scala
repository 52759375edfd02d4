package graft

import graft.classifier._
import graft.functions.Boc

/** Field-level golden parity: four fixture traces replicate reference
  * YAML expectation cases (indexer/tests/test_cases/jetton-transfer.yaml,
  * stonfi-swaps.yaml, dedust-liquidities.yaml, layerzero.yaml) and assert the SAME
  * dot-path fields those YAMLs pin — endpoint columns, secondaries, and
  * every populated key of the nested detail structs — not just action
  * type and count.
  */
class GoldenParitySpec extends SparkSpec {

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

  /** Full TEP-74 body: query_id, amount, destination, response
    * destination, forward_ton_amount, inline comment payload. */
  private def transferBody(qid: Long, amount: Long, dest: String,
      resp: String, fwd: Long, comment: String): String = {
    val b = new Boc.Builder()
      .storeUint(BigInt(0x0f8a7ea5L), 32)
      .storeUint(BigInt(qid), 64)
      .storeCoins(BigInt(amount))
      .storeAddress(Some(dest))
      .storeAddress(Some(resp))
      .storeBit(false)
      .storeCoins(BigInt(fwd))
      .storeBit(true)
    b.storeRef(new Boc.Builder()
      .storeUint(BigInt(0), 32).storeBytes(comment.getBytes("UTF-8")).build())
    Boc.serializeBase64(b.build())
  }

  private val owner = "0:" + "7F" * 32
  private val receiver = "0:" + "73" * 32
  private val senderWallet = "0:SW"
  private val receiverWallet = "0:RW"

  private def jettonTransferTrace(qid: Long, amount: Long) = {
    val body = transferBody(qid, amount, receiver, owner, 1, "11")
    val txs = Seq(tx("TW1", senderWallet, 10), tx("TW2", receiverWallet, 20),
      tx("TN", receiver, 30))
    val msgs = Map(
      "TW1" -> Seq(
        in("m1", owner, senderWallet, Some(Opcodes.JettonTransfer),
          body = Some(body)),
        out("m2", senderWallet, receiverWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "TW2" -> Seq(
        in("m2", senderWallet, receiverWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", receiverWallet, receiver, Some(Opcodes.JettonNotify))),
      "TN" -> Seq(in("m3", receiverWallet, receiver,
        Some(Opcodes.JettonNotify))))
    (txs, msgs)
  }

  test("jetton-transfer.yaml parity: endpoint columns, wallet secondaries " +
      "and every jetton_transfer_data field the YAML pins") {
    val (txs, msgs) = jettonTransferTrace(31, 5000)
    val actions = Classifier.classify("gp1", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_transfer"))
    val a = actions.head
    // endpoint columns (values.source / source_secondary / destination /
    // destination_secondary / accounts in the YAML)
    assert(a.source.contains(owner))
    assert(a.source_secondary.contains(senderWallet))
    assert(a.destination.contains(receiver))
    assert(a.destination_secondary.contains(receiverWallet))
    assert(a.value.contains(BigDecimal(5000)))
    assert(a.tx_hashes.toSet == Set("TW1", "TW2", "TN"))
    assert(a.success)
    // jetton_transfer_data.{query_id, response_destination,
    // forward_amount, custom_payload, comment, is_encrypted_comment}
    val d = a.jetton_transfer_data.get
    assert(d.query_id.contains("31"))
    assert(d.response_destination.contains(owner))
    assert(d.forward_amount.contains(BigDecimal(1)))
    assert(d.custom_payload.isEmpty)
    assert(d.comment.contains("11"))
    assert(d.is_encrypted_comment.contains(false))
    // with the wallet repository the asset is the MASTER (the YAML's
    // `asset` column) resolved via the RECEIVER wallet row — which must
    // exist, or the matcher refuses entirely (jettons.py:70-74)
    val master = "0:" + "2F" * 32
    val resolved = Classifier.classify("gp1b", txs, msgs,
      jettonWallets = Map(senderWallet -> master,
        receiverWallet -> master)).head
    assert(resolved.asset.contains(master))
  }

  test("stonfi-swaps.yaml parity: dex_incoming/outgoing transfer " +
      "amount/source/destination/wallet fields through a two-leg swap") {
    val user = "0:" + "CB" * 32
    val router = "0:" + "77" * 32
    val userWallet = "0:UW"
    val routerInWallet = "0:RIW"
    val routerOutWallet = "0:ROW"
    val userOutWallet = "0:UOW"
    val inBody = transferBody(9, 27051, router, user, 1, "in")
    val outBody = transferBody(9, 28517, user, router, 1, "out")
    // user -> user wallet -> router's IN wallet -> notify to ROUTER ->
    // router orders the OUT transfer from its wallet back to the user
    val txs = Seq(tx("TA", userWallet, 10), tx("TB", routerInWallet, 20),
      tx("TR", router, 30),
      tx("TC", routerOutWallet, 40), tx("TD", userOutWallet, 50))
    val msgs = Map(
      "TA" -> Seq(
        in("m1", user, userWallet, Some(Opcodes.JettonTransfer),
          body = Some(inBody)),
        out("m2", userWallet, routerInWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "TB" -> Seq(
        in("m2", userWallet, routerInWallet,
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", routerInWallet, router, Some(Opcodes.JettonNotify))),
      "TR" -> Seq(
        in("m3", routerInWallet, router, Some(Opcodes.JettonNotify)),
        out("m4", router, routerOutWallet, Some(Opcodes.JettonTransfer),
          body = Some(outBody))),
      "TC" -> Seq(
        in("m4", router, routerOutWallet, Some(Opcodes.JettonTransfer),
          body = Some(outBody)),
        out("m5", routerOutWallet, userOutWallet,
          Some(Opcodes.JettonInternalTransfer))),
      "TD" -> Seq(in("m5", routerOutWallet, userOutWallet,
        Some(Opcodes.JettonInternalTransfer))))
    val actions = Classifier.classify("gp2", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_swap"),
      s"got ${actions.map(_.`type`)}")
    val sd = actions.head.jetton_swap_data.get
    // jetton_swap_data.{dex, sender, dex_incoming_transfer.*,
    // dex_outgoing_transfer.*} — the exact paths stonfi-swaps.yaml pins
    assert(sd.sender.contains(user))
    val inc = sd.dex_incoming_transfer.get
    assert(inc.amount.contains(BigDecimal(27051)))
    assert(inc.source.contains(user))
    assert(inc.source_jetton_wallet.contains(userWallet))
    assert(inc.destination.contains(router))
    val outT = sd.dex_outgoing_transfer.get
    assert(outT.amount.contains(BigDecimal(28517)))
    assert(outT.source.contains(router))
    assert(outT.source_jetton_wallet.contains(routerOutWallet))
    assert(outT.destination.contains(user))
    // action endpoints mirror the YAML's source/destination columns
    assert(actions.head.source.contains(user))
  }

  test("dedust-liquidities.yaml parity: the partial deposit pins asset1 " +
      "via the wallet repository, amount1, wallet slot 1 and a null slot 2") {
    val user = "0:" + "A6" * 32
    val userWallet = "0:" + "09" * 32
    val master = "0:" + "65" * 32
    val depositContract = "0:" + "DF" * 32
    val body = transferBody(5, 51504, "0:" + "5F" * 32, user, 1, "d")
    val txs = Seq(tx("TW1", userWallet, 10), tx("TW2", "0:VW", 20),
      tx("TFACT", "0:FACT", 30), tx("TDEP", depositContract, 40))
    val msgs = Map(
      "TW1" -> Seq(
        in("m1", user, userWallet, Some(Opcodes.JettonTransfer),
          body = Some(body)),
        out("m2", userWallet, "0:VW", Some(Opcodes.JettonInternalTransfer))),
      "TW2" -> Seq(
        in("m2", userWallet, "0:VW", Some(Opcodes.JettonInternalTransfer)),
        out("m3", "0:VW", "0:FACT", Some(Opcodes.DedustAskLiquidityFactory))),
      "TFACT" -> Seq(
        in("m3", "0:VW", "0:FACT", Some(Opcodes.DedustAskLiquidityFactory)),
        out("m4", "0:FACT", depositContract,
          Some(Opcodes.DedustDeployDepositContract))),
      "TDEP" -> Seq(in("m4", "0:FACT", depositContract,
        Some(Opcodes.DedustDeployDepositContract))))
    val actions = Classifier.classify("gp3", txs, msgs,
      // the vault wallet row must exist or the transfer matcher refuses
      // the leg outright (jettons.py:70-74)
      jettonWallets = Map(userWallet -> master, "0:VW" -> master))
    assert(actions.map(_.`type`) == Seq("dex_deposit_liquidity"))
    val a = actions.head
    // values.source / destination_secondary (the deposit contract)
    assert(a.source.contains(user))
    assert(a.destination_secondary.contains(depositContract))
    assert(a.success)
    // dex_deposit_liquidity_data.{dex, asset1, amount1, asset2, amount2,
    // user_jetton_wallet_1, user_jetton_wallet_2, lp_tokens_minted}
    val d = a.dex_deposit_liquidity_data.get
    assert(d.dex.contains("dedust"))
    assert(d.asset1.contains(master), s"repository-resolved master: $d")
    assert(d.amount1.contains(BigDecimal(51504)))
    assert(d.asset2.isEmpty)
    assert(d.amount2.isEmpty)
    assert(d.user_jetton_wallet_1.contains(userWallet))
    assert(d.user_jetton_wallet_2.isEmpty)
    assert(d.lp_tokens_minted.isEmpty)
  }

  test("tonstakers.yaml parity ('TS Stake deposit'): stake_deposit with " +
      "provider/tokens_minted, fee-adjusted value and the accounts list") {
    val staker = "0:" + "90" * 32
    val pool = "0:" + "A4" * 32
    val master = "0:" + "BD" * 32
    val tsWallet = "0:" + "E4" * 32
    val xferBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JettonInternalTransfer), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(9439323796L))
      .storeAddress(None).storeAddress(None)
      .storeCoins(BigInt(0)).build())
    val txs = Seq(tx("T1", pool, 10), tx("T2", master, 20),
      tx("T3", tsWallet, 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", staker, pool, Some(Opcodes.TonstakersDeposit),
          value = 11000000000L),
        out("m2", pool, master, Some(Opcodes.TonstakersMint))),
      "T2" -> Seq(
        in("m2", pool, master, Some(Opcodes.TonstakersMint)),
        out("m3", master, tsWallet, Some(Opcodes.JettonInternalTransfer),
          body = Some(xferBody))),
      "T3" -> Seq(in("m3", master, tsWallet,
        Some(Opcodes.JettonInternalTransfer), body = Some(xferBody))))
    val a = Classifier.classify("gts1", txs, msgs).head
    // the YAML's expected-actions block: type/source/destination/asset/
    // amount/staking_data.{provider,tokens_minted}
    assert(a.`type` == "stake_deposit")
    assert(a.source.contains(staker))
    assert(a.destination.contains(pool))
    assert(a.asset.contains(master))
    assert(a.value.contains(BigDecimal(10000000000L))) // 11 TON - 1 TON fee
    assert(a.amount.contains(BigDecimal(10000000000L)))
    assert(a.success)
    val sd = a.staking_data.get
    assert(sd.provider.contains("liquid_staking"))
    assert(sd.tokens_minted.contains(BigDecimal(9439323796L)))
    // the YAML accounts list: wallet, asset master, source, destination
    for (acct <- Seq(tsWallet, master, staker, pool))
      assert(a.accounts.contains(acct), s"missing $acct in ${a.accounts}")
  }

  test("tonstakers.yaml parity ('TS Withdrawal request'): tsTON-wallet " +
      "source_secondary, ts_nft and the accounts list") {
    val staker = "0:" + "86" * 32
    val tsWallet = "0:" + "51" * 32
    val pool = "0:" + "A4" * 32
    val ctrl = "0:" + "0B" * 32
    val nftMinter = "0:" + "0C" * 32
    val bill = "0:" + "7A" * 32
    val burnBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x595f07bcL), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(67599)).storeAddress(None).build())
    val txs = Seq(tx("TB", tsWallet, 10), tx("TN", pool, 20),
      tx("TR", ctrl, 30), tx("TX", nftMinter, 40), tx("TI", bill, 50))
    val msgs = Map(
      "TB" -> Seq(
        in("m1", staker, tsWallet, Some(Opcodes.JettonBurn),
          body = Some(burnBody)),
        out("m2", tsWallet, pool, Some(Opcodes.JettonBurnNotification))),
      "TN" -> Seq(
        in("m2", tsWallet, pool, Some(Opcodes.JettonBurnNotification)),
        out("m3", pool, ctrl, Some(Opcodes.TonstakersWithdraw), value = 100)),
      "TR" -> Seq(
        in("m3", pool, ctrl, Some(Opcodes.TonstakersWithdraw), value = 100),
        out("m4", ctrl, nftMinter, Some(Opcodes.TonstakersMint), value = 600)),
      "TX" -> Seq(
        in("m4", ctrl, nftMinter, Some(Opcodes.TonstakersMint), value = 600),
        out("m5", nftMinter, bill, Some(Opcodes.TonstakersInitNft))),
      "TI" -> Seq(in("m5", nftMinter, bill, Some(Opcodes.TonstakersInitNft))))
    val a = Classifier.classify("gts2", txs, msgs)
      .find(_.`type` == "stake_withdrawal_request").get
    // YAML: source=staker, source_secondary=the burn wallet,
    // destination=pool, amount=tokens burnt, staking_data.ts_nft
    assert(a.source.contains(staker))
    assert(a.source_secondary.contains(tsWallet))
    assert(a.destination.contains(ctrl)) // request destination
    assert(a.value.contains(BigDecimal(67599)))
    assert(a.amount.contains(BigDecimal(67599)))
    assert(a.success)
    val sd = a.staking_data.get
    assert(sd.provider.contains("liquid_staking"))
    assert(sd.ts_nft.contains(bill))
    for (acct <- Seq(staker, tsWallet, pool, bill))
      assert(a.accounts.contains(acct), s"missing $acct in ${a.accounts}")
  }

  test("jetton-mints.yaml parity: mint-call traces merge into one " +
      "jetton_mint with to/wallet/asset/amount (0x642b7d07 and 0x15)") {
    val admin = "0:" + "11" * 32
    val master = "0:" + "08" * 32
    val wallet = "0:" + "A2" * 32
    val owner = "0:" + "A3" * 32
    def mintBody(op: Long, tonAmount: Long, masterAmount: Option[Long]) = {
      val b = new Boc.Builder()
        .storeUint(BigInt(op), 32)
        .storeUint(BigInt(5), 64)
        .storeAddress(Some(owner))
        .storeCoins(BigInt(tonAmount))
      masterAmount.foreach { ma =>
        b.storeRef(new Boc.Builder()
          .storeUint(BigInt(Opcodes.JettonInternalTransfer), 32)
          .storeUint(BigInt(5), 64).storeCoins(BigInt(ma)).build())
      }
      Boc.serializeBase64(b.build())
    }
    val xferBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JettonInternalTransfer), 32)
      .storeUint(BigInt(5), 64)
      .storeCoins(BigInt(1000000000L))
      .storeAddress(None).storeAddress(None)
      .storeCoins(BigInt(0)).build())
    // full chain: admin -> master (mint 0x642b7d07) -> wallet
    // (internal_transfer) -> owner (notify)
    val txs = Seq(tx("T1", master, 10), tx("T2", wallet, 20),
      tx("T3", owner, 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", admin, master, Some(Opcodes.JettonMint),
          body = Some(mintBody(Opcodes.JettonMint, 100000000L, None))),
        out("m2", master, wallet, Some(Opcodes.JettonInternalTransfer),
          body = Some(xferBody))),
      "T2" -> Seq(
        in("m2", master, wallet, Some(Opcodes.JettonInternalTransfer),
          body = Some(xferBody)),
        out("m3", wallet, owner, Some(Opcodes.JettonNotify))),
      "T3" -> Seq(in("m3", wallet, owner, Some(Opcodes.JettonNotify))))
    val actions = Classifier.classify("gjm1", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_mint"),
      s"got ${actions.map(_.`type`)}")
    val a = actions.head
    // YAML: destination=to, destination_secondary=to_jetton_wallet,
    // asset=the master, amount=minted tokens (+ ton_amount as value)
    assert(a.destination.contains(owner))
    assert(a.destination_secondary.contains(wallet))
    assert(a.asset.contains(master))
    assert(a.amount.contains(BigDecimal(1000000000L)))
    assert(a.value.contains(BigDecimal(100000000L)))
    assert(a.success)
    assert(a.tx_hashes.toSet == Set("T1", "T2", "T3"))
    for (acct <- Seq(master, wallet, owner))
      assert(a.accounts.contains(acct), s"missing $acct in ${a.accounts}")

    // minter-style 0x15 WITHOUT the transfer leg: failed, endpoints from
    // the body, amount from the master_msg ref (the YAML's failed case)
    val failedMint = Classifier.classify("gjm2",
      Seq(tx("T1", master, 10)),
      Map("T1" -> Seq(in("m1", admin, master,
        Some(Opcodes.MinterJettonMint),
        body = Some(mintBody(Opcodes.MinterJettonMint, 100000000L,
          Some(1000000000000000L))))))).head
    assert(failedMint.`type` == "jetton_mint")
    assert(!failedMint.success)
    assert(failedMint.destination.contains(owner))
    assert(failedMint.destination_secondary.isEmpty)
    assert(failedMint.asset.contains(master))
    assert(failedMint.amount.contains(BigDecimal(1000000000000000L)))
  }

  test("vesting.yaml parity ('Vesting send message'): the forwarded " +
      "message's destination and value become destination_secondary and " +
      "amount") {
    val sender = "0:" + "33" * 32
    val vesting = "0:" + "0F" * 32
    val msgDest = "0:" + "A8" * 32
    // inner ordered message: int_msg_info to msgDest carrying 100 TON
    val inner = new Boc.Builder()
      .storeBit(false) // int_msg_info
      .storeBit(true).storeBit(true).storeBit(false) // ihr/bounce/bounced
      .storeAddress(None) // src
      .storeAddress(Some(msgDest))
      .storeCoins(BigInt(100000000000L))
      .build()
    val sendBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xa7733acdL), 32)
      .storeUint(BigInt(0), 64)
      .storeUint(BigInt(3), 8) // send_mode
      .storeRef(inner)
      .build())
    val a = Classifier.classify("gvs1",
      Seq(tx("T1", vesting, 10)),
      Map("T1" -> Seq(in("m1", sender, vesting,
        Some(Opcodes.VestingSendMessage), body = Some(sendBody))))).head
    assert(a.`type` == "vesting_send_message")
    // YAML: source/destination/destination_secondary/amount +
    // vesting_send_message_data.{query_id, message_boc}
    assert(a.source.contains(sender))
    assert(a.destination.contains(vesting))
    assert(a.destination_secondary.contains(msgDest))
    assert(a.value.contains(BigDecimal(100000000000L)))
    assert(a.amount.contains(BigDecimal(100000000000L)))
    val d = a.vesting_send_message_data.get
    assert(d.query_id.contains("0"))
    assert(d.message_boc.contains(Boc.serializeBase64(inner, withCrc = false)))
    for (acct <- Seq(sender, vesting, msgDest))
      assert(a.accounts.contains(acct), s"missing $acct in ${a.accounts}")
  }

  test("layerzero.yaml parity ('LayerZero commit packet'): endpoint " +
      "columns, secondaries and every layerzero_packet_data field") {
    // mirror the YAML's same-chain packet: src/dst oapp equal, eid 30343
    val oapp = BigInt("70037e28dd2535f6b31fe11109f075a4b3acb4a286480404cf0755c6b045caea", 16)
    val guid = BigInt("e7db0b36b8b81bcd2a22d087d69dd4ec7640c2bb358092ac9e7306b9a77601a9", 16)
    val path = {
      val b = new Boc.Builder()
        .storeUint(BigInt("8903714975572488637007080065659"), 152)
      (1 to 198).foreach(_ => b.storeBit(true))
      b.storeUint(BigInt(30343), 32).storeUint(oapp, 256)
        .storeUint(BigInt(30343), 32).storeUint(oapp, 256)
      b.build()
    }
    val packet = {
      val b = new Boc.Builder()
        .storeUint(BigInt("417359019239977417716476838698419835"), 152)
      (1 to 198).foreach(_ => b.storeBit(true))
      b.storeRef(path)
        .storeRef(new Boc.Builder()
          .storeBytes(Array(0x01, 0x00, 0x00, 0x76, 0x87, 0x00, 0x00,
            0x00, 0x00).map(_.toByte)).build())
        .storeUint(BigInt(1), 64).storeUint(guid, 256)
      b.build()
    }
    val commitBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x5388cd88L), 32)
      .storeRef(new Boc.Builder().storeRef(packet).build())
      .build())
    val sender = "0:" + "8A" * 32
    val uln = "0:" + "54" * 32
    val endpoint = "0:" + "BA" * 32
    val channel = "0:" + "62" * 32
    val mlConn = "0:" + "5E" * 32
    val txs = Seq(tx("T1", "0:ULNM", 10), tx("T2", uln, 20),
      tx("T3", endpoint, 30), tx("T4", channel, 40), tx("T5", mlConn, 50))
    val msgs = Map(
      "T1" -> Seq(in("m1", sender, "0:ULNM",
          Some(Opcodes.LayerZeroUlnCommitPacket)),
        out("m2", "0:ULNM", uln,
          Some(Opcodes.LayerZeroUlnConnectionCommitPacket))),
      "T2" -> Seq(in("m2", "0:ULNM", uln,
          Some(Opcodes.LayerZeroUlnConnectionCommitPacket)),
        out("m3", uln, endpoint, Some(Opcodes.LayerZeroEndpointCommitPacket))),
      "T3" -> Seq(in("m3", uln, endpoint,
          Some(Opcodes.LayerZeroEndpointCommitPacket)),
        out("m4", endpoint, channel, Some(Opcodes.LayerZeroChannelCommitPacket),
          body = Some(commitBody))),
      "T4" -> Seq(in("m4", endpoint, channel,
          Some(Opcodes.LayerZeroChannelCommitPacket), body = Some(commitBody)),
        out("m5", channel, mlConn, Some(Opcodes.LayerZeroMsglibCommitCallback))),
      "T5" -> Seq(in("m5", channel, mlConn,
        Some(Opcodes.LayerZeroMsglibCommitCallback))))
    val actions = Classifier.classify("gp4", txs, msgs)
    val a = actions.find(_.`type` == "layerzero_commit_packet").get
    // the YAML's endpoint-column block: source=sender,
    // source_secondary=endpoint, destination=uln,
    // destination_secondary=uln_connection, asset=channel,
    // asset_secondary=msglib_connection
    assert(a.source.contains(sender))
    assert(a.source_secondary.contains(endpoint))
    assert(a.destination.contains(uln))
    assert(a.destination_secondary.contains(uln))
    assert(a.asset.contains(channel))
    assert(a.asset_secondary.contains(mlConn))
    // layerzero_packet_data dot paths exactly as layerzero.yaml pins them
    val p = a.layerzero_packet_data.get
    assert(p.src_oapp.contains("0x" + oapp.toString(16)))
    assert(p.dst_oapp.contains("0x" + oapp.toString(16)))
    assert(p.src_eid.contains(30343) && p.dst_eid.contains(30343))
    assert(p.nonce.contains(BigDecimal(1)))
    assert(p.guid.contains("0x" + guid.toString(16)))
    assert(p.message.contains("0x010000768700000000"))
  }
}
