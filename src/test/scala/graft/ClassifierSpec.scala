package graft

import graft.classifier._

class ClassifierSpec extends SparkSpec {

  private def tx(hash: String, account: String, lt: Long,
      orig: String = "active", end: String = "active",
      aborted: Boolean = false, descr: String = "ord"): TxLite =
    TxLite(hash, account, lt, lt.toInt, orig, end, aborted, None, None, 0L, descr)

  private def in(h: String, src: String, dst: String, op: Option[Long],
      value: Long = 100, bounced: Boolean = false): MsgLite =
    MsgLite(h, "in", Option(src), Option(dst), value, op, bounce = false,
      bounced = bounced, Some(1L), None)

  private def out(h: String, src: String, dst: String, op: Option[Long],
      value: Long = 100): MsgLite =
    MsgLite(h, "out", Option(src), Option(dst), value, op, bounce = false,
      bounced = false, Some(2L), None)

  test("TxTree children follow the per-tx message seqNo when supplied, " +
      "created_lt otherwise (to_tree semantics, tree_utils.py:107-116)") {
    val txs = Seq(tx("P", "0:P", 10), tx("C1", "0:C1", 20), tx("C2", "0:C2", 20))
    def msgs(seq1: Option[Int], seq2: Option[Int]) = Map(
      "P" -> Seq(in("m0", "0:X", "0:P", None),
        out("o1", "0:P", "0:C1", None).copy(createdLt = Some(11L), seqNo = seq1),
        out("o2", "0:P", "0:C2", None).copy(createdLt = Some(12L), seqNo = seq2)),
      "C1" -> Seq(in("o1", "0:P", "0:C1", None).copy(createdLt = Some(11L))),
      "C2" -> Seq(in("o2", "0:P", "0:C2", None).copy(createdLt = Some(12L))))
    // no seqNo → created_lt order: C1 before C2
    val byLt = TxTree.build(txs, msgs(None, None).values.flatten.toSeq,
      msgs(None, None))
    assert(byLt.head.children.map(_.tx.hash) == Seq("C1", "C2"))
    // seqNo supplied and INVERTED vs created_lt → dump order wins
    val bySeq = TxTree.build(txs, msgs(Some(2), Some(1)).values.flatten.toSeq,
      msgs(Some(2), Some(1)))
    assert(bySeq.head.children.map(_.tx.hash) == Seq("C2", "C1"))
  }

  test("classification is invariant to input row order (shuffle-arrival " +
      "determinism: no seqNo, permuted txs and messages)") {
    val txs = Seq(tx("P", "0:P", 10), tx("C1", "0:C1", 20),
      tx("C2", "0:C2", 20), tx("C3", "0:C3", 30))
    val msgs = Map(
      "P" -> Seq(in("m0", "0:X", "0:P", None),
        out("o1", "0:P", "0:C1", None).copy(createdLt = Some(11L)),
        out("o2", "0:P", "0:C2", None).copy(createdLt = Some(12L))),
      "C1" -> Seq(in("o1", "0:P", "0:C1", None).copy(createdLt = Some(11L)),
        out("o3", "0:C1", "0:C3", None).copy(createdLt = Some(13L))),
      "C2" -> Seq(in("o2", "0:P", "0:C2", None).copy(createdLt = Some(12L))),
      "C3" -> Seq(in("o3", "0:C1", "0:C3", None).copy(createdLt = Some(13L))))
    val base = Classifier.classify("det1", txs, msgs)
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val shuffledTxs = rnd.shuffle(txs)
      val shuffledMsgs = msgs.map { case (k, v) => k -> rnd.shuffle(v) }
      assert(Classifier.classify("det1", shuffledTxs, shuffledMsgs) == base,
        s"classification differs under permutation seed $seed")
    }
  }

  test("plain ton transfer classifies as ton_transfer") {
    val actions = Classifier.classify("tr1",
      Seq(tx("T1", "0:B", 10)),
      Map("T1" -> Seq(in("m1", "0:A", "0:B", None))))
    assert(actions.map(_.`type`) == Seq("ton_transfer"))
    assert(actions.head.success)
    assert(actions.head.source.contains("0:A"))
    assert(actions.head.value.contains(BigDecimal(100)))
  }

  test("jetton transfer opcode chain merges into one jetton_transfer action") {
    // owner -> (0x0f8a7ea5) walletA -> (0x178d4519) walletB -> notify owner2 + excesses
    val txs = Seq(
      tx("TW1", "0:WALLET_A", 10),
      tx("TW2", "0:WALLET_B", 20),
      tx("TN", "0:OWNER_B", 30),
      tx("TE", "0:OWNER_A", 40))
    val msgs = Map(
      "TW1" -> Seq(
        in("m1", "0:OWNER_A", "0:WALLET_A", Some(Opcodes.JettonTransfer)),
        out("m2", "0:WALLET_A", "0:WALLET_B", Some(Opcodes.JettonInternalTransfer))),
      "TW2" -> Seq(
        in("m2", "0:WALLET_A", "0:WALLET_B", Some(Opcodes.JettonInternalTransfer)),
        out("m3", "0:WALLET_B", "0:OWNER_B", Some(Opcodes.JettonNotify)),
        out("m4", "0:WALLET_B", "0:OWNER_A", Some(Opcodes.Excesses))),
      "TN" -> Seq(in("m3", "0:WALLET_B", "0:OWNER_B", Some(Opcodes.JettonNotify))),
      "TE" -> Seq(in("m4", "0:WALLET_B", "0:OWNER_A", Some(Opcodes.Excesses))))
    val actions = Classifier.classify("tr2", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_transfer"))
    val a = actions.head
    assert(a.source.contains("0:OWNER_A"))
    assert(a.destination.contains("0:OWNER_B"))
    assert(a.asset.contains("0:WALLET_A"))
    assert(a.tx_hashes.toSet == Set("TW1", "TW2", "TN", "TE"))
    assert(a.success)
  }

  test("jetton transfer decodes a real TEP-74 BOC body when present") {
    import graft.functions.Boc
    val dest = Some("0:" + "77" * 32)
    val body = new Boc.Builder()
      .storeUint(BigInt(Opcodes.JettonTransfer), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt("123456789"))
      .storeAddress(dest).storeAddress(None)
      .storeBit(false).storeCoins(BigInt(0)).storeBit(false)
      .storeUint(BigInt(0), 32) // inline comment payload: op 0 + text
      .storeBytes("hi".getBytes("UTF-8"))
      .build()
    val bodyB64 = Boc.serializeBase64(body)
    val txs = Seq(tx("TW1", "0:WALLET_A", 10), tx("TW2", "0:WALLET_B", 20))
    val msgs = Map(
      "TW1" -> Seq(
        in("m1", "0:OWNER_A", "0:WALLET_A", Some(Opcodes.JettonTransfer))
          .copy(body = Some(bodyB64)),
        out("m2", "0:WALLET_A", "0:WALLET_B", Some(Opcodes.JettonInternalTransfer))),
      "TW2" -> Seq(
        in("m2", "0:WALLET_A", "0:WALLET_B", Some(Opcodes.JettonInternalTransfer))))
    val actions = Classifier.classify("trB", txs, msgs)
    val a = actions.find(_.`type` == "jetton_transfer").get
    assert(a.value.contains(BigDecimal("123456789")))
    assert(a.destination == dest)
  }

  test("contract deploy is emitted flat — unwound to top level with no " +
      "parent link (unwind_deployments, event_processing.py:196-207)") {
    val actions = Classifier.classify("tr3",
      Seq(tx("T1", "0:NEW", 10, orig = "uninit", end = "active")),
      Map("T1" -> Seq(in("m1", "0:A", "0:NEW", Some(0x12345678L)))))
    val types = actions.map(_.`type`).sorted
    assert(types == Seq("call_contract", "contract_deploy"))
    val deploy = actions.find(_.`type` == "contract_deploy").get
    assert(deploy.parent_action_id.isEmpty)
    assert(deploy.ancestor_type.isEmpty)
  }

  test("bounced transfer to active account is failed; to uninit is not") {
    val bounced = Classifier.classify("tr4",
      Seq(tx("T1", "0:B", 10, aborted = true)),
      Map("T1" -> Seq(in("m1", "0:A", "0:B", None, bounced = true))))
    assert(!bounced.head.success)
    val toUninit = Classifier.classify("tr5",
      Seq(tx("T1", "0:B", 10, orig = "uninit", end = "uninit", aborted = true)),
      Map("T1" -> Seq(in("m1", "0:A", "0:B", None))))
    assert(toUninit.exists(a => a.`type` == "ton_transfer" && a.success))
  }

  test("swap matcher composes on rewritten jetton_transfer blocks") {
    // owner -> walletA -(internal)-> routerWallet -(notify)-> ROUTER
    //   ROUTER -> routerWallet2 -(internal)-> walletB -(notify)-> owner
    val txs = Seq(
      tx("TA", "0:WALLET_A", 10), tx("TB", "0:RW_IN", 20),
      tx("TR", "0:ROUTER", 30), tx("TC", "0:RW_OUT", 40),
      tx("TD", "0:WALLET_B", 50), tx("TE", "0:OWNER", 60))
    val msgs = Map(
      "TA" -> Seq(
        in("m1", "0:OWNER", "0:WALLET_A", Some(Opcodes.JettonTransfer)),
        out("m2", "0:WALLET_A", "0:RW_IN", Some(Opcodes.JettonInternalTransfer))),
      "TB" -> Seq(
        in("m2", "0:WALLET_A", "0:RW_IN", Some(Opcodes.JettonInternalTransfer)),
        out("m3", "0:RW_IN", "0:ROUTER", Some(Opcodes.JettonNotify))),
      "TR" -> Seq(
        in("m3", "0:RW_IN", "0:ROUTER", Some(Opcodes.JettonNotify)),
        out("m4", "0:ROUTER", "0:RW_OUT", Some(Opcodes.JettonTransfer))),
      "TC" -> Seq(
        in("m4", "0:ROUTER", "0:RW_OUT", Some(Opcodes.JettonTransfer)),
        out("m5", "0:RW_OUT", "0:WALLET_B", Some(Opcodes.JettonInternalTransfer))),
      "TD" -> Seq(
        in("m5", "0:RW_OUT", "0:WALLET_B", Some(Opcodes.JettonInternalTransfer)),
        out("m6", "0:WALLET_B", "0:OWNER", Some(Opcodes.JettonNotify))),
      "TE" -> Seq(in("m6", "0:WALLET_B", "0:OWNER", Some(Opcodes.JettonNotify))))
    val actions = Classifier.classify("trS", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_swap"),
      s"got ${actions.map(a => (a.`type`, a.source, a.destination))}")
    val sw = actions.head
    assert(sw.source.contains("0:OWNER"))
    assert(sw.destination.contains("0:OWNER"))
    assert(sw.tx_hashes.toSet == Set("TA", "TB", "TR", "TC", "TD", "TE"))
  }

  test("standalone internal_transfer classifies as jetton_mint") {
    val txs = Seq(tx("TW", "0:WALLET_B", 10), tx("TN", "0:OWNER_B", 20))
    val msgs = Map(
      "TW" -> Seq(
        in("m1", "0:MASTER", "0:WALLET_B", Some(Opcodes.JettonInternalTransfer)),
        out("m2", "0:WALLET_B", "0:OWNER_B", Some(Opcodes.JettonNotify))),
      "TN" -> Seq(in("m2", "0:WALLET_B", "0:OWNER_B", Some(Opcodes.JettonNotify))))
    val actions = Classifier.classify("trM", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_mint"))
    assert(actions.head.destination.contains("0:OWNER_B"))
    assert(actions.head.asset.contains("0:WALLET_B"))
  }

  test("reclassify replaces only the touched traces") {
    import spark.implicits._
    val existing = Seq(("tr1", "a1", "unknown"), ("tr2", "a2", "ton_transfer"))
      .toDF("trace_id", "action_id", "type")
    val fresh = Seq(("tr1", "a3", "jetton_transfer"))
      .toDF("trace_id", "action_id", "type")
    val merged = ClassifyJob.reclassify(existing, fresh)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(merged == Set(("tr1", "a3", "jetton_transfer"),
      ("tr2", "a2", "ton_transfer")))
  }

  test("wallet external with no children unrolls into ghost transfer actions") {
    import graft.functions.Boc
    // forged order: one internal message, 0.5 TON to 0:99..99
    val dest = Some("0:" + "99" * 32)
    val inner = new Boc.Builder()
      .storeBit(false) // int_msg_info$0
      .storeBit(true)  // ihr_disabled
      .storeBit(false) // bounce
      .storeBit(false) // bounced
      .storeAddress(None).storeAddress(dest)
      .storeCoins(BigInt(500000000L))
      .storeBit(false) // no extra currencies
      .storeCoins(BigInt(0)).storeCoins(BigInt(0))
      .storeUint(BigInt(0), 64).storeUint(BigInt(0), 32)
      .storeBit(false).storeBit(false) // no init, body inline
      .build()
    val walletBody = new Boc.Builder()
      .storeUint(BigInt(0), 512) // signature
      .storeUint(BigInt(698983191L), 32) // subwallet
      .storeUint(BigInt(0xffffffffL), 32) // valid_until
      .storeUint(BigInt(7), 32) // seqno
      .storeUint(BigInt(0), 8) // send_mode of order 1
      .storeRef(inner)
      .build()
    val txs = Seq(tx("TX", "0:WALLET", 10))
    val msgs = Map("TX" -> Seq(
      in("m1", null, "0:WALLET", None).copy(
        source = None, body = Some(Boc.serializeBase64(walletBody)))))
    val actions = Classifier.classify("trU", txs, msgs)
    val ghost = actions.find(_.`type` == "ton_transfer")
    assert(ghost.isDefined, s"expected ghost transfer, got ${actions.map(_.`type`)}")
    assert(ghost.get.destination == dest)
    assert(ghost.get.value.contains(BigDecimal(500000000L)))
  }

  test("big trace collapses to a single unknown action") {
    val txs = (1 to 4001).map(i => tx(s"T$i", "0:X", i.toLong))
    val actions = Classifier.classify("tr6", txs, Map.empty)
    assert(actions.map(_.`type`) == Seq("unknown"))
    assert(actions.head.tx_hashes.size == 4001)
  }

  test("action ids are deterministic and unique per (anchor, type)") {
    val a1 = Serializer.actionId("msgX", "jetton_transfer")
    val a2 = Serializer.actionId("msgX", "jetton_transfer")
    val a3 = Serializer.actionId("msgX", "ton_transfer")
    assert(a1 == a2 && a1 != a3 && a1.length == 44)
  }

  test("ClassifyJob runs the classifier through flatMapGroups on DataFrames") {
    import spark.implicits._
    val txs = Seq(
      ("tr1", "T1", "0:B", 10L, 10, "active", "active", false,
        Option.empty[Int], Option.empty[Int], 0L, "ord"))
      .toDF("trace_id", "hash", "account", "lt", "now", "orig_status",
        "end_status", "aborted", "compute_exit_code", "action_result_code",
        "total_fees", "descr")
    val msgs = Seq(
      ("m1", "T1", "in", Some("0:A"), Some("0:B"), Some(500L),
        Option.empty[Long], Some(false), Some(false), Some(1L)))
      .toDF("msg_hash", "tx_hash", "direction", "source", "destination",
        "value", "opcode", "bounce", "bounced", "created_lt")
    val actions = ClassifyJob.run(spark, txs, msgs).collect()
    assert(actions.map(_.`type`).toSeq == Seq("ton_transfer"))
    val aa = ClassifyJob.actionAccounts(spark,
      ClassifyJob.run(spark, txs, msgs).toDF()).collect()
    assert(aa.map(_.getAs[String]("account")).toSet == Set("0:A", "0:B"))
  }

  // ---------------------------------------------------------------- G6 breadth:
  // opcode-chain protocol matchers (reference: blocks/{swaps,staking,
  // multisig,vesting,dns,subscriptions}.py), golden-fixture style.

  private def chain2(op1: Long, op2: Long): (Seq[TxLite], Map[String, Seq[MsgLite]]) = (
    Seq(tx("T1", "0:A", 10), tx("T2", "0:B", 20)),
    Map(
      "T1" -> Seq(in("m1", "0:U", "0:A", Some(op1)),
        out("m2", "0:A", "0:B", Some(op2))),
      "T2" -> Seq(in("m2", "0:A", "0:B", Some(op2)))))

  test("stonfi swap+payment chain merges into one jetton_swap") {
    val (txs, msgs) = chain2(Opcodes.StonfiSwap, Opcodes.StonfiPayment)
    val actions = Classifier.classify("sw1", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_swap"))
    assert(actions.head.tx_hashes.toSet == Set("T1", "T2"))
    assert(actions.head.source.contains("0:U"))
  }

  test("stonfi swap without payment child stays call_contract") {
    val actions = Classifier.classify("sw2",
      Seq(tx("T1", "0:A", 10)),
      Map("T1" -> Seq(in("m1", "0:U", "0:A", Some(Opcodes.StonfiSwap)))))
    assert(actions.map(_.`type`) == Seq("call_contract"))
  }

  test("dedust swap consumes notification and payout tail") {
    val txs = Seq(tx("T1", "0:POOL", 10), tx("T2", "0:POOL2", 20),
      tx("T3", "0:VAULT", 30))
    val msgs = Map(
      "T1" -> Seq(in("m1", "0:U", "0:POOL", Some(Opcodes.DedustSwap)),
        out("m2", "0:POOL", "0:POOL2", Some(Opcodes.DedustSwapNotification))),
      "T2" -> Seq(in("m2", "0:POOL", "0:POOL2", Some(Opcodes.DedustSwapNotification)),
        out("m3", "0:POOL2", "0:VAULT", Some(Opcodes.DedustPayout))),
      "T3" -> Seq(in("m3", "0:POOL2", "0:VAULT", Some(Opcodes.DedustPayout))))
    val actions = Classifier.classify("sw3", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_swap"))
    assert(actions.head.tx_hashes.toSet == Set("T1", "T2", "T3"))
  }

  private def dedustNotifyBody(amountIn: Long, amountOut: Long,
      outAcct: Int): String = {
    import graft.functions.Boc
    val acct = Array.fill[Byte](31)(0) :+ outAcct.toByte
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x9c610de3L), 32)
      .storeUint(BigInt(0), 4) // asset_in: TON
      .storeUint(BigInt(1), 4).storeUint(BigInt(0), 8).storeBytes(acct)
      .storeCoins(BigInt(amountIn)).storeCoins(BigInt(amountOut))
      .storeRef(new Boc.Builder()
        .storeUint(BigInt(0), 2).storeUint(BigInt(0), 2)
        .storeCoins(BigInt(0)).storeCoins(BigInt(0)).build())
      .build())
  }

  test("dedust multi-hop swap decodes notification bodies into peer_swaps " +
      "(blocks/swaps.py:547-564,655-677)") {
    val body1 = dedustNotifyBody(1000, 2000, 7)
    val body2 = dedustNotifyBody(2000, 3000, 8)
    val txs = Seq(tx("T1", "0:POOL", 10), tx("T2", "0:POOL2", 20),
      tx("T3", "0:POOL3", 30))
    val msgs = Map(
      "T1" -> Seq(in("m1", "0:U", "0:POOL", Some(Opcodes.DedustSwap)),
        out("m2", "0:POOL", "0:POOL2", Some(Opcodes.DedustSwapNotification))),
      "T2" -> Seq(
        MsgLite("m2", "in", Some("0:POOL"), Some("0:POOL2"), 100,
          Some(Opcodes.DedustSwapNotification), bounce = false,
          bounced = false, Some(1L), Some(body1)),
        out("m3", "0:POOL2", "0:POOL3", Some(Opcodes.DedustSwapNotification))),
      "T3" -> Seq(
        MsgLite("m3", "in", Some("0:POOL2"), Some("0:POOL3"), 100,
          Some(Opcodes.DedustSwapNotification), bounce = false,
          bounced = false, Some(2L), Some(body2))))
    val actions = Classifier.classify("sw4", txs, msgs)
    assert(actions.map(_.`type`) == Seq("jetton_swap"))
    val sd = actions.head.jetton_swap_data.get
    assert(sd.dex == "dedust")
    // hops ordered by lt; asset strings in the engine's wc:HEX64 form
    assert(sd.peer_swaps.map(_.amount_in.get.toLong) == Seq(1000L, 2000L))
    assert(sd.peer_swaps.map(_.amount_out.get.toLong) == Seq(2000L, 3000L))
    assert(sd.peer_swaps.head.asset_in.contains("TON"))
    assert(sd.peer_swaps.head.asset_out.get.endsWith("07"))
    // dex transfers: first hop's in / last hop's out
    assert(sd.dex_incoming_transfer.get.amount.contains(BigDecimal(1000)))
    assert(sd.dex_outgoing_transfer.get.amount.contains(BigDecimal(3000)))
    assert(sd.dex_outgoing_transfer.get.asset.get.endsWith("08"))
  }

  test("dedust single-hop swap fills dex transfers but serializes no " +
      "peer_swaps (len>1 rule, blocks/swaps.py:677)") {
    val body = dedustNotifyBody(500, 900, 5)
    val txs = Seq(tx("T1", "0:POOL", 10), tx("T2", "0:POOL2", 20))
    val msgs = Map(
      "T1" -> Seq(in("m1", "0:U", "0:POOL", Some(Opcodes.DedustSwap)),
        out("m2", "0:POOL", "0:POOL2", Some(Opcodes.DedustSwapNotification))),
      "T2" -> Seq(
        MsgLite("m2", "in", Some("0:POOL"), Some("0:POOL2"), 100,
          Some(Opcodes.DedustSwapNotification), bounce = false,
          bounced = false, Some(1L), Some(body))))
    val actions = Classifier.classify("sw5", txs, msgs)
    val sd = actions.head.jetton_swap_data.get
    assert(sd.peer_swaps.isEmpty)
    assert(sd.dex_incoming_transfer.get.amount.contains(BigDecimal(500)))
    assert(sd.dex_outgoing_transfer.get.amount.contains(BigDecimal(900)))
  }

  test("tonstakers deposit without the mint transfer leg is failed " +
      "(staking.py:157-160)") {
    val dep = Classifier.classify("st1",
      Seq(tx("T1", "0:POOL", 10)),
      Map("T1" -> Seq(in("m1", "0:STAKER", "0:POOL",
        Some(Opcodes.TonstakersDeposit), value = 5000))))
    assert(dep.map(_.`type`) == Seq("stake_deposit"))
    assert(!dep.head.success)
    // value = message value minus the 1-TON deposit fee (staking.py:169)
    assert(dep.head.value.contains(BigDecimal(5000L - 1000000000L)))
    assert(dep.head.staking_data.flatMap(_.provider).contains("liquid_staking"))
    assert(dep.head.staking_data.get.tokens_minted.isEmpty)
  }

  test("tonstakers deposit with MintJettons transfer captures tokens_minted") {
    import graft.functions.Boc
    val xferBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JettonInternalTransfer), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(4242))
      .storeAddress(None).storeAddress(None)
      .storeCoins(BigInt(0)).build())
    val txs = Seq(tx("T1", "0:POOL", 10), tx("T2", "0:MASTER", 20),
      tx("T3", "0:TSWALLET", 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:STAKER", "0:POOL", Some(Opcodes.TonstakersDeposit),
          value = 2000000000L),
        out("m2", "0:POOL", "0:MASTER", Some(Opcodes.TonstakersMint))),
      "T2" -> Seq(
        in("m2", "0:POOL", "0:MASTER", Some(Opcodes.TonstakersMint)),
        out("m3", "0:MASTER", "0:TSWALLET", Some(Opcodes.JettonInternalTransfer))),
      "T3" -> Seq(
        in("m3", "0:MASTER", "0:TSWALLET", Some(Opcodes.JettonInternalTransfer))
          .copy(body = Some(xferBody))))
    val dep = Classifier.classify("st1b", txs, msgs)
    assert(dep.map(_.`type`) == Seq("stake_deposit"))
    assert(dep.head.success)
    assert(dep.head.value.contains(BigDecimal(1000000000L))) // minus fee
    assert(dep.head.asset.contains("0:MASTER")) // transfer message source
    assert(dep.head.tx_hashes.toSet == Set("T1", "T2", "T3"))
    val sd = dep.head.staking_data.get
    assert(sd.provider.contains("liquid_staking"))
    assert(sd.tokens_minted.contains(BigDecimal(4242)))
  }

  /** Reference withdraw chain (staking.py:178-245): tsTON burn →
    * burn_notification → withdraw request 0x319b0cdc → branch child.
    * The delayed branch carries the InitNFT leg (mint → bill NFT) unless
    * `withInit = false` — the reference's minted_nft comes ONLY from it. */
  private def tonstakersWithdrawChain(branchOp: Long, withInit: Boolean = true)
      : (Seq[TxLite], Map[String, Seq[MsgLite]]) = {
    import graft.functions.Boc
    val burnBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x595f07bcL), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(777)).storeAddress(None).build())
    val delayed = branchOp == Opcodes.TonstakersMint && withInit
    val txs = Seq(tx("TB", "0:TSW", 10), tx("TN", "0:POOL", 20),
      tx("TR", "0:CTRL", 30), tx("TX", "0:NFT", 40)) ++
      (if (delayed) Seq(tx("TI", "0:NFTITEM", 50)) else Nil)
    val msgs = Map(
      "TB" -> Seq(
        in("m1", "0:STAKER", "0:TSW", Some(Opcodes.JettonBurn))
          .copy(body = Some(burnBody)),
        out("m2", "0:TSW", "0:POOL", Some(Opcodes.JettonBurnNotification))),
      "TN" -> Seq(
        in("m2", "0:TSW", "0:POOL", Some(Opcodes.JettonBurnNotification)),
        out("m3", "0:POOL", "0:CTRL", Some(Opcodes.TonstakersWithdraw), value = 100)),
      "TR" -> Seq(
        in("m3", "0:POOL", "0:CTRL", Some(Opcodes.TonstakersWithdraw), value = 100),
        out("m4", "0:CTRL", "0:NFT", Some(branchOp), value = 600)),
      "TX" -> (Seq(
        in("m4", "0:CTRL", "0:NFT", Some(branchOp), value = 600)) ++
        (if (delayed)
          Seq(out("m5", "0:NFT", "0:NFTITEM", Some(Opcodes.TonstakersInitNft)))
        else Nil))) ++
      (if (delayed)
        Map("TI" -> Seq(in("m5", "0:NFT", "0:NFTITEM",
          Some(Opcodes.TonstakersInitNft))))
      else Map.empty)
    (txs, msgs)
  }

  test("tonstakers immediate withdrawal: burn-anchored chain, pool payout") {
    val (txs, msgs) = tonstakersWithdrawChain(Opcodes.TonstakersPoolWithdrawal)
    val wd = Classifier.classify("st2", txs, msgs)
    assert(wd.map(_.`type`) == Seq("stake_withdrawal"))
    assert(wd.head.tx_hashes.toSet == Set("TB", "TN", "TR", "TX"))
    assert(wd.head.value.contains(BigDecimal(500))) // payout 600 - request 100
    val sd = wd.head.staking_data.get
    assert(sd.provider.contains("liquid_staking"))
    assert(sd.tokens_burnt.contains(BigDecimal(777)))
  }

  test("tonstakers delayed withdrawal: NFT-mint branch emits a single " +
      "stake_withdrawal_request with the minted bill") {
    val (txs, msgs) = tonstakersWithdrawChain(Opcodes.TonstakersMint)
    val wd = Classifier.classify("st3", txs, msgs)
    assert(wd.map(_.`type`) == Seq("stake_withdrawal_request"))
    assert(wd.head.value.contains(BigDecimal(777))) // tokens burnt
    assert(wd.head.success)
    val sd = wd.head.staking_data.get
    assert(sd.provider.contains("liquid_staking"))
    // minted bill = the InitNFT destination, not the mint-call account
    assert(sd.ts_nft.contains("0:NFTITEM"))
    // the reference request fill carries only provider + ts_nft
    // (block_tree_serializer.py:520-531)
    assert(sd.tokens_burnt.isEmpty)
  }

  test("delayed withdrawal without InitNFT records no bill and fails " +
      "(staking.py:224-230)") {
    val (txs, msgs) =
      tonstakersWithdrawChain(Opcodes.TonstakersMint, withInit = false)
    val wd = Classifier.classify("st3b", txs, msgs)
    assert(wd.map(_.`type`) == Seq("stake_withdrawal_request"))
    assert(!wd.head.success)
    assert(wd.head.staking_data.get.ts_nft.isEmpty)
  }

  test("tonstakers bill-burn completion chain emits stake_withdrawal " +
      "(staking.py:246-274)") {
    import graft.functions.Boc
    val owner = "0:" + "AA" * 32
    val notifBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.TonstakersNftBurnNotification), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(777))
      .storeAddress(Some(owner)).build())
    val txs = Seq(tx("TB", "0:BILL", 10), tx("TN", "0:POOL", 20),
      tx("TD", owner, 30))
    val msgs = Map(
      "TB" -> Seq(in("m1", "0:STAKER", "0:BILL", Some(Opcodes.TonstakersNftBurn)),
        out("m2", "0:BILL", "0:POOL", Some(Opcodes.TonstakersNftBurnNotification))),
      "TN" -> Seq(
        in("m2", "0:BILL", "0:POOL", Some(Opcodes.TonstakersNftBurnNotification))
          .copy(body = Some(notifBody)),
        out("m3", "0:POOL", owner, Some(Opcodes.TonstakersDistributedAsset),
          value = 600)),
      "TD" -> Seq(in("m3", "0:POOL", owner,
        Some(Opcodes.TonstakersDistributedAsset), value = 600)))
    val wd = Classifier.classify("st5", txs, msgs)
    assert(wd.map(_.`type`) == Seq("stake_withdrawal"))
    assert(wd.head.value.contains(BigDecimal(600))) // distributed amount
    assert(wd.head.source.contains(owner)) // decoded notification owner
    // no start-distribution (0x1140a64f) ancestor in this partial chain —
    // the reference's pool walk-up finds nothing and the destination
    // stays null (staking.py:276-297)
    assert(wd.head.destination.isEmpty)
    val sd = wd.head.staking_data.get
    assert(sd.ts_nft.contains("0:BILL")) // the burnt bill NFT
    assert(sd.tokens_burnt.contains(BigDecimal(777)))
  }

  test("a bare withdraw request without a burn anchor stays call_contract") {
    val (wtxs, wmsgs) = chain2(Opcodes.TonstakersWithdraw, Opcodes.TonstakersNftBurn)
    val wd = Classifier.classify("st4", wtxs, wmsgs)
    assert(!wd.map(_.`type`).contains("stake_withdrawal"))
    assert(!wd.map(_.`type`).contains("stake_withdrawal_request"))
  }

  test("election actions carry no staking_data payload") {
    val (dtxs, dmsgs) = chain2(Opcodes.ElectorDeposit, Opcodes.ElectorDepositConfirm)
    val el = Classifier.classify("el0", dtxs, dmsgs)
    assert(el.map(_.`type`) == Seq("election_deposit"))
    assert(el.head.staking_data.isEmpty)
  }

  test("elector deposit/recover chains classify as election actions") {
    val (dtxs, dmsgs) = chain2(Opcodes.ElectorDeposit, Opcodes.ElectorDepositConfirm)
    assert(Classifier.classify("el1", dtxs, dmsgs).map(_.`type`) ==
      Seq("election_deposit"))
    val (rtxs, rmsgs) = chain2(Opcodes.ElectorRecover, Opcodes.ElectorRecoverConfirm)
    assert(Classifier.classify("el2", rtxs, rmsgs).map(_.`type`) ==
      Seq("election_recover"))
  }

  test("multisig create/approve/execute classify with canonical types") {
    val (ctxs, cmsgs) = chain2(Opcodes.MultisigNewOrder, Opcodes.MultisigInitOrder)
    assert(Classifier.classify("ms1", ctxs, cmsgs).map(_.`type`) ==
      Seq("multisig_create_order"))
    val (atxs, amsgs) = chain2(Opcodes.MultisigApprove, Opcodes.MultisigApproveAccepted)
    assert(Classifier.classify("ms2", atxs, amsgs).map(_.`type`) ==
      Seq("multisig_approve"))
    val ex = Classifier.classify("ms3",
      Seq(tx("T1", "0:MS", 10)),
      Map("T1" -> Seq(in("m1", "0:SIGNER", "0:MS", Some(Opcodes.MultisigExecute)))))
    assert(ex.map(_.`type`) == Seq("multisig_execute"))
  }

  test("vesting send-message and add-whitelist classify") {
    val (stxs, smsgs) = chain2(Opcodes.VestingSendMessage,
      Opcodes.VestingSendMessageResponse)
    assert(Classifier.classify("v1", stxs, smsgs).map(_.`type`) ==
      Seq("vesting_send_message"))
    val (wtxs, wmsgs) = chain2(Opcodes.VestingAddWhitelist,
      Opcodes.VestingAddWhitelistResponse)
    assert(Classifier.classify("v2", wtxs, wmsgs).map(_.`type`) ==
      Seq("vesting_add_whitelist"))
  }

  test("subscription payment response+payment merges; plugin destruct unsubscribes") {
    val (stxs, smsgs) = chain2(Opcodes.SubscriptionPaymentRequestResponse,
      Opcodes.SubscriptionPayment)
    val sub = Classifier.classify("sub1", stxs, smsgs)
    assert(sub.map(_.`type`) == Seq("subscribe"))
    assert(sub.head.tx_hashes.toSet == Set("T1", "T2"))
    val unsub = Classifier.classify("sub2",
      Seq(tx("T1", "0:WALLET", 10)),
      Map("T1" -> Seq(in("m1", "0:SUBSCRIPTION", "0:WALLET",
        Some(Opcodes.WalletPluginDestruct)))))
    assert(unsub.map(_.`type`) == Seq("unsubscribe"))
  }

  test("change_dns classifies and suppression metadata carries ancestors") {
    val txs = Seq(tx("T1", "0:RESOLVER", 10), tx("T2", "0:ITEM", 20))
    val msgs = Map(
      "T1" -> Seq(in("m1", "0:OWNER", "0:RESOLVER", Some(3L)),
        out("m2", "0:RESOLVER", "0:ITEM", Some(Opcodes.ChangeDnsRecord))),
      "T2" -> Seq(in("m2", "0:RESOLVER", "0:ITEM", Some(Opcodes.ChangeDnsRecord))))
    val actions = Classifier.classify("dns1", txs, msgs)
    assert(actions.map(_.`type`) == Seq("call_contract", "change_dns"))
    val dns = actions.find(_.`type` == "change_dns").get
    // call_contract is a v1 op: nested actions serialize FLAT with no
    // parent link (serialize_blocks, block_tree_serializer.py:1546-1556)
    assert(dns.ancestor_type.isEmpty)
    assert(dns.parent_action_id.isEmpty)
  }

  test("dedust liquidity deposit chain classifies as dex_deposit_liquidity") {
    // reference-true chain (liquidity.py:297-412): TON-to-vault → factory
    // ask → deposit-contract top-up → deposit-to-pool → LP mint
    import graft.functions.Boc
    val user = "0:" + "AA" * 32
    val master = "0:" + "AB" * 32
    val vaultBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xd55e4686L), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(9000)).storeBit(false)
      .storeUint(BigInt(0), 4) // asset0 TON
      .storeUint(BigInt(1), 4).storeInt(BigInt(0), 8)
      .storeBytes(Array.fill[Byte](32)(0xab.toByte)) // asset1 master
      .storeRef(new Boc.Builder().storeCoins(BigInt(0))
        .storeCoins(BigInt(9000)).storeCoins(BigInt(777)).build())
      .build())
    val poolBody = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xb56b9598L), 32).storeUint(BigInt(1), 64)
      .storeRef(Boc.Cell.empty)
      .storeAddress(Some(user)).storeCoins(BigInt(0))
      .storeRef(new Boc.Builder()
        .storeUint(BigInt(0), 4).storeCoins(BigInt(9000))
        .storeUint(BigInt(1), 4).storeInt(BigInt(0), 8)
        .storeBytes(Array.fill[Byte](32)(0xab.toByte))
        .storeCoins(BigInt(777)).build())
      .storeBit(false).storeBit(false)
      .build())
    val txs = Seq(tx("T1", "0:VAULT", 10), tx("TF", "0:FACT", 15),
      tx("T2", "0:DEPOSIT", 20), tx("T3", "0:POOL", 30),
      tx("T4", "0:LPWALLET", 40))
    val msgs = Map(
      "T1" -> Seq(in("m1", user, "0:VAULT",
        Some(Opcodes.DedustDepositTonToVault), value = 9000)
          .copy(body = Some(vaultBody)),
        out("m1a", "0:VAULT", "0:FACT", Some(Opcodes.DedustAskLiquidityFactory))),
      "TF" -> Seq(in("m1a", "0:VAULT", "0:FACT",
        Some(Opcodes.DedustAskLiquidityFactory)),
        out("m2", "0:FACT", "0:DEPOSIT", Some(Opcodes.DedustTopUpDepositContract))),
      "T2" -> Seq(in("m2", "0:FACT", "0:DEPOSIT",
        Some(Opcodes.DedustTopUpDepositContract)),
        out("m3", "0:DEPOSIT", "0:POOL", Some(Opcodes.DedustDepositToPool))),
      "T3" -> Seq(in("m3", "0:DEPOSIT", "0:POOL",
        Some(Opcodes.DedustDepositToPool)).copy(body = Some(poolBody)),
        out("m4", "0:POOL", "0:LPWALLET", Some(Opcodes.JettonInternalTransfer))),
      "T4" -> Seq(in("m4", "0:POOL", "0:LPWALLET",
        Some(Opcodes.JettonInternalTransfer))))
    val actions = Classifier.classify("lq1", txs, msgs)
    assert(actions.map(_.`type`) == Seq("dex_deposit_liquidity"))
    assert(actions.head.tx_hashes.toSet == Set("T1", "TF", "T2", "T3", "T4"))
    assert(actions.head.source.contains(user))
    assert(actions.head.destination.contains("0:POOL"))
    assert(actions.head.destination_secondary.contains("0:DEPOSIT"))
    val d = actions.head.dex_deposit_liquidity_data.get
    assert(d.amount1.contains(BigDecimal(9000)))
    assert(d.asset1.isEmpty) // TON renders null (_addr(Asset(is_ton)))
    assert(d.target_asset_2.contains(master))
    assert(d.target_amount_1.contains(BigDecimal(9000)))
    assert(d.target_amount_2.contains(BigDecimal(777)))
  }

  test("LP burn with dedust payouts classifies as dex_withdraw_liquidity") {
    val txs = Seq(tx("TB", "0:LPWALLET", 10), tx("TP", "0:VAULT", 20))
    val msgs = Map(
      "TB" -> Seq(in("m1", "0:LP", "0:LPWALLET", Some(Opcodes.JettonBurn)),
        out("m2", "0:LPWALLET", "0:VAULT", Some(Opcodes.DedustPayout))),
      "TP" -> Seq(in("m2", "0:LPWALLET", "0:VAULT", Some(Opcodes.DedustPayout))))
    val actions = Classifier.classify("lq2", txs, msgs)
    assert(actions.map(_.`type`) == Seq("dex_withdraw_liquidity"))
    assert(actions.head.source.contains("0:LP"))
  }

  test("teleitem auction start and auction bid classify") {
    val auc = Classifier.classify("au1",
      Seq(tx("T1", "0:ITEM", 10)),
      Map("T1" -> Seq(in("m1", "0:OWNER", "0:ITEM",
        Some(Opcodes.TeleitemStartAuction)))))
    assert(auc.map(_.`type`) == Seq("nft_put_on_auction"))
    val bid = Classifier.classify("au2",
      Seq(tx("T1", "0:AUCTION", 10)),
      Map("T1" -> Seq(in("m1", "0:BIDDER", "0:AUCTION",
        Some(Opcodes.AuctionFillUp), value = 777))))
    assert(bid.map(_.`type`) == Seq("auction_bid"))
    assert(bid.head.value.contains(BigDecimal(777)))
  }

  test("jvault stake/unstake/claim classify with canonical types") {
    val st = Classifier.classify("jv1",
      Seq(tx("T1", "0:POOL", 10)),
      Map("T1" -> Seq(in("m1", "0:STAKER", "0:POOL",
        Some(Opcodes.JvaultReceiveJettons)))))
    assert(st.map(_.`type`) == Seq("jvault_stake"))
    val (utxs, umsgs) = chain2(Opcodes.JvaultClaim, Opcodes.JvaultSendClaimedRewards)
    assert(Classifier.classify("jv2", utxs, umsgs).map(_.`type`) ==
      Seq("jvault_claim"))
  }

  test("tgbtc mint/burn events classify") {
    val mint = Classifier.classify("tg1",
      Seq(tx("T1", "0:BRIDGE", 10)),
      Map("T1" -> Seq(in("m1", "0:TEAM", "0:BRIDGE", Some(Opcodes.TgbtcMint)))))
    // bare events (no chain context) are the reference's CRIPPLED path:
    // the type gains a _fallback suffix (TgBTC*LogOnlyMatcher,
    // blocks/tgbtc.py:335-390; _fill_tgbtc_*_action)
    assert(mint.map(_.`type`) == Seq("tgbtc_mint_fallback"))
    val burn = Classifier.classify("tg2",
      Seq(tx("T1", "0:BRIDGE", 10)),
      Map("T1" -> Seq(in("m1", "0:USER", "0:BRIDGE", Some(Opcodes.TgbtcBurn)))))
    assert(burn.map(_.`type`) == Seq("tgbtc_burn_fallback"))
  }

  test("tonco v3 swap requires the router pay-to child; tags dex=tonco") {
    val (stxs, smsgs) = chain2(Opcodes.ToncoPoolV3Swap, Opcodes.ToncoRouterV3PayTo)
    val sw = Classifier.classify("tc1", stxs, smsgs)
    assert(sw.map(_.`type`) == Seq("jetton_swap"))
    assert(sw.head.jetton_swap_data.exists(_.dex == "tonco"))
    // without the pay-to child it stays a call
    val alone = Classifier.classify("tc2",
      Seq(tx("T1", "0:POOL", 10)),
      Map("T1" -> Seq(in("m1", "0:U", "0:POOL", Some(Opcodes.ToncoPoolV3Swap)))))
    assert(alone.map(_.`type`) == Seq("call_contract"))
  }

  test("evaa tiny opcodes match ONLY with the required user-contract " +
      "round trip (reference requires an outcome leg, blocks/evaa.py)") {
    // supply: master -> user -> supply_success
    // real EVAA master calls always carry a body (the matchers use a
    // null-body guard to skip ordinary low-opcode calls)
    def opBody(op: Long) = Some(graft.functions.Boc.serializeBase64(
      new graft.functions.Boc.Builder()
        .storeUint(BigInt(op), 32).storeUint(BigInt(1), 64).build()))
    def chain3(op1: Long, op2: Long, op3: Long) = (
      Seq(tx("T1", "0:A", 10), tx("T2", "0:B", 20), tx("T3", "0:A", 30)),
      Map(
        "T1" -> Seq(in("m1", "0:U", "0:A", Some(op1)).copy(body = opBody(op1)),
          out("m2", "0:A", "0:B", Some(op2))),
        "T2" -> Seq(in("m2", "0:A", "0:B", Some(op2)),
          out("m3", "0:B", "0:A", Some(op3))),
        "T3" -> Seq(in("m3", "0:B", "0:A", Some(op3)))))
    val (stxs, smsgs) = chain3(Opcodes.EvaaSupplyMaster,
      Opcodes.EvaaSupplyUser, Opcodes.EvaaSupplySuccess)
    assert(Classifier.classify("ev1", stxs, smsgs).map(_.`type`) ==
      Seq("evaa_supply"))
    // a supply WITHOUT the outcome leg is not classified (reference
    // returns [] when neither success/fail/refund matched)
    val (ntxs, nmsgs) = chain2(Opcodes.EvaaSupplyMaster, Opcodes.EvaaSupplyUser)
    assert(!Classifier.classify("ev1b", ntxs, nmsgs)
      .exists(_.`type` == "evaa_supply"))
    // withdraw: master -> user -> fail excess (locked)
    val (wtxs, wmsgs) = chain3(Opcodes.EvaaWithdrawMaster,
      Opcodes.EvaaWithdrawUser, 0x21e6L)
    val w = Classifier.classify("ev2", wtxs, wmsgs)
    assert(w.map(_.`type`) == Seq("evaa_withdraw"))
    assert(!w.head.success)
    assert(w.head.evaa_withdraw_data.get.fail_reason
      .contains("withdraw_locked_excess"))
    // a bare opcode-1 call (e.g. the sim's click) must NOT become evaa
    val bare = Classifier.classify("ev3",
      Seq(tx("T1", "0:APP", 10)),
      Map("T1" -> Seq(in("m1", "0:U", "0:APP", Some(1L)))))
    assert(bare.map(_.`type`) == Seq("call_contract"))
  }

  test("coffee swap and liquidity family classify with dex tag") {
    val (stxs, smsgs) = chain2(Opcodes.CoffeeSwapNative, Opcodes.CoffeeSwapSuccess)
    val sw = Classifier.classify("cf1", stxs, smsgs)
    assert(sw.map(_.`type`) == Seq("jetton_swap"))
    assert(sw.head.jetton_swap_data.exists(_.dex == "coffee"))
    val (dtxs, dmsgs) = chain2(Opcodes.CoffeeDepositLiquidityNative,
      Opcodes.CoffeeDepositLiquiditySuccess)
    assert(Classifier.classify("cf2", dtxs, dmsgs).map(_.`type`) ==
      Seq("dex_deposit_liquidity"))
    // a bare create_pool_native without the creator-request/deploy chain
    // is NOT a pool creation (the reference's creator matcher requires
    // the full chain, blocks/liquidity.py:2055-2124)
    val pool = Classifier.classify("cf3",
      Seq(tx("T1", "0:FACTORY", 10)),
      Map("T1" -> Seq(in("m1", "0:CREATOR", "0:FACTORY",
        Some(Opcodes.CoffeeCreatePoolNative)))))
    assert(!pool.exists(_.`type`.startsWith("coffee_create_pool")))
  }

  test("bare layerzero heads without their chains fall back to call_contract") {
    // the reference's send matcher requires the full channel→msglib→uln
    // →callback chain (blocks/layerzero.py:173-220); a lone endpoint
    // send is NOT a layerzero_send (build_block returns [])
    val (stxs, smsgs) = chain2(Opcodes.LayerZeroEndpointSend,
      Opcodes.LayerZeroEventMsg)
    assert(!Classifier.classify("lz1", stxs, smsgs)
      .exists(_.`type`.startsWith("layerzero")))
    // likewise a lone channel commit (head is the ULN commit :459-461)
    val commit = Classifier.classify("lz2",
      Seq(tx("T1", "0:CHANNEL", 10)),
      Map("T1" -> Seq(in("m1", "0:DVN", "0:CHANNEL",
        Some(Opcodes.LayerZeroChannelCommitPacket)))))
    assert(!commit.exists(_.`type`.startsWith("layerzero")))
  }

  test("ethena withdrawal request matches via labeled child captures") {
    // jetton transfer chain whose receiver wallet ALSO mints pool jettons
    // and fires the tsUSDe transfer call — the labeled composite
    val txs = Seq(tx("TW1", "0:WA", 10), tx("TW2", "0:WB", 20),
      tx("TM", "0:POOL", 30), tx("TU", "0:TSUSDE", 40))
    val msgs = Map(
      "TW1" -> Seq(
        in("m1", "0:OWNER", "0:WA", Some(Opcodes.JettonTransfer)),
        out("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer))),
      "TW2" -> Seq(
        in("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer)),
        out("m3", "0:WB", "0:POOL", Some(Opcodes.JettonMint)),
        out("m4", "0:WB", "0:TSUSDE", Some(Opcodes.EthenaTsUsdeTransfer))),
      "TM" -> Seq(in("m3", "0:WB", "0:POOL", Some(Opcodes.JettonMint))),
      "TU" -> Seq(in("m4", "0:WB", "0:TSUSDE", Some(Opcodes.EthenaTsUsdeTransfer))))
    val actions = Classifier.classify("eth1", txs, msgs)
    // serialized into the staking family with provider=ethena
    // (block_tree_serializer.py:1266-1273)
    assert(actions.map(_.`type`) == Seq("stake_withdrawal_request"))
    assert(actions.head.staking_data.flatMap(_.provider).contains("ethena"))
    assert(actions.head.source.contains("0:OWNER"))
    // destination = the POOL = the mint message's source
    // (block_tree_serializer.py:1269)
    assert(actions.head.destination.contains("0:WB"))
    assert(actions.head.tx_hashes.toSet == Set("TW1", "TW2", "TM", "TU"))
  }

  test("plain jetton transfer is NOT stolen by the ethena matcher") {
    val txs = Seq(tx("TW1", "0:WA", 10), tx("TW2", "0:WB", 20))
    val msgs = Map(
      "TW1" -> Seq(in("m1", "0:OWNER", "0:WA", Some(Opcodes.JettonTransfer)),
        out("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer))),
      "TW2" -> Seq(in("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer))))
    assert(Classifier.classify("eth2", txs, msgs).map(_.`type`) ==
      Seq("jetton_transfer"))
  }

  test("cocoon payout and client lifecycle classify") {
    val (ptxs, pmsgs) = chain2(Opcodes.CocoonPayout, Opcodes.CocoonReturnExcesses)
    assert(Classifier.classify("cc1", ptxs, pmsgs).map(_.`type`) ==
      Seq("cocoon_worker_payout"))
    val top = Classifier.classify("cc2",
      Seq(tx("T1", "0:PROXY", 10)),
      Map("T1" -> Seq(in("m1", "0:CLIENT", "0:PROXY",
        Some(Opcodes.CocoonClientTopUp)))))
    assert(top.map(_.`type`) == Seq("cocoon_client_top_up"))
    val reg = Classifier.classify("cc3",
      Seq(tx("T1", "0:PROXY", 10)),
      Map("T1" -> Seq(in("m1", "0:CLIENT", "0:PROXY",
        Some(Opcodes.CocoonClientRegister)))))
    assert(reg.map(_.`type`) == Seq("cocoon_client_register"))
  }

  test("nft_mint fires only with interface data (pre-joined map, no IO)") {
    // deploy of a fresh account that the interface map knows as nft_item
    val txs = Seq(tx("T1", "0:MINTER", 10),
      tx("T2", "0:NEWNFT", 20, orig = "uninit"))
    val msgs = Map(
      "T1" -> Seq(in("m1", "0:CREATOR", "0:MINTER", Some(5L)),
        out("m2", "0:MINTER", "0:NEWNFT", Some(1L))),
      "T2" -> Seq(in("m2", "0:MINTER", "0:NEWNFT", Some(1L))))
    val withIfaces = Classifier.classify("mint1", txs, msgs,
      interfaces = Map("0:NEWNFT" -> "nft_item"),
      nftItems = Map("0:NEWNFT" -> NftItemInfo(Some("42"), Some("0:COLL"))))
    assert(withIfaces.exists(_.`type` == "nft_mint"),
      s"expected nft_mint in ${withIfaces.map(_.`type`)}")
    val mint = withIfaces.find(_.`type` == "nft_mint").get
    assert(mint.destination.contains("0:NEWNFT"))
    // index + collection resolve through the nft_items dim
    // (_fill_nft_mint_action serializer:267-277)
    assert(mint.nft_mint_data.get.nft_item_index.contains("42"))
    assert(mint.asset.contains("0:COLL"))
    assert(mint.asset_secondary.contains("0:NEWNFT"))
    // without interface data the deploy stays a plain contract_deploy
    val without = Classifier.classify("mint2", txs, msgs)
    assert(!without.exists(_.`type` == "nft_mint"))
    assert(without.exists(_.`type` == "contract_deploy"))
  }

  private def outbidCommentBody: String = {
    import graft.functions.Boc
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0), 32)
      .storeBytes("Your bid has been outbid by another user".getBytes("UTF-8"))
      .build())
  }

  test("auction outbid keeps the bid action AND emits auction_outbid " +
      "(auction.py:133-171 merges only the refund transfer)") {
    val txs = Seq(tx("T1", "0:AUCTION", 10), tx("T2", "0:PREVBIDDER", 20))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:BIDDER", "0:AUCTION", Some(Opcodes.AuctionFillUp), value = 900),
        out("m2", "0:AUCTION", "0:PREVBIDDER", None, value = 800)),
      "T2" -> Seq(in("m2", "0:AUCTION", "0:PREVBIDDER", None, value = 800)
        .copy(body = Some(outbidCommentBody))))
    val actions = Classifier.classify("ob1", txs, msgs)
    assert(actions.map(_.`type`).sorted == Seq("auction_bid", "auction_outbid"))
    val outbid = actions.find(_.`type` == "auction_outbid").get
    val bid = actions.find(_.`type` == "auction_bid").get
    assert(outbid.value.contains(BigDecimal(800)))
    assert(outbid.source.contains("0:AUCTION"))
    assert(outbid.destination.contains("0:PREVBIDDER"))
    // auction_bid is a v1 op — the nested outbid serializes flat
    // (block_tree_serializer.py:1546-1556)
    assert(outbid.parent_action_id.isEmpty)
    assert(bid.value.contains(BigDecimal(900)))
  }

  test("two outbid-comment refunds are rejected (false-positive guard)") {
    val txs = Seq(tx("T1", "0:AUCTION", 10), tx("T2", "0:PREV1", 20),
      tx("T3", "0:PREV2", 30))
    val msgs = Map(
      "T1" -> Seq(
        in("m1", "0:BIDDER", "0:AUCTION", Some(Opcodes.AuctionFillUp), value = 900),
        out("m2", "0:AUCTION", "0:PREV1", None, value = 800),
        out("m3", "0:AUCTION", "0:PREV2", None, value = 700)),
      "T2" -> Seq(in("m2", "0:AUCTION", "0:PREV1", None, value = 800)
        .copy(body = Some(outbidCommentBody))),
      "T3" -> Seq(in("m3", "0:AUCTION", "0:PREV2", None, value = 700)
        .copy(body = Some(outbidCommentBody))))
    val actions = Classifier.classify("ob2", txs, msgs)
    assert(!actions.exists(_.`type` == "auction_outbid"))
    assert(actions.exists(_.`type` == "auction_bid"))
  }

  test("nft purchase pays out to the sale owner — the marketplace fee " +
      "transfer emitted first is NOT the seller (blocks/nft.py:215)") {
    val txs = Seq(tx("T1", "0:SALE", 10), tx("T2", "0:MARKET", 20),
      tx("T3", "0:SELLER", 30), tx("T4", "0:NFT", 40), tx("T5", "0:BUYER", 50))
    val msgs = Map(
      "T1" -> Seq(in("m1", "0:BUYER", "0:SALE", Some(5L), value = 1000),
        out("m2", "0:SALE", "0:MARKET", None, value = 50),
        out("m3", "0:SALE", "0:SELLER", None, value = 900),
        out("m4", "0:SALE", "0:NFT", Some(Opcodes.NftTransfer))),
      "T2" -> Seq(in("m2", "0:SALE", "0:MARKET", None, value = 50)),
      "T3" -> Seq(in("m3", "0:SALE", "0:SELLER", None, value = 900)),
      "T4" -> Seq(in("m4", "0:SALE", "0:NFT", Some(Opcodes.NftTransfer)),
        out("m5", "0:NFT", "0:BUYER", Some(Opcodes.NftOwnershipAssigned))),
      "T5" -> Seq(in("m5", "0:NFT", "0:BUYER", Some(Opcodes.NftOwnershipAssigned))))
    val actions = Classifier.classify("np1", txs, msgs,
      interfaces = Map("0:SALE" -> "nft_sale|0:SELLER"))
    val p = actions.find(_.`type` == "nft_purchase")
    assert(p.isDefined, s"expected nft_purchase in ${actions.map(_.`type`)}")
    // source = the transfer's prev owner (the SALE contract); the true
    // seller rides real_prev_owner (_fill_nft_purchase_action:236-252)
    assert(p.get.source.contains("0:SALE"))
    assert(p.get.destination.contains("0:BUYER"))
    val d = p.get.nft_transfer_data.get
    assert(d.real_prev_owner.contains("0:SELLER"))
    assert(d.is_purchase.contains(true))
    assert(d.price.contains(BigDecimal(1000)))
    assert(d.payout_amount.contains(BigDecimal(900)))
    // the fee transfer survives as its own ton_transfer action
    assert(actions.exists(a => a.`type` == "ton_transfer" &&
      a.destination.contains("0:MARKET")))
  }

  test("nft purchase is skipped when the sale owner is unknown " +
      "(no wrong real_prev_owner)") {
    val txs = Seq(tx("T1", "0:SALE", 10), tx("T2", "0:MARKET", 20),
      tx("T4", "0:NFT", 40))
    val msgs = Map(
      "T1" -> Seq(in("m1", "0:BUYER", "0:SALE", Some(5L), value = 1000),
        out("m2", "0:SALE", "0:MARKET", None, value = 50),
        out("m4", "0:SALE", "0:NFT", Some(Opcodes.NftTransfer))),
      "T2" -> Seq(in("m2", "0:SALE", "0:MARKET", None, value = 50)),
      "T4" -> Seq(in("m4", "0:SALE", "0:NFT", Some(Opcodes.NftTransfer))))
    val actions = Classifier.classify("np2", txs, msgs,
      interfaces = Map("0:SALE" -> "nft_sale")) // interface, but no owner
    assert(!actions.exists(_.`type` == "nft_purchase"))
  }

  test("coffee staking deposit requires the position-NFT mint child " +
      "(staking.py:449-468)") {
    def fixture(withMint: Boolean)
        : (Seq[TxLite], Map[String, Seq[MsgLite]]) = {
      val txs = Seq(tx("TW1", "0:WA", 10), tx("TW2", "0:WB", 20),
        tx("TP", "0:POOL", 30)) ++
        (if (withMint) Seq(tx("TM", "0:POSNFT", 40, orig = "uninit")) else Nil)
      val msgs = Map(
        "TW1" -> Seq(in("m1", "0:STAKER", "0:WA", Some(Opcodes.JettonTransfer)),
          out("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer))),
        "TW2" -> Seq(in("m2", "0:WA", "0:WB", Some(Opcodes.JettonInternalTransfer)),
          out("m3", "0:WB", "0:POOL", Some(Opcodes.CoffeeStakingDeposit))),
        "TP" -> (Seq(in("m3", "0:WB", "0:POOL", Some(Opcodes.CoffeeStakingDeposit))) ++
          (if (withMint) Seq(out("m4", "0:POOL", "0:POSNFT", Some(7L))) else Nil))) ++
        (if (withMint)
          Map("TM" -> Seq(in("m4", "0:POOL", "0:POSNFT", Some(7L))))
        else Map.empty)
      (txs, msgs)
    }
    val (mtxs, mmsgs) = fixture(withMint = true)
    val withMint = Classifier.classify("cs1", mtxs, mmsgs)
    assert(withMint.exists(_.`type` == "coffee_staking_deposit"),
      s"expected coffee_staking_deposit in ${withMint.map(_.`type`)}")
    // a jetton transfer with a bare 0xf9471134 child is NOT a deposit
    val (btxs, bmsgs) = fixture(withMint = false)
    val bare = Classifier.classify("cs2", btxs, bmsgs)
    assert(!bare.exists(_.`type` == "coffee_staking_deposit"))
    assert(bare.exists(_.`type` == "jetton_transfer"))
  }

  // ------------------------------------------------------------------
  // Owner-validation / broken semantics (jettons.py:70-77;
  // classification_state enum database.py:203). The golden corpus has
  // no broken case, so these synthetic fixtures pin the three arms.
  // ------------------------------------------------------------------

  private def jtFixture: (Seq[TxLite], Map[String, Seq[MsgLite]]) = {
    val txs = Seq(
      tx("TW1", "0:WALLET_A", 10), tx("TW2", "0:WALLET_B", 20),
      tx("TN", "0:OWNER_B", 30))
    val msgs = Map(
      "TW1" -> Seq(
        in("m1", "0:OWNER_A", "0:WALLET_A", Some(Opcodes.JettonTransfer)),
        out("m2", "0:WALLET_A", "0:WALLET_B",
          Some(Opcodes.JettonInternalTransfer))),
      "TW2" -> Seq(
        in("m2", "0:WALLET_A", "0:WALLET_B",
          Some(Opcodes.JettonInternalTransfer)),
        out("m3", "0:WALLET_B", "0:OWNER_B", Some(Opcodes.JettonNotify))),
      "TN" -> Seq(in("m3", "0:WALLET_B", "0:OWNER_B",
        Some(Opcodes.JettonNotify))))
    (txs, msgs)
  }

  test("jetton transfer owner mismatch: receiver substituted by the " +
      "wallet row's owner and the trace classifies 'broken' " +
      "(jettons.py:75-77; block_tree_serializer.py:1537-1538)") {
    val (txs, msgs) = jtFixture
    val jw = Map("0:WALLET_A" -> "0:MASTER", "0:WALLET_B" -> "0:MASTER")
    // stated receiver (notify destination) is OWNER_B; the row says the
    // wallet belongs to OWNER_C
    val owners = Map("0:WALLET_B" -> "0:OWNER_C")
    val (actions, state) = Classifier.classifyStatedWith("trOwn", txs, msgs,
      ProtocolMatchers.registryWith(Map.empty, jw, Map.empty, owners))
    assert(state == "broken")
    val a = actions.find(_.`type` == "jetton_transfer").get
    assert(a.destination.contains("0:OWNER_C")) // substituted
    assert(a.asset.contains("0:MASTER")) // resolved via RECEIVER wallet
  }

  test("jetton transfer owner agreement: receiver kept, state 'ok'") {
    val (txs, msgs) = jtFixture
    val jw = Map("0:WALLET_A" -> "0:MASTER", "0:WALLET_B" -> "0:MASTER")
    val owners = Map("0:WALLET_B" -> "0:OWNER_B")
    val (actions, state) = Classifier.classifyStatedWith("trOk", txs, msgs,
      ProtocolMatchers.registryWith(Map.empty, jw, Map.empty, owners))
    assert(state == "ok")
    val a = actions.find(_.`type` == "jetton_transfer").get
    assert(a.destination.contains("0:OWNER_B"))
    assert(a.asset.contains("0:MASTER"))
  }

  test("jetton transfer with NO repository row for the receiver wallet " +
      "refuses to match — blocks stay call_contract (jettons.py:71-72)") {
    val (txs, msgs) = jtFixture
    // repo present (non-empty jw map) but the receiver wallet is absent
    val jw = Map("0:WALLET_A" -> "0:MASTER")
    val (actions, state) = Classifier.classifyStatedWith("trMiss", txs, msgs,
      ProtocolMatchers.registryWith(Map.empty, jw, Map.empty, Map.empty))
    assert(state == "ok")
    assert(!actions.exists(_.`type` == "jetton_transfer"),
      s"should not match: ${actions.map(_.`type`)}")
    assert(actions.exists(_.`type` == "call_contract"))
  }

  test("repository-less jetton transfer keeps the lenient path: match " +
      "with the sender wallet standing in, state 'ok'") {
    val (txs, msgs) = jtFixture
    val (actions, state) =
      Classifier.classifyStatedWith("trNoRepo", txs, msgs,
        ProtocolMatchers.registry)
    assert(state == "ok")
    val a = actions.find(_.`type` == "jetton_transfer").get
    assert(a.asset.contains("0:WALLET_A"))
  }
}
