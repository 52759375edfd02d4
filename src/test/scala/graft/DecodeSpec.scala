package graft

import graft.functions.{Boc, Decode}
import graft.classifier.Opcodes
import org.scalatest.funsuite.AnyFunSuite

/** Standalone decode dispatch (the /decode surface): every registered
  * opcode family identifies and round-trips its fields; unknown opcodes
  * still identify; garbage stays None. */
class DecodeSpec extends AnyFunSuite {

  private val addr = "0:" + "7E" * 32

  test("jetton transfer round-trips through the dispatch") {
    val body = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x0f8a7ea5L), 32).storeUint(BigInt(77), 64)
      .storeCoins(BigInt(123456)).storeAddress(Some(addr))
      .storeAddress(None).storeBit(false).storeCoins(BigInt(1))
      .storeBit(false).build())
    val d = Decode.decode(body).get
    assert(d.name == "jetton_transfer" && d.opcode == 0x0f8a7ea5L)
    assert(d.fields("query_id") == "77")
    assert(d.fields("amount") == "123456")
    assert(d.fields("destination") == addr)
    assert(!d.fields.contains("response_destination"))
  }

  test("multisig init order decodes signers through the dispatch") {
    val body = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x9c73fba2L), 32).storeUint(BigInt(9), 64)
      .storeUint(BigInt(2), 8)
      .storeRef(new Boc.Builder().storeBit(false).build()) // empty signers
      .storeUint(BigInt(42), 48)
      .storeRef(new Boc.Builder().storeUint(BigInt(1), 8).build())
      .storeBit(false).build())
    val d = Decode.decode(body).get
    assert(d.name == "multisig_init_order")
    assert(d.fields("threshold") == "2")
    assert(d.fields("expiration_date") == "42")
    assert(d.fields("approve_on_init") == "false")
  }

  test("text comment, excesses, and mint calls identify") {
    val c = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0), 32).storeBytes("hi".getBytes("UTF-8")).build())
    assert(Decode.decode(c).get.fields("text") == "hi")
    val ex = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xd53276dbL), 32).storeUint(BigInt(3), 64).build())
    val exd = Decode.decode(ex).get
    assert(exd.name == "excesses" && exd.fields("query_id") == "3")
    val mint = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JettonMint), 32).storeUint(BigInt(1), 64)
      .storeAddress(Some(addr)).storeCoins(BigInt(5)).build())
    val md = Decode.decode(mint).get
    assert(md.name == "jetton_mint" && md.fields("ton_amount") == "5")
  }

  test("unknown opcode identifies as unknown; garbage is None") {
    val unk = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x12345678L), 32).build())
    val d = Decode.decode(unk).get
    assert(d.name == "unknown" && d.opcode == 0x12345678L)
    assert(Decode.decode("!!!notbase64").isEmpty)
    val short = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(3), 8).build())
    assert(Decode.decode(short).isEmpty)
  }

  test("a malformed body with a known opcode degrades to the NAME with " +
      "empty fields, not a throw (class identified via OpcodeNames)") {
    val truncated = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x0f8a7ea5L), 32).storeUint(BigInt(1), 8).build())
    val d = Decode.decode(truncated).get
    assert(d.name == "jetton_transfer" && d.opcode == 0x0f8a7ea5L &&
      d.fields.isEmpty)
  }

  test("liquidity/staking event bodies round-trip through the dispatch") {
    import graft.functions.Boc
    // tonco start-burn: qid u64, index u64, liquidity u128, ticks i24
    val burn = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x530b5f2cL), 32).storeUint(BigInt(9), 64)
      .storeUint(BigInt(42), 64).storeUint(BigInt(777), 128)
      .storeInt(BigInt(-100), 24).storeInt(BigInt(200), 24).build())
    val d1 = Decode.decode(burn).get
    assert(d1.name == "tonco_pool_v3_start_burn" &&
      d1.fields("burned_index") == "42" &&
      d1.fields("liquidity_to_burn") == "777" &&
      d1.fields("tick_lower") == "-100")
    // coffee withdrawal event: qid u64 then three coins
    val ev = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xc0ffee35L), 32).storeUint(BigInt(1), 64)
      .storeCoins(BigInt(100000)).storeCoins(BigInt(100000000))
      .storeCoins(BigInt(31622)).build())
    val d2 = Decode.decode(ev).get
    assert(d2.name == "coffee_liquidity_withdrawal_event" &&
      d2.fields("amount1") == "100000" && d2.fields("lp_amount") == "31622")
    // jetton notify with inline payload
    val notify = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x7362d09cL), 32).storeUint(BigInt(5), 64)
      .storeCoins(BigInt(123)).storeAddress(Some("0:" + "AB" * 32))
      .storeBit(false).build())
    val d3 = Decode.decode(notify).get
    assert(d3.name == "jetton_notify" && d3.fields("amount") == "123" &&
      d3.fields("sender") == "0:" + "AB" * 32)
  }

  test("payout and static-data bodies decode through the dispatch") {
    import graft.functions.Boc
    val payout = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xad4eb6f5L), 32).storeUint(BigInt(7), 64)
      .storeRef(Boc.Cell.empty).storeCoins(BigInt(25998968)).build())
    val d1 = Decode.decode(payout).get
    assert(d1.name == "dedust_payout_from_pool" &&
      d1.fields("amount") == "25998968")
    val rsd = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x8b771735L), 32).storeUint(BigInt(3), 64)
      .storeUint(BigInt(49), 256).storeAddress(Some("0:" + "CD" * 32))
      .build())
    val d2 = Decode.decode(rsd).get
    assert(d2.name == "nft_report_static_data" && d2.fields("index") == "49" &&
      d2.fields("collection") == "0:" + "CD" * 32)
  }

  test("lz_event decodes the nested action_data chain: topic, body topic, " +
      "mdguid guid (layerzero.py:303-392)") {
    val guid = BigInt("ab" * 32, 16)
    val mdguid = new Boc.Builder()
      .storeUint(BigInt("5847552683615412884211067"), 116)
      .storeInt(BigInt(-1), 234).storeUint(guid, 256)
      .storeRef(new Boc.Builder().build()) // md, unread
      .build()
    val oftBody = new Boc.Builder()
      .storeUint(BigInt(435778055796L), 256).storeRef(mdguid).build()
    val actionData = new Boc.Builder()
      .storeUint(BigInt("7850279558805522911016931325"), 134)
      .storeInt(BigInt(-1), 216)
      .storeUint(BigInt(435778055796L), 256)
      .storeRef(oftBody)
      .storeRef(new Boc.Builder().build()) // initialStorage
      .build()
    val body = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xe33b9873L), 32).storeUint(BigInt(5), 64)
      .storeCoins(BigInt(777)).storeAddress(Some(addr))
      .storeRef(actionData).build())
    val d = Decode.decode(body).get
    assert(d.name == "lz_event")
    assert(d.fields("query_id") == "5")
    assert(d.fields("donation_nanos") == "777")
    assert(d.fields("origin") == addr)
    assert(d.fields("topic") == "435778055796")
    assert(d.fields("event_body_topic") == "435778055796")
    assert(d.fields("guid") == "0x" + "ab" * 32)

    // a wrong action header degrades to named-empty, like the reference's
    // assert-throw path
    val badAction = new Boc.Builder()
      .storeUint(BigInt(1), 134).storeInt(BigInt(-1), 216)
      .storeUint(BigInt(1), 256).storeRef(oftBody)
      .storeRef(new Boc.Builder().build()).build()
    val bad = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xe33b9873L), 32).storeUint(BigInt(5), 64)
      .storeCoins(BigInt(1)).storeAddress(Some(addr))
      .storeRef(badAction).build())
    val db = Decode.decode(bad).get
    assert(db.name == "layer_zero_event_msg_body" && db.fields.isEmpty)
  }

  test("stonfi v2 swap body decodes the dex payload chain and the " +
      "cross-pool wallet walk (swaps.py:129-203)") {
    val w1 = "0:" + "0A" * 32
    val w2 = "0:" + "0B" * 32
    // cross-pool custom payload: swap sum_type → pool wallet 2, no refs
    val cross = new Boc.Builder()
      .storeUint(BigInt(0x6664de2aL), 32).storeAddress(Some(w2)).build()
    val swapBody = new Boc.Builder()
      .storeCoins(BigInt(5)) // min_out
      .storeAddress(Some(addr)) // receiver
      .storeCoins(BigInt(1)) // fwd_gas
      .storeBit(true).storeRef(cross) // custom_payload
      .storeCoins(BigInt(0)) // refund_fwd_gas
      .storeBit(false) // no refund payload
      .storeUint(BigInt(10), 16) // ref_fee
      .storeAddress(None) // ref_address
      .build()
    val dex = new Boc.Builder()
      .storeUint(BigInt(0x6664de2aL), 32) // transferred_op
      .storeAddress(Some(w1)) // token_wallet1
      .storeAddress(Some(addr)) // refund
      .storeAddress(Some(addr)) // excesses
      .storeUint(BigInt(12345), 64) // deadline
      .storeRef(swapBody).build()
    val body = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x6664de2aL), 32).storeUint(BigInt(9), 64)
      .storeAddress(Some(addr))
      .storeCoins(BigInt(100)).storeCoins(BigInt(0))
      .storeRef(dex).build())
    val d = Decode.decode(body).get
    assert(d.name == "stonfi_swap_v2")
    assert(d.fields("query_id") == "9")
    assert(d.fields("left_amount") == "100")
    assert(d.fields("token_wallet1") == w1)
    assert(d.fields("min_out") == "5")
    assert(d.fields("tx_deadline") == "12345")
    assert(d.fields("pool_accounts") == s"$w1,$w2")
  }

  test("tonco pay_to decodes the exit-200 swap-info and exit-201 " +
      "burn-info cells (swaps.py:345-404)") {
    def payTo(exit: Long, info: Option[Boc.Cell]): String =
      Boc.serializeBase64 {
        val b = new Boc.Builder()
          .storeUint(BigInt(0xa1daa96dL), 32).storeUint(BigInt(3), 64)
          .storeAddress(Some(addr)).storeAddress(None)
          .storeUint(BigInt(exit), 32).storeUint(BigInt(44), 64)
          .storeBit(true)
          .storeRef(new Boc.Builder()
            .storeCoins(BigInt(70)).storeAddress(Some(addr))
            .storeCoins(BigInt(0)).storeAddress(None).build())
        info.foreach(c => b.storeBit(true).storeRef(c))
        b.build()
      }
    val swapInfo = new Boc.Builder()
      .storeUint(BigInt(11), 128).storeUint(BigInt(22), 160)
      .storeInt(BigInt(-5), 24).storeInt(BigInt(33), 256)
      .storeInt(BigInt(44), 256).build()
    val d200 = Decode.decode(payTo(200L, Some(swapInfo))).get
    assert(d200.fields("liquidity") == "11")
    assert(d200.fields("price_sqrt") == "22")
    assert(d200.fields("tick_swap") == "-5")
    assert(d200.fields("seqno") == "44")
    assert(d200.fields("amount0") == "70")
    val burnInfo = new Boc.Builder()
      .storeUint(BigInt(8), 64).storeUint(BigInt(9), 128)
      .storeInt(BigInt(-1), 24).storeInt(BigInt(1), 24)
      .storeInt(BigInt(0), 24).build()
    val d201 = Decode.decode(payTo(201L, Some(burnInfo))).get
    assert(d201.fields("nft_index") == "8")
    assert(d201.fields("liquidity_burned") == "9")
    assert(d201.fields("tick_lower") == "-1")
    assert(!d201.fields.contains("liquidity"))
  }

  test("evaa liquidate_satisfied decodes the full ref field list " +
      "including the optional tail (evaa.py:317-368)") {
    def body(withTail: Boolean): String = Boc.serializeBase64 {
      val ref = new Boc.Builder()
        .storeInt(BigInt(-7), 64) // delta_loan
        .storeUint(BigInt(100), 64) // liquidatable
        .storeUint(BigInt(3), 64) // protocol_gift
        .storeInt(BigInt(50), 64) // new_user_loan
        .storeUint(BigInt("11" * 32, 16), 256) // collateral asset
        .storeInt(BigInt(-9), 64) // delta_collateral
        .storeUint(BigInt(77), 64) // collateral_reward
      if (withTail) ref.storeUint(BigInt(5), 64).storeInt(BigInt(6), 64)
        .storeUint(BigInt(7), 64)
        .storeRef(new Boc.Builder().build())
      new Boc.Builder()
        .storeUint(BigInt(0x311), 32).storeUint(BigInt(2), 64)
        .storeAddress(Some(addr)).storeAddress(Some(addr))
        .storeUint(BigInt("22" * 32, 16), 256)
        .storeRef(ref.build()).build()
    }
    val d = Decode.decode(body(withTail = true)).get
    assert(d.name == "evaa_liquidate_satisfied")
    assert(d.fields("delta_loan_principal") == "-7")
    assert(d.fields("liquidatable_amount") == "100")
    assert(d.fields("protocol_gift") == "3")
    assert(d.fields("collateral_reward") == "77")
    assert(d.fields("min_collateral_amount") == "5")
    assert(d.fields("forward_ton_amount") == "7")
    val noTail = Decode.decode(body(withTail = false)).get
    assert(noTail.fields("delta_collateral_principal") == "-9")
    assert(!noTail.fields.contains("min_collateral_amount"))
  }

  test("marker-only reference classes are identified by name across the " +
      "full inventory (OpcodeNames)") {
    // DedustSwapPeer — a reference class with no parser at all
    val b = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x72aca8aaL), 32).build())
    val d = Decode.decode(b).get
    assert(d.name == "dedust_swap_peer" && d.fields.isEmpty)
    assert(graft.functions.OpcodeNames.names.size >= 300)
  }

  test("FieldDecoderOpcodes is exactly the decodeOp case-arm set " +
      "(source-extraction sync gate)") {
    // extract every opcode literal that is part of a case PATTERN inside
    // the decodeOp match — including multi-opcode arms continued across
    // lines — and require set equality, so a new decoder arm cannot land
    // without registering its opcode for the pruned dispatch.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/functions/Decode.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val block = src.substring(src.indexOf("private def decodeOp"),
      src.indexOf("case _ => None"))
    val lit = "0x([0-9a-fA-F]+)L".r
    var inPattern = false
    val found = scala.collection.mutable.Set[Long]()
    block.linesIterator.foreach { ln =>
      val s = ln.trim
      if (s.startsWith("case ") || inPattern) {
        lit.findAllMatchIn(ln).foreach(m =>
          found += java.lang.Long.parseLong(m.group(1), 16))
        inPattern = s.endsWith("|")
      } else inPattern = false
    }
    assert(found.toSet == Decode.FieldDecoderOpcodes,
      s"out of sync: +${(found.toSet -- Decode.FieldDecoderOpcodes).map(_.toHexString)} " +
        s"-${(Decode.FieldDecoderOpcodes -- found).map(_.toHexString)}")
  }

  test("opcode-pruned resolver harvest equals the unpruned harvest") {
    import graft.functions.TlbDecoders
    // registered opcode with address fields: jetton transfer
    val jt = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x0f8a7ea5L), 32).storeUint(BigInt(7), 64)
      .storeCoins(BigInt(1000)).storeAddress(Some(addr))
      .storeAddress(Some(addr)).storeBit(false)
      .storeCoins(BigInt(0)).storeBit(false).build())
    assert(TlbDecoders.resolverAddressKeys(0x0f8a7ea5L, jt) ==
      TlbDecoders.resolverAddressKeysUnpruned(jt))
    assert(TlbDecoders.resolverAddressKeys(0x0f8a7ea5L, jt).nonEmpty)
    // marker-only opcode (no field decoder): pruned path must equal the
    // unpruned empty harvest WITHOUT parsing
    val marker = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x72aca8aaL), 32).build())
    assert(TlbDecoders.resolverAddressKeys(0x72aca8aaL, marker) ==
      TlbDecoders.resolverAddressKeysUnpruned(marker))
    assert(TlbDecoders.resolverAddressKeys(0x72aca8aaL, marker).isEmpty)
    // unknown opcode entirely
    val unknown = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xdeadbeefL), 32).build())
    assert(TlbDecoders.resolverAddressKeys(0xdeadbeefL, unknown) ==
      TlbDecoders.resolverAddressKeysUnpruned(unknown))
    // signed-int32 opcode storage (negative longs) must mask correctly
    val signedOp = 0x0f8a7ea5L.toInt.toLong // positive here, but the
    assert(TlbDecoders.resolverAddressKeys(signedOp, jt).nonEmpty)
    val negOp = 0xf718510fL.toInt.toLong // multisig_new_order < 0 as int
    assert(negOp < 0)
    val mn = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0xf718510fL), 32).storeUint(BigInt(7), 64)
      .storeUint(BigInt(3), 32).storeBit(true).storeUint(BigInt(0), 8)
      .storeUint(BigInt(1234567), 48).build())
    assert(TlbDecoders.resolverAddressKeys(negOp, mn) ==
      TlbDecoders.resolverAddressKeysUnpruned(mn))
  }
}
