package graft

import graft.functions.Interfaces

class InterfacesSpec extends SparkSpec {

  private val table = Map("h1" -> "wallet_v4", "h2" -> "jetton_wallet")

  test("TVM method-id derivation matches the published scheme") {
    // "seqno" -> 85143 is the widely documented reference value
    assert(Interfaces.methodId("seqno") == 85143L)
    // ids are 17-bit with the high bit always set
    for (n <- Seq("get_wallet_data", "get_jetton_data", "get_nft_data"))
      assert((Interfaces.methodId(n) & 0x10000L) != 0)
  }

  test("exact code-hash match wins") {
    assert(Interfaces.detect(table)("h1", Nil).contains("wallet_v4"))
    assert(Interfaces.detect(table)("h2", Seq(102351L)).contains("jetton_wallet"))
  }

  test("method-id subset fallback") {
    assert(Interfaces.detect(table)("unknown", Seq(102351L, 1L))
      .contains("nft_item"))
    assert(Interfaces.detect(table)("unknown", Seq(106029L, 103289L, 5L))
      .contains("jetton_master"))
    assert(Interfaces.detect(table)("unknown", Seq(1L, 2L)).isEmpty)
    assert(Interfaces.detect(table)(null, Seq(102351L)).contains("nft_item"))
  }

  test("method ids extract from a SETCP0+DICTPUSHCONST code prologue") {
    import graft.functions.Boc
    val ids = Seq(102351L, 85143L, 113617L)
    // method dict: Hashmap 19 with inline (non-ref) leaf values
    val dictE = Boc.buildDictRefs(
      ids.map(id => BigInt(id) -> new Boc.Builder().storeUint(BigInt(0), 8).build()).toMap, 19)
    val ds = dictE.beginParse()
    assert(ds.loadBit()) // non-empty
    val code = new Boc.Builder()
      .storeUint(BigInt(0xff), 8).storeUint(BigInt(0), 8) // SETCP0
      .storeUint(BigInt(0x1e94), 13).storeBit(true) // DICTPUSHCONST
      .storeUint(BigInt(19), 10) // key length
      .storeRef(ds.loadRef())
      .build()
    val got = Interfaces.methodIdsFromCode(Boc.serializeBase64(code))
    assert(got.sorted == ids.sorted)
    // non-standard prologue → extractor refuses (detection falls back)
    val plain = new Boc.Builder().storeUint(BigInt(0), 32).build()
    intercept[IllegalArgumentException] {
      Interfaces.methodIdsFromCode(Boc.serializeBase64(plain))
    }
    // end-to-end: extracted ids drive the subset detection
    assert(Interfaces.detect(Map.empty)("unknown", got).contains("nft_item"))
  }

  test("public catalog: exact code hash wins immediately; method subsets " +
      "return every match sorted (DetectInterface, interfaces.go:891-934)") {
    assert(Interfaces.publicCatalog.size >= 100,
      s"catalog carries the full public table: ${Interfaces.publicCatalog.size}")
    assert(Interfaces.publicCodeHashTable.size >= 50) // 55 in the source
    // exact hash match: single name, no method check
    assert(Interfaces.detectAll(
      "rNK47E23QUOW+lNphlPswEpBbuNknY9bILQfF2rYM/A=", Nil) ==
      Seq("airdrop_interlocker_v1"))
    // method subset: every matching interface, sorted by name
    val cronId = Interfaces.methodId("get_cron_info")
    assert(Interfaces.detectAll("nope", Seq(cronId)) == Seq("cron"))
    // a superset of two interfaces' requirements matches both
    val poolIds = Seq("get_pool_addr", "get_lp_multitoken_wallet",
      "get_liquidity_data").map(Interfaces.methodId)
    val got = Interfaces.detectAll("nope", poolIds)
    assert(got == got.sorted && got.toSet ==
      Set("bidask_range", "bidask_internal_liquidity_vault"), s"got $got")
    // no methods, no hash match => empty
    assert(Interfaces.detectAll("nope", Nil).isEmpty)
  }

  test("column-level detection agrees with the scala function") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("h1", Seq(1L)), ("unknown", Seq(102351L)), ("x", Seq(7L)))
      .toDF("code_hash", "method_ids")
    val got = df.withColumn("iface",
      Interfaces.detectColumn(spark, table, col("code_hash"), col("method_ids")))
      .collect().map(r => Option(r.getAs[String]("iface")))
    assert(got.toSeq == Seq(Some("wallet_v4"), Some("nft_item"), None))
  }
}
