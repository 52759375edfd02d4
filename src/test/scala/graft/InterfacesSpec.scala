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
