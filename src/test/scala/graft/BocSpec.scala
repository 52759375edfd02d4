package graft

import graft.functions.{Boc, TlbDecoders}

import scala.util.Random

class BocSpec extends SparkSpec {

  private def b(): Boc.Builder = new Boc.Builder

  test("cell build/parse roundtrip with odd bit lengths and refs") {
    val rnd = new Random(7)
    for (_ <- 1 to 30) {
      val leafBits = 1 + rnd.nextInt(200)
      val leaf = {
        val bld = b()
        (0 until leafBits).foreach(_ => bld.storeBit(rnd.nextBoolean()))
        bld.build()
      }
      val root = b().storeUint(BigInt(0xdeadbeefL), 32)
        .storeRef(leaf).storeRef(b().storeUint(BigInt(7), 5).build())
        .build()
      val back = Boc.parse(Boc.serialize(root))
      assert(back.bitLen == root.bitLen)
      assert(back.refs.length == 2)
      assert(back.refs.head.bitLen == leafBits)
      val s = back.beginParse()
      assert(s.loadUint(32) == BigInt(0xdeadbeefL))
      val l = s.loadRef().beginParse()
      val orig = leaf.beginParse()
      (0 until leafBits).foreach(_ => assert(l.loadBit() == orig.loadBit()))
    }
  }

  test("coins and address encode/decode") {
    for (v <- Seq(BigInt(0), BigInt(1), BigInt(1000000000L),
        BigInt("123456789012345678901234567890"))) {
      val c = b().storeCoins(v).build()
      assert(c.beginParse().loadCoins() == v)
    }
    for (addr <- Seq(Some("0:" + "AB" * 32), Some("-1:" + "0F" * 32), None)) {
      val c = b().storeAddress(addr).build()
      assert(c.beginParse().loadAddress() == addr)
    }
  }

  test("jetton transfer body roundtrip (TEP-74)") {
    val dest = Some("0:" + "12" * 32)
    val resp = Some("0:" + "34" * 32)
    val commentCell = b().storeUint(BigInt(0), 32)
      .storeBytes("hello jetton".getBytes("UTF-8")).build()
    val body = b()
      .storeUint(BigInt(0x0f8a7ea5L), 32)
      .storeUint(BigInt(42), 64)
      .storeCoins(BigInt("5000000000"))
      .storeAddress(dest)
      .storeAddress(resp)
      .storeBit(false) // no custom payload
      .storeCoins(BigInt(1))
      .storeBit(true) // forward payload in ref
      .storeRef(commentCell)
      .build()
    val decoded = TlbDecoders.jettonTransfer(Boc.serializeBase64(body))
    assert(decoded.queryId == BigInt(42))
    assert(decoded.amount == BigInt("5000000000"))
    assert(decoded.destination == dest)
    assert(decoded.responseDestination == resp)
    assert(decoded.forwardTonAmount == BigInt(1))
    assert(decoded.comment.contains("hello jetton"))
  }

  test("snake comment across ref chain") {
    val tail = b().storeBytes(" world".getBytes("UTF-8")).build()
    val body = b().storeUint(BigInt(0), 32)
      .storeBytes("hello".getBytes("UTF-8")).storeRef(tail).build()
    assert(TlbDecoders.comment(Boc.serializeBase64(body)).contains("hello world"))
  }

  test("nft transfer body roundtrip (TEP-62)") {
    val newOwner = Some("0:" + "AA" * 32)
    val body = b().storeUint(BigInt(0x5fcc3d14L), 32)
      .storeUint(BigInt(7), 64)
      .storeAddress(newOwner).storeAddress(None)
      .storeBit(false).storeCoins(BigInt(50)).build()
    val d = TlbDecoders.nftTransfer(Boc.serializeBase64(body))
    assert(d.newOwner == newOwner && d.forwardAmount == BigInt(50))
  }

  test("decode UDFs are null-safe in SQL") {
    TlbDecoders.register(spark)
    val row = spark.sql(
      "SELECT tlb_comment('not-a-boc') AS bad, tlb_comment(NULL) AS nul")
      .collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }
}
