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

  test("anycast addr_std parses to the base wc:hash (pytoniq tolerance); " +
      "addr_extern renders len;hex via loadAddressExt") {
    // addr_std$10 anycast$1 depth=5:(#<=30 → 5 bits) pfx(5) wc=15 hash
    val any = b().storeUint(BigInt(2), 2).storeBit(true)
      .storeUint(BigInt(5), 5).storeUint(BigInt(0x15), 5)
      .storeInt(BigInt(15), 8)
      .storeBytes(Array.fill[Byte](32)(0x8A.toByte)).build()
    assert(any.beginParse().loadAddress() == Some("15:" + "8A" * 32))
    // addr_extern$01 len=16 value=0xBEEF
    val ext = b().storeUint(BigInt(1), 2).storeUint(BigInt(16), 9)
      .storeUint(BigInt(0xBEEF), 16).build()
    assert(ext.beginParse().loadAddressExt() == Some("16;beef"))
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

  // ------------------------------------------- HashmapE + TEP-64 + wallets

  test("HashmapE dict round-trips through build + load") {
    import graft.functions.Boc
    def leaf(txt: String): Boc.Cell =
      new Boc.Builder().storeBytes(txt.getBytes("UTF-8")).build()
    val entries = Map(
      BigInt(5) -> leaf("five"),
      BigInt(200) -> leaf("two hundred"),
      BigInt(201) -> leaf("adjacent"))
    val dictCell = Boc.buildDictRefs(entries, 16)
    val got = Boc.loadDictRefs(dictCell.beginParse(), 16)
    assert(got.keySet == entries.keySet)
    val v = new String(got(BigInt(200)).beginParse()
      .loadBytes("two hundred".length), "UTF-8")
    assert(v == "two hundred")
  }

  test("TEP-64 onchain content dict decodes known attributes") {
    import graft.functions.{Boc, TlbDecoders}
    def sha(k: String): BigInt = BigInt(1,
      java.security.MessageDigest.getInstance("SHA-256").digest(k.getBytes("UTF-8")))
    def snakeVal(txt: String): Boc.Cell = new Boc.Builder()
      .storeUint(BigInt(0), 8).storeBytes(txt.getBytes("UTF-8")).build()
    val dict = Boc.buildDictRefs(Map(
      sha("name") -> snakeVal("Test Jetton"),
      sha("symbol") -> snakeVal("TJ"),
      sha("decimals") -> snakeVal("9")), 256)
    // content cell: 0x00 prefix then the dict bits
    val b = new Boc.Builder().storeUint(BigInt(0), 8)
    val ds = dict.beginParse()
    val hasRoot = ds.loadBit()
    b.storeBit(hasRoot)
    if (hasRoot) b.storeRef(ds.loadRef())
    val content = TlbDecoders.tep64Content(Boc.serializeBase64(b.build()))
    assert(content.kind == "onchain")
    assert(content.attributes == Map(
      "name" -> "Test Jetton", "symbol" -> "TJ", "decimals" -> "9"))
  }

  test("TEP-64 onchain CHUNKED values concatenate dict chunks in key order") {
    import graft.functions.{Boc, TlbDecoders}
    def sha(k: String): BigInt = BigInt(1,
      java.security.MessageDigest.getInstance("SHA-256").digest(k.getBytes("UTF-8")))
    def chunkCell(txt: String): Boc.Cell = new Boc.Builder()
      .storeBytes(txt.getBytes("UTF-8")).build()
    // chunked value: tag 0x01 + HashmapE 32 of ^Cell chunks
    val chunkDict = Boc.buildDictRefs(Map(
      BigInt(0) -> chunkCell("long descri"),
      BigInt(1) -> chunkCell("ption split"),
      BigInt(2) -> chunkCell(" in chunks")), 32)
    val chunkedVal = {
      val b = new Boc.Builder().storeUint(BigInt(1), 8)
      val ds = chunkDict.beginParse()
      val hasRoot = ds.loadBit()
      b.storeBit(hasRoot)
      if (hasRoot) b.storeRef(ds.loadRef())
      b.build()
    }
    def snakeVal(txt: String): Boc.Cell = new Boc.Builder()
      .storeUint(BigInt(0), 8).storeBytes(txt.getBytes("UTF-8")).build()
    val dict = Boc.buildDictRefs(Map(
      sha("name") -> snakeVal("Chunky"),
      sha("description") -> chunkedVal), 256)
    val b = new Boc.Builder().storeUint(BigInt(0), 8)
    val ds = dict.beginParse()
    val hasRoot = ds.loadBit()
    b.storeBit(hasRoot)
    if (hasRoot) b.storeRef(ds.loadRef())
    val content = TlbDecoders.tep64Content(Boc.serializeBase64(b.build()))
    assert(content.kind == "onchain")
    assert(content.attributes == Map(
      "name" -> "Chunky",
      "description" -> "long description split in chunks"))
  }

  test("TEP-64 offchain content is a snake uri") {
    import graft.functions.{Boc, TlbDecoders}
    val cell = new Boc.Builder().storeUint(BigInt(1), 8)
      .storeBytes("https://example.com/meta.json".getBytes("UTF-8")).build()
    val c = TlbDecoders.tep64Content(Boc.serializeBase64(cell))
    assert(c.kind == "offchain")
    assert(c.uri.contains("https://example.com/meta.json"))
  }

  test("wallet v3 and v5r1 externals unroll to ghost messages") {
    import graft.functions.Boc
    import graft.classifier.ExternalUnroll
    val dest = Some("0:" + "42" * 32)
    def intMsg(value: Long): Boc.Cell = new Boc.Builder()
      .storeBit(false) // int_msg_info$0
      .storeBit(true).storeBit(false).storeBit(false) // ihr/bounce/bounced
      .storeAddress(None).storeAddress(dest)
      .storeCoins(BigInt(value)).storeBit(false) // no extra currencies
      .storeCoins(BigInt(0)).storeCoins(BigInt(0)) // ihr_fee, fwd_fee
      .storeUint(BigInt(0), 64).storeUint(BigInt(0), 32) // created_lt/at
      .storeBit(false).storeBit(false) // no init, body inline
      .storeUint(BigInt(0xabcdef12L), 32) // opcode
      .build()
    // v3: sig(512) subwallet(32) valid(32) seqno(32) + message refs
    val v3 = new Boc.Builder().storeUint(BigInt(0), 512)
      .storeUint(BigInt(698983191L), 32).storeUint(BigInt(0), 32)
      .storeUint(BigInt(7), 32)
      .storeUint(BigInt(3), 8) // send_mode byte (ignored by ref parser)
      .storeRef(intMsg(1000)).build()
    val got3 = ExternalUnroll.ghostMessages(Boc.serializeBase64(v3))
    assert(got3.exists(_._1 == "v3"))
    assert(got3.get._2.map(_.value) == Seq(1000L))
    assert(got3.get._2.head.destination == dest)
    assert(got3.get._2.head.opcode.contains(0xabcdef12L))
    // v5r1: op(32) wallet_id(32) valid(32) seqno(32) + maybe-ref list
    val node2 = new Boc.Builder()
      .storeRef(Boc.Cell.empty).storeRef(intMsg(2000)).build()
    val node1 = new Boc.Builder()
      .storeUint(BigInt(0), 1) // non-empty bits so the walker recurses
      .storeRef(node2).storeRef(intMsg(1500)).build()
    val v5 = new Boc.Builder().storeUint(BigInt(0x7369676eL), 32)
      .storeUint(BigInt(0), 32).storeUint(BigInt(0), 32).storeUint(BigInt(9), 32)
      .storeBit(true).storeRef(node1).build()
    val got5 = ExternalUnroll.ghostMessages(Boc.serializeBase64(v5))
    assert(got5.exists(_._1 == "v5r1"))
    assert(got5.get._2.map(_.value) == Seq(1500L, 2000L))
  }
}
