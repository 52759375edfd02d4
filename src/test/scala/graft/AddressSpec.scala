package graft

import graft.functions.Address

import scala.util.Random

class AddressSpec extends SparkSpec {

  private def randomHashes(n: Int): Seq[Array[Byte]] = {
    val rnd = new Random(42)
    Seq.fill(n) { val a = new Array[Byte](32); rnd.nextBytes(a); a }
  }

  test("crc16/xmodem known vectors") {
    // public check values for CRC-16/XMODEM
    assert(Address.crc16("123456789".getBytes("ASCII")) == 0x31c3)
    assert(Address.crc16(Array.empty[Byte]) == 0x0000)
  }

  test("raw -> friendly -> raw roundtrip") {
    for (h <- randomHashes(50); wc <- Seq(0, -1)) {
      val raw = s"$wc:${h.map(b => f"${b & 0xff}%02X").mkString}"
      val friendly = Address.toFriendly(raw).get
      assert(friendly.length == 48)
      assert(Address.normalize(friendly).contains(raw), s"roundtrip failed for $raw")
    }
  }

  test("non-bounceable and testnet tags roundtrip too") {
    val raw = "0:" + "CD" * 32
    for (b <- Seq(true, false)) {
      val f = Address.toFriendly(raw, bounceable = b).get
      assert(Address.normalize(f).contains(raw))
    }
  }

  test("friendly form corruption is rejected (checksum)") {
    val raw = "0:" + "AB" * 32
    val friendly = Address.toFriendly(raw).get
    val corrupted = (if (friendly.head == 'A') 'B' else 'A') + friendly.tail
    assert(Address.normalize(corrupted).isEmpty)
  }

  test("malformed inputs are rejected, not thrown") {
    for (bad <- Seq("", "0:1234", "xyz", "0:" + "ZZ" * 32, "2:not-hex", "a" * 48))
      assert(Address.normalize(bad).isEmpty || Address.parse(bad).isDefined)
  }

  test("hash normalization: hex and base64url converge") {
    for (h <- randomHashes(50)) {
      val hex = h.map(b => f"${b & 0xff}%02x").mkString
      val b64 = java.util.Base64.getEncoder.encodeToString(h)
      val b64url = java.util.Base64.getUrlEncoder.encodeToString(h)
      assert(Address.normalizeHash(hex).contains(b64))
      assert(Address.normalizeHash(b64url).contains(b64))
      assert(Address.normalizeHash(b64).contains(b64))
    }
  }

  test("opcode rendering matches the 0x%08x contract") {
    assert(Address.opcodeHex(0) == "0x00000000")
    assert(Address.opcodeHex(0x0f8a7ea5) == "0x0f8a7ea5")
    assert(Address.opcodeHex(-1) == "0xffffffff") // bounce opcode
    assert(Address.opcodeHex(0x2167da4b) == "0x2167da4b")
  }

  test("UDF registration round-trips through SQL") {
    Address.register(spark)
    val row = spark.sql(
      s"SELECT ton_addr_normalize('${"0:" + "ab" * 32}') AS a, " +
        "ton_opcode_hex(-1) AS o").collect().head
    assert(row.getString(0) == "0:" + "AB" * 32)
    assert(row.getString(1) == "0xffffffff")
  }
}
