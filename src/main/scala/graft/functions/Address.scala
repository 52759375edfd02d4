package graft.functions

import java.util.Base64

/** TON address / hash codecs — the F1-F4 scalar-function family of
  * SURVEY.md §2.8 (reference: ton-index-go/index/models/convert.go:66-150,
  * tondb-scanner/src/convert-utils.cpp). Pure Scala reimplementations from
  * the publicly documented TON address format (raw `wc:HEX64`; friendly =
  * base64url of tag ∥ workchain ∥ hash ∥ crc16-xmodem).
  *
  * Exposed both as plain functions (for classifier library code) and as
  * registered UDFs (for SQL). These run per-row in the hot path, so they
  * allocate nothing beyond the output on the happy path.
  */
object Address {

  /** CRC16/XMODEM (poly 0x1021, init 0), as used by TON friendly addresses. */
  def crc16(data: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < data.length) {
      crc ^= (data(i) & 0xff) << 8
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x1021) & 0xffff
              else (crc << 1) & 0xffff
        j += 1
      }
      i += 1
    }
    crc
  }

  private def hexToBytes(hex: String): Option[Array[Byte]] =
    if (hex.length != 64 || !hex.forall(c => Character.digit(c, 16) >= 0)) None
    else Some(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)

  private def bytesToHex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02X").mkString

  /** Parse any accepted address form to (workchain, 32-byte hash):
    * raw `wc:HEX64` (case-insensitive) or friendly base64/base64url(36). */
  def parse(s: String): Option[(Int, Array[Byte])] = {
    val t = s.trim
    val colon = t.indexOf(':')
    if (colon >= 0) {
      val wcStr = t.substring(0, colon)
      val hex = t.substring(colon + 1)
      for {
        wc <- wcStr.toIntOption
        h <- hexToBytes(hex.toUpperCase)
      } yield (wc, h)
    } else if (t.length == 48) {
      val norm = t.replace('-', '+').replace('_', '/')
      try {
        val bytes = Base64.getDecoder.decode(norm)
        if (bytes.length != 36) None
        else {
          val body = bytes.take(34)
          val crc = ((bytes(34) & 0xff) << 8) | (bytes(35) & 0xff)
          if (crc16(body) != crc) None
          else {
            val wc = bytes(1).toInt // signed byte: -1 masterchain
            Some((wc, bytes.slice(2, 34)))
          }
        }
      } catch { case _: IllegalArgumentException => None }
    } else None
  }

  /** F1: normalize any form to raw `wc:HEX64` (uppercase hex). */
  def normalize(s: String): Option[String] =
    parse(s).map { case (wc, h) => s"$wc:${bytesToHex(h)}" }

  /** F2: raw/any → user-friendly base64url form with checksum.
    * tag 0x11 = bounceable, 0x51 = non-bounceable; +0x80 testnet-only. */
  def toFriendly(s: String, bounceable: Boolean = true,
      testnet: Boolean = false): Option[String] =
    parse(s).map { case (wc, h) =>
      val tag = (if (bounceable) 0x11 else 0x51) | (if (testnet) 0x80 else 0)
      val body = Array(tag.toByte, wc.toByte) ++ h
      val crc = crc16(body)
      val full = body ++ Array((crc >> 8).toByte, (crc & 0xff).toByte)
      Base64.getUrlEncoder.withoutPadding.encodeToString(full) match {
        case x if x.length == 48 => x
        case x => x // 36 bytes always encode to 48 chars
      }
    }

  /** F3: normalize a hash given as hex(64) / base64(44) / base64url(44)
    * to canonical standard-base64(44). */
  def normalizeHash(s: String): Option[String] = {
    val t = s.trim
    val bytes: Option[Array[Byte]] =
      if (t.length == 64) hexToBytes(t.toUpperCase)
      else if (t.length == 44) {
        try Some(Base64.getDecoder.decode(t.replace('-', '+').replace('_', '/')))
        catch { case _: IllegalArgumentException => None }
      } else None
    bytes.filter(_.length == 32).map(Base64.getEncoder.encodeToString)
  }

  /** F4: opcode render — signed int32 column value → `0x%08x`. */
  def opcodeHex(op: Int): String = f"0x$op%08x"

  /** Register all codecs as SQL functions on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val u = spark.udf
    u.register("ton_addr_normalize", (s: String) =>
      Option(s).flatMap(normalize).orNull)
    u.register("ton_addr_friendly", (s: String, bounceable: Boolean) =>
      Option(s).flatMap(toFriendly(_, bounceable)).orNull)
    u.register("ton_hash_normalize", (s: String) =>
      Option(s).flatMap(normalizeHash).orNull)
    u.register("ton_opcode_hex", (op: java.lang.Integer) =>
      Option(op).map(o => opcodeHex(o.intValue)).orNull)
  }
}
