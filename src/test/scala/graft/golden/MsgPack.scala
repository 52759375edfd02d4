package graft.golden

import java.nio.charset.StandardCharsets

/** Minimal MessagePack decoder — clean-room implementation of the public
  * msgpack spec (https://github.com/msgpack/msgpack/blob/master/spec.md),
  * covering the format families the reference's trace dumps use
  * (tests/utils/trace_deserializer.py packs plain dicts of
  * nil/bool/int/float/str/bin/array/map). Test-scope only: feeds
  * GoldenCorpusSpec with the reference's real lz4 trace fixtures.
  *
  * Decoded mapping: nil→null, bool→java.lang.Boolean, ints→java.lang.Long
  * (uint64 overflowing Long → BigInt), float→java.lang.Double, str→String,
  * bin→Array[Byte], array→Vector[Any], map→Map[String,Any] (non-string
  * keys stringified — the dumps only use string keys).
  */
object MsgPack {

  final class Reader(buf: Array[Byte]) {
    private var pos = 0

    private def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    private def u16(): Int = (u8() << 8) | u8()
    private def u32(): Long = ((u16().toLong << 16) | u16().toLong) & 0xffffffffL
    private def i64(): Long = (u32() << 32) | u32()

    private def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    private def str(n: Int): String = new String(bytes(n), StandardCharsets.UTF_8)

    private def arr(n: Int): Vector[Any] = Vector.fill(n)(read())
    private def map(n: Int): Map[String, Any] = {
      val b = Map.newBuilder[String, Any]
      var i = 0
      while (i < n) { val k = read(); val v = read(); b += (String.valueOf(k) -> v); i += 1 }
      b.result()
    }

    def read(): Any = {
      val t = u8()
      t match {
        case b if b <= 0x7f => b.toLong // positive fixint
        case b if b >= 0xe0 => (b - 256).toLong // negative fixint
        case b if (b & 0xf0) == 0x80 => map(b & 0x0f) // fixmap
        case b if (b & 0xf0) == 0x90 => arr(b & 0x0f) // fixarray
        case b if (b & 0xe0) == 0xa0 => str(b & 0x1f) // fixstr
        case 0xc0 => null
        case 0xc2 => java.lang.Boolean.FALSE
        case 0xc3 => java.lang.Boolean.TRUE
        case 0xc4 => bytes(u8()) // bin8
        case 0xc5 => bytes(u16()) // bin16
        case 0xc6 => bytes(u32().toInt) // bin32
        case 0xca => // float32
          java.lang.Float.intBitsToFloat(u32().toInt).toDouble
        case 0xcb => java.lang.Double.longBitsToDouble(i64()) // float64
        case 0xcc => u8().toLong // uint8
        case 0xcd => u16().toLong // uint16
        case 0xce => u32() // uint32
        case 0xcf => // uint64 — may overflow Long
          val v = i64()
          if (v >= 0) v else BigInt(java.lang.Long.toUnsignedString(v))
        case 0xd0 => u8().toByte.toLong // int8
        case 0xd1 => u16().toShort.toLong // int16
        case 0xd2 => u32().toInt.toLong // int32
        case 0xd3 => i64() // int64
        case 0xd9 => str(u8()) // str8
        case 0xda => str(u16()) // str16
        case 0xdb => str(u32().toInt) // str32
        case 0xdc => arr(u16()) // array16
        case 0xdd => arr(u32().toInt) // array32
        case 0xde => map(u16()) // map16
        case 0xdf => map(u32().toInt) // map32
        case other =>
          // ext types (0xc7-0xc9, 0xd4-0xd8) don't appear in the dumps
          throw new IllegalArgumentException(
            f"unsupported msgpack type 0x$other%02x at ${pos - 1}")
      }
    }
  }

  def unpack(data: Array[Byte]): Any = new Reader(data).read()

  /** lz4-framed msgpack file → decoded value (the reference dump format,
    * trace_deserializer.py:load_trace_from_file). Uses the clean-room
    * frame decoder in [[Lz4]] — the dumps use linked blocks. */
  def unpackLz4File(path: java.io.File): Any = {
    val raw = java.nio.file.Files.readAllBytes(path.toPath)
    unpack(Lz4.decompressFrame(raw))
  }
}
