package graft.golden

/** Minimal LZ4 frame decoder — clean-room implementation of the public
  * LZ4 frame + block specs (github.com/lz4/lz4/blob/dev/doc/
  * lz4_Frame_format.md and lz4_Block_format.md). Needed because the
  * reference's trace dumps (python-lz4 default `block_linked=True`) use
  * DEPENDENT blocks, which lz4-java's LZ4FrameInputStream rejects;
  * decompressing every block into one contiguous output buffer makes
  * cross-block match references work naturally. Test-scope only.
  */
object Lz4 {

  /** Decompress a full LZ4 frame (possibly with linked blocks). */
  def decompressFrame(src: Array[Byte]): Array[Byte] = {
    var si = 0
    def u8(): Int = { val v = src(si) & 0xff; si += 1; v }
    def u32le(): Long =
      u8().toLong | (u8().toLong << 8) | (u8().toLong << 16) | (u8().toLong << 24)

    val magic = u32le()
    require(magic == 0x184d2204L, f"not an LZ4 frame (magic 0x$magic%08x)")
    val flg = u8()
    val _bd = u8()
    val hasContentSize = (flg & 0x08) != 0
    val hasBlockChecksum = (flg & 0x10) != 0
    val hasContentChecksum = (flg & 0x04) != 0
    val hasDictId = (flg & 0x01) != 0
    var contentSize = -1L
    if (hasContentSize) {
      contentSize = 0L
      var shift = 0
      var i = 0
      while (i < 8) { contentSize |= u8().toLong << shift; shift += 8; i += 1 }
    }
    if (hasDictId) si += 4
    si += 1 // header checksum byte (not verified — test fixture reads)

    var out = new Array[Byte](
      if (contentSize > 0 && contentSize < Int.MaxValue) contentSize.toInt
      else 1 << 20)
    var outLen = 0
    def ensure(extra: Int): Unit =
      if (outLen + extra > out.length) {
        var n = out.length * 2
        while (outLen + extra > n) n *= 2
        out = java.util.Arrays.copyOf(out, n)
      }

    var done = false
    while (!done) {
      val header = u32le()
      if (header == 0L) done = true
      else {
        val uncompressed = (header & 0x80000000L) != 0
        val len = (header & 0x7fffffffL).toInt
        if (uncompressed) {
          ensure(len)
          System.arraycopy(src, si, out, outLen, len)
          outLen += len
          si += len
        } else {
          // worst-case expansion bound: block max size is <= 4 MiB; grow
          // lazily inside the sequence loop instead of preallocating
          outLen = decompressBlock(src, si, len, ensure, () => out, outLen)
          si += len
        }
        if (hasBlockChecksum) si += 4
      }
    }
    if (hasContentChecksum) si += 4
    java.util.Arrays.copyOf(out, outLen)
  }

  /** One LZ4 block (sequences of literals + matches) appended at outLen;
    * matches may reach back past the block start (linked blocks). */
  private def decompressBlock(src: Array[Byte], start: Int, len: Int,
      ensure: Int => Unit, outRef: () => Array[Byte], outStart: Int): Int = {
    var si = start
    val end = start + len
    var ol = outStart
    while (si < end) {
      val token = src(si) & 0xff; si += 1
      var litLen = token >>> 4
      if (litLen == 15) {
        var b = 0xff
        while (b == 0xff) { b = src(si) & 0xff; si += 1; litLen += b }
      }
      ensure(litLen)
      val out1 = outRef()
      System.arraycopy(src, si, out1, ol, litLen)
      si += litLen; ol += litLen
      if (si < end) {
        val offset = (src(si) & 0xff) | ((src(si + 1) & 0xff) << 8); si += 2
        require(offset > 0, "corrupt LZ4 block: zero match offset")
        var matchLen = (token & 0x0f) + 4
        if ((token & 0x0f) == 15) {
          var b = 0xff
          while (b == 0xff) { b = src(si) & 0xff; si += 1; matchLen += b }
        }
        ensure(matchLen)
        val out2 = outRef()
        var mi = ol - offset
        var i = 0
        while (i < matchLen) { out2(ol) = out2(mi); ol += 1; mi += 1; i += 1 }
      }
    }
    ol
  }
}
