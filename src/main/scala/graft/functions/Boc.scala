package graft.functions

import java.util.Base64

/** Minimal BOC (bag-of-cells) reader/writer + cell slices — the engine's
  * foundation for the TL-B body-decode family (F5, SURVEY §2.8; reference
  * parses bodies in C++ tondb-scanner/src/tlb/, Python
  * indexer/indexer/events/blocks/messages, Go ton-index-go/index/parse).
  * Implemented from the public TON serialization spec (tblkch.pdf /
  * crypto/tl/boc.tlb): serialized_boc#b5ee9c72, cell descriptors d1/d2,
  * completion-tag bit padding, MsgAddress addr_std$10, VarUInteger coins.
  *
  * The writer exists for fixture construction in tests (round-trip
  * verification without external vectors).
  */
object Boc {

  final case class Cell(data: Array[Byte], bitLen: Int, refs: Vector[Cell]) {
    def beginParse(): Slice = new Slice(this)
  }

  object Cell {
    val empty: Cell = Cell(Array.empty, 0, Vector.empty)
  }

  /** Bit-level reader over one cell. */
  final class Slice(cell: Cell) {
    private var bitPos = 0
    private var refPos = 0

    def remainingBits: Int = cell.bitLen - bitPos
    def remainingRefs: Int = cell.refs.length - refPos

    def loadBit(): Boolean = {
      require(bitPos < cell.bitLen, "slice underflow")
      val b = (cell.data(bitPos >> 3) >> (7 - (bitPos & 7)) & 1) == 1
      bitPos += 1
      b
    }

    def loadUint(bits: Int): BigInt = {
      var acc = BigInt(0)
      var i = 0
      while (i < bits) { acc = (acc << 1) | (if (loadBit()) 1 else 0); i += 1 }
      acc
    }

    def loadInt(bits: Int): BigInt = {
      val u = loadUint(bits)
      if (u.testBit(bits - 1)) u - (BigInt(1) << bits) else u
    }

    def loadBytes(n: Int): Array[Byte] =
      (0 until n).map(_ => loadUint(8).toByte).toArray

    def loadRef(): Cell = {
      require(refPos < cell.refs.length, "ref underflow")
      val r = cell.refs(refPos); refPos += 1; r
    }

    /** VarUInteger 16 — TON coin amounts (len:#<4 then len*8 bits). */
    def loadCoins(): BigInt = {
      val len = loadUint(4).toInt
      if (len == 0) BigInt(0) else loadUint(len * 8)
    }

    /** anycast_info$_ depth:(#<= 30) rewrite_pfx:(bits depth) — read and
      * discard, the way pytoniq's load_address keeps the base wc:hash
      * (the reference parses such pegout addresses fine). */
    private def skipAnycast(): Unit =
      if (loadBit()) {
        val depth = loadUint(5).toInt
        loadUint(depth)
      }

    /** MsgAddress: addr_none$00 → None; addr_std$10 (anycast:nothing
      * wc:int8 address:bits256) → Some("wc:HEX64"). */
    def loadAddress(): Option[String] = {
      val tag = loadUint(2).toInt
      tag match {
        case 0 => None
        case 2 =>
          skipAnycast()
          val wc = loadInt(8).toInt
          val addr = loadBytes(32)
          Some(s"$wc:${addr.map(b => f"${b & 0xff}%02X").mkString}")
        case 3 =>
          // addr_var$11 anycast:(Maybe Anycast) addr_len:(## 9)
          // workchain_id:int32 address:(bits addr_len) — tgBTC pegout
          // logs use it for non-basechain workchains
          skipAnycast()
          val len = loadUint(9).toInt
          val wc = loadInt(32).toInt
          require(len % 8 == 0, s"non-byte addr_var length $len")
          val addr = loadBytes(len / 8)
          Some(s"$wc:${addr.map(b => f"${b & 0xff}%02X").mkString}")
        case t => throw new IllegalArgumentException(s"unsupported addr tag $t")
      }
    }

    /** MsgAddress that also accepts addr_extern$01, rendered as
      * "len;hex" exactly like the reference's cocoon serialization of
      * ExternalAddress (blocks/cocoon.py:134-136: unpadded lowercase
      * hex). */
    def loadAddressExt(): Option[String] = {
      val tag = loadUint(2).toInt
      tag match {
        case 0 => None
        case 1 =>
          val len = loadUint(9).toInt
          val v = loadUint(len)
          Some(s"$len;${v.toString(16)}")
        case 2 =>
          skipAnycast()
          val wc = loadInt(8).toInt
          val addr = loadBytes(32)
          Some(s"$wc:${addr.map(b => f"${b & 0xff}%02X").mkString}")
        case 3 =>
          skipAnycast()
          val len = loadUint(9).toInt
          val wc = loadInt(32).toInt
          require(len % 8 == 0, s"non-byte addr_var length $len")
          val addr = loadBytes(len / 8)
          Some(s"$wc:${addr.map(b => f"${b & 0xff}%02X").mkString}")
        case t => throw new IllegalArgumentException(s"unsupported addr tag $t")
      }
    }

    /** Snake-format bytes: rest of this cell's bits, then first-ref chain. */
    def loadSnakeBytes(): Array[Byte] = {
      val buf = scala.collection.mutable.ArrayBuffer[Byte]()
      var cur: Slice = this
      var continue = true
      while (continue) {
        buf ++= cur.loadBytes(cur.remainingBits / 8)
        if (cur.remainingRefs > 0) cur = cur.loadRef().beginParse()
        else continue = false
      }
      buf.toArray
    }

    def loadSnakeString(): String = new String(loadSnakeBytes(), "UTF-8")
  }

  /** Mutable builder for fixture cells. */
  final class Builder {
    private val bits = scala.collection.mutable.ArrayBuffer[Boolean]()
    private val refs = scala.collection.mutable.ArrayBuffer[Cell]()

    def storeBit(b: Boolean): this.type = { bits += b; this }
    def storeUint(v: BigInt, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) { bits += v.testBit(i); i -= 1 }
      this
    }
    def storeInt(v: BigInt, n: Int): this.type =
      storeUint(if (v < 0) v + (BigInt(1) << n) else v, n)
    def storeBytes(bs: Array[Byte]): this.type = {
      bs.foreach(b => storeUint(BigInt(b & 0xff), 8)); this
    }
    def storeCoins(v: BigInt): this.type = {
      if (v == 0) storeUint(0, 4)
      else {
        val len = (v.bitLength + 7) / 8
        storeUint(BigInt(len), 4).storeUint(v, len * 8)
      }
    }
    def storeAddress(addr: Option[String]): this.type = addr match {
      case None => storeUint(0, 2)
      case Some(a) =>
        val Array(wc, hex) = a.split(":")
        storeUint(2, 2).storeBit(false).storeInt(BigInt(wc.toInt), 8)
          .storeBytes(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    }
    def storeRef(c: Cell): this.type = { refs += c; this }

    def build(): Cell = {
      val n = bits.length
      val data = new Array[Byte]((n + 7) / 8)
      bits.zipWithIndex.foreach { case (b, i) =>
        if (b) data(i >> 3) = (data(i >> 3) | (1 << (7 - (i & 7)))).toByte
      }
      Cell(data, n, refs.toVector)
    }
  }

  // ------------------------------------------------------------ dicts

  /** HashmapE n ^Cell — the dictionary shape of TEP-64 token content and
    * get-method data fields (public TL-B: hashmap.tlb — hme_empty$0 /
    * hme_root$1, hm_edge labels hml_short$0 / hml_long$10 / hml_same$11).
    * Returns key (n-bit unsigned) → value cell (leaf value is a ref). */
  def loadDictRefs(s: Slice, keyBits: Int): Map[BigInt, Cell] = {
    if (!s.loadBit()) Map.empty
    else {
      val out = scala.collection.mutable.LinkedHashMap[BigInt, Cell]()
      walkHashmap(s.loadRef(), keyBits, BigInt(0), out)
      out.toMap
    }
  }

  private def walkHashmap(c: Cell, n: Int, prefix: BigInt,
      out: scala.collection.mutable.Map[BigInt, Cell]): Unit = {
    val s = c.beginParse()
    val (labelLen, labelVal) = readLabel(s, n)
    val key = (prefix << labelLen) | labelVal
    val rem = n - labelLen
    if (rem == 0) out(key) = s.loadRef()
    else {
      val left = s.loadRef()
      val right = s.loadRef()
      walkHashmap(left, rem - 1, key << 1, out)
      walkHashmap(right, rem - 1, (key << 1) | 1, out)
    }
  }

  /** Hashmap ROOT cell (no HashmapE maybe-bit) with INLINE leaf values —
    * the shape of `signers:^(Hashmap 8 MsgAddressInt)` in the multisig
    * init order (messages/multisig.py:37). The reader receives the leaf
    * slice positioned after the label. */
  def dictInline[T](root: Cell, keyBits: Int)(read: Slice => T): Map[BigInt, T] = {
    val out = scala.collection.mutable.LinkedHashMap[BigInt, T]()
    def walk(c: Cell, n: Int, prefix: BigInt): Unit = {
      val s = c.beginParse()
      val (labelLen, labelVal) = readLabel(s, n)
      val key = (prefix << labelLen) | labelVal
      val rem = n - labelLen
      if (rem == 0) out(key) = read(s)
      else {
        walk(s.loadRef(), rem - 1, key << 1)
        walk(s.loadRef(), rem - 1, (key << 1) | 1)
      }
    }
    walk(root, keyBits, BigInt(0))
    out.toMap
  }

  /** Keys of a Hashmap ROOT cell (no HashmapE maybe-bit), values ignored —
    * the shape of contract method dictionaries, whose leaf values are
    * inline continuations rather than refs. */
  def dictKeys(root: Cell, keyBits: Int): Seq[BigInt] = {
    val out = scala.collection.mutable.ArrayBuffer[BigInt]()
    def walk(c: Cell, n: Int, prefix: BigInt): Unit = {
      val s = c.beginParse()
      val (labelLen, labelVal) = readLabel(s, n)
      val key = (prefix << labelLen) | labelVal
      val rem = n - labelLen
      if (rem == 0) out += key
      else {
        walk(s.loadRef(), rem - 1, key << 1)
        walk(s.loadRef(), rem - 1, (key << 1) | 1)
      }
    }
    walk(root, keyBits, BigInt(0))
    out.toSeq
  }

  /** hml_short$0 unary-len + bits; hml_long$10 len:(#<= m) + bits;
    * hml_same$11 bit + len. Returns (labelLen, labelValue). */
  private def readLabel(s: Slice, m: Int): (Int, BigInt) = {
    def lenBits = 32 - Integer.numberOfLeadingZeros(m) // ceil(log2(m+1))
    if (!s.loadBit()) { // hml_short
      var len = 0
      while (s.loadBit()) len += 1
      (len, s.loadUint(len))
    } else if (!s.loadBit()) { // hml_long
      val len = s.loadUint(lenBits).toInt
      (len, s.loadUint(len))
    } else { // hml_same
      val bit = s.loadBit()
      val len = s.loadUint(lenBits).toInt
      (len, if (bit) (BigInt(1) << len) - 1 else BigInt(0))
    }
  }

  /** Build a HashmapE n ^Cell from entries (fixture writer; hml_long
    * labels only — always a valid encoding). */
  def buildDictRefs(entries: Map[BigInt, Cell], keyBits: Int): Cell = {
    val b = new Builder
    if (entries.isEmpty) b.storeBit(false).build()
    else b.storeBit(true).storeRef(dictNode(entries.toSeq, keyBits, keyBits)).build()
  }

  private def dictNode(entries: Seq[(BigInt, Cell)], n: Int,
      totalBits: Int): Cell = {
    // keys here are the low `n` bits still undecided
    val lenBits = 32 - Integer.numberOfLeadingZeros(n)
    var lcp = 0
    def bitOf(k: BigInt, i: Int): Boolean = k.testBit(n - 1 - i)
    while (lcp < n && entries.map(e => bitOf(e._1, lcp)).distinct.size == 1)
      lcp += 1
    val b = new Builder
    b.storeBit(true).storeBit(false).storeUint(BigInt(lcp), lenBits) // hml_long
    (0 until lcp).foreach(i => b.storeBit(bitOf(entries.head._1, i)))
    if (lcp == n) b.storeRef(entries.head._2)
    else {
      val mask = (BigInt(1) << (n - lcp - 1)) - 1
      def tail(k: BigInt): BigInt = k & mask
      val (ones, zeros) = entries.partition(e => bitOf(e._1, lcp))
      b.storeRef(dictNode(zeros.map { case (k, v) => (tail(k), v) },
        n - lcp - 1, totalBits))
      b.storeRef(dictNode(ones.map { case (k, v) => (tail(k), v) },
        n - lcp - 1, totalBits))
    }
    b.build()
  }

  // ------------------------------------------------------------ BOC codec

  private val Magic = 0xb5ee9c72

  /** Parse a base64 BOC; returns the first root cell. */
  def parseBase64(b64: String): Cell =
    parse(Base64.getDecoder.decode(b64.replace('-', '+').replace('_', '/')))

  def parse(bytes: Array[Byte]): Cell = {
    var p = 0
    def u8(): Int = { val v = bytes(p) & 0xff; p += 1; v }
    def uN(n: Int): Int = { var acc = 0; (0 until n).foreach(_ => acc = (acc << 8) | u8()); acc }
    require(uN(4) == Magic, "bad BOC magic")
    val flags = u8()
    val sizeBytes = flags & 7
    val hasIdx = (flags & 0x80) != 0
    val hasCrc = (flags & 0x40) != 0
    val offBytes = u8()
    val cellCount = uN(sizeBytes)
    val rootCount = uN(sizeBytes)
    uN(sizeBytes) // absent
    uN(offBytes) // tot_cells_size
    val rootIdx = (0 until rootCount).map(_ => uN(sizeBytes))
    if (hasIdx) p += cellCount * offBytes
    // first pass: read raw cells
    val raw = (0 until cellCount).map { _ =>
      val d1 = u8(); val d2 = u8()
      val refCount = d1 & 7
      require((d1 & 8) == 0, "exotic cells unsupported")
      val dataBytes = (d2 + 1) / 2
      val fullBytes = d2 / 2
      val data = bytes.slice(p, p + dataBytes); p += dataBytes
      val bitLen =
        if (d2 % 2 == 0) fullBytes * 8
        else { // completion tag: last 1-bit marks the end
          val last = data(dataBytes - 1) & 0xff
          dataBytes * 8 - (Integer.numberOfTrailingZeros(last) + 1)
        }
      val refs = (0 until refCount).map(_ => uN(sizeBytes)).toVector
      (data, bitLen, refs)
    }
    // second pass: link (refs always point forward in standard BOCs)
    val cells = new Array[Cell](cellCount)
    for (i <- (cellCount - 1) to 0 by -1) {
      val (d, bl, rs) = raw(i)
      cells(i) = Cell(d, bl, rs.map(cells(_)))
    }
    cells(rootIdx.head)
  }

  /** Serialize one root. `withCrc` mirrors the reference's per-site
    * to_boc(hash_crc32=...) choice: payload BOCs (jetton/nft/swap
    * forward & custom payloads) carry the CRC, while vesting message
    * and multisig order BOCs use the library default without it
    * (messages/jettons.py:46 vs blocks/vesting.py:96,
    * blocks/multisig.py:136). */
  def serialize(root: Cell, withCrc: Boolean = true): Array[Byte] = {
    // topological order, root first
    val order = scala.collection.mutable.LinkedHashMap[Cell, Int]()
    def visit(c: Cell): Unit =
      if (!order.contains(c)) { order(c) = order.size; c.refs.foreach(visit) }
    visit(root)
    val cells = order.keys.toVector
    val sizeBytes = 1 max ((32 - Integer.numberOfLeadingZeros(cells.size)) + 7) / 8
    val bodies = cells.map { c =>
      val dataBytes = (c.bitLen + 7) / 8
      val d1 = c.refs.length
      val d2 = (c.bitLen / 8) + dataBytes // floor + ceil
      val data = c.data.take(dataBytes).clone()
      if (c.bitLen % 8 != 0) { // completion tag
        data(dataBytes - 1) =
          (data(dataBytes - 1) | (1 << (7 - (c.bitLen % 8)))).toByte
      }
      Array(d1.toByte, d2.toByte) ++ data ++
        c.refs.flatMap(r => intToBytes(order(r), sizeBytes))
    }
    val tot = bodies.map(_.length).sum
    val offBytes = 1 max ((32 - Integer.numberOfLeadingZeros(tot)) + 7) / 8
    val flags = if (withCrc) 0x40 | sizeBytes else sizeBytes
    val header = intToBytes(Magic, 4) ++
      Array(flags.toByte, offBytes.toByte) ++
      intToBytes(cells.size, sizeBytes) ++ intToBytes(1, sizeBytes) ++
      intToBytes(0, sizeBytes) ++ intToBytes(tot, offBytes) ++
      intToBytes(0, sizeBytes) // root index
    val payload = header ++ bodies.flatten
    if (!withCrc) payload
    else {
      val crc = new java.util.zip.CRC32C()
      crc.update(payload)
      val c = crc.getValue
      payload ++ Array[Byte](
        (c & 0xff).toByte, ((c >> 8) & 0xff).toByte,
        ((c >> 16) & 0xff).toByte, ((c >> 24) & 0xff).toByte)
    }
  }

  def serializeBase64(root: Cell, withCrc: Boolean = true): String =
    Base64.getEncoder.encodeToString(serialize(root, withCrc))

  /** Cell depth: 0 for leaves, 1 + max child depth otherwise (public TON
    * cell spec, tvm.pdf 3.1.4). */
  def cellDepth(c: Cell): Int =
    if (c.refs.isEmpty) 0 else 1 + c.refs.map(cellDepth).max

  /** Standard (representation) hash of an ordinary cell: sha256 over
    * d1 ∥ d2 ∥ data-with-completion-tag ∥ refs' depths (u16 BE) ∥ refs'
    * hashes (public TON cell spec, tvm.pdf 3.1.5). The reference keys its
    * ghost wallet-payload messages on this hash
    * (messages/externals.py:102). */
  def cellHash(c: Cell): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val dataBytes = (c.bitLen + 7) / 8
    val d1 = c.refs.length
    val d2 = (c.bitLen / 8) + dataBytes
    val data = c.data.take(dataBytes).clone()
    if (c.bitLen % 8 != 0)
      data(dataBytes - 1) =
        (data(dataBytes - 1) | (1 << (7 - (c.bitLen % 8)))).toByte
    md.update(d1.toByte); md.update(d2.toByte); md.update(data)
    c.refs.foreach { r =>
      val d = cellDepth(r)
      md.update(((d >> 8) & 0xff).toByte); md.update((d & 0xff).toByte)
    }
    c.refs.foreach(r => md.update(cellHash(r)))
    md.digest()
  }

  def cellHashBase64(c: Cell): String =
    Base64.getEncoder.encodeToString(cellHash(c))

  private def intToBytes(v: Int, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
}
