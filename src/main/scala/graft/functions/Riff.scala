package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/AVI (MJPEG) container codec — JDK-only "video": an AVI
  * whose frames are real JPEGs. The writer produces a spec-shaped file
  * (RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh,strf}} →
  * LIST(movi){00dc…} → idx1); the reader is a GENERIC RIFF chunk
  * walker — it does not assume the writer's layout beyond the AVI
  * chunk ids, and frame EXTRACTION goes through the idx1 index so
  * sampling decodes only the requested frames (the scale property: a
  * stride-30 sample of a long video reads 1/30th of the payload
  * through the codec, not all of it).
  */
object Riff {

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** Write an MJPEG AVI from per-frame JPEG payloads. */
  def writeAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 25): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bos.write(fourcc(id)); bos.write(le32(body.length)); bos.write(body)
      if (body.length % 2 == 1) bos.write(0) // RIFF pads to even
      bos.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(kind) ++ body)

    val avih = chunk("avih", le32(1000000 / fps) ++ le32(0) ++ le32(0) ++
      le32(0x10) ++ le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ Array.fill(16)(0.toByte))
    val strh = chunk("strh", fourcc("vids") ++ fourcc("MJPG") ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
      le32(frames.size) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32((height << 16) | width))
    val strf = chunk("strf", le32(40) ++ le32(width) ++ le32(height) ++
      le32((24 << 16) | 1) ++ fourcc("MJPG") ++ le32(width * height * 3) ++
      Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    val moviBody = new ByteArrayOutputStream()
    moviBody.write(fourcc("movi"))
    // idx1 offsets are relative to the start of the movi LIST body
    // (the 'movi' fourcc position), per the AVI 1.0 convention
    val offsets = frames.map { f =>
      val off = moviBody.size() - 4
      moviBody.write(chunk("00dc", f)); off
    }
    val movi = chunk("LIST", moviBody.toByteArray)
    val idx = chunk("idx1", frames.zip(offsets).flatMap { case (f, off) =>
      fourcc("00dc") ++ le32(0x10) ++ le32(off + 4) ++ le32(f.length)
    }.toArray)

    val riffBody = fourcc("AVI ") ++ hdrl ++ movi ++ idx
    fourcc("RIFF") ++ le32(riffBody.length) ++ riffBody
  }

  /** One frame's location inside the container. */
  final case class FrameRef(index: Int, offset: Int, size: Int)

  private def u32(b: Array[Byte], p: Int): Int =
    ByteBuffer.wrap(b, p, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  private def id(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** Generic RIFF walk: top-level (and one LIST level deep) chunks as
    * (fourcc, bodyStart, bodySize). */
  def chunks(avi: Array[Byte]): Seq[(String, Int, Int)] = {
    require(id(avi, 0) == "RIFF", "not a RIFF file")
    val out = Seq.newBuilder[(String, Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val cid = id(avi, p); val sz = u32(avi, p + 4)
        out += ((cid, p + 8, sz))
        if (cid == "LIST") out += ((id(avi, p + 8), p + 12, sz - 4))
        p += 8 + sz + (sz & 1)
      }
    }
    walk(12, 12 + u32(avi, 4) - 4)
    out.result()
  }

  /** Frame index via idx1 (preferred — no scan of the movi payload) or
    * a movi-body chunk walk when the index is absent. */
  def frameIndex(avi: Array[Byte]): Seq[FrameRef] = {
    val cs = chunks(avi)
    val moviStart = cs.collectFirst { case ("movi", p, _) => p - 4 }
      .getOrElse(throw new IllegalArgumentException("no movi list"))
    cs.collectFirst { case ("idx1", p, sz) => (p, sz) } match {
      case Some((p, sz)) =>
        (0 until sz / 16).map { i =>
          val e = p + i * 16
          FrameRef(i, moviStart + u32(avi, e + 8) + 8, u32(avi, e + 12))
        }
      case None =>
        val moviSz = cs.collectFirst { case ("movi", _, sz) => sz }.get
        var q = moviStart + 4
        val end = moviStart + 4 + moviSz
        val out = Seq.newBuilder[FrameRef]
        var i = 0
        while (q + 8 <= end) {
          val sz = u32(avi, q + 4)
          if (id(avi, q) == "00dc") { out += FrameRef(i, q + 8, sz); i += 1 }
          q += 8 + sz + (sz & 1)
        }
        out.result()
    }
  }

  /** Decode ONE frame (a real JPEG) by index — only its bytes touch the
    * codec. */
  def decodeFrame(avi: Array[Byte], ref: FrameRef)
      : java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(avi, ref.offset, ref.size))
    require(img != null, s"frame ${ref.index} is not decodable")
    img
  }
}
