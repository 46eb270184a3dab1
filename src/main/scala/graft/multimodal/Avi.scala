package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Pure-JVM MJPEG-in-AVI container: a RIFF muxer/demuxer so the video
  * modality runs a REAL codec end-to-end like image (PNG) and audio
  * (WAV PCM) do. The JDK ships no MP4 demuxer, but it DOES ship a JPEG
  * codec — and MJPEG-in-AVI is exactly "JPEG frames in a RIFF
  * container", the classic codec-less-environment interchange format
  * (every ffmpeg/OpenCV install reads it). The demuxer walks RIFF
  * chunks (no compression logic of its own); per-frame pixel decode is
  * `javax.imageio.ImageIO`'s actual JPEG decoder.
  *
  * Fixture determinism: JPEG byte lengths are content-dependent, so
  * [[mux]] pads the container with a trailing JUNK chunk (the standard
  * RIFF padding chunk — readers skip it) up to a caller-chosen total
  * size. That gives fixture AVIs a CLOSED-FORM byte length the SQL
  * oracle can state, while the frames inside remain real JPEGs.
  */
object Avi {

  private def fourcc(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.US_ASCII)

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Mux JPEG frames into an AVI of EXACTLY `totalSize` bytes (JUNK
    * padded). Fails loudly if the frames don't fit — fixture
    * generators size `totalSize` from a worst-case per-frame cap, so a
    * violation is a bug, not a runtime condition to paper over.
    */
  def mux(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
      totalSize: Int): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val avih = new ByteArrayOutputStream()
    avih.write(le32(1000000L / fps)) // dwMicroSecPerFrame
    avih.write(le32(0)); avih.write(le32(0))
    // dwFlags = 0: no idx1 chunk is written, so AVIF_HASINDEX (0x10)
    // must NOT be claimed — a strict reader honoring the flag would
    // seek for an index that isn't there
    avih.write(le32(0))
    avih.write(le32(frames.length.toLong)) // dwTotalFrames
    avih.write(le32(0)); avih.write(le32(1)) // streams
    avih.write(le32(0))
    avih.write(le32(w.toLong)); avih.write(le32(h.toLong))
    avih.write(new Array[Byte](16)) // reserved
    val strh = new ByteArrayOutputStream()
    strh.write(fourcc("vids")); strh.write(fourcc("MJPG"))
    strh.write(le32(0)); strh.write(le16(0)); strh.write(le16(0))
    strh.write(le32(0))
    strh.write(le32(1)); strh.write(le32(fps.toLong)) // scale / rate
    strh.write(le32(0)); strh.write(le32(frames.length.toLong)) // length
    strh.write(le32(0)); strh.write(le32(-1L & 0xffffffffL)) // quality
    strh.write(le32(0))
    strh.write(le16(0)); strh.write(le16(0))
    strh.write(le16(w)); strh.write(le16(h)) // rcFrame
    val strf = new ByteArrayOutputStream() // BITMAPINFOHEADER
    strf.write(le32(40)); strf.write(le32(w.toLong)); strf.write(le32(h.toLong))
    strf.write(le16(1)); strf.write(le16(24))
    strf.write(fourcc("MJPG"))
    strf.write(le32(w.toLong * h * 3))
    strf.write(new Array[Byte](16))
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(fourcc(id)); o.write(le32(data.length.toLong)); o.write(data)
      if (data.length % 2 == 1) o.write(0) // RIFF word alignment
      o.toByteArray
    }
    def list(typ: String, bodies: Array[Byte]*): Array[Byte] = {
      val body = bodies.foldLeft(Array.emptyByteArray)(_ ++ _)
      val o = new ByteArrayOutputStream()
      o.write(fourcc("LIST")); o.write(le32(4L + body.length))
      o.write(fourcc(typ)); o.write(body)
      o.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray),
      list("strl", chunk("strh", strh.toByteArray),
        chunk("strf", strf.toByteArray)))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)): _*)
    val beforeJunk = 12 + hdrl.length + movi.length
    val junkData = totalSize - beforeJunk - 8
    require(junkData >= 0,
      s"frames overflow the fixture size: need ${beforeJunk + 8}, have $totalSize")
    val junk = chunk("JUNK", new Array[Byte](junkData))
    val out = new ByteArrayOutputStream()
    out.write(fourcc("RIFF"))
    out.write(le32(4L + hdrl.length + movi.length + junk.length))
    out.write(fourcc("AVI "))
    out.write(hdrl); out.write(movi); out.write(junk)
    val bytes = out.toByteArray
    require(bytes.length == totalSize,
      s"muxed ${bytes.length} bytes, expected $totalSize")
    bytes
  }

  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def cc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, StandardCharsets.US_ASCII)

  /** Demux: the video frame payloads ('..dc'/'..db' chunks inside the
    * movi list), in stream order. JUNK, index, and header chunks are
    * skipped by the RIFF walk — this reads any MJPEG AVI, not just
    * [[mux]]'s output.
    */
  def demux(bytes: Array[Byte]): Vector[Array[Byte]] = {
    require(bytes.length >= 12 && cc(bytes, 0) == "RIFF" &&
      cc(bytes, 8) == "AVI ", "not a RIFF AVI")
    val end = math.min(bytes.length.toLong, 8L + rdLe32(bytes, 4)).toInt
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = cc(bytes, off)
        val size = rdLe32(bytes, off + 4)
        // corrupt input guard: a negative le32 size (or one past the
        // buffer) would stall or reverse the walk — an executor task
        // spinning forever on one bad byte string. Fail loudly instead.
        require(size >= 0 && off + 8L + size <= to,
          s"corrupt AVI: chunk '$id' at $off claims $size bytes (bound $to)")
        if (id == "LIST" && size >= 4) {
          val typ = cc(bytes, off + 8)
          if (typ == "movi" || typ == "rec ")
            walk(off + 12, off + 8 + size)
        } else if (id.length == 4 &&
            (id.endsWith("dc") || id.endsWith("db")) &&
            id.take(2).forall(_.isDigit)) {
          frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
        }
        off += 8 + size + (size % 2) // word alignment
      }
    }
    walk(12, end)
    frames.result()
  }
}
