package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "tiny"), (1L, "a somewhat longer audio payload"),
    (2L, "video payload " * 20), (5L, "another video " * 3))
    .toDF("doc_id", "text")

  test("ImageIO stream caching stays OFF — codec payloads never touch disk") {
    // the r16 finding: the JDK default wraps every codec stream in a
    // disk-backed cache (one temp file per image/frame call on
    // in-memory byte arrays), whose writeback backlog stalled bench
    // iterations progressively. Media's init turns it off; a refactor
    // that drops that line would regress silently — this pins it.
    Media.decode(Media.asMedia(docs)).collect() // forces Media init
    assert(!javax.imageio.ImageIO.getUseCache,
      "ImageIO.setUseCache(false) lost — every decode would write a temp file")
  }

  test("decode emits one typed metadata row per payload, deterministic") {
    val d1 = Media.decode(Media.asMedia(docs)).collect().sortBy(_.getLong(0))
    val d2 = Media.decode(Media.asMedia(docs)).collect().sortBy(_.getLong(0))
    assert(d1.toSeq === d2.toSeq)
    assert(d1.length === 4)
    val r0 = d1(0) // doc 0: image — a REAL PNG, really decoded
    assert(r0.getString(1) === "image/png")
    // fixture dims for doc 0: 8×8; stored-deflate length 68 + h*(1+3w)
    assert(r0.getInt(3) === 8 && r0.getInt(4) === 8)
    assert(r0.getInt(2) === 68 + 8 * (1 + 3 * 8))
    val r1 = d1(1) // doc 1: audio — a REAL WAV, really decoded
    assert(r1.getString(1) === "audio/wav")
    assert(r1.getInt(2) === 44 + 2 * Media.audN(1L)) // closed-form bytes
    assert(r1.getInt(3) === 0 && r1.getInt(4) === 0) // no spatial dims
    assert(r1.getInt(5) === Media.audN(1L)) // PCM frames from the codec
    assert(r1.getInt(6) === Media.audSr(1L)) // sample rate from fmt chunk
    // images decode to exactly one frame; only audio/video carry more
    assert(d1.filter(_.getString(1) == "image/png").forall(_.getInt(5) === 1))
  }

  test("wavBytes is a valid WAV: AudioSystem decodes the exact constructed signal") {
    for (id <- Seq(1L, 4L, 7L, 100L, 301L)) {
      val (n, sr) = (Media.audN(id), Media.audSr(id))
      val bytes = Media.wavBytes(n, sr, id)
      assert(bytes.length === 44 + 2 * n) // the closed form the oracle states
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      assert(fmt.getSampleRate.toInt === sr && fmt.getChannels === 1)
      assert(fmt.getSampleSizeInBits === 16)
      assert(in.getFrameLength.toInt === n)
      // sample-exact roundtrip: the codec must hand back the
      // generator's little-endian PCM values
      val pcm = in.readAllBytes()
      assert(pcm.length === 2 * n)
      for (i <- 0 until n) {
        val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort
        assert(s === (((i * 131 + id * 17) % 65536) - 32768).toShort,
          s"doc $id sample $i")
      }
    }
  }

  test("pngBytes is a valid PNG: ImageIO decodes the exact constructed bitmap") {
    for (id <- Seq(0L, 3L, 6L, 9L, 33L, 48L)) {
      val (w, h) = (Media.imgW(id), Media.imgH(id))
      val bytes = Media.pngBytes(w, h, id)
      // closed-form length the oracle states
      assert(bytes.length === 68 + h * (1 + 3 * w))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"doc $id: codec rejected the PNG")
      assert(img.getWidth === w && img.getHeight === h)
      // pixel-exact roundtrip: the codec must return the generator's
      // channel values (truecolor 8-bit, filter None — lossless)
      for (x <- 0 until w; y <- 0 until h) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) === ((x * 7 + y * 13 + id) % 256).toInt)
        assert(((rgb >> 8) & 0xff) === ((x * 3 + y * 5 + id * 11) % 251).toInt)
        assert((rgb & 0xff) === ((x + y * 17 + id * 29) % 241).toInt)
      }
    }
  }

  test("aviBytes is a valid MJPEG AVI: demux + JPEG decode recover the constructed frames") {
    for (id <- Seq(2L, 5L, 11L, 23L, 100L)) {
      val bytes = Media.aviBytes(id)
      // closed-form container length the oracle states (JUNK padded)
      assert(bytes.length === Media.vidBytes(id))
      val frames = graft.multimodal.Avi.demux(bytes)
      assert(frames.length === Media.vidF(id), s"doc $id frame count")
      for ((f, idx) <- frames.zipWithIndex) {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f))
        assert(img != null, s"doc $id frame $idx: codec rejected the JPEG")
        assert(img.getWidth === Media.vidW(id) &&
          img.getHeight === Media.vidH(id))
        // flat-color frames survive the lossy round trip to within a
        // quantization step — and because the color is a function of
        // the FRAME INDEX, this also proves the demux preserved order
        val (w, h) = (Media.vidW(id), Media.vidH(id))
        for ((x, y) <- Seq((0, 0), (w / 2, h / 2), (w - 1, h - 1))) {
          val rgb = img.getRGB(x, y)
          for ((c, shift) <- Seq((0, 16), (1, 8), (2, 0))) {
            val got = (rgb >> shift) & 0xff
            val want = Media.frameColor(id, idx, c)
            assert(math.abs(got - want) <= 8,
              s"doc $id frame $idx ($x,$y) ch$c: got $got want $want")
          }
        }
      }
    }
  }

  test("demux fails loudly on a corrupt chunk size instead of spinning") {
    val bytes = Media.aviBytes(2L).clone()
    // find the first frame chunk and poison its le32 size to -8: the
    // unguarded walk would advance by 8 + (-8) + 0 = 0 bytes forever
    val idx = bytes.sliding(4).indexWhere(w =>
      new String(w.map(_.toChar)) == "00dc")
    assert(idx > 0, "fixture has no 00dc chunk")
    bytes(idx + 4) = 0xF8.toByte; bytes(idx + 5) = 0xFF.toByte
    bytes(idx + 6) = 0xFF.toByte; bytes(idx + 7) = 0xFF.toByte
    val e = intercept[IllegalArgumentException] {
      graft.multimodal.Avi.demux(bytes)
    }
    assert(e.getMessage.contains("corrupt AVI"), e.getMessage)
    // size past the buffer bound: same loud failure, no zero-padded read
    val big = Media.aviBytes(2L).clone()
    big(idx + 4) = 0xFF.toByte; big(idx + 5) = 0xFF.toByte
    big(idx + 6) = 0xFF.toByte; big(idx + 7) = 0x7E.toByte
    intercept[IllegalArgumentException] { graft.multimodal.Avi.demux(big) }
  }

  test("sampleFrames explodes every step-th frame of videos only") {
    val frames = Media.sampleFrames(Media.decode(Media.asMedia(docs)), step = 10)
    val byDoc = frames.groupBy("doc_id").agg(
      count(lit(1)).as("n"), max("frame_idx").as("mx"))
      .as[(Long, Long, Int)].collect().map { case (k, n, _) => k -> n }.toMap
    // docs 2 and 5 are mime video/avi (doc_id % 3 == 2)
    assert(byDoc.keySet === Set(2L, 5L))
    val nf = Media.decode(Media.asMedia(docs))
      .filter(col("doc_id") === 2L).collect()(0).getInt(5)
    assert(byDoc(2L) === (nf + 9) / 10)
  }

  test("resizePlan preserves aspect ratio within the box") {
    val out = Media.resizePlan(Media.decode(Media.asMedia(docs)), box = 224)
      .as[(Long, Int, Int, Int, Int)].collect()
    for ((_, w, h, ow, oh) <- out) {
      assert(ow <= 224 && oh <= 224)
      assert(ow == 224 || oh == 224) // long edge hits the box
      val ar = w.toDouble / h
      val oar = ow.toDouble / oh
      assert(math.abs(ar - oar) / ar < 0.05)
    }
  }

  test("codecRoundtrip: real encoder bytes survive the round trip, " +
      "and the gate detects a corrupted raster") {
    val out = Media.codecRoundtrip(docs).collect()
    assert(out.nonEmpty)
    // every image doc round-trips pixel-exactly through the REAL
    // PNG encoder+decoder, and the JPEG leg preserves dimensions
    out.foreach { r =>
      assert(r.getInt(3) === 1, s"doc ${r.getLong(0)} failed round trip")
      assert(r.getInt(4) === r.getInt(1) && r.getInt(5) === r.getInt(2),
        s"doc ${r.getLong(0)}: JPEG dims drifted")
      assert(r.getString(8).matches("[0-9a-f]{32}"))
    }
    // the hash really gates pixel content: a one-pixel perturbation of
    // the same construction produces a different resize_md5 (i.e. a
    // codec returning ANY wrong byte in the averaged region would fail
    // the oracle compare, not slip through)
    val id = out.head.getLong(0)
    val w = Media.imgW(id); val h = Media.imgH(id)
    def hashOf(perturb: Boolean): String = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val rr = ((x * 7 + y * 13 + id) % 256).toInt
        val gg = ((x * 3 + y * 5 + id * 11) % 251).toInt
        val bb = ((x + y * 17 + id * 29) % 241).toInt
        img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
      }
      if (perturb) img.setRGB(0, 0, img.getRGB(0, 0) ^ 0x80)
      val md = java.security.MessageDigest.getInstance("MD5")
      val sb = new StringBuilder
      for (oy <- 0 until h / 2; ox <- 0 until w / 2) {
        def chan(shift: Int): Int =
          (for (dy <- 0 to 1; dx <- 0 to 1)
            yield (img.getRGB(2 * ox + dx, 2 * oy + dy) >> shift) & 0xff)
            .sum / 4
        if (ox > 0 || oy > 0) sb.append(';')
        sb.append(chan(16)).append(',').append(chan(8))
          .append(',').append(chan(0))
      }
      md.digest(sb.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    }
    assert(hashOf(perturb = false) === out.head.getString(8),
      "spec-side hash does not reproduce the engine's")
    assert(hashOf(perturb = true) !== out.head.getString(8),
      "a perturbed raster hashed identically — the gate is blind")
  }
}
