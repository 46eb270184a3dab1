package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Adler32, CRC32}

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches (the Scala analog of `mapInPandas`).
  *
  * The IMAGE modality is decoded for real: fixture payloads are valid
  * PNG files (hand-rolled deterministic encoder, [[pngBytes]]) and
  * [[decode]] runs them through the JDK's actual PNG codec
  * (`javax.imageio.ImageIO`), so width/height in the output are what
  * the codec read from the bitstream, not arithmetic. Audio/video
  * payloads remain clearly-marked deterministic stubs ([[decodeStub]])
  * — this environment ships no WAV/MP4 codec; the signature (bytes in,
  * typed metadata out) is the production one and a real codec drops
  * into the same per-partition loop.
  *
  * Scale note: payloads stay in executors end-to-end (no collect); a
  * 100 TB media corpus maps to the same plan with the binary column
  * read lazily from parquet and `spark.sql.files.maxPartitionBytes`
  * sizing the batches.
  */
object Media {

  /** Fixture image dimensions per doc — small constants so the corpus
    * of PNGs stays tiny; the DuckDB oracle states these same formulas.
    */
  def imgW(docId: Long): Int = (8 + docId % 16).toInt
  def imgH(docId: Long): Int = (8 + (docId * 3) % 16).toInt

  /** Deterministic truecolor PNG encoder using STORED (uncompressed)
    * deflate blocks — a fully valid PNG any codec reads, with a
    * closed-form byte length the SQL oracle can state:
    * `68 + h*(1 + 3*w)` for images small enough to fit one stored
    * block (raw ≤ 65535 bytes; every fixture image is). Pixels are a
    * deterministic function of (x, y, seed), so a spec can verify the
    * real decoder returns the exact constructed bitmap.
    */
  def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + 3 * w))
    var i = 0
    var y = 0
    while (y < h) {
      raw(i) = 0 // filter: None
      i += 1
      var x = 0
      while (x < w) {
        raw(i) = ((x * 7 + y * 13 + seed) % 256).toByte
        raw(i + 1) = ((x * 3 + y * 5 + seed * 11) % 251).toByte
        raw(i + 2) = ((x + y * 17 + seed * 29) % 241).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    def be32(out: ByteArrayOutputStream, v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
      be32(out, data.length.toLong)
      val tb = typ.getBytes(StandardCharsets.US_ASCII)
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(tb, 0, tb.length); out.write(data, 0, data.length)
      be32(out, crc.getValue)
    }
    val ihdr = new ByteArrayOutputStream()
    be32(ihdr, w.toLong); be32(ihdr, h.toLong)
    ihdr.write(8); ihdr.write(2) // bit depth 8, truecolor
    ihdr.write(0); ihdr.write(0); ihdr.write(0)
    val z = new ByteArrayOutputStream()
    z.write(0x78); z.write(0x01) // zlib header, no preset dict
    var off = 0
    while (off < raw.length) {
      val len = math.min(65535, raw.length - off)
      z.write(if (off + len >= raw.length) 1 else 0) // BFINAL, BTYPE=00
      z.write(len & 0xff); z.write((len >> 8) & 0xff)
      z.write(~len & 0xff); z.write((~len >> 8) & 0xff)
      z.write(raw, off, len)
      off += len
    }
    val ad = new Adler32(); ad.update(raw)
    be32(z, ad.getValue)
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      0, 8)
    chunk(out, "IHDR", ihdr.toByteArray)
    chunk(out, "IDAT", z.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("mime", StringType, nullable = false)))

  /** documents → opaque binary payload + mime, the ingest shape a
    * media table would have. Deterministic: image docs (doc_id % 3 ==
    * 0) carry a real [[pngBytes]] PNG with [[imgW]]×[[imgH]] fixture
    * dims; audio/video docs carry the UTF-8 text bytes (stub payloads
    * for the stub decoders). Payload synthesis happens per partition
    * in executors — the fixture corpus is built distributed, exactly
    * where real payloads would be read from parquet.
    */
  def asMedia(documents: DataFrame): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    documents.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          if (id % 3 == 0)
            Row(id, pngBytes(imgW(id), imgH(id), id), "image/png")
          else if (id % 3 == 1)
            Row(id, r.getString(1).getBytes(StandardCharsets.UTF_8),
              "audio/wav")
          else
            Row(id, r.getString(1).getBytes(StandardCharsets.UTF_8),
              "video/mp4")
        }
      }(enc)
  }

  /** Output schema of the decode step — explicit, like a mapInPandas
    * schema argument.
    */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** STUB DECODER for the codec-less modalities (audio/video) — a
    * deterministic fake standing in for a real WAV/MP4 codec. A real
    * implementation decodes `content` here; the signature (bytes in,
    * typed metadata out) is the production one.
    */
  def decodeStub(docId: Long, mime: String, content: Array[Byte]): Row = {
    val n = content.length
    // fake dims: derived from payload length only — reproducible in SQL
    val width  = 64 + (n % 577)
    val height = 64 + ((n * 7) % 577)
    val frames = if (mime.startsWith("video")) 1 + n % 240 else 1
    Row(docId, mime, n, width, height, frames)
  }

  /** Decode all payloads partition-batch-wise (mapPartitions keeps the
    * per-batch setup cost — codec init, model load — amortized exactly
    * like mapInPandas batches). PNG payloads go through the REAL JDK
    * codec; audio/video through [[decodeStub]].
    */
  def decode(media: DataFrame): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    media.select("doc_id", "mime", "content")
      .mapPartitions { rows =>
        // per-partition init goes here (codec handles, buffers)
        rows.map { r =>
          val (id, mime) = (r.getLong(0), r.getString(1))
          val content = r.getAs[Array[Byte]](2)
          if (mime == "image/png") {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(content))
            require(img != null, s"doc $id: not a decodable PNG")
            Row(id, mime, content.length, img.getWidth, img.getHeight, 1)
          } else decodeStub(id, mime, content)
        }
      }(enc)
  }

  /** Frame sampling: one output row per sampled frame (every `step`-th
    * frame of each video). sequence+explode — a generator, not a UDF,
    * so it stays inside whole-stage codegen.
    */
  def sampleFrames(decoded: DataFrame, step: Int = 10): DataFrame =
    decoded.filter(col("mime") === "video/mp4")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
          .as("frame_idx"))

  /** Resize plan: target box 224x224 preserving aspect ratio — the
    * arithmetic a preprocess stage computes before handing batches to
    * the (stubbed) resizer.
    */
  def resizePlan(decoded: DataFrame, box: Int = 224): DataFrame =
    decoded
      .withColumn("scale",
        least(lit(box) / col("width"), lit(box) / col("height")))
      .select(
        col("doc_id"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("int").as("out_w"),
        floor(col("height") * col("scale")).cast("int").as("out_h"))
}
