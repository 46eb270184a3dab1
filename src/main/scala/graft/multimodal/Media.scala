package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches (the Scala analog of `mapInPandas`).
  *
  * There is no media codec in this environment, so `decodeStub` is a
  * clearly-marked deterministic fake: it derives (width, height,
  * n_frames) from the payload bytes with plain arithmetic. The REAL
  * parts — binary schema, explicit output StructType, partition batch
  * iteration, frame-sample explode — are the Spark-side plumbing a
  * production decoder would drop into unchanged (swap `decodeStub` for
  * a JNI/codec call per batch).
  *
  * Scale note: payloads stay in executors end-to-end (no collect); a
  * 100 TB media corpus maps to the same plan with the binary column
  * read lazily from parquet and `spark.sql.files.maxPartitionBytes`
  * sizing the batches.
  */
object Media {

  /** documents.text → opaque binary payload + mime, the ingest shape a
    * media table would have. Deterministic: bytes are the UTF-8 text.
    */
  def asMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))

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

  /** STUB DECODER — deterministic fake standing in for a real codec.
    * A real implementation decodes `content` (PNG/WAV/MP4) here; the
    * signature (bytes in, typed metadata out) is the production one.
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
    * like mapInPandas batches).
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select("doc_id", "mime", "content")
      .mapPartitions { rows =>
        // per-partition init goes here (codec handles, buffers)
        rows.map { r =>
          decodeStub(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
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
