package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Media

/** Multimodal (binary-column) operator surface. All three modalities
  * decode through REAL codecs (PNG via javax.imageio, WAV PCM via
  * javax.sound.sampled, MJPEG-AVI via the [[graft.multimodal.Avi]]
  * RIFF demux + the JDK JPEG decoder); the oracles state the fixture
  * CONSTRUCTIONS in closed form, so a green row proves the codecs
  * read back exactly what was encoded.
  */
object Multimodal {

  /** Binary ingest + partition-batched decode (mapPartitions). */
  val decode = QueryDef(
    "q_mm_decode",
    (s, d) => Media.decode(Media.asMedia(Tables.documents(s, d))),
    // The oracle states the FIXTURES in closed form. Image rows
    // (doc_id % 3 = 0): constructed PNG dims (imgW/imgH) and the
    // stored-deflate byte length 68 + h*(1+3w). Audio rows (% 3 = 1):
    // WAV byte length 44 + 2·n, PCM frame count audN, sample rate
    // audSr. Video rows (% 3 = 2): the MJPEG AVI's JUNK-padded
    // closed-form container size (Media.vidBytes), vidW×vidH frame
    // dims and vidF frame count. The engine side reports what the
    // codecs ACTUALLY decoded (AVI: demuxed chunk count + first
    // frame's JPEG-decoded dims), so a green row proves the real
    // codecs read back the constructed bitstreams.
    Some("""SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                        WHEN doc_id % 3 = 1 THEN 'audio/wav'
                        ELSE 'video/avi' END AS mime,
                   CAST(CASE WHEN doc_id % 3 = 0
                             THEN 68 + (8 + (doc_id * 3) % 16)
                                  * (1 + 3 * (8 + doc_id % 16))
                             WHEN doc_id % 3 = 1
                             THEN 44 + 2 * (400 + (doc_id % 97) * 8)
                             ELSE 256 + (3 + doc_id % 8) *
                                  ((16 + (doc_id % 8) * 8) *
                                   (16 + ((doc_id * 5) % 8) * 8) * 3 + 1032)
                        END AS INT) AS n_bytes,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 16
                             WHEN doc_id % 3 = 1 THEN 0
                             ELSE 16 + (doc_id % 8) * 8 END
                     AS INT) AS width,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + (doc_id * 3) % 16
                             WHEN doc_id % 3 = 1 THEN 0
                             ELSE 16 + ((doc_id * 5) % 8) * 8
                        END AS INT) AS height,
                   CAST(CASE WHEN doc_id % 3 = 2
                             THEN 3 + doc_id % 8
                             WHEN doc_id % 3 = 1
                             THEN 400 + (doc_id % 97) * 8
                             ELSE 1 END AS INT) AS n_frames,
                   CAST(CASE WHEN doc_id % 3 = 1
                             THEN 8000 + (doc_id % 5) * 2000
                             ELSE 0 END AS INT) AS sample_rate
            FROM documents"""))

  /** Frame sampling: explode every 2nd frame index per video (the
    * codec-read frame count drives the sequence).
    */
  val frames = QueryDef(
    "q_mm_frames",
    (s, d) => Media.sampleFrames(
      Media.decode(Media.asMedia(Tables.documents(s, d))), step = 2),
    Some("""WITH dec AS (
              SELECT doc_id,
                     CAST(3 + doc_id % 8 AS INT) AS n_frames
              FROM documents WHERE doc_id % 3 = 2)
            SELECT doc_id, n_frames,
                   CAST(unnest(generate_series(0, n_frames - 1, 2)) AS INT)
                     AS frame_idx
            FROM dec"""))

  /** Aspect-preserving resize plan into a 224x224 box. */
  val resize = QueryDef(
    "q_mm_resize",
    (s, d) => Media.resizePlan(
      Media.decode(Media.asMedia(Tables.documents(s, d))), box = 224),
    Some("""WITH dec AS (
              SELECT doc_id,
                     CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 16
                               ELSE 16 + (doc_id % 8) * 8 END
                       AS INT) AS width,
                     CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + (doc_id * 3) % 16
                               ELSE 16 + ((doc_id * 5) % 8) * 8
                          END AS INT) AS height
              FROM documents WHERE doc_id % 3 <> 1)
            SELECT doc_id, width, height,
                   CAST(FLOOR(width * LEAST(224.0 / width, 224.0 / height)) AS INT)
                     AS out_w,
                   CAST(FLOOR(height * LEAST(224.0 / width, 224.0 / height)) AS INT)
                     AS out_h
            FROM dec"""))

  /** Real-codec encode→decode round-trip gate (r18 verdict #7): the
    * JDK's actual PNG ENCODER produces real compressed bytes, the
    * actual decoder reads them back, and the oracle recomputes the
    * post-decode 2×2 downsample hash closed-form — green only if the
    * codec round trip was byte-faithful. See
    * [[graft.multimodal.Media.codecRoundtrip]].
    */
  val codecRoundtrip = QueryDef(
    "q_mm_codec_roundtrip",
    (s, d) => Media.codecRoundtrip(Tables.documents(s, d)),
    Some("""WITH img AS (
              SELECT doc_id,
                     CAST(8 + doc_id % 16 AS INT) AS width,
                     CAST(8 + (doc_id * 3) % 16 AS INT) AS height
              FROM documents WHERE doc_id % 3 = 0),
            rp AS (
              SELECT i.doc_id, gy.g AS oy, gx.g AS ox,
                CAST((  ((2*gx.g)*7   + (2*gy.g)*13   + i.doc_id) % 256
                      + ((2*gx.g+1)*7 + (2*gy.g)*13   + i.doc_id) % 256
                      + ((2*gx.g)*7   + (2*gy.g+1)*13 + i.doc_id) % 256
                      + ((2*gx.g+1)*7 + (2*gy.g+1)*13 + i.doc_id) % 256)
                     // 4 AS INT) AS r,
                CAST((  ((2*gx.g)*3   + (2*gy.g)*5   + i.doc_id*11) % 251
                      + ((2*gx.g+1)*3 + (2*gy.g)*5   + i.doc_id*11) % 251
                      + ((2*gx.g)*3   + (2*gy.g+1)*5 + i.doc_id*11) % 251
                      + ((2*gx.g+1)*3 + (2*gy.g+1)*5 + i.doc_id*11) % 251)
                     // 4 AS INT) AS g,
                CAST((  ((2*gx.g)   + (2*gy.g)*17   + i.doc_id*29) % 241
                      + ((2*gx.g+1) + (2*gy.g)*17   + i.doc_id*29) % 241
                      + ((2*gx.g)   + (2*gy.g+1)*17 + i.doc_id*29) % 241
                      + ((2*gx.g+1) + (2*gy.g+1)*17 + i.doc_id*29) % 241)
                     // 4 AS INT) AS b
              -- fixed range (w,h <= 23 so out dims <= 11), bounded per
              -- doc in WHERE: DuckDB's generate_series takes no lateral
              -- column parameters
              FROM img i, generate_series(0, 10) gx(g),
                   generate_series(0, 10) gy(g)
              WHERE gx.g < i.width // 2 AND gy.g < i.height // 2),
            canon AS (
              SELECT doc_id,
                     md5(string_agg(CAST(r AS VARCHAR) || ',' ||
                           CAST(g AS VARCHAR) || ',' ||
                           CAST(b AS VARCHAR), ';'
                           ORDER BY oy, ox)) AS resize_md5
              FROM rp GROUP BY doc_id)
            SELECT i.doc_id, i.width, i.height,
                   1 AS roundtrip_ok,
                   i.width AS jpeg_w, i.height AS jpeg_h,
                   CAST(i.width // 2 AS INT) AS out_w,
                   CAST(i.height // 2 AS INT) AS out_h,
                   c.resize_md5
            FROM img i JOIN canon c USING (doc_id)"""))

  /** Perceptual-hash-shaped media near-dup: the asset-dedup operator an
    * image/video pipeline runs (same asset re-encoded, watermarked, or
    * corrupted in one region). A real pHash derives 64 bits from a DCT
    * of downscaled luma over a FIXED raster; with no codecs here, the
    * raster stands in as a fixed 240-char signature window of the
    * payload, split into 4 quarters of 60, each hashed to a 16-bit md5
    * lane. The match machinery is the production one: a banded
    * inverted index on (quarter idx, quarter hash) and a 3-of-4
    * agreement gate, so assets differing in at most one signature
    * quarter (one edited region) still collide, without any O(n²)
    * pair scan — and because the window is FIXED-length (like a real
    * pHash raster), trailing-content edits and size changes don't
    * break alignment. Payloads under 240 chars have no full signature
    * and are excluded (a real pipeline falls back to exact hashing
    * there).
    *
    * Scale shape: 4 index rows per asset; self-join bucket volume is
    * Σ bucket² over (qi, qh) — hot shared-boilerplate buckets are the
    * known risk and would take the q_jaccard_pairs df-cap treatment at
    * web scale (documented knob, not needed on this corpus: measured
    * max bucket 3). No shuffle carries payload bytes.
    */
  val mmPhash = QueryDef(
    "q_mm_phash",
    (s, d) => {
      import org.apache.spark.sql.functions._
      import graft.functions.PortableHash
      def lane(sub: String) =
        s"${PortableHash.laneSpark(s"md5($sub)", 0)} % 65536"
      val t = Tables.documents(s, d)
        .filter(length(col("text")) >= 240)
      val q = t.select(col("doc_id"), explode(array(
        (0 until 4).map(i =>
          struct(lit(i).as("qi"),
            expr(lane(s"substring(text, ${1 + 60 * i}, 60)")).as("qh"))): _*))
        .as("e"))
        .select(col("doc_id"), col("e.qi"), col("e.qh"))
      q.alias("a").join(q.alias("b"),
          col("a.qi") === col("b.qi") && col("a.qh") === col("b.qh") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_match"))
        .filter(col("n_match") >= 3)
        // full_sig_match (NOT "exact duplicate"): all 4 lanes of the
        // FIXED 240-char signature window agree — content beyond the
        // window may still differ; exact-dup attestation is
        // q_dedup_exact's full-payload hash, not this index
        .withColumn("full_sig_match", (col("n_match") === 4).cast("int"))
        .orderBy("doc_a", "doc_b")
    },
    Some {
      import graft.functions.PortableHash
      def lane(sub: String) =
        s"${PortableHash.laneDuck(s"md5($sub)", 0)} % 65536"
      val quarters = (0 until 4).map(i =>
        s"SELECT doc_id, $i AS qi, ${lane(s"substr(text, ${1 + 60 * i}, 60)")} AS qh FROM t")
        .mkString("\n            UNION ALL\n            ")
      s"""WITH t AS (
            SELECT doc_id, text FROM documents WHERE length(text) >= 240),
          q AS (
            $quarters)
          SELECT doc_a, doc_b, n_match,
                 CASE WHEN n_match = 4 THEN 1 ELSE 0 END AS full_sig_match
          FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS n_match
            FROM q a JOIN q b
              ON a.qi = b.qi AND a.qh = b.qh AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          WHERE n_match >= 3
          ORDER BY doc_a, doc_b"""
    })

  /** Audio feature extraction from the REAL decoded PCM
    * ([[Media.audioFeatures]]): RMS energy, zero crossings, peak. The
    * oracle replays the deterministic fixture signal closed-form
    * (s_i = (i·131 + doc_id·17) mod 65536 − 32768 over audN samples),
    * so a green row proves the JDK codec handed back the exact
    * constructed PCM AND the features computed over it — the
    * decode→feature chain a VAD / loudness-normalization stage runs.
    * Scale shape: payload-local per-partition work, one k-row output
    * per clip; nothing shuffles but the final rows.
    */
  val audioFeatures = QueryDef(
    "q_mm_audio_features",
    (s, d) => Media.audioFeatures(Media.asMedia(Tables.documents(s, d))),
    Some("""WITH aud AS (
              SELECT doc_id,
                     CAST(400 + (doc_id % 97) * 8 AS BIGINT) AS n,
                     CAST(8000 + (doc_id % 5) * 2000 AS INT) AS sample_rate
              FROM documents WHERE doc_id % 3 = 1),
            idx AS (SELECT doc_id, n, sample_rate,
                           unnest(generate_series(0, n - 1)) AS i
                    FROM aud),
            sv AS (SELECT doc_id, n, sample_rate, i,
                          (i * 131 + doc_id * 17) % 65536 - 32768 AS s
                   FROM idx),
            f AS (SELECT *, LAG(s) OVER (PARTITION BY doc_id ORDER BY i)
                              AS prev
                  FROM sv)
            SELECT doc_id, CAST(n AS INT) AS n_samples, sample_rate,
                   ROUND(SQRT(CAST(SUM(s * s) AS DOUBLE) / n), 6) AS rms,
                   CAST(SUM(CASE WHEN prev IS NOT NULL
                                  AND ((s >= 0) <> (prev >= 0))
                            THEN 1 ELSE 0 END) AS INT) AS n_zero_cross,
                   CAST(MAX(ABS(s)) AS INT) AS peak
            FROM f GROUP BY doc_id, n, sample_rate"""))

  def all: Seq[QueryDef] =
    Seq(decode, frames, resize, mmPhash, audioFeatures, codecRoundtrip)
}
