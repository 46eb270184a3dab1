package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Media

/** Multimodal (binary-column) operator surface. The decode step is a
  * deterministic stub (no codecs in this environment — see
  * [[graft.multimodal.Media]]), which makes the full plumbing
  * oracle-checkable: the fake metadata is pure arithmetic over the
  * UTF-8 byte length, reproducible in DuckDB SQL.
  */
object Multimodal {

  /** Binary ingest + partition-batched decode (mapPartitions). */
  val decode = QueryDef(
    "q_mm_decode",
    (s, d) => Media.decode(Media.asMedia(Tables.documents(s, d))),
    Some("""SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                        WHEN doc_id % 3 = 1 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS mime,
                   CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                   CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
                   CAST(64 + (octet_length(encode(text)) * 7) % 577 AS INT) AS height,
                   CAST(CASE WHEN doc_id % 3 = 2
                             THEN 1 + octet_length(encode(text)) % 240
                             ELSE 1 END AS INT) AS n_frames
            FROM documents"""))

  /** Frame sampling: explode every 10th frame index per video. */
  val frames = QueryDef(
    "q_mm_frames",
    (s, d) => Media.sampleFrames(
      Media.decode(Media.asMedia(Tables.documents(s, d))), step = 10),
    Some("""WITH dec AS (
              SELECT doc_id,
                     CAST(1 + octet_length(encode(text)) % 240 AS INT) AS n_frames
              FROM documents WHERE doc_id % 3 = 2)
            SELECT doc_id, n_frames,
                   CAST(unnest(generate_series(0, n_frames - 1, 10)) AS INT)
                     AS frame_idx
            FROM dec"""))

  /** Aspect-preserving resize plan into a 224x224 box. */
  val resize = QueryDef(
    "q_mm_resize",
    (s, d) => Media.resizePlan(
      Media.decode(Media.asMedia(Tables.documents(s, d))), box = 224),
    Some("""WITH dec AS (
              SELECT doc_id,
                     CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
                     CAST(64 + (octet_length(encode(text)) * 7) % 577 AS INT) AS height
              FROM documents)
            SELECT doc_id, width, height,
                   CAST(FLOOR(width * LEAST(224.0 / width, 224.0 / height)) AS INT)
                     AS out_w,
                   CAST(FLOOR(height * LEAST(224.0 / width, 224.0 / height)) AS INT)
                     AS out_h
            FROM dec"""))

  /** Perceptual-hash-shaped media near-dup: the asset-dedup operator an
    * image/video pipeline runs (same asset re-encoded, watermarked, or
    * corrupted in one region). A real pHash derives 64 bits from a DCT
    * of downscaled luma; with no codecs here, the SIGNATURE derivation
    * is the stub — each payload splits into 4 equal content quarters
    * and each quarter yields a 16-bit md5 lane — while the match
    * machinery is the production one: a banded inverted index on
    * (quarter idx, length, quarter hash) and a 3-of-4 agreement gate,
    * so pairs that differ in at most one quarter (one edited region)
    * still collide, without any O(n²) pair scan. Quarter offsets
    * derive from the length, so this targets length-preserving edits —
    * the "same dimensions, small patch" case; re-encodes that change
    * size belong to the embedding near-dup family instead (documented
    * trade-off).
    *
    * Scale shape: 4 index rows per asset, self-join on the
    * (qi, n, qh) key — bucket volume is Σ bucket², bounded by the
    * 16-bit hash space PER length class; the agreement count is a
    * hash-agg over colliding pairs only. No shuffle carries payload
    * bytes — only 8-byte hashes and lengths.
    */
  val mmPhash = QueryDef(
    "q_mm_phash",
    (s, d) => {
      import org.apache.spark.sql.functions._
      import graft.functions.PortableHash
      def lane(sub: String) =
        s"${PortableHash.laneSpark(s"md5($sub)", 0)} % 65536"
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), length(col("text")).as("n"))
        .filter(col("n") >= 4)
        .withColumn("l", floor(col("n") / 4).cast("int"))
      val q = t.select(col("doc_id"), col("n"), explode(array(
        struct(lit(0).as("qi"), expr(lane("substring(text, 1, l)")).as("qh")),
        struct(lit(1).as("qi"), expr(lane("substring(text, l + 1, l)")).as("qh")),
        struct(lit(2).as("qi"), expr(lane("substring(text, 2 * l + 1, l)")).as("qh")),
        struct(lit(3).as("qi"), expr(lane("substring(text, 3 * l + 1)")).as("qh"))))
        .as("e"))
        .select(col("doc_id"), col("n"), col("e.qi"), col("e.qh"))
      q.alias("a").join(q.alias("b"),
          col("a.qi") === col("b.qi") && col("a.n") === col("b.n") &&
            col("a.qh") === col("b.qh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_match"))
        .filter(col("n_match") >= 3)
        .withColumn("is_exact", (col("n_match") === 4).cast("int"))
        .orderBy("doc_a", "doc_b")
    },
    Some {
      import graft.functions.PortableHash
      def lane(sub: String) =
        s"${PortableHash.laneDuck(s"md5($sub)", 0)} % 65536"
      s"""WITH t AS (
            SELECT doc_id, text, length(text) AS n,
                   CAST(FLOOR(length(text) / 4) AS INT) AS l
            FROM documents WHERE length(text) >= 4),
          q AS (
            SELECT doc_id, n, 0 AS qi, ${lane("substr(text, 1, l)")} AS qh FROM t
            UNION ALL
            SELECT doc_id, n, 1, ${lane("substr(text, l + 1, l)")} FROM t
            UNION ALL
            SELECT doc_id, n, 2, ${lane("substr(text, 2 * l + 1, l)")} FROM t
            UNION ALL
            SELECT doc_id, n, 3, ${lane("substr(text, 3 * l + 1)")} FROM t)
          SELECT doc_a, doc_b, n_match,
                 CASE WHEN n_match = 4 THEN 1 ELSE 0 END AS is_exact
          FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS n_match
            FROM q a JOIN q b
              ON a.qi = b.qi AND a.n = b.n AND a.qh = b.qh
             AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          WHERE n_match >= 3
          ORDER BY doc_a, doc_b"""
    })

  def all: Seq[QueryDef] = Seq(decode, frames, resize, mmPhash)
}
