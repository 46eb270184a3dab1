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

  def all: Seq[QueryDef] = Seq(decode, frames, resize)
}
