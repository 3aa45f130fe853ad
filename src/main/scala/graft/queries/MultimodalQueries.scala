package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing queries: binary payload column + stub decode.
  * The decode arithmetic is deterministic (StubCodec), so it has a plain
  * SQL oracle even though the engine side runs through mapPartitions. */
object MultimodalQueries {

  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> ((s, dir) => {
      Multimodal.decodeMeta(Multimodal.withBinaryPayload(t(s, dir, "documents"), "text"))
        .orderBy("doc_id")
    }),
    "mm_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(Multimodal.withBinaryPayload(t(s, dir, "documents"), "text"), stride = 4)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    }),

    // REAL raster pipeline: per doc, synthesize a GRAFT-RAW grayscale image
    // (w = 16 + id%8, h = 8 + id%5, pixel i = (id*31 + i*7) % 256), then
    // run the genuine byte path — encode -> header/pixel PARSE -> factor-4
    // mean-pool resize — and emit one row per pooled block. The oracle
    // recomputes every block mean from the pixel formula, so a bug anywhere
    // in the byte layout, the unsigned handling, or the ragged-edge pooling
    // breaks the match. Block means are exact in double (integer sums / a
    // small count), so no FP-order hazard.
    "mm_resize" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id").cast("long")).as[Long]
        .mapPartitions { it =>
          it.flatMap { id =>
            val w = 16 + (id % 8).toInt
            val h = 8 + (id % 5).toInt
            val px = Array.tabulate(w * h)(i => ((id * 31 + i * 7) % 256).toByte)
            val payload = Multimodal.Raster.encode(w, h, Array(px))
            val dec = Multimodal.Raster.decode(payload).get
            val (ow, _, pooled) = Multimodal.Raster.meanPool(dec.frames(0), dec.width, dec.height, 4)
            pooled.zipWithIndex.map { case (v, i) =>
              (id, (i / ow).toLong, (i % ow).toLong, math.rint(v * 1e6) / 1e6)
            }
          }
        }
        .toDF("doc_id", "block_r", "block_c", "pooled")
        .orderBy("doc_id", "block_r", "block_c")
    })
  )

  // StubCodec arithmetic mirrored in SQL: n = octet_length(utf8(text)).
  val oracleSql: Map[String, String] = Map(
    "mm_decode_meta" ->
      """SELECT doc_id::BIGINT AS doc_id,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  (octet_length(encode(text)) % 640)::BIGINT AS width,
        |  ((octet_length(encode(text)) * 7) % 480)::BIGINT AS height,
        |  (octet_length(encode(text)) % 16)::BIGINT AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """WITH meta AS (
        |  SELECT doc_id, octet_length(encode(text)) % 16 AS n_frames FROM documents)
        |SELECT doc_id::BIGINT AS doc_id, unnest(range(0, n_frames, 4))::BIGINT AS frame_idx
        |FROM meta WHERE n_frames > 0 ORDER BY doc_id, frame_idx""".stripMargin,

    "mm_resize" ->
      """WITH d AS (SELECT doc_id::BIGINT AS id,
        |                  (16 + doc_id % 8)::INT AS w, (8 + doc_id % 5)::INT AS h
        |           FROM documents),
        |px AS (
        |  SELECT id, w, h, t.i,
        |         ((id * 31 + t.i * 7) % 256)::DOUBLE AS v,
        |         (t.i // w) AS r, (t.i % w) AS c
        |  FROM d JOIN range(0, 300) t(i) ON t.i < w * h)
        |SELECT id AS doc_id, (r // 4)::BIGINT AS block_r, (c // 4)::BIGINT AS block_c,
        |       round(avg(v), 6) AS pooled
        |FROM px GROUP BY id, r // 4, c // 4
        |ORDER BY doc_id, block_r, block_c""".stripMargin
  )
}
