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
        |FROM meta WHERE n_frames > 0 ORDER BY doc_id, frame_idx""".stripMargin
  )
}
