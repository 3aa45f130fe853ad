package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque `BINARY`
  * columns with typed metadata; decode / feature-extract / frame-sample run
  * as batch-iterator partition transforms (`mapPartitions`), the Scala
  * analogue of Pandas-UDF `mapInPandas` batches.
  *
  * The codec itself is STUBBED (no image/audio libraries ship in this
  * container): [[StubCodec.decode]] is a deterministic fake that derives
  * metadata from the bytes. Everything around it — schema, binary column
  * handling, per-partition batching, explode of frames — is real and tested,
  * so a real codec drops into [[StubCodec]] without touching the plumbing. */
object Multimodal {

  /** Deterministic fake decoder. A real implementation would parse the
    * container format; this derives stable pseudo-metadata from content. */
  object StubCodec {
    final case class Meta(nBytes: Long, width: Long, height: Long, nFrames: Long)
    def decode(payload: Array[Byte]): Meta = {
      val n = payload.length.toLong
      // ??? real codec goes here; deterministic fake below.
      Meta(nBytes = n, width = n % 640, height = (n * 7) % 480, nFrames = n % 16)
    }
  }

  /** Attach a binary payload column (here: utf-8 of text, standing in for
    * fetched media bytes) — models the pages.html BINARY column shape. */
  def withBinaryPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8").cast(BinaryType))

  final case class MetaRow(doc_id: Long, n_bytes: Long, width: Long, height: Long, n_frames: Long)

  /** Batch decode: one iterator pass per partition (no per-row task setup,
    * mirrors mapInPandas batch semantics). Input needs (doc_id, payload). */
  def decodeMeta(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val m = StubCodec.decode(payload)
          MetaRow(id, m.nBytes, m.width, m.height, m.nFrames)
        }
      }
      .toDF()
  }

  /** Frame sampling: every `stride`-th frame index of each decoded payload
    * (video frame-sample shape: one output row per kept frame). */
  def sampleFrames(withPayload: DataFrame, stride: Int): DataFrame = {
    decodeMeta(withPayload)
      .where(col("n_frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))
  }
}
