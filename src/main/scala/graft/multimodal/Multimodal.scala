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

  /** GRAFT-RAW: a real (if minimal) raster container so the decode /
    * resize / frame-sample path exercises genuine byte-level parsing and
    * pixel math rather than only schema plumbing. Layout (big-endian):
    * magic 'G','R', uint16 width, uint16 height, uint16 nFrames, then
    * nFrames × (width*height) bytes of 8-bit grayscale pixels. External
    * codecs (JPEG/PNG/...) stay behind [[StubCodec]] — their libraries do
    * not ship in this container — but everything below is real math. */
  object Raster {
    final case class Decoded(width: Int, height: Int, nFrames: Int, frames: Array[Array[Byte]])

    def encode(width: Int, height: Int, frames: Array[Array[Byte]]): Array[Byte] = {
      require(frames.forall(_.length == width * height), "frame size mismatch")
      val out = new Array[Byte](8 + frames.length * width * height)
      out(0) = 'G'; out(1) = 'R'
      out(2) = (width >> 8).toByte; out(3) = width.toByte
      out(4) = (height >> 8).toByte; out(5) = height.toByte
      out(6) = (frames.length >> 8).toByte; out(7) = frames.length.toByte
      var off = 8
      for (f <- frames) { System.arraycopy(f, 0, out, off, f.length); off += f.length }
      out
    }

    def decode(payload: Array[Byte]): Option[Decoded] = {
      if (payload.length < 8 || payload(0) != 'G' || payload(1) != 'R') return None
      def u16(i: Int) = ((payload(i) & 0xff) << 8) | (payload(i + 1) & 0xff)
      val (w, h, n) = (u16(2), u16(4), u16(6))
      // size check in Long: the three uint16 header fields multiply up to
      // ~2.8e14, far past Int.MaxValue — an Int product would wrap and let a
      // corrupt header slip past the check into a throwing slice (ADVICE r3)
      if (payload.length.toLong != 8L + n.toLong * w * h) return None
      Some(Decoded(w, h, n,
        Array.tabulate(n)(f => payload.slice(8 + f * w * h, 8 + (f + 1) * w * h))))
    }

    /** Mean-pool resize by factor f (the canonical training-data image
      * preprocessing op): output pixel (r, c) = mean of the input block
      * rows [r*f, min((r+1)*f, h)) × cols [c*f, min((c+1)*f, w)) — ragged
      * edge blocks average over their actual pixels. Returns
      * (outWidth, outHeight, row-major block means). */
    def meanPool(frame: Array[Byte], w: Int, h: Int, f: Int): (Int, Int, Array[Double]) = {
      val ow = (w + f - 1) / f
      val oh = (h + f - 1) / f
      val out = new Array[Double](ow * oh)
      var br = 0
      while (br < oh) {
        var bc = 0
        while (bc < ow) {
          var sum = 0L; var cnt = 0
          var r = br * f
          while (r < math.min((br + 1) * f, h)) {
            var c = bc * f
            while (c < math.min((bc + 1) * f, w)) {
              sum += (frame(r * w + c) & 0xff); cnt += 1; c += 1
            }
            r += 1
          }
          out(br * ow + bc) = sum.toDouble / cnt
          bc += 1
        }
        br += 1
      }
      (ow, oh, out)
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
