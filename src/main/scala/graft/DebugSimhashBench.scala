package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, XxHashing}
import graft.text.TextOps

/** SimHash formulation micro-bench: the retired explode/groupBy shape vs
  * the native per-row [[graft.functions.SimHash]] expression (what
  * [[Dedup.simHash]] computes now), plus the 64-bit xx64 production mode.
  * The native md5 mode is value-identical to the explode twin
  * (`TextExpressionsSpec`); checksums are printed so the equality is in
  * the record.
  *
  * args: sfDir [bits=16] [reps=3]
  * stdout: one `SIMHASHBENCH mode=… rep=… wall=… checksum=…` line per run.
  */
object DebugSimhashBench {

  /** The pre-round-5 md5 formulation: explode to |tokens| rows, 2*bits vote
    * columns, shuffle + groupBy back to one row per document. The ONE
    * canonical copy of the retired shape — the bench checksums and
    * `TextExpressionsSpec`'s twin-equality test both call this, so a fix
    * here keeps both guards on the same semantics. Expects doc_id/text
    * columns. */
  def explodeMd5Twin(docs: DataFrame, bits: Int): DataFrame = {
    val tok = docs.select(col("doc_id").cast("long").as("key"),
      explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
    val voteCols = (0 until bits).map { j =>
      val c = ascii(substring(md5(col("tok")), 1 + j / 4, 1))
      val nibble = when(c <= 57, c - 48).otherwise(c - 87)
      val bit = shiftright(nibble.cast("int"), j % 4).bitwiseAND(lit(1))
      (bit * 2 - 1).cast("long").as(s"v$j")
    }
    val votes = tok.select(col("key") +: voteCols: _*).groupBy("key")
      .agg((0 until bits).map(j => sum(col(s"v$j")).as(s"s$j")).head,
        (0 until bits).map(j => sum(col(s"v$j")).as(s"s$j")).tail: _*)
    val hash = (0 until bits).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    votes.select(col("key"), hash.cast("long").as("simhash"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val bits = if (args.length > 1) args(1).toInt else 16
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().appName("graft-simhash-bench")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32).cache()

    def consume(sig: DataFrame): Long =
      sig.select(xxhash64(col("key"), col("simhash")).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)

    // (mode, effective bits, frame) — xx64 always runs the full 64-bit
    // production fingerprint regardless of the md5 modes' bit width
    val modes: Seq[(String, Int, () => DataFrame)] = Seq(
      ("explode_md5", bits, () => explodeMd5Twin(docs, bits)),
      ("native_md5", bits, () => Dedup.simHash(docs, "doc_id", "text", bits)),
      ("native_xx64", 64, () => Dedup.simHash(docs, "doc_id", "text", 64, XxHashing)))

    docs.count()
    modes.foreach { case (_, _, f) => consume(f().limit(50)) }

    for (rep <- 1 to reps; (name, b, f) <- modes) {
      val t0 = System.nanoTime()
      val cs = consume(f())
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"SIMHASHBENCH mode=$name rep=$rep bits=$b wall=$wall%.2f checksum=$cs")
    }
    spark.stop()
  }
}
