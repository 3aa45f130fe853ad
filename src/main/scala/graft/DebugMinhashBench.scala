package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, Md5Hashing, XxHashing}
import graft.text.TextOps

/** Production-shape MinHash signature micro-bench: the three formulations
  * of a FULL-width signature build (default 128 hashes — the web-dedup
  * production shape; the phase-1 `d_*` queries use 4 for oracle
  * tractability) over the documents table, each consumed by a checksum
  * aggregate that requires every signature slot (so column pruning cannot
  * skip work):
  *
  *  - `hof_md5`   — per-slot `array_min(transform(...md5...))`, the oracle
  *                  formulation (interpreted HOF, string hashes);
  *  - `hof_xx`    — the same HOF shape on xxhash64 longs (what XxHashing
  *                  computed before the native expression);
  *  - `native_xx` — [[graft.functions.MinHashSignature]], one codegen'd
  *                  pass (what [[Dedup.minHashSignatures]] under XxHashing
  *                  computes now) — bitwise-equal to `hof_xx` per slot.
  *
  * args: sfDir [numHashes=128] [reps=3]
  * stdout: one `MINHASHBENCH mode=… rep=… wall=… checksum=…` line per run
  * (hof_xx/native_xx checksums must agree — printed so the equality is in
  * the record).
  */
object DebugMinhashBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 128
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().appName("graft-minhash-bench")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // repartition + cache: the sf-scale table is a single small parquet
    // file (one input split); the bench measures the signature COMPUTE on
    // all cores, not a single-threaded parquet scan
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32).cache()

    def consume(sig: DataFrame): Long = {
      // checksum over EVERY slot: xxhash64 across the mh columns per row,
      // bit_xor'd — forces all slots, order-insensitive, comparable across
      // the two xx modes
      val mh = (0 until n).map(i => col(s"mh$i"))
      sig.select(xxhash64(mh: _*).as("h")).agg(expr("bit_xor(h)")).head().getLong(0)
    }

    def hofXx: DataFrame = {
      val toks = array_distinct(TextOps.tokens(col("text")))
      docs.select((col("doc_id").cast("long").as("key") +:
        (0 until n).map(i => array_min(transform(toks, t => XxHashing.tokenHash(t, i))).as(s"mh$i"))): _*)
    }

    val modes: Seq[(String, () => DataFrame)] = Seq(
      "hof_md5" -> (() => Dedup.minHashSignatures(docs, "doc_id", "text", n, Md5Hashing)),
      "hof_xx" -> (() => hofXx),
      "native_xx" -> (() => Dedup.minHashSignatures(docs, "doc_id", "text", n, XxHashing)))

    // untimed warm-up of scan + codegen paths
    docs.count()
    modes.foreach { case (_, f) => consume(f().limit(50)) }

    for (rep <- 1 to reps; (name, f) <- modes) {
      val t0 = System.nanoTime()
      val cs = consume(f())
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"MINHASHBENCH mode=$name rep=$rep n=$n wall=$wall%.2f checksum=$cs")
    }
    spark.stop()
  }
}
