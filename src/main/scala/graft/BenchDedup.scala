package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, XxHashing}

/** Two-parallelism-level scaling evidence for the LLM-data-pipeline dedup
  * operators, mirroring [[BenchSuite]]'s protocol for the north-rule graph
  * algorithms: one pinned JVM per level (spawned under `taskset`, same
  * [[BenchShared]] session), one `DEDUPRUN` line per operator with wall,
  * throughput, executor CPU, steal, and a determinism witness (checksum /
  * result count — must be identical across levels).
  *
  * minhash/lsh/simhash run in production mode ([[XxHashing]], native
  * `graft_minhash`/`graft_simhash` expressions): the md5 twins exist for
  * DuckDB oracle portability and their VALUES are gated by the driver's
  * correctness run, not by this bench. `exact` is [[Dedup.exact]] as
  * shipped — it content-hashes with md5 (128 bits: exact dedup asserts
  * equality, so a single 64-bit hash's birthday mass is a correctness
  * risk, not a tuning knob), so its DEDUPRUN lines measure the md5
  * configuration; `exact_xx` (opt-in via opsCsv) measures
  * [[Dedup.exactXx]], the 128-bit xxhash64-pair production path with the
  * identical plan shape.
  *
  * `gen` synthesizes the corpus DETERMINISTICALLY (xxhash64-derived
  * tokens, no RNG, no wall-clock): doc id's base tokens are
  * `t<pmod(xxhash64('tok', src, j), vocab)>`, 40–80 of them; every
  * id ≡ 0 (mod 10) is an EXACT duplicate of id-1, every remaining
  * id ≡ 0 (mod 13) is a NEAR duplicate of id-1 (base tokens + one unique
  * extra) — so the candidate volume is non-trivial and identical across
  * levels and re-generations.
  *
  * args:
  *   gen <path> <nDocs> [parts]
  *   run <spec> <path> [parts] [opsCsv]   spec as in BenchShared ("1x4"…)
  */
object BenchDedup {

  private val Vocab = 200000

  private def baseText(src: org.apache.spark.sql.Column) = {
    val len = (pmod(xxhash64(lit("len"), src), lit(41)) + lit(40)).cast("int")
    concat_ws(" ", transform(sequence(lit(0), len - 1),
      j => concat(lit("t"), pmod(xxhash64(lit("tok"), src, j), lit(Vocab)))))
  }

  /** STORED text of doc `i`, valid for i % 10 != 0 (non-exact-dup ids).
    * The dup rules must reference the text the partner doc actually
    * stores, not its base tokens — when the partner is itself a duplicate
    * the two differ (caught by `BenchDedupSpec`: ids ≡ 40 (mod 130) were
    * "exact dups" of a phantom). Expansion depth is provably ≤ 2: exact
    * dups (id ≡ 0 mod 10) never chain, and two near-dups (id ≡ 0 mod 13)
    * are never adjacent, so one level of prev-is-exact-dup indirection
    * closes every case. */
  private def storedNonExact(i: org.apache.spark.sql.Column) = {
    val isNear = i % 13 === 0 && i > 0
    val prev = i - 1
    // prev's stored base: prev may be an exact dup of prev-1 (and prev-1
    // is then never a near-dup: it would need both ≡ 12 and ≡ 0 mod 13)
    val prevBase = when(prev % 10 === 0 && prev > 0, prev - 1).otherwise(prev)
    when(isNear, concat(baseText(prevBase), lit(" x"), i)).otherwise(baseText(i))
  }

  def corpus(spark: SparkSession, nDocs: Long): DataFrame = {
    val id = col("id")
    val isExactDup = id % 10 === 0 && id > 0
    val text = when(isExactDup, storedNonExact(id - 1)).otherwise(storedNonExact(id))
    spark.range(nDocs).select(id.as("doc_id"), text.as("text"))
  }

  def main(args: Array[String]): Unit = args(0) match {
    case "gen" =>
      val path = args(1)
      val nDocs = args(2).toLong
      val parts = if (args.length > 3) args(3).toInt else 128
      val spark = SparkSession.builder().master("local[32]")
        .appName("graft-bench-dedup-gen")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.ui.enabled", false).getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      corpus(spark, nDocs).repartition(parts).write.mode("overwrite").parquet(path)
      println(s"DEDUPGEN path=$path docs=$nDocs parts=$parts")
      spark.stop()

    case "run" =>
      val spec = args(1)
      val path = args(2)
      val parts = if (args.length > 3) args(3).toInt else 128
      val ops = (if (args.length > 4) args(4) else "exact,minhash,lsh,simhash").split(",").toSeq
      val (_, cores) = BenchShared.parseSpec(spec)
      val spark = BenchShared.pinnedSession(spec, s"graft-bench-dedup-$spec", parts, aqe = false)

      val docs = spark.read.parquet(path)
      val nDocs = docs.count()
      // token instances = the corpus-linear work unit every op scans
      val nTokens = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)

      val N = 128 // production signature width
      val RowsPerBand = 8 // 16 bands of 8 rows

      // (name, thunk) — each returns a (witness, resultRows) pair; the
      // witness must be level-invariant (the determinism check)
      def sigChecksum(d: DataFrame): (Long, Long) = {
        val sig = Dedup.minHashSignatures(d, "doc_id", "text", N, XxHashing)
        val mh = (0 until N).map(i => col(s"mh$i"))
        val r = sig.select(xxhash64(col("key") +: mh: _*).as("h"))
          .agg(expr("bit_xor(h)").as("cs"), count(lit(1)).as("n")).head()
        (r.getLong(0), r.getLong(1))
      }
      def opRun(name: String, d: DataFrame): (Long, Long) = name match {
        case "exact" =>
          val r = Dedup.exact(d, "doc_id", "text")
            .select(xxhash64(col("doc_id"), col("canonical"), col("group_size")).as("h"))
            .agg(expr("bit_xor(h)").as("cs"), count(lit(1)).as("n")).head()
          (r.getLong(0), r.getLong(1))
        case "exact_xx" =>
          val r = Dedup.exactXx(d, "doc_id", "text")
            .select(xxhash64(col("doc_id"), col("canonical"), col("group_size")).as("h"))
            .agg(expr("bit_xor(h)").as("cs"), count(lit(1)).as("n")).head()
          (r.getLong(0), r.getLong(1))
        case "minhash" => sigChecksum(d)
        case "lsh" =>
          val r = Dedup.lshCandidates(d, "doc_id", "text", N, RowsPerBand,
              hashing = XxHashing)
            .select(xxhash64(col("a"), col("b"), col("n_shared_bands")).as("h"))
            .agg(expr("bit_xor(h)").as("cs"), count(lit(1)).as("n")).head()
          (r.getLong(0), r.getLong(1))
        case "simhash" =>
          val r = Dedup.simHash(d, "doc_id", "text", bits = 64, hashing = XxHashing)
            .select(xxhash64(col("key"), col("simhash")).as("h"))
            .agg(expr("bit_xor(h)").as("cs"), count(lit(1)).as("n")).head()
          (r.getLong(0), r.getLong(1))
        case other => sys.error(s"unknown op $other")
      }

      // warm codegen + C2 on every executor JVM with a small prefix
      val warm = docs.limit(20000).repartition(parts).cache()
      warm.count()
      ops.foreach(op => opRun(op, warm))
      warm.unpersist(true)

      val listener = new BenchShared.CpuListener
      spark.sparkContext.addSparkListener(listener)
      for (op <- ops) {
        val pre = BenchShared.stealSecs()
        val cpu0 = listener.cpuNanos.get()
        val t0 = System.nanoTime()
        val (cs, n) = opRun(op, docs)
        val wall = (System.nanoTime() - t0) / 1e9
        val steal = BenchShared.stealFraction(pre, wall)
        val cpuSecs = (listener.cpuNanos.get() - cpu0) / 1e9
        println(f"DEDUPRUN op=$op spec=$spec cores=$cores parts=$parts docs=$nDocs " +
          f"tokens=$nTokens wall=$wall%.2f tokps=${nTokens / wall}%.0f cpu=$cpuSecs%.1f " +
          f"steal=$steal%.3f rows=$n checksum=$cs")
      }
      spark.stop()

    case other => sys.error(s"unknown subcommand $other (gen|run)")
  }
}
