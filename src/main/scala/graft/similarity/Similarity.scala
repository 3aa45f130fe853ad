package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Baseline: brute-force cosine top-k — all-pairs dot products with
  * pre-normalized vectors (norms computed once per row, not per pair).
  * The non-equi self-join plans as a broadcast nested-loop join; the probe
  * side is explicitly repartitioned so the quadratic work spreads across
  * all cores (a 1-file parquet scan would otherwise run it in ONE task).
  * Scale path: bucketed (IVF-style) search — restrict candidate pairs to a
  * coarse partition (a precomputed cluster/label column; at production
  * scale, k-means centroids assigned the same way), turning the O(n²) join
  * into a per-bucket equi-join. LSH-style random-hyperplane bucketing is
  * [[graft.dedup.Dedup.simHash]] applied to quantized vectors. */
object Similarity {

  import graft.functions.VectorFunctions.fastDot

  /** Cosine similarity of two float-array columns, computed in double
    * precision in array index order (portable across engines: bitwise equal
    * to DuckDB's list_cosine_similarity on DOUBLE[]). Backed by the native
    * codegen'd [[graft.functions.DotProduct]] expression — FP-identical to
    * the `aggregate(zip_with(...))` formulation it replaced, minus the
    * per-element interpreted-lambda dispatch. */
  def cosine(a: Column, b: Column): Column =
    fastDot(a, b) / (sqrt(fastDot(a, a)) * sqrt(fastDot(b, b)))

  /** Plain double-precision dot product in index order. */
  def dot(a: Column, b: Column): Column = fastDot(a, b)

  /** (id, vec ARRAY<DOUBLE> normalized to unit length). cosine(a,b) ==
    * dot(norm(a), norm(b)) exactly when each element is divided by the same
    * double norm — matches the [[cosine]]/DuckDB formulation only up to FP
    * association, so oracle-checked queries use [[cosine]]; [[normalized]]
    * is the throughput path. */
  def normalized(vectors: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val nrm = sqrt(fastDot(col(vecCol), col(vecCol)))
    vectors.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => x.cast("double") / nrm).as("vec"))
  }

  private def parallelism(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Brute-force top-k nearest neighbors for the query subset.
    * Output: (query_id, rank, neighbor_id, similarity). */
  def bruteForceTopK(
      vectors: DataFrame, idCol: String, vecCol: String,
      queryPredicate: Column, k: Int): DataFrame = {
    val v = withNorm(vectors, idCol, vecCol, "id", "vec", "nrm")
      .repartition(parallelism(vectors))
    val q = withNorm(vectors.where(queryPredicate), idCol, vecCol, "qid", "qvec", "qnrm")
    // broadcast the (small) query side; corpus side stays partitioned so the
    // quadratic probe work is spread across cores. Norms are computed once
    // per ROW (FP-identical to per-pair recomputation), so each pair costs
    // one dot product instead of three array folds.
    val sims = v.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"),
        (dotCast(col("qvec"), col("vec")) / (col("qnrm") * col("nrm"))).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("sim"), asc("nid"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("sim"))
  }

  /** IVF-style bucketed ANN: only compare vectors sharing `bucketCol`.
    * Same output shape as [[bruteForceTopK]]; recall < 1 by design. */
  def bucketedTopK(
      vectors: DataFrame, idCol: String, vecCol: String, bucketCol: String,
      queryPredicate: Column, k: Int): DataFrame = {
    val v = withNorm(vectors.withColumn("bucket", col(bucketCol)), idCol, vecCol, "id", "vec", "nrm", keep = Seq("bucket"))
      .repartition(parallelism(vectors), col("bucket"))
    val q = withNorm(vectors.withColumn("bucket", col(bucketCol)).where(queryPredicate),
      idCol, vecCol, "qid", "qvec", "qnrm", keep = Seq("bucket"))
    val sims = v.join(broadcast(q), "bucket")
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"),
        (dotCast(col("qvec"), col("vec")) / (col("qnrm") * col("nrm"))).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("sim"), asc("nid"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("sim"))
  }

  /** Deterministic ±1 random-hyperplane matrix (`nBits` rows × `dim`),
    * shared by the Spark operators and the generated SQL oracles so both
    * sides compute identical sign bits. Prefix-stable: the first k rows for
    * a given seed are the same for every nBits >= k. */
  def hyperplaneMatrix(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Sign bit per hyperplane: 1 iff <vec, m_j> > 0, as an index-order double
    * fold (FP-identical to DuckDB's list_dot_product on DOUBLE[], the same
    * compatibility contract the cosine oracles rely on). */
  def signBits(vecCol: Column, m: Array[Array[Double]]): Seq[Column] =
    m.toSeq.map { row =>
      when(fastDot(vecCol, lit(row)) > 0, lit(1)).otherwise(lit(0))
    }

  /** IVF-style coarse bucket assignment — the producer of the bucket column
    * [[bucketedTopK]] consumes: bucket id = the integer formed by the first
    * `bucketBits` hyperplane sign bits (random-hyperplane quantization; the
    * seeded, data-independent analogue of k-means centroids, reproducible in
    * plain SQL). Output: (id, bucket). */
  def hyperplaneBuckets(vectors: DataFrame, idCol: String, vecCol: String,
      bucketBits: Int, seed: Long, dim: Int = -1): DataFrame = {
    val d = resolveDim(vectors, vecCol, dim)
    val bits = signBits(col(vecCol), hyperplaneMatrix(bucketBits, d, seed))
    val bucket = bits.zipWithIndex.map { case (b, i) => b * lit(1 << i) }.reduce(_ + _)
    vectors.select(col(idCol).cast("long").as("id"), bucket.cast("long").as("bucket"))
  }

  /** All pairs above a cosine threshold (embedding near-dup detection),
    * banded: candidate pairs only ever meet inside a hyperplane-sign band
    * bucket (`nBands` bands of `nBits/nBands` sign bits — the SimHash-style
    * prefilter of [[graft.dedup.Dedup.lshCandidates]]), then each candidate
    * is verified with the exact cosine via two equi-joins back to the
    * vectors. No broadcast of the corpus and no O(n²) join anywhere
    * (round-2's scale-killer); recall < 1 by LSH design, tunable with
    * nBits/nBands. */
  def nearDupPairs(vectors: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nBits: Int = 16, nBands: Int = 8, seed: Long = 2027L, dim: Int = -1,
      maxBucketSize: Long = 100000L): DataFrame = {
    // Banding feeds three plan branches (bucket sizes + both sides of the
    // self-join); persist the metadata-only (id, band, bkey) frame so the
    // per-vector hyperplane projections run once, spread across the session
    // parallelism when the source scan has fewer splits than cores (same
    // round-6 discipline as Dedup.lshCandidates).
    val bandRows0 = hyperplaneBandRows(graft.dedup.Dedup.fanOut(vectors, idCol),
        idCol, vecCol, nBits, nBands, seed, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bucket-size cap: a degenerate band key shared by f vectors would make
    // one bucket an f² self-join; drop buckets past the cap BEFORE joining
    // (same discipline as Dedup.lshCandidates — the explicit bound the
    // silent-cap rule demands; recall loss only on clusters that already
    // exceeded the cap in EVERY band). Not silent: the plan observes the
    // dropped-bucket count and the session listener warns when it is
    // non-zero (round-4 ADVICE); audit the buckets themselves with
    // [[oversizedBandBuckets]].
    val sizes = graft.dedup.Dedup.observeDropped(vectors.sparkSession,
      bandRows0.groupBy("band", "bkey").agg(count(lit(1)).as("bn")), maxBucketSize)
    val small = sizes.where(col("bn") <= maxBucketSize).select("band", "bkey")
    val bandRows = bandRows0.join(small, Seq("band", "bkey"), "left_semi")
    val cand = bandRows.as("l").join(bandRows.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
    val v = withNorm(vectors, idCol, vecCol, "id", "vec", "nrm")
    cand
      .join(v.select(col("id").as("a"), col("vec").as("va"), col("nrm").as("na")), "a")
      .join(v.select(col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb")), "b")
      .select(col("a"), col("b"),
        (dotCast(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** The hyperplane-sign band buckets [[nearDupPairs]]'s cap would drop at
    * `maxBucketSize`: (band, bkey, bn) with bn > cap — the audit surface
    * matching [[graft.dedup.Dedup.oversizedLshBuckets]]. */
  def oversizedBandBuckets(vectors: DataFrame, idCol: String, vecCol: String,
      nBits: Int = 16, nBands: Int = 8, seed: Long = 2027L, dim: Int = -1,
      maxBucketSize: Long = 100000L): DataFrame =
    hyperplaneBandRows(vectors, idCol, vecCol, nBits, nBands, seed, dim)
      .groupBy("band", "bkey").agg(count(lit(1)).as("bn"))
      .where(col("bn") > maxBucketSize)

  /** (id, band, bkey) rows — the shared banding of [[nearDupPairs]] and
    * [[oversizedBandBuckets]]. */
  private def hyperplaneBandRows(vectors: DataFrame, idCol: String, vecCol: String,
      nBits: Int, nBands: Int, seed: Long, dim: Int): DataFrame = {
    require(nBits % nBands == 0, "nBits must be a multiple of nBands")
    val d = resolveDim(vectors, vecCol, dim)
    val bits = signBits(col(vecCol), hyperplaneMatrix(nBits, d, seed))
    val rpb = nBits / nBands
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        (0 until rpb).map(r => bits(b * rpb + r) * lit(1 << r)).reduce(_ + _).as("bkey"))
    }
    vectors
      .select(col(idCol).cast("long").as("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  /** Vector dimension: the caller-supplied value when >= 0, else a one-row
    * probe job. Operators take `dim` explicitly so steady-state pipelines
    * (dim is static in any real embedding table) never pay the probe
    * (ADVICE r3: one extra tiny job per call). */
  private def resolveDim(vectors: DataFrame, vecCol: String, dim: Int): Int =
    if (dim >= 0) dim else vectors.select(size(col(vecCol))).head().getInt(0)

  /** (idAs, vecAs, nrmAs): id cast long, raw float vec, double norm —
    * the per-row precompute shared by the pairwise operators. */
  private def withNorm(vectors: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, nrmAs: String, keep: Seq[String] = Nil): DataFrame =
    vectors.select(Seq(col(idCol).cast("long").as(idAs), col(vecCol).as(vecAs),
      sqrt(fastDot(col(vecCol), col(vecCol))).as(nrmAs)) ++ keep.map(col): _*)

  /** Double-precision dot product of float arrays in index order. */
  private def dotCast(a: Column, b: Column): Column = fastDot(a, b)
}
