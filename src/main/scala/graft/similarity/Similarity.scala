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

  /** Cosine similarity of two float-array columns, computed in double
    * precision in array index order (portable across engines: bitwise equal
    * to DuckDB's list_cosine_similarity on DOUBLE[]). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Plain double-precision dot product in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** (id, vec ARRAY<DOUBLE> normalized to unit length). cosine(a,b) ==
    * dot(norm(a), norm(b)) exactly when each element is divided by the same
    * double norm — matches the [[cosine]]/DuckDB formulation only up to FP
    * association, so oracle-checked queries use [[cosine]]; [[normalized]]
    * is the throughput path. */
  def normalized(vectors: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val nrm = sqrt(aggregate(transform(col(vecCol), x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
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

  /** All pairs above a cosine threshold (embedding near-dup detection).
    * Brute force at test scale (partitioned left × broadcast right, so the
    * O(n²) probe parallelizes); bucket upstream at production scale. */
  def nearDupPairs(vectors: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val v = withNorm(vectors, idCol, vecCol, "id", "vec", "nrm")
    val l = v.repartition(parallelism(vectors))
    l.as("l").join(broadcast(v.as("r")), col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        (dotCast(col("l.vec"), col("r.vec")) / (col("l.nrm") * col("r.nrm"))).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** (idAs, vecAs, nrmAs): id cast long, raw float vec, double norm —
    * the per-row precompute shared by the pairwise operators. */
  private def withNorm(vectors: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, nrmAs: String, keep: Seq[String] = Nil): DataFrame =
    vectors.select(Seq(col(idCol).cast("long").as(idAs), col(vecCol).as(vecAs),
      sqrt(aggregate(transform(col(vecCol), x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, v) => acc + v)).as(nrmAs)) ++ keep.map(col): _*)

  /** Double-precision dot product of float arrays in index order. */
  private def dotCast(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
}
