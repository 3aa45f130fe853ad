package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Baseline: brute-force cosine top-k — a crossJoin whose inner product runs
  * entirely in codegen'd built-ins (`zip_with` + `aggregate`), no UDF.
  * Scale path: bucketed (IVF-style) search — restrict candidate pairs to a
  * coarse partition (here: a precomputed cluster/label column; at production
  * scale, k-means centroids assigned the same way), turning the O(n²)
  * crossJoin into a per-bucket join. LSH-style random-hyperplane bucketing
  * is [[graft.dedup.Dedup.simHash]] applied to quantized vectors. */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double
    * precision in array index order (portable across engines). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Brute-force top-k nearest neighbors for the query subset.
    * Output: (query_id, rank, neighbor_id, similarity). */
  def bruteForceTopK(
      vectors: DataFrame, idCol: String, vecCol: String,
      queryPredicate: Column, k: Int): DataFrame = {
    val v = vectors.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val q = v.where(queryPredicate).select(col("id").as("qid"), col("vec").as("qvec"))
    val sims = q.crossJoin(v)
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"), cosine(col("qvec"), col("vec")).as("sim"))
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
    val v = vectors.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
      col(bucketCol).as("bucket"))
    val q = v.where(queryPredicate)
      .select(col("id").as("qid"), col("vec").as("qvec"), col("bucket"))
    val sims = q.join(v, "bucket")
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"), cosine(col("qvec"), col("vec")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("sim"), asc("nid"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("sim"))
  }

  /** All pairs above a cosine threshold (embedding near-dup detection).
    * Brute force at test scale; bucket upstream at production scale. */
  def nearDupPairs(vectors: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val v = vectors.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    v.as("l").join(v.as("r"), col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        cosine(col("l.vec"), col("r.vec")).as("sim"))
      .where(col("sim") >= threshold)
  }
}
