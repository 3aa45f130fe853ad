package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** ANN / similarity-search queries over `embeddings` (vec_id, embedding
  * ARRAY<FLOAT>, label). DuckDB oracle: list_cosine_similarity on
  * DOUBLE[] is bitwise-identical to the engine's index-order double math
  * (verified), so rounded similarities hash-match. */
object SimilarityQueries {

  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // brute-force cosine top-3 for the first 10 vectors
    "s_cosine_topk" -> ((s, dir) => {
      Similarity.bruteForceTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, k = 3)
        .select(col("qid").cast("long").as("qid"), col("rank"), col("nid").cast("long").as("nid"),
          round(col("sim"), 6).as("sim"))
        .orderBy("qid", "rank")
    }),

    // IVF-style: search only within the same label bucket
    "s_cosine_bucketed" -> ((s, dir) => {
      Similarity.bucketedTopK(t(s, dir, "embeddings"), "vec_id", "embedding", "label",
          col("vec_id") < 10, k = 3)
        .select(col("qid").cast("long").as("qid"), col("rank"), col("nid").cast("long").as("nid"),
          round(col("sim"), 6).as("sim"))
        .orderBy("qid", "rank")
    }),

    // embedding near-duplicate pairs above a threshold
    "s_near_dup" -> ((s, dir) => {
      Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding", threshold = 0.5)
        .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"),
          round(col("sim"), 6).as("sim"))
        .orderBy("a", "b")
    })
  )

  private val simExpr = "list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[])"

  val oracleSql: Map[String, String] = Map(
    "s_cosine_topk" ->
      s"""WITH sims AS (
         |  SELECT q.vec_id AS qid, v.vec_id AS nid, $simExpr AS sim
         |  FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
         |  WHERE q.vec_id < 10),
         | ranked AS (SELECT qid, nid, sim,
         |              row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
         |            FROM sims)
         |SELECT qid::BIGINT AS qid, rank::BIGINT AS rank, nid::BIGINT AS nid, round(sim, 6) AS sim
         |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    "s_cosine_bucketed" ->
      s"""WITH sims AS (
         |  SELECT q.vec_id AS qid, v.vec_id AS nid, $simExpr AS sim
         |  FROM embeddings q JOIN embeddings v ON v.label = q.label AND v.vec_id <> q.vec_id
         |  WHERE q.vec_id < 10),
         | ranked AS (SELECT qid, nid, sim,
         |              row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
         |            FROM sims)
         |SELECT qid::BIGINT AS qid, rank::BIGINT AS rank, nid::BIGINT AS nid, round(sim, 6) AS sim
         |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    "s_near_dup" ->
      """SELECT a.vec_id::BIGINT AS a, b.vec_id::BIGINT AS b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.5
        |ORDER BY a, b""".stripMargin
  )
}
