package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** ANN / similarity-search queries over `embeddings` (vec_id, embedding
  * ARRAY<FLOAT>, label). DuckDB oracle: list_cosine_similarity /
  * list_dot_product on DOUBLE[] are bitwise-identical to the engine's
  * index-order double folds (verified), so rounded similarities and
  * hyperplane sign bits hash-match. The hyperplane-LSH queries embed the
  * SAME seeded ±1 matrix in the SQL as array literals, so the banding is
  * recomputed independently by the oracle. */
object SimilarityQueries {

  import Tables.t

  /** Embedding dimension of the driver's `embeddings` table (TESTDATA.md). */
  private val Dim = 64
  private val Seed = 2027L

  /** DuckDB sign-bit expression for one ±1 hyperplane row. */
  private def bitSql(row: Array[Double]): String = {
    val arr = row.map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ",", "]")
    s"(CASE WHEN list_dot_product(embedding::DOUBLE[], $arr::DOUBLE[]) > 0 THEN 1 ELSE 0 END)"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // brute-force cosine top-3 for the first 10 vectors
    "s_cosine_topk" -> ((s, dir) => {
      Similarity.bruteForceTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, k = 3)
        .select(col("qid").cast("long").as("qid"), col("rank"), col("nid").cast("long").as("nid"),
          round(col("sim"), 6).as("sim"))
        .orderBy("qid", "rank")
    }),

    // IVF-style: search only within the same (pre-existing label) bucket
    "s_cosine_bucketed" -> ((s, dir) => {
      Similarity.bucketedTopK(t(s, dir, "embeddings"), "vec_id", "embedding", "label",
          col("vec_id") < 10, k = 3)
        .select(col("qid").cast("long").as("qid"), col("rank"), col("nid").cast("long").as("nid"),
          round(col("sim"), 6).as("sim"))
        .orderBy("qid", "rank")
    }),

    // IVF with the engine's own bucket PRODUCER: 4 hyperplane sign bits
    // quantize the corpus into 16 coarse cells, then per-cell top-k
    "s_cosine_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val buckets = Similarity.hyperplaneBuckets(e, "vec_id", "embedding", bucketBits = 4,
        seed = Seed, dim = Dim)
      val withBucket = e.join(buckets.withColumnRenamed("id", "vec_id"), "vec_id")
      Similarity.bucketedTopK(withBucket, "vec_id", "embedding", "bucket",
          col("vec_id") < 10, k = 3)
        .select(col("qid").cast("long").as("qid"), col("rank"), col("nid").cast("long").as("nid"),
          round(col("sim"), 6).as("sim"))
        .orderBy("qid", "rank")
    }),

    // embedding near-duplicate pairs above a threshold, hyperplane-banded
    // (8 bands x 2 bits) then cosine-verified — no O(n^2) join
    "s_near_dup" -> ((s, dir) => {
      Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.5, nBits = 16, nBands = 8, seed = Seed, dim = Dim)
        .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"),
          round(col("sim"), 6).as("sim"))
        .orderBy("a", "b")
    })
  )

  private val simExpr = "list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[])"

  private def topkSql(candJoin: String): String =
    s"""WITH sims AS (
       |  SELECT q.vec_id AS qid, v.vec_id AS nid, $simExpr AS sim
       |  FROM $candJoin
       |  WHERE q.vec_id < 10),
       | ranked AS (SELECT qid, nid, sim,
       |              row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
       |            FROM sims)
       |SELECT qid::BIGINT AS qid, rank::BIGINT AS rank, nid::BIGINT AS nid, round(sim, 6) AS sim
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "s_cosine_topk" -> topkSql("embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id"),

    "s_cosine_bucketed" ->
      topkSql("embeddings q JOIN embeddings v ON v.label = q.label AND v.vec_id <> q.vec_id"),

    "s_cosine_ivf" -> {
      val m = Similarity.hyperplaneMatrix(4, Dim, Seed)
      val bucket = (0 until 4).map(j => s"${1 << j}*${bitSql(m(j))}").mkString(" + ")
      s"""WITH b AS (SELECT vec_id AS bvid, ($bucket) AS bucket FROM embeddings),
         | eb AS (SELECT e.*, b.bucket FROM embeddings e JOIN b ON b.bvid = e.vec_id),
         |${topkSql("eb q JOIN eb v ON v.bucket = q.bucket AND v.vec_id <> q.vec_id").drop(5)}""".stripMargin
    },

    "s_near_dup" -> {
      val m = Similarity.hyperplaneMatrix(16, Dim, Seed)
      val bandKeys = (0 until 8).map { b =>
        (0 until 2).map(r => s"${1 << r}*${bitSql(m(b * 2 + r))}").mkString(" + ")
      }
      val sigCols = bandKeys.zipWithIndex.map { case (k, b) => s"($k) AS b$b" }.mkString(", ")
      val bandUnion = (0 until 8).map(b => s"SELECT vec_id, $b AS band, b$b AS bkey FROM sig")
        .mkString("\n   UNION ALL ")
      s"""WITH sig AS (SELECT vec_id, $sigCols FROM embeddings),
         | bands AS (
         |   $bandUnion),
         | cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
         |          FROM bands l JOIN bands r
         |            ON l.band = r.band AND l.bkey = r.bkey AND l.vec_id < r.vec_id)
         |SELECT c.a::BIGINT AS a, c.b::BIGINT AS b,
         |  round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS sim
         |FROM cand c JOIN embeddings ea ON ea.vec_id = c.a JOIN embeddings eb ON eb.vec_id = c.b
         |WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) >= 0.5
         |ORDER BY a, b""".stripMargin
    }
  )
}
