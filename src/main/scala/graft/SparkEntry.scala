package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-coverage surface: every implemented operator
  * from SURVEY.md §2 (graph kernels, gf-style relational shapes, text/
  * dedup/similarity/event/multimodal pipelines) exposed as a DataFrame
  * program over the driver's parquet tables, with a DuckDB-runnable ANSI
  * SQL oracle in `oracleSql` (same column names, deterministic order). */
object SparkEntry {

  /** Flagship: full link-graph pipeline on the sf0.001 tables — derive the
    * co-supplier graph, run PageRank to 1e-6 convergence, return the ranked
    * vertex table (top pages by rank). */
  def entry(spark: SparkSession): DataFrame = {
    val edges = queries_internal.Tables.coSupplierEdges(spark, "/root/testdata/sf0.001")
    val result = graft.algo.PageRank.run(spark, edges, tol = 1e-6)
    result.ranks.orderBy(desc("rank"), asc("vid"))
  }

  // Renamed import indirection so `entry` reads clearly above.
  private object queries_internal { val Tables = graft.queries.Tables }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.GraphQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.MiningQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] =
    graft.queries.GraphQueries.oracleSql ++
      graft.queries.RelationalQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.SimilarityQueries.oracleSql ++
      graft.queries.EventQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.MiningQueries.oracleSql
}
