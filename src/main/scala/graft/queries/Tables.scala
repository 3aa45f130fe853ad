package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access + shared SQL-derivable edge tables.
  *
  * Every graph query in the correctness gate derives its edge table from the
  * driver's parquet tables with a derivation that is itself expressible in
  * ANSI SQL, so the full pipeline (derivation + algorithm) has a DuckDB
  * oracle. Vertex-id spaces are kept disjoint with the 2k / 2k+1 trick where
  * two entity types share a graph. */
object Tables {

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Undirected co-supplier graph: suppliers linked iff they supply the same
    * order. Mirrors the reference's "neighborhood generator" shape (reference
    * `executables/neighborhoodGenerator.c`): a self-join on a shared center.
    * ~100 vertices at any SF (supplier count scales slowly), dense. */
  def coSupplierEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val a = li.as("a")
    val b = li.as("b")
    a.join(b, col("a.l_orderkey") === col("b.l_orderkey") && col("a.l_suppkey") < col("b.l_suppkey"))
      .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
      .distinct()
  }

  val coSupplierSql: String =
    """SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey""".stripMargin

  /** Directed customer -> nation star forest (disjoint id spaces via 2k/2k+1):
    * exactly one out-edge per customer, nations are dangling sinks — exercises
    * dangling-mass redistribution and gives one component per nation. */
  def custNationEdges(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .select((col("c_custkey") * 2).as("src"), (col("c_nationkey").cast("long") * 2 + 1).as("dst"))
      .distinct()

  val custNationSql: String =
    "SELECT DISTINCT c_custkey*2 AS src, c_nationkey::BIGINT*2+1 AS dst FROM customer"
}
