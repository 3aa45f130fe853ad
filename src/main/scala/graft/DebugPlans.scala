package graft

import org.apache.spark.sql.functions._

/** Scratch diagnostics: dump physical plans of the hot paths to confirm the
  * intended shapes (exchange reuse in the PageRank iteration, pushed filters
  * on parquet scans, broadcast of small dims). Not part of the library. */
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. PageRank single-iteration shape on a power-law table
    val edges = graft.fixtures.Generators.powerLawEdges(spark, 100000, 3, 42L)
    val e = graft.graph.GraphOps.canonicalEdges(edges)
    val odeg = e.groupBy("src").agg(count(lit(1)).as("odeg"))
    val links = e.join(odeg, "src").select(col("src"), col("dst"), col("odeg"))
      .repartition(8, col("src")).persist()
    links.count()
    val ranks = graft.graph.GraphOps.vertices(e)
      .select(col("vid"), lit(0.1).as("rank")).repartition(8, col("vid")).persist()
    ranks.count()
    val contribs = ranks.as("r").join(links.as("l"), col("r.vid") === col("l.src"))
      .groupBy(col("l.dst").as("vid"))
      .agg(sum(col("r.rank") / col("l.odeg")).as("contrib"))
    println("=== PageRank iteration plan ===")
    contribs.explain("formatted")

    // 2. parquet pushdown check
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    println("=== pushdown/pruning plan ===")
    li.select("l_orderkey", "l_quantity").where(col("l_quantity") > 30).explain("formatted")

    // 3. broadcast join check
    val o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val c = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    println("=== dim join plan ===")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey")).groupBy("c_nationkey")
      .agg(sum("o_totalprice")).explain("formatted")

    spark.stop()
  }
}
