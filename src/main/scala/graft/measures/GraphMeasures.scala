package graft.measures

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.algo.ConnectedComponents
import graft.graph.GraphOps

/** The `gf` tool re-expressed (SURVEY.md §2.2): per-graph measures over a
  * graph database, a comparator against a constant, and a projection.
  * The reference evaluates these one graph at a time
  * (`filter.c:386-533` processGraph / `:540` conditionHolds / `:569` output);
  * here a *graph database* is an edge table with a `graph_id` column and all
  * measures for all graphs are computed in one grouped pass — the
  * distributed analogue of the reference's per-graph pipeline loop.
  *
  * For the single web graph, pass a constant graph_id (or use the scalar
  * helpers in GraphOps/algo directly). */
object GraphMeasures {

  /** Comparators of `gf -c` (reference `filter.c:540-566`). */
  val comparators: Map[String, (Column, Long) => Column] = Map(
    "==" -> ((c, v) => c === v), "!=" -> ((c, v) => c =!= v),
    "<=" -> ((c, v) => c <= v), ">=" -> ((c, v) => c >= v),
    "<" -> ((c, v) => c < v), ">" -> ((c, v) => c > v))

  /** All cheap measures per graph in one pass:
    * numberOfVertices, numberOfEdges, minDegree, maxDegree,
    * numberOfConnectedComponents, connected, tree, path
    * (reference `filter.c:391-533`, `graph.c:611-650`, `outerplanar.c:11-37`,
    * `listComponents.c:306-319`). Input: edges(graph_id, src, dst),
    * undirected one-row-per-edge. */
  def measures(spark: SparkSession, edges: DataFrame): DataFrame = {
    val e = edges.select(col("graph_id"), col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val sym = e.union(e.select(col("graph_id"), col("dst").as("src"), col("src").as("dst"))).distinct()
    val deg = sym.groupBy("graph_id", "src").agg(count(lit(1)).as("degree"))
    val degStats = deg.groupBy("graph_id").agg(
      count(lit(1)).as("n"), min("degree").as("min_degree"), max("degree").as("max_degree"))
    val mStats = e.groupBy("graph_id").agg(count(lit(1)).as("m"))
    // CC per graph: reuse the global algorithm with graph-id-disjoint vids
    // (graph_id is folded into the vid space, then components counted back).
    // The packing is only injective for graph_id < 2^23 and vid < 2^40 —
    // fail loudly instead of silently colliding (ADVICE round 2).
    val lims = e.agg(max(col("graph_id").cast("long")).as("mg"),
      max(greatest(col("src"), col("dst"))).as("mv")).head()
    if (!lims.isNullAt(0))
      require(lims.getLong(0) < (1L << 23) && lims.getLong(1) < (1L << 40),
        s"GraphMeasures.measures: id packing needs graph_id < 2^23 and vid < 2^40 " +
          s"(got max graph_id=${lims.getLong(0)}, max vid=${lims.getLong(1)})")
    val packed = e.select((col("graph_id") * lit(1L << 40) + col("src")).as("src"),
      (col("graph_id") * lit(1L << 40) + col("dst")).as("dst"))
    val cc = ConnectedComponents.run(spark, packed)
      .select((col("vid") / lit(1L << 40)).cast("long").as("graph_id"), col("component"))
      .groupBy("graph_id").agg(countDistinct("component").as("n_components"))
    degStats.join(mStats, "graph_id").join(cc, "graph_id")
      .select(col("graph_id"), col("n"), col("m"), col("min_degree"), col("max_degree"),
        col("n_components"),
        (col("n_components") === 1).as("connected"),
        (col("n_components") === 1 && col("m") === col("n") - 1).as("tree"),
        (col("n_components") === 1 && col("m") === col("n") - 1 && col("max_degree") <= 2).as("path"))
  }

  /** Block-structure measures per graph (gf -f numberOfBiconnectedComponents
    * / numberOfBridges / maxBlockDegree / cactus / spanningTreeEstimate;
    * reference `listComponents.c:52-204`, `outerplanar.c:39`,
    * `upperBoundsForSpanningTrees.c:150`): Tarjan per graph via
    * [[graft.trees.GraphKernels]], parallel across graphs. */
  def blockMeasures(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    edges.select(col("graph_id").cast("long"), col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (gid, it) =>
        val s = graft.trees.GraphKernels.blockStats(it.map(t => (t._2, t._3)).toSeq)
        (gid, s.nBlocks, s.nBridges, s.nBiconnected, s.maxBlockDegree, s.minBlockDegree,
          s.isCactus, math.rint(s.spanningTreeEstimateLog * 1e6) / 1e6)
      }
      .toDF("graph_id", "n_blocks", "n_bridges", "n_biconnected",
        "max_block_degree", "min_block_degree", "is_cactus", "spanning_tree_estimate_log")
  }

  /** The full gf pipeline: measure -> comparator -> projection
    * (reference `filter.c` dispatch; `-o id|value|idAndValue`). */
  def gf(spark: SparkSession, edges: DataFrame, measure: String, cmp: String, value: Long,
      projection: Seq[String] = Seq("graph_id")): DataFrame =
    measures(spark, edges)
      .where(comparators(cmp)(col(measure), value))
      .select(projection.map(col): _*)
}
