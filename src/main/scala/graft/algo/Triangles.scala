package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Triangle counting via degree-oriented sorted-adjacency intersection
  * (SURVEY.md §2.8.3; BASELINE.json north_rule).
  *
  * Reference semantics: wedge-check enumeration — for each center u, each
  * neighbor pair (v,w), test edge (v,w) (reference `graph.c:105-123`
  * `commonNeighborCount`; reference `executables/patternExtractor.c:267-295`,
  * where each closed triangle is found three times, once per center). The
  * distributed analogue orients each undirected edge from the endpoint with
  * lower (degree, vid) to the higher one, so every triangle is counted
  * exactly once and no vertex scans more than O(sqrt(m)) oriented neighbors —
  * the standard mitigation for power-law hubs (the oriented out-degree of a
  * hub is small because almost all its neighbors have lower degree).
  */
object Triangles {

  /** Oriented edges: src -> dst iff (deg(src), src) < (deg(dst), dst). */
  private def orient(spark: SparkSession, edges: DataFrame): DataFrame = {
    val sym = GraphOps.symmetrize(edges)
    val deg = sym.groupBy(col("src").as("vid")).agg(count(lit(1)).as("deg"))
    sym
      .join(deg.select(col("vid").as("src"), col("deg").as("sdeg")), "src")
      .join(deg.select(col("vid").as("dst"), col("deg").as("ddeg")), "dst")
      .where(struct(col("sdeg"), col("src")) < struct(col("ddeg"), col("dst")))
      .select(col("src"), col("dst"))
  }

  /** All triangles as canonical (a, b, c) rows (each exactly once).
    *
    * No persist: the oriented edge list is DERIVED from the adjacency
    * aggregate by explode, so the aggregate subtree appears exactly twice
    * with an identical child exchange and Catalyst's ReuseExchange computes
    * the upstream once (round 3 persisted `oriented`/`adj` here and never
    * unpersisted them — in a shared session the leaked blocks evicted other
    * queries' caches; a lazily returned frame cannot own cache cleanup). */
  def enumerate(spark: SparkSession, edges: DataFrame): DataFrame = {
    val adj = orient(spark, edges)
      .groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("nbrs"))
    // For each oriented edge (u,v): triangles through it are the common
    // oriented-out-neighbors of u and v.
    adj.select(col("src"), explode(col("nbrs")).as("dst"), col("nbrs").as("unbrs"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("vnbrs")), "dst")
      .select(col("src").as("a"), col("dst").as("b"),
        explode(array_intersect(col("unbrs"), col("vnbrs"))).as("c"))
  }

  /** Global triangle count (fixture goldens: K_n -> C(n,3), trees/paths -> 0). */
  def globalCount(spark: SparkSession, edges: DataFrame): Long = {
    val t = enumerate(spark, edges).count()
    t
  }

  /** Per-vertex triangle counts (vertices in no triangle get 0),
    * matching the reference's per-center counting divided by the 3x
    * multiplicity (reference `executables/patternExtractor.c:274-295`). */
  def perVertex(spark: SparkSession, edges: DataFrame): DataFrame = {
    // one pass over the (expensive) triangle enumeration: explode the three
    // corners in place instead of unioning three scans of it
    val counts = enumerate(spark, edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("vid"))
      .groupBy("vid")
      .agg(count(lit(1)).as("triangles"))
    GraphOps.vertices(GraphOps.canonicalEdges(edges))
      .join(counts, Seq("vid"), "left")
      .select(col("vid"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Common-neighbor count for each connected pair (reference
    * `graph.c:105-123` `commonNeighborCount`). */
  def commonNeighbors(spark: SparkSession, edges: DataFrame): DataFrame = {
    val sym = GraphOps.symmetrize(edges)
    val adj = sym.groupBy(col("src")).agg(sort_array(collect_set(col("dst"))).as("nbrs"))
    sym.where(col("src") < col("dst"))
      .join(adj.select(col("src"), col("nbrs").as("snbrs")), "src")
      .join(adj.select(col("src").as("dst"), col("nbrs").as("dnbrs")), "dst")
      .select(col("src"), col("dst"),
        size(array_intersect(col("snbrs"), col("dnbrs"))).as("common"))
  }
}
