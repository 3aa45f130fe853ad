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

  /** Global triangle count (fixture goldens: K_n -> C(n,3), trees/paths -> 0).
    *
    * Counts WITHOUT materializing a row per triangle: the count equals the
    * summed intersection size over oriented edges, so the final
    * `explode(array_intersect)` of [[enumerate]] — which at sf0.1 produced
    * ~10^7 rows only to be counted — is replaced by `sum(size(...))` in the
    * same join (guide §1.1 first-principles: no pass over data the result
    * does not need). Identical value: explode emits exactly one row per
    * intersection element. */
  def globalCount(spark: SparkSession, edges: DataFrame): Long = {
    val adj = orient(spark, edges)
      .groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("nbrs"))
    adj.select(col("src"), explode(col("nbrs")).as("dst"), col("nbrs").as("unbrs"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("vnbrs")), "dst")
      .agg(coalesce(sum(size(array_intersect(col("unbrs"), col("vnbrs")))), lit(0L)).as("n"))
      .head().getLong(0)
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

  /** Triangle counts per UNORDERED vertex-label triple: (la, lb, lc, n) —
    * the input to label-multiset fingerprints (reference
    * `executables/patternExtractor.c:121-177` fingerprintTriple works per
    * enumerated triangle; at 10^8 triangles the labels must ride ALONG the
    * enumeration, not be joined onto it afterwards). The label alphabet is
    * collected into a tiny dictionary (the same bounded-alphabet contract
    * as the miner's frequent-edge list) and each neighbor is encoded as
    * `vid * K + labelId` so the adjacency arrays stay LONG arrays —
    * `array_intersect` keeps its specialized long fast path (struct
    * elements fall back to interpreted pairwise comparison, measured 10x+
    * slower). Only the <= |alphabet|^3 aggregated classes are decoded back
    * to strings. Requires non-negative vertex ids < 2^52 / K. */
  def labelTripleCounts(spark: SparkSession, edges: DataFrame, labels: DataFrame): DataFrame = {
    import spark.implicits._
    val lab = labels.select(col(labels.columns(0)).cast("long").as("vid"),
      col(labels.columns(1)).cast("string").as("lab"))
    val dict = lab.select("lab").distinct().orderBy("lab")
      .as[String].collect().zipWithIndex.toSeq
    val k = math.max(1, dict.size)
    val dictDF = dict.toDF("lab", "lid")
    val labeled = lab.join(broadcast(dictDF), "lab")
      .select(col("vid"), col("lid").cast("long").as("lid"))
    val adj = orient(spark, edges)
      .join(labeled.select(col("vid").as("dst"), col("lid").as("dlid")), "dst")
      .select(col("src"), (col("dst") * k + col("dlid")).as("enc"))
      .groupBy(col("src"))
      .agg(sort_array(collect_set(col("enc"))).as("nbrs"))
    val withSrcLid = adj.join(labeled.select(col("vid").as("src"), col("lid").as("slid")), "src")
    val counted = withSrcLid
      .select(col("slid"), explode(col("nbrs")).as("d"), col("nbrs").as("unbrs"))
      .select(col("slid"), pmod(col("d"), lit(k.toLong)).as("dlid"),
        expr(s"d DIV $k").as("dstv"), col("unbrs"))
      .join(adj.select(col("src").as("dstv"), col("nbrs").as("vnbrs")), "dstv")
      .select(col("slid"), col("dlid"),
        explode(array_intersect(col("unbrs"), col("vnbrs"))).as("w"))
      .select(col("slid"), col("dlid"), pmod(col("w"), lit(k.toLong)).as("wlid"))
      // sorted-triple key packed into ONE long (lo*k^2 + mid*k + hi): the
      // per-row hash-agg key stays primitive — no array allocation per
      // triangle on the 10^8-row stream
      .select((least(col("slid"), col("dlid"), col("wlid")) * (k.toLong * k) +
          (col("slid") + col("dlid") + col("wlid")
            - least(col("slid"), col("dlid"), col("wlid"))
            - greatest(col("slid"), col("dlid"), col("wlid"))) * k.toLong +
          greatest(col("slid"), col("dlid"), col("wlid"))).as("tkey"))
      .groupBy("tkey").agg(count(lit(1)).as("n"))
    val d = broadcast(dictDF.select(col("lab"), col("lid").cast("long").as("lid")))
    counted
      .select(expr(s"tkey DIV ${k.toLong * k}").as("l0"),
        pmod(expr(s"tkey DIV $k"), lit(k.toLong)).as("l1"),
        pmod(col("tkey"), lit(k.toLong)).as("l2"), col("n"))
      .join(d.select(col("lid").as("l0"), col("lab").as("la")), "l0")
      .join(d.select(col("lid").as("l1"), col("lab").as("lb")), "l1")
      .join(d.select(col("lid").as("l2"), col("lab").as("lc")), "l2")
      .select(col("la"), col("lb"), col("lc"), col("n"))
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
