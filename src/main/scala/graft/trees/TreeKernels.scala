package graft.trees

import scala.collection.mutable
import scala.util.Random

/** Per-graph tree kernels (pure Scala, applied per graph of a transactional
  * graph DB via grouped map — the reference's per-graph operators that are
  * inherently sequential on one small graph but embarrassingly parallel
  * across the millions of graphs of a DB):
  *
  *  - canonical string of rooted/free labeled trees (reference
  *    `cs_Tree.c:24-126` canonicalStringOfRootedTree / `:342`
  *    canonicalStringOfTree: recursive sort of child strings; free tree =
  *    lexicographic min over the 1-2 tree-center roots, centers via
  *    iterative leaf-stripping, reference `treeCenter.c:133-168`),
  *  - spanning-tree sampling: Wilson's loop-erased random walks (reference
  *    `wilsonsAlgorithm.c:113,138`) and Kruskal on a seeded edge shuffle
  *    (reference `kruskalsAlgorithm.c:45`, shuffle `sampleSubtrees.c:96-112`),
  *    both seeded and reproducible.
  */
object TreeKernels {

  type Edge = (Long, Long)

  private def adjacency(edges: Seq[Edge]): Map[Long, Seq[Long]] =
    edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).sorted }

  /** Canonical string of the tree rooted at `root`: label, then the
    * lexicographically sorted child canonical strings each wrapped in
    * parentheses — `label(childCs)(childCs)...` */
  def canonicalStringRooted(edges: Seq[Edge], labels: Map[Long, String], root: Long): String = {
    val adj = adjacency(edges)
    def rec(v: Long, parent: Long): String = {
      val kids = adj.getOrElse(v, Nil).filter(_ != parent).map(c => rec(c, v)).sorted
      labels.getOrElse(v, "_") + kids.map(k => s"($k)").mkString
    }
    rec(root, -1L)
  }

  /** Tree centers via iterative leaf removal (1 or 2 vertices). */
  def treeCenters(edges: Seq[Edge]): Seq[Long] = {
    val adj = mutable.Map[Long, mutable.Set[Long]]()
    for ((a, b) <- edges.distinct if a != b) {
      adj.getOrElseUpdate(a, mutable.Set()) += b
      adj.getOrElseUpdate(b, mutable.Set()) += a
    }
    if (adj.isEmpty) return edges.headOption.map(_._1).toSeq
    var remaining = adj.keySet.to(mutable.Set)
    while (remaining.size > 2) {
      val leaves = remaining.filter(v => adj(v).count(remaining) <= 1).toSeq
      if (leaves.isEmpty) return remaining.toSeq.sorted // not a tree; degrade
      remaining --= leaves
    }
    remaining.toSeq.sorted
  }

  /** Canonical string of a free labeled tree: min over center roots
    * (reference `cs_Tree.c:342-366`). */
  def canonicalString(edges: Seq[Edge], labels: Map[Long, String]): String = {
    if (edges.isEmpty) return labels.toSeq.sortBy(_._1).headOption.map(_._2).getOrElse("")
    treeCenters(edges).map(c => canonicalStringRooted(edges, labels, c)).min
  }

  /** Wilson's algorithm: uniform random spanning tree via loop-erased random
    * walks; deterministic under `seed`. Returns tree edges (parent links). */
  def wilsonSpanningTree(edges: Seq[Edge], seed: Long): Seq[Edge] = {
    val adj = adjacency(edges)
    val verts = adj.keys.toSeq.sorted
    if (verts.isEmpty) return Nil
    val rnd = new Random(seed)
    val inTree = mutable.Set(verts.head)
    val next = mutable.Map[Long, Long]()
    for (start <- verts if !inTree(start)) {
      // random walk from start until hitting the tree, recording successors
      var v = start
      while (!inTree(v)) {
        val nbrs = adj(v)
        val w = nbrs(rnd.nextInt(nbrs.size))
        next(v) = w // loop erasure: later visits overwrite earlier successors
        v = w
      }
      // retrace the loop-erased path into the tree
      v = start
      while (!inTree(v)) {
        inTree += v
        v = next(v)
      }
    }
    // every vertex except the root ends in the tree with a parent link
    verts.filter(_ != verts.head).map(v => (v, next(v)))
  }

  /** Kruskal on a seeded Fisher–Yates edge shuffle -> random spanning forest
    * (reference `sampleSubtrees.c:96-166`). */
  def kruskalSpanningTree(edges: Seq[Edge], seed: Long): Seq[Edge] = {
    val rnd = new Random(seed)
    val es = rnd.shuffle(edges.distinct.filter(e => e._1 != e._2).toVector)
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val out = mutable.ArrayBuffer[Edge]()
    for ((a, b) <- es) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; out += ((a, b)) }
    }
    out.toSeq
  }

  /** Sample k spanning trees (Wilson) and count distinct isomorphism classes
    * via canonical strings — the `ts` pipeline (reference
    * `treeSamplingMain.c:297-303`: canonical string -> searchTree dedupe). */
  def distinctSpanningTreeCount(edges: Seq[Edge], labels: Map[Long, String], k: Int, seed: Long): (Long, Seq[String]) = {
    val strings = (0 until k).map { i =>
      canonicalString(wilsonSpanningTree(edges, seed + i), labels)
    }
    (strings.distinct.size.toLong, strings.distinct.sorted)
  }
}
