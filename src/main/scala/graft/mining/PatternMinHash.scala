package graft.mining

import scala.collection.mutable
import scala.util.Random

/** Min-hash sketches over a pattern POSET (reference `minhashing.c:124-444`
  * buildMinHashEvaluationPlan / updateEvaluationPlan; Welke et al.,
  * "Probabilistic frequent subtrees"): given K seeded permutations of a
  * pattern set partially ordered by the sub-pattern relation, a graph's
  * sketch is, per permutation, the FIRST pattern that embeds. Evaluation
  * exploits the poset: a positive embedding marks all sub-patterns positive,
  * a negative embedding marks all super-patterns negative, so most entries
  * are decided without running the embedding oracle (the reference's
  * posetPermutationMark / evaluation-plan propagation).
  *
  * The pattern universe here is the level-1/2 slice of the poset (vertex
  * labels and single labeled edges) over the fixed TPC-H label domains —
  * data-independent, so the permutations are reproducible constants and the
  * whole sketch has a closed-form SQL oracle. The embedding oracle itself is
  * general (label containment / edge match in either orientation on an
  * arbitrary labeled graph).
  */
object PatternMinHash {

  /** Fixed label domains (TPC-H): order status, line status, return flag. */
  val statusLabels: Seq[String] = Seq("F", "O", "P")
  val lsLabels: Seq[String] = Seq("F", "O")
  val rfLabels: Seq[String] = Seq("A", "N", "R")

  /** Universe ids: 0..5 vertex-label patterns, 6..23 edge patterns
    * (status s --ls e--> returnflag f, enumerated s-major). */
  val vertexPatterns: Seq[String] = statusLabels ++ rfLabels
  val edgePatterns: Seq[(String, String, String)] =
    for { s <- statusLabels; e <- lsLabels; f <- rfLabels } yield (s, e, f)
  val universeSize: Int = vertexPatterns.size + edgePatterns.size

  /** Sub-pattern ids (vertex labels) of an edge pattern id. */
  private def subPatterns(pid: Int): Seq[Int] = {
    val (s, _, f) = edgePatterns(pid - vertexPatterns.size)
    Seq(vertexPatterns.indexOf(s), vertexPatterns.indexOf(f)).filter(_ >= 0).distinct
  }

  /** Super-pattern ids (edge patterns) of a vertex-label pattern id. */
  private def superPatterns(pid: Int): Seq[Int] = {
    val l = vertexPatterns(pid)
    edgePatterns.zipWithIndex.collect {
      case ((s, _, f), i) if s == l || f == l => i + vertexPatterns.size
    }
  }

  /** K seeded Fisher–Yates permutations of the universe (reference
    * `minhashing.c` getRandomPermutation analogue; Scala's Random.shuffle). */
  def permutations(k: Int, seed: Long): Seq[Seq[Int]] =
    (0 until k).map(i => new Random(seed + i).shuffle((0 until universeSize).toList))

  /** Sketch of one labeled graph: per permutation, the first embedding
    * pattern id (-1 if none). `edges` are (srcLabel, dstLabel, edgeLabel)
    * triples; matching is orientation-free like the free miner.
    * Returns (sketch, embeddingOracleCalls) — the call count witnesses the
    * poset pruning in tests. */
  def sketchCounted(vlabels: Seq[String], edges: Seq[(String, String, String)],
      perms: Seq[Seq[Int]]): (Seq[Int], Int) = {
    val known = mutable.Map[Int, Boolean]()
    var calls = 0
    val vset = vlabels.toSet
    def oracle(pid: Int): Boolean = {
      calls += 1
      if (pid < vertexPatterns.size) vset.contains(vertexPatterns(pid))
      else {
        val (s, e, f) = edgePatterns(pid - vertexPatterns.size)
        edges.exists { case (a, b, el) =>
          el == e && ((a == s && b == f) || (a == f && b == s))
        }
      }
    }
    def contains(pid: Int): Boolean = known.get(pid) match {
      case Some(v) => v
      case None =>
        val v = oracle(pid)
        known(pid) = v
        // poset propagation (posetPermutationMark): positive -> all
        // sub-patterns positive; negative -> all super-patterns negative
        if (pid >= vertexPatterns.size) {
          if (v) subPatterns(pid).foreach(known.getOrElseUpdate(_, true))
        } else {
          if (!v) superPatterns(pid).foreach(known.getOrElseUpdate(_, false))
        }
        v
    }
    (perms.map(p => p.find(contains).getOrElse(-1)), calls)
  }

  def sketch(vlabels: Seq[String], edges: Seq[(String, String, String)],
      perms: Seq[Seq[Int]]): Seq[Int] = sketchCounted(vlabels, edges, perms)._1

  // ------------------------------------------------- poset path-cover plan

  /** Cover relations of the pattern poset (sub-pattern -> super-pattern). */
  def posetCoverEdges: Seq[(Int, Int)] =
    (vertexPatterns.size until universeSize).flatMap(e => subPatterns(e).map(v => (v, e)))

  /** Minimum path cover of a DAG (reference `poset_pathCover.c:250`
    * getPathCoverOfPosetUsingAugmentingPaths): by König/Dilworth the
    * minimum number of vertex-disjoint paths covering a DAG is
    * n − maxMatching on the edge-split bipartite graph; the augmenting-path
    * matching's `next` pointers ARE the paths. Paths run small→large in the
    * poset, so embedding is monotone non-increasing along each. */
  def pathCover(n: Int, dagEdges: Seq[(Int, Int)]): Seq[Seq[Int]] = {
    val adj = dagEdges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.sorted }
    val matchR = Array.fill(n)(-1) // successor vertex -> its path predecessor
    def augment(u: Int, seen: Array[Boolean]): Boolean =
      adj.getOrElse(u, Nil).exists { v =>
        !seen(v) && {
          seen(v) = true
          if (matchR(v) < 0 || augment(matchR(v), seen)) { matchR(v) = u; true }
          else false
        }
      }
    for (u <- 0 until n) augment(u, Array.fill(n)(false))
    val next = Array.fill(n)(-1)
    for (v <- 0 until n if matchR(v) >= 0) next(matchR(v)) = v
    val hasPred = Array.fill(n)(false)
    for (v <- 0 until n if matchR(v) >= 0) hasPred(v) = true
    (0 until n).filter(!hasPred(_)).map { head =>
      val path = mutable.ArrayBuffer[Int](head)
      var cur = head
      while (next(cur) >= 0) { cur = next(cur); path += cur }
      path.toSeq
    }
  }

  /** Sketch via the STATIC PATH-COVER evaluation plan (reference
    * `poset_pathCover.c:722` staticPathCoverEmbeddingForTrees +
    * `:505` binarySearchEvaluation): the poset is covered once by minimum
    * chains; per graph each chain is resolved with a BINARY SEARCH for the
    * largest embedding prefix (embedding is downward closed, hence monotone
    * along a chain), giving the full embedding set in
    * O(#chains · log |chain|) oracle calls; the per-permutation minima are
    * then free. Returns (sketch, oracleCalls). */
  def sketchByPathCoverCounted(vlabels: Seq[String], edges: Seq[(String, String, String)],
      perms: Seq[Seq[Int]]): (Seq[Int], Int) = {
    var calls = 0
    val vset = vlabels.toSet
    def oracle(pid: Int): Boolean = {
      calls += 1
      if (pid < vertexPatterns.size) vset.contains(vertexPatterns(pid))
      else {
        val (s, e, f) = edgePatterns(pid - vertexPatterns.size)
        edges.exists { case (a, b, el) =>
          el == e && ((a == s && b == f) || (a == f && b == s))
        }
      }
    }
    val contained = Array.fill(universeSize)(false)
    for (path <- pathCover(universeSize, posetCoverEdges)) {
      var lo = 0; var hi = path.size - 1; var boundary = -1
      while (lo <= hi) {
        val mid = (lo + hi) / 2
        if (oracle(path(mid))) { boundary = mid; lo = mid + 1 } else hi = mid - 1
      }
      for (i <- 0 to boundary) contained(path(i)) = true
    }
    (perms.map(p => p.find(contained).getOrElse(-1)), calls)
  }

  def sketchByPathCover(vlabels: Seq[String], edges: Seq[(String, String, String)],
      perms: Seq[Seq[Int]]): Seq[Int] = sketchByPathCoverCounted(vlabels, edges, perms)._1

  /** DuckDB oracle for the star-DB sketch query: containment sets via joins
    * against the (constant) pattern tables, then per permutation the
    * contained pattern with the minimum position. `starSql` must define
    * o8(gid, c), li8(gid, ln, c, e, f). */
  def oracleSql(k: Int, seed: Long, starSql: String): String = {
    val vpat = vertexPatterns.zipWithIndex
      .map { case (l, i) => s"($i, '$l')" }.mkString(", ")
    val epat = edgePatterns.zipWithIndex
      .map { case ((s, e, f), i) => s"(${i + vertexPatterns.size}, '$s', '$e', '$f')" }.mkString(", ")
    val permRows = permutations(k, seed).zipWithIndex.flatMap { case (p, pi) =>
      p.zipWithIndex.map { case (pid, pos) => s"($pi, $pos, $pid)" }
    }.mkString(", ")
    s"""WITH $starSql,
       |vpat(id, l) AS (VALUES $vpat),
       |epat(id, s, e, f) AS (VALUES $epat),
       |perms(perm, pos, id) AS (VALUES $permRows),
       |cont AS (
       |  SELECT gid, vp.id FROM o8 JOIN vpat vp ON o8.c = vp.l
       |  UNION SELECT gid, vp.id FROM li8 JOIN vpat vp ON li8.f = vp.l
       |  UNION SELECT gid, ep.id FROM li8 JOIN epat ep
       |        ON li8.c = ep.s AND li8.e = ep.e AND li8.f = ep.f
       |  UNION SELECT gid, ep.id FROM li8 JOIN epat ep
       |        ON li8.c = ep.f AND li8.e = ep.e AND li8.f = ep.s)
       |SELECT gid AS graph_id, perm::BIGINT AS perm, arg_min(id, pos)::BIGINT AS pattern_id
       |FROM cont JOIN perms USING (id)
       |GROUP BY gid, perm ORDER BY graph_id, perm""".stripMargin
  }
}
