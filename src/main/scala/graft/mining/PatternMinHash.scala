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
