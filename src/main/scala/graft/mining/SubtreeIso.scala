package graft.mining

import scala.collection.mutable

/** Labeled subtree-isomorphism kernel: does pattern tree P embed in target
  * forest T (label-preserving, injective)?
  *
  * Semantics mirror the reference's embedding operator for forest databases
  * (reference `lwm_embeddingOperators.c:43-55` subtreeOperator →
  * `iterativeSubtreeIsomorphism.c:293` iterativeSubtreeCheck): the classic
  * Shamir–Tsur DP — process pattern vertices bottom-up; a pattern vertex u
  * (entered from its parent) matches a target vertex v (entered from a given
  * neighbor) iff labels agree and the children of u can be injectively
  * assigned to distinct children of v via bipartite matching (reference
  * `bipartiteMatching.c:217-269` augmenting paths). Unrooted embedding =
  * exists a pattern root u0 and target vertex v0 with a rooted downward
  * embedding after rooting T anywhere (the image's highest vertex argument).
  *
  * Pure per-row kernel: patterns have ≤ maxPatternSize vertices and
  * transaction graphs are small, so this runs inside grouped-map/UDF calls —
  * embarrassingly parallel across the (pattern, graph) pairs of the mining
  * support relation, never on the driver.
  */
object SubtreeIso {

  /** Tree/forest as parallel arrays; vertices are 0-based ints local to the
    * row. Edge labels matter (reference cstring grammar includes them). */
  final case class LTree(vlabels: Array[String], edges: Array[(Int, Int, String)]) {
    val n: Int = vlabels.length
    lazy val adj: Array[List[(Int, String)]] = {
      val a = Array.fill(n)(List.empty[(Int, String)])
      for ((s, d, l) <- edges) { a(s) ::= (d, l); a(d) ::= (s, l) }
      a
    }
  }

  /** Maximum bipartite matching via augmenting paths (reference
    * `bipartiteMatching.c:217-269`); compat(i)(j) = left i can take right j. */
  private def maxMatching(nLeft: Int, nRight: Int, compat: (Int, Int) => Boolean): Int = {
    val matchR = Array.fill(nRight)(-1)
    def augment(i: Int, seen: Array[Boolean]): Boolean = {
      var j = 0
      while (j < nRight) {
        if (!seen(j) && compat(i, j)) {
          seen(j) = true
          if (matchR(j) < 0 || augment(matchR(j), seen)) { matchR(j) = i; return true }
        }
        j += 1
      }
      false
    }
    var size = 0
    for (i <- 0 until nLeft) if (augment(i, Array.fill(nRight)(false))) size += 1
    size
  }

  /** Does pattern P (a tree) embed into target T (a forest)? */
  def embeds(p: LTree, t: LTree): Boolean = {
    if (p.n == 0) return true
    if (p.n > t.n) return false
    if (p.n == 1) return t.vlabels.exists(_ == p.vlabels(0))

    // dp((u, pu), (v, pv)): pattern u entered from parent pu embeds at target
    // v entered from pv (pv = -1 means v is the top of the image).
    val memo = mutable.Map[(Int, Int, Int, Int), Boolean]()

    def matchAt(u: Int, pu: Int, v: Int, pv: Int): Boolean =
      memo.getOrElseUpdate((u, pu, v, pv), {
        if (p.vlabels(u) != t.vlabels(v)) false
        else {
          val pKids = p.adj(u).filter(_._1 != pu)
          val tKids = t.adj(v).filter(_._1 != pv)
          if (pKids.size > tKids.size) false
          else {
            val pk = pKids.toArray
            val tk = tKids.toArray
            maxMatching(pk.length, tk.length, (i, j) =>
              pk(i)._2 == tk(j)._2 && matchAt(pk(i)._1, u, tk(j)._1, v)) == pk.length
          }
        }
      })

    // Root the pattern at every vertex, try every target vertex as the image
    // of that root (image-top argument: some rooting makes the embedding
    // point strictly downward in T rooted anywhere — trying all (u0, v0)
    // pairs with pv = parent-used-below covers it because matchAt treats pv
    // only as the excluded neighbor; with pv = -1 nothing is excluded).
    var u0 = 0
    while (u0 < p.n) {
      var v0 = 0
      while (v0 < t.n) {
        if (matchAt(u0, -1, v0, -1)) return true
        v0 += 1
      }
      u0 += 1
    }
    false
  }

  /** Parse a canonical string back into a labeled tree — the reader side of
    * the cstring format (reference `cs_Parsing.c:131` parseCString,
    * `lwm_initAndCollect.c:214` getDBfromCanonicalStrings): grammar
    * `vlabel('('elabel' 'subtree')')*`, labels free of whitespace and `()$#`.
    * Inverse of [[canonicalString]] up to re-canonicalization. */
  def parseCanonicalString(s: String): LTree = {
    val vlabels = scala.collection.mutable.ArrayBuffer[String]()
    val edges = scala.collection.mutable.ArrayBuffer[(Int, Int, String)]()
    var i = 0
    def label(stops: Set[Char]): String = {
      val start = i
      while (i < s.length && !stops(s(i))) i += 1
      s.substring(start, i)
    }
    def subtree(): Int = {
      val v = vlabels.size
      vlabels += label(Set('(', ')'))
      while (i < s.length && s(i) == '(') {
        i += 1 // '('
        val el = label(Set(' '))
        i += 1 // ' '
        val c = subtree()
        edges += ((v, c, el))
        i += 1 // ')'
      }
      v
    }
    if (s.nonEmpty) subtree()
    LTree(vlabels.toArray, edges.toArray)
  }

  /** Canonical string of a labeled pattern tree INCLUDING edge labels:
    * rooted form `vlabel(elabel childCs)(elabel childCs)...` with children
    * sorted; free form = min over tree centers (reference `cs_Tree.c:24-126`,
    * `:342-366`; grammar `cs_Parsing.c:12-13`). */
  def canonicalString(tree: LTree): String = {
    if (tree.n == 0) return ""
    if (tree.edges.isEmpty) return tree.vlabels.min

    def rooted(v: Int, parent: Int): String = {
      val kids = tree.adj(v).filter(_._1 != parent)
        .map { case (c, el) => s"($el ${rooted(c, v)})" }.sorted
      tree.vlabels(v) + kids.mkString
    }

    // centers via leaf stripping, whole rounds at a time (all current leaves
    // removed together — the round semantics of reference treeCenter.c)
    val deg = Array.tabulate(tree.n)(i => tree.adj(i).size)
    val removed = Array.fill(tree.n)(false)
    var remaining = tree.n
    var frontier = (0 until tree.n).filter(deg(_) <= 1).toList
    while (remaining > 2 && frontier.nonEmpty) { // frontier empty => not a tree; degrade
      val next = mutable.ListBuffer[Int]()
      for (v <- frontier if !removed(v)) {
        removed(v) = true; remaining -= 1
        for ((w, _) <- tree.adj(v) if !removed(w)) {
          deg(w) -= 1
          if (deg(w) == 1) next += w
        }
      }
      frontier = next.toList
    }
    (0 until tree.n).filter(!removed(_)).map(rooted(_, -1)).min
  }
}
