package graft.trees

import scala.collection.mutable

/** Per-graph structural kernels beyond trees: biconnected components
  * (iterative Tarjan lowpoint DFS with an edge stack, mirroring reference
  * `listComponents.c:337-398` __tarjanFBC), and the block statistics the
  * `gf` tool derives from them (reference `listComponents.c:52-204`,
  * `outerplanar.c:39` isCactus, `upperBoundsForSpanningTrees.c:150`).
  * Sequential per graph (DFS is inherently so), parallel across the graphs
  * of a transactional DB — same execution shape as [[TreeKernels]]. */
object GraphKernels {

  type Edge = (Long, Long)

  /** Biconnected components as edge sets. Blocks with one edge are bridges
    * (reference: `m==1` blocks are bridges, `listComponents.c:413-451`). */
  def biconnectedComponents(edges: Seq[Edge]): Seq[Seq[Edge]] = {
    val es = edges.distinct.filter(e => e._1 != e._2)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val adj = mutable.Map[Long, mutable.ArrayBuffer[Long]]()
    for ((a, b) <- es) {
      adj.getOrElseUpdate(a, mutable.ArrayBuffer()) += b
      adj.getOrElseUpdate(b, mutable.ArrayBuffer()) += a
    }
    val verts = adj.keys.toSeq.sorted
    val num = mutable.Map[Long, Int]()
    val low = mutable.Map[Long, Int]()
    val parent = mutable.Map[Long, Long]()
    val estack = mutable.Stack[Edge]()
    val blocks = mutable.ArrayBuffer[Seq[Edge]]()
    var counter = 0

    def canon(a: Long, b: Long): Edge = (math.min(a, b), math.max(a, b))

    // iterative DFS (explicit stack of (vertex, neighbor-iterator position))
    for (root <- verts if !num.contains(root)) {
      val stack = mutable.Stack[(Long, Int)]((root, 0))
      num(root) = counter; low(root) = counter; counter += 1
      while (stack.nonEmpty) {
        val (v, i) = stack.pop()
        val nbrs = adj(v)
        if (i < nbrs.length) {
          stack.push((v, i + 1))
          val w = nbrs(i)
          if (!num.contains(w)) {
            estack.push(canon(v, w))
            parent(w) = v
            num(w) = counter; low(w) = counter; counter += 1
            stack.push((w, 0))
          } else if (num(w) < num(v) && w != parent.getOrElse(v, -1L)) {
            estack.push(canon(v, w))
            low(v) = math.min(low(v), num(w))
          }
        } else if (stack.nonEmpty) {
          // returning from v to its parent u
          val (u, _) = stack.top
          low(u) = math.min(low(u), low(v))
          if (low(v) >= num(u)) {
            // u is an articulation point (or root): pop the block of (u,v)
            val block = mutable.ArrayBuffer[Edge]()
            var done = false
            while (estack.nonEmpty && !done) {
              val e = estack.pop()
              block += e
              if (e == canon(u, v)) done = true
            }
            if (block.nonEmpty) blocks += block.toSeq
          }
        }
      }
    }
    blocks.toSeq
  }

  private def canonEdge(a: Long, b: Long): Edge = (math.min(a, b), math.max(a, b))

  /** Outerplanarity of a biconnected block via Mitchell's linear algorithm
    * (Mitchell 1979; reference `outerplanar.c:103-351` isOuterplanarBlock):
    * successively remove degree-2 vertices, triangulating their neighbor
    * pair when not adjacent; reject on edge excess (m > 2n-3), degree-2
    * starvation, an edge lying on more than two triangles, or a recorded
    * neighbor pair that never existed as a (possibly triangulation) edge. */
  def isOuterplanarBlock(blockEdges: Seq[Edge]): Boolean = {
    val es = blockEdges.distinct.filter(e => e._1 != e._2).map(e => canonEdge(e._1, e._2)).distinct
    if (es.size <= 1) return true // bridges / empty are outerplanar
    val adj = mutable.Map[Long, mutable.Set[Long]]()
    for ((a, b) <- es) {
      adj.getOrElseUpdate(a, mutable.Set()) += b
      adj.getOrElseUpdate(b, mutable.Set()) += a
    }
    val n = adj.size
    val m = es.size
    if (m > 2 * n - 3) return false
    val edgesList = mutable.ArrayBuffer[Edge](es: _*) // original + triangulation edges
    val pairs = mutable.ArrayBuffer[Edge]()
    val queue = mutable.ArrayBuffer[Long]() // degree-2 vertices, discovery order
    val inQueue = mutable.Set[Long]()
    for (v <- adj.keys.toSeq.sorted if adj(v).size == 2) { queue += v; inQueue += v }
    if (queue.size < 2) return false
    var lastPair: Edge = null
    var i = 1
    while (i <= n - 2) {
      if (i - 1 >= queue.size) return false
      val v = queue(i - 1)
      if (!adj.contains(v) || adj(v).size != 2) return false
      val two = adj(v).toSeq.sorted
      val (a, b) = (two(0), two(1))
      val pair = canonEdge(a, b)
      // Divergence from reference outerplanar.c:169-186: a triangulation edge
      // joins the witness multiset when CREATED, not when later consumed by a
      // removal incident to it — the reference's consumed-only bookkeeping
      // makes the verdict depend on the degree-2 removal ORDER (e.g. a C4
      // whose two eliminations pick opposite corners records the pair twice
      // but witnesses it once, rejecting an outerplanar block; the reference
      // inherits that with its reversed-discovery list on scrambled cycle
      // numberings). Creation-time witnessing is order-invariant; the K2,3 /
      // K4 families are still rejected by the pair-count sweep, the edge
      // bound, degree-2 starvation, and the two-triangle check below.
      if (!adj(a).contains(b)) { adj(a) += b; adj(b) += a; edgesList += pair }
      pairs += pair; lastPair = pair
      adj(a) -= v; adj(b) -= v; adj.remove(v)
      for (u <- Seq(a, b)) if (adj(u).size == 2 && !inQueue(u)) { queue += u; inQueue += u }
      if ((adj(a) & adj(b)).size > 1) return false // edge on more than two triangles
      if (queue.size - i < 2) return false
      i += 1
    }
    edgesList += lastPair
    // every recorded pair must be matched by a distinct edge (multiset sweep,
    // reference outerplanar.c:303-337)
    val counts = mutable.Map[Edge, Int]().withDefaultValue(0)
    for (e <- edgesList) counts(e) += 1
    pairs.forall { p => counts(p) -= 1; counts(p) >= 0 }
  }

  /** A graph is outerplanar iff every biconnected block is
    * (reference `outerplanar.c:71` isOuterplanarGraph). */
  def isOuterplanar(edges: Seq[Edge]): Boolean =
    biconnectedComponents(edges).forall(b => b.size <= 1 || isOuterplanarBlock(b))

  /** Hamiltonian cycle of a small block by backtracking (the unique outer
    * face when the block is outerplanar — the cycles the reference's
    * outerplanaritytest executable reports per block). Canonical form:
    * starts at the minimum vid, lexicographically smaller direction. */
  def hamiltonianCycleOfBlock(blockEdges: Seq[Edge]): Option[Seq[Long]] = {
    val es = blockEdges.distinct.filter(e => e._1 != e._2).map(e => canonEdge(e._1, e._2)).distinct
    val adj = mutable.Map[Long, mutable.Set[Long]]()
    for ((a, b) <- es) {
      adj.getOrElseUpdate(a, mutable.Set()) += b
      adj.getOrElseUpdate(b, mutable.Set()) += a
    }
    val verts = adj.keys.toSeq.sorted
    val k = verts.size
    if (k < 3) return None
    val start = verts.head
    val path = mutable.ArrayBuffer[Long](start)
    val used = mutable.Set[Long](start)
    def bt(v: Long): Boolean = {
      if (path.size == k) return adj(v).contains(start)
      for (w <- adj(v).toSeq.sorted if !used(w)) {
        path += w; used += w
        if (bt(w)) return true
        path.remove(path.size - 1); used -= w
      }
      false
    }
    if (!bt(start)) None
    else {
      val c = path.toSeq
      val rev = Seq(c.head) ++ c.tail.reverse
      val cLex = c.zip(rev).find { case (x, y) => x != y }.forall { case (x, y) => x < y }
      Some(if (cLex) c else rev)
    }
  }

  /** All simple cycles, each exactly once (reference `listCycles.c:386`
    * listCycles enumerates per biconnected component and finds each cycle
    * twice — once per direction — hence its count/2 at `listCycles.c:52`;
    * here direction is deduped during enumeration). Canonical form: starts
    * at its minimum vid, smaller-second-vertex direction. `maxCycles` bounds
    * the inherently exponential enumeration (the bound-then-enumerate
    * pattern of reference `listSpanningTrees.c:409`); None = bound hit. */
  def simpleCycles(edges: Seq[Edge], maxCycles: Int = 100000): Option[Seq[Seq[Long]]] = {
    val blocks = biconnectedComponents(edges).filter(_.size > 1)
    val out = mutable.ArrayBuffer[Seq[Long]]()
    for (block <- blocks) {
      val adj = mutable.Map[Long, mutable.ArrayBuffer[Long]]()
      for ((a, b) <- block) {
        adj.getOrElseUpdate(a, mutable.ArrayBuffer()) += b
        adj.getOrElseUpdate(b, mutable.ArrayBuffer()) += a
      }
      val verts = adj.keys.toSeq.sorted
      // cycles rooted at their minimum vertex s, using only vertices >= s;
      // direction deduped by requiring path(1) < path(last)
      for (s <- verts) {
        val path = mutable.ArrayBuffer[Long](s)
        val used = mutable.Set[Long](s)
        def dfs(v: Long): Unit = {
          if (out.size > maxCycles) return
          for (w <- adj(v).sorted) {
            if (w == s && path.size >= 3 && path(1) < path.last) out += path.toSeq
            else if (w > s && !used(w)) {
              path += w; used += w
              dfs(w)
              path.remove(path.size - 1); used -= w
            }
          }
        }
        dfs(s)
      }
    }
    if (out.size > maxCycles) None else Some(out.toSeq)
  }

  /** Canonical string of a labeled cycle: lexicographic minimum over all
    * rotations and both directions of the vertex-label sequence (reference
    * `cs_Cycle.c:152` canonicalStringOfCycle, `:94` permutateCycle). */
  def cycleCanonicalString(cycle: Seq[Long], labels: Map[Long, String]): String = {
    val ls = cycle.map(v => labels.getOrElse(v, "_"))
    val rots = (ls.indices.map(i => ls.drop(i) ++ ls.take(i)) ++
      ls.reverse.indices.map(i => ls.reverse.drop(i) ++ ls.reverse.take(i)))
    rots.map(_.mkString("(", " ", ")")).min
  }

  /** Cyclic pattern kernel features (reference `cpk.c:16-80`
    * CyclicPatternKernel; Horváth/Gärtner/Wrobel KDD'04): per graph, the set
    * of canonical strings of its simple cycles plus the canonical strings of
    * its bridge-forest tree components. Returns None if the cycle bound is
    * hit (reference relies on molecular graphs being cycle-sparse). */
  def cpkFeatures(edges: Seq[Edge], labels: Map[Long, String],
      maxCycles: Int = 100000): Option[Seq[String]] = {
    simpleCycles(edges, maxCycles).map { cycles =>
      val cycleFeats = cycles.map(c => "C:" + cycleCanonicalString(c, labels)).distinct
      val bridges = biconnectedComponents(edges).filter(_.size == 1).flatten
      val treeFeats =
        if (bridges.isEmpty) Nil
        else {
          // connected components of the bridge forest, one canonical string each
          val parent = mutable.Map[Long, Long]()
          def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
          for ((a, b) <- bridges) { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
          bridges.groupBy(e => find(e._1)).values.map(es =>
            "T:" + TreeKernels.canonicalString(es, labels)).toSeq.distinct
        }
      (treeFeats ++ cycleFeats).sorted
    }
  }

  final case class OuterplanarityResult(isOuterplanar: Boolean, hamiltonianCycles: Seq[Seq[Long]])

  /** Per-graph outerplanarity result in the shape of the reference's
    * outerplanaritytest executable (JSON sink: one object per graph with
    * `isOuterplanar` and the Hamiltonian cycles of its outerplanar blocks —
    * present even when the whole graph is not outerplanar, per
    * `outerplanaritytestHelp.txt`). */
  def outerplanarity(edges: Seq[Edge]): OuterplanarityResult = {
    val blocks = biconnectedComponents(edges).filter(_.size > 1)
    val opBlocks = blocks.filter(isOuterplanarBlock)
    OuterplanarityResult(
      isOuterplanar = opBlocks.size == blocks.size,
      hamiltonianCycles = opBlocks.flatMap(hamiltonianCycleOfBlock).sortBy(_.headOption.getOrElse(Long.MaxValue)))
  }

  final case class BlockStats(
      nBlocks: Long, nBridges: Long, nBiconnected: Long,
      maxBlockDegree: Long, minBlockDegree: Long, isCactus: Boolean,
      spanningTreeEstimateLog: Double)

  /** gf block measures: block/bridge counts, per-vertex block degree (count
    * of NONTRIVIAL blocks containing the vertex, reference
    * `listComponents.c:52-86`), cactus test (connected and every block a
    * cycle: per-block m == n, reference `outerplanar.c:39`), and the
    * per-block spanning-tree upper bound (product over blocks of
    * C(m, n-1), log-space like the reference's lgamma nCr,
    * `upperBoundsForSpanningTrees.c:12-62`). */
  /** ln of the per-block spanning-tree upper bound product — C(m, n-1) per
    * block (reference `upperBoundsForSpanningTrees.c`). Factored out of
    * [[blockStats]] so callers holding an already-computed block
    * decomposition (the fused ts-modes kernel) reuse it without a second
    * Tarjan pass; the arithmetic (term order included) is byte-identical to
    * the historical inline version. */
  private[trees] def spanningTreeEstimateLogFromBlocks(blocks: Seq[Seq[Edge]]): Double = {
    def lnCr(m: Int, k: Int): Double = {
      def lg(x: Int) = (2 to x).map(i => math.log(i)).sum
      if (k < 0 || k > m) 0.0 else lg(m) - lg(k) - lg(m - k)
    }
    blocks.map { b =>
      val n = b.flatMap(e => Seq(e._1, e._2)).distinct.size
      lnCr(b.size, n - 1)
    }.sum
  }

  def blockStats(edges: Seq[Edge]): BlockStats = {
    val blocks = biconnectedComponents(edges)
    val bridges = blocks.count(_.size == 1)
    val nontrivial = blocks.filter(_.size > 1)
    val degreeOf = mutable.Map[Long, Long]().withDefaultValue(0L)
    for (b <- nontrivial; v <- b.flatMap(e => Seq(e._1, e._2)).distinct)
      degreeOf(v) += 1
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val blockDegrees = verts.map(v => degreeOf(v))
    val cactus = nontrivial.forall { b =>
      val n = b.flatMap(e => Seq(e._1, e._2)).distinct.size
      b.size == n
    }
    val estLog = spanningTreeEstimateLogFromBlocks(blocks)
    BlockStats(blocks.size.toLong, bridges.toLong, nontrivial.size.toLong,
      if (blockDegrees.isEmpty) 0L else blockDegrees.max,
      if (blockDegrees.isEmpty) 0L else blockDegrees.min,
      cactus, estLog)
  }

  /** Per-vertex criticality = number of biconnected components (bridges
    * INCLUDED) containing the vertex (reference `listComponents.c:16-52`
    * computeCriticality — the `ccd` cycle-degree dump counts every block the
    * vertex's edges appear in). */
  def criticality(edges: Seq[Edge]): Map[Long, Int] = {
    val blocks = biconnectedComponents(edges)
    val crit = mutable.Map[Long, Int]().withDefaultValue(0)
    for (b <- blocks; v <- b.flatMap(e => Seq(e._1, e._2)).distinct) crit(v) += 1
    crit.toMap
  }

  /** Is this graph a connected cactus (every nontrivial block a simple
    * cycle, reference `outerplanar.c:39` isCactus + connectivity)? */
  def isConnectedCactus(edges: Seq[Edge]): Boolean = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    if (verts.size <= 1) return true
    // connectivity via union-find
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    for ((a, b) <- edges) { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    if (verts.map(find).distinct.size != 1) return false
    biconnectedComponents(edges).filter(_.size > 1).forall { b =>
      b.size == b.flatMap(e => Seq(e._1, e._2)).distinct.size
    }
  }

  /** Hamiltonian-path existence on a connected cactus (reference
    * `hp_cactus.c:23-116` isThisCactusTraceable): traceable iff no vertex
    * lies in more than 2 blocks, no nontrivial block contains more than 2
    * critical vertices (criticality > 1), and when a block has exactly 2
    * critical vertices they are adjacent within the block. */
  def isTraceableCactus(edges: Seq[Edge]): Boolean = {
    if (!isConnectedCactus(edges)) return false
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    if (verts.size <= 1) return true
    val crit = criticality(edges)
    if (crit.valuesIterator.exists(_ > 2)) return false
    biconnectedComponents(edges).filter(_.size > 1).forall { b =>
      val critical = b.flatMap(e => Seq(e._1, e._2)).distinct.filter(v => crit.getOrElse(v, 0) > 1)
      critical.size < 2 ||
        (critical.size == 2 && b.exists { case (a, c) =>
          crit.getOrElse(a, 0) > 1 && crit.getOrElse(c, 0) > 1
        })
    }
  }

  /** Necessary (not sufficient) traceability test for arbitrary connected
    * graphs (reference `hp_cactus.c:125-180` isWeaklyTraceable): 0 = surely
    * not traceable, 1 = possibly traceable. Same block conditions as the
    * cactus test minus the adjacency requirement. */
  def isWeaklyTraceable(edges: Seq[Edge]): Boolean = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    if (verts.size <= 1) return true
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    for ((a, b) <- edges) { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    if (verts.map(find).distinct.size != 1) return false
    val crit = criticality(edges)
    if (crit.valuesIterator.exists(_ > 2)) return false
    biconnectedComponents(edges).filter(_.size > 1).forall { b =>
      b.flatMap(e => Seq(e._1, e._2)).distinct.count(v => crit.getOrElse(v, 0) > 1) <= 2
    }
  }

  /** Per-vertex local easiness: the product over all nontrivial blocks
    * containing v of that block's exact spanning-tree count (reference
    * `localEasiness.c:10-58` computeLocalEasinessExactly; vertices in no
    * nontrivial block have easiness 1). None-valued entries (bound hit in a
    * block count) are encoded as 0, exactly like the reference. */
  def localEasiness(edges: Seq[Edge], maxBound: Long = 100000L): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val eas = mutable.Map[Long, Long](verts.map(_ -> 1L): _*)
    for (b <- biconnectedComponents(edges) if b.size > 1) {
      val c = TreeKernels.countSpanningTrees(b, maxBound)
      for (v <- b.flatMap(e => Seq(e._1, e._2)).distinct)
        eas(v) = c match {
          case Some(k) => if (eas(v) == 0L) 0L else eas(v) * k
          case None => 0L
        }
    }
    eas.toMap
  }

  /** Max over vertices of local easiness; -1 if any vertex's count failed
    * (reference `localEasiness.c:66-88` getMaxLocalEasiness). */
  def maxLocalEasiness(edges: Seq[Edge], maxBound: Long = 100000L): Long = {
    val eas = localEasiness(edges, maxBound)
    if (eas.isEmpty) 1L
    else if (eas.valuesIterator.contains(0L)) -1L
    else eas.valuesIterator.max
  }

  /** Min over vertices of local easiness, skipping failed vertices; -1 when
    * every vertex failed (reference `localEasiness.c:94-114`). */
  def minLocalEasiness(edges: Seq[Edge], maxBound: Long = 100000L): Long = {
    val ok = localEasiness(edges, maxBound).valuesIterator.filter(_ != 0L)
    if (ok.isEmpty) -1L else ok.min
  }

  /** Outerplanar block-and-bridge tree kernel features — `opk` (reference
    * `opk.c:18` outerplanarKernel, BB-tree from `outerplanar.c:456`
    * createBlockAndBridgeTree, level-tree enumeration `treeKernels.c:91`
    * bfsSubtreeEnumeration): the graph is condensed to its block-and-bridge
    * tree (original vertices keep their labels; every nontrivial block
    * becomes one node labeled with the block's outerplanar canonical string,
    * connected to each member vertex; bridges stay as edges), then the
    * features are the canonical strings of the BFS level trees of every
    * node at depths 1..`depth` (clamped per root at its eccentricity, like
    * the reference's edgeSort clamp). Returns None when any block is not
    * outerplanar (the reference returns NULL and skips the graph).
    * Simplification vs the reference: the separate blocks-only enumeration
    * pass is subsumed — block-rooted level trees are enumerated in the same
    * unified BB-tree. */
  def opkFeatures(edges: Seq[Edge], labels: Map[Long, String], depth: Int = 3): Option[Seq[String]] = {
    val es = edges.distinct.filter(e => e._1 != e._2).map(e => canonEdge(e._1, e._2)).distinct
    val blocks = biconnectedComponents(es)
    val nontrivial = blocks.filter(_.size > 1)
    val nodeLabels = mutable.Map[Long, String]()
    for (v <- es.flatMap(e => Seq(e._1, e._2)).distinct) nodeLabels(v) = labels.getOrElse(v, "_")
    val blockEdges = mutable.ArrayBuffer[Edge]()
    for ((b, i) <- nontrivial.zipWithIndex) {
      outerplanarBlockCanonicalString(b, labels) match {
        case Some(cs) =>
          val bid = -(i + 1L)
          nodeLabels(bid) = cs
          for (v <- b.flatMap(e => Seq(e._1, e._2)).distinct) blockEdges += ((bid, v))
        case None => return None
      }
    }
    val bbEdges = blocks.filter(_.size == 1).flatten ++ blockEdges
    val adj = mutable.Map[Long, mutable.ArrayBuffer[Long]]()
    for ((a, b) <- bbEdges) {
      adj.getOrElseUpdate(a, mutable.ArrayBuffer()) += b
      adj.getOrElseUpdate(b, mutable.ArrayBuffer()) += a
    }
    def levelString(v: Long, parent: Long, j: Int): String =
      if (j == 0) nodeLabels(v)
      else nodeLabels(v) + adj.getOrElse(v, mutable.ArrayBuffer.empty).toSeq.filter(_ != parent)
        .map(c => s"(${levelString(c, v, j - 1)})").sorted.mkString
    def eccentricity(v: Long): Int = {
      var frontier = Set(v); var seen = Set(v); var d = 0
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(u => adj.getOrElse(u, mutable.ArrayBuffer.empty)).diff(seen)
        if (next.nonEmpty) d += 1
        seen ++= next; frontier = next
      }
      d
    }
    val feats = for {
      v <- adj.keys.toSeq
      j <- 1 to math.min(depth, eccentricity(v))
    } yield levelString(v, Long.MinValue, j)
    Some(feats.distinct.sorted)
  }

  /** Canonical string of a 2-connected OUTERPLANAR block (operator analogue
    * of reference `cs_Outerplanar.c:346,815` canonicalStringOfOuterplanarBlock):
    * the block's unique outer face is its Hamiltonian cycle; the string is
    * the lexicographic minimum over the 2L rotations/reflections of the
    * outer-face label sequence, each annotated with the chord set as sorted
    * position pairs. Same isomorphism invariance as the reference's
    * (Colbourn/Booth-style) form; simplified grammar
    * `OP[l1 l2 ... lL|i-j,i-j,...]`. None when the input is not a single
    * outerplanar 2-connected block. */
  def outerplanarBlockCanonicalString(edges: Seq[Edge], labels: Map[Long, String]): Option[String] = {
    val es = edges.distinct.filter(e => e._1 != e._2).map(e => canonEdge(e._1, e._2)).distinct
    val blocks = biconnectedComponents(es).filter(_.size > 1)
    if (blocks.size != 1 || blocks.head.size != es.size) return None // not one 2-connected block
    if (!isOuterplanarBlock(es)) return None
    hamiltonianCycleOfBlock(es).map { cyc =>
      val L = cyc.size
      val cycEdges = (0 until L).map(i => canonEdge(cyc(i), cyc((i + 1) % L))).toSet
      val chords = es.filterNot(cycEdges)
      val variants = for (start <- 0 until L; refl <- Seq(false, true)) yield {
        val order =
          if (!refl) (0 until L).map(i => cyc((start + i) % L))
          else (0 until L).map(i => cyc(((start - i) % L + L) % L))
        val pos = order.zipWithIndex.toMap
        val labs = order.map(v => labels.getOrElse(v, "_")).mkString(" ")
        val cs = chords.map { case (a, b) =>
          val (i, j) = (pos(a), pos(b))
          if (i < j) (i, j) else (j, i)
        }.sorted
        labs + "|" + cs.map { case (i, j) => s"$i-$j" }.mkString(",")
      }
      "OP[" + variants.min + "]"
    }
  }
}
