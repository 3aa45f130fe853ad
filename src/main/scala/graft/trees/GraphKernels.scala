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
    def lnCr(m: Int, k: Int): Double = {
      def lg(x: Int) = (2 to x).map(i => math.log(i)).sum
      if (k < 0 || k > m) 0.0 else lg(m) - lg(k) - lg(m - k)
    }
    val estLog = blocks.map { b =>
      val n = b.flatMap(e => Seq(e._1, e._2)).distinct.size
      lnCr(b.size, n - 1)
    }.sum
    BlockStats(blocks.size.toLong, bridges.toLong, nontrivial.size.toLong,
      if (blockDegrees.isEmpty) 0L else blockDegrees.max,
      if (blockDegrees.isEmpty) 0L else blockDegrees.min,
      cactus, estLog)
  }
}
