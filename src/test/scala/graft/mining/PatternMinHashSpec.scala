package graft.mining

import org.scalatest.funsuite.AnyFunSuite

class PatternMinHashSpec extends AnyFunSuite {

  private val perms = PatternMinHash.permutations(4, 2024L)

  test("permutations are seeded, distinct, and cover the universe") {
    assert(perms.size == 4)
    perms.foreach(p => assert(p.sorted == (0 until PatternMinHash.universeSize).toList))
    assert(PatternMinHash.permutations(4, 2024L) == perms) // reproducible
    assert(perms.distinct.size == 4)
  }

  test("sketch = first contained pattern per permutation") {
    // star: center 'O' with leaves (ls=F, rf=R), (ls=O, rf=N)
    val vl = Seq("O", "R", "N")
    val es = Seq(("O", "R", "F"), ("O", "N", "O"))
    val sk = PatternMinHash.sketch(vl, es, perms)
    assert(sk.size == 4)
    // verify against a brute-force containment set
    val contained = (0 until PatternMinHash.universeSize).filter { pid =>
      if (pid < PatternMinHash.vertexPatterns.size) vl.contains(PatternMinHash.vertexPatterns(pid))
      else {
        val (s, e, f) = PatternMinHash.edgePatterns(pid - PatternMinHash.vertexPatterns.size)
        es.exists { case (a, b, el) => el == e && ((a == s && b == f) || (a == f && b == s)) }
      }
    }.toSet
    sk.zip(perms).foreach { case (v, p) =>
      assert(v == p.find(contained).getOrElse(-1))
    }
  }

  test("poset propagation prunes embedding-oracle calls") {
    val vl = Seq("O", "R")
    val es = Seq(("O", "R", "F"))
    val (sk, calls) = PatternMinHash.sketchCounted(vl, es, perms)
    assert(sk.forall(_ >= 0))
    // naive evaluation would call the oracle once per (perm, prefix) entry;
    // with propagation + memoization, calls stay below the universe size
    assert(calls < PatternMinHash.universeSize)
    // propagation is sound: same sketch as the unpruned evaluation
    val contained = (0 until PatternMinHash.universeSize).filter { pid =>
      if (pid < PatternMinHash.vertexPatterns.size) vl.contains(PatternMinHash.vertexPatterns(pid))
      else {
        val (s, e, f) = PatternMinHash.edgePatterns(pid - PatternMinHash.vertexPatterns.size)
        es.exists { case (a, b, el) => el == e && ((a == s && b == f) || (a == f && b == s)) }
      }
    }.toSet
    assert(sk == perms.map(p => p.find(contained).getOrElse(-1)))
  }

  test("empty graph sketches to -1") {
    assert(PatternMinHash.sketch(Seq.empty, Seq.empty, perms) == Seq(-1, -1, -1, -1))
  }

  test("pathCover: minimum vertex-disjoint chains covering the poset (Dilworth)") {
    val cover = PatternMinHash.pathCover(PatternMinHash.universeSize, PatternMinHash.posetCoverEdges)
    // disjoint and complete
    val flat = cover.flatten
    assert(flat.sorted == (0 until PatternMinHash.universeSize).toList)
    // chains: consecutive elements are cover-related
    val rel = PatternMinHash.posetCoverEdges.toSet
    cover.foreach(p => p.sliding(2).foreach {
      case Seq(a, b) => assert(rel((a, b))); case _ => ()
    })
    // minimality: n - maxMatching; the 6 vertex patterns each start at most
    // one chain into the 18 edge patterns -> matching size 6, cover size 18
    assert(cover.size == PatternMinHash.universeSize - 6)
    // generic DAG: a 4-chain is covered by exactly one path
    assert(PatternMinHash.pathCover(4, Seq((0, 1), (1, 2), (2, 3))) == Seq(Seq(0, 1, 2, 3)))
  }

  test("path-cover evaluation plan: same sketch, binary-search call bound") {
    val vl = Seq("O", "R", "N")
    val es = Seq(("O", "R", "F"), ("O", "N", "O"))
    val (sk, calls) = PatternMinHash.sketchByPathCoverCounted(vl, es, perms)
    assert(sk == PatternMinHash.sketch(vl, es, perms))
    // <= #chains * (ceil(log2 maxChainLen) + 1) oracle calls
    val cover = PatternMinHash.pathCover(PatternMinHash.universeSize, PatternMinHash.posetCoverEdges)
    val bound = cover.map(p => (math.log(p.size) / math.log(2)).ceil.toInt + 1).sum
    assert(calls <= bound)
    // longer chain: binary search visits O(log n) of a 16-chain
    val longCover = PatternMinHash.pathCover(16, (0 until 15).map(i => (i, i + 1)))
    assert(longCover.size == 1 && longCover.head.size == 16)
  }
}
