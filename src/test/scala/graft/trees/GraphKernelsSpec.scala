package graft.trees

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.fixtures.Generators

class GraphKernelsSpec extends AnyFunSuite with SparkTestBase {

  test("tree: every edge is a bridge, no nontrivial blocks") {
    val s = GraphKernels.blockStats(Generators.path(6))
    assert(s.nBlocks == 5 && s.nBridges == 5 && s.nBiconnected == 0)
    assert(s.isCactus) // trees are (degenerate) cactus graphs
  }

  test("cycle: one biconnected block containing all edges") {
    val blocks = GraphKernels.biconnectedComponents(Generators.cycle(6))
    assert(blocks.size == 1 && blocks.head.size == 6)
    val s = GraphKernels.blockStats(Generators.cycle(6))
    assert(s.isCactus && s.nBridges == 0 && s.nBiconnected == 1)
  }

  test("chain of cycles (cgen shape): k cycle blocks, articulation degrees") {
    val k = 4; val c = 5
    val edges = Generators.chainBlocks(k, c)
    val blocks = GraphKernels.biconnectedComponents(edges)
    assert(blocks.size == k)
    assert(blocks.forall(_.size == c))
    val s = GraphKernels.blockStats(edges)
    assert(s.isCactus && s.maxBlockDegree == 2 && s.minBlockDegree == 1)
  }

  test("clique: single block, not cactus; spanning tree bound sane") {
    val s = GraphKernels.blockStats(Generators.clique(5))
    assert(s.nBlocks == 1 && s.nBridges == 0 && !s.isCactus)
    // Cayley: K_5 has 5^3 = 125 spanning trees <= C(10, 4) = 210
    assert(math.exp(s.spanningTreeEstimateLog) >= 125.0 - 1e-6)
  }

  test("two blocks sharing an articulation vertex (bowtie)") {
    val bowtie = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L))
    val blocks = GraphKernels.biconnectedComponents(bowtie)
    assert(blocks.size == 2 && blocks.forall(_.size == 3))
    val s = GraphKernels.blockStats(bowtie)
    assert(s.maxBlockDegree == 2) // vertex 2 sits in both triangles
  }

  test("bridge + cycle mix") {
    // path 0-1 then cycle 1-2-3-1
    val g = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 1L))
    val s = GraphKernels.blockStats(g)
    assert(s.nBlocks == 2 && s.nBridges == 1 && s.nBiconnected == 1 && s.isCactus)
  }
}
