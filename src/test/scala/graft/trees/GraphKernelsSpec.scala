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

  // ---- outerplanarity (Mitchell; reference outerplanar.c:103-351) ----

  private def k23 = Seq((0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L), (1L, 3L), (1L, 4L))
  private def k4 = graft.fixtures.Generators.clique(4)
  private def fan5 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L), (2L, 3L), (3L, 4L))

  test("outerplanarity: cycles, fans, cacti are OP; K4 and K2,3 are not") {
    assert(GraphKernels.isOuterplanar(graft.fixtures.Generators.cycle(5)))
    assert(GraphKernels.isOuterplanar(fan5)) // maximal outerplanar fan
    assert(GraphKernels.isOuterplanar(Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L)))) // bowtie
    assert(GraphKernels.isOuterplanar(graft.fixtures.Generators.path(6))) // forest: all bridges
    assert(!GraphKernels.isOuterplanar(k4))
    assert(!GraphKernels.isOuterplanar(k23))
    // K4 minus one edge = C4 + chord: still outerplanar
    assert(GraphKernels.isOuterplanar(k4.filterNot(_ == (0L, 2L))))
  }

  test("hamiltonian cycle of OP blocks: outer face, canonical orientation") {
    assert(GraphKernels.hamiltonianCycleOfBlock(graft.fixtures.Generators.cycle(5))
      .contains(Seq(0L, 1L, 2L, 3L, 4L)))
    assert(GraphKernels.hamiltonianCycleOfBlock(fan5).contains(Seq(0L, 1L, 2L, 3L, 4L)))
    assert(GraphKernels.hamiltonianCycleOfBlock(Seq((0L, 1L))).isEmpty)
  }

  // ---- simple cycles + cyclic pattern kernel (reference listCycles.c, cpk.c) ----

  test("simpleCycles: counts match closed forms (each cycle once)") {
    assert(GraphKernels.simpleCycles(graft.fixtures.Generators.cycle(5)).get.size == 1)
    assert(GraphKernels.simpleCycles(graft.fixtures.Generators.path(6)).get.isEmpty)
    // K4: 4 triangles + 3 quadrilaterals = 7 simple cycles
    assert(GraphKernels.simpleCycles(k4).get.size == 7)
    // bowtie: two triangles
    val bowtie = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L))
    assert(GraphKernels.simpleCycles(bowtie).get.size == 2)
    // bound-then-enumerate: a tiny bound trips on K4
    assert(GraphKernels.simpleCycles(k4, maxCycles = 3).isEmpty)
  }

  test("cycle canonical string: rotation/direction invariant, label sensitive") {
    val labels = Map(0L -> "a", 1L -> "b", 2L -> "c")
    val s1 = GraphKernels.cycleCanonicalString(Seq(0L, 1L, 2L), labels)
    assert(s1 == GraphKernels.cycleCanonicalString(Seq(1L, 2L, 0L), labels))
    assert(s1 == GraphKernels.cycleCanonicalString(Seq(2L, 1L, 0L), labels))
    assert(s1 != GraphKernels.cycleCanonicalString(Seq(0L, 1L, 2L), labels + (2L -> "z")))
  }

  test("cpkFeatures: tree + cycle patterns of the bowtie-with-tail") {
    // two same-labeled triangles sharing vertex 2, tail 2-5
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L), (2L, 5L))
    val uniform = (0L to 5L).map(_ -> "x").toMap
    val f = GraphKernels.cpkFeatures(g, uniform).get
    // identical labels: the two triangles collapse to ONE cycle feature; one bridge tree
    assert(f.count(_.startsWith("C:")) == 1)
    assert(f.count(_.startsWith("T:")) == 1)
    val distinctLabels = Map(0L -> "a", 1L -> "b", 2L -> "c", 3L -> "d", 4L -> "e", 5L -> "f")
    val f2 = GraphKernels.cpkFeatures(g, distinctLabels).get
    assert(f2.count(_.startsWith("C:")) == 2)
  }

  test("outerplanarity result mirrors the outerplanaritytest JSON shape") {
    // triangle - bridge - triangle: OP, two block cycles
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 3L))
    val r = GraphKernels.outerplanarity(g)
    assert(r.isOuterplanar)
    assert(r.hamiltonianCycles == Seq(Seq(0L, 1L, 2L), Seq(3L, 4L, 5L)))
    // K4 + pendant triangle: not OP overall, but the OP block still reports its cycle
    val mixed = k4 ++ Seq((3L, 4L), (4L, 5L), (5L, 3L))
    val r2 = GraphKernels.outerplanarity(mixed)
    assert(!r2.isOuterplanar)
    assert(r2.hamiltonianCycles == Seq(Seq(3L, 4L, 5L)))
  }
}
