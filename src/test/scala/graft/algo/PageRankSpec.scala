package graft.algo

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.fixtures.{Generators, ReferenceOracles}

class PageRankSpec extends AnyFunSuite with SparkTestBase {

  private def ranksOf(edges: Seq[(Long, Long)], directed: Boolean = true): Map[Long, Double] = {
    val e0 = if (directed) edges else edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val df = Generators.edgesDF(spark, e0)
    PageRank.run(spark, df).ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  private def assertAllClose(got: Map[Long, Double], want: Map[Long, Double], tol: Double = 1e-6): Unit = {
    assert(got.keySet == want.keySet, s"vertex sets differ: ${got.keySet} vs ${want.keySet}")
    for ((v, w) <- want) assert(math.abs(got(v) - w) < tol, s"vertex $v: got ${got(v)} want $w")
  }

  test("uniform 1/n on directed cycle C_5 (analytic)") {
    val got = ranksOf(Generators.cycle(5))
    for ((_, r) <- got) assert(math.abs(r - 0.2) < 1e-6)
  }

  test("uniform 1/n on clique K_4 (analytic, undirected)") {
    val got = ranksOf(Generators.clique(4), directed = false)
    for ((_, r) <- got) assert(math.abs(r - 0.25) < 1e-6)
  }

  test("matches scalar oracle on undirected path P_5") {
    val e = Generators.path(5)
    assertAllClose(ranksOf(e, directed = false),
      ReferenceOracles.pageRankScalar(e.flatMap { case (a, b) => Seq((a, b), (b, a)) }), 2e-6)
  }

  test("matches scalar oracle on star S_4 with dangling leaves (directed to hub)") {
    val e = (1 to 4).map(i => (i.toLong, 0L)) // leaves -> hub; hub dangling
    assertAllClose(ranksOf(e), ReferenceOracles.pageRankScalar(e), 2e-6)
  }

  test("matches scalar oracle on BA power-law n=60") {
    val e = Generators.barabasiAlbert(60, 2, seed = 42L)
    assertAllClose(ranksOf(e), ReferenceOracles.pageRankScalar(e), 5e-6)
  }

  test("ranks sum to 1 every run (probability mass conservation)") {
    val e = Generators.barabasiAlbert(40, 2, seed = 7L)
    val total = ranksOf(e).values.sum
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("fixed-iteration variant matches fixed-iteration oracle exactly-ish") {
    val e = Generators.barabasiAlbert(30, 2, seed = 3L)
    val df = Generators.edgesDF(spark, e)
    val got = PageRank.runFixed(spark, df, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = ReferenceOracles.pageRankScalarFixed(e, 5)
    assertAllClose(got, want, 1e-12)
  }

  test("lineage truncation boundary (run crossing LineageTruncateEvery) matches the scalar oracle") {
    val e = Generators.barabasiAlbert(50, 2, seed = 21L)
    val df = Generators.edgesDF(spark, e)
    val got = PageRank.run(spark, df).ranks
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assertAllClose(got, ReferenceOracles.pageRankScalar(e), 5e-6)
  }

  test("checkpoint + resume reproduces identical converged scores") {
    val e = Generators.barabasiAlbert(50, 2, seed = 11L)
    val df = Generators.edgesDF(spark, e)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val ck = graft.run.IterationCheckpoint(dir, every = 2)
    // Run 1: stop early (simulated kill) by capping iterations after a checkpoint.
    PageRank.run(spark, df, maxIter = 4, checkpoint = Some(ck))
    assert(ck.lineage.nonEmpty, "checkpoint wrote no manifests")
    // Run 2: resume from checkpoint and converge.
    val resumed = PageRank.run(spark, df, checkpoint = Some(ck))
    assert(resumed.iterations > 4)
    val fresh = PageRank.run(spark, df)
    val a = resumed.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = fresh.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((v, r) <- b) assert(math.abs(a(v) - r) < 1e-9, s"resume drift at $v")
    // lineage carries per-partition metrics
    val m = ck.lineage.last
    assert(m.partitions.nonEmpty && m.rows == a.size)
  }

  test("writeStatic + runFromStatic reproduces run() exactly (same fixed-point)") {
    val e = Generators.barabasiAlbert(60, 2, seed = 33L)
    val df = Generators.edgesDF(spark, e)
    val dir = java.nio.file.Files.createTempDirectory("graft-static").toString
    PageRank.writeStatic(spark, df, dir)
    val fromStatic = PageRank.runFromStatic(spark, dir)
    val direct = PageRank.run(spark, df)
    assert(fromStatic.numVertices == direct.numVertices &&
      fromStatic.numEdges == direct.numEdges)
    val a = fromStatic.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = direct.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    for ((v, r) <- b) assert(math.abs(a(v) - r) < 1e-12, s"static-path drift at $v")
  }

  test("runFromStatic kill/resume: mid-iteration restart from static tables converges identically") {
    // the production restart story (round-4 verdict #9): writeStatic output
    // + IterationCheckpoint resume, i.e. a worker dies mid-algorithm and a
    // NEW process resumes from the static tables + last checkpoint
    val e = Generators.barabasiAlbert(50, 2, seed = 77L)
    val df = Generators.edgesDF(spark, e)
    val staticDir = java.nio.file.Files.createTempDirectory("graft-static-resume").toString
    PageRank.writeStatic(spark, df, staticDir)
    val ckDir = java.nio.file.Files.createTempDirectory("graft-static-ckpt").toString
    val ck = graft.run.IterationCheckpoint(ckDir, every = 2)
    // run 1: killed after a few iterations (post-checkpoint)
    PageRank.runFromStatic(spark, staticDir, maxIter = 4, checkpoint = Some(ck))
    assert(ck.lineage.nonEmpty, "checkpoint wrote no manifests")
    // run 2: a fresh checkpoint handle (new process) resumes and converges
    val ck2 = graft.run.IterationCheckpoint(ckDir, every = 2)
    val resumed = PageRank.runFromStatic(spark, staticDir, checkpoint = Some(ck2))
    assert(resumed.iterations > 4)
    val fresh = PageRank.run(spark, df)
    val a = resumed.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = fresh.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((v, r) <- b) assert(math.abs(a(v) - r) < 1e-9, s"static-resume drift at $v")
    // lineage carries per-partition metrics across the restart
    val m = ck2.lineage.last
    assert(m.partitions.nonEmpty && m.rows == a.size)
  }
}
