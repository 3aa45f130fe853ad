package graft.algo

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.fixtures.{Generators, ReferenceOracles}

class TrianglesSpec extends AnyFunSuite with SparkTestBase {

  private def choose3(n: Int): Long = n.toLong * (n - 1) * (n - 2) / 6

  test("K_n has C(n,3) triangles; per-vertex C(n-1,2)") {
    for (n <- Seq(3, 4, 6)) {
      val df = Generators.edgesDF(spark, Generators.clique(n))
      assert(Triangles.globalCount(spark, df) == choose3(n))
      val per = Triangles.perVertex(spark, df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (n - 1).toLong * (n - 2) / 2
      assert(per.values.forall(_ == want))
    }
  }

  test("paths, stars, trees have 0 triangles; C_3 has 1; C_5 has 0") {
    assert(Triangles.globalCount(spark, Generators.edgesDF(spark, Generators.path(16))) == 0L)
    assert(Triangles.globalCount(spark, Generators.edgesDF(spark, Generators.star(50))) == 0L)
    assert(Triangles.globalCount(spark, Generators.edgesDF(spark, Generators.cycle(3))) == 1L)
    assert(Triangles.globalCount(spark, Generators.edgesDF(spark, Generators.cycle(5))) == 0L)
  }

  test("matches wedge-check oracle on BA power-law graph") {
    val e = Generators.barabasiAlbert(80, 3, seed = 42L)
    val (g, per) = ReferenceOracles.triangles(e)
    val df = Generators.edgesDF(spark, e)
    assert(Triangles.globalCount(spark, df) == g)
    val got = Triangles.perVertex(spark, df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == per)
  }

  test("invariant under edge-list direction/duplication (symmetrization idempotent)") {
    val e = Generators.clique(5)
    val noisy = e ++ e.map { case (a, b) => (b, a) } ++ e.take(3)
    assert(Triangles.globalCount(spark, Generators.edgesDF(spark, noisy)) == choose3(5))
  }

  test("common neighbor counts (graph.c:105 commonNeighborCount semantics)") {
    val df = Generators.edgesDF(spark, Generators.clique(4))
    val cn = Triangles.commonNeighbors(spark, df).collect()
    assert(cn.length == 6 && cn.forall(_.getInt(2) == 2))
  }
}
