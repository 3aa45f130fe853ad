package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.fixtures.Generators

class GraphOpsSpec extends AnyFunSuite with SparkTestBase {

  test("egoNets neighbors mode: K_4 ego of any center is the triangle on the other three") {
    val df = Generators.edgesDF(spark, Generators.clique(4))
    val ego = GraphOps.egoNets(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // ego of center c = K_3 on the other three vertices (3 edges each), 4 centers
    assert(ego.size == 12)
    assert(ego.filter(_._1 == 0L) == Set((0L, 1L, 2L), (0L, 1L, 3L), (0L, 2L, 3L)))
  }

  test("egoNets neighbors mode: star has empty egos; path P_3 center sees no 0-2 edge") {
    val star = Generators.edgesDF(spark, Generators.star(4))
    assert(GraphOps.egoNets(star).isEmpty)
    val p3 = Generators.edgesDF(spark, Generators.path(3))
    assert(GraphOps.egoNets(p3).isEmpty) // neighbors of 1 are {0,2}, not adjacent
  }

  test("egoNets disk mode adds the spokes (reference neighborhoodGeneratorHelp 'disk')") {
    val p3 = Generators.edgesDF(spark, Generators.path(3))
    val disk = GraphOps.egoNets(p3, disk = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(disk == Set((0L, 0L, 1L), (1L, 0L, 1L), (1L, 1L, 2L), (2L, 1L, 2L)))
  }

  test("erdosRenyiEdges: deterministic, p=1 gives the clique, p=0 empty, density ~ p") {
    val n = 60L
    val all = Generators.erdosRenyiEdges(spark, n, 1.0, 7L).count()
    assert(all == n * (n - 1) / 2)
    assert(Generators.erdosRenyiEdges(spark, n, 0.0, 7L).isEmpty)
    val p = 0.3
    val got = Generators.erdosRenyiEdges(spark, n, p, 7L)
    assert(got.count() == Generators.erdosRenyiEdges(spark, n, p, 7L).count()) // deterministic
    val frac = got.count().toDouble / (n * (n - 1) / 2)
    assert(math.abs(frac - p) < 0.05, s"density $frac vs p=$p")
    // different seed -> different graph
    val other = Generators.erdosRenyiEdges(spark, n, p, 8L)
    assert(got.join(other, Seq("src", "dst"), "left_anti").count() > 0)
  }
}
