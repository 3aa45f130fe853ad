package graft.measures

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.fixtures.Generators

class GraphMeasuresSpec extends AnyFunSuite with SparkTestBase {

  private def db = {
    import spark.implicits._
    // graph 0: P_4 (path), graph 1: K_4, graph 2: C_5, graph 3: two components
    val rows =
      Generators.path(4).map { case (a, b) => (0L, a, b) } ++
        Generators.clique(4).map { case (a, b) => (1L, a, b) } ++
        Generators.cycle(5).map { case (a, b) => (2L, a, b) } ++
        (Generators.path(3) ++ Generators.cycle(3).map { case (a, b) => (a + 10, b + 10) })
          .map { case (a, b) => (3L, a, b) }
    rows.toDF("graph_id", "src", "dst")
  }

  test("per-graph measures match analytic values (filter.c semantics)") {
    val m = GraphMeasures.measures(spark, db)
      .collect().map(r => r.getLong(0) -> r).toMap
    // P_4: n=4 m=3 deg 1..2, connected tree path
    assert(m(0L).getLong(1) == 4 && m(0L).getLong(2) == 3)
    assert(m(0L).getBoolean(6) && m(0L).getBoolean(7) && m(0L).getBoolean(8))
    // K_4: n=4 m=6 deg 3, connected, not tree
    assert(m(1L).getLong(2) == 6 && m(1L).getLong(3) == 3 && m(1L).getLong(4) == 3)
    assert(m(1L).getBoolean(6) && !m(1L).getBoolean(7))
    // C_5: connected, not tree (m = n)
    assert(m(2L).getLong(1) == 5 && m(2L).getLong(2) == 5 && m(2L).getBoolean(6))
    // two components
    assert(m(3L).getLong(5) == 2 && !m(3L).getBoolean(6))
  }

  test("gf pipeline: filter tree graphs, project ids (gf -f tree -c == -v 1 -o id)") {
    val ids = GraphMeasures.measures(spark, db).where(col("tree")).select("graph_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L))
    val viaGf = GraphMeasures.gf(spark, db, "n_components", "==", 1)
      .collect().map(_.getLong(0)).toSet
    assert(viaGf == Set(0L, 1L, 2L))
  }
}
