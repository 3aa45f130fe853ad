package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import java.nio.file.Files

/** Simple-format reader (reference loading.c:18-90) and the cstring DB
  * source (reference getDBfromCanonicalStrings). */
class FormatSourcesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("simple format: parse vertices, edges, labels") {
    val doc =
      """3 2
        |0 a
        |1 b
        |2 c
        |0 1 x
        |1 2 y
        |""".stripMargin
    val (vs, es) = SimpleFormat.parseDoc(7L, doc)
    assert(vs.map(v => (v.vno, v.label)) == Seq((0L, "a"), (1L, "b"), (2L, "c")))
    assert(es.map(e => (e.src, e.dst, e.label)) == Seq((0L, 1L, "x"), (1L, 2L, "y")))
  }

  test("simple format: directory read, one graph per file") {
    val dir = Files.createTempDirectory("simplefmt")
    Files.writeString(dir.resolve("g0.txt"), "2 1\n0 a\n1 b\n0 1 e\n")
    Files.writeString(dir.resolve("g1.txt"), "1 0\n0 z\n")
    val db = SimpleFormat.read(spark, dir.toString)
    val vs = db.vertices.as[SimpleFormat.SimpleVertex].collect().sortBy(v => (v.graph_id, v.vno))
    assert(vs.map(_.label).toSeq == Seq("a", "b", "z"))
    assert(vs.map(_.graph_id).distinct.toSeq == Seq(0L, 1L))
    val es = db.edges.as[SimpleFormat.SimpleEdge].collect()
    assert(es.length == 1 && es.head.label == "e")
    assert(SimpleFormat.symmetrized(db).count() == 2)
  }

  test("cstring source: parse DB back from canonical strings (round trip)") {
    val strings = Seq(
      0L -> "a(x b)(y c(z d))",
      1L -> "c",
      2L -> "l(e l)(e l)")
    val db = CStringSource.fromStrings(spark, strings.toDS())
    val nverts = db.vertices.groupBy("graph_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nverts == Map(0L -> 4L, 1L -> 1L, 2L -> 3L))
    // re-canonicalizing the parsed trees reproduces each input string
    val back = db.vertices.as[CStringSource.CsVertex].collect().groupBy(_.graph_id)
    val edgesBy = db.edges.as[CStringSource.CsEdge].collect().groupBy(_.graph_id)
    for ((gid, cs) <- strings) {
      val vl = back(gid).sortBy(_.vid).map(_.vlabel).toSeq
      val es = edgesBy.getOrElse(gid, Array.empty).map(e => (e.src.toInt, e.dst.toInt, e.elabel)).toSeq
      val lt = graft.mining.SubtreeIso.LTree(vl.toArray, es.toArray)
      assert(graft.mining.SubtreeIso.canonicalString(lt) == cs, s"graph $gid")
    }
  }
}
