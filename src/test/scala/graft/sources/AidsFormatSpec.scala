package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class AidsFormatSpec extends AnyFunSuite with SparkTestBase {

  // A small DB in the reference's 3-line format (fileformat.md): header,
  // vertex labels, 1-based edge triples; '$' terminator.
  private val sample =
    """# 1 0 3 2
      |C O H
      |1 2 s 2 3 d
      |# 2 1 2 1
      |N N
      |1 2 t
      |$
      |""".stripMargin

  test("read parses graphs/vertices/edges with 0-based conversion (loading.c:413)") {
    val dir = java.nio.file.Files.createTempDirectory("aids").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "db.txt"), sample)
    val db = AidsFormat.read(spark, s"$dir/db.txt")
    val gs = db.graphs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(gs == Set((1L, 0L, 3, 2), (2L, 1L, 2, 1)))
    val vs = db.vertices.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(vs == Set((1L, 0L, "C"), (1L, 1L, "O"), (1L, 2L, "H"), (2L, 0L, "N"), (2L, 1L, "N")))
    val es = db.edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(es == Set((1L, 0L, 1L, "s"), (1L, 1L, 2L, "d"), (2L, 0L, 1L, "t")))
  }

  test("render -> read round-trips the database") {
    val dir = java.nio.file.Files.createTempDirectory("aids2").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "db.txt"), sample)
    val db = AidsFormat.read(spark, s"$dir/db.txt")
    val rendered = AidsFormat.render(db).collect().map(_.getString(0)).mkString("\n") + "\n$\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "db2.txt"), rendered)
    val db2 = AidsFormat.read(spark, s"$dir/db2.txt")
    assert(db2.graphs.collect().toSet == db.graphs.collect().toSet)
    assert(db2.vertices.collect().toSet == db.vertices.collect().toSet)
    assert(db2.edges.collect().toSet == db.edges.collect().toSet)
  }
}
