package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.mining.SubtreeIso

/** Canonical-string DB source — the reader side of the cstring format
  * (reference `lwm_initAndCollect.c:214` getDBfromCanonicalStrings,
  * `cs_Parsing.c:131` parseCString): one canonical string per row/line is
  * parsed back into a labeled tree, yielding the (vertices, edges) DB shape
  * the miners consume. Embarrassingly parallel: each string is
  * self-contained. */
object CStringSource {

  final case class CsVertex(graph_id: Long, vid: Long, vlabel: String)
  final case class CsEdge(graph_id: Long, src: Long, dst: Long, elabel: String)
  final case class CsDb(vertices: DataFrame, edges: DataFrame)

  /** Build a graph DB from (graph_id, cstring) rows. */
  def fromStrings(spark: SparkSession, rows: Dataset[(Long, String)]): CsDb = {
    import spark.implicits._
    val parsed = rows.map { case (gid, cs) =>
      val t = SubtreeIso.parseCanonicalString(cs)
      (gid,
        t.vlabels.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toSeq,
        t.edges.map { case (a, b, l) => (a.toLong, b.toLong, l) }.toSeq)
    }.persist()
    CsDb(
      parsed.flatMap { case (g, vs, _) => vs.map { case (i, l) => CsVertex(g, i, l) } }.toDF(),
      parsed.flatMap { case (g, _, es) => es.map { case (a, b, l) => CsEdge(g, a, b, l) } }.toDF())
  }

  /** One cstring per text line; graph_id = line's monotonically increasing
    * split-stable id. */
  def read(spark: SparkSession, path: String): CsDb = {
    import spark.implicits._
    val rows = spark.read.text(path)
      .select(monotonically_increasing_id().as("graph_id"), trim(col("value")).as("cs"))
      .where(length(col("cs")) > 0)
      .as[(Long, String)]
    fromStrings(spark, rows)
  }
}
