package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Reader/writer for the reference's native "aids" graph-database format
  * (reference `doc/content/pages/fileformat.md`; parser `loading.c:274-433`):
  * three ASCII lines per graph —
  *   `# id activity n m`
  *   n whitespace-separated vertex label strings
  *   m edge triples `v w label` with 1-based vertex indexing
  * — and a terminating `$` line.
  *
  * Scale design: the file is split into one record per graph by reading with
  * lineSep="#" (each graph block is self-describing), so parsing is
  * embarrassingly parallel and never needs a driver-side pass; the 1-based to
  * 0-based conversion mirrors reference `loading.c:413-414`.
  */
object AidsFormat {

  final case class AidsGraph(graph_id: Long, activity: Long, n: Int, m: Int)
  final case class AidsVertex(graph_id: Long, vno: Long, label: String)
  final case class AidsEdge(graph_id: Long, src: Long, dst: Long, label: String)
  final case class AidsDb(graphs: DataFrame, vertices: DataFrame, edges: DataFrame)

  private[sources] def parseBlock(block: String): Option[(AidsGraph, Seq[AidsVertex], Seq[AidsEdge])] = {
    val lines = block.split("\n").map(_.trim).filter(_.nonEmpty)
    if (lines.isEmpty || lines(0).startsWith("$")) return None
    val header = lines(0).split("\\s+").filter(_.nonEmpty)
    if (header.length < 4) return None
    val (id, activity, n, m) =
      (header(0).toLong, header(1).toLong, header(2).toInt, header(3).toInt)
    val g = AidsGraph(id, activity, n, m)
    val vlabels = if (n == 0) Array.empty[String]
      else lines.lift(1).map(_.split("\\s+").filter(_.nonEmpty)).getOrElse(Array.empty[String])
    val verts = vlabels.zipWithIndex.map { case (l, i) => AidsVertex(id, i.toLong, l) }.toSeq
    val etoks = if (m == 0) Array.empty[String]
      else lines.lift(2).map(_.split("\\s+").filter(_.nonEmpty)).getOrElse(Array.empty[String])
    val edges = etoks.grouped(3).filter(_.length == 3).map { t =>
      // 1-based in the file -> 0-based rows (loading.c:413-414)
      AidsEdge(id, t(0).toLong - 1, t(1).toLong - 1, t(2))
    }.toSeq
    Some((g, verts, edges))
  }

  /** Parse an aids-format file into (graphs, vertices, edges) DataFrames. */
  def read(spark: SparkSession, path: String): AidsDb = {
    import spark.implicits._
    // Each record = one graph block: "#" starts a header, so splitting on
    // "#" yields self-contained blocks (the leading fragment is empty).
    val blocks = spark.read.option("lineSep", "#").text(path)
      .as[String].filter(b => b != null && b.trim.nonEmpty && !b.trim.startsWith("$"))
    val parsed = blocks.flatMap(parseBlock(_)).persist()
    AidsDb(
      parsed.map(_._1).toDF(),
      parsed.flatMap(_._2).toDF(),
      parsed.flatMap(_._3).toDF())
  }

  /** Render a graph DB back to aids format (canonical ordering: vertices by
    * vno, each undirected edge once with src<dst, sorted — mirrors
    * `printGraphAidsFormat`, reference `graphPrinting.c:8-29`). Returns one
    * row per graph plus the `$` terminator, ordered by graph_id, so
    * `.coalesce(1).write.text` reproduces a byte-stable file. */
  def render(db: AidsDb): DataFrame = {
    val vlines = db.vertices.groupBy("graph_id")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("vno"), col("label"))))
        .getField("label")).as("vline"))
    val elines = db.edges
      .select(col("graph_id"),
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"), col("label"))
      .distinct()
      .groupBy("graph_id")
      .agg(sort_array(collect_list(struct(col("a"), col("b"), col("label")))).as("es"))
      .select(col("graph_id"),
        concat_ws(" ", transform(col("es"),
          e => concat_ws(" ", (e.getField("a") + 1).cast("string"),
            (e.getField("b") + 1).cast("string"), e.getField("label")))).as("eline"))
    db.graphs
      .join(vlines, Seq("graph_id"), "left")
      .join(elines, Seq("graph_id"), "left")
      .orderBy("graph_id")
      .select(concat_ws("\n",
        concat_ws(" ", lit("#"), col("graph_id"), col("activity"), col("n"), col("m")),
        coalesce(col("vline"), lit("")),
        coalesce(col("eline"), lit(""))).as("value"))
  }
}
