package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Reader for the reference's "simple" one-graph-per-file text format
  * (reference `loading.c:18-90` readSimpleFormat):
  *   `n m`
  *   n lines `vertexNumber label`
  *   m lines `src dst edgeLabel`
  * Vertex numbers are 0-based and explicit; labels are whitespace-free.
  *
  * Spark shape: one graph per input STRING (file or row), parsed in
  * executors; `read` uses spark.read.text with wholetext so a directory of
  * simple-format files becomes a graph DB in one scan.
  */
object SimpleFormat {

  final case class SimpleVertex(graph_id: Long, vno: Long, label: String)
  final case class SimpleEdge(graph_id: Long, src: Long, dst: Long, label: String)
  final case class SimpleDb(vertices: DataFrame, edges: DataFrame)

  /** Parse one simple-format document. Token-stream based like the
    * reference's fscanf loop, so arbitrary whitespace/newline layout works. */
  private[sources] def parseDoc(graphId: Long, doc: String): (Seq[SimpleVertex], Seq[SimpleEdge]) = {
    val tok = doc.split("\\s+").filter(_.nonEmpty)
    if (tok.length < 2) return (Nil, Nil)
    val n = tok(0).toInt
    val m = tok(1).toInt
    var i = 2
    val verts = (0 until n).map { _ =>
      val v = SimpleVertex(graphId, tok(i).toLong, tok(i + 1)); i += 2; v
    }
    val edges = (0 until m).map { _ =>
      val e = SimpleEdge(graphId, tok(i).toLong, tok(i + 1).toLong, tok(i + 2)); i += 3; e
    }
    (verts, edges)
  }

  /** One graph per file under `path` (graph_id = dense rank of file name —
    * deterministic under any partitioning). */
  def read(spark: SparkSession, path: String): SimpleDb = {
    import spark.implicits._
    val docs: Dataset[(String, String)] = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("f"), col("value")).as[(String, String)]
    // dense file rank via sort: file count is small metadata, the per-file
    // parse is the parallel part
    val withId = docs.withColumn("graph_id",
      dense_rank().over(org.apache.spark.sql.expressions.Window.orderBy("f")).cast("long") - 1)
      .select(col("graph_id"), col("value")).as[(Long, String)]
    val parsed = withId.map { case (gid, doc) => parseDoc(gid, doc) }.persist()
    SimpleDb(parsed.flatMap(_._1).toDF(), parsed.flatMap(_._2).toDF())
  }

  /** Undirected view: each edge mirrored, as the reference's
    * `undirected=1` path adds both arcs (loading.c:63-69). */
  def symmetrized(db: SimpleDb): DataFrame = {
    val e = db.edges
    e.union(e.select(col("graph_id"), col("dst").as("src"), col("src").as("dst"), col("label")))
  }
}
