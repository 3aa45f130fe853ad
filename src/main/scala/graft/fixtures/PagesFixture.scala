package graft.fixtures

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Schemas.Page

/** Deterministic synthetic Common-Crawl-style pages table whose hyperlinks
  * encode a given fixture graph (FIXTURES.md §1). The `text` column holds
  * the golden extraction output (byte-identical invariant per url). */
object PagesFixture {

  def url(v: Long): String = s"http://example.org/page/$v"

  /** html for vertex v linking to `targets`; includes script/style/entity
    * noise so the extractor's semantics are actually exercised. */
  def html(v: Long, targets: Seq[Long]): String = {
    val links = targets.map(t => s"""  <a href="${url(t)}">go to $t</a>""").mkString("\n")
    s"""<html><head><title>Page $v</title>
       |<style>body { color: red; }</style>
       |<script type="text/javascript">var x = $v &amp;&amp; 1;</script>
       |</head>
       |<body>
       |<h1>Page $v</h1>
       |<p>Content of page $v &amp; friends &lt;here&gt;.</p>
       |$links
       |</body></html>""".stripMargin
  }

  /** Golden extracted text for [[html]] (frozen expectation). */
  def expectedText(v: Long, targets: Seq[Long]): String = {
    val links = targets.map(t => s"go to $t").mkString(" ")
    val tail = if (links.nonEmpty) s" $links" else ""
    s"Page $v Page $v Content of page $v & friends <here>.$tail"
  }

  /** Build the pages table for a directed fixture edge list. */
  def pages(spark: SparkSession, edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val out = edges.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).sorted }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    verts.map { v =>
      val targets = out.getOrElse(v, Seq.empty)
      Page(url(v), new Timestamp(1700000000000L + v * 1000),
        html(v, targets).getBytes("UTF-8"), expectedText(v, targets), "en")
    }.toDF()
  }
}
