package graft.ingest

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** html BINARY -> extracted text, a frozen pure function of the bytes
  * (BASELINE.json input_hint: byte-identical extracted text per url).
  *
  * Extraction semantics (deterministic, no external parser):
  *  1. drop <script>/<style> elements including content,
  *  2. strip all remaining tags,
  *  3. decode the five standard entities (&amp; &lt; &gt; &quot; &#39;
  *     last, so entity-encoded markup never re-enters as markup),
  *  4. collapse whitespace runs to single spaces and trim.
  *
  * Implemented twice on purpose: [[extractText]] as a pure Scala function
  * (the frozen reference; golden byte-equality tests pin it) and
  * [[extractTextCol]] as a Catalyst column expression (codegen'd
  * regexp_replace chain) proven equal to the Scala form on the fixtures —
  * the column form is what production pipelines use. */
object TextExtractor {

  private val scriptStyle = "(?is)<(script|style)\\b[^>]*>.*?</\\1>".r
  private val tags = "(?s)<[^>]*>".r
  private val wsRuns = "\\s+".r

  /** Frozen pure function: same bytes in -> same string out, everywhere. */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, StandardCharsets.UTF_8)
    val noScript = scriptStyle.replaceAllIn(s, " ")
    val noTags = tags.replaceAllIn(noScript, " ")
    val decoded = noTags
      .replace("&lt;", "<")
      .replace("&gt;", ">")
      .replace("&quot;", "\"")
      .replace("&#39;", "'")
      .replace("&amp;", "&")
    wsRuns.replaceAllIn(decoded, " ").trim
  }

  /** Catalyst form of [[extractText]] (identical semantics, codegen'd). */
  def extractTextCol(html: Column): Column = {
    val s = decode(html, "UTF-8")
    val noScript = regexp_replace(s, "(?is)<(script|style)\\b[^>]*>.*?</\\1>", " ")
    val noTags = regexp_replace(noScript, "(?s)<[^>]*>", " ")
    val decoded =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        noTags, "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"), "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
