package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis for training-data pipelines: tokenization,
  * quality scoring, language-ID, fingerprinting. All built-in-function
  * compositions (codegen'd, no UDFs) so they run inside WholeStageCodegen
  * and push down/prune like any Catalyst expression. */
object TextOps {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Stopword-hit count against a fixed marker list. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit): _*))).cast("long")

  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Quality heuristics (length / token stats / stopword ratio), the
    * classic web-corpus filters. Returns a struct column. */
  def qualityStruct(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    struct(
      length(text).cast("long").as("n_chars"),
      n.as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      round(when(n > 0, length(text).cast("double") / n).otherwise(lit(0.0)), 6).as("chars_per_token"),
      round(when(n > 0, size(filter(toks, t => t.isin(EnStop.map(lit): _*))).cast("double") / n)
        .otherwise(lit(0.0)), 6).as("stopword_ratio"))
  }

  /** Marker-word language scores; langid = argmax score with deterministic
    * tie-break by language code, 'und' when all scores are 0 (n-gram
    * heuristic in its word-marker form — no external model). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "de", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  def langId(text: Column): Column = {
    val scored = LangMarkers.map { case (code, words) =>
      struct(markerHits(text, words).as("score"), lit(code).as("code"))
    }
    // argmax score, tie-break min code: sort by (-score, code) and take head
    val best = sort_array(array(scored: _*)).getItem(LangMarkers.size - 1)
    when(best.getField("score") > 0,
      // among max-score candidates choose the lexicographically smallest code:
      sort_array(filter(array(scored: _*), s => s.getField("score") === best.getField("score")))
        .getItem(0).getField("code"))
      .otherwise(lit("und"))
  }

  /** Whole-document fingerprint (content hash). */
  def fingerprint(text: Column): Column = md5(text)

  /** Token k-shingles as strings ("a b c"). */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n >= k,
      transform(sequence(lit(0), n - k), i =>
        concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array())
  }

  /** Rolling-fingerprint of the document: minimum shingle hash (the min-hash
    * of one permutation — stable textual form via md5 so SQL oracles agree). */
  def shingleFingerprint(text: Column, k: Int): Column =
    array_min(transform(shingles(text, k), s => md5(s)))
}
