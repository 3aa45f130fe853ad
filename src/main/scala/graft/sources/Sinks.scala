package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text sinks of the reference suite, each as a DataFrame -> line-DataFrame
  * transform (write with `.write.text(...)`; `coalesce(1)` for byte-stable
  * single-file goldens):
  *  - dot/graphviz (reference `graphPrinting.c:271-297`)
  *  - libsvm feature lines (reference `intSet.h:24` printIntSetAsLibSvm,
  *    used by `executables/patternExtractor.c:800`)
  *  - cstring `support \t id \t canonical-string` (reference
  *    `doc/content/pages/fileformat.md` cstring format)
  *  - gaston format (reference `executables/formatConverter.c`)
  */
object Sinks {

  /** Directed dot: one digraph per graph_id. Input: (graph_id, src, dst). */
  def dotLines(edges: DataFrame, directed: Boolean = true): DataFrame = {
    val arrow = if (directed) "->" else "--"
    val kind = if (directed) "digraph" else "graph"
    edges.groupBy("graph_id")
      .agg(concat_ws("\n", sort_array(collect_list(
        concat(col("src"), lit(s" $arrow "), col("dst"), lit(";"))))).as("body"))
      .orderBy("graph_id")
      .select(concat(lit(s"$kind g"), col("graph_id"), lit(" {\n"), col("body"), lit("\n}")).as("value"))
  }

  /** libsvm: `label idx:val idx:val ...` with 1-based sorted indices.
    * Input: (label, features ARRAY<DOUBLE>) dense, or (label, idx, val) sparse. */
  def libsvmLinesDense(rows: DataFrame, labelCol: String, featuresCol: String): DataFrame =
    rows.select(concat_ws(" ",
      col(labelCol).cast("string"),
      concat_ws(" ", zip_with(
        sequence(lit(1), size(col(featuresCol))),
        col(featuresCol),
        (i, v) => concat(i, lit(":"), v)))).as("value"))

  def libsvmLinesSparse(rows: DataFrame, labelCol: String, idxCol: String, valCol: String): DataFrame =
    rows.groupBy(col(labelCol).as("_label"))
      .agg(sort_array(collect_list(struct(col(idxCol).as("i"), col(valCol).as("v")))).as("fs"))
      .select(concat_ws(" ",
        col("_label").cast("string"),
        concat_ws(" ", transform(col("fs"), f =>
          concat(f.getField("i"), lit(":"), f.getField("v"))))).as("value"))

  /** cstring sink: `support \t id \t canonicalString` (tab-separated). */
  def cstringLines(patterns: DataFrame, supportCol: String, idCol: String, csCol: String): DataFrame =
    patterns.select(concat_ws("\t",
      col(supportCol).cast("string"), col(idCol).cast("string"), col(csCol)).as("value"))

  /** gaston format: `t # id`, `v vno label`, `e src dst label` lines per
    * graph (the aids->gaston conversion of the reference's gfc tool). */
  def gastonLines(db: AidsFormat.AidsDb): DataFrame = {
    val vl = db.vertices.groupBy("graph_id")
      .agg(concat_ws("\n", sort_array(collect_list(
        struct(col("vno"), col("label")))).cast("array<struct<vno:long,label:string>>")
        .withField("x", lit(1)).getField("x")).as("_drop"),
        concat_ws("\n", transform(sort_array(collect_list(struct(col("vno"), col("label")))),
          v => concat_ws(" ", lit("v"), v.getField("vno"), v.getField("label")))).as("vlines"))
      .select(col("graph_id"), col("vlines"))
    val el = db.edges.groupBy("graph_id")
      .agg(concat_ws("\n", transform(sort_array(collect_list(struct(col("src"), col("dst"), col("label")))),
        e => concat_ws(" ", lit("e"), e.getField("src"), e.getField("dst"), e.getField("label")))).as("elines"))
    db.graphs
      .join(vl, Seq("graph_id"), "left")
      .join(el, Seq("graph_id"), "left")
      .orderBy("graph_id")
      .select(concat_ws("\n",
        concat_ws(" ", lit("t"), lit("#"), col("graph_id")),
        coalesce(col("vlines"), lit("")),
        coalesce(col("elines"), lit(""))).as("value"))
  }

  /** JSON sink (outerplanaritytest shape): one JSON object per graph with
    * its measures — built on to_json(struct(...)). */
  def jsonLines(measures: DataFrame): DataFrame =
    measures.select(to_json(struct(measures.columns.map(col): _*)).as("value"))
}
