package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** AIDS99 label decode tables (reference `loading.c:558-845`
  * aids99VertexLabel / aids99EdgeLabel): the numeric vertex labels of the
  * AIDS99 chemical dataset map to element symbols; edge labels are the bond
  * orders verbatim.
  *
  * Note a latent reference bug deliberately NOT ported: `loading.c`'s switch
  * is missing `break` from case 37 onward, so the C code returns the last
  * fallen-through symbol ("AC") for every code >= 37. The intended per-code
  * mapping (each case's own sprintf) is implemented here. */
object AidsLabels {

  /** code -> element symbol, 1..63 (reference `loading.c:568-845`). */
  val VertexTable: Map[Int, String] = Map(
    1 -> "H", 2 -> "C", 3 -> "O", 4 -> "CU", 5 -> "N", 6 -> "S", 7 -> "P",
    8 -> "CL", 9 -> "ZN", 10 -> "B", 11 -> "BR", 12 -> "CO", 13 -> "MN",
    14 -> "AS", 15 -> "AL", 16 -> "NI", 17 -> "SE", 18 -> "SI", 19 -> "V",
    20 -> "SN", 21 -> "I", 22 -> "F", 23 -> "LI", 24 -> "SB", 25 -> "FE",
    26 -> "PD", 27 -> "HG", 28 -> "BI", 29 -> "NA", 30 -> "CA", 31 -> "TI",
    32 -> "ZR", 33 -> "HO", 34 -> "GE", 35 -> "PT", 36 -> "RU", 37 -> "RH",
    38 -> "CR", 39 -> "GA", 40 -> "K", 41 -> "AG", 42 -> "AU", 43 -> "TB",
    44 -> "IR", 45 -> "TE", 46 -> "MG", 47 -> "PB", 48 -> "W", 49 -> "CS",
    50 -> "MO", 51 -> "RE", 52 -> "CD", 53 -> "OS", 54 -> "PR", 55 -> "ND",
    56 -> "SM", 57 -> "GD", 58 -> "YB", 59 -> "ER", 60 -> "U", 61 -> "TL",
    62 -> "NB", 63 -> "AC")

  /** Decode a numeric vertex-label column to its element symbol (null for
    * unknown codes, mirroring the reference's uninitialized default). */
  def vertexElement(code: Column): Column =
    element_at(typedLit(VertexTable), code.cast("int"))

  /** Edge labels pass through as their decimal string (reference
    * `loading.c:558` aids99EdgeLabel: sprintf("%i")). */
  def edgeLabel(code: Column): Column = code.cast("int").cast("string")

  /** The same decode as a SQL CASE expression over `col` — for DuckDB
    * oracles that must reproduce the mapping independently. */
  def vertexElementSql(col: String): String =
    VertexTable.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN $k THEN '$v'" }
      .mkString(s"CASE $col ", " ", " END")
}
