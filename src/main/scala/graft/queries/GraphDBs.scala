package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactional graph DBs derived from the driver's parquet tables with
  * SQL-expressible derivations AND closed-form structural invariants, so the
  * per-graph kernels (blocks, cycles, spanning trees, traceability, cpk)
  * get HARD DuckDB oracles: the Spark side runs the real kernel on the
  * materialized edge list; the oracle recomputes the invariant from the
  * generating parameters. A kernel bug breaks the match.
  *
  * Shared shape: one graph per customer; vertices = that customer's order
  * keys ranked 1..n by (o_orderdate, o_orderkey); structure is a
  * deterministic function of n (and labels = o_orderstatus by rank).
  * Mirrors the reference's per-graph transactional DB model
  * (reference `executables/cstringHelp.txt`, `levelwiseGraphMiningMain.c`).
  *
  * Round-6 shape (guide §2.4, remove shuffles outright): every DB used to be
  * a union of `rankedOrders` SELF-JOINS — each join re-deriving the window
  * and shuffling both sides (traceabilityDB stacked 14 of them; its kernel
  * query read 77 MB of shuffle for a 3 MB edge list). The per-customer
  * order sequence is tiny and already needed in rank order, so the DBs are
  * now generated from ONE `groupBy(gid)` pass: collect the date-sorted
  * orderkey array per customer and emit each edge family as a codegen'd
  * array expression over it (`zip_with` chains, `filter/transform` chords,
  * fixed-rank pairs). One exchange per DB, identical row multisets. */
object GraphDBs {

  import Tables.t

  /** (gid, k, rn, n, label): customer, orderkey, 1-based date rank,
    * total orders of the customer, o_orderstatus. */
  def rankedOrders(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("gid").orderBy("o_orderdate", "o_orderkey")
    t(s, dir, "orders")
      .select(col("o_custkey").cast("long").as("gid"),
        col("o_orderkey").cast("long").as("k"),
        col("o_orderstatus").cast("string").as("label"),
        col("o_orderdate"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("gid")))
      .select("gid", "k", "rn", "n", "label")
  }

  /** The same ranking in DuckDB SQL (CTE body named `ro`). */
  val rankedOrdersSql: String =
    """SELECT o_custkey::BIGINT AS gid, o_orderkey::BIGINT AS k,
      |       o_orderstatus AS label,
      |       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
      |       count(*) OVER (PARTITION BY o_custkey) AS n
      |FROM orders""".stripMargin

  /** (gid, n, ks): per customer the orderkeys in date-rank order, n >= 2
    * (single-order graphs have no edges and are absent from every DB —
    * exactly as under the join formulation, where no rn+1 partner exists).
    * `sort_array` on (date, key) structs reproduces the window's
    * `ORDER BY o_orderdate, o_orderkey` total order (keys are unique). */
  private def rankedArrays(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_custkey").cast("long").as("gid"),
        struct(col("o_orderdate").as("d"), col("o_orderkey").cast("long").as("k")).as("rec"))
      .groupBy("gid").agg(sort_array(collect_list(col("rec"))).as("recs"))
      .select(col("gid"), size(col("recs")).as("n"),
        expr("transform(recs, r -> r.k)").as("ks"))
      .where(col("n") >= 2)

  /** Explode an array-of-(src,dst)-structs column into edge rows. */
  private def edgesFrom(arr: DataFrame, edges: Column): DataFrame =
    arr.select(col("gid").as("graph_id"), explode(edges).as("e"))
      .select(col("graph_id"), col("e.s").as("src"), col("e.d").as("dst"))

  /** Path edges (rank i, i+1): pair ks with itself shifted by one. */
  private val chainExpr: Column =
    expr("zip_with(slice(ks, 1, n - 1), slice(ks, 2, n - 1), (a, b) -> named_struct('s', a, 'd', b))")

  /** Chord (rank 3j+1, 3j+3) for every complete rank triple — 0-based:
    * (i, i+2) with i % 3 == 0. */
  private val cactusChordExpr: Column =
    expr("filter(transform(ks, (x, i) -> IF(i % 3 = 0 AND i + 2 <= n - 1, " +
      "named_struct('s', x, 'd', ks[i + 2]), CAST(NULL AS STRUCT<s: BIGINT, d: BIGINT>))), " +
      "e -> e IS NOT NULL)")

  /** Fixed-rank edge (r1, r2), 1-based, guarded by `cond`. */
  private def rankEdge(r1: Column, r2: Column, cond: Column): Column =
    when(cond, array(struct(element_at(col("ks"), r1).as("s"), element_at(col("ks"), r2).as("d"))))
      .otherwise(array().cast("array<struct<s: bigint, d: bigint>>"))

  /** Cactus chain: path k_1..k_n (n>=2) plus a chord (k_{3j+1}, k_{3j+3})
    * for every complete rank triple — a chain of triangle blocks joined by
    * bridge edges. Invariants (t = n div 3): blocks = n-1-t, bridges =
    * n-1-2t, nontrivial blocks = t, spanning trees = 3^t, cactus,
    * outerplanar, per-block spanning-tree bound log = t*ln 3. */
  def cactusChainDB(s: SparkSession, dir: String): DataFrame =
    edgesFrom(rankedArrays(s, dir), concat(chainExpr, cactusChordExpr))

  /** Pure order rings: path closed into a cycle for n>=3 (chain alone for
    * n=2). Spanning trees of a ring = one per removable edge = n, every one
    * a path — the tpk pattern shape. */
  def orderCyclesDB(s: SparkSession, dir: String): DataFrame =
    edgesFrom(rankedArrays(s, dir),
      concat(chainExpr, rankEdge(col("n"), lit(1), col("n") >= 3)))

  /** Rings with a (1,3) chord (n>=4) — 1 or 3 simple cycles per graph
    * (the round-1 cycle-kernel DB, kept for f_cycle_counts / f_cpk). */
  def orderRingsDB(s: SparkSession, dir: String): DataFrame =
    edgesFrom(rankedArrays(s, dir),
      concat(chainExpr,
        rankEdge(lit(1), col("n"), col("n") >= 3),
        rankEdge(lit(1), lit(3), col("n") >= 4)))

  /** orderRingsDB plus a CROSSING chord (2,4) when n >= 5 and n % 5 == 0:
    * chords (1,3) and (2,4) interleave on the outer cycle, so those graphs
    * contain a K4 subdivision and are NOT outerplanar — negative cases for
    * the Mitchell test. */
  def ringsWithCrossingsDB(s: SparkSession, dir: String): DataFrame =
    edgesFrom(rankedArrays(s, dir),
      concat(chainExpr,
        rankEdge(lit(1), col("n"), col("n") >= 3),
        rankEdge(lit(1), lit(3), col("n") >= 4),
        rankEdge(lit(2), lit(4), col("n") >= 5 && (col("n") % 5) === 0)))

  /** Traceability DB — shape selected by n % 4:
    *  - n % 4 in {1,2}, or n < 7 with n % 4 == 0: cactus chain
    *    -> connected cactus, traceable, weakly traceable;
    *  - n % 4 == 0 and n >= 7: three triangles sharing vertex k_1
    *    (criticality 3) with the remaining orders chained off k_7
    *    -> cactus, NOT traceable, NOT weakly traceable;
    *  - n % 4 == 3 and n >= 4: ring plus (1,3) chord -> one non-cycle block:
    *    not a cactus, but weakly traceable (no critical vertices);
    *    n == 3 degenerates to a triangle -> traceable cactus. */
  def traceabilityDB(s: SparkSession, dir: String): DataFrame = {
    val chainCase = (col("n") % 4) === 1 || (col("n") % 4) === 2 ||
      ((col("n") % 4) === 0 && col("n") < 7)
    val starCase = (col("n") % 4) === 0 && col("n") >= 7
    val ringCase = (col("n") % 4) === 3
    val none = array().cast("array<struct<s: bigint, d: bigint>>")
    // star: triangles (1,2,3), (1,4,5), (1,6,7) sharing rank 1, tail chained
    // off rank 7 — fixed-rank pairs + the (i, i+1) pairs with i >= 7.
    val starFixed = Seq((1, 2), (2, 3), (1, 3), (1, 4), (4, 5), (1, 5), (1, 6), (6, 7), (1, 7))
      .map { case (a, b) => rankEdge(lit(a), lit(b), lit(true)) }
      .reduce(concat(_, _))
    val starTail = expr("filter(transform(ks, (x, i) -> IF(i >= 6 AND i + 1 <= n - 1, " +
      "named_struct('s', x, 'd', ks[i + 1]), CAST(NULL AS STRUCT<s: BIGINT, d: BIGINT>))), " +
      "e -> e IS NOT NULL)")
    val edges =
      when(chainCase, concat(chainExpr, cactusChordExpr))
        .when(starCase, concat(starFixed, starTail))
        .when(ringCase, concat(chainExpr,
          rankEdge(col("n"), lit(1), col("n") >= 3),
          rankEdge(lit(1), lit(3), col("n") >= 4)))
        .otherwise(none)
    edgesFrom(rankedArrays(s, dir), edges)
  }
}
