package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * (reference `executables/cstringHelp.txt`, `levelwiseGraphMiningMain.c`). */
object GraphDBs {

  import Tables.t

  /** (gid, k, rn, n, label): customer, orderkey, 1-based date rank,
    * total orders of the customer, o_orderstatus. */
  def rankedOrders(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("gid").orderBy("o_orderdate", "o_orderkey")
    t(s, dir, "orders")
      .select(col("o_custkey").cast("long").as("gid"),
        col("o_orderkey").cast("long").as("k"),
        col("o_orderstatus").cast("string").as("label"),
        col("o_orderdate"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("gid")))
      .select("gid", "k", "rn", "n", "label")
  }

  /** The same ranking in DuckDB SQL (CTE body named `ro`). */
  val rankedOrdersSql: String =
    """SELECT o_custkey::BIGINT AS gid, o_orderkey::BIGINT AS k,
      |       o_orderstatus AS label,
      |       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
      |       count(*) OVER (PARTITION BY o_custkey) AS n
      |FROM orders""".stripMargin

  private def chainEdges(ro: DataFrame): DataFrame =
    ro.as("a").join(ro.as("b"),
        col("a.gid") === col("b.gid") && col("b.rn") === col("a.rn") + 1)
      .select(col("a.gid").as("graph_id"), col("a.k").as("src"), col("b.k").as("dst"))

  private def edgeAt(ro: DataFrame, rnSrc: org.apache.spark.sql.Column,
      rnDst: org.apache.spark.sql.Column, cond: org.apache.spark.sql.Column): DataFrame =
    ro.as("a").join(ro.as("b"),
        col("a.gid") === col("b.gid") && col("a.rn") === rnSrc && col("b.rn") === rnDst)
      .where(cond)
      .select(col("a.gid").as("graph_id"), col("a.k").as("src"), col("b.k").as("dst"))

  /** Cactus chain: path k_1..k_n (n>=2) plus a chord (k_{3j+1}, k_{3j+3})
    * for every complete rank triple — a chain of triangle blocks joined by
    * bridge edges. Invariants (t = n div 3): blocks = n-1-t, bridges =
    * n-1-2t, nontrivial blocks = t, spanning trees = 3^t, cactus,
    * outerplanar, per-block spanning-tree bound log = t*ln 3. */
  def cactusChainDB(s: SparkSession, dir: String): DataFrame = {
    val ro = rankedOrders(s, dir)
    val chain = chainEdges(ro)
    val chords = ro.as("a").join(ro.as("b"),
        col("a.gid") === col("b.gid") && col("b.rn") === col("a.rn") + 2)
      .where((col("a.rn") % 3) === 1)
      .select(col("a.gid").as("graph_id"), col("a.k").as("src"), col("b.k").as("dst"))
    chain.union(chords)
  }

  /** Pure order rings: path closed into a cycle for n>=3 (chain alone for
    * n=2). Spanning trees of a ring = one per removable edge = n, every one
    * a path — the tpk pattern shape. */
  def orderCyclesDB(s: SparkSession, dir: String): DataFrame = {
    val ro = rankedOrders(s, dir)
    chainEdges(ro).union(edgeAt(ro, col("b.n"), lit(1), col("a.n") >= 3))
  }

  /** Rings with a (1,3) chord (n>=4) — 1 or 3 simple cycles per graph
    * (the round-1 cycle-kernel DB, kept for f_cycle_counts / f_cpk). */
  def orderRingsDB(s: SparkSession, dir: String): DataFrame = {
    val ro = rankedOrders(s, dir)
    chainEdges(ro)
      .union(edgeAt(ro, lit(1), col("b.n"), col("a.n") >= 3))
      .union(edgeAt(ro, lit(1), lit(3), col("a.n") >= 4))
  }

  /** orderRingsDB plus a CROSSING chord (2,4) when n >= 5 and n % 5 == 0:
    * chords (1,3) and (2,4) interleave on the outer cycle, so those graphs
    * contain a K4 subdivision and are NOT outerplanar — negative cases for
    * the Mitchell test. */
  def ringsWithCrossingsDB(s: SparkSession, dir: String): DataFrame = {
    val ro = rankedOrders(s, dir)
    orderRingsDB(s, dir)
      .union(edgeAt(ro, lit(2), lit(4), col("a.n") >= 5 && (col("a.n") % 5) === 0))
  }

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
    val ro = rankedOrders(s, dir)
    val chainCase = chainEdges(ro.where((col("n") % 4) === 1 || (col("n") % 4) === 2 ||
      ((col("n") % 4) === 0 && col("n") < 7)))
    val chordsCase = {
      val base = ro.where((col("n") % 4) === 1 || (col("n") % 4) === 2 ||
        ((col("n") % 4) === 0 && col("n") < 7))
      base.as("a").join(base.as("b"),
          col("a.gid") === col("b.gid") && col("b.rn") === col("a.rn") + 2)
        .where((col("a.rn") % 3) === 1)
        .select(col("a.gid").as("graph_id"), col("a.k").as("src"), col("b.k").as("dst"))
    }
    val star = ro.where((col("n") % 4) === 0 && col("n") >= 7)
    def se(r1: Int, r2: Int) = star.as("a").join(star.as("b"),
        col("a.gid") === col("b.gid") && col("a.rn") === r1 && col("b.rn") === r2)
      .select(col("a.gid").as("graph_id"), col("a.k").as("src"), col("b.k").as("dst"))
    val starEdges = Seq((1, 2), (2, 3), (1, 3), (1, 4), (4, 5), (1, 5), (1, 6), (6, 7), (1, 7))
      .map { case (a, b) => se(a, b) }.reduce(_.union(_))
    val starTail = star.as("a").join(star.as("b"),
        col("a.gid") === col("b.gid") && col("b.rn") === col("a.rn") + 1 && col("a.rn") >= 7)
      .select(col("a.gid").as("graph_id"), col("a.k").as("src"), col("b.k").as("dst"))
    val ringCase = {
      val base = ro.where((col("n") % 4) === 3)
      val ch = base.as("a").join(base.as("b"),
          col("a.gid") === col("b.gid") && col("b.rn") === col("a.rn") + 1)
        .select(col("a.gid").as("graph_id"), col("a.k").as("src"), col("b.k").as("dst"))
      val close = base.as("a").join(base.as("b"),
          col("a.gid") === col("b.gid") && col("a.rn") === col("b.n") && col("b.rn") === 1)
        .where(col("a.n") >= 3)
        .select(col("a.gid").as("graph_id"), col("a.k").as("src"), col("b.k").as("dst"))
      val chord = base.as("a").join(base.as("b"),
          col("a.gid") === col("b.gid") && col("a.rn") === 1 && col("b.rn") === 3)
        .where(col("a.n") >= 4)
        .select(col("a.gid").as("graph_id"), col("a.k").as("src"), col("b.k").as("dst"))
      ch.union(close).union(chord)
    }
    chainCase.union(chordsCase).union(starEdges).union(starTail).union(ringCase)
  }
}
