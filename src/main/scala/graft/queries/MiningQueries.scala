package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mining-layer coverage (SURVEY.md §2.4/§2.7 and the lwg/ts/gpe shapes):
  * frequent labels, canonical triangle fingerprints, per-graph tree kernels
  * over a transactional graph DB derived from the relational tables. */
object MiningQueries {

  import Tables.t

  /** Transactional graph DB derived from orders: one graph per order-priority
    * class is too few; instead one graph per customer: vertices = the
    * customer's orders chained by date (a path/tree per graph). Derivable in
    * SQL, small graphs, many of them — the reference's DB shape. */
  private def orderChainEdges(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .withColumn("prev", lag(col("o_orderkey"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("o_custkey").cast("long").as("graph_id"),
        col("prev").cast("long").as("src"), col("o_orderkey").cast("long").as("dst"))
  }

  /** Graph DB: one graph per nation — that nation's co-supplier subgraph
    * (cyclic, block-rich; shared by f_block_measures / f_outerplanarity). */
  private def nationCoSupplierDB(s: SparkSession, dir: String): DataFrame = {
    val lab = t(s, dir, "supplier")
      .select(col("s_suppkey").as("vid"), col("s_nationkey").cast("long").as("nation"))
    Tables.coSupplierEdges(s, dir)
      .join(lab.select(col("vid").as("src"), col("nation").as("gn")), "src")
      .join(lab.select(col("vid").as("dst"), col("nation").as("gn2")), "dst")
      .where(col("gn") === col("gn2"))
      .select(col("gn").as("graph_id"), col("src"), col("dst"))
  }

  /** Graph DB with bounded cycle structure: per customer, the date-ordered
    * chain of their orders CLOSED into a ring (customers with >= 3 orders),
    * plus a chord from the 1st to the 3rd order when >= 4 orders — so each
    * graph has 1 or 3 simple cycles plus bridge tails, exercising the cycle
    * kernels without the exponential blowup a dense DB would cause. */
  private def customerOrderRings(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("gid").orderBy("o_orderdate", "o_orderkey")
    val o = t(s, dir, "orders")
      .select(col("o_custkey").cast("long").as("gid"), col("o_orderkey").cast("long").as("k"),
        col("o_orderdate"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
    val n = o.groupBy("gid").agg(max("rn").as("n"))
    val chain = o.withColumn("prev", lag(col("k"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("gid").as("graph_id"), col("prev").as("src"), col("k").as("dst"))
    def at(rnVal: org.apache.spark.sql.Column, name: String) =
      o.join(n, "gid").where(col("rn") === rnVal).select(col("gid"), col("k").as(name))
    val ring = at(lit(1), "first").join(at(col("n"), "last"), "gid")
      .join(n, "gid").where(col("n") >= 3)
      .select(col("gid").as("graph_id"), col("first").as("src"), col("last").as("dst"))
    val chord = at(lit(1), "first").join(at(lit(3), "third"), "gid")
      .join(n, "gid").where(col("n") >= 4)
      .select(col("gid").as("graph_id"), col("first").as("src"), col("third").as("dst"))
    chain.union(ring).union(chord)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // frequent vertex labels across the graph DB (lwm_initAndCollect.c:246:
    // per-graph distinct -> global count -> threshold)
    "f_frequent_labels" -> ((s, dir) => {
      val labels = t(s, dir, "orders")
        .select(col("o_custkey").cast("long").as("graph_id"), col("o_orderpriority").as("label"))
      labels.distinct()
        .groupBy("label").agg(count(lit(1)).as("support"))
        .where(col("support") >= 500)
        .orderBy("label")
    }),

    // frequent edge label triples (minLabel, edgeLabel, maxLabel) analogue:
    // normalized (status, priority) pairs on order edges
    "f_frequent_edges" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val pairs = o.as("a").join(o.as("b"),
          col("a.o_custkey") === col("b.o_custkey") && col("a.o_orderkey") < col("b.o_orderkey"))
        .select(col("a.o_custkey").cast("long").as("graph_id"),
          least(col("a.o_orderstatus"), col("b.o_orderstatus")).as("minLabel"),
          greatest(col("a.o_orderstatus"), col("b.o_orderstatus")).as("maxLabel"))
      pairs.distinct()
        .groupBy("minLabel", "maxLabel").agg(count(lit(1)).as("support"))
        .where(col("support") >= 100)
        .orderBy("minLabel", "maxLabel")
    }),

    // canonical triangle fingerprint: min md5 over the 6 rotations/reflections
    // of the label triple (reference patternExtractor.c:121-177 fingerprintTriple)
    "f_triangle_fingerprint" -> ((s, dir) => {
      // The fingerprint (min over all 6 md5'd permutations) is a function of
      // the label MULTISET only, so count triangles per sorted label triple
      // first (codegen'd array_sort on 3 elements, partial agg collapses the
      // millions of triangles to <= |labels|^3/6 classes) and hash the few
      // surviving classes — not each triangle (md5 x6 per triangle would
      // dominate the whole pipeline at scale).
      val tri = graft.algo.Triangles.enumerate(s, Tables.coSupplierEdges(s, dir))
      val lab = t(s, dir, "supplier").select(col("s_suppkey").as("vid"), col("s_nationkey").cast("string").as("lab"))
      val byTriple = tri
        .join(broadcast(lab.select(col("vid").as("a"), col("lab").as("la"))), "a")
        .join(broadcast(lab.select(col("vid").as("b"), col("lab").as("lb"))), "b")
        .join(broadcast(lab.select(col("vid").as("c"), col("lab").as("lc"))), "c")
        .select(array_sort(array(col("la"), col("lb"), col("lc"))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("n"))
      val rots = Seq((0, 1, 2), (1, 2, 0), (2, 0, 1), (0, 2, 1), (2, 1, 0), (1, 0, 2))
        .map { case (x, y, z) =>
          md5(concat_ws("|", col("t").getItem(x), col("t").getItem(y), col("t").getItem(z)))
        }
      byTriple
        .select(least(rots: _*).as("fingerprint"), col("n"))
        .groupBy("fingerprint").agg(sum("n").as("n"))
        .orderBy("fingerprint")
    }),

    // per-graph canonical strings over the order-chain DB (cstring tool)
    "f_cstring" -> ((s, dir) => {
      val e = orderChainEdges(s, dir)
      val labels = e.select(col("graph_id"), col("src").as("vno"))
        .union(e.select(col("graph_id"), col("dst")))
        .distinct().withColumn("label", lit("o"))
      graft.trees.TreeOps.canonicalStrings(s, e, labels)
        .groupBy("cstring").agg(count(lit(1)).as("n_graphs"))
        .orderBy("cstring")
    }),

    // ts-equivalent: spanning-tree sampling per graph, distinct-class counts
    // (randomized but seeded; no SQL oracle -> rows-only check)
    "f_tree_sampling" -> ((s, dir) => {
      graft.trees.TreeOps.sampleSpanningTrees(s, orderChainEdges(s, dir), k = 3, seed = 42L)
        .select(col("graph_id"), col("n_distinct"))
        .orderBy("graph_id")
    }),

    // full levelwise frequent subtree mining (lwg, the reference's flagship:
    // levelwiseGraphMiningMain.c) over a star-forest DB: one graph per
    // selected order, center = the order (label o_orderstatus), leaves = its
    // lineitems (label l_returnflag), edge label l_linestatus. Subtree-iso
    // embedding kernel -> rows-only check (no SQL oracle); the full pipeline
    // is oracle-checked in ScalaTest against a brute-force subtree enumerator.
    "f_lwg_mine" -> ((s, dir) => {
      val orders = t(s, dir, "orders").where(col("o_orderkey") % 8 === 0)
      val li = t(s, dir, "lineitem").join(
        orders.select(col("o_orderkey").as("l_orderkey")), "l_orderkey")
      val verts = orders.select(col("o_orderkey").cast("long").as("graph_id"),
          lit(0L).as("vid"), col("o_orderstatus").cast("string").as("vlabel"))
        .union(li.select(col("l_orderkey").cast("long"),
          col("l_linenumber").cast("long"), col("l_returnflag").cast("string")))
      val edges = li.select(col("l_orderkey").cast("long").as("graph_id"),
        lit(0L).as("src"), col("l_linenumber").cast("long").as("dst"),
        col("l_linestatus").cast("string").as("elabel"))
      val nGraphs = orders.count()
      graft.mining.FrequentSubtrees.mine(s, verts, edges,
        threshold = math.max(1L, nGraphs / 10), maxPatternSize = 3)
        .orderBy("size", "cstring")
    }),

    // simple-cycle counts per graph, exact and up-to-isomorphism (gf -f
    // numberOfSimpleCycles / numberOfNonIsoCycles, reference listCycles.c:10,:57).
    // Enumeration kernel -> rows-only check.
    "f_cycle_counts" -> ((s, dir) => {
      import s.implicits._
      val labels = t(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("vid"), col("o_orderstatus").cast("string").as("label"))
      customerOrderRings(s, dir)
        .join(labels.withColumnRenamed("vid", "src").withColumnRenamed("label", "sl"), "src")
        .join(labels.withColumnRenamed("vid", "dst").withColumnRenamed("label", "dl"), "dst")
        .select(col("graph_id"), col("src"), col("dst"), col("sl"), col("dl"))
        .as[(Long, Long, Long, String, String)]
        .groupByKey(_._1)
        .mapGroups { (gid, it) =>
          val rows = it.toSeq
          val es = rows.map(r => (r._2, r._3))
          val lab = rows.flatMap(r => Seq(r._2 -> r._4, r._3 -> r._5)).toMap
          val cycles = graft.trees.GraphKernels.simpleCycles(es)
          (gid,
            cycles.map(_.size.toLong).getOrElse(-1L),
            cycles.map(_.map(c => graft.trees.GraphKernels.cycleCanonicalString(c, lab))
              .distinct.size.toLong).getOrElse(-1L))
        }
        .toDF("graph_id", "n_simple_cycles", "n_noniso_cycles")
        .orderBy("graph_id")
    }),

    // cyclic pattern kernel features per graph (cpk executable, reference
    // cpk.c:16-80: canonical strings of simple cycles + bridge-forest trees).
    // Rows-only check.
    "f_cpk" -> ((s, dir) => {
      import s.implicits._
      val labels = t(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("vid"), col("o_orderstatus").cast("string").as("label"))
      customerOrderRings(s, dir)
        .join(labels.withColumnRenamed("vid", "src").withColumnRenamed("label", "sl"), "src")
        .join(labels.withColumnRenamed("vid", "dst").withColumnRenamed("label", "dl"), "dst")
        .select(col("graph_id"), col("src"), col("dst"), col("sl"), col("dl"))
        .as[(Long, Long, Long, String, String)]
        .groupByKey(_._1)
        .flatMapGroups { (gid, it) =>
          val rows = it.toSeq
          val es = rows.map(r => (r._2, r._3))
          val lab = rows.flatMap(r => Seq(r._2 -> r._4, r._3 -> r._5)).toMap
          graft.trees.GraphKernels.cpkFeatures(es, lab).getOrElse(Nil).map(f => (gid, f))
        }
        .toDF("graph_id", "feature")
        .orderBy("graph_id", "feature")
    }),

    // outerplanarity + Hamiltonian cycles per graph (the reference's
    // outerplanaritytest executable, JSON sink shape). Mitchell kernel ->
    // rows-only check.
    "f_outerplanarity" -> ((s, dir) => {
      import s.implicits._
      nationCoSupplierDB(s, dir)
        .as[(Long, Long, Long)]
        .groupByKey(_._1)
        .mapGroups { (gid, it) =>
          val r = graft.trees.GraphKernels.outerplanarity(it.map(t => (t._2, t._3)).toSeq)
          (gid, r.isOuterplanar,
            r.hamiltonianCycles.map(_.mkString("[", ",", "]")).mkString("[", ",", "]"))
        }
        .toDF("graph_id", "is_outerplanar", "hamiltonian_cycles")
        .orderBy("graph_id")
    }),

    // gf block measures over a graph DB (one graph per nation: that nation's
    // co-supplier subgraph). Tarjan kernel -> rows-only check (no SQL oracle).
    "f_block_measures" -> ((s, dir) => {
      graft.measures.GraphMeasures.blockMeasures(s, nationCoSupplierDB(s, dir))
        .orderBy("graph_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "f_frequent_labels" ->
      """SELECT label, count(*)::BIGINT AS support FROM (
        |  SELECT DISTINCT o_custkey AS graph_id, o_orderpriority AS label FROM orders)
        |GROUP BY label HAVING count(*) >= 500 ORDER BY label""".stripMargin,

    "f_frequent_edges" ->
      """SELECT minLabel, maxLabel, count(*)::BIGINT AS support FROM (
        |  SELECT DISTINCT a.o_custkey AS graph_id,
        |    least(a.o_orderstatus, b.o_orderstatus) AS minLabel,
        |    greatest(a.o_orderstatus, b.o_orderstatus) AS maxLabel
        |  FROM orders a JOIN orders b
        |    ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey)
        |GROUP BY minLabel, maxLabel HAVING count(*) >= 100 ORDER BY minLabel, maxLabel""".stripMargin,

    "f_triangle_fingerprint" -> {
      val rots = Seq(("la", "lb", "lc"), ("lb", "lc", "la"), ("lc", "la", "lb"),
        ("la", "lc", "lb"), ("lc", "lb", "la"), ("lb", "la", "lc"))
        .map { case (x, y, z) => s"md5($x || '|' || $y || '|' || $z)" }
        .mkString("least(", ", ", ")")
      s"""WITH e0 AS (${Tables.coSupplierSql}),
         | e AS (SELECT least(src,dst) AS src, greatest(src,dst) AS dst FROM e0 GROUP BY 1,2),
         | deg AS (SELECT vid, count(*) AS d FROM (
         |     SELECT src AS vid FROM e UNION ALL SELECT dst FROM e) GROUP BY vid),
         | tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |         FROM e e1 JOIN e e2 ON e2.src = e1.dst JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         | lab AS (SELECT s_suppkey AS vid, s_nationkey::VARCHAR AS l FROM supplier),
         | labeled AS (SELECT x.l AS la, y.l AS lb, z.l AS lc
         |             FROM tri JOIN lab x ON x.vid = tri.a JOIN lab y ON y.vid = tri.b JOIN lab z ON z.vid = tri.c)
         |SELECT $rots AS fingerprint, count(*)::BIGINT AS n
         |FROM labeled GROUP BY 1 ORDER BY fingerprint""".stripMargin
    }
    // f_cstring, f_tree_sampling: per-graph recursive kernels — not ANSI-SQL
    // expressible; the driver records rows-only checks for them.
  )
}
