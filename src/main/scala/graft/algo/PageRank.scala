package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.GraphOps
import graft.run.IterationCheckpoint

/** Damped power-iteration PageRank as aggregate-then-join DataFrame message
  * passing (SURVEY.md §2.8.4; BASELINE.json north_rule).
  *
  * Semantics: d = 0.85 (configurable), uniform teleport, dangling-mass
  * redistribution, convergence when the L-infinity delta between successive
  * rank vectors drops below `tol` (default 1e-6, the BASELINE metric's bound).
  * Not present in the reference (its nearest relative is degree-weighted
  * preferential attachment, reference `randomGraphGenerators.c:262-330`);
  * goldens come from [[graft.fixtures.ReferenceOracles.pageRankScalar]].
  *
  * Scale design (one shuffle per iteration):
  *  - CSR adjacency `adj(src, nbrs, odeg)` (one row per source vertex) is
  *    hash-partitioned by `src` once and persisted; the per-iteration
  *    `ranks ⋈ adj` is a |V|x|V| shuffled-hash join, exchange-free on both sides
  *    because `ranks` exits each iteration hash-partitioned by `vid` (= the
  *    join key) from the previous `groupBy(dst)`.
  *  - the scatter `groupBy(dst).sum` is the single per-iteration shuffle;
  *    `sum` is algebraic so map-side partial aggregation absorbs hub skew
  *    (no salting needed for commutative message combination).
  *  - dangling mass and L-inf delta are fused into ONE action per iteration:
  *    the convergence aggregate over the new ranks also sums the rank mass
  *    sitting on statically-flagged dangling vertices, which is exactly the
  *    mass to redistribute in the NEXT iteration.
  */
object PageRank {

  /** Cut the logical plan every k iterations (between cuts, persisted
    * intermediates keep the plan shallow enough while saving the extra
    * eager-checkpoint job per iteration). */
  private val LineageTruncateEvery = 5

  final case class Result(ranks: DataFrame, iterations: Int, delta: Double, numVertices: Long, numEdges: Long,
      setupSecs: Double = 0.0, iterSecs: Double = 0.0, iterSecsEach: Seq[Double] = Nil) {
    /** Median per-iteration seconds — the robust "sustained" rate (hypervisor
      * steal / GC spikes excluded), per BASELINE.md's median-of-runs rule. */
    def iterSecsMedian: Double = if (iterSecsEach.isEmpty) iterSecs else {
      val s = iterSecsEach.sorted
      s(s.size / 2)
    }
  }

  def run(
      spark: SparkSession,
      edges: DataFrame,
      damping: Double = 0.85,
      tol: Double = 1e-6,
      maxIter: Int = 200,
      numPartitions: Option[Int] = None,
      checkpoint: Option[IterationCheckpoint] = None,
      fusedIterations: Int = 1): Result = {

    val setupT0 = System.nanoTime()
    val p = numPartitions.getOrElse(GraphOps.defaultParallelism(spark))
    // collect_list's ObjectHashAggregate falls back to sort-based agg after a
    // tiny default key threshold — raise it so the one-time CSR build stays a
    // hash aggregation (keys are vertex ids; values are small arrays).
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "20000000")
    // Scanned exactly twice during setup (adj build + vertex set), so cache it.
    val e = GraphOps.canonicalEdges(edges).persist(StorageLevel.MEMORY_AND_DISK)

    // Static structures: CSR adjacency blocks (one row per source vertex,
    // SURVEY.md §4) and the vertex set with a static dangling flag. The
    // per-iteration join is then |V| x |V| on the partition key — the edge
    // fan-out happens map-side via explode, never in the join itself.
    val adj = e
      .repartition(p, col("src"))
      .groupBy("src")
      .agg(collect_list(col("dst")).as("nbrs"))
      .select(col("src"), col("nbrs"), size(col("nbrs")).cast("double").as("odeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = GraphOps
      .vertices(e)
      .join(adj.select(col("src").as("vid"), lit(true).as("hasOut")), Seq("vid"), "left")
      .select(col("vid"), col("hasOut").isNull.as("dangling"))
      .repartition(p, col("vid"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val numEdges = adj.agg(coalesce(sum(size(col("nbrs"))), lit(0))).head().getLong(0)
    val n = verts.count()
    e.unpersist(false)
    if (n == 0) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vid", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.DoubleType))))
      return Result(empty, 0, 0.0, 0L, 0L)
    }

    val teleport = (1.0 - damping) / n

    // Resume support: start from the latest checkpointed iteration if present.
    val (startIter, startRanks) = checkpoint.flatMap(_.latest(spark)) match {
      case Some((it, df)) => (it, df.repartition(p, col("vid")).persist(StorageLevel.MEMORY_AND_DISK))
      case None =>
        val r0 = verts.select(col("vid"), lit(1.0 / n).as("rank"), col("dangling"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        (0, r0)
    }

    // One PageRank step as a pure DataFrame transform. The dangling mass
    // enters as an in-plan broadcast aggregate (a 1-row relation), NOT a
    // driver-side scalar: that keeps the whole step inside one job, so
    // `fusedIterations` steps chain into a single action and the serial
    // driver cost (analysis, codegen, scheduling) amortizes across them —
    // the lever that makes strong scaling visible once executor time per
    // iteration is small. No literal changes between iterations, so the
    // generated code is byte-identical and the codegen cache hits.
    def step(cur: DataFrame): DataFrame = {
      val baseDf = cur
        .where(col("dangling"))
        .agg((lit(teleport) + lit(damping) * coalesce(sum("rank"), lit(0.0)) / lit(n.toDouble)).as("base"))
      val contribs = cur.as("r")
        .join(adj.as("l").hint("shuffle_hash"), col("r.vid") === col("l.src"))
        .select((col("r.rank") / col("l.odeg")).as("w"), explode(col("l.nbrs")).as("vid"))
        .groupBy(col("vid"))
        .agg(sum(col("w")).as("contrib"))
      verts
        .join(contribs.hint("shuffle_hash"), Seq("vid"), "left")
        .crossJoin(broadcast(baseDf))
        .select(
          col("vid"),
          (col("base") + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"),
          col("dangling"))
    }

    var ranks = startRanks
    var delta = Double.MaxValue
    var iter = startIter
    val fused = math.max(1, fusedIterations)
    val setupSecs = (System.nanoTime() - setupT0) / 1e9
    val loopT0 = System.nanoTime()
    val iterTimes = scala.collection.mutable.ArrayBuffer[Double]()

    while (delta >= tol && iter < maxIter) {
      val iterT0 = System.nanoTime()
      var cur = ranks
      val steps = math.min(fused, maxIter - iter)
      // Persist every intermediate step: each step's dangling-mass broadcast
      // subquery runs as its own mini-job, and WITHOUT a persist that job and
      // the main job would re-execute the whole upstream chain (no exchange
      // reuse across separately-submitted jobs) — exponential in the fuse
      // depth. With the persist each step is computed exactly once.
      val intermediates = scala.collection.mutable.ArrayBuffer[DataFrame]()
      for (k <- 0 until steps) {
        cur = step(cur)
        if (k < steps - 1) { cur = cur.persist(StorageLevel.MEMORY_AND_DISK); intermediates += cur }
      }
      // localCheckpoint (eager) materializes the fused block AND truncates
      // the logical plan (unbounded plan growth chokes the driver long before
      // data does). It preserves the hash partitioning on vid, so the next
      // block's join stays exchange-free. On a multi-node cluster swap (or
      // augment) with reliable checkpointing via IterationCheckpoint.
      val newRanks = cur.localCheckpoint(true)

      // One action per fused block: L-inf delta vs the previous materialized
      // ranks (a K-step delta — conservative: never stops earlier than the
      // true per-step test would).
      delta = newRanks.as("n")
        .join(ranks.as("p").hint("shuffle_hash"), col("n.vid") === col("p.vid"))
        .agg(max(abs(col("n.rank") - col("p.rank"))).as("delta"))
        .head().getDouble(0)

      ranks.unpersist(false)
      intermediates.foreach(_.unpersist(false))
      ranks = newRanks
      iter += steps
      iterTimes += (System.nanoTime() - iterT0) / 1e9 / steps
      if (sys.env.contains("GRAFT_PR_VERBOSE"))
        println(f"[pr] iter=$iter delta=$delta%.3e secs/iter=${(System.nanoTime() - iterT0) / 1e9 / steps}%.2f")
      checkpoint.foreach(_.maybeWrite(iter, delta, ranks.select("vid", "rank", "dangling")))
    }

    adj.unpersist(false)
    verts.unpersist(false)
    Result(ranks.select(col("vid"), col("rank")), iter, delta, n, numEdges,
      setupSecs, (System.nanoTime() - loopT0) / 1e9, iterTimes.toSeq)
  }

  /** Fixed-iteration variant (no convergence action inside the loop beyond
    * the dangling-mass pass) used by oracle-comparable queries where the
    * iteration count must match an unrolled SQL oracle exactly. */
  def runFixed(spark: SparkSession, edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    val e = GraphOps.canonicalEdges(edges)
    val odeg = e.groupBy("src").agg(count(lit(1)).as("odeg"))
    val links = e.join(odeg, "src").select(col("src"), col("dst"), col("odeg")).persist(StorageLevel.MEMORY_AND_DISK)
    val verts = GraphOps.vertices(e)
      .join(odeg.select(col("src").as("vid")).withColumn("hasOut", lit(true)), Seq("vid"), "left")
      .select(col("vid"), col("hasOut").isNull.as("dangling"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = verts.count()
    val teleport = (1.0 - damping) / n
    var ranks = verts.select(col("vid"), lit(1.0 / n).as("rank"), col("dangling"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var i = 0
    while (i < iterations) {
      val dmass = ranks.where(col("dangling")).agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
      val contribs = ranks.as("r").join(links.as("l"), col("r.vid") === col("l.src"))
        .groupBy(col("l.dst").as("vid"))
        .agg(sum(col("r.rank") / col("l.odeg")).as("contrib"))
      val base = teleport + damping * dmass / n
      val nr = verts.join(contribs, Seq("vid"), "left")
        .select(col("vid"), (lit(base) + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"), col("dangling"))
        .localCheckpoint(true)
      ranks.unpersist(false)
      ranks = nr
      i += 1
    }
    links.unpersist(false)
    verts.unpersist(false)
    ranks.select(col("vid"), col("rank"))
  }
}
