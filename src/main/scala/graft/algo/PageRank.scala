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
  *  - `links(src, dst, odeg)` is hash-partitioned by `src` once and persisted;
  *    the per-iteration `ranks ⋈ links` is then exchange-free on both sides
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

  final case class Result(ranks: DataFrame, iterations: Int, delta: Double, numVertices: Long, numEdges: Long)

  def run(
      spark: SparkSession,
      edges: DataFrame,
      damping: Double = 0.85,
      tol: Double = 1e-6,
      maxIter: Int = 200,
      numPartitions: Option[Int] = None,
      checkpoint: Option[IterationCheckpoint] = None): Result = {

    val p = numPartitions.getOrElse(GraphOps.defaultParallelism(spark))
    val e = GraphOps.canonicalEdges(edges)

    // Static structures: out-degrees, link table, vertex set with dangling flag.
    val odeg = e.groupBy("src").agg(count(lit(1)).as("odeg"))
    val links = e
      .join(odeg, "src")
      .select(col("src"), col("dst"), col("odeg"))
      .repartition(p, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = GraphOps
      .vertices(e)
      .join(odeg.select(col("src").as("vid"), lit(true).as("hasOut")), Seq("vid"), "left")
      .select(col("vid"), col("hasOut").isNull.as("dangling"))
      .repartition(p, col("vid"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val numEdges = links.count()
    val n = verts.count()
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

    var ranks = startRanks
    var danglingMass = ranks.where(col("dangling")).agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
    var delta = Double.MaxValue
    var iter = startIter

    while (delta >= tol && iter < maxIter) {
      val contribs = ranks.as("r")
        .join(links.as("l"), col("r.vid") === col("l.src"))
        .groupBy(col("l.dst").as("vid"))
        .agg(sum(col("r.rank") / col("l.odeg")).as("contrib"))

      val base = teleport + damping * danglingMass / n
      // localCheckpoint (eager) materializes the iteration AND truncates the
      // logical plan — without it the per-iteration plan tree grows without
      // bound and the driver chokes on plan processing long before data does.
      // It preserves the hash partitioning on vid, so the next iteration's
      // join stays exchange-free. On a multi-node cluster swap (or augment)
      // with reliable checkpointing via IterationCheckpoint below.
      val newRanks = verts
        .join(contribs, Seq("vid"), "left")
        .select(
          col("vid"),
          (lit(base) + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"),
          col("dangling"))
        .localCheckpoint(true)

      // Single action: L-inf delta vs previous ranks + next dangling mass.
      val stats = newRanks.as("n")
        .join(ranks.as("p"), col("n.vid") === col("p.vid"))
        .agg(
          max(abs(col("n.rank") - col("p.rank"))).as("delta"),
          sum(when(col("n.dangling"), col("n.rank")).otherwise(lit(0.0))).as("dmass"))
        .head()
      delta = stats.getDouble(0)
      danglingMass = stats.getDouble(1)

      ranks.unpersist(false)
      ranks = newRanks
      iter += 1
      checkpoint.foreach(_.maybeWrite(iter, delta, ranks.select("vid", "rank", "dangling")))
    }

    links.unpersist(false)
    verts.unpersist(false)
    Result(ranks.select(col("vid"), col("rank")), iter, delta, n, numEdges)
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
