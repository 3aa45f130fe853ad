package graft

import org.apache.spark.sql.functions._

/** North-rule algorithm suite at bench scale in a pinned JVM, spawned like
  * [[BenchWorker]] under `taskset -c 0..N-1`: connected components
  * (small-star/large-star to fixpoint), WL label propagation (fixed
  * rounds), and triangle counting (degree-oriented intersection) over the
  * SAME seeded power-law edge table the PageRank scaling pairs use.
  *
  * The binding scaling criterion (BASELINE.json) is measured on PageRank;
  * this suite extends the two-parallelism evidence to the other three
  * north-rule algorithms — the caller runs it once per level and derives
  * per-algorithm efficiency = (tp_high / tp_low) / 4 (BASELINE.md round-5
  * appendix).
  *
  * args: spec edgesPath parts algosCsv [lpRounds]
  *   spec  — "1x4" = local-cluster[1,4,m] … same grammar as BenchWorker
  * stdout: one `SUITERUN algo=… wall=… eps=…` line per algorithm.
  */
object BenchSuite {

  def main(args: Array[String]): Unit = {
    val spec = args(0)
    val (_, cores) = BenchShared.parseSpec(spec)
    val edgesPath = args(1)
    val parts = if (args.length > 2) args(2).toInt else 128
    val algos = (if (args.length > 3) args(3) else "cc,lp,tri").split(",").toSeq
    val lpRounds = if (args.length > 4) args(4).toInt else 5

    val spark = BenchShared.pinnedSession(spec, s"graft-bench-suite-$spec", parts, aqe = false)

    val edges = spark.read.parquet(edgesPath)
    val nEdges = edges.count()

    // Initial LP labels: a deterministic coarse partition of the vertex set
    // (degree-independent so every level refines identical input).
    def initialLabels() = graft.graph.GraphOps.vertices(edges)
      .select(col("vid"), pmod(col("vid"), lit(64L)).as("label"))

    // Warmup on a small prefix through every requested algorithm: codegen +
    // C2 heat on EVERY executor JVM (narrow warmups leave executors cold and
    // their compilation pollutes the first measured stages — see BenchWorker).
    val warm = edges.limit(200000).repartition(parts).cache()
    warm.count()
    val warmLabels = graft.graph.GraphOps.vertices(warm)
      .select(col("vid"), pmod(col("vid"), lit(64L)).as("label"))
    algos.foreach {
      case "cc"  =>
        val c = graft.algo.ConnectedComponents.run(spark, warm, maxRounds = 3)
        c.count(); graft.graph.GraphOps.releaseCheckpoint(c)
      case "lp"  =>
        val l = graft.algo.LabelPropagation.wlRefineHashed(spark, warm, warmLabels, 2)
        l.count(); graft.graph.GraphOps.releaseCheckpoint(l)
      case "tri" => graft.algo.Triangles.globalCount(spark, warm); ()
      case _     => ()
    }
    warm.unpersist(true)

    val listener = new BenchShared.CpuListener
    spark.sparkContext.addSparkListener(listener)
    for (algo <- algos) {
      val pre = BenchShared.stealSecs()
      val cpu0 = listener.cpuNanos.get()
      val t0 = System.nanoTime()
      val detail: String = algo match {
        case "cc" =>
          val cc = graft.algo.ConnectedComponents.run(spark, edges)
          val comps = cc.agg(countDistinct(col("component"))).head().getLong(0)
          // release the |V|-row checkpointed result before the next timed
          // algorithm — a pinned component table would squat executor
          // storage during the lp/tri measurements (same cross-query
          // isolation Bench's phase-1 sweep enforces)
          graft.graph.GraphOps.releaseCheckpoint(cc)
          s"components=$comps"
        case "lp" =>
          val out = graft.algo.LabelPropagation.wlRefineHashed(spark, edges, initialLabels(), lpRounds)
          val classes = out.agg(countDistinct(col("label"))).head().getLong(0)
          graft.graph.GraphOps.releaseCheckpoint(out)
          s"rounds=$lpRounds classes=$classes"
        case "tri" =>
          val t = graft.algo.Triangles.globalCount(spark, edges)
          s"triangles=$t"
        case other =>
          s"unknown=$other"
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val steal = BenchShared.stealFraction(pre, wall)
      val cpuSecs = (listener.cpuNanos.get() - cpu0) / 1e9
      // Throughput normalization: edge-traversals per second — |E| per
      // LP round; |E| once for the single-pass cc fixpoint / triangle jobs.
      val traversals = if (algo == "lp") nEdges.toDouble * lpRounds else nEdges.toDouble
      println(f"SUITERUN algo=$algo spec=$spec cores=$cores parts=$parts edges=$nEdges " +
        f"wall=$wall%.2f eps=${traversals / wall}%.0f cpu=$cpuSecs%.1f steal=$steal%.3f $detail")
    }
    spark.stop()
  }
}
