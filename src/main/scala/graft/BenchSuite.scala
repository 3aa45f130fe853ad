package graft

import org.apache.spark.sql.SparkSession
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

  private def stealSecs(): Double =
    try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next().trim.split("\\s+")
      l(8).toDouble / 100.0
    } catch { case _: Throwable => 0.0 }

  private final class CpuListener extends org.apache.spark.scheduler.SparkListener {
    val cpuNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) { cpuNanos.addAndGet(m.executorCpuTime); () }
    }
  }

  def main(args: Array[String]): Unit = {
    val spec = args(0)
    val (master, cores) = if (spec.contains("x")) {
      val Array(nex, nc) = spec.split("x").map(_.toInt)
      val memMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "8192").toInt
      (s"local-cluster[$nex,$nc,$memMb]", nex * nc)
    } else (s"local[$spec]", spec.toInt)
    val edgesPath = args(1)
    val parts = if (args.length > 2) args(2).toInt else 128
    val algos = (if (args.length > 3) args(3) else "cc,lp,tri").split(",").toSeq
    val lpRounds = if (args.length > 4) args(4).toInt else 5

    val execMemMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "8192").toInt
    val spark = SparkSession.builder()
      .master(master)
      .appName(s"graft-bench-suite-$spec")
      .config("spark.executor.memory", s"${execMemMb}m")
      .config("spark.memory.storageFraction", sys.env.getOrElse("GRAFT_STORAGE_FRACTION", "0.5"))
      .config("spark.locality.wait", "0")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", false)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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

    val listener = new CpuListener
    spark.sparkContext.addSparkListener(listener)
    for (algo <- algos) {
      val pre = stealSecs()
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
      val steal = (stealSecs() - pre) / wall / sys.env.getOrElse("GRAFT_HOST_CORES", "32").toInt
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
