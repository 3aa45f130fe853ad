package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-6 optimization harness (guide §1: measure first). NOT the frozen
  * driver bench — `graft.Bench` stays the contract; this main exists so the
  * optimization round can time queries with per-stage metrics and dump
  * plans without touching the hashed harness.
  *
  * Usage: BenchExtra <sfDir> [queryName ...]   (no names = all queries)
  * Env:
  *   SPARK_GRAFT_CPUS       core count (default 32), same knob as Bench
  *   GRAFT_EXTRA_REPEATS    timed repeats per query after one warm run (default 1)
  *   GRAFT_EXTRA_PLANDIR    if set, writes <dir>/<query>.txt explain("formatted")
  *   GRAFT_EXTRA_NOOP       "1" = time a noop-sink write instead of count()
  *
  * Per query it prints one line:
  *   EXTRA name=<q> secs=<wall> jobs=<n> stages=<n> tasks=<n>
  *     taskSecs=<sum of task wall> gcSecs shufR=<MB> shufW=<MB>
  *     maxTask=<longest single task s> 1taskStages=<stages with 1 task>
  * so a single-threaded hot stage (1 task, large maxTask) is visible without
  * the UI. Timing methodology matches Bench phase 1 (count() on the query
  * frame, cache sweep between queries) unless GRAFT_EXTRA_NOOP=1.
  */
object BenchExtra {

  private final class Metrics extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskMs = 0L
    @volatile var gcMs = 0L
    @volatile var shufR = 0L
    @volatile var shufW = 0L
    @volatile var maxTaskMs = 0L
    @volatile var oneTaskStages = 0
    @volatile var oneTaskMs = 0L
    val perJob = sys.env.get("GRAFT_EXTRA_JOBS").contains("1")
    private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskMs = 0; gcMs = 0
      shufR = 0; shufW = 0; maxTaskMs = 0; oneTaskStages = 0; oneTaskMs = 0 }
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs += 1
      if (perJob) jobStart.put(j.jobId, System.nanoTime())
    }
    override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      if (perJob) Option(jobStart.remove(j.jobId)).foreach { t0 =>
        System.err.println(f"JOB id=${j.jobId} wall=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      stages += 1
      tasks += si.numTasks
      val m = si.taskMetrics
      if (perJob && m != null)
        System.err.println(f"STAGE id=${si.stageId} name=${si.name.takeWhile(_ != ' ')} tasks=${si.numTasks} " +
          f"taskSecs=${m.executorRunTime / 1e3}%.2f shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.1fMB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.1fMB")
      if (m != null) {
        taskMs += m.executorRunTime
        gcMs += m.jvmGCTime
        shufR += m.shuffleReadMetrics.totalBytesRead
        shufW += m.shuffleWriteMetrics.bytesWritten
        if (si.numTasks == 1) { oneTaskStages += 1; oneTaskMs += m.executorRunTime }
        if (m.executorRunTime > 0 && si.numTasks > 0) {
          // coarse: stage run time / tasks is a lower bound; track the
          // stage-level executorRunTime of single-task stages instead
          val perTask = m.executorRunTime / si.numTasks
          if (perTask > maxTaskMs) maxTaskMs = perTask
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args.head else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val repeats = sys.env.getOrElse("GRAFT_EXTRA_REPEATS", "1").toInt
    val planDir = sys.env.get("GRAFT_EXTRA_PLANDIR")
    val useNoop = sys.env.get("GRAFT_EXTRA_NOOP").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bench-extra")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new Metrics
    spark.sparkContext.addSparkListener(metrics)

    // same untimed session warm-up as Bench phase 1
    locally {
      import org.apache.spark.sql.functions._
      val a = spark.range(0, 1L << 16).select(col("id"), (col("id") % 97).as("k"))
      val b = spark.range(0, 64).select(col("id").as("k"), lit(1L).as("one"))
      a.join(b, Seq("k")).repartition(8, col("k"))
        .groupBy("k").agg(count(lit(1)).as("c"), sum("id").as("s"))
        .where(col("c") > 0).count()
      try spark.read.parquet(s"$sfDir/nation.parquet").limit(1).collect()
      catch { case _: Throwable => () }
    }

    def sweep(): Unit = {
      val rdds = spark.sparkContext.getPersistentRDDs
      spark.sharedState.cacheManager.clearCache()
      rdds.values.foreach(_.unpersist(false))
    }

    for (name <- names) {
      SparkEntry.queries.get(name) match {
        case None => println(s"EXTRA name=$name ERROR=unknown-query")
        case Some(fn) =>
          planDir.foreach { d =>
            try {
              val txt = fn(spark, sfDir).queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
              java.nio.file.Files.writeString(java.nio.file.Paths.get(d, s"$name.txt"), txt)
            } catch { case e: Throwable => System.err.println(s"plan dump $name failed: $e") }
            sweep()
          }
          var best = Double.MaxValue
          var line = ""
          val runs = repeats
          for (_ <- 0 until runs) {
            spark.sparkContext.setJobDescription(s"extra-$name")
            metrics.reset()
            val t0 = System.nanoTime()
            try {
              val df = fn(spark, sfDir)
              if (useNoop) df.write.format("noop").mode("overwrite").save() else df.count()
              val secs = (System.nanoTime() - t0) / 1e9
              // listener events are posted asynchronously; give the bus a beat
              Thread.sleep(150)
              if (secs < best) {
                best = secs
                line = f"EXTRA name=$name secs=$secs%.2f jobs=${metrics.jobs} stages=${metrics.stages} " +
                  f"tasks=${metrics.tasks} taskSecs=${metrics.taskMs / 1e3}%.1f gcSecs=${metrics.gcMs / 1e3}%.1f " +
                  f"shufR=${metrics.shufR / 1e6}%.1fMB shufW=${metrics.shufW / 1e6}%.1fMB " +
                  f"oneTaskStages=${metrics.oneTaskStages} oneTaskSecs=${metrics.oneTaskMs / 1e3}%.1f"
              }
            } catch {
              case e: Throwable =>
                line = s"EXTRA name=$name ERROR=${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}"
            }
            sweep()
          }
          println(line)
      }
    }
    spark.stop()
  }
}
