package graft

import org.apache.spark.sql.SparkSession

/** Scratch: in-JVM config matrix for the PageRank iteration loop. Runs every
  * config round-robin REPS times on the same input so hypervisor steal waves
  * hit all configs evenly; reports the median per-iteration seconds per
  * config. Knobs: CPUS, MAXIT, REPS, GEN_N|EDGES, MATRIX (semicolon list of
  * aqe,parts pairs like "1,64;0,64;1,32"). */
object DebugMatrix {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("CPUS", "32").toInt
    val maxIt = sys.env.getOrElse("MAXIT", "8").toInt
    val reps = sys.env.getOrElse("REPS", "3").toInt
    // each entry: aqe,parts,cacheCompress
    val matrix = sys.env.getOrElse("MATRIX", "1,32,1;1,32,0").split(";").map { s =>
      val f = s.split(","); (f(0) == "1", f(1).toInt, f.length > 2 && f(2) == "1")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = sys.env.get("GEN_N") match {
      case Some(n) =>
        val path = s"/tmp/graft_bench_edges_$n"
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")))
          graft.fixtures.Generators.powerLawEdges(spark, n.toLong, 8, 42L)
            .write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      case None => spark.read.parquet(sys.env.getOrElse("EDGES", "/tmp/graft_bench_edges"))
    }
    // warmup
    graft.algo.PageRank.run(spark, edges, maxIter = 3)
    val times = scala.collection.mutable.Map[(Boolean, Int, Boolean), scala.collection.mutable.ArrayBuffer[Double]]()
    for (r <- 1 to reps; (aqe, parts, comp) <- matrix) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", comp.toString)
      val preSteal = steal(); val t0 = System.nanoTime()
      val res = graft.algo.PageRank.run(spark, edges, maxIter = maxIt, numPartitions = Some(parts))
      val wall = (System.nanoTime() - t0) / 1e9
      val st = steal() - preSteal
      val med = res.iterSecsMedian
      times.getOrElseUpdate((aqe, parts, comp), scala.collection.mutable.ArrayBuffer()) += med
      println(f"rep=$r aqe=$aqe parts=$parts comp=$comp medIter=$med%.2f wall=$wall%.1f stealCores=${st / wall}%.1f")
    }
    for (((aqe, parts, comp), ts) <- times.toSeq.sortBy(_._1.toString)) {
      val s = ts.sorted
      println(f"CONFIG aqe=$aqe parts=$parts comp=$comp medianOfMedians=${s(s.size / 2)}%.2f all=${s.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }

  /** Cumulative steal seconds from /proc/stat. */
  private def steal(): Double = {
    val l = scala.io.Source.fromFile("/proc/stat").getLines().next().trim.split("\\s+")
    l(8).toDouble / 100.0
  }
}
