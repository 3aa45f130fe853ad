package graft

import org.apache.spark.sql.SparkSession

/** Scratch: isolate the PageRank scaling bottleneck. Env knobs:
  * CPUS, PARTS (shuffle partitions), AQE (0/1), LOCALDIR, HEAP is -Xmx. */
object DebugScaling {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("CPUS", "32").toInt
    val parts = sys.env.getOrElse("PARTS", cpus.toString).toInt
    val aqe = sys.env.getOrElse("AQE", "1") == "1"
    val localDir = sys.env.get("LOCALDIR")
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.ui.enabled", "false")
    localDir.foreach(d => b = b.config("spark.local.dir", d))
    val spark = b.getOrCreate()
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
    // warmup on a small synthetic graph (not the parquet input), then settle
    graft.algo.PageRank.run(spark, graft.fixtures.Generators.powerLawEdges(spark, 20000, 3, 7L), maxIter = 3)
    System.gc(); Thread.sleep(5000)
    val t0 = System.nanoTime()
    val res = graft.algo.PageRank.run(spark, edges, tol = 1e-6, maxIter = sys.env.getOrElse("MAXIT", "16").toInt)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"cpus=$cpus parts=$parts aqe=$aqe localdir=${localDir.getOrElse("-")} " +
      f"iters=${res.iterations} secs=$secs%.1f eps=${res.numEdges.toDouble * res.iterations / secs / 1e6}%.2f M")
    spark.stop()
  }
}
