package graft

import org.apache.spark.sql.SparkSession

/** Scratch: build the bench static structures and one runFromStatic pass.
  * Usage: DebugStatic <edgesPath> <staticPath> [iters] */
object DebugStatic {
  def main(args: Array[String]): Unit = {
    val edgesPath = args(0)
    val staticPath = args(1)
    val iters = if (args.length > 2) args(2).toInt else 0
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PARTS", "64"))
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(staticPath, "verts", "_SUCCESS"))) {
      graft.algo.PageRank.writeStatic(spark, spark.read.parquet(edgesPath), staticPath)
      println(f"writeStatic: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    if (iters > 0) {
      val t1 = System.nanoTime()
      val r = graft.algo.PageRank.runFromStatic(spark, staticPath, maxIter = iters)
      println(f"runFromStatic: iters=${r.iterations} setup=${r.setupSecs}%.1f " +
        f"iterTotal=${r.iterSecs}%.1f delta=${r.delta}%.3e n=${r.numVertices} m=${r.numEdges} " +
        f"wall=${(System.nanoTime() - t1) / 1e9}%.1f")
    }
    spark.stop()
  }
}
