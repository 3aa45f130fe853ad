package graft

import org.apache.spark.sql.SparkSession

/** Scratch: run named SparkEntry queries against a SF dir and print row
  * counts + head. Usage: DebugQueries <sfDir> <name> [name...] */
object DebugQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args.tail) {
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val rows = df.count()
        val resid = spark.sparkContext.getPersistentRDDs
        println(f"$name: rows=$rows secs=${(System.nanoTime() - t0) / 1e9}%.1f residualRDDs=${resid.size}")
        if (sys.env.contains("GRAFT_DEBUG_SHOW")) df.show(5, truncate = 60)
        spark.sharedState.cacheManager.clearCache()
        resid.values.foreach(_.unpersist(false))
      } catch { case e: Throwable => println(s"$name FAILED: $e") }
    }
    spark.stop()
  }
}
