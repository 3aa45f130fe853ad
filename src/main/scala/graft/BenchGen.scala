package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes the deterministic power-law bench edge table (idempotent).
  * args: nVertices mOut path [seed]
  */
object BenchGen {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val m = args(1).toInt
    val path = args(2)
    val seed = if (args.length > 3) args(3).toLong else 42L
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      val spark = SparkSession.builder().master("local[32]")
        .appName("graft-bench-gen")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      graft.fixtures.Generators.powerLawEdges(spark, n, m, seed)
        .write.mode("overwrite").parquet(path)
      spark.stop()
    }
  }
}
