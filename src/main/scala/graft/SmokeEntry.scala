package graft

/** Scratch: drives SparkEntry.entry exactly as the driver smoke-check does. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val rows = df.limit(5).collect()
    println(s"entry rows>0: ${rows.nonEmpty}; top5:")
    rows.foreach(r => println("  " + r))
    spark.stop()
  }
}
