package graft

// Scratch diagnostics main (not part of the library surface).
object DebugCC {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.fixtures.{Generators, ReferenceOracles}
    for ((name, e) <- Seq(
        "path16" -> Generators.path(16),
        "cycle8" -> Generators.cycle(8),
        "two_comp" -> Generators.twoComp,
        "ba100+extras" -> (Generators.barabasiAlbert(100, 2, 5L) ++
          Generators.cycle(5).map { case (a, b) => (a + 1000, b + 1000) }))) {
      val t0 = System.nanoTime()
      val got = graft.algo.ConnectedComponents.run(spark, Generators.edgesDF(spark, e))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ReferenceOracles.connectedComponentsMinVid(e)
      println(s"$name: ok=${got == want} secs=${(System.nanoTime() - t0) / 1e9}")
      if (got != want) println(s"  got=$got\n  want=$want")
    }
    spark.stop()
  }
}
