package graft

/** Scratch diagnostics (round 3): physical plans of the operators that were
  * re-planned this round — banded near-dup, hyperplane-IVF, triangle-based
  * ego-nets, df-capped n-gram Jaccard — to confirm the intended shapes
  * (equi-joins on band keys, no cartesian/broadcast-corpus joins, the df
  * cap as a semi join before the inverted-index self-join). */
object DebugNewPlans {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"

    for (name <- Seq("s_near_dup", "s_cosine_ivf", "g_ego_edges", "d_ngram_jaccard")) {
      println(s"=== $name ===")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
