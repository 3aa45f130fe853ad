package graft.table

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Proves the co-located-join contract of [[TableIO.commitBucketed]]: two
  * tables bucketed identically on the join key produce a join plan with NO
  * shuffle Exchange on either side — the partitioning is paid once at write
  * time, which is the point of bucketing in the 100-TB design. */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  test("identically-bucketed tables join without any Exchange") {
    import spark.implicits._
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // disable broadcast so the join would otherwise need a shuffle, and AQE
    // so the initial physical plan is what we assert on
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val verts = (0L until 1000L).map(v => (v, s"label_${v % 7}")).toDF("vid", "label")
      val ranks = (0L until 1000L).map(v => (v, 1.0 / (v + 1))).toDF("vid", "rank")
      TableIO.commitBucketed(verts, "bjs_verts", Seq("vid"), nBuckets = 8)
      TableIO.commitBucketed(ranks, "bjs_ranks", Seq("vid"), nBuckets = 8)

      val joined = spark.table("bjs_verts").join(spark.table("bjs_ranks"), "vid")
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(joined.count() == 1000)

      // sanity: the same join WITHOUT bucketing does shuffle (the baseline
      // the bucketed path removes)
      val unbucketed = verts.join(ranks, "vid")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bjs_verts")
      spark.sql("DROP TABLE IF EXISTS bjs_ranks")
    }
  }
}
