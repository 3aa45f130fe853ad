package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Guards the deterministic corpus behind Appendix E's scaling evidence:
  * the duplicate structure and the byte-level content must be stable
  * across re-generations and partitionings, or the cross-level checksum
  * witness means nothing. */
class BenchDedupSpec extends AnyFunSuite with SparkTestBase {

  test("corpus is deterministic: same checksum across generations and partitionings") {
    val a = BenchDedup.corpus(spark, 2000)
      .select(xxhash64(col("doc_id"), col("text")).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    val b = BenchDedup.corpus(spark, 2000).repartition(7)
      .select(xxhash64(col("doc_id"), col("text")).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    assert(a == b)
  }

  test("duplicate structure: id%10==0 exact dup of id-1; remaining id%13==0 near dup (one extra token)") {
    val rows = BenchDedup.corpus(spark, 300).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // exact duplicates
    Seq(10L, 20L, 130L, 260L).foreach { id =>
      assert(rows(id) == rows(id - 1), s"doc $id should equal doc ${id - 1}")
    }
    // near duplicates: doc 13 = doc 12's tokens + " x13" (id 130 is %10 so exact)
    Seq(13L, 39L, 91L, 117L).foreach { id =>
      assert(rows(id) == rows(id - 1) + s" x$id", s"doc $id should be doc ${id - 1} + x$id")
    }
    // ordinary docs are distinct from their neighbor
    Seq(1L, 2L, 3L, 7L).foreach { id =>
      assert(rows(id) != rows(id - 1))
    }
    // token counts in the documented 40-80 band (near-dups 41-81)
    rows.values.foreach { t =>
      val n = t.split(" ").length
      assert(n >= 40 && n <= 81, s"token count $n out of band")
    }
  }

  test("the pipeline finds the planted duplicates on a small corpus") {
    val docs = BenchDedup.corpus(spark, 200).cache()
    try {
      // exact: every id%10==0 doc groups with id-1
      val groups = graft.dedup.Dedup.exact(docs, "doc_id", "text")
        .where(col("group_size") > 1).count()
      // 19 planted pairs in [1,200): ids 10,20,...,190 with their id-1
      assert(groups == 38, s"expected 38 docs in >1 groups, got $groups")
      // LSH with full-width signatures recovers near-dup candidates too
      val cands = graft.dedup.Dedup.lshCandidates(docs, "doc_id", "text",
          numHashes = 128, rowsPerBand = 8, hashing = graft.dedup.XxHashing)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cands.contains((9L, 10L)), "exact pair 9-10 missing")
      assert(cands.contains((12L, 13L)), "near pair 12-13 missing")
    } finally { docs.unpersist(); () }
  }
}
