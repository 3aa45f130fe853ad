package graft.similarity

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private def vecs(rows: (Long, Seq[Float], Int)*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  private val data = vecs(
    (1L, Seq(1f, 0f, 0f), 0),
    (2L, Seq(0.9f, 0.1f, 0f), 0),
    (3L, Seq(0f, 1f, 0f), 1),
    (4L, Seq(0f, 0.9f, 0.1f), 1),
    (5L, Seq(-1f, 0f, 0f), 0))

  test("cosine column: orthogonal=0, identical=1, opposite=-1") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      (Seq(1f, 0f, 0f), Seq(-1f, 0f, 0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12 && math.abs(got(1)) < 1e-12 && math.abs(got(2) + 1.0) < 1e-12)
  }

  test("brute-force top-k returns nearest neighbors in order") {
    val got = Similarity.bruteForceTopK(data, "vec_id", "embedding", col("vec_id") === 1, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 3L)) || got.head == ((1L, 2L)))
    assert(got.head._2 == 2L) // closest to e_x is (0.9, 0.1, 0)
  }

  test("bucketed top-k only searches the same bucket") {
    val got = Similarity.bucketedTopK(data, "vec_id", "embedding", "label", col("vec_id") === 1, 3)
      .collect().map(r => r.getLong(2)).toSet
    assert(got.subsetOf(Set(2L, 5L))) // label-0 bucket only
  }

  test("near-dup pairs above threshold") {
    val got = Similarity.nearDupPairs(data, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)) && got.contains((3L, 4L)) && !got.contains((1L, 5L)))
  }

  test("near-dup explicit dim matches the probed default; bucket cap bounds the join") {
    val probed = Similarity.nearDupPairs(data, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val explicit = Similarity.nearDupPairs(data, "vec_id", "embedding", 0.95, dim = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(explicit == probed)
    // cap of 1 drops every multi-member bucket -> no candidates at all
    val capped = Similarity.nearDupPairs(data, "vec_id", "embedding", 0.95,
      dim = 3, maxBucketSize = 1L)
    assert(capped.collect().isEmpty)
  }

  test("hyperplane buckets: explicit dim identical to probed") {
    val a = Similarity.hyperplaneBuckets(data, "vec_id", "embedding", 4, 2027L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Similarity.hyperplaneBuckets(data, "vec_id", "embedding", 4, 2027L, dim = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
