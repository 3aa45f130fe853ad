package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.dedup.Dedup

class TextDedupSpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("tokenization drops empty tokens; counts match") {
    val d = docs((1L, "a b  c"), (2L, ""), (3L, " x "))
    val got = d.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
  }

  test("shingles: ordered k-grams, too-short docs yield empty") {
    val d = docs((1L, "a b c d"), (2L, "a b"))
    val got = d.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L).isEmpty)
  }

  test("langId: marker argmax with min-code tie-break and und fallback") {
    val d = docs(
      (1L, "the cat and the dog"),   // en
      (2L, "der hund und die katze"), // de
      (3L, "xyzzy plugh"),            // und
      (4L, "la la"))                  // es/fr tie on 'la' -> es (min code)
    val got = d.select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "und", 4L -> "es"))
  }

  test("exact dedup groups identical texts under min doc_id") {
    val d = docs((1L, "same text"), (2L, "same text"), (3L, "other"))
    val got = Dedup.exact(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L)))
  }

  test("exactXx (128-bit xxhash64-pair production path) returns the same result set as exact") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map { i =>
      // ~1 in 3 docs repeats an earlier doc's text verbatim
      val t = if (i > 3 && rnd.nextInt(3) == 0) s"doc ${1 + rnd.nextInt((i - 1).toInt)} body"
              else s"doc $i body"
      (i, t)
    } ++ Seq(
      // NULL texts: exact drops them via the NULL-hash join; exactXx must
      // filter them (xxhash64 passes the seed through on NULL, so unfiltered
      // they would all merge into one bogus group). Empty strings are real
      // content and must still group together.
      (900L, null.asInstanceOf[String]), (901L, null.asInstanceOf[String]),
      (902L, ""), (903L, ""))
    val d = docs(rows: _*)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val xx = canon(Dedup.exactXx(d, "doc_id", "text"))
    assert(xx == canon(Dedup.exact(d, "doc_id", "text")))
    assert(!xx.exists(r => r._1 == 900L || r._1 == 901L)) // NULLs absent
    assert(xx.contains((902L, 902L, 2L)) && xx.contains((903L, 902L, 2L))) // empties group
  }

  test("minhash: identical docs share signatures; jaccard-similar docs share some") {
    val d = docs((1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d f"), (4L, "q r s t u"))
    val sig = Dedup.minHashSignatures(d, "doc_id", "text", 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getString)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(4L))
    val shared13 = sig(1L).zip(sig(3L)).count { case (a, b) => a == b }
    assert(shared13 > 0) // J(1,3)=4/6, expect most minima shared
  }

  test("LSH candidates contain the identical pair") {
    val d = docs((1L, "a b c d e"), (2L, "a b c d e"), (3L, "z y x w v"))
    val pairs = Dedup.lshCandidates(d, "doc_id", "text", numHashes = 4, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("LSH bucket cap drops oversized buckets; audit surface reports them") {
    // five identical docs: every band bucket they share has size 5
    val d = docs((1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e"),
      (4L, "a b c d e"), (5L, "a b c d e"), (6L, "z y x w v"), (7L, "z y x w v"))
    val warnings0 = Dedup.droppedBucketWarnings.get()
    val capped = Dedup.lshCandidates(d, "doc_id", "text", numHashes = 4, rowsPerBand = 2,
      maxBucketSize = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the size-5 cluster is suppressed by the cap; the size-2 cluster survives
    assert(!capped.exists { case (a, b) => a <= 5 && b <= 5 })
    assert(capped.contains((6L, 7L)))
    // the drop is not silent: the observed-metrics listener fires a warning
    // (listener-bus delivery is async -> bounded spin)
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (Dedup.droppedBucketWarnings.get() == warnings0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(Dedup.droppedBucketWarnings.get() > warnings0,
      "capped lshCandidates run did not emit a dropped-bucket warning")
    val dropped = Dedup.oversizedLshBuckets(d, "doc_id", "text", 4, 2, maxBucketSize = 2L)
      .collect().map(_.getLong(2))
    assert(dropped.nonEmpty && dropped.forall(_ == 5L))
    // a cap above every bucket size is a no-op
    val uncapped = Dedup.lshCandidates(d, "doc_id", "text", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 5L)) && uncapped.contains((6L, 7L)))
  }

  test("xxhash64 production mode preserves the pipeline shape and the guaranteed collisions") {
    import graft.dedup.XxHashing
    // identical token sets collide in EVERY band under ANY hash, so the
    // duplicate cluster's pairs are hash-mode-independent; near-dup pairs
    // may differ (different permutations), which is LSH working as designed
    val d = docs((1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e"),
      (4L, "z y x w v"), (5L, "z y x w v"), (6L, "completely different words"))
    def dupPairs(h: graft.dedup.DedupHashing) =
      Dedup.lshCandidates(d, "doc_id", "text", numHashes = 4, rowsPerBand = 2, hashing = h)
        .where(col("n_shared_bands") === 2) // all bands shared = identical signature
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
    assert(dupPairs(graft.dedup.Md5Hashing) == want)
    assert(dupPairs(XxHashing) == want)
    // the fast band-bucket cap works identically
    val capped = Dedup.lshCandidates(d, "doc_id", "text", 4, 2, maxBucketSize = 2L,
      hashing = XxHashing).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists { case (a, b) => a <= 3 && b <= 3 })
    assert(capped.contains((4L, 5L)))
  }

  test("xxhash64 signatures (native one-pass expression) match the per-column HOF twin bitwise") {
    import graft.dedup.XxHashing
    val n = 6
    val d = docs((1L, "the quick brown fox"), (2L, "jumps over the lazy dog"),
      (3L, "héllo wörld 日本語"), (4L, "a"), (5L, "a a a b"))
    val native = Dedup.minHashSignatures(d, "doc_id", "text", n, hashing = XxHashing)
      .orderBy("key").collect().map(_.toSeq)
    // the HOF formulation the native expression replaced, built from the
    // same XxHashing.tokenHash primitive
    val toks = array_distinct(TextOps.tokens(col("text")))
    val hof = d.select((col("doc_id").cast("long").as("key") +:
        (0 until n).map(i => array_min(transform(toks, t => XxHashing.tokenHash(t, i))).as(s"mh$i"))): _*)
      .orderBy("key").collect().map(_.toSeq)
    assert(native.toSeq == hof.toSeq)
  }

  test("ngram jaccard: xxhash64 shingle keys give the md5-mode results (collision-free fixture)") {
    val d = docs((1L, "a b c d"), (2L, "a b c e"), (3L, "p q r s"), (4L, "a b c d"))
    def res(h: graft.dedup.DedupHashing) =
      Dedup.ngramJaccard(d, "doc_id", "text", 3, hashing = h)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(res(graft.dedup.Md5Hashing) == res(graft.dedup.XxHashing))
  }

  test("ngram jaccard: exact overlap arithmetic") {
    val d = docs((1L, "a b c d"), (2L, "a b c e"), (3L, "p q r s"))
    val got = Dedup.ngramJaccard(d, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // shingles(1)={abc,bcd}, shingles(2)={abc,bce}: J = 1/3
    assert(math.abs(got((1L, 2L)) - 1.0 / 3) < 1e-12)
    assert(!got.contains((1L, 3L)))
  }

  test("simhash: identical texts equal; token-disjoint texts differ") {
    val d = docs((1L, "a b c"), (2L, "a b c"), (3L, "x y z w q"))
    val got = Dedup.simHash(d, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
    assert(got.values.forall(h => h >= 0 && h < (1 << 16)))
  }
}
