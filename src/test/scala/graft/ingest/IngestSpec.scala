package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.fixtures.{Generators, PagesFixture, ReferenceOracles}

class IngestSpec extends AnyFunSuite with SparkTestBase {

  test("extracted text is byte-identical per url (frozen golden)") {
    val pages = PagesFixture.pages(spark, Generators.cycle(5))
    val got = LinkExtractor.withExtractedText(pages)
      .select(col("url"), col("text"), col("extracted_text"))
      .collect()
    for (r <- got)
      assert(r.getString(2) == r.getString(1), s"url=${r.getString(0)}")
  }

  test("scala extractor and catalyst extractor agree byte-for-byte") {
    val pages = PagesFixture.pages(spark, Generators.barabasiAlbert(20, 2, 1L))
    val got = LinkExtractor.withExtractedText(pages)
      .select(col("html"), col("extracted_text"))
      .collect()
    for (r <- got)
      assert(TextExtractor.extractText(r.getAs[Array[Byte]](0)) == r.getString(1))
  }

  test("extractor is pure across repartitionings (FIXTURES.md §4)") {
    val pages = PagesFixture.pages(spark, Generators.path(8))
    val a = LinkExtractor.withExtractedText(pages.repartition(1))
      .select("url", "extracted_text").collect().map(r => (r.getString(0), r.getString(1))).sorted
    val b = LinkExtractor.withExtractedText(pages.repartition(7))
      .select("url", "extracted_text").collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(a.sameElements(b))
  }

  test("link extraction reconstructs the fixture graph (via vid mapping)") {
    val fixture = Generators.twoComp
    val pages = PagesFixture.pages(spark, fixture)
    val vidOf = LinkExtractor.vertices(pages)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    val wantEdges = fixture.map { case (a, b) =>
      (vidOf(PagesFixture.url(a)), vidOf(PagesFixture.url(b)))
    }.toSet
    val gotEdges = LinkExtractor.edges(pages)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotEdges == wantEdges)
  }

  test("url normalization: case, fragments, trailing slash") {
    import spark.implicits._
    val df = Seq(
      "HTTP://Example.ORG/Page/1#frag",
      "http://example.org/Page/1/",
      "http://example.org/Page/1").toDF("u")
    val norm = df.select(LinkExtractor.normalizeUrl(col("u"))).distinct().collect()
    assert(norm.length == 1 && norm.head.getString(0) == "http://example.org/Page/1")
  }

  test("end-to-end: pages -> links -> PageRank matches scalar oracle") {
    val fixture = Generators.barabasiAlbert(25, 2, seed = 4L)
    val pages = PagesFixture.pages(spark, fixture)
    val urlOf = LinkExtractor.vertices(pages)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ranks = graft.algo.PageRank.run(spark, LinkExtractor.edges(pages)).ranks
      .collect().map(r => urlOf(r.getLong(0)) -> r.getDouble(1)).toMap
    val want = ReferenceOracles.pageRankScalar(fixture)
      .map { case (v, r) => PagesFixture.url(v) -> r }
    assert(ranks.keySet == want.keySet)
    for ((u, w) <- want) assert(math.abs(ranks(u) - w) < 5e-6, s"url=$u")
  }
}
