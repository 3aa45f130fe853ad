package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestBase

class TextExpressionsSpec extends AnyFunSuite with SparkTestBase {

  private val N = 8

  /** The per-column HOF twin the expression must match bitwise:
    * mh_i = array_min(transform(toks, t => xxhash64(lit(i), t))). */
  private def hofCols(toks: org.apache.spark.sql.Column) =
    (0 until N).map(i => array_min(transform(toks, t => xxhash64(lit(i), t))).as(s"hof$i"))

  test("native signature is bitwise-identical to the per-column xxhash64 HOF formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = Seq.fill(48)(Seq.fill(1 + rnd.nextInt(30))(
      rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)) :+
      Seq("", "héllo wörld", "日本語テキスト", "a\tb\nc", "😀emoji")
    val df = docs.toDF("toks")
    val sig = TextFunctions.minHashSignature(col("toks"), N).as("sig")
    val rows = df.select((sig +: hofCols(col("toks"))): _*).collect()
    rows.foreach { r =>
      val native = r.getSeq[Long](0)
      (0 until N).foreach { i =>
        assert(native(i) == r.getLong(1 + i), s"slot $i of ${r.getSeq[Long](0)}")
      }
    }
  }

  test("NULL token element contributes the salt-only hash, exactly as in the twin") {
    val r = spark.sql(
      s"""SELECT graft_minhash(array('x', cast(null AS string)), $N) AS sig,
         |       ${(0 until N).map(i =>
               s"least(xxhash64($i, 'x'), xxhash64($i)) AS hof$i").mkString(", ")}
         |""".stripMargin).head()
    val native = r.getSeq[Long](0)
    (0 until N).foreach(i => assert(native(i) == r.getLong(1 + i), s"slot $i"))
  }

  test("NULL on empty or NULL token array (the twin's array_min(empty) is NULL per slot)") {
    val r = spark.sql(
      s"""SELECT graft_minhash(cast(array() AS array<string>), $N) AS empty,
         |       graft_minhash(cast(null AS array<string>), $N)   AS nul,
         |       graft_minhash(array('a'), $N)[0]                 AS ok
         |""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && !r.isNullAt(2))
  }

  test("interpreted eval path agrees with codegen") {
    val toks = Literal.create(
      new GenericArrayData(Array[Any](UTF8String.fromString("alpha"), UTF8String.fromString("beta"))),
      ArrayType(StringType))
    val interp = MinHashSignature(toks, Literal(N)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    import spark.implicits._
    val viaPlan = Seq(Seq("alpha", "beta")).toDF("toks")
      .select(TextFunctions.minHashSignature(col("toks"), N)).head().getSeq[Long](0)
    (0 until N).foreach(i => assert(interp(i) == viaPlan(i), s"slot $i"))
  }

  test("the signature build runs inside WholeStageCodegen (the HOF twin cannot)") {
    val df = spark.range(64)
      .select(split(concat(lit("tok"), col("id"), lit(" tok"), col("id") * 7), " ").as("toks"))
      .select(TextFunctions.minHashSignature(col("toks"), N).as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.where(size(col("sig")) === N).count() == 64)
  }

  test("Dedup's native path evaluates the signature ONCE per row, not once per slot") {
    // the pipeline splits sig-build and slot-extraction into two
    // projections; CollapseProject must NOT merge them (that would inline
    // the non-cheap expression into every getItem) — assert exactly one
    // graft_minhash in the optimized plan. spark.range (not a local Seq) so
    // the optimizer can't constant-fold the whole query to a LocalRelation.
    val docs = spark.range(16).select(col("id").as("doc_id"),
      concat(lit("tok"), col("id"), lit(" tok"), col("id") * 3).as("text"))
    val df = graft.dedup.Dedup.minHashSignatures(docs, "doc_id", "text", 8, graft.dedup.XxHashing)
    val optimized = df.queryExecution.optimizedPlan.toString
    val occurrences = "graft_minhash".r.findAllIn(optimized).size
    assert(occurrences == 1, s"expected 1 graft_minhash, got $occurrences in:\n$optimized")
  }

  test("rejects non-foldable or non-positive numHashes and wrong input types") {
    import spark.implicits._
    val df = Seq(Seq("a")).toDF("toks")
    val bad = intercept[Exception] {
      df.select(TextFunctions.minHashSignature(col("toks"), 0)).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("positive"), bad.getMessage)
    val wrongType = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array(1, 2), 4)").collect()
    }
    assert(wrongType.getMessage.contains("graft_minhash"), wrongType.getMessage)
  }
}
