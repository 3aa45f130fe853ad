package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.SparkTestBase

class VectorExpressionsSpec extends AnyFunSuite with SparkTestBase {

  private def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)

  test("fastDot is bitwise-identical to the HOF formulation on float arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(64)((
      Seq.fill(17)(rnd.nextFloat() * 2e3f - 1e3f),
      Seq.fill(17)(rnd.nextFloat() * 2e-3f - 1e-3f)))
    val df = rows.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val got = df.select(VectorFunctions.fastDot(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    got.foreach { r =>
      assert(bits(r.getDouble(0)) == bits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("fastDot accepts mixed float/double element types") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 3f))).toDF("a")
    val w = Array(0.5, -1.0, 2.0)
    val got = df.select(VectorFunctions.fastDot(col("a"), lit(w))).head().getDouble(0)
    assert(got == 1.0 * 0.5 - 2.0 + 6.0)
  }

  test("null semantics match zip_with padding: mismatch, null element, null array") {
    // via the SQL name — also exercises GraftExtensions' injectFunction
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D))                        AS mismatch,
        |       graft_dot(array(1.0D, cast(null AS double)), array(1.0D, 1.0D)) AS null_elem,
        |       graft_dot(cast(null AS array<double>), array(1.0D))             AS null_arr,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))                 AS ok
        |""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 11.0)
  }

  test("interpreted eval path agrees with codegen") {
    val a = Literal.create(Array(1.5f, -2.25f, 4f), ArrayType(FloatType))
    val b = Literal.create(Array(2.0, 0.5, -1.0), ArrayType(DoubleType))
    val interp = DotProduct(a, b).eval(null).asInstanceOf[Double]
    import spark.implicits._
    val viaPlan = Seq((Seq(1.5f, -2.25f, 4f), Seq(2.0, 0.5, -1.0))).toDF("a", "b")
      .select(VectorFunctions.fastDot(col("a"), col("b"))).head().getDouble(0)
    assert(bits(interp) == bits(viaPlan))
    assert(interp == 1.5 * 2.0 - 2.25 * 0.5 - 4.0)
  }

  test("the dot product runs inside WholeStageCodegen (no CodegenFallback in the hot path)") {
    // spark.range (not a local Seq) so the projection isn't constant-folded
    // into a LocalTableScan before any codegen stage exists
    val df = spark.range(8)
      .select(array(col("id").cast("float"), lit(2f)).as("a"),
        array(lit(3f), col("id").cast("float")).as("b"))
      .select(VectorFunctions.fastDot(col("a"), col("b")).as("d"))
    // `*(n)` marks a WholeStageCodegen stage in the executed plan's
    // simpleString; the projection carrying graft_dot must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.where(col("d") === 3.0 * 0 + 2.0 * 0).count() == 1) // id=0 row: 0*3 + 2*0 = 0
  }
}
