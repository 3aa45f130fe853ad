package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the engine's hottest scalar loop: the
  * index-ordered double-precision dot product of two numeric arrays.
  *
  * The similarity operators (brute-force cosine top-k, IVF-bucketed ANN,
  * hyperplane sign bits, near-dup verification — reference capability
  * surface in SURVEY §2.12) previously expressed this as
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)`. Spark's
  * higher-order array functions are `CodegenFallback`: every pair costs an
  * interpreted lambda dispatch plus boxing per element, and it breaks the
  * surrounding WholeStageCodegen span. This expression generates a tight
  * primitive `for` loop inside whole-stage codegen instead.
  *
  * Semantics are BITWISE identical to the CAST-BASED HOF formulation the
  * DuckDB oracles were validated against — `aggregate(zip_with(a, b,
  * (x, y) => x.cast(double) * y.cast(double)), 0.0d, _+_)`: each element is
  * widened to double BEFORE multiplying, the products are accumulated
  * strictly in index order starting from 0.0 (same IEEE-754 operation
  * sequence), a length mismatch yields NULL (the HOF version's `zip_with`
  * null-padding propagates to a NULL sum), and a NULL element yields NULL.
  * A formulation that multiplies two FLOAT elements first and widens the
  * float product (the pre-round-4 `Similarity.dot`) can differ in the last
  * bit on ARRAY<FLOAT> inputs — the identity claim does not extend to it.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType
  // NULL can arise from a length mismatch or a NULL element even when both
  // input arrays are non-null, so this must not inherit the children's
  // nullability (codegen would elide the isNull slot and miscompile).
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT|DOUBLE> arguments, got ${l.catalogString} and ${r.catalogString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, idx: String, float: Boolean): String =
      if (float) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(a, i, isFloat(left))} * ${get(b, i, isFloat(right))};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions: usable on
  * ANY session (no registration required — the expression is wrapped
  * directly), while [[graft.plans.GraftExtensions]] additionally exposes
  * them to SQL as `graft_dot`. */
object VectorFunctions {
  /** Σᵢ (double)a(i) * (double)b(i) in index order; NULL on length mismatch
    * or NULL element. FP-identical to the HOF/DuckDB formulation. */
  def fastDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
