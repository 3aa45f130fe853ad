package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the dedup pipeline's hottest scan loop:
  * the full MinHash signature of a token array in ONE pass.
  *
  * [[graft.dedup.Dedup.minHashSignatures]] under [[graft.dedup.XxHashing]]
  * is per column `mh_i = array_min(transform(toks, t => xxhash64(i, t)))` —
  * `numHashes` separate higher-order-function passes. Spark's HOFs are
  * `CodegenFallback`: each pass allocates an intermediate `ArrayData` of
  * `|toks|` longs and pays an interpreted lambda dispatch per element, and
  * the projection drops out of whole-stage codegen. At corpus scale the
  * signature build touches every byte of every document — it is the one
  * loop in the dedup pipeline that is linear in the full input — so this
  * expression generates the fused loop instead: for each token, update all
  * `numHashes` running minima; zero intermediate allocation, one codegen'd
  * projection.
  *
  * Semantics are BITWISE identical per signature slot to the HOF
  * formulation (asserted in `TextExpressionsSpec`):
  *  - slot `i` of the result equals
  *    `array_min(transform(toks, t => xxhash64(lit(i), t)))` — the hash is
  *    Spark's `xxhash64` (seed 42) folded over (int salt, string token),
  *    reproduced here as `XXH64.hashUTF8String(t, XXH64.hashInt(i, 42))`
  *    with the per-salt prefix hashed once up front instead of per token;
  *  - a NULL token element contributes the salt-only hash (a NULL child
  *    leaves `xxhash64`'s running hash untouched), exactly as in the twin;
  *  - an EMPTY token array yields NULL (the twin's `array_min(empty)` is
  *    NULL in every slot; after `getItem(i)` the two formulations agree);
  *  - a NULL token array yields NULL.
  */
case class MinHashSignature(tokens: Expression, numHashes: Expression) extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = numHashes
  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // NULL also arises from an empty token array, so nullability must not be
  // inherited from the children (codegen would elide the isNull slot).
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (tokens.dataType, numHashes.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if numHashes.foldable =>
      val n = numHashes.eval()
      if (n != null && n.asInstanceOf[Int] > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a positive numHashes, got $n")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<STRING>, foldable INT), got ${l.catalogString} and ${r.catalogString}")
  }

  @transient private lazy val nH: Int = numHashes.eval().asInstanceOf[Int]
  /** Per-salt seed: xxhash64's running hash after the int salt child —
    * constant per slot, hoisted out of the token loop. */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(nH)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(toksAny: Any, nAny: Any): Any = {
    val arr = toksAny.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return null
    val mins = Array.fill(nH)(Long.MaxValue)
    var j = 0
    while (j < m) {
      if (arr.isNullAt(j)) {
        var i = 0
        while (i < nH) { if (seeds(i) < mins(i)) mins(i) = seeds(i); i += 1 }
      } else {
        val t = arr.getUTF8String(j)
        var i = 0
        while (i < nH) {
          val h = XXH64.hashUTF8String(t, seeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val uad = classOf[UnsafeArrayData].getName
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val vals = ctx.freshName("vals")
      val t = ctx.freshName("t")
      val h = ctx.freshName("h")
      s"""
         |final int $m = $a.numElements();
         |if ($m == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $vals = new long[$nH];
         |  java.util.Arrays.fill($vals, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($a.isNullAt($j)) {
         |      for (int $i = 0; $i < $nH; $i++) {
         |        if ($seedsRef[$i] < $vals[$i]) $vals[$i] = $seedsRef[$i];
         |      }
         |    } else {
         |      final org.apache.spark.unsafe.types.UTF8String $t = $a.getUTF8String($j);
         |      for (int $i = 0; $i < $nH; $i++) {
         |        final long $h = $xxh.hashUTF8String($t, $seedsRef[$i]);
         |        if ($h < $vals[$i]) $vals[$i] = $h;
         |      }
         |    }
         |  }
         |  ${ev.value} = $uad.fromPrimitiveArray($vals);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, numHashes = newRight)
}

/** Column-level entry point for the native text expressions (no session
  * registration needed); [[graft.plans.GraftExtensions]] additionally
  * exposes `graft_minhash` to SQL. */
object TextFunctions {
  /** One-pass xxhash64 MinHash signature: slot i ==
    * `array_min(transform(toks, t => xxhash64(lit(i), t)))` bitwise; NULL
    * on a NULL or empty token array. */
  def minHashSignature(tokens: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(tokens), Literal(numHashes)))
  }
}
