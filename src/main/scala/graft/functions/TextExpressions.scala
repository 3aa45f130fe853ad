package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnsafeArrayData, XXH64}
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

/** Native one-pass SimHash over a token array — the shuffle-free form of
  * the bit-vote fingerprint.
  *
  * [[graft.dedup.Dedup.simHash]]'s original formulation exploded the token
  * array to |tokens| rows, computed per-token hash bits as 32 vote columns,
  * and re-aggregated per document — a row inflation of the whole corpus
  * followed by a shuffle, for a value that is a pure function of one row.
  * This expression fuses the votes into a single per-row loop: for each
  * non-null token, hash once, add ±1 to each of `numBits` running votes;
  * bit j of the result is set iff vote j is positive. The operator becomes
  * a map — at corpus scale that deletes the dedup pipeline's only
  * remaining row-inflating shuffle.
  *
  * Two hash modes (foldable `mode` child), both value-identical to their
  * pre-existing twins (ScalaTest-asserted):
  *  - `'md5'` — the DuckDB-portable oracle semantics: vote j reads bit
  *    (j % 4) of the (j / 4)-th hex nibble of `md5(token)` (UTF-8 bytes),
  *    exactly the explode/groupBy formulation's
  *    `shiftright(nibble(substring(md5(tok), 1 + j/4, 1)), j%4) & 1`;
  *    numBits ≤ 32 (the pre-existing cap).
  *  - `'xx64'` — production: vote j reads bit j of `xxhash64(token)`
  *    (seed 42, Spark-identical); numBits ≤ 64, no string hex
  *    materialization.
  *
  * NULL on a NULL or EMPTY token array (the explode twin emits no rows for
  * such documents — callers filter the NULLs to preserve row parity); a
  * NULL token element casts no votes (its hash is NULL in the twin, and
  * `sum` ignores NULLs).
  */
case class SimHash(tokens: Expression, numBits: Expression, mode: Expression)
    extends TernaryExpression {

  override def first: Expression = tokens
  override def second: Expression = numBits
  override def third: Expression = mode
  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType
  // NULL also arises from an empty token array, independent of child nulls.
  override def nullable: Boolean = true

  @transient private lazy val nB: Int = numBits.eval().asInstanceOf[Int]
  @transient private lazy val md5Mode: Boolean =
    mode.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString == "md5"

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, numBits.dataType, mode.dataType) match {
      case (ArrayType(StringType, _), IntegerType, StringType)
          if numBits.foldable && mode.foldable =>
        val m = Option(mode.eval()).map(_.toString).orNull
        val n = numBits.eval()
        if (m != "md5" && m != "xx64")
          TypeCheckResult.TypeCheckFailure(s"$prettyName mode must be 'md5' or 'xx64', got $m")
        else if (n == null || n.asInstanceOf[Int] < 1 ||
                 n.asInstanceOf[Int] > (if (m == "md5") 32 else 64))
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires 1 <= numBits <= ${if (m == "md5") 32 else 64} for mode $m, got $n")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<STRING>, foldable INT, foldable STRING), " +
          s"got ${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }

  /** Fused vote loop; caller guarantees a non-empty array. Invoked from
    * both the interpreted path and the generated code (the loop body stays
    * in one place; the call from generated code keeps the projection inside
    * WholeStageCodegen, which is what the explode/groupBy twin could not). */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](nB)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) {
        val t = arr.getUTF8String(j)
        if (md5Mode) {
          val d = SimHash.md5Digest.get()
          d.reset()
          val h = d.digest(t.getBytes)
          var i = 0
          while (i < nB) {
            val hexIdx = i / 4
            val b = h(hexIdx / 2) & 0xff
            val nibble = if ((hexIdx & 1) == 0) b >>> 4 else b & 0xf
            if (((nibble >>> (i % 4)) & 1) == 1) votes(i) += 1 else votes(i) -= 1
            i += 1
          }
        } else {
          val hv = XXH64.hashUTF8String(t, 42L)
          var i = 0
          while (i < nB) {
            if (((hv >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
            i += 1
          }
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < nB) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override def nullSafeEval(toksAny: Any, nAny: Any, mAny: Any): Any = {
    val arr = toksAny.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash].getName)
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      s"""
         |if ($a.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $self.compute($a);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(tokens = newFirst, numBits = newSecond, mode = newThird)
}

object SimHash {
  /** Per-thread MD5 digest — `MessageDigest` is stateful and the generated
    * code may evaluate the expression from many tasks concurrently. */
  private val md5Digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** Column-level entry point for the native text expressions (no session
  * registration needed); [[graft.plans.GraftExtensions]] additionally
  * exposes `graft_minhash` / `graft_simhash` to SQL. */
object TextFunctions {
  import org.apache.spark.sql.catalyst.expressions.Literal

  /** One-pass xxhash64 MinHash signature: slot i ==
    * `array_min(transform(toks, t => xxhash64(lit(i), t)))` bitwise; NULL
    * on a NULL or empty token array. */
  def minHashSignature(tokens: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(tokens), Literal(numHashes)))

  /** One-pass SimHash fingerprint; `mode` = "md5" (oracle semantics,
    * numBits ≤ 32) or "xx64" (production, numBits ≤ 64). NULL on a NULL or
    * empty token array. */
  def simHash(tokens: Column, numBits: Int, mode: String): Column =
    GraftColumnBridge.column(SimHash(GraftColumnBridge.expression(tokens),
      Literal(numBits), Literal(org.apache.spark.unsafe.types.UTF8String.fromString(mode),
        StringType)))
}
