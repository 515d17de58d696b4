package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the product-quantization hot paths
  * ([[graft.operators.Pq]]) — the same preference-ladder exception as
  * [[ArrayDotProduct]]: the HOF forms interpret four nested lambdas
  * per element (`transform`/`aggregate` over m×k×subDim terms for
  * encode, m lookups for ADC), which is the dominant per-row cost of
  * the PQ serving path at corpus scale. Each expression is
  * BIT-identical to its HOF twin (same left-to-right fold order, same
  * first-minimum tie-break — parity-tested in PqSpec) but runs as one
  * JIT-compiled loop over the ArrayData with no intermediate arrays.
  *
  * Codegen: `doGenCode` emits a single call into the expression's own
  * `compute` loop (referenced via `addReferenceObj`, the stock Spark
  * pattern for stateful built-ins) — whole-stage fusion survives the
  * expression instead of falling back to an interpreted island, and
  * the loop body is the same JIT-compiled Scala either way.
  *
  * Both expressions are explicitly `nullable`: they return NULL on
  * malformed non-null input (length mismatch, out-of-range code, null
  * vector element), so the optimizer must never assume non-null output
  * from non-null children.
  */

/** `graft_pq_encode(vec, codebooks)`: per subspace s of the m-way
  * split, the index (0-based) of the nearest centroid by squared L2,
  * ties to the LOWEST index — exactly `array_position(d, array_min(d))
  * - 1` over distances computed as the `aggregate` left fold
  * `acc + (x−y)·(x−y)` in element order. `codebooks` is the m×k×subDim
  * literal; subDim is derived from it, and `vec` must have m·subDim
  * non-null elements (NULL otherwise — a null element would
  * null-propagate through the HOF `aggregate` twin, so the native form
  * refuses it rather than silently reading 0.0). Output: array<int> of
  * m codes. */
case class PqEncodeCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // NULL on malformed input even when both children are non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _),
          ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects (array<double>, array<array<array<double>>>), got $l / $r")
  }

  /** Codegen + interpreted entry point; null = malformed input. */
  def compute(vec: ArrayData, books: ArrayData): ArrayData = {
    val m = books.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Int])
    val sub0 = books.getArray(0)
    if (sub0.numElements() == 0) return null
    val subDim = sub0.getArray(0).numElements()
    val n = vec.numElements()
    if (n != m * subDim) return null
    var i = 0
    while (i < n) { // HOF parity: a null element poisons the whole fold
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = books.getArray(s)
      val k = book.numElements()
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < k) {
        val cent = book.getArray(c)
        // the HOF twin's exact fold: 0.0 + d0² + d1² + … in order
        var acc = 0.0
        var j = 0
        while (j < subDim) {
          val d = vec.getDouble(s * subDim + j) - cent.getDouble(j)
          acc += d * d
          j += 1
        }
        // strict < keeps the FIRST minimal index ≡ array_position of
        // array_min (first occurrence)
        if (acc < bd) { bd = acc; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any, cb: Any): Any =
    compute(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this)
    nullSafeCodeGen(ctx, ev, (v, cb) =>
      s"""
         |${ev.value} = $ref.compute($v, $cb);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_pq_encode"
}

/** `graft_pq_adc(lut, codes)`: the asymmetric-distance sum
  * Σ_s lut[s][codes[s]] as the `aggregate` left fold starting 0.0 —
  * m integer-indexed lookups per corpus row, the entire scan-side cost
  * of a PQ query. NULL on a code outside its table row (the HOF form's
  * element_at would raise under ANSI; the serving path never produces
  * one — a NULL here surfaces the corruption to the caller's
  * null-checks instead). Output: double. */
case class PqAdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL on malformed input even when both children are non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc expects (array<array<double>>, array<int>), got $l / $r")
  }

  /** Codegen + interpreted entry point; null = malformed input. */
  def compute(lut: ArrayData, codes: ArrayData): java.lang.Double = {
    val m = lut.numElements()
    if (codes.numElements() != m) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val row = lut.getArray(s)
      val c = codes.getInt(s)
      if (c < 0 || c >= row.numElements()) return null
      acc += row.getDouble(c)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def nullSafeEval(l: Any, r: Any): Any = compute(
    l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val tmp = ctx.freshName("adc")
      s"""
         |java.lang.Double $tmp = $ref.compute($l, $r);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_pq_adc"
}
