package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  */

/** `graft_pq_encode(vec, codebooks)`: per subspace s of the m-way
  * split, the index (0-based) of the nearest centroid by squared L2,
  * ties to the LOWEST index — exactly `array_position(d, array_min(d))
  * - 1` over distances computed as the `aggregate` left fold
  * `acc + (x−y)·(x−y)` in element order. `codebooks` is the m×k×subDim
  * literal; subDim is derived from it, and `vec` must have m·subDim
  * elements (NULL otherwise, matching HOF NULL propagation on
  * malformed input). Output: array<int> of m codes. */
case class PqEncodeCodes(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _),
          ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects (array<double>, array<array<array<double>>>), got $l / $r")
  }

  override def nullSafeEval(v: Any, cb: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val books = cb.asInstanceOf[ArrayData]
    val m = books.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Int])
    val sub0 = books.getArray(0)
    if (sub0.numElements() == 0) return null
    val subDim = sub0.getArray(0).numElements()
    if (vec.numElements() != m * subDim) return null
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
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc expects (array<array<double>>, array<int>), got $l / $r")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
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
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_pq_adc"
}
