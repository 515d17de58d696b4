package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the sketching hot path.
  *
  * The HOF forms in [[HashFns]] ([[HashFns.minhashFromHashes]],
  * [[HashFns.simhash64]]) are semantically exact but interpreted: a
  * MinHash signature evaluates numHashes × numShingles lambda calls per
  * row, a SimHash folds 64 × numTokens lambda calls — measured as the
  * dominant cost of the dedup benchmark queries. These expressions
  * compute the identical values in one call per row with a tight
  * JIT-compiled loop and no intermediate array allocation; `doGenCode`
  * emits a single call into each expression's `compute` loop (via
  * `addReferenceObj`, the stock pattern for stateful built-ins) so
  * whole-stage fusion survives the expression.
  *
  * Parity with the HOF forms is asserted by ScalaTest (DedupSpec) —
  * they must stay bit-identical, including empty-input sentinels and
  * null handling.
  */

/** MinHash signature from pre-materialized shingle hashes.
  *
  * `minhash[j] = min over h in hashes of (a_j*h + b_j) mod p`,
  * p = 2^31-1; empty input → p sentinel in every slot (never collides
  * with a real min — mirrors [[HashFns.minhashFromHashes]]). Null
  * elements are skipped, like `array_min`.
  *
  * Children: (hashes: array<bigint>, as: array<bigint>, bs:
  * array<bigint>); the parameter arrays must be foldable literals.
  * All inputs are < p, so a*h + b < 2^62 + 2^31 — ANSI-overflow-safe.
  */
case class MinHashSignature(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private val P = HashFns.MersennePrime

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (!Seq(first, second, third).forall(isLongArray))
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects three array<bigint> args, got " +
          s"${first.dataType} / ${second.dataType} / ${third.dataType}")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_minhash hash-family parameters must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  // parameter families evaluated once, not per row
  @transient private lazy val as: Array[Long] =
    second.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val bs: Array[Long] =
    third.eval(null).asInstanceOf[ArrayData].toLongArray()

  /** Codegen + interpreted entry point (never null on non-null input). */
  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val k = as.length
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = as(j); val b = bs(j)
      var mn = P // empty-set / all-null sentinel
      var i = 0
      while (i < n) {
        if (!hs.isNullAt(i)) {
          val v = (a * hs.getLong(i) + b) % P
          if (v < mn) mn = v
        }
        i += 1
      }
      out(j) = mn
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(h: Any, a2: Any, a3: Any): Any =
    compute(h.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this)
    nullSafeCodeGen(ctx, ev, (h, _, _) => s"${ev.value} = $ref.compute($h);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_minhash"
}

/** Count of array elements that belong to a literal string set (with
  * multiplicity) — `size(filter(tokens, isin(words)))` as one hashed
  * set probe per token instead of |words| interpreted comparisons per
  * token per reference. Used by the language-ID scorer, where the
  * argmax CASE chain references each per-language count several times.
  *
  * Children: (tokens: array<string>, words: array<string> literal).
  */
case class TokensInSet(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_tokens_in_set expects (array<string>, literal array<string>)")
    }

  @transient private lazy val wordSet: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i))
      i += 1
    }
    s
  }

  /** Codegen + interpreted entry point (never null on non-null input). */
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && wordSet.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(t: Any, w: Any): Any =
    compute(t.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokensInSet", this)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_tokens_in_set"
}

/** 64-bit SimHash over a token array: per bit, the sign of the sum of
  * ±1 contributions from each token's `xxhash64` (seed 42 — identical
  * to the built-in function, via [[XXH64.hashUTF8String]]); bit set iff
  * the sum is strictly positive. Null tokens hash to the seed, matching
  * `xxhash64(NULL)`. Mirrors [[HashFns.simhash64]] bit-for-bit.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got $other")
  }

  /** Codegen + interpreted entry point (never null on non-null input). */
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (toks.isNullAt(i)) 42L // xxhash64(NULL) = seed
        else XXH64.hashUTF8String(toks.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def nullSafeEval(t: Any): Any = compute(t.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

/** Generalized SimHash over pre-materialized per-token hashes: per bit
  * b in [0, bits), the sign of the sum of ±1 contributions from each
  * hash's bit b; bit set iff the sum is strictly positive. Lets the
  * caller pick an engine-portable token hash (e.g. the 60-bit
  * md5-prefix [[HashFns.md5Hash60]]) so an external SQL oracle can
  * reproduce the sketch bit-for-bit. Null elements are skipped; empty
  * array → 0. Mirrors [[HashFns.simhashFromHashesHof]].
  *
  * Children: (hashes: array<bigint>, bits: int literal in [1, 64]).
  */
case class SimHashFromHashes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) if right.foldable =>
      val b = right.eval(null)
      if (b == null || b.asInstanceOf[Int] < 1 || b.asInstanceOf[Int] > 64)
        TypeCheckResult.TypeCheckFailure(
          s"graft_simhash_hs: bits must be a literal in [1, 64], got $b")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_hs expects (array<bigint>, literal int), got $other")
  }

  @transient private lazy val bits: Int = right.eval(null).asInstanceOf[Int]

  /** Codegen + interpreted entry point (never null on non-null input). */
  def compute(hs: ArrayData): Long = {
    val n = hs.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val hv = hs.getLong(i)
        var j = 0
        while (j < bits) {
          if (((hv >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override def nullSafeEval(h: Any, b: Any): Any =
    compute(h.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashHs", this)
    nullSafeCodeGen(ctx, ev, (h, _) => s"${ev.value} = $ref.compute($h);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_simhash_hs"
}
