package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding hot path.
  *
  * Preference ladder (SURVEY.md §7.3): built-ins first — and the
  * relational surface uses only built-ins. Dense-vector dot products
  * are the one measured exception: the `zip_with`+`aggregate` form
  * allocates an intermediate array and interprets two lambdas per
  * element, ~10× the cost of a tight loop over the ArrayData. This
  * BinaryExpression evaluates the dot product in one pass with no
  * allocation; `doGenCode` emits a single call into the JIT-compiled
  * [[compute]] loop so whole-stage fusion survives the expression.
  * Explicitly `nullable`: mismatched lengths / null elements yield
  * NULL from non-null children.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL on length mismatch / null element even with non-null children
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects numeric arrays, got ${left.dataType} / ${right.dataType}")
  }

  private def elemGetter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case ArrayType(LongType, _) => (a, i) => a.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  @transient private lazy val getL = elemGetter(left.dataType)
  @transient private lazy val getR = elemGetter(right.dataType)

  /** Codegen + interpreted entry point; null = HOF-dot parity NULL. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    // HOF-dot parity (zip_with + aggregate): mismatched lengths or a
    // null element yield NULL, not a partial sum — downstream `>= tau`
    // predicates must drop such pairs, never merge on a prefix dot.
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += getL(a, i) * getR(b, i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dot", this)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val tmp = ctx.freshName("dot")
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

  override def prettyName: String = "graft_dot"
}

/** Native max-run counter: the occurrence count of the most frequent
  * element of a string array (0 for empty, NULL for NULL input).
  * Semantics ≡ [[TextFns.topElementCount]]'s HOF form on NULL-free
  * arrays (all callers — the n-gram producers never emit NULL
  * elements); on an array CONTAINING a NULL element the two diverge by
  * design: this returns NULL (can't attest a max run), the HOF counts
  * the non-NULL elements. O(d log d) sort+scan in one JIT-compiled
  * loop instead of the interpreted O(d²) distinct×filter lambda
  * cascade — the repetition metrics (q64/x31/q69) call this once per
  * n-gram size per row.
  */
case class TopRunCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  // NULL on a null array element even when the array itself is non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_top_count expects array<string>, got $other")
    }

  /** Codegen + interpreted entry point; null = null element present. */
  def compute(a: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n == 0) return java.lang.Long.valueOf(0L)
    val arr = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      arr(i) = a.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(arr.asInstanceOf[Array[Object]])
    var best = 1L
    var run = 1L
    i = 1
    while (i < n) {
      if (arr(i) == arr(i - 1)) {
        run += 1
        if (run > best) best = run
      } else run = 1
      i += 1
    }
    java.lang.Long.valueOf(best)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topRun", this)
    nullSafeCodeGen(ctx, ev, v => {
      val tmp = ctx.freshName("topRun")
      s"""
         |java.lang.Long $tmp = $ref.compute($v);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_top_count"
}

/** Fused repetition statistics: ONE eval over the token array emits
  * (n_bigrams, top_bigram_cnt, n_trigrams, top_trigram_cnt) — the four
  * adjacent-n-gram signals the Gopher-style repetition gate (q64/x31)
  * reads. Semantics ≡ `size(wordShingleSeq(t, k))` +
  * `graft_top_count(wordShingleSeq(t, k))` for k = 2, 3 on NULL-free,
  * space-free tokens (all callers — `wordTokens` splits on non-alnum,
  * so component-wise n-gram comparison ≡ the joined-string comparison;
  * FunctionsSpec asserts the parity). NULL token element → NULL struct,
  * matching [[TopRunCount]]'s can't-attest rule. The fusion removes the
  * 4 shingle-array materializations (2 per k: size + top-count inputs)
  * and their joined-string allocations — the positional n-grams are
  * counted by sorting an INDEX array with component-wise comparison,
  * never building the n-gram strings at all.
  */
case class RepetitionStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // NULL struct on a null token element even with a non-null array
  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram_cnt", LongType, nullable = false),
    StructField("n_trigrams", LongType, nullable = false),
    StructField("top_trigram_cnt", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_rep_stats expects array<string>, got $other")
    }

  /** Most-frequent adjacent k-gram count via index sort: order n-gram
    * start positions by component-wise token comparison, then run-scan.
    * Equivalent to sorting the joined strings (tokens contain no
    * separator char) without allocating them. */
  private def topKgram(toks: Array[org.apache.spark.unsafe.types.UTF8String],
                       k: Int): Long = {
    val m = toks.length - k + 1
    if (m <= 0) return 0L
    val idx = Array.tabulate(m)(Integer.valueOf)
    val cmp = new java.util.Comparator[Integer] {
      override def compare(x: Integer, y: Integer): Int = {
        var j = 0
        while (j < k) {
          val c = toks(x + j).compareTo(toks(y + j))
          if (c != 0) return c
          j += 1
        }
        0
      }
    }
    java.util.Arrays.sort(idx, cmp)
    var best = 1L
    var run = 1L
    var i = 1
    while (i < m) {
      if (cmp.compare(idx(i), idx(i - 1)) == 0) {
        run += 1
        if (run > best) best = run
      } else run = 1
      i += 1
    }
    best
  }

  /** Codegen + interpreted entry point; null = null element present. */
  def compute(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      toks(i) = a.getUTF8String(i)
      i += 1
    }
    val nBi = math.max(n - 1, 0).toLong
    val nTri = math.max(n - 2, 0).toLong
    org.apache.spark.sql.catalyst.InternalRow(
      nBi, topKgram(toks, 2), nTri, topKgram(toks, 3))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repStats", this)
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = $ref.compute($v);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_rep_stats"
}

object NativeFns {
  val DotName = "graft_dot"
  val TopCountName = "graft_top_count"
  val MinHashName = "graft_minhash"
  val SimHashName = "graft_simhash"
  val SimHashHsName = "graft_simhash_hs"
  val TokensInSetName = "graft_tokens_in_set"
  val BottomKName = "graft_bottomk"
  val BottomKDistinctName = "graft_bottomk_distinct"
  val RepStatsName = "graft_rep_stats"
  val PqEncodeName = "graft_pq_encode"
  val PqAdcName = "graft_pq_adc"

  /** All native function (name, builder) pairs — one registry shared by
    * [[register]] (live session) and `plans.GraftExtensions`
    * (session-build-time `injectFunction`). */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    DotName -> (exprs => ArrayDotProduct(exprs.head, exprs(1))),
    TopCountName -> (exprs => TopRunCount(exprs.head)),
    MinHashName -> (exprs => MinHashSignature(exprs.head, exprs(1), exprs(2))),
    SimHashName -> (exprs => SimHash64(exprs.head)),
    SimHashHsName -> (exprs => SimHashFromHashes(exprs.head, exprs(1))),
    TokensInSetName -> (exprs => TokensInSet(exprs.head, exprs(1))),
    BottomKName -> (exprs =>
      BottomKByHash(exprs.head, exprs(1), literalK(BottomKName, exprs(2)))),
    BottomKDistinctName -> (exprs =>
      BottomKByHash(exprs.head, exprs(1),
        literalK(BottomKDistinctName, exprs(2)), dedup = true)),
    RepStatsName -> (exprs => RepetitionStats(exprs.head)),
    PqEncodeName -> (exprs => PqEncodeCodes(exprs.head, exprs(1))),
    PqAdcName -> (exprs => PqAdcSum(exprs.head, exprs(1))),
  )

  /** k must be constant-foldable: eval(null) on e.g. an attribute
    * reference would NPE instead of raising the intended error. */
  private def literalK(fn: String, e: Expression): Int =
    (if (e.foldable) e.eval(null) else null) match {
      case i: Int => i
      case l: Long => l.toInt
      case _ => throw new IllegalArgumentException(
        s"$fn: k must be an integer literal, got $e")
    }

  /** Idempotently register the native functions on a session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  /** Native dot product — caller must have [[register]]ed the session. */
  def dot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** Native PQ encode: m nearest-centroid codes per vector
    * (bit-identical to the HOF twin in [[graft.operators.Pq]]) —
    * caller must have [[register]]ed. */
  def pqEncode(vec: Column, codebooks: Column): Column =
    call_function(PqEncodeName, vec, codebooks)

  /** Native ADC sum: Σ_s lut[s][codes[s]] (bit-identical to the HOF
    * aggregate fold) — caller must have [[register]]ed. */
  def pqAdc(lut: Column, codes: Column): Column =
    call_function(PqAdcName, lut, codes)

  /** Native top-element occurrence count (≡
    * [[TextFns.topElementCount]]) — caller must have [[register]]ed. */
  def topCount(arr: Column): Column = call_function(TopCountName, arr)

  /** Fused adjacent-n-gram repetition stats struct (see
    * [[RepetitionStats]]) — caller must have [[register]]ed. */
  def repStats(tokens: Column): Column = call_function(RepStatsName, tokens)

  /** Native MinHash signature over pre-materialized shingle hashes
    * (bit-identical to [[HashFns.minhashFromHashes]]). */
  def minhash(hs: Column, params: Seq[(Long, Long)]): Column =
    call_function(MinHashName, hs,
      org.apache.spark.sql.functions.array(params.map(p => lit(p._1)): _*),
      org.apache.spark.sql.functions.array(params.map(p => lit(p._2)): _*))

  /** Native SimHash64 over tokens (bit-identical to
    * [[HashFns.simhash64]]). */
  def simhash(tokens: Column): Column = call_function(SimHashName, tokens)

  /** Native SimHash over pre-materialized per-token hashes with a
    * caller-chosen bit width (bit-identical to
    * [[HashFns.simhashFromHashesHof]]). */
  def simhashFromHashes(hs: Column, bits: Int): Column =
    call_function(SimHashHsName, hs,
      org.apache.spark.sql.functions.lit(bits))

  /** Native membership count: tokens present in the literal word list,
    * with multiplicity (≡ `size(filter(tokens, isin(words)))`). */
  def tokensInSet(tokens: Column, words: Seq[String]): Column =
    call_function(TokensInSetName, tokens,
      org.apache.spark.sql.functions.array(
        words.map(org.apache.spark.sql.functions.lit): _*))

  /** Custom typed-buffer aggregate: the k values with the smallest
    * (hash, value) pairs per group, ascending — a deterministic
    * bounded group sample / KMV sketch (see [[BottomKByHash]]). */
  def bottomK(value: Column, hash: Column, k: Int): Column =
    call_function(BottomKName, value, hash,
      org.apache.spark.sql.functions.lit(k))

  /** KMV distinct-value sketch: the k smallest DISTINCT (hash, value)
    * pairs per group (duplicates inserted once). Feed the estimator
    * `(k-1)·|H| / h_(k)` for approximate distinct counts, with the
    * caller-supplied hash reproducible in an external oracle. */
  def bottomKDistinct(value: Column, hash: Column, k: Int): Column =
    call_function(BottomKDistinctName, value, hash,
      org.apache.spark.sql.functions.lit(k))

  private def lit(v: Long) = org.apache.spark.sql.functions.lit(v)
}
