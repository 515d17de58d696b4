package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the native expression family really CODEGENS — Spark silently
  * falls back to interpreted eval when generated code fails to compile,
  * so every suite could stay green while the `doGenCode` paths are
  * broken. Forcing `codegen.factoryMode=CODEGEN_ONLY` (projections
  * throw instead of falling back) and `codegen.fallback=false`
  * (whole-stage failures throw) makes a Janino error a test failure.
  * Each case also exercises the null-out branch (malformed non-null
  * input → NULL), the path the `nullable = true` overrides guard.
  */
class NativeCodegenSpec extends SparkSpec {

  private def forcedCodegen[A](body: => A): A = {
    val conf = spark.conf
    val oldMode = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFall = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally {
      oldMode.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
      oldFall.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
    }
  }

  private lazy val registered: Unit = NativeFns.register(spark)

  test("graft_dot codegens: value and null-out on mismatch/null element") {
    registered
    import spark.implicits._
    forcedCodegen {
      val df = Seq(
        (1L, Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
        (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
        (3L, Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      ).toDF("id", "a", "b").repartition(1) // defeat ConvertToLocalRelation
      val out = df.select($"id", NativeFns.dot($"a", $"b").as("d"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      assert(out(1L) == 32.0)
      assert(out(2L) == null, "length mismatch must be NULL")
      assert(out(3L) == null, "null element must be NULL")
    }
  }

  test("graft_top_count + graft_rep_stats codegen: value and null-out") {
    registered
    import spark.implicits._
    forcedCodegen {
      val df = Seq(
        (1L, Seq[String]("a", "b", "a", "a", "b")),
        (2L, Seq[String]("a", null, "b")),
        (3L, Seq.empty[String]),
      ).toDF("id", "toks").repartition(1)
      val out = df.select($"id",
          NativeFns.topCount($"toks").as("tc"),
          NativeFns.repStats($"toks").as("rs"))
        .collect().map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) null else r.getLong(1)), r.isNullAt(2),
            if (r.isNullAt(2)) null else r.getStruct(2).getLong(0))).toMap
      assert(out(1L) == ((3L, false, 4L))) // 3× "a"; 4 bigrams
      assert(out(2L) == ((null, true, null)), "null element → NULL")
      assert(out(3L) == ((0L, false, 0L)))
    }
  }

  test("sketch expressions codegen: minhash / simhash / simhash_hs / tokens_in_set") {
    registered
    import spark.implicits._
    forcedCodegen {
      val df = Seq(
        (1L, Seq("the", "cat", "sat"), Seq(7L, 11L, 13L)),
        (2L, Seq.empty[String], Seq.empty[Long]),
      ).toDF("id", "toks", "hs").repartition(1)
      val params = Seq((3L, 5L), (2L, 1L))
      val out = df.select($"id",
          NativeFns.minhash($"hs", params).as("mh"),
          NativeFns.simhash($"toks").as("sh"),
          NativeFns.simhashFromHashes($"hs", 8).as("shh"),
          NativeFns.tokensInSet($"toks", Seq("the", "sat", "dog")).as("tis"))
        .collect().map(r => r.getLong(0) ->
          ((r.getSeq[Long](1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      // minhash: min over h of (a*h+b) mod p — small values, no mod wrap
      assert(out(1L)._1 == Seq(3 * 7 + 5, 2 * 7 + 1))
      assert(out(2L)._1 == Seq(HashFns.MersennePrime, HashFns.MersennePrime))
      // simhash of one-off tokens vs the HOF twin (computed on the
      // interpreted path in DedupSpec; here just stability + empty=0)
      assert(out(2L)._2 == 0L && out(2L)._3 == 0L)
      // 7=0b111, 11=0b1011, 13=0b1101: bit-majority over 8 bits → 0b1111 &
      // per-bit: b0 all set, b1 two set (7,11), b2 two set (7,13), b3 two set (11,13)
      assert(out(1L)._3 == 15L)
      assert(out(1L)._4 == 2L && out(2L)._4 == 0L)
    }
  }

  test("native expressions join whole-stage codegen (no interpreted island)") {
    registered
    import spark.implicits._
    import org.apache.spark.sql.execution.debug._
    val conf = spark.conf
    val oldAqe = conf.getOption("spark.sql.adaptive.enabled")
    // AQE wraps the plan in AdaptiveSparkPlanExec, which hides the
    // codegen stages from pre-execution inspection — disable for the
    // structural check only
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Seq((1L, Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("id", "a", "b")
        .repartition(1)
        .select(NativeFns.dot($"a", $"b").as("d"))
      val segs = df.queryExecution.debug.codegenToSeq()
      assert(segs.nonEmpty,
        "the projection over graft_dot must sit INSIDE a WholeStageCodegen " +
          "stage — a CodegenFallback would exclude it")
      assert(segs.exists(_._2.contains(".compute(")),
        "generated code must call the native compute loop directly")
    } finally {
      oldAqe.fold(conf.unset("spark.sql.adaptive.enabled"))(
        conf.set("spark.sql.adaptive.enabled", _))
    }
  }

  test("graft_pq_encode / graft_pq_adc codegen: value and null-out") {
    registered
    import spark.implicits._
    forcedCodegen {
      // m=2, k=2, subDim=1: codebooks [[ [0.0],[10.0] ], [ [5.0],[6.0] ]]
      val cb = typedLit(Seq(Seq(Seq(0.0), Seq(10.0)), Seq(Seq(5.0), Seq(6.0))))
      val df = Seq(
        (1L, Seq[java.lang.Double](9.0, 5.4)),
        (2L, Seq[java.lang.Double](9.0)), // wrong length
        (3L, Seq[java.lang.Double](9.0, null)), // null element
      ).toDF("id", "vec").repartition(1)
      val enc = df.select($"id", NativeFns.pqEncode($"vec", cb).as("codes"))
      val out = enc.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
      assert(out(1L) == Seq(1, 0))
      assert(out(2L) == null && out(3L) == null)

      val lut = typedLit(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
      val adcDf = Seq(
        (1L, Seq(1, 0)),
        (2L, Seq(1)), // wrong length
        (3L, Seq(1, 9)), // out-of-range code
      ).toDF("id", "codes").repartition(1)
      val adc = adcDf.select($"id", NativeFns.pqAdc(lut, $"codes").as("d"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      assert(adc(1L) == 5.0)
      assert(adc(2L) == null && adc(3L) == null)
    }
  }
}
