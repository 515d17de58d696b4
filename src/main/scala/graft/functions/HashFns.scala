package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashing/sketching building blocks for deduplication: shingling,
  * MinHash signatures, SimHash. Built on `xxhash64` (Spark-native,
  * codegen'd, stable across partitions/runs) + higher-order functions.
  */
object HashFns {

  /** Mersenne prime 2^31-1: universal-hash domain chosen so that
    * a*h + b with a,b,h < p stays far below Long overflow — the
    * expressions evaluate safely under ANSI mode (no wraparound). */
  val MersennePrime: Long = (1L << 31) - 1

  /** Deterministic hash-family parameters (a, b) derived from a seed by
    * splitmix64 — computed on the driver, baked in as literals. */
  def hashParams(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def pos(v: Long): Long = v & Long.MaxValue
    Seq.fill(numHashes)((pos(next()) % (MersennePrime - 1)) + 1 ->
      pos(next()) % MersennePrime)
  }

  /** Word k-shingles: distinct space-joined k-grams of a token array.
    * `size < k` → empty array. The token array is lambda-bound so the
    * (possibly expensive) producing expression evaluates once per row,
    * not once per shingle position (see [[ExprUtils.bind]]). */
  def wordShingles(tokens: Column, k: Int): Column =
    ExprUtils.bind(tokens) { t =>
      when(size(t) < k, array().cast("array<string>"))
        .otherwise(array_distinct(
          transform(sequence(lit(0), size(t) - k),
            i => array_join(slice(t, i + lit(1), lit(k)), " "))))
    }

  /** Positional word k-shingles: the ORDERED k-gram sequence of a
    * token array, duplicates kept — unlike [[wordShingles]] (a distinct
    * SET for Jaccard/minhash), this preserves document positions, which
    * window-based selection ([[winnow]]) depends on. */
  def wordShingleSeq(tokens: Column, k: Int): Column =
    ExprUtils.bind(tokens) { t =>
      when(size(t) < k, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(t) - k),
          i => array_join(slice(t, i + lit(1), lit(k)), " ")))
    }

  /** MOSS-style winnowing selection over a positional hash sequence:
    * slide a window of `w` consecutive k-gram hashes and keep each
    * window's minimum; the distinct selected values are the document's
    * fingerprint set. Guarantee (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * any shared substring of at least w+k-1 tokens contributes at
    * least one common fingerprint, while storage is ~2/(w+1) of the
    * hash count. Fewer than `w` hashes → empty fingerprint (too short
    * to attest). The hash array is lambda-bound: the producing
    * expression evaluates once per row, not once per window. */
  def winnow(hashes: Column, w: Int): Column =
    ExprUtils.bind(hashes) { h =>
      // NULL hash array NULL-propagates (same convention as the
      // shingle fns) — only a real-but-short document yields the EMPTY
      // fingerprint; without the explicit first branch a NULL `size`
      // would fall through `when` into `.otherwise(empty)` and
      // conflate the two.
      // NB sequence(1, n) with n < 1 would DESCEND in Spark — guard it
      when(h.isNull, lit(null).cast("array<long>"))
        .when(size(h) >= w,
          array_sort(array_distinct(
            transform(sequence(lit(1), size(h) - (w - 1)),
              i => array_min(slice(h, i, lit(w)))))))
        .otherwise(array().cast("array<long>"))
    }

  /** Non-negative element hash of each shingle.
    * NOTE for callers: materialize the result (e.g. behind a
    * repartition) before feeding it to a multi-hash consumer — an
    * interpreted HOF re-evaluates referenced subtrees per lambda
    * element, so an inlined string pipeline would be re-run per hash
    * function. */
  def shingleHashes(shingles: Column): Column =
    shingleHashesWith(shingles, s => pmod(xxhash64(s), lit(MersennePrime)))

  /** [[shingleHashes]] with a caller-chosen element hash. */
  def shingleHashesWith(shingles: Column, elemHash: Column => Column): Column =
    transform(shingles, elemHash)

  /** SQL-mirrorable element hash: 60-bit md5 prefix mod p. Unlike
    * `xxhash64` (Spark-internal), MD5 is identical in every engine, so
    * a DuckDB oracle reproduces this family bit-for-bit:
    * `CAST(('0x' || substr(md5(s),1,15)) AS BIGINT) % p`. */
  def md5Hash(s: Column): Column =
    pmod(conv(substring(md5(s), 1, 15), 16, 10).cast("long"), lit(MersennePrime))

  /** Raw 60-bit md5-prefix hash (no modulus) — the SQL-mirrorable token
    * hash for bitwise sketches, where every one of the 60 bits is a
    * usable signal (a mod-p hash would bias the high bits):
    * `CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)`. Always ≥ 0. */
  def md5Hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** MinHash signature from pre-materialized shingle hashes: for each
    * (a,b) in the family, min over hashes of (a*h+b) mod p. Empty
    * shingle set → p (sentinel larger than any hash, never collides
    * with a real min). Returns `array<bigint>` of length `params.size`. */
  def minhashFromHashes(hs: Column, params: Seq[(Long, Long)]): Column =
    ExprUtils.bind(hs) { hh =>
      array(params.map { case (a, b) =>
        when(size(hh) === 0, lit(MersennePrime))
          .otherwise(array_min(transform(hh,
            h => pmod(h * lit(a) + lit(b), lit(MersennePrime)))))
      }: _*)
    }

  /** Convenience form over raw shingles — only for small inputs/tests;
    * see [[shingleHashes]] for the materialization caveat. */
  def minhashSignature(shingles: Column, params: Seq[(Long, Long)]): Column =
    minhashFromHashes(shingleHashes(shingles), params)

  /** LSH band keys from a MinHash signature: hash each band of
    * `rowsPerBand` signature entries to one bucket key; docs agreeing on
    * any band key become candidate pairs. Returns `array<bigint>` of
    * length numBands = sig.len / rowsPerBand. */
  def lshBandKeys(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    ExprUtils.bind(signature) { sig =>
      transform(sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(b, array_join(
          slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)), ",")))
    }

  /** SQL-mirrorable band keys: the band index + raw signature slice as
    * a string (no key-compaction hash — identical in any engine).
    * Returns `array<string>`. */
  def lshBandKeysPlain(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    ExprUtils.bind(signature) { sig =>
      transform(sequence(lit(0), lit(numBands - 1)),
        b => concat_ws(",", b.cast("string"), array_join(
          transform(slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
            x => x.cast("string")), ",")))
    }

  /** 64-bit SimHash over tokens (with multiplicity): per bit, sum of
    * ±1 contributions of each token's xxhash64; bit set iff sum > 0.
    * Bit-majority computed with an integer fold — deterministic. */
  private def shr(e: Column, bits: Column): Column = call_function("shiftright", e, bits)
  private def shl(e: Column, bits: Column): Column = call_function("shiftleft", e, bits)

  def simhash64(tokens: Column): Column = ExprUtils.bind(tokens) { toks =>
    val hashes = transform(toks, t => xxhash64(t))
    // counts: array of 64 signed sums of ±1 bit contributions
    val counts = aggregate(
      hashes,
      transform(sequence(lit(0), lit(63)), _ => lit(0)),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (c, b) => c + when(shr(h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)))
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, b) => when(c > 0, shl(lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Generalized SimHash over pre-materialized per-token hashes: per bit
    * b in [0, bits), the sign of the sum of ±1 contributions from each
    * hash's bit b. HOF form — the parity baseline for the native
    * `graft_simhash_hs` expression (see SketchExprs). Null hash
    * elements are skipped. Empty array → 0. */
  def simhashFromHashesHof(hashes: Column, bits: Int): Column =
    ExprUtils.bind(hashes) { hs =>
      val counts = aggregate(
        filter(hs, h => h.isNotNull),
        transform(sequence(lit(0), lit(bits - 1)), _ => lit(0)),
        (acc, h) => zip_with(acc, sequence(lit(0), lit(bits - 1)),
          (c, b) => c + when(shr(h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)))
      aggregate(
        zip_with(counts, sequence(lit(0), lit(bits - 1)),
          (c, b) => when(c > 0, shl(lit(1L), b)).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc.bitwiseOR(x))
    }

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Split the low `bits` bits of a sketch into `chunks` equal
    * bit-chunks (pigeonhole candidate generation: hamming over those
    * bits <= chunks-1 ⇒ some chunk equal; `bits` must be divisible by
    * `chunks`). The sketch is lambda-bound: otherwise CollapseProject
    * inlines the (possibly expensive) sketch-producing expression into
    * the lambda, where it is re-evaluated once per chunk. */
  def bitChunks(sketch: Column, chunks: Int, bits: Int = 64): Column = {
    require(bits % chunks == 0, s"bitChunks: $bits bits not divisible by $chunks")
    val width = bits / chunks
    val mask = (1L << width) - 1
    ExprUtils.bind(sketch) { sk =>
      transform(sequence(lit(0), lit(chunks - 1)),
        i => shr(sk, i * lit(width)).bitwiseAND(lit(mask)))
    }
  }
}
