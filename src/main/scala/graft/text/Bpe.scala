package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a distributed corpus.
  *
  * Classic BPE (Sennrich et al. 2016): start from characters, repeatedly
  * merge the most frequent adjacent symbol pair. The corpus-scale step is
  * ONE shuffle — the distinct-word count table — after which every merge
  * round runs over the VOCAB-BOUNDED word table (tens of thousands of
  * rows at any corpus size), so the iterative loop never touches corpus
  * data again. q72 computes one round's pair counts; this operator runs
  * the full loop and emits the learned merge table.
  *
  * Symbol layout: a word's symbol sequence is one string of wrapped
  * symbols, `"<l><o><w>"`. A merge (a,b) is the literal replacement
  * `"<a><b>" → "<ab>"`; both Spark's and DuckDB's `replace` substitute
  * all occurrences left-to-right non-overlapping, which is exactly BPE's
  * simultaneous-merge rule, and the wrappers make partial-symbol matches
  * impossible (`<a><b>` can never match inside `<xa><b>`). Wrapper chars
  * `<` `>` cannot appear in symbols: [[graft.functions.TextFns.wordTokens]]
  * strips everything but letters/digits.
  *
  * Determinism: ties on pair count break lexicographically on the wrapped
  * pair string (ASCII `<` orders below every letter, so the order is
  * effectively (first symbol, second symbol)). No RNG, no float.
  *
  * The per-round argmax is a 1-row driver collect over the vocab-bounded
  * count table — the same sanctioned driver-size regime as the other
  * vocab-bounded loops (W2V grid, AP, t-SNE). [[mirrorSql]] generates the
  * DuckDB oracle: `numMerges` chained CTE rounds that RECOMPUTE pair
  * counts and the argmax from scratch — the oracle verifies the training
  * decisions, not just the final table.
  */
object Bpe {

  final case class Merge(step: Int, pair: String, count: Long)

  /** `"<l><o><w>"` from `"low"` — chars wrapped and concatenated. */
  private def wrapChars(word: Column): Column =
    concat_ws("", transform(filter(split(word, ""), c => c =!= ""),
      c => concat(lit("<"), c, lit(">"))))

  /** Wrapped adjacent pairs of the symbol string: `"<l><o><w>"` →
    * `["<l><o>", "<o><w>"]`. Empty below 2 symbols (Spark's
    * `sequence(1,0)` DESCENDS — the guard is load-bearing). */
  private def wrappedPairs(symStr: Column): Column = {
    val syms = split(expr_trim(symStr), "><")
    val n = size(syms)
    when(n < 2, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), n - 1), i =>
        concat(lit("<"), element_at(syms, i), lit("><"),
          element_at(syms, i + 1), lit(">"))))
  }
  private def expr_trim(c: Column): Column =
    call_function("btrim", c, lit("<>")) // TRIM(BOTH '<>' FROM c)

  /** Train `numMerges` merges over `(wordCol, countCol)` — a distinct-word
    * frequency table (vocab-bounded; build it with ONE corpus shuffle).
    * Returns the merge list in training order. */
  def train(words: DataFrame, wordCol: String, countCol: String,
            numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"bpe: numMerges must be >= 1, got $numMerges")
    val spark = words.sparkSession
    // the rdd rebuild (q54's pattern) truncates the LOGICAL plan each
    // round — without it, round i's plan nests i InMemoryRelations and
    // Spark's per-action explain-string rendering goes super-linear
    // (measured: 20 rounds = minutes of driver CPU in generateTreeString
    // before any work ran)
    def rebuilt(df: DataFrame): DataFrame = {
      val p = graft.Caches.persist(df)
      p.count() // materialize: round i must scan the cache, not lineage
      spark.createDataFrame(p.rdd, p.schema)
    }
    var cur = rebuilt(words.select(wrapChars(col(wordCol)).as("s"),
      col(countCol).cast("long").as("c")))
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val best = cur
        .select(explode(wrappedPairs(col("s"))).as("pr"), col("c"))
        .groupBy(col("pr")).agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("pr").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word is one symbol
      else {
        val pair = best.head.getString(0)
        merges += Merge(step, pair, best.head.getLong(1))
        val target = pair.replace("><", "")
        cur = rebuilt(cur.select(call_function("replace",
          col("s"), lit(pair), lit(target)).as("s"), col("c")))
        step += 1
      }
    }
    merges.toSeq
  }

  /** Apply a learned merge list to a symbol-wrapped word column —
    * merges replay in training order (chained literal replaces, all
    * codegen'd; no shuffle). */
  def applyMerges(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(wrapChars(word)) { (acc, m) =>
      call_function("replace", acc, lit(m.pair), lit(m.pair.replace("><", "")))
    }

  /** DuckDB mirror: `numMerges` chained rounds over relation `wordsRel`
    * (columns `(w, c)`, declared by the caller's `withPrefix` CTEs),
    * each RECOMPUTING pair counts and the (count desc, pair asc) argmax
    * in SQL. Emits `(step, pair, cnt)`. The SQL depends only on
    * `numMerges`, never on a training run — the oracle verifies the
    * training decisions themselves. */
  def mirrorSql(withPrefix: String, wordsRel: String, numMerges: Int): String = {
    val union = (0 until numMerges)
      .map(i => s"SELECT $i AS step, pr AS pair, cnt FROM b$i")
      .mkString("\nUNION ALL ")
    s"""${mirrorCtes(withPrefix, wordsRel, numMerges)}
       |SELECT CAST(step AS BIGINT) AS step, pair, CAST(cnt AS BIGINT) AS cnt
       |FROM ($union) ORDER BY step""".stripMargin
  }

  /** The shared CTE chain up to the final word table `w{numMerges}`
    * (columns `(w, c, s)` — original word, count, merged symbol
    * string). [[mirrorSql]] reads the per-round argmaxes `b{i}`;
    * encode-side oracles (q92) read `w{numMerges}` as the learned
    * word → subword map. Every per-round CTE is `MATERIALIZED`:
    * DuckDB inlines multiply-referenced CTEs, and a chain where round
    * i+1 references round i two-to-three times re-expands
    * exponentially without it. */
  def mirrorCtes(withPrefix: String, wordsRel: String, numMerges: Int): String = {
    val rounds = (0 until numMerges).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT pr, SUM(c) AS cnt FROM (
         |    SELECT unnest(CASE WHEN len(syms) < 2 THEN CAST([] AS VARCHAR[])
         |             ELSE ['<'||syms[j]||'><'||syms[j+1]||'>'
         |                   FOR j IN generate_series(1, len(syms)-1)] END) AS pr, c
         |    FROM (SELECT string_split(trim(s, '<>'), '><') AS syms, c FROM w$i))
         |  GROUP BY pr),
         |b$i AS MATERIALIZED (
         |  SELECT pr, cnt FROM p$i ORDER BY cnt DESC, pr ASC LIMIT 1),
         |w${i + 1} AS MATERIALIZED (
         |  SELECT w, c,
         |         replace(s, (SELECT pr FROM b$i),
         |                 (SELECT replace(pr, '><', '') FROM b$i)) AS s
         |  FROM w$i)""".stripMargin
    }.mkString(",\n")
    s"""$withPrefix,
       |w0 AS MATERIALIZED (
       |  SELECT w, c,
       |         list_aggregate(['<'||(w[i])||'>'
       |           FOR i IN generate_series(1, len(w))], 'string_agg', '') AS s
       |  FROM $wordsRel),
       |$rounds""".stripMargin
  }
}
