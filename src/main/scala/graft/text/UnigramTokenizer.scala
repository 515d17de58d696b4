package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece model) —
  * the third member of the tokenizer family next to BPE merge training
  * (q91/`Bpe`) and the frequency-ranked word vocab (`VocabEncoder`):
  * candidate pieces are scored by corpus log-probability and each word
  * is segmented by VITERBI decoding into its maximum-likelihood piece
  * sequence; re-counting pieces along the decoded segmentations is the
  * hard-EM E-step a full trainer iterates.
  *
  * Integer discipline (the q80/q83/q160 convention): piece scores are
  * floor-scaled micro-log-probs `floor(10⁶·ln(cnt/T))` — exact BIGINTs
  * thereafter, so DP totals compare and sum associatively and both
  * engines agree bit-for-bit. Viterbi ties break on (total DESC,
  * start-position DESC): on equal totals the SHORTER final piece wins.
  *
  * Scale design: ONE corpus shuffle (the distinct-word count table);
  * everything after — piece extraction, scoring, the DP — runs over the
  * VOCAB-BOUNDED word table (Heaps-law growth, tens of thousands of
  * rows at any corpus size; the same regime as `Bpe`). The DP itself is
  * row-local over each word's ≤ maxWordLen × maxPieceLen candidate
  * arcs. [[unrolledViterbiSql]] generates the DuckDB oracle: forward DP
  * and backtrace as chained MATERIALIZED CTEs (the q86/q91 pattern) —
  * the oracle re-derives every DP cell and the argmax chain, not just
  * the final segmentation.
  */
object UnigramTokenizer {

  val MaxWordLen = 16
  val MaxPieceLen = 4

  final case class Segmented(word: String, wcount: Long, best_micro: Long,
                             n_pieces: Long, seg: String)

  /** Distinct-word counts from a document table — the one corpus-scale
    * shuffle. Words longer than [[MaxWordLen]] are excluded (both
    * engines spell the same cap). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.TextFns.wordTokens(col(textCol)))
        .as("word"))
      .where(length(col("word")).between(1, MaxWordLen))
      .groupBy(col("word"))
      .agg(count(lit(1)).cast("long").as("wcount"))

  /** Candidate pieces: every substring of length 1..[[MaxPieceLen]] of
    * every word, occurrence-weighted by word count; pieces below
    * `minCount` are dropped EXCEPT single characters (kept
    * unconditionally so every word stays segmentable). Scores are
    * micro-log-probs against the kept-piece total. */
  def pieceScores(words: DataFrame, minCount: Long): DataFrame = {
    val occ = words
      .select(col("word"), col("wcount"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("wcount"), col("i"),
        explode(sequence(lit(1), lit(MaxPieceLen))).as("l"))
      .where(col("i") + col("l") - 1 <= length(col("word")))
      .select(expr("substring(word, i, l)").as("piece"), col("wcount"))
      .groupBy(col("piece"))
      .agg(sum(col("wcount")).cast("long").as("cnt"))
    val kept = occ.where(col("cnt") >= minCount || length(col("piece")) === 1)
    val tot = kept.agg(sum(col("cnt")).cast("long").as("t"))
    kept.crossJoin(tot)
      .select(col("piece"), col("cnt"),
        floor(lit(1000000) * log(col("cnt").cast("double") / col("t")))
          .cast("long").as("score"))
  }

  /** Viterbi-decode every word against the scored pieces. Arcs are
    * built relationally (word-substring positions joined to the piece
    * table — ≤ MaxWordLen·MaxPieceLen per word); the DP + backtrace is
    * a row-local map over each word's collected arc list. */
  def viterbi(words: DataFrame, pieces: DataFrame): Dataset[Segmented] = {
    val spark = words.sparkSession
    import spark.implicits._
    val arcs = arcsOf(words, pieces)
    arcs.groupBy(col("word"), col("wcount"))
      .agg(collect_list(struct(col("j"), col("i"), col("score"))).as("arcs"))
      .as[(String, Long, Seq[(Int, Int, Long)])]
      .map { case (word, wcount, arcList) =>
        val n = word.length
        val NegInf = Long.MinValue / 4
        val best = Array.fill(n + 1)(NegInf)
        val argj = Array.fill(n + 1)(-1)
        best(0) = 0L
        // arcs sorted by (i, j): scanning j ascending realizes the
        // (total DESC, j DESC) argmax — an equal total at a larger j
        // replaces (>=), a smaller total never does
        arcList.sortBy(a => (a._2, a._1)).foreach { case (j, i, score) =>
          if (best(j) > NegInf) {
            val cand = best(j) + score
            if (cand >= best(i)) { best(i) = cand; argj(i) = j }
          }
        }
        val segs = List.newBuilder[String]
        var pos = n
        var count = 0L
        while (pos > 0) {
          val j = argj(pos)
          segs += word.substring(j, pos)
          count += 1
          pos = j
        }
        Segmented(word, wcount, best(n), count, segs.result().reverse.mkString("|"))
      }
  }

  /** Candidate arcs shared by both decoders: every (start j, end i)
    * word-substring position whose substring is a kept piece, joined to
    * its score — ≤ MaxWordLen·MaxPieceLen per word, vocab-bounded. */
  private def arcsOf(words: DataFrame, pieces: DataFrame): DataFrame =
    words
      .select(col("word"), col("wcount"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("wcount"), col("i"),
        explode(sequence(lit(1), lit(MaxPieceLen))).as("l"))
      .where(col("l") <= col("i"))
      .select(col("word"), col("wcount"), col("i").cast("int").as("i"),
        (col("i") - col("l")).cast("int").as("j"),
        expr("substring(word, i - l + 1, l)").as("piece"))
      .join(pieces.select(col("piece"), col("score")), "piece")

  final case class GreedySeg(word: String, wcount: Long, greedy_micro: Long,
                             greedy_pieces: Long, greedy_seg: String)

  /** Greedy longest-match-first decode (the WordPiece inference rule,
    * Wu et al. 2016 §4.1) of every word against the SAME scored piece
    * vocabulary as [[viterbi]]: at each position take the LONGEST kept
    * piece starting there and advance past it — single characters are
    * always kept, so the scan always progresses and never backtracks.
    * Running both decoders over one vocab isolates the DECODER as the
    * only difference, which is exactly what the q183 regret audit
    * measures: greedy_micro ≤ best_micro always, and the gap is the
    * price of greedy inference. Same arc construction, row-local
    * linear scan instead of the DP. */
  def greedy(words: DataFrame, pieces: DataFrame): Dataset[GreedySeg] = {
    val spark = words.sparkSession
    import spark.implicits._
    arcsOf(words, pieces).groupBy(col("word"), col("wcount"))
      .agg(collect_list(struct(col("j"), col("i"), col("score"))).as("arcs"))
      .as[(String, Long, Seq[(Int, Int, Long)])]
      .map { case (word, wcount, arcList) =>
        val n = word.length
        // longest arc out of each start position (j → max i, with the
        // winning arc's score); the 1-char arc guarantees endAt(j) > j
        val endAt = Array.fill(n)(-1)
        val scoreAt = Array.fill(n)(0L)
        arcList.foreach { case (j, i, score) =>
          if (i > endAt(j)) { endAt(j) = i; scoreAt(j) = score }
        }
        val segs = List.newBuilder[String]
        var pos = 0
        var total = 0L
        var count = 0L
        while (pos < n) {
          val i = endAt(pos)
          segs += word.substring(pos, i)
          total += scoreAt(pos)
          count += 1
          pos = i
        }
        GreedySeg(word, wcount, total, count, segs.result().mkString("|"))
      }
  }

  /** Hard-EM E-step: re-count pieces along the decoded segmentations
    * (piece, viterbi_cnt), occurrence-weighted by word count. */
  def recount(segmented: Dataset[Segmented]): DataFrame =
    segmented.toDF()
      .select(explode(split(col("seg"), "\\|")).as("piece"), col("wcount"))
      .groupBy(col("piece"))
      .agg(sum(col("wcount")).cast("long").as("viterbi_cnt"))

  // ------------------------------------------------------------------
  // Oracle generation (DuckDB SQL mirroring every step above)
  // ------------------------------------------------------------------

  /** Shared CTE prefix: word counts, piece scores, candidate arcs. */
  private def prefixSql(minCount: Long): String =
    s"""WITH w AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS wcount FROM (
       |    SELECT unnest(list_filter(
       |      string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}]+'),
       |      x -> x <> '')) AS word
       |    FROM documents) t
       |  WHERE len(word) BETWEEN 1 AND $MaxWordLen GROUP BY word),
       |occ AS MATERIALIZED (
       |  SELECT substr(word, gi.i, gl.l) AS piece,
       |         CAST(SUM(wcount) AS BIGINT) AS cnt
       |  FROM w
       |  CROSS JOIN generate_series(1, $MaxWordLen) gi(i)
       |  CROSS JOIN generate_series(1, $MaxPieceLen) gl(l)
       |  WHERE gi.i + gl.l - 1 <= len(word)
       |  GROUP BY 1),
       |kept AS (SELECT piece, cnt FROM occ
       |         WHERE cnt >= $minCount OR len(piece) = 1),
       |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM kept),
       |v AS MATERIALIZED (
       |  SELECT piece, cnt,
       |         CAST(floor(1000000 * ln(CAST(cnt AS DOUBLE) / t)) AS BIGINT)
       |           AS score
       |  FROM kept CROSS JOIN tot),
       |arc AS MATERIALIZED (
       |  SELECT w.word, gi.i AS i, gi.i - gl.l AS j, v.score
       |  FROM w
       |  CROSS JOIN generate_series(1, $MaxWordLen) gi(i)
       |  CROSS JOIN generate_series(1, $MaxPieceLen) gl(l)
       |  JOIN v ON v.piece = substr(w.word, gi.i - gl.l + 1, gl.l)
       |  WHERE gi.i <= len(w.word) AND gi.i - gl.l >= 0)""".stripMargin

  /** Forward DP: b_i / ball_i chained CTEs, one per position. */
  private def forwardSql: String =
    (1 to MaxWordLen).map { i =>
      val prev = if (i == 1) "b_0" else s"ball_${i - 1}"
      s"""b_$i AS MATERIALIZED (
         |  SELECT word, $i AS pos, total, argj FROM (
         |    SELECT a.word, b.total + a.score AS total, a.j AS argj,
         |           row_number() OVER (PARTITION BY a.word
         |             ORDER BY b.total + a.score DESC, a.j DESC) AS rn
         |    FROM arc a JOIN $prev b ON b.word = a.word AND b.pos = a.j
         |    WHERE a.i = $i) s WHERE rn = 1),
         |ball_$i AS MATERIALIZED (
         |  SELECT * FROM $prev UNION ALL SELECT * FROM b_$i)""".stripMargin
    }.mkString(",\n")

  private def b0Sql: String =
    """b_0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS total,
      |        CAST(-1 AS BIGINT) AS argj FROM w)""".stripMargin

  /** Backtrace: bt_k chained CTEs walking argj back to position 0,
    * building the '|'-joined segmentation right-to-left. */
  private def backtraceSql: String = {
    val steps = (1 to MaxWordLen).map { k =>
      // the concat stays on ONE line: a continuation line starting
      // with || would lose its operator to the OUTER template's
      // stripMargin (nested-stripMargin hazard)
      s"""bt_$k AS MATERIALIZED (
         |  SELECT t.word, b.argj AS pos,
         |         CASE WHEN t.seg = ''
         |              THEN substr(t.word, b.argj + 1, t.pos - b.argj)
         |              ELSE substr(t.word, b.argj + 1, t.pos - b.argj) || '|' || t.seg END AS seg
         |  FROM bt_${k - 1} t
         |  JOIN ball_$MaxWordLen b ON b.word = t.word AND b.pos = t.pos
         |  WHERE t.pos > 0
         |  UNION ALL
         |  SELECT word, pos, seg FROM bt_${k - 1} WHERE pos = 0)""".stripMargin
    }
    s"""bt_0 AS (SELECT word, CAST(len(word) AS BIGINT) AS pos, '' AS seg
       |         FROM w),
       |${steps.mkString(",\n")}""".stripMargin
  }

  /** Full oracle for the per-word segmentation query (q179 shape):
    * (word, wcount, best_micro, n_pieces, seg) ordered by word. */
  def unrolledViterbiSql(minCount: Long): String =
    s"""${prefixSql(minCount)},
       |$b0Sql,
       |$forwardSql,
       |$backtraceSql
       |SELECT w.word, w.wcount, f.total AS best_micro,
       |       CAST(len(bt.seg) - len(replace(bt.seg, '|', '')) + 1 AS BIGINT)
       |         AS n_pieces,
       |       bt.seg
       |FROM w
       |JOIN ball_$MaxWordLen f ON f.word = w.word AND f.pos = len(w.word)
       |JOIN bt_$MaxWordLen bt ON bt.word = w.word
       |ORDER BY w.word""".stripMargin

  /** Full oracle for the E-step recount (q180 shape): every kept piece
    * with its raw count, micro-log score, and Viterbi-path count (0 for
    * pieces no maximum-likelihood segmentation uses). */
  /** Greedy scan: g_k chained CTEs, one per consumed piece — each step
    * advances every unfinished word past the LONGEST arc at its cursor
    * (row_number over i DESC; the 1-char arc guarantees progress, so
    * MaxWordLen steps finish every word). */
  private def greedySql: String = {
    val steps = (1 to MaxWordLen).map { k =>
      // single-line concat: same nested-stripMargin hazard as backtraceSql
      s"""g_$k AS MATERIALIZED (
         |  SELECT word, n, i AS pos, total + score AS total,
         |         CASE WHEN seg = '' THEN piece ELSE seg || '|' || piece END AS seg
         |  FROM (
         |    SELECT t.word, t.n, a.i, a.score, t.total, t.seg,
         |           substr(t.word, a.j + 1, a.i - a.j) AS piece,
         |           row_number() OVER (PARTITION BY t.word
         |             ORDER BY a.i DESC) AS rn
         |    FROM g_${k - 1} t JOIN arc a ON a.word = t.word AND a.j = t.pos
         |    WHERE t.pos < t.n) s
         |  WHERE rn = 1
         |  UNION ALL
         |  SELECT word, n, pos, total, seg FROM g_${k - 1} WHERE pos = n)""".stripMargin
    }
    s"""g_0 AS (SELECT word, len(word) AS n, 0 AS pos,
       |        CAST(0 AS BIGINT) AS total, '' AS seg FROM w),
       |${steps.mkString(",\n")}""".stripMargin
  }

  /** Full oracle for the decoder-regret audit (q183 shape): greedy
    * longest-match segmentation side by side with the Viterbi optimum —
    * (word, wcount, best_micro, greedy_micro, greedy_pieces,
    * regret_micro, greedy_seg) ordered by word. Replays BOTH decoders:
    * the forward-DP chain for best_micro and the greedy chain for the
    * segmentation. */
  def unrolledGreedySql(minCount: Long): String =
    s"""${prefixSql(minCount)},
       |$b0Sql,
       |$forwardSql,
       |$greedySql
       |SELECT w.word, w.wcount, f.total AS best_micro,
       |       g.total AS greedy_micro,
       |       CAST(len(g.seg) - len(replace(g.seg, '|', '')) + 1 AS BIGINT)
       |         AS greedy_pieces,
       |       f.total - g.total AS regret_micro,
       |       g.seg AS greedy_seg
       |FROM w
       |JOIN ball_$MaxWordLen f ON f.word = w.word AND f.pos = len(w.word)
       |JOIN g_$MaxWordLen g ON g.word = w.word
       |ORDER BY w.word""".stripMargin

  def unrolledRecountSql(minCount: Long): String =
    s"""${prefixSql(minCount)},
       |$b0Sql,
       |$forwardSql,
       |$backtraceSql,
       |used AS (
       |  SELECT u.piece, CAST(SUM(w.wcount) AS BIGINT) AS viterbi_cnt
       |  FROM bt_$MaxWordLen bt
       |  JOIN w ON w.word = bt.word
       |  CROSS JOIN unnest(string_split(bt.seg, '|')) AS u(piece)
       |  GROUP BY 1)
       |SELECT v.piece, v.cnt, v.score,
       |       CAST(COALESCE(used.viterbi_cnt, 0) AS BIGINT) AS viterbi_cnt
       |FROM v LEFT JOIN used ON v.piece = used.piece
       |ORDER BY v.piece""".stripMargin
}
