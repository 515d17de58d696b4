package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for large-scale corpus curation:
  * tokenization, language-ID heuristic, quality scoring, fingerprinting.
  *
  * Everything here is built from `org.apache.spark.sql.functions` /
  * higher-order array functions — no UDFs — so the expressions stay
  * inside Tungsten evaluation and are usable in any downstream plan
  * (filters compose, columns prune).
  */
object TextFns {

  /** Whitespace tokens; empty/blank text → empty array (not `[""]`). */
  def wsTokens(c: Column): Column = {
    val t = trim(c)
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  /** Lowercased word tokens: split on runs of non-alphanumeric chars. */
  def wordTokens(c: Column): Column = {
    val toks = split(lower(trim(c)), "[^\\p{L}\\p{N}]+")
    filter(toks, t => t =!= "")
  }

  /** Token count (whitespace tokenization). */
  def tokenCount(c: Column): Column = size(wsTokens(c))

  /** BPE-ish subword pre-tokenization (GPT-2-style segmentation without
    * lookahead, so the same pattern runs under Java regex and RE2):
    * common contractions, space-prefixed letter runs, digit runs, and
    * punctuation runs. The count approximates a BPE tokenizer's
    * pre-split unit count - the standard cheap "token budget" signal
    * for training-data curation. */
  val BpeishPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"
  def bpeishTokens(c: Column): Column = regexp_extract_all(c, lit(BpeishPattern), lit(0))
  def bpeishTokenCount(c: Column): Column = size(bpeishTokens(c))

  /** Number of tokens that appear in `words` (with multiplicity). */
  def tokenHits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(lit): _*)))

  /** Sentence count: runs of terminal punctuation, floored at 1 for
    * non-empty text (the standard readability approximation; pattern is
    * Java-regex ∩ RE2 so an external oracle mirrors it verbatim). */
  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))

  /** Total syllables over lowercased word `tokens`: vowel-group runs
    * per word, each word floored at 1 (the classic heuristic — exact
    * dictionary syllabification is neither needed nor portable). */
  def syllableCount(tokens: Column): Column =
    aggregate(
      transform(tokens, w =>
        greatest(size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))),
          lit(1)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Letter/digit character count (the Coleman–Liau "letters"). */
  def letterCount(text: Column): Column =
    length(regexp_replace(text, "[^\\p{L}\\p{N}]", ""))

  /** Small per-language stopword lists for the n-gram/stopword
    * language-ID heuristic. Deliberately tiny and deterministic — this
    * is a curation-pipeline triage signal, not a model. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "pour", "avec", "dans"),
    "es" -> Seq("el", "los", "las", "es", "una", "para", "con", "por", "del", "como"),
  )

  /** Language-ID: argmax of stopword hits over [[LangStopwords]], with
    * the list order as tie-break preference and `"und"` (undetermined)
    * when no list scores a hit. Expressible 1:1 in ANSI SQL for the
    * oracle.
    *
    * This default form works on any session — it is [[langIdHof]], the
    * pure-HOF build with no custom function registration. Hot paths
    * that have called [[NativeFns.register]] should use the ~10× faster
    * [[langIdNative]]. */
  def langId(text: Column): Column = langIdHof(text)

  /** Native-expression form of [[langId]]. The per-language counts are
    * native set probes ([[NativeFns.tokensInSet]]) and are lambda-bound:
    * the argmax CASE chain references every count up to ~6 times, and
    * an interpreted reference re-evaluates its whole subtree each time.
    *
    * REQUIRES [[NativeFns.register]] on the session that analyzes the
    * plan — a Column-producing function has no session to register, so
    * unregistered sessions fail analysis with an unresolved-function
    * error. Use [[langId]] when registration isn't guaranteed. */
  def langIdNative(text: Column): Column =
    ExprUtils.bind(wordTokens(text)) { toks =>
      val hits = LangStopwords.map { case (_, words) => NativeFns.tokensInSet(toks, words) }
      ExprUtils.bindSeq(hits) { bound =>
        val scores = LangStopwords.map(_._1).zip(bound)
        val best = bound.reduce((a, b) => greatest(a, b))
        // first (in declared order) language achieving the max — ties
        // break toward the earlier list, matching the SQL CASE chain.
        scores.foldRight(lit("und")) { case ((lang, s), rest) =>
          when(s === best && best > 0, lit(lang)).otherwise(rest)
        }
      }
    }

  /** HOF-only form of [[langId]] (no native expressions) — the
    * registration-free default and the parity baseline for
    * [[langIdNative]]. */
  def langIdHof(text: Column): Column =
    ExprUtils.bind(wordTokens(text)) { toks =>
      val scores = LangStopwords.map { case (lang, words) => lang -> tokenHits(toks, words) }
      val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
      scores.foldRight(lit("und")) { case ((lang, s), rest) =>
        when(s === best && best > 0, lit(lang)).otherwise(rest)
      }
    }

  /** Quality metrics for document triage (counts are exact integers so
    * an oracle can reproduce them bit-for-bit). Counting via
    * regexp_replace length-difference keeps the expression codegen'd —
    * no per-character array materialization. */
  def nChars(c: Column): Column = length(c)
  def nPunct(c: Column): Column = length(c) - length(regexp_replace(c, "[.,;:!?]", ""))
  def nDigits(c: Column): Column = length(c) - length(regexp_replace(c, "[0-9]", ""))

  /** Boolean quality gate: enough tokens, not digit-dominated, mean
    * token length in a sane band. Thresholds are integer-exact. */
  def isQuality(text: Column, minTokens: Int = 5, maxDigitPerMille: Int = 300): Column = {
    val nt = tokenCount(text)
    val nd = nDigits(text)
    val nc = nChars(text)
    (nt >= minTokens) && (nd * 1000 <= nc * maxDigitPerMille)
  }

  /** Repetition signals (Rae et al. 2021 "Gopher" §A1.1-style): heavily
    * self-repeating documents are a dominant failure mode of scraped
    * training data. All counts are row-local array math — zero shuffle,
    * the metrics compose into any downstream filter. */

  /** Occurrence count of the most frequent element of a string array
    * (0 for an empty array). Row-local O(d·n) over d distinct values —
    * bounded by the document, never a shuffle. */
  def topElementCount(arr: Column): Column =
    ExprUtils.bind(arr) { a =>
      when(size(a) <= 0, lit(0L)).otherwise(
        array_max(transform(array_distinct(a),
          x => size(filter(a, y => y === x)).cast("long"))))
    }

  /** Total characters across a string array's elements (0 when empty). */
  def charSum(arr: Column): Column =
    ExprUtils.bind(arr) { a =>
      coalesce(aggregate(a, lit(0L), (acc, x) => acc + length(x)), lit(0L))
    }

  /** The repetition GATE over a token array — the q64 boolean in one
    * reusable expression (over half the tokens are repeats, or one
    * bigram accounts for ≥20% of all bigrams). Row-local; used by the
    * streaming quality gate so stream ≡ batch by construction. */
  def isRepetitive(tokens: Column): Column =
    ExprUtils.bind(tokens) { t =>
      ExprUtils.bind(HashFns.wordShingleSeq(t, 2)) { bg =>
        (size(t) > 0 && size(array_distinct(t)) * 2 <= size(t)) ||
          (size(bg) > 0 && topElementCount(bg) * 5 >= size(bg))
      }
    }

  /** Intra-document duplicate-segment removal (Gopher-class "drop
    * repeated paragraphs inside a document"): segment the token array
    * into fixed `segTokens`-token pseudo-paragraphs, keep the FIRST
    * occurrence of each distinct segment in order (the keep rule:
    * first-occurrence position == own position), and return the
    * 3-field struct (n_segments, n_unique_segments, text_dedup).
    * Row-local; both stages are lambda-bound so the segment array and
    * the kept list evaluate once per row each. */
  def dedupSegments(tokens: Column, segTokens: Int): Column =
    ExprUtils.bind(
      when(size(tokens) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0),
            ceil(size(tokens) / lit(segTokens.toDouble)).cast("int") - 1),
          i => array_join(slice(tokens, i * segTokens + 1, lit(segTokens)), " ")))
    ) { segs =>
      ExprUtils.bind(filter(segs, (x, i) =>
        array_position(segs, x) === (i + 1).cast("long"))) { kept =>
        struct(
          size(segs).cast("long").as("n_segments"),
          size(kept).cast("long").as("n_unique_segments"),
          array_join(kept, " ").as("text_dedup"))
      }
    }

  /** Pattern masking for redaction-style curation: count and replace
    * every match of `pattern` (a Java-regex/RE2 COMMON-dialect pattern —
    * no lookahead/backrefs — so an external SQL oracle reproduces it).
    * Returns (hit count, masked text) as a 2-field struct. */
  def maskPattern(text: Column, pattern: String, replacement: String): Column =
    struct(
      size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long").as("n"),
      regexp_replace(text, pattern, replacement).as("masked"))

  /** Rolling document fingerprint over word tokens:
    * fp = fold(acc * 31 + h(token)) mod p, p = 2^31-1 — the modular
    * domain keeps every intermediate far below Long overflow, so the
    * expression is ANSI-safe. Deterministic across runs/partitions;
    * whitespace-normalization invariant. */
  val FingerprintPrime: Long = (1L << 31) - 1

  /** [[fingerprint]] with a caller-chosen per-token hash (must return
    * values in [0, p) so `acc*31 + h` stays ANSI-overflow-safe). */
  def fingerprintWith(text: Column, elemHash: Column => Column): Column =
    aggregate(wordTokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(31L) + elemHash(t), lit(FingerprintPrime)))

  def fingerprint(text: Column): Column =
    fingerprintWith(text, t => pmod(xxhash64(t), lit(FingerprintPrime)))

  /** SQL-mirrorable fingerprint: the md5-prefix token hash
    * ([[HashFns.md5Hash]]) instead of xxhash64 — an external SQL oracle
    * reproduces the fold bit-for-bit via
    * `list_reduce(list_prepend(0, hashes), (acc,x) -> (acc*31+x) % p)`. */
  def fingerprintMirrored(text: Column): Column =
    fingerprintWith(text, HashFns.md5Hash)

  /** Gopher-style quality-rule primitives (Rae et al. 2021 §A1.1,
    * Table A1 — the published repetition-free subset of the ruleset;
    * repetition itself is [[isRepetitive]]). Every metric is an exact
    * integer so the rule thresholds compose as cross-multiplied integer
    * comparisons an external SQL oracle reproduces bit-for-bit. All
    * row-local — zero shuffles. */

  /** The Gopher stopword list: a doc must contain >= 2 DISTINCT members
    * to pass the stop-word rule. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Count of tokens containing at least one letter (the "80% of words
    * must have an alphabetic character" rule's numerator). */
  def alphaWordCount(tokens: Column): Column =
    size(filter(tokens, t => t.rlike("\\p{L}"))).cast("long")

  /** Count of symbol characters: anything that is not a letter, digit,
    * or whitespace (the symbol-to-word-ratio rule's numerator). */
  def symbolCount(text: Column): Column =
    (length(text) -
      length(regexp_replace(text, "[^\\p{L}\\p{N}\\s]", ""))).cast("long")

  /** Count of DISTINCT Gopher stopwords present in the token array. */
  def stopwordDistinctCount(tokens: Column): Column =
    size(array_intersect(array_distinct(tokens),
      array(GopherStopwords.map(lit): _*))).cast("long")

  /** PII-redaction patterns (email / NANP phone / dotted-quad IPv4),
    * written in the Java-regex ∩ RE2 common dialect (no lookaround, no
    * backrefs) so a SQL oracle applies the identical automaton. Order
    * of application matters and is fixed: email first (its local part
    * can contain digits and dots), then phone, then IPv4. */
  val EmailPattern: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact all three PII categories, returning a 4-field struct
    * (n_emails, n_phones, n_ips counted on the ORIGINAL text, plus the
    * fully redacted text). Row-local regex work, codegen'd. */
  def piiRedact(text: Column): Column =
    ExprUtils.bind(text) { t =>
      struct(
        size(regexp_extract_all(t, lit(EmailPattern), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(t, lit(PhonePattern), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(t, lit(Ipv4Pattern), lit(0)))
          .cast("long").as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailPattern, "<EMAIL>"),
            PhonePattern, "<PHONE>"),
          Ipv4Pattern, "<IP>").as("redacted"))
    }

  /** Overlapping token-window chunks — the context-window prep stage of
    * a training/RAG pipeline: chunk i covers tokens [i·stride,
    * i·stride + window); starts run while they fall inside the doc, so
    * every token lands in ≥1 chunk and consecutive chunks overlap by
    * (window − stride). Returns array<struct<chunk_idx, chunk_len,
    * chunk>> — row-local (explode downstream for one row per chunk;
    * zero shuffles). Empty token arrays yield zero chunks. */
  def tokenChunks(tokens: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0 && stride <= window,
      s"tokenChunks: need 0 < stride <= window, got window=$window stride=$stride")
    val n = size(tokens)
    // Spark's sequence(0, -1) counts DOWN — guard the empty case
    val idxs = when(n > lit(0),
      sequence(lit(0L), ((n - lit(1)) / lit(stride)).cast("long")))
      .otherwise(array().cast("array<long>"))
    transform(idxs, i => {
      val start = i * stride
      val len = least(lit(window), n - start)
      struct(i.as("chunk_idx"), len.cast("long").as("chunk_len"),
        array_join(slice(tokens, (start + 1).cast("int"), len.cast("int")), " ")
          .as("chunk"))
    })
  }

  /** URL canonicalization (RFC 3986 §6 syntax-based normalization +
    * the crawl-frontier conventions) — the dedup key a crawl pipeline
    * groups its frontier and its fetched pages by: lowercase scheme
    * and host, strip the scheme's default port (:80 http / :443
    * https), drop the fragment, resolve `/./` and `segment/../` dot
    * segments (three unrolled leftmost-nonoverlapping passes — exact
    * for nesting depth ≤ 3; crawl URLs beyond that are rejected
    * upstream) including the RFC 3986 over-pop rule (`..` segments
    * left at the root, e.g. `/a/../../b`, are removed → `/b`), empty
    * path → `/`, and sort query parameters (the
    * aggressive-normalization convention that makes `?b=2&a=1` and
    * `?a=1&b=2` one frontier entry). Pure built-ins (regexp + array
    * ops), row-local, zero shuffles — and every step has an identical
    * SQL spelling, so the q148 oracle replays it exactly. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z]+://", "")
    val auth0 = regexp_extract(rest, "^([^/?#]+)", 1)
    val host0 = lower(auth0)
    val host = when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .otherwise(host0)
    val pathq = rest.substr(length(auth0) + lit(1), length(rest))
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    // everything after the FIRST '?' (instr is 1-based, 0 when absent)
    val query = when(instr(pathq, "?") > 0,
      pathq.substr(instr(pathq, "?") + lit(1), length(pathq))).otherwise(lit(""))
    val slashPath = when(path0 === "", lit("/")).otherwise(path0)
    // three unrolled passes per dot form: leftmost-nonoverlapping
    // global replace semantics are identical in Spark and DuckDB, so
    // pass-for-pass results match
    val dotsOnce = (p: Column) => regexp_replace(p, "/\\.(/)", "/")
    val upOnce = (p: Column) => regexp_replace(p, "/[^/]+/\\.\\.(/)", "/")
    val p1 = regexp_replace(dotsOnce(dotsOnce(slashPath)), "/\\.$", "/")
    val p2 = regexp_replace(upOnce(upOnce(p1)), "/[^/]+/\\.\\.$", "/")
    // RFC 3986 §5.2.4 over-pop: '..' segments stranded at the root
    // (more '..' than parents — '/a/../../b' pops to '/../b') are
    // removed, never kept as literal path segments
    val path = regexp_replace(p2, "^(/\\.\\.)+(/|$)", "/")
    val sortedQ = array_join(array_sort(split(query, "&")), "&")
    concat(scheme, lit("://"), host, path,
      when(query =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** Simplified Soundex phonetic code (Russell/Odell, the US-census
    * variant WITHOUT the H/W-separator rule — letters coded 0 between
    * two same-coded consonants here break the run, which the full rule
    * would merge; blocking quality is indistinguishable for ER use) —
    * the phonetic blocking key an entity-resolution pass groups name
    * words by before any pairwise comparison. Input must be an
    * ASCII-letter word (callers filter `^[a-z]+$`). Every step is a
    * built-in with an identical SQL spelling: letter→digit via one
    * `translate`, adjacent-duplicate collapse via seven literal-digit
    * `regexp_replace` passes (RE2 has no pattern backreferences, so
    * `(\d)\1+` is unavailable in DuckDB — per-digit `d+`→`d` passes
    * say the same thing in both engines), drop the first letter's own
    * digit, strip zeros, pad/truncate to first-letter + 3 digits. */
  def soundexSimplified(word: Column): Column = {
    val up = upper(word)
    val digs = translate(up,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202")
    val coll = (0 to 6).foldLeft(digs) { (c, d) =>
      regexp_replace(c, s"$d+", d.toString)
    }
    val tail = regexp_replace(coll.substr(lit(2), length(coll)), "0", "")
    concat(up.substr(1, 1), rpad(tail.substr(1, 3), 3, "0"))
  }

  /** Decode the five HTML entities a text-extraction pass must handle
    * (`&lt; &gt; &quot; &#39; &amp;`); `&amp;` is decoded LAST so
    * `&amp;lt;` yields the literal `&lt;` rather than double-decoding
    * to `<`. Literal `replace` chains — identical SQL spelling. */
  def decodeHtmlEntities(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(c,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&amp;", "&")

  /** HTML → text extraction with boilerplate-block removal — the first
    * stage of web-corpus curation (the jusText/readability family's
    * core heuristic, integer-only so an oracle can replay it):
    *
    *  1. strip comments, `<script>` and `<style>` blocks (non-greedy
    *     leftmost matches — identical in Java regex and RE2);
    *  2. split the page into blocks at closing block-level tags
    *     (`</p> </div> </nav> </footer>`);
    *  3. per block, measure the tag-stripped text length and the
    *     characters inside `<a>` anchors; KEEP a block iff its text is
    *     ≥ `minLen` chars AND anchor chars ≤ `maxLinkPerMille`/1000 of
    *     it (link-density rule: navigation chrome and footers are
    *     mostly anchor text, body prose is not);
    *  4. join kept blocks with newlines and decode entities.
    *
    * Returns struct(n_blocks, n_kept, extracted, boiler_permille) —
    * `boiler_permille` = dropped chars as a per-mille of all block
    * text (integer division, no floats). Pure built-ins + HOFs,
    * row-local, zero shuffles: at 100 TB this runs inside the scan
    * projection with nothing on the wire. */
  def extractHtmlText(html: Column, minLen: Int = 25,
      maxLinkPerMille: Int = 300): Column =
    extractHtmlFromInfo(htmlBlockInfo(html), minLen, maxLinkPerMille)

  /** Stage 1 of [[extractHtmlText]]: the regex-heavy part — strip
    * comments/script/style, split into blocks, measure per-block text
    * and anchor chars. Returns array<struct<txt, link>>. The
    * expression is LINEAR (each sub-result referenced once), so its
    * cost is one regex cascade per row. In a query, materialize this
    * through its own projection (`.select(htmlBlockInfo(h).as("_i"))`)
    * before summarizing — stage 2 references its input many times, and
    * inlined those references would each re-run the cascade
    * (CollapseProject keeps the projection because the alias is
    * multiply referenced and non-cheap). */
  def htmlBlockInfo(html: Column): Column = {
    val cleaned = regexp_replace(regexp_replace(regexp_replace(html,
      "<!--.*?-->", ""),
      "<script[^>]*>.*?</script>", ""),
      "<style[^>]*>.*?</style>", "")
    val blocks = split(cleaned, "</(p|div|nav|footer)>")
    transform(blocks, b => struct(
      trim(regexp_replace(regexp_replace(b, "<[^>]*>", " "), " +", " "))
        .as("txt"),
      aggregate(regexp_extract_all(b, lit("<a[^>]*>([^<]*)</a>"), lit(1)),
        lit(0), (acc, x) => acc + length(x)).as("link")))
  }

  /** Stage 2 of [[extractHtmlText]]: keep/drop + summarize over a
    * block-info ARRAY (ideally an attribute from a
    * [[htmlBlockInfo]] projection — references here are then cheap
    * array scans, no regex). */
  def extractHtmlFromInfo(info: Column, minLen: Int = 25,
      maxLinkPerMille: Int = 300): Column = {
    val kept = filter(info, i =>
      length(i.getField("txt")) >= minLen &&
        i.getField("link") * lit(1000) <=
          length(i.getField("txt")) * lit(maxLinkPerMille))
    val keptTxt = transform(kept, i => i.getField("txt"))
    val tot = aggregate(info, lit(0L),
      (acc, i) => acc + length(i.getField("txt")))
    val keptChars = aggregate(keptTxt, lit(0L), (acc, t) => acc + length(t))
    struct(
      size(info).cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept"),
      decodeHtmlEntities(array_join(keptTxt, "\n")).as("extracted"),
      call_function("div", lit(1000L) * (tot - keptChars),
        greatest(tot, lit(1L))).cast("long").as("boiler_permille"))
  }
}
