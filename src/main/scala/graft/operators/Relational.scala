package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators (SURVEY.md §2.2–§2.7).
  *
  * Each operator is a pure `DataFrame => DataFrame` function
  * parameterized by column names, composing declaratively so Catalyst
  * keeps predicate pushdown / column pruning / join-strategy selection.
  * Scale notes are inline where an operator has a 100-TB hazard.
  */
object Relational {

  /** Histogram width target for [[scalableRowNumber]]'s auto-sized
    * bucket divisor: small enough that the cumulative window over the
    * bucket histogram is trivially single-task, large enough that rows
    * spread across many buckets. */
  val TargetRankBuckets: Long = 65536L

  // ---------------------------------------------------------------- filters

  /** P1: keep (or drop, `keep = false`) rows where `c` matches a Java
    * regex (reference `ihop/import_data.py:74-87` — drops `^u_.*`
    * user-profile subreddits by default). */
  def filterRegex(df: DataFrame, c: String, pattern: String,
                  keep: Boolean = true): DataFrame =
    if (keep) df.where(col(c).rlike(pattern))
    else df.where(!col(c).rlike(pattern))

  /** P2: drop rows equal to an in-band sentinel value
    * (reference `ihop/import_data.py:90-97`, `author != "[deleted]"`). */
  def filterNotEqual(df: DataFrame, c: String, sentinel: String): DataFrame =
    df.where(col(c) =!= sentinel)

  /** P3: NOT-IN sentinel filter (reference `ihop/import_data.py:100-114`). */
  def filterNotIn(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    df.where(!col(c).isin(values: _*))

  /** P4: strict (exclusive) range filter with optional bounds
    * (reference `ihop/import_data.py:343-366`). */
  def filterRangeExclusive(df: DataFrame, c: String,
                           lo: Option[Long], hi: Option[Long]): DataFrame = {
    val conds = lo.map(col(c) > _).toSeq ++ hi.map(col(c) < _).toSeq
    conds.reduceOption(_ && _).map(df.where).getOrElse(df)
  }

  // ------------------------------------------------------------ projections

  /** P5: bulk-rename columns with a prefix before a join whose sides
    * share names (reference `ihop/import_data.py:325-340`). */
  def renameWithPrefix(df: DataFrame, cols: Seq[String], prefix: String): DataFrame =
    df.withColumnsRenamed(cols.map(c => c -> s"$prefix$c").toMap)

  /** P6: derived column `out = prefix || id`
    * (reference `ihop/import_data.py:300-313`, `fullname_id = "t3_"+id`). */
  def withPrefixedId(df: DataFrame, idCol: String, prefix: String,
                     out: String): DataFrame =
    df.withColumn(out, concat(lit(prefix), col(idCol).cast("string")))

  // ---------------------------------------------------------------- joins

  /** J1/J2: left-semi membership join — filters `df` to rows whose key
    * appears in `dim` without ever duplicating rows (reference
    * `ihop/import_data.py:63-72,275-297`). `dim` is typically a top-N
    * table (≤ tens of thousands of rows): broadcast it so the fact side
    * never shuffles. */
  def semiJoin(df: DataFrame, dim: DataFrame, key: String,
               broadcastDim: Boolean = true): DataFrame = {
    val d = dim.select(key)
    df.join(if (broadcastDim) broadcast(d) else d, Seq(key), "left_semi")
  }

  /** Anti-join complement (NOT EXISTS). */
  def antiJoin(df: DataFrame, dim: DataFrame, key: String,
               broadcastDim: Boolean = true): DataFrame = {
    val d = dim.select(key)
    df.join(if (broadcastDim) broadcast(d) else d, Seq(key), "left_anti")
  }

  /** J3 + P7: inner equi-join of a "parent" table against a "child"
    * table plus a derived time-delta column
    * (reference `ihop/import_data.py:369-419`: submissions ⋈ comments on
    * `fullname_id == link_id`, `time_to_comment = child_ts - parent_ts`).
    *
    * Scale: both sides shuffle on the join key — that is the correct
    * plan for two large fact tables. If the parent side is dimension-
    * sized, pass `broadcastLeft = true`.
    */
  def joinWithTimeDelta(parent: DataFrame, child: DataFrame,
                        parentKey: String, childKey: String,
                        parentTs: Column, childTs: Column,
                        deltaName: String,
                        broadcastLeft: Boolean = false): DataFrame = {
    val p = if (broadcastLeft) broadcast(parent) else parent
    p.join(child, p(parentKey) === child(childKey), "inner")
      .withColumn(deltaName, childTs - parentTs)
  }

  // ------------------------------------------------------------ aggregates

  /** A1/O1/O2: deterministic top-N — count per key, order count desc
    * with ascending key tie-break, limit n (reference
    * `ihop/import_data.py:48-60`). Catalyst plans the sort+limit as
    * `TakeOrderedAndProject` (no global sort materialized). */
  def topNByCount(df: DataFrame, key: String, n: Int,
                  countName: String = "cnt"): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as(countName))
      .orderBy(col(countName).desc, col(key).asc)
      .limit(n)

  /** A2: group-concat — per key, the sorted space-joined values plus the
    * count (reference `ihop/import_data.py:228-272` builds per-author
    * subreddit "context sentences"). The reference's `collect_list`
    * order is partition-dependent; we sort in-group for deterministic
    * output (SURVEY.md §4.3.3 — downstream word2vec is order-
    * insensitive, so sorting is semantics-preserving). */
  def groupConcat(df: DataFrame, key: String, value: String,
                  concatName: String = "context", lenName: String = "context_length"): DataFrame =
    df.groupBy(col(key))
      .agg(
        array_join(array_sort(collect_list(col(value))), " ").as(concatName),
        count(col(value)).as(lenName))

  /** A7/O3: "thread document" build — per parent id take the (constant)
    * parent attributes and concatenate child text in child-order
    * (reference `ihop/text_processing.py:208-219` relies on a pre-group
    * `orderBy` feeding `first()`/`collect_list` — implementation-defined
    * in Spark. We reproduce the *intent* deterministically:
    * `sort_array(collect_list(struct(order, text)))` then project —
    * SURVEY.md §4.3.1.) */
  def threadDoc(joined: DataFrame, parentId: String,
                constantCols: Seq[String], orderCol: String, textCol: String,
                docName: String = "document_text"): DataFrame = {
    val pairs = sort_array(collect_list(struct(col(orderCol).as("o"), col(textCol).as("t"))))
    val doc = array_join(transform(pairs, p => p.getField("t")), " ").as(docName)
    val consts = constantCols.map(c => min(col(c)).as(c)) // constant per group; min = deterministic pick
    joined.groupBy(col(parentId)).agg(consts.head, (consts.tail :+ doc): _*)
  }

  /** Exact per-group percentiles (discrete: the value at sorted position
    * ceil(p·n/100)), computed WITHOUT a row-level sort: rows collapse to
    * (group, value) counts first, a cumulative window runs over the
    * DISTINCT values per group (thousands, not the row count — the same
    * construction as [[excludeTopPercentByCount]]), and each requested
    * percentile is the smallest value whose cumulative count reaches the
    * integer-exact rank `(p·n + 99) DIV 100`. Exact at any scale,
    * integer math end-to-end — unlike `percentile_approx`, bit-equal
    * in an external SQL oracle.
    *
    * Output: one row per group with a `p<P>_c` column per requested
    * percent (value expression must be integral, e.g. a scaled amount).
    */
  def exactPercentiles(df: DataFrame, keyCol: String, value: Column,
                       percents: Seq[Int]): DataFrame = {
    val counts = df.groupBy(col(keyCol), value.as("_v"))
      .agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("_v"))
    val wAll = Window.partitionBy(col(keyCol))
    val cum = counts
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
    val aggs = percents.map { p =>
      min(when(col("_cum") >= expr(s"($p * _n + 99) DIV 100"), col("_v")))
        .as(s"p${p}_c")
    }
    cum.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Bucketized range join: all (left, right) pairs with
    * `|leftTime − rightTime| ≤ halfWidth`, WITHOUT an equi-key.
    *
    * Catalyst's only plan for a pure range predicate is a nested-loop
    * join — O(|L|·|R|) comparisons, a non-starter at scale. Binning
    * both sides by `floor(time / halfWidth)` turns it into an
    * equi-join: a qualifying pair's bins differ by at most 1, so the
    * left side is replicated into its bin and both neighbors (3×, a
    * constant) and each qualifying pair meets in EXACTLY the right
    * side's bin — no dedup needed, one shuffle each side on the bin
    * key, per-bin work proportional to the true match density. This is
    * the standard range-join optimization, expressed with plain
    * DataFrame ops.
    *
    * Caller adds any further predicates (equi-keys, id ordering) on the
    * result; both sides' columns must be disjoint (rename first).
    */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame,
                        leftTime: Column, rightTime: Column,
                        halfWidth: Long): DataFrame = {
    require(halfWidth > 0, "rangeJoinBucketed: halfWidth must be positive")
    val l = left.withColumn("_lt", leftTime)
      .withColumn("_lb", expr(s"CAST(FLOOR(_lt / $halfWidth) AS BIGINT)"))
      .withColumn("_bin", explode(array(col("_lb") - 1, col("_lb"), col("_lb") + 1)))
      .drop("_lb")
    val r = right.withColumn("_rt", rightTime)
      .withColumn("_bin", expr(s"CAST(FLOOR(_rt / $halfWidth) AS BIGINT)"))
    l.join(r, Seq("_bin"))
      .where(abs(col("_lt") - col("_rt")) <= halfWidth)
      .drop("_bin", "_lt", "_rt")
  }

  // ---------------------------------------------------------------- window

  /** W1: drop the most-active top `pct` fraction of keys by exact global
    * percent_rank over their counts (reference
    * `ihop/import_data.py:197-225` excludes the top 5% most prolific
    * authors; ties at the cutoff live or die together).
    *
    * The reference uses `percent_rank().over(Window.partitionBy())` — a
    * single-partition global window over ~6.3M author rows (SURVEY.md
    * §4.2). This implementation computes the identical result
    * scalably: percent_rank of a row with count c is
    * `rowsBelow(c) / (n-1)`, constant within a tie group, so we rank
    * only the *distinct count values* (thousands, not millions) with a
    * tiny window, derive the set of surviving count values, and
    * broadcast-semi-join it back against the full table. No row-level
    * global sort at any scale.
    *
    * @param counts DataFrame of (key, countCol) — already aggregated.
    * @param pct    fraction to drop from the top, e.g. 0.05.
    */
  def excludeTopPercentByCount(counts: DataFrame, countCol: String,
                               pct: Double): DataFrame = {
    val freq = counts.groupBy(col(countCol)).agg(count(lit(1)).as("_freq"))
    val w = Window.orderBy(col(countCol))
    val below = coalesce(
      sum(col("_freq")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val total = sum(col("_freq")).over(
      Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    val kept = freq
      .withColumn("_pr",
        when(total === 1L, lit(0.0)).otherwise(below / (total - lit(1L))))
      .where(col("_pr") <= lit(1.0 - pct))
      .select(col(countCol))
    counts.join(broadcast(kept), Seq(countCol), "left_semi")
  }

  /** W1 (literal form): the reference's exact formulation — global
    * percent_rank window, then filter. Kept for parity testing against
    * [[excludeTopPercentByCount]]; do not use at scale (single-partition
    * window). */
  def excludeTopPercentByCountGlobalWindow(counts: DataFrame, countCol: String,
                                           pct: Double): DataFrame =
    counts
      .withColumn("_pr", percent_rank().over(Window.orderBy(col(countCol))))
      .where(col("_pr") <= lit(1.0 - pct))
      .drop("_pr")

  /** A10 mapping: top-k rows per group by explicit deterministic order. */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[String],
                   orderCols: Seq[Column], k: Int,
                   rankName: String = "rk"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(rankName, row_number().over(w)).where(col(rankName) <= k)
  }

  /** Latest-wins compaction: keep, per key, the single row with the
    * greatest (orderCol, tieCols...) — the standard reduction of an
    * append-only change log (CDC feed, upsert stream) to current
    * state. One shuffle on the key; the per-partition WindowGroupLimit
    * keeps only a candidate row per key per map task before the
    * exchange, so the shuffle carries ~|keys| rows, not the log. The
    * tie-break columns make the survivor total-order deterministic —
    * required for replayable compaction jobs. */
  def latestByKey(df: DataFrame, keyCols: Seq[String],
                  orderCol: Column, tieCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((orderCol +: tieCols).map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /** SCD2 (slowly-changing-dimension type 2) build: collapse a change
    * stream into versioned rows per key. A new version opens only when
    * one of `attrCols` CHANGES (null-safe `<=>` comparison, so
    * NULL→NULL is "no change" and NULL→x is a change); each version is
    * stamped `valid_from` (its opening `orderCol` value), `valid_to`
    * (the next version's `valid_from`, NULL while current) and
    * `is_current`. Rows that repeat the previous attribute values are
    * collapsed away — the classic dimension-table history build.
    *
    * Scale: both windows partition on the key, so the whole operator is
    * ONE shuffle; the second window (over the filtered version-start
    * rows) reuses the first's hash partitioning and only re-sorts.
    * `tieCol` must make (orderCol, tieCol) unique per key or version
    * boundaries are nondeterministic. */
  def scd2(df: DataFrame, keyCols: Seq[String], orderCol: Column,
           tieCol: Column, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2: need at least one tracked attribute")
    // reserved output/scratch names — refuse inputs that would be
    // silently overwritten rather than guessing a rename
    val reserved = Seq("_vf", "_tie", "_open", "valid_from", "valid_to", "is_current")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty, s"scd2: input columns ${clash.mkString(", ")} " +
      s"collide with reserved output names (${reserved.mkString(", ")})")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol, tieCol)
    val changed = attrCols.map(a => !(lag(col(a), 1).over(w) <=> col(a)))
      .reduce(_ || _)
    val starts = df
      .withColumn("_vf", orderCol)
      .withColumn("_tie", tieCol)
      .withColumn("_open", row_number().over(w) === 1 || changed)
      .where(col("_open"))
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_vf"), col("_tie"))
    starts
      .withColumn("valid_from", col("_vf"))
      .withColumn("valid_to", lead(col("_vf"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_vf", "_tie", "_open")
  }

  // ------------------------------------------------------------- temporal

  /** Sessionization: assign session ids per user from event-time gaps
    * (> `gapMs` starts a new session), then aggregate per session.
    * Deterministic given a unique tie-break column. Partitioned by user
    * — shuffles once on the user key, windows run within partitions. */
  def sessionize(events: DataFrame, userCol: String, tsMillis: Column,
                 tieCol: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(tsMillis, col(tieCol))
    val prev = lag(tsMillis, 1).over(w)
    val isNew = when(prev.isNull || tsMillis - prev > gapMs, 1L).otherwise(0L)
    events
      .withColumn("_ts", tsMillis)
      .withColumn("_new", isNew)
      .withColumn("session_seq",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("_ts")).as("session_start_ms"),
        max(col("_ts")).as("session_end_ms"))
  }

  /** As-of join: for each left row, the single latest right row with
    * matching key and right_ts <= left_ts (inner semantics: left rows
    * with no candidate are dropped). Ties among right rows at the same
    * ts break toward the largest `rightTie`.
    *
    * Implemented as the union-merge as-of (the reference's analogous
    * temporal logic is equi-join J3 + theta filter P4, SURVEY.md §2.3):
    * both sides are tagged into one stream keyed by the join key, sorted
    * within each key partition by (ts, side, tie) — rights sort before
    * lefts at equal ts, so `<=` holds — and a running
    * `last(right_payload, ignoreNulls)` carries the latest right row
    * forward to each left row. ONE shuffle on the key and ONE
    * within-partition sort, versus the naive equi-join + row_number
    * decomposition whose intermediate is every (left, earlier-right)
    * pair — quadratic in rows-per-key, and the first thing to die at
    * 100 TB. A hot key still lands in a single sort partition, but the
    * data volume is |left|+|right|, never the cross product. */
  def asOfLatest(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 leftTs: Column, rightTs: Column,
                 leftId: String, rightTie: String): DataFrame = {
    val lStruct = struct(left.columns.toIndexedSeq.map(left(_)): _*)
    val rStruct = struct(right.columns.toIndexedSeq.map(right(_)): _*)
    val lTagged = left.select(
      left(leftKey).as("_k"), leftTs.as("_ts"), lit(1).as("_side"),
      lit(null).cast(right.schema(rightTie).dataType).as("_tie"), lStruct.as("_l"),
      lit(null).cast(right.schema).as("_r"))
    val rTagged = right.select(
      right(rightKey).as("_k"), rightTs.as("_ts"), lit(0).as("_side"),
      right(rightTie).as("_tie"),
      lit(null).cast(left.schema).as("_l"), rStruct.as("_r"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lTagged.unionByName(rTagged)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1 && col("_asof").isNotNull)
      .select(col("_l.*"), col("_asof.*"))
  }

  /** Exact 1-based global row number by `(orderCol, tieCol)` ascending,
    * computed WITHOUT a corpus-wide single-partition window (which
    * serializes the whole table through one task — the reason naive
    * global ranking dies at 100 TB). Construction: rows bucket by
    * `orderCol DIV bucketDiv` — integer trunc-division is monotone, so
    * bucket order refines to row order — a histogram over the buckets
    * (cardinality bounded by the VALUE RANGE / bucketDiv, not the row
    * count) yields each bucket's cumulative predecessor count via one
    * tiny single-partition window, and a per-bucket `row_number`
    * finishes the rank: `r = cum_before(bucket) + rank_within(bucket)`.
    * Shuffles: one on the bucket key (+ the histogram's). Ranks are
    * IDENTICAL for any `bucketDiv` (property-tested vs the direct
    * window), so sizing only affects the plan: too-small buckets on a
    * wide value domain push the whole histogram through the one
    * single-partition window the operator exists to keep tiny, while
    * one giant bucket degrades to the naive shape. `bucketDiv <= 0`
    * (the default) therefore auto-sizes from the OBSERVED value range —
    * `range / TargetBuckets` — at the cost of one min/max scan; pass an
    * explicit divisor only when the score domain is known a priori.
    * `orderCol` must be integral; `tieCol` must make the order total
    * or tie order is partition luck. */
  def scalableRowNumber(df: DataFrame, orderCol: String, tieCol: String,
                        bucketDiv: Long = 0L,
                        rankName: String = "r"): DataFrame = {
    val div =
      if (bucketDiv > 0) bucketDiv
      else {
        val r = df.agg(min(col(orderCol)).cast("long"),
          max(col(orderCol)).cast("long")).head()
        if (r.isNullAt(0)) 1L
        else math.max(1L, (r.getLong(1) - r.getLong(0)) / TargetRankBuckets + 1L)
      }
    val b = df.withColumn("_rnk_bkt",
      expr(s"$orderCol DIV ${div}L"))
    val hist = b.groupBy(col("_rnk_bkt")).agg(count(lit(1)).as("_c"))
    val wHist = Window.orderBy(col("_rnk_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.select(col("_rnk_bkt"),
      coalesce(sum(col("_c")).over(wHist), lit(0L)).as("_cum"))
    val wIn = Window.partitionBy(col("_rnk_bkt"))
      .orderBy(col(orderCol), col(tieCol))
    b.join(broadcast(cum), Seq("_rnk_bkt"))
      .withColumn(rankName, col("_cum") + row_number().over(wIn))
      .drop("_rnk_bkt", "_cum")
  }

  /** Deterministic seeded EPOCH SHUFFLE: the global corpus permutation
    * every LLM training pipeline applies before sequence packing — each
    * epoch reads the corpus in a different but reproducible order, and
    * the order must not depend on partition layout, task scheduling, or
    * cluster size. Keys rows by `md5(seed:epoch:id)` and ranks by the
    * NUMERIC value of the first 15 hex chars (16^15 < 2^63; for
    * fixed-length lowercase hex, string order == numeric order, so an
    * engine sorting the hex prefix lexicographically produces the
    * IDENTICAL permutation — that equivalence is what makes the op
    * oracle-checkable), ties (a ~n²/2⁶⁰ event) broken by `idCol` in
    * both engines. Ranks come from [[scalableRowNumber]] — one bucket
    * shuffle + a 65536-row histogram window, never a corpus-wide
    * single-partition sort — and md5 spreads keys uniformly over the
    * bucket domain, so the auto-sized histogram is balanced by
    * construction at any corpus size. `pos` is the 1-based read order
    * within the epoch; `shard = (pos-1) % shards` round-robins
    * neighbors onto different output shards (so one slow shard never
    * holds a contiguous run). Epochs are independent pipelines unioned
    * (epoch count is a small constant; each is one shuffle). */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int, seed: Long,
                   shards: Int): DataFrame = {
    require(epochs >= 1 && shards >= 1, s"epochs=$epochs shards=$shards")
    val frames = (0 until epochs).map { e =>
      val keyed = df.withColumn("_shuf_k",
        graft.functions.HashFns.md5Hash60(
          concat_ws(":", lit(seed), lit(e), col(idCol))))
      scalableRowNumber(keyed, "_shuf_k", idCol, rankName = "pos")
        .withColumn("epoch", lit(e.toLong))
        .withColumn("shard", (col("pos") - 1) % shards)
        .drop("_shuf_k")
    }
    frames.reduce(_ unionByName _)
  }

  /** Exact global inclusive PREFIX SUM of `valueCol` in `(orderCol,
    * tieCol)` order, plus the 1-based global rank — the
    * [[scalableRowNumber]] scheme generalized from counting to summing
    * (row number IS this operator with value ≡ 1). Same construction:
    * rows bucket by `orderCol DIV div` (trunc-division is monotone), a
    * value-range-bounded histogram of per-bucket SUMS feeds one tiny
    * single-partition prefix window, and a per-bucket running-sum
    * window finishes: `cum = sum_before(bucket) + running_in(bucket)`.
    * The rank rides the same per-bucket window spec — no extra
    * shuffle. This is the cumulative-cost primitive behind
    * budget-bounded data selection ("take docs in priority order until
    * N tokens"), quota accounting, and packing cutovers — all places a
    * naive `SUM OVER (ORDER BY ...)` serializes the corpus through one
    * task. `valueCol` must be integral (exact; no float accumulation
    * order to disagree with an oracle). */
  def scalableCumSum(df: DataFrame, orderCol: String, tieCol: String,
                     valueCol: String, bucketDiv: Long = 0L,
                     cumName: String = "cum", rankName: String = "r")
      : DataFrame = {
    val div =
      if (bucketDiv > 0) bucketDiv
      else {
        val r = df.agg(min(col(orderCol)).cast("long"),
          max(col(orderCol)).cast("long")).head()
        if (r.isNullAt(0)) 1L
        else math.max(1L, (r.getLong(1) - r.getLong(0)) / TargetRankBuckets + 1L)
      }
    val b = df.withColumn("_cs_bkt", expr(s"$orderCol DIV ${div}L"))
    // one histogram carries BOTH per-bucket count and sum; one tiny
    // single-partition window turns them into exclusive prefixes
    val wHist = Window.orderBy(col("_cs_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = b.groupBy(col("_cs_bkt"))
      .agg(count(lit(1)).as("_c"), sum(col(valueCol)).cast("long").as("_s"))
      .select(col("_cs_bkt"),
        coalesce(sum(col("_c")).over(wHist), lit(0L)).as("_cntBefore"),
        coalesce(sum(col("_s")).over(wHist), lit(0L)).as("_sumBefore"))
    val ord = Window.partitionBy(col("_cs_bkt"))
      .orderBy(col(orderCol), col(tieCol))
    val wIn = ord.rowsBetween(Window.unboundedPreceding, 0)
    b.join(broadcast(hist), Seq("_cs_bkt"))
      .withColumn(cumName,
        col("_sumBefore") + sum(col(valueCol)).over(wIn).cast("long"))
      .withColumn(rankName, col("_cntBefore") + row_number().over(ord))
      .drop("_cs_bkt", "_sumBefore", "_cntBefore")
  }
}
