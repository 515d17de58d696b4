package graft.operators

import graft.SparkSpec
import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Scale-mechanics tests: salting preserves join semantics; bucketing
  * eliminates the join shuffle; the pipeline composites round-trip. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join ≡ plain join, and spreads hot keys") {
    val left = (1 to 2000).map(i => (if (i % 10 == 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload") // key 1 is hot
    val right = Seq((1L, "one"), (2L, "two"), (500L, "fh")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "payload", "name")
      .as[(Long, String, String)].collect().toSet
    val salted = Skew.saltedInnerJoin(left, right, "k", saltFactor = 8)
      .select("k", "payload", "name").as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    val hot = Skew.hotKeys(left, "k", 1).collect()
    // 200 hot rows (i % 10 == 0) plus the natural key-1 row from i = 1
    assert(hot.head.getLong(0) == 1L && hot.head.getLong(1) == 201L)
  }

  test("autoSaltedJoin ≡ plain join with and without hot keys") {
    val left = (1 to 3000).map(i => (if (i % 3 == 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload") // key 1 carries a third of the rows
    val right = Seq((1L, "one"), (2L, "two"), (500L, "fh")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "payload", "name")
      .as[(Long, String, String)].collect().toSet
    // threshold low enough that key 1 is detected hot from the sample
    val hybrid = Skew.autoSaltedJoin(left, right, "k",
        saltFactor = 4, hotThreshold = 100L, sampleFraction = 0.5)
      .select("k", "payload", "name").as[(Long, String, String)].collect().toSet
    assert(hybrid == plain)
    // threshold nothing reaches → pure cold path, still the plain result
    val allCold = Skew.autoSaltedJoin(left, right, "k",
        saltFactor = 4, hotThreshold = 1000000L, sampleFraction = 0.5)
      .select("k", "payload", "name").as[(Long, String, String)].collect().toSet
    assert(allCold == plain)
  }

  test("bucketed join on the bucket key runs without a shuffle exchange") {
    val s2 = spark
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    import s2.implicits._
    val facts = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    val dims = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", "k", 8, sortCols = Seq("k"))
    Bucketing.writeBucketed(dims, "b_dims", "k", 8, sortCols = Seq("k"))
    val joined = Bucketing.readTable(s2, "b_facts")
      .join(Bucketing.readTable(s2, "b_dims"), Seq("k"))
    assert(joined.count() == 1000)
    assert(!Bucketing.hasShuffle(joined),
      "bucketed equi-join must not introduce a shuffle exchange")
    // contrast: the same join over plain (unbucketed) frames shuffles
    val plain = facts.join(dims.hint("merge"), Seq("k"))
    assert(Bucketing.hasShuffle(plain))
    s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("plan shapes: sort+limit fuses, ranked top-k partials, scans prune") {
    val d = sf("sf0.001")
    def formatted(name: String): String = {
      val df = graft.Queries.all(name).fn(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    // A1/O1/O2: top-N must plan as TakeOrderedAndProject (never a global
    // sort), and the scan must read ONLY the grouping key
    val q01 = formatted("q01_topn_count")
    assert(q01.contains("TakeOrderedAndProject"), "top-N must fuse sort+limit")
    assert(q01.contains("ReadSchema: struct<l_partkey:bigint>"),
      "top-N scan must prune to the single grouped column")
    // A10: rank-filter windows must get the partial per-partition
    // WindowGroupLimit (top-k before the shuffle, k rows per partition
    // survive) in addition to the final one
    val q16 = formatted("q16_window_topk")
    assert("WindowGroupLimit".r.findAllIn(q16).size >= 2,
      "ranked top-k must apply partial + final WindowGroupLimit")
    // scalar-function queries must not widen the scan beyond used columns
    val q24 = formatted("q24_token_count")
    assert(q24.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "token-count scan must prune to (doc_id, text)")
    // the KMV sketch aggregate must run map-side (partial) before the
    // group shuffle — O(k) state per group crosses the wire, not rows
    val q40 = formatted("q40_kmv_distinct")
    assert(q40.contains("partial_graft_bottomk_distinct"),
      "KMV sketch must partial-aggregate before the shuffle:\n" + q40)
    assert(q40.contains("ReadSchema: struct<user_id:bigint,event_type:string>"),
      "KMV scan must prune to (user_id, event_type)")
    // P4-style range predicates must reach the parquet scan
    val q06 = formatted("q06_filter_range")
    assert(q06.contains("PushedFilters: [") && q06.contains("GreaterThan"),
      "range filter must be pushed into the scan:\n" + q06)
    // the pricing aggregation must map-side combine (partial_sum/count)
    val q21 = formatted("q21_agg_pricing")
    assert(q21.contains("partial_sum") || q21.contains("Partial"),
      "group aggregation must run a partial stage before the shuffle:\n" + q21)
    // the c2v composite's top-N membership must broadcast the top-N side
    // (a 1000-row dim must never shuffle the fact table)
    val q30 = formatted("q30_c2v_composite")
    assert(q30.contains("BroadcastHashJoin") || q30.contains("BroadcastExchange"),
      "top-N membership must be a broadcast join:\n" + q30)
    // pivot with EXPLICIT values: one partial-aggregatable pass (no
    // hidden distinct job to discover the domain), scan pruned to the
    // three referenced columns
    val q48 = formatted("q48_pivot_crosstab")
    assert(q48.contains("partial_"),
      "explicit-values pivot must partial-aggregate before the shuffle:\n" + q48)
    assert(q48.contains(
      "ReadSchema: struct<l_quantity:double,l_returnflag:string,l_linestatus:string>"),
      "pivot scan must prune to (l_quantity, l_returnflag, l_linestatus):\n" + q48)
    // generator queries stay a streaming Generate over a pruned scan
    val q49 = formatted("q49_explode_tokens")
    assert(q49.contains("Generate"), "explode must plan as Generate:\n" + q49)
    assert(q49.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "explode scan must prune to (doc_id, text):\n" + q49)
    // the correlated scalar subquery must decorrelate into an aggregate
    // + join — never a per-outer-row subquery execution
    val q52 = formatted("q52_correlated_subquery")
    assert(!q52.contains("ScalarSubquery"),
      "correlated subquery must be decorrelated, not executed per row:\n" + q52)
    assert(q52.contains("Join") && q52.contains("Aggregate"),
      "decorrelation must produce an aggregate + join plan:\n" + q52)
    // row-local curation metrics (repetition, masking) must stay a
    // single scan: no Exchange anywhere before the final presentation
    // sort — at 100 TB these run at input bandwidth or not at all.
    // (The registered queries end in an orderBy for the oracle, which
    // plans one range-partitioned sort Exchange; strip it by asserting
    // exactly ONE Exchange total.)
    for (name <- Seq("q64_repetition", "q65_blocklist_mask")) {
      val p = formatted(name)
      assert("Exchange".r.findAllIn(p).size <= 2, // rangepartition sort + AQE read
        s"$name must not shuffle beyond the presentation sort:\n" + p)
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
        s"$name scan must prune to (doc_id, text):\n" + p)
    }
    // n-gram decontamination: the eval-gram side must broadcast — the
    // train corpus must never shuffle on gram keys
    val q67 = formatted("q67_ngram_contamination")
    assert(q67.contains("BroadcastHashJoin"),
      "eval-gram membership must be a broadcast join:\n" + q67)
    // sequence packing: the cumsum window must partition on the shard
    // key (a global-window packing plan would concentrate the corpus
    // on one task) and the scan must stay pruned
    val q68 = formatted("q68_pack_bins")
    assert(q68.contains("windowspecdefinition(shard"),
      "packing cumsum must partition on the shard key, never global:\n" + q68)
    assert(q68.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "packing scan must prune to (doc_id, text):\n" + q68)
    // the curation composite: gate+mask fuse into ONE scan (a single
    // parquet read), the dedup aggregate partial-combines map-side, and
    // the packing window partitions on the shard key
    val q69 = formatted("q69_curation_composite")
    // count detail-section headers only — the tree line AND the detail
    // header both print "Scan parquet" for a single scan node
    assert("""\(\d+\) Scan parquet""".r.findAllIn(q69).size == 1,
      "composite must make exactly one pass over the corpus:\n" + q69)
    assert(q69.contains("partial_min"),
      "composite dedup must map-side combine before its shuffle:\n" + q69)
    assert(q69.contains("windowspecdefinition(shard"),
      "composite packing must window per shard:\n" + q69)
    // q149 IVFPQ audit: the seed pick must stay a distributed
    // TakeOrdered, the codebook pick a map-side-combined bottom-k
    // aggregate, and nothing may degenerate to an unbounded cartesian
    // (crossJoins in the audit are all broadcast-literal-bounded)
    val q149 = formatted("q149_ivfpq_recall_audit")
    assert(q149.contains("TakeOrderedAndProject"),
      "q149 seed pick must be a TakeOrdered, not a global sort:\n")
    assert(q149.contains("partial_graft_bottomk"),
      "q149 codebook pick must partial-aggregate before the shuffle:\n")
    assert(!q149.contains("CartesianProduct"),
      "q149 must never plan an unbroadcast cartesian:\n" + q149)
    // q150 cross-modal pair prep: hash-shuffle equi-joins ONLY — no
    // cartesian, no nested-loop join anywhere in the plan
    val q150 = formatted("q150_crossmodal_pairs")
    assert(!q150.contains("CartesianProduct") &&
      !q150.contains("BroadcastNestedLoopJoin"),
      "q150 must compose from equi-joins only:\n" + q150)
  }

  test("round-12 plan shapes: row-local extraction, shuffle reuse, top-k, oriented joins") {
    val d = sf("sf0.001")
    def formatted(name: String): String = {
      val df = graft.Queries.all(name).fn(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    // q152 HTML extraction: one corpus scan, zero hash shuffles — the
    // whole operator lives in the scan projection (only the final
    // ORDER BY range-exchanges)
    val q152 = formatted("q152_html_extract")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(q152).size == 1,
      "q152 must make exactly one pass over the corpus:\n" + q152)
    assert(!q152.contains("Exchange hashpartitioning"),
      "q152 must be row-local — no hash shuffle:\n" + q152)
    // q154 postings: the (term, block) exchange is REUSED by the lag
    // window and the final agg — exactly 3 exchanges total (distinct,
    // term-block, final sort), with the window sandwiched shuffle-free
    val q154 = formatted("q154_postings_index")
    assert("""\(\d+\) Exchange""".r.findAllIn(q154).size == 3,
      "q154 must reuse the (term,block) exchange for window AND agg:\n" + q154)
    assert(q154.contains("windowspecdefinition(term"),
      "q154 gap window must partition on (term, block):\n" + q154)
    // q155 A-ES sample: a single distributed top-k — no exchange of
    // any kind, no window, no aggregate
    val q155 = formatted("q155_weighted_sample")
    assert(q155.contains("TakeOrderedAndProject"),
      "q155 selection must be a TakeOrdered:\n" + q155)
    assert(!q155.contains("Exchange"),
      "q155 must plan with zero exchanges:\n" + q155)
    // q156 shard manifest: the histogram prefix must broadcast and the
    // running-sum window must partition per bucket — never global
    val q156 = formatted("q156_shard_manifest")
    assert(q156.contains("BroadcastExchange"),
      "q156 histogram prefix must broadcast:\n" + q156)
    assert(q156.contains("windowspecdefinition(_cs_bkt"),
      "q156 running sum must window per bucket, never globally:\n" + q156)
    // q153 / q157 / q158: equi-joins only — a cartesian anywhere in
    // the line-dedup membership join, the robots rule match, or the
    // wedge-closing joins would be a scale killer
    for (name <- Seq("q153_line_dedup", "q157_robots_gate",
        "q158_triangle_count")) {
      val p = formatted(name)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$name must compose from equi-joins only:\n" + p)
    }
  }

  test("text-op plan shapes: chunking is shuffle-free; BM25 broadcasts and filters before tf") {
    val docs = (1 to 200).map(i => (i.toLong,
      Seq.fill(5)(s"w${i % 7}") ++ Seq("hash", "join"))).toDF("doc_id", "t")
    // chunk fan-out is row-local: no Exchange anywhere in the plan
    val chunks = docs.select(col("doc_id"),
      explode(graft.functions.TextFns.tokenChunks(col("t"), 4, 3)).as("c"))
    assert(!chunks.queryExecution.executedPlan.toString.contains("Exchange"),
      "tokenChunks + explode must not shuffle")
    assert(chunks.count() > 200)
    // BM25: both count-table joins broadcast; the query-vocab filter
    // runs BEFORE the first aggregation (tf only for query terms)
    val stats = graft.text.Bm25.fit(docs, "doc_id", "t")
    val plan = graft.text.Bm25.topKScaled(stats, docs, "doc_id", "t",
      Seq(0L -> Seq("hash", "join")), k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      "query-vocab-bounded sides must broadcast:\n" + plan.take(1500))
    val firstAgg = plan.indexOf("HashAggregate")
    assert(plan.indexOf("Filter") >= 0 && firstAgg >= 0,
      "expected Filter and HashAggregate in plan")
    // executed plans print top-down: the tf aggregate must have the
    // isin Filter BELOW it (later in the string)
    assert(plan.indexOf("Filter", firstAgg) > firstAgg,
      "query-term filter must sit under the tf aggregation:\n" + plan.take(1500))
  }

  test("scalableRowNumber ≡ direct global row_number for any bucketDiv") {
    import org.apache.spark.sql.expressions.Window
    // negatives, heavy ties, and a bucket boundary straddle (-1000..1000)
    val rows = (1 to 997).map(i => (i.toLong, ((i * 37) % 21 - 10) * 100L))
    val df = rows.toDF("id", "v")
    val direct = df.withColumn("r",
        row_number().over(Window.orderBy(col("v"), col("id"))))
      .select(col("id"), col("r"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (div <- Seq(1L, 7L, 1000L, 1000000L)) { // 1e6 ⇒ ONE bucket (degenerate)
      val scal = Relational.scalableRowNumber(df, "v", "id", bucketDiv = div)
        .select(col("id"), col("r"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { case (id, _) =>
        assert(scal(id) == direct(id).toLong, s"id=$id bucketDiv=$div")
      }
    }
    // the corpus-scale relation never crosses a single-partition
    // exchange: the only SinglePartition move feeds the tiny histogram
    val plan = Relational.scalableRowNumber(df, "v", "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "expected per-bucket window")
  }

  test("per-group top-k rank filter plans as WindowGroupLimit (q119 shape)") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => (i.toLong, s"s${i % 7}")).toDF("id", "src")
      .withColumn("h", graft.functions.HashFns.md5Hash60(col("id").cast("string")))
    val plan = df.withColumn("r", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("h"), col("id"))))
      .where(col("r") <= 15)
      .queryExecution.executedPlan.toString
    // Spark 3.5+ pushes the rank<=k filter into WindowGroupLimit on BOTH
    // sides of the exchange — partial group-limit before the shuffle is
    // what keeps a giant source from shipping all its rows
    assert(plan.contains("WindowGroupLimit"),
      "rank<=k per group must plan as WindowGroupLimit:\n" + plan.take(1200))
  }

  test("scalableCumSum ≡ direct global running sum + rank for any bucketDiv") {
    import org.apache.spark.sql.expressions.Window
    // values include zeros and heavy order-key ties across bucket edges
    val rows = (1 to 733).map(i =>
      (i.toLong, ((i * 37) % 21 - 10) * 100L, (i * 13 % 7).toLong))
    val df = rows.toDF("id", "v", "w")
    val wDir = Window.orderBy(col("v"), col("id"))
    val direct = df
      .withColumn("cum", sum(col("w")).over(
        wDir.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("r", row_number().over(wDir))
      .select(col("id"), col("cum"), col("r"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2).toLong)))
      .toMap
    for (div <- Seq(1L, 7L, 1000L, 1000000L)) {
      val scal = Relational.scalableCumSum(df, "v", "id", "w", bucketDiv = div)
        .select(col("id"), col("cum"), col("r"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      rows.foreach { case (id, _, _) =>
        assert(scal(id) == direct(id), s"id=$id bucketDiv=$div")
      }
    }
  }

  test("epochShuffle: per-epoch permutation, layout-independent, epochs differ") {
    val n = 500
    val df = (1 to n).map(_.toLong).toDF("id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Relational.epochShuffle(d, "id", epochs = 2, seed = 7L, shards = 4)
        .select(col("epoch"), col("id"), col("pos"), col("shard"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val a = run(df)
    // each epoch's pos is exactly a permutation of 1..n
    for (e <- Seq(0L, 1L)) {
      val ps = a.collect { case (`e`, _, p, _) => p }.sorted
      assert(ps.toSeq == (1L to n.toLong), s"epoch $e not a permutation")
    }
    // shard is round-robin over pos
    a.foreach { case (_, _, p, s) => assert(s == (p - 1) % 4) }
    // the two epochs read the corpus in genuinely different orders
    val o0 = a.collect { case (0L, id, p, _) => id -> p }.toMap
    val o1 = a.collect { case (1L, id, p, _) => id -> p }.toMap
    assert((1 to n).count(i => o0(i.toLong) != o1(i.toLong)) > n / 2)
    // permutation must not depend on the input's partition layout
    val b = run(df.repartition(13, col("id")))
    assert(a.sorted.toSeq == b.sorted.toSeq)
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    val s2 = spark
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    // big enough that DPP's benefit heuristic fires; useStats=false makes
    // the decision size-based (fallback ratio), not catalog-stats-based
    val fact = (1 to 50000).map(i => (i.toLong, "x" * 100, s"k${i % 10}"))
      .toDF("v", "p", "kind")
    graft.sources.Writers.partitionedParquetZstd(fact, s"$dir/fact", Seq("kind"))
    val prev = s2.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    try {
      s2.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      // the dim must be a FILE relation: a filter over a local Seq gets
      // constant-folded into the LocalRelation and DPP then sees no
      // selective predicate to derive the runtime filter from
      Seq(("k1", "one"), ("k2", "two"), ("k3", "three")).toDF("kind", "name")
        .write.mode("overwrite").parquet(s"$dir/dim")
      val dim = s2.read.parquet(s"$dir/dim")
      val joined = s2.read.parquet(s"$dir/fact")
        .join(dim.where(col("name") === "one"), Seq("kind"))
      // the partition filter must come from the JOIN at runtime — the scan
      // carries a dynamicpruning subquery instead of reading all 10 dirs
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("dynamicpruning"),
        "partitioned fact ⋈ filtered dim must plan dynamic partition pruning:\n" + plan)
      assert(joined.count() == 5000)
    } finally prev match {
      case Some(v) => s2.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", v)
      case None => s2.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    }
  }

  test("AQE splits a skewed sort-merge join partition") {
    val s2 = spark
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> s2.conf.getOption(k)).toMap
    try {
      s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import s2.implicits._
      val payload = "x" * 200
      // 90% of left rows share key 0 → one reducer partition dwarfs the rest
      val left = (1 to 20000)
        .map(i => (if (i % 10 != 0) 0L else i.toLong, payload)).toDF("k", "p")
      val right = (0L to 20000L).map(k => (k, s"d$k")).toDF("k", "name")
      val joined = left.join(right.hint("merge"), Seq("k"))
      // collect() drives THIS dataset's own AdaptiveSparkPlanExec to its
      // final plan (count() would execute a separate aggregate query and
      // leave joined's plan un-adapted)
      assert(joined.collect().length == 20000)
      // AQE's final executed plan must mark the rewritten join skew=true
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "skewed SMJ must be rewritten by AQE skew-join handling:\n" + finalPlan)
    } finally prev.foreach {
      case (k, Some(v)) => s2.conf.set(k, v)
      case (k, None) => s2.conf.unset(k)
    }
  }

  test("runtime bloom-filter join pruning injects a might-contain probe") {
    val s2 = spark
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    // both sides file relations: the filter must survive to runtime-filter
    // injection (local Seqs constant-fold), and the fact side must be
    // large enough to clear the application threshold
    (1 to 60000).map(i => (i.toLong % 5000, "x" * 60)).toDF("k", "p")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 5000L).map(k => (k, s"d$k", k % 7)).toDF("k", "name", "grp")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> s2.conf.getOption(k)).toMap
    try {
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val joined = s2.read.parquet(s"$dir/fact")
        .join(s2.read.parquet(s"$dir/dim").where(col("grp") === 3), Seq("k"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("might_contain"),
        "selective dim filter must inject a runtime bloom filter on the fact scan:\n"
          + plan)
      assert(joined.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => s2.conf.set(k, v)
      case (k, None) => s2.conf.unset(k)
    }
  }

  test("posting/bucket caps bound quadratic buckets under an injected hot shingle") {
    // 600 synthetic docs share a hot 12-token prefix: every prefix
    // shingle (and each prefix/tail straddle) lands in a 600-doc
    // posting list. Uncapped, those buckets alone yield C(600,2) ≈
    // 179k verified pairs (prefix Jaccard ≈ 0.75 > τ). The cap drops
    // exactly those buckets, so the candidate set stays linear in the
    // docs — this is the knob that keeps a stop-shingle at 100 TB from
    // creating a quadratic bucket.
    val hot = "the quick brown fox jumps over the lazy dog again and again"
    val synth = (0 until 600)
      .map(i => (i.toLong, s"$hot unique tail token$i"))
    // plant one REAL duplicate pair whose evidence is entirely COLD
    // shingles (2 postings each) — it must survive the cap. NB the
    // posting cap bounds the measured INTERSECTION too (a pair whose
    // overlap is mostly hot shingles cannot verify) — that is the
    // operator's documented semantics, mirrored 1:1 by the q27 oracle.
    val planted = "planted duplicate alpha beta gamma delta epsilon zeta"
    val docs = (synth ++ Seq((8000L, planted), (9000L, planted)))
      .toDF("doc_id", "text")

    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      maxPostings = Int.MaxValue).count()
    assert(uncapped >= 600L * 599 / 2,
      s"uncapped hot shingle must go quadratic (got $uncapped)")

    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      maxPostings = 100)
    val cappedPairs = capped.as[(Long, Long)].collect().toSet
    assert(cappedPairs == Set((8000L, 9000L)),
      s"cap must keep only cold-evidence pairs, got ${cappedPairs.size}")

    // same bounding behavior on the LSH band-bucket path: uncapped, the
    // shared-prefix signatures agree on bands for huge crowds; capped,
    // buckets above maxBucket are dropped and the pair count collapses
    val lshUncapped = Dedup.minhashLsh(docs, "doc_id", "text",
        tauNum = 1, tauDenom = 2, maxBucket = Int.MaxValue)
      .where(col("keep_id") =!= col("doc_id")).count()
    val lshCapped = Dedup.minhashLsh(docs, "doc_id", "text",
        tauNum = 1, tauDenom = 2, maxBucket = 100)
    val lshCappedDups = lshCapped.where(col("keep_id") =!= col("doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(lshUncapped >= 599,
      s"uncapped LSH must find the whole hot crowd (got $lshUncapped)")
    assert(lshCappedDups.size <= 10,
      s"maxBucket must drop the hot band buckets (got ${lshCappedDups.size})")
    assert(lshCappedDups.contains((9000L, 8000L)),
      "the cold-bucket planted pair must survive the band cap")
    graft.Caches.release()
  }

  test("c2v composite pipeline over reference-shaped comments") {
    val comments = Seq(
      ("c1", "alice", "AskReddit"), ("c2", "alice", "aww"),
      ("c3", "bob", "AskReddit"), ("c4", "bob", "aww"), ("c5", "bob", "nba"),
      ("c6", "[deleted]", "aww"), ("c7", "carol", "u_profile"),
      ("c8", "carol", "AskReddit"), ("c9", "dave", "rare"))
      .toDF("id", "author", "subreddit")
    val (contexts, top) = graft.pipelines.Community2Vec.userContexts(
      comments, topN = 3, excludeTopUserPct = 0.05, minSentenceLength = 2)
    // top-3 subreddits: AskReddit(3), aww(3, incl deleted author), nba(1)
    assert(top.collect().map(_.getString(0)).toSet == Set("AskReddit", "aww", "nba"))
    val rows = contexts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // bob (3 comments) is the top 5% most active → excluded; carol has 1
    // in-top comment (< minSentenceLength) → dropped; dave's subreddit not
    // in top-N → gone. alice survives.
    assert(rows == Map("AskReddit aww" -> 2L))
  }

  test("bow composite joins within the time window only") {
    val subs = Seq(("s1", "alice", "sub1", "100", 5, "text", "t", "u"),
      ("s2", "bob", "sub1", "200", 5, "[removed]", "t", "u"))
      .toDF("id", "author", "subreddit", "created_utc", "score", "selftext", "title", "url")
    val coms = Seq(
      ("c1", "t3_s1", 1, "t3_s1", "carol", "sub1", "quick", 150),
      ("c2", "t3_s1", 1, "t3_s1", "carol", "sub1", "late", 999999),
      ("c3", "t3_s1", 1, "t3_s1", "[deleted]", "sub1", "gone", 160))
      .toDF("id", "parent_id", "score", "link_id", "author", "subreddit", "body", "created_utc")
    val joined = graft.pipelines.Community2Vec.joinedSubmissionsComments(
      subs, coms, topN = 5, excludeTopUserPct = 0.5,
      minTimeDeltaSeconds = Some(3L), maxTimeDeltaSeconds = Some(1000L))
    val ids = joined.select("comments_id").as[String].collect().toSet
    // c2 outside window; c3 deleted author; s2 selftext removed
    assert(ids == Set("c1"))
    assert(joined.columns.contains("time_to_comment_in_seconds"))
    assert(joined.select("time_to_comment_in_seconds").as[Long].head() == 50L)
  }

  test("intruder export: the k-row eligible aggregate broadcasts in the band join") {
    // the candidate-intruder join is a non-equi ±1σ band predicate —
    // acceptable ONLY because the eligible side is a k-row per-cluster
    // aggregate that Spark broadcasts (O(k·n), k domain-bounded; see
    // Annotation.intruderTask scaladoc). If this ever plans the big
    // assignments side into the broadcast (or falls back to a
    // cartesian), the export stops scaling.
    val assignments = (1 to 400)
      .map(i => (s"w$i", s"c${i % 8}", (i % 17 + 1).toLong))
      .toDF("word", "cluster", "cnt")
    val out = graft.export.Annotation.intruderTask(
      assignments, "word", "cluster", "cnt", topN = 5)
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "band join must plan as a broadcast nested loop:\n" + plan)
    assert(plan.contains("BroadcastExchange"),
      "eligible k-row aggregate must broadcast:\n" + plan)
  }

  test("round-12b plan shapes: dictionary linkage, QI agg, hop expansion, cohort joins") {
    val d = sf("sf0.001")
    def formatted(name: String): String = {
      val df = graft.Queries.all(name).fn(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    // q159 fuzzy linkage: the in-block self-join must be an equi-join
    // on the blocking key — a cartesian over even the dictionary is
    // the failure mode blocking exists to prevent
    val q159 = formatted("q159_fuzzy_join")
    assert(!q159.contains("CartesianProduct") &&
      !q159.contains("BroadcastNestedLoopJoin"),
      "q159 must equi-join on the blocking key:\n" + q159)
    // q160 char entropy: aggregation trees joined on doc_id — no
    // window over the corpus, no non-equi join
    val q160 = formatted("q160_char_entropy")
    assert(!q160.contains("windowspecdefinition"),
      "q160 must not window over the corpus:\n" + q160)
    assert(!q160.contains("CartesianProduct") &&
      !q160.contains("BroadcastNestedLoopJoin"),
      "q160 joins must stay equi on doc_id:\n" + q160)
    // q161 k-anonymity: ONE hash shuffle (the QI-tuple aggregation);
    // the audit is a single aggregation, nothing else may exchange
    // besides the final ORDER BY range partition
    val q161 = formatted("q161_k_anonymity")
    assert("""\(\d+\) Exchange""".r.findAllIn(q161).size == 2,
      "q161 must exchange exactly twice — the QI-tuple hash agg and the " +
        "final ORDER BY range partition:\n" + q161)
    assert(!q161.contains("windowspecdefinition"),
      "q161 must not use a window:\n" + q161)
    // q162 kappa: the k×k summary must BROADCAST back onto the
    // contingency (its cross join is 1-row — bounded by construction)
    val q162 = formatted("q162_annotator_kappa")
    assert(q162.contains("BroadcastExchange"),
      "q162 summary must broadcast onto the contingency:\n" + q162)
    // q163 cohorts: user-keyed and cohort-keyed equi-joins only
    val q163 = formatted("q163_retention_cohorts")
    assert(!q163.contains("CartesianProduct") &&
      !q163.contains("BroadcastNestedLoopJoin"),
      "q163 must compose from equi-joins only:\n" + q163)
    assert(!q163.contains("windowspecdefinition"),
      "q163 must not window over the corpus:\n" + q163)
    // q164 hopping windows: the slide expansion is row-local; exactly
    // one hash shuffle (the (window, type) aggregation) may appear
    val q164 = formatted("q164_hopping_window")
    assert("""\(\d+\) Exchange""".r.findAllIn(q164).size == 2,
      "q164 must exchange exactly twice — the (window,type) hash agg and " +
        "the final ORDER BY range partition:\n" + q164)
    assert(q164.contains("Expand"),
      "q164's hop expansion must be the row-local Expand operator:\n" + q164)
  }

  test("round-12c plan shapes: funnel, baskets, rollup, CDC, DQ, windows") {
    val d = sf("sf0.001")
    def formatted(name: String): String = {
      val df = graft.Queries.all(name).fn(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    // q165 funnel: each step is a user-keyed equi-join with a range
    // residual — never a cartesian; no window anywhere
    val q165 = formatted("q165_funnel")
    assert(!q165.contains("CartesianProduct") &&
      !q165.contains("BroadcastNestedLoopJoin"),
      "q165 steps must stay user-keyed equi-joins:\n" + q165)
    assert(!q165.contains("windowspecdefinition"),
      "q165 must not window over the corpus:\n" + q165)
    // q166 assoc rules: the pair self-join is an equi-join on the
    // basket key; N attaches via a broadcast (1-row aggregate)
    val q166 = formatted("q166_assoc_rules")
    assert(!q166.contains("CartesianProduct"),
      "q166 pair generation must equi-join on the basket key:\n" + q166)
    assert(q166.contains("BroadcastExchange"),
      "q166's 1-row basket count must broadcast:\n" + q166)
    // q167 rollup: grouping sets = ONE row-local Expand + one hash agg
    // (+ the final sort), never one scan per grouping set
    val q167 = formatted("q167_rollup")
    assert(q167.contains("Expand"),
      "q167 must use the Expand-based grouping-sets plan:\n" + q167)
    assert("""\(\d+\) Exchange""".r.findAllIn(q167).size == 2,
      "q167 must exchange exactly twice — the rollup hash agg and the " +
        "final ORDER BY range partition:\n" + q167)
    // q168 CDC merge: latest-wins is a hash AGGREGATE (max_by), never a
    // per-key window; apply is a key equi-join
    val q168 = formatted("q168_cdc_merge")
    assert(!q168.contains("windowspecdefinition"),
      "q168 latest-wins must be max_by aggregation, not a window:\n" + q168)
    assert(!q168.contains("CartesianProduct") &&
      !q168.contains("BroadcastNestedLoopJoin"),
      "q168's merge join must stay an equi-join on the key:\n" + q168)
    // q170 markov: the lag window must partition by user_id (bounded
    // frames) — a corpus-wide window spec would have an empty
    // partition clause
    val q170 = formatted("q170_markov_transitions")
    assert(q170.contains("windowspecdefinition(user_id"),
      "q170's lag window must be partitioned per user:\n" + q170)
    // q171/q172: every window partitioned per user, never corpus-wide
    val q171 = formatted("q171_forward_fill")
    assert(q171.contains("windowspecdefinition(user_id"),
      "q171 LOCF window must be partitioned per user:\n" + q171)
    val q172 = formatted("q172_rolling_window")
    assert(q172.contains("windowspecdefinition(user_id"),
      "q172 RANGE frame must be partitioned per user:\n" + q172)
    // q173 hard negatives: probes must broadcast onto the corpus scan
    val q173 = formatted("q173_hard_negatives")
    assert(q173.contains("BroadcastNestedLoopJoin") ||
      q173.contains("BroadcastExchange"),
      "q173's probe side must broadcast:\n" + q173)
    // q175 anomaly: one user-keyed agg + join back, no window
    val q175 = formatted("q175_anomaly_zscore")
    assert(!q175.contains("windowspecdefinition"),
      "q175 must compute stats via aggregation, not a window:\n" + q175)
    assert(!q175.contains("CartesianProduct") &&
      !q175.contains("BroadcastNestedLoopJoin"),
      "q175's stats join must stay user-keyed:\n" + q175)
    // q176 forget cascade: every audit join is a key equi-join
    val q176 = formatted("q176_forget_cascade")
    assert(!q176.contains("CartesianProduct"),
      "q176 audit joins must stay key equi-joins:\n" + q176)
    // q177 table diff: ONE full-outer equi-join, no window
    val q177 = formatted("q177_table_diff")
    assert(q177.contains("FullOuter"),
      "q177 must diff via a full-outer join:\n" + q177)
    assert(!q177.contains("windowspecdefinition"),
      "q177 must not use a window:\n" + q177)
    // q178 skew report: top-10 must be TakeOrdered, never a full sort
    val q178 = formatted("q178_skew_report")
    assert(q178.contains("TakeOrderedAndProject"),
      "q178's top-10 must plan as TakeOrderedAndProject:\n" + q178)
    // q179 unigram tokenizer: everything after the word-count shuffle
    // is vocab-bounded — the plan must not cartesian anywhere, and the
    // piece-score total must broadcast (1-row aggregate)
    val q179 = formatted("q179_unigram_tokenizer")
    assert(!q179.contains("CartesianProduct"),
      "q179 must stay equi-joined on word/piece keys:\n" + q179)
    assert(q179.contains("BroadcastExchange") ||
      q179.contains("BroadcastNestedLoopJoin"),
      "q179's 1-row piece total must broadcast:\n" + q179)
  }

  test("round-12d plan shapes: greedy decode, delta maintenance, feature hash, neighbor sample") {
    val d = sf("sf0.001")
    def formatted(name: String): String = {
      val df = graft.Queries.all(name).fn(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    // q183 greedy decode: both decoders are row-local maps over the
    // vocab-bounded arc table — no window anywhere, no cartesian
    // (the 1-row piece-total crossJoin broadcasts)
    val q183 = formatted("q183_wordpiece_greedy")
    assert(!q183.contains("windowspecdefinition"),
      "q183 decoders are row-local — no window allowed:\n" + q183)
    assert(!q183.contains("CartesianProduct"),
      "q183 joins must stay key equi-joins:\n" + q183)
    // q184 incremental maintenance: the CDC diff is ONE full-outer
    // equi-join on the row key; everything downstream is keyed on g —
    // no window, no cartesian
    val q184 = formatted("q184_incremental_agg")
    assert(q184.contains("FullOuter"),
      "q184's delta derivation must be a full-outer key join:\n" + q184)
    assert(!q184.contains("windowspecdefinition"),
      "q184 must maintain via aggregation, not windows:\n" + q184)
    assert(!q184.contains("CartesianProduct") &&
      !q184.contains("BroadcastNestedLoopJoin"),
      "q184 joins must stay key equi-joins:\n" + q184)
    // q185 feature hashing: ONE hash aggregation over the token
    // stream — no join, no window; output is the constant bucket space
    val q185 = formatted("q185_feature_hash")
    assert(!q185.contains("windowspecdefinition"),
      "q185 must be pure aggregation:\n" + q185)
    assert(!q185.contains("Join"),
      "q185 has no join in its plan:\n" + q185)
    // q186 neighbor sampling: the fanout rank window partitions per
    // node (degree-bounded frames, never corpus-wide); hop joins are
    // key equi-joins
    val q186 = formatted("q186_neighbor_sample")
    assert(q186.contains("windowspecdefinition(node"),
      "q186's fanout rank must window per node:\n" + q186)
    assert(!q186.contains("CartesianProduct") &&
      !q186.contains("BroadcastNestedLoopJoin"),
      "q186 hop joins must stay key equi-joins:\n" + q186)
    // q187/q188: single hash aggregation each — no join, no window
    // (the soundex code is row-local translate/regexp built-ins)
    val q187 = formatted("q187_soundex_blocking")
    assert(!q187.contains("Join") && !q187.contains("windowspecdefinition"),
      "q187 must be one hash aggregation over row-local codes:\n" + q187)
    val q188 = formatted("q188_l_diversity")
    assert(!q188.contains("Join") && !q188.contains("windowspecdefinition"),
      "q188 must be one hash aggregation:\n" + q188)
    // q189 join-size audit: sketch and exact sides are key equi-joins;
    // only the 1-row exact total crosses (broadcast)
    val q189 = formatted("q189_joinsize_estimate")
    assert(!q189.contains("CartesianProduct"),
      "q189 joins must stay key equi-joins:\n" + q189)
    assert(!q189.contains("windowspecdefinition"),
      "q189 must not window:\n" + q189)
    // q190 rolling distinct: bounded-fanout expansion, NEVER a
    // distinct-over-range window or a day-range theta-join
    val q190 = formatted("q190_rolling_distinct")
    assert(!q190.contains("windowspecdefinition"),
      "q190 must use fanout expansion, not a range window:\n" + q190)
    assert(!q190.contains("CartesianProduct") &&
      !q190.contains("BroadcastNestedLoopJoin"),
      "q190's day joins must stay equi-joins:\n" + q190)
    assert(q190.contains("Generate"),
      "q190's 7-day visibility must be the row-local explode:\n" + q190)
    // q191 k-fold audit: hash aggs on the k×langs matrix, no window
    val q191 = formatted("q191_kfold_audit")
    assert(!q191.contains("windowspecdefinition"),
      "q191 must be hash aggregation only:\n" + q191)
    assert(!q191.contains("CartesianProduct"),
      "q191's only cross is the broadcast 1-row total:\n" + q191)
    // q192 attribution: the lookback is a (user, week) EQUI-join after
    // the fanout-2 explode; per-purchase credit is max_by/min_by
    // aggregation, never a per-user window
    val q192 = formatted("q192_attribution")
    assert(q192.contains("Generate"),
      "q192's week fanout must be the row-local explode:\n" + q192)
    assert(!q192.contains("windowspecdefinition"),
      "q192 credit must be max_by aggregation, not a window:\n" + q192)
    assert(!q192.contains("CartesianProduct"),
      "q192's lookback must stay a (user, week) equi-join:\n" + q192)
    // q193 funnel latency: percentile targets broadcast onto the
    // scalableCumSum rank — every window partitioned (the cumsum
    // bucket), never one global ORDER BY window over the latencies
    val q193 = formatted("q193_funnel_latency")
    assert(q193.contains("BroadcastExchange"),
      "q193's percentile targets must broadcast:\n" + q193)
    assert(!q193.contains("windowspecdefinition(delta_s"),
      "q193 must rank via scalableCumSum, not a global value window:\n" + q193)
    // q194 per-group HLL: register + finalize are hash aggs on the
    // (group × 64) relation; no window, no cartesian
    val q194 = formatted("q194_hll_by_group")
    assert(!q194.contains("windowspecdefinition") &&
      !q194.contains("CartesianProduct"),
      "q194 must be register hash aggs + a group-key join:\n" + q194)
  }

  test("round-13 plan shapes: graph rounds truncate lineage, keyed windows, lossless prefix join") {
    val d = sf("sf0.001")
    def formatted(name: String): String = {
      val df = graft.Queries.all(name).fn(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    // q195/q198 iterative graph rounds: the returned frame must scan the
    // LogicalRDD rebuild (constant-depth plan), never the accumulated
    // 2^k/3^k-nested InMemoryRelation lineage whose per-action
    // stringification goes CPU-bound
    val q195 = formatted("q195_label_prop")
    assert(q195.contains("ExistingRDD"),
      "q195's rounds must end in a lineage-truncated LogicalRDD scan:\n" + q195)
    val q198 = formatted("q198_kcore")
    assert(q198.contains("ExistingRDD"),
      "q198's peel must end in a lineage-truncated LogicalRDD scan:\n" + q198)
    assert(!q198.contains("CartesianProduct"),
      "q198's degree/survivor joins must stay key equi-joins:\n" + q198)
    // q196 session paths: the gap windows partition per user (bounded
    // frames), counting is hash agg, and the top-50 is
    // TakeOrderedAndProject — never a global sort
    val q196 = formatted("q196_session_paths")
    assert(q196.contains("windowspecdefinition(user_id"),
      "q196's session windows must partition per user:\n" + q196)
    assert(q196.contains("TakeOrderedAndProject"),
      "q196's top-N must be TakeOrderedAndProject:\n" + q196)
    assert(!q196.contains("CartesianProduct"),
      "q196 has no join beyond the keyed windows:\n" + q196)
    // q197 t-closeness: per-group cumulative windows keyed by the QI
    // tuple; the only unpartitioned window is the m-row global
    // histogram's (m = sensitive cardinality, an attribute property);
    // the histogram and 1-row total reach groups via broadcast
    val q197 = formatted("q197_t_closeness")
    assert(q197.contains("windowspecdefinition(c_nationkey"),
      "q197's per-group cumsum must window on the QI tuple:\n" + q197)
    assert(q197.contains("BroadcastExchange"),
      "q197's global histogram must broadcast onto the groups:\n" + q197)
    // q199 lossless set-sim join: rarity rank windows per DOCUMENT
    // (never a corpus-wide frequency window); candidate generation and
    // verification are equi-joins on shingle/doc keys
    val q199 = formatted("q199_setsim_join")
    assert(q199.contains("windowspecdefinition(_id"),
      "q199's prefix rank must window per document:\n" + q199)
    assert(!q199.contains("CartesianProduct") &&
      !q199.contains("BroadcastNestedLoopJoin"),
      "q199 must join on shingle/doc keys only:\n" + q199)
  }

  test("round-13b plan shapes: sketch algebra, BFS truncation, keyed coalesce, one-agg OLS") {
    val d = sf("sf0.001")
    def formatted(name: String): String = {
      val df = graft.Queries.all(name).fn(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    // q200 KMV set algebra: sketches from ONE corpus aggregation, the
    // pairwise stage is row-local array math on key-cardinality-bounded
    // rows (the t_a < t_b broadcast cross is the ONLY non-equi join) —
    // no window anywhere
    val q200 = formatted("q200_kmv_setops")
    assert(!q200.contains("windowspecdefinition"),
      "q200 must not window — sketches are one hash agg:\n" + q200)
    assert(q200.contains("BroadcastExchange"),
      "q200's pair stage must broadcast the key-bounded sketch side:\n" + q200)
    // q201 BFS: rounds end in the lineage-truncated LogicalRDD scan;
    // frontier/settle joins are key equi-joins
    val q201 = formatted("q201_bfs_distance")
    assert(q201.contains("ExistingRDD"),
      "q201's rounds must end in a lineage-truncated LogicalRDD scan:\n" + q201)
    assert(!q201.contains("CartesianProduct"),
      "q201's frontier joins must stay key equi-joins:\n" + q201)
    // q202 interval coalescing: running-max-end and island windows
    // partition per user; aggregation is one (user, island) hash agg
    val q202 = formatted("q202_interval_coalesce")
    assert(q202.contains("windowspecdefinition(user_id"),
      "q202's windows must partition per user:\n" + q202)
    assert(!q202.contains("Join"),
      "q202 is windows + one hash agg — no join:\n" + q202)
    // q203 OLS: ONE sufficient-statistics hash agg after the key
    // equi-join; slope/intercept/R² are row-local — no window
    val q203 = formatted("q203_ols_trend")
    assert(!q203.contains("windowspecdefinition"),
      "q203 must reduce to sufficient statistics, not windows:\n" + q203)
    assert(!q203.contains("CartesianProduct") &&
      !q203.contains("BroadcastNestedLoopJoin"),
      "q203's orders⨝customer must stay an equi-join:\n" + q203)
    // q204 HRW rebalance: row-local hash arrays + ONE hash agg —
    // no join, no window, constant 8-row output at any corpus scale
    val q204 = formatted("q204_hrw_rebalance")
    assert(!q204.contains("Join") && !q204.contains("windowspecdefinition"),
      "q204 must be one aggregation over row-local shard codes:\n" + q204)
    // q205 contamination matrix: the q199 pair machinery (per-doc rank
    // windows, shingle/doc equi-joins) + source lookups; the count
    // side broadcasts; never a cartesian
    val q205 = formatted("q205_source_contamination")
    assert(!q205.contains("CartesianProduct") &&
      !q205.contains("BroadcastNestedLoopJoin"),
      "q205 must stay equi-joins end to end:\n" + q205)
    assert(q205.contains("windowspecdefinition(_id"),
      "q205's prefix rank must window per document (q199's plan):\n" + q205)
    // q206 MAD: both percentile passes window per GROUP over distinct
    // values (value-cardinality-bounded); median join-backs are key
    // equi-joins
    val q206 = formatted("q206_mad_outliers")
    assert(q206.contains("windowspecdefinition(event_type"),
      "q206's rank windows must partition per group:\n" + q206)
    assert(!q206.contains("CartesianProduct") &&
      !q206.contains("BroadcastNestedLoopJoin"),
      "q206's median join-backs must stay key equi-joins:\n" + q206)
    // q207 weighted median: one (key, value) weight agg + the
    // value-bounded cumulative window — no join at all
    val q207 = formatted("q207_weighted_median")
    assert(q207.contains("windowspecdefinition(l_returnflag"),
      "q207's cumulative weights must window per group:\n" + q207)
    assert(!q207.contains("Join"),
      "q207 has no join — distinct-value sums only:\n" + q207)
    // q208 sweep: the running concurrency rides scalableCumSum —
    // every non-trivial window partitions per bucket; the only
    // unpartitioned window is the bucket histogram's (bucket-count
    // rows, a constant)
    val q208 = formatted("q208_peak_concurrency")
    assert(q208.contains("windowspecdefinition(_cs_bkt"),
      "q208's running sum must window per cumsum bucket:\n" + q208)
    assert(!q208.contains("CartesianProduct"),
      "q208 joins only the broadcast histogram:\n" + q208)
    // q209 power law: two hash aggs over the length vocabulary —
    // no join, no window
    val q209 = formatted("q209_powerlaw_alpha")
    assert(!q209.contains("Join") && !q209.contains("windowspecdefinition"),
      "q209 is two hash aggs over distinct lengths:\n" + q209)
    // q210 decile lift: exact global rank via scalableRowNumber
    // (bucketed), order counts joined by key — no corpus-wide
    // single-partition rank window
    val q210 = formatted("q210_decile_lift")
    assert(q210.contains("windowspecdefinition(_rnk_bkt"),
      "q210's rank must ride the bucketed scalableRowNumber:\n" + q210)
    assert(!q210.contains("CartesianProduct") ||
      q210.contains("BroadcastExchange"),
      "q210's only cross is the broadcast 1-row total:\n" + q210)
  }

  test("round-13c plan shapes: temporal lookup, Pareto cumsum, clamp windows") {
    val d = sf("sf0.001")
    def formatted(name: String): String = {
      val df = graft.Queries.all(name).fn(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    // q211 SCD2 lookup: the probe join is a KEY equi-join (containment
    // predicates ride it); version-chain windows partition per order
    val q211 = formatted("q211_scd2_lookup")
    assert(!q211.contains("CartesianProduct") &&
      !q211.contains("BroadcastNestedLoopJoin"),
      "q211's probe join must stay the orderkey equi-join:\n" + q211)
    assert(q211.contains("windowspecdefinition(l_orderkey"),
      "q211's version chain must window per order:\n" + q211)
    // q212 ABC: the descending cumulative share rides the bucketed
    // scalableCumSum; the 1-row total broadcasts
    val q212 = formatted("q212_abc_classes")
    assert(q212.contains("windowspecdefinition(_cs_bkt"),
      "q212's cumsum must ride the bucketed scheme:\n" + q212)
    assert(q212.contains("BroadcastExchange"),
      "q212's grand total must broadcast:\n" + q212)
    // q213 clamp: every window partitions per user; no join anywhere
    val q213 = formatted("q213_clamped_balance")
    assert(q213.contains("windowspecdefinition(user_id"),
      "q213's cum/low windows must partition per user:\n" + q213)
    assert(!q213.contains("Join"),
      "q213 is keyed windows + one hash agg — no join:\n" + q213)
  }

  test("round-14 plan shapes: histogram ranks, pair grids, keyed monitors") {
    val d = sf("sf0.001")
    def formatted(name: String): String = {
      val df = graft.Queries.all(name).fn(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    // q219 Spearman: rank/tie windows partition per GROUP — never a
    // corpus-wide spec; sufficient stats end in one hash agg
    val q219 = formatted("q219_spearman")
    assert(q219.contains("windowspecdefinition(nation"),
      "q219's rank windows must partition per group:\n" + q219)
    assert(!q219.contains("CartesianProduct"),
      "q219's orders⨝customer must stay an equi-join:\n" + q219)
    // q220 KS: per-PAIR cumulative windows over the value union; the
    // only non-equi join is the side-cardinality-bounded pair
    // enumeration (broadcast); histogram joins are hash joins
    val q220 = formatted("q220_ks_drift")
    assert(q220.contains("windowspecdefinition(side_a"),
      "q220's ECDF windows must partition per side pair:\n" + q220)
    assert(q220.contains("BroadcastHashJoin"),
      "q220's pair→histogram joins must be hash equi-joins:\n" + q220)
    assert(q220.contains("InMemoryTableScan"),
      "q220 must persist the shared histogram (both pair branches):\n" +
        q220)
    // q222 AUC: the rank2 window partitions per class over the DISTINCT
    // score histogram; AUC itself is one hash agg
    val q222 = formatted("q222_auc_ovr")
    assert(q222.contains("windowspecdefinition(cls"),
      "q222's midrank window must partition per class:\n" + q222)
    // q226 CUSUM: cum/low windows partition per type; the per-type mean
    // broadcasts back onto the daily rows
    val q226 = formatted("q226_cusum")
    assert(q226.contains("windowspecdefinition(event_type"),
      "q226's recurrence windows must partition per type:\n" + q226)
    assert(q226.contains("BroadcastExchange"),
      "q226's per-type means must broadcast:\n" + q226)
    // q228 RRF: both runs are per-query top-k windows; fusion is one
    // hash agg + a per-query rank window — candidate-sized throughout
    val q228 = formatted("q228_rrf_fusion")
    assert(q228.contains("windowspecdefinition(qid"),
      "q228's run and fusion ranks must window per query:\n" + q228)
    assert(!q228.contains("CartesianProduct"),
      "q228's only cross is the broadcast probe side:\n" + q228)
    // q231 zone-map audit: zones are ONE hash agg; the predicate list
    // broadcasts onto zones and rows (non-equi range conditions on a
    // constant-size literal side)
    val q231 = formatted("q231_zonemap_audit")
    assert(q231.contains("BroadcastExchange"),
      "q231's predicate table must broadcast:\n" + q231)
    assert(!q231.contains("CartesianProduct"),
      "q231's range probes must broadcast, never cartesian:\n" + q231)
    // q233 PSI: per-(side, bucket) terms are row-local after broadcast
    // margins; one final hash agg, no window
    val q233 = formatted("q233_psi")
    assert(!q233.contains("windowspecdefinition"),
      "q233 must not window — margins broadcast, one agg:\n" + q233)
    assert(q233.contains("BroadcastExchange"),
      "q233's margins must broadcast onto the grid:\n" + q233)
  }

  test("round-14b plan shapes: bucketed growth sums, agg-only screens, seeded routing") {
    val d = sf("sf0.001")
    def formatted(name: String): String = {
      val df = graft.Queries.all(name).fn(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    // q235 QQ drift: percentile cumsums window per SIDE (the global
    // pass's single window is value-cardinality-bounded by contract)
    val q235 = formatted("q235_qq_drift")
    assert(q235.contains("windowspecdefinition(_s"),
      "q235's per-side percentile windows must partition by side:\n" +
        q235)
    // q238 bot screen: mergeable-only design — ONE hash aggregation,
    // no window, no join
    val q238 = formatted("q238_bot_score")
    assert(!q238.contains("windowspecdefinition") &&
      !q238.contains("Join"),
      "q238 must be one mergeable aggregation:\n" + q238)
    // q239 Heaps fit: BOTH running sums ride the bucketed cumsum —
    // every window partitions on the bucket key, never corpus-wide
    val q239 = formatted("q239_heaps_law")
    assert(q239.contains("windowspecdefinition(_cs_bkt"),
      "q239's prefix sums must ride the bucketed scheme:\n" + q239)
    assert(!q239.contains("windowspecdefinition(doc_id"),
      "q239 must not run a raw corpus-wide window:\n" + q239)
    // q242 IVF maintenance: the seed pick is a distributed TakeOrdered,
    // the argmin assignment windows per VECTOR, seeds broadcast
    val q242 = formatted("q242_ivf_maintenance")
    assert(q242.contains("TakeOrderedAndProject"),
      "q242's md5 seed pick must be TakeOrderedAndProject:\n" + q242)
    assert(q242.contains("windowspecdefinition(_id"),
      "q242's assignment argmin must window per vector:\n" + q242)
    assert(q242.contains("BroadcastExchange"),
      "q242's seed table must broadcast:\n" + q242)
    // q243 readability: row-local text math — no join, no window, no
    // shuffle beyond the scan (one pass, the curation-scan shape)
    val q243 = formatted("q243_readability")
    assert(!q243.contains("windowspecdefinition") &&
      !q243.contains("Join"),
      "q243 must stay a row-local scan:\n" + q243)
  }

  test("round-15 plan shapes: witness traces read caches, modularity stays hash-joined, x55 finisher is windowless") {
    val d = sf("sf0.001")
    def formatted(name: String): String = {
      val df = graft.Queries.all(name).fn(spark, d)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    // the trace queries materialize their loops at construction; the
    // returned plan must be the CONSTANT-DEPTH cache read (lineage
    // truncated — no unrolled per-round subtrees survive downstream).
    // Their only window is the trailing per-round lag/cumsum over R+1
    // rows: round-count-bounded by construction, so an unpartitioned
    // spec there is deliberate, not a scale bug.
    Seq("q244_kcore_converge", "q246_lpa_converge", "q249_semisync_converge")
      .foreach { q =>
        val plan = formatted(q)
        assert(plan.contains("InMemoryTableScan"),
          s"$q must read its persisted trace, not re-derive it:\n" + plan)
        assert(!plan.contains("HashAggregate") || !plan.contains("Parquet"),
          s"$q's downstream plan must not re-scan the corpus:\n" + plan)
      }
    // q245: the frontier histogram aggregates the CACHED traversal
    // (hopDistance hands back a lineage-truncated LogicalRDD — an
    // ExistingRDD scan) — one bounded agg + spine join, never a corpus
    // re-derivation
    val q245 = formatted("q245_bfs_converge")
    assert(q245.contains("Scan ExistingRDD"),
      "q245 must read the cached hopDistance result:\n" + q245)
    assert(!q245.contains("Parquet"),
      "q245's downstream plan must not re-scan the corpus:\n" + q245)
    // modularity: two labels⨝edges hash joins + one endpoint agg; the
    // only non-equi join is the 1×1 stat combine (broadcast, not a
    // CartesianProduct); inputs come from the memoized shared graph
    Seq("q247_lpa_modularity", "q250_semisync_modularity").foreach { q =>
      val plan = formatted(q)
      assert(!plan.contains("CartesianProduct"),
        s"$q's 1×1 combine must broadcast:\n" + plan)
      assert(plan.contains("InMemoryTableScan"),
        s"$q must reuse the memoized graph/label caches:\n" + plan)
    }
    // x55: the post-replay finisher is grid + hash aggs with the
    // reference histogram broadcast — no window anywhere (the stream
    // did the per-day work; the finisher must stay bucket-bounded)
    val x55 = formatted("x55_stream_psi_update")
    assert(!x55.contains("windowspecdefinition"),
      "x55's finisher must be windowless:\n" + x55)
    assert(x55.contains("BroadcastExchange"),
      "x55's reference histogram must broadcast onto the day grid:\n" + x55)
    // q251/q253 pair-lattice estimators: group sizes broadcast onto the
    // md5 gate, and every median window partitions per GROUP — the
    // cap-bounded lattice never rides a corpus-wide spec
    Seq("q251_theil_sen", "q253_hodges_lehmann").foreach { q =>
      val plan = formatted(q)
      assert(plan.contains("BroadcastExchange"),
        s"$q's size table must broadcast onto the gate:\n" + plan)
      assert(plan.contains("windowspecdefinition(nation"),
        s"$q's median windows must partition per group:\n" + plan)
      assert(!plan.contains("CartesianProduct"),
        s"$q's pair join must stay a keyed equi-join:\n" + plan)
    }
    // q252 isotonic: the minimax grid is bins-bounded — its non-equi
    // joins must be broadcast loops over the tiny bin frames, never a
    // partitioned CartesianProduct over data
    val q252 = formatted("q252_isotonic")
    assert(!q252.contains("CartesianProduct"),
      "q252's grid joins must broadcast:\n" + q252)
    assert(q252.contains("BroadcastNestedLoopJoin"),
      "q252's interval grid is a broadcast loop over ≤bins rows:\n" + q252)
  }
}
