package graft.operators

import graft.functions.{HashFns, TextFns, VectorFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data curation.
  *
  * All variants return a *keeper assignment* — one row per input doc,
  * `(id, keep_id)` where `keep_id` is the smallest id in the doc's
  * duplicate group (a doc with no duplicate maps to itself) — so the
  * result composes as a semi-join/filter (`keep_id === id` keeps the
  * survivors) and is never empty.
  *
  * Scale design: nothing here compares all pairs. Candidates come from
  * equality buckets (exact hash, LSH band keys, SimHash bit-chunks), so
  * the shuffles are groupBy/join on bucket keys; per-bucket work is
  * bounded by bucket size. Skewed buckets (a shingle/band shared by
  * millions of docs at 100 TB) should be capped — see `maxBucket`.
  */
object Dedup {

  /** Sketch width of the SQL-mirrored [[simhash]] path: 60 bits, the
    * widest hash reconstructible from an md5 hex prefix in any engine
    * without signed-overflow hazards (15 hex chars). Oracle SQL
    * generators must interpolate THIS constant, not a literal 60. */
  val MirroredSimhashBits: Int = 60

  /** Exact dedup: group identical values of `textCol`, keep min id.
    * One hash-shuffle on the text (Spark aggregates on the full value;
    * at scale pre-hash with xxhash64+md5 pair to shrink shuffle width). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // shuffle a 64-bit hash + the text (hash first keeps sort keys narrow)
    df.select(col(idCol), col(textCol))
      .groupBy(xxhash64(col(textCol)).as("_h"), col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"),
        collect_list(col(idCol)).as("_ids"))
      .select(explode(col("_ids")).as(idCol), col("keep_id"), col("n_copies"))
  }

  /** Exact dedup, SURVIVOR form: one row per distinct text — the
    * smallest id — with the text kept. One hash shuffle and no
    * join-back, unlike [[exact]] (which tags every input row); this is
    * the form a pipeline composes when downstream stages only consume
    * survivors (e.g. the q69 curation composite). */
  def exactSurvivors(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol))
      .groupBy(xxhash64(col(textCol)).as("_h"), col(textCol))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col(textCol))

  /** Generic keeper-assignment from a candidate-pair table.
    * `pairs` must have columns (a, b) with a < b, both ints/longs,
    * containing each confirmed duplicate pair at least once. Each doc is
    * assigned the min partner seen (single-hop union-find: adequate when
    * duplicate groups are cliques or near-cliques, the common case for
    * near-dup detection; chains longer than one hop keep distinct
    * keepers — see [[keeperTransitiveFromPairs]] for the full closure). */
  private[operators] def keeperFromPairs(allIds: DataFrame, idCol: String,
                                         pairs: DataFrame): DataFrame = {
    val minPartner = pairs.select(col("b").as(idCol), col("a").as("_p"))
      .groupBy(col(idCol)).agg(min(col("_p")).as("_keep"))
    allIds.join(minPartner, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("_keep"), col(idCol)).as("keep_id"))
  }

  /** Full transitive-closure keeper (connected components by min
    * label): every doc in a duplicate component maps to the component's
    * smallest id, however long the A~B~C chain. Distributed
    * label propagation — per round, each node adopts the minimum label
    * among itself and its neighbors; rounds run until a fixpoint, which
    * arrives within the duplicate graph's diameter (near-dup chains are
    * short in practice; `maxIters` bounds the pathological case and the
    * method fails loudly rather than return a partial closure, which
    * would silently disagree with a transitive oracle). Each round is
    * one join + one groupBy-min — all shuffles on the node id; the
    * `count` action per round materializes the persisted labels, so
    * lineage never re-runs earlier rounds. */
  def keeperTransitiveFromPairs(allIds: DataFrame, idCol: String,
                                pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val spark = allIds.sparkSession
    // symmetric edges: min labels must flow both directions
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist()
    var labels = allIds.select(col(idCol).as("_node"), col(idCol).as("_lbl"))
    // Per round the labels are materialized to a persisted RDD and the
    // frame is REBUILT over it (LogicalRDD scan). This truncates the
    // Catalyst lineage — without it round k's plan contains TWO copies
    // of round k-1's (union + join both reference `labels`), i.e. 2^k
    // nodes, and every AQE stage update stringifies that plan: the
    // fixpoint loop ends up CPU-bound on explainString, not on data.
    // The RDD handle also gives the round an explicit unpersist, so
    // memory discipline is unchanged.
    var prevRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    // Fixpoint detection WITHOUT a per-round join: per-node labels are
    // non-increasing (each round takes a min), so the total label sum is
    // strictly monotone until convergence — an unchanged sum IS the
    // fixpoint. One scan-aggregate per round (it also materializes the
    // round's RDD), versus the join+count the loop used to pay. The sum
    // is exact decimal(38,0): n ids of up to 2^63 would overflow a LONG
    // sum at cluster scale.
    var prevSum: String = null // decimal rendered to string; null = no round yet
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val viaNeighbor = edges
        .join(labels.select(col("_node").as("b"), col("_lbl")), Seq("b"))
        .select(col("a").as("_node"), col("_lbl"))
      val next0 = labels.union(viaNeighbor)
        .groupBy(col("_node")).agg(min(col("_lbl")).as("_lbl"))
      val nextRdd = next0.rdd
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val next = spark.createDataFrame(nextRdd, next0.schema)
      val curSum = String.valueOf(next
        .agg(sum(col("_lbl").cast("decimal(38,0)")).as("_s"))
        .head.getDecimal(0))
      if (prevRdd != null) prevRdd.unpersist(blocking = false)
      prevRdd = nextRdd
      labels = next
      converged = prevSum != null && prevSum == curSum
      prevSum = curSum
      iters += 1
    }
    edges.unpersist()
    if (!converged) {
      if (prevRdd != null) prevRdd.unpersist(blocking = false)
      throw new IllegalStateException(
        s"keeperTransitiveFromPairs: no fixpoint after $maxIters rounds — " +
          "raise maxIters (duplicate-graph diameter exceeds the bound)")
    }
    // hand the FINAL labels to the tracked-cache registry (Dataset-level
    // persist, released by Caches.release) and free the loop's last RDD
    // once the tracked copy is materialized
    val out = graft.Caches.persist(
      labels.select(col("_node").as(idCol), col("_lbl").as("keep_id")))
    out.count()
    if (prevRdd != null) prevRdd.unpersist(blocking = false)
    out
  }

  /** MinHash + LSH near-dedup over word `k`-shingles.
    *
    * shingle → minhash signature (numBands*rowsPerBand hashes) → band
    * bucket keys → explode → self-join within buckets → verify true
    * Jaccard on the shingle sets with exact integer cross-multiplication
    * (`|A∩B| * denom >= num * |A∪B|` for τ = num/denom) → keeper map.
    *
    * @param maxBucket drop LSH buckets larger than this (stop-shingle
    *   protection: a band key shared by a huge crowd at 100 TB would
    *   produce a quadratic bucket; dropping it loses only pairs that
    *   agree on *no other* band, a standard recall tradeoff).
    * @param sqlMirroredHashes use the md5-prefix element hash and plain
    *   string band keys ([[HashFns.md5Hash]]/[[HashFns.lshBandKeysPlain]])
    *   instead of xxhash64 — every hash in the pipeline is then
    *   reproducible in an external SQL oracle. Default keeps xxhash64
    *   (codegen'd, faster) for the production path.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 3, numBands: Int = 8, rowsPerBand: Int = 4,
                 tauNum: Int = 7, tauDenom: Int = 10,
                 seed: Long = 42L, maxBucket: Int = 1000,
                 sqlMirroredHashes: Boolean = false): DataFrame = {
    graft.functions.NativeFns.register(df.sparkSession)
    val params = HashFns.hashParams(numBands * rowsPerBand, seed)
    // The repartition is a deliberate materialization barrier, not (only)
    // a distribution choice: Catalyst's CollapseProject would otherwise
    // inline the tokenize→shingle expression into every one of the
    // numBands×rowsPerBand hash lambdas (interpreted HOFs don't hoist
    // loop-invariant subtrees), re-splitting the text hundreds of times
    // per row. The exchange turns the shingle set / its hashes into
    // materialized attributes computed exactly once — and spreads
    // single-file scans across the cluster.
    val docs0 = df.select(col(idCol), col(textCol))
      .repartition(col(idCol)) // spread single-file scans before heavy exprs
      .select(col(idCol),
        HashFns.wordShingles(TextFns.wordTokens(col(textCol)), shingleK).as("_sh"))
      .withColumn("_nsh", size(col("_sh")))
    // consumed by the signature path and both verification sides:
    // persist so tokenize+shingle runs once, not 3× (registered in
    // graft.Caches — callers release after consuming results)
    val docsP = graft.Caches.persist(docs0)
    val hashCol =
      if (sqlMirroredHashes) HashFns.shingleHashesWith(col("_sh"), HashFns.md5Hash)
      else HashFns.shingleHashes(col("_sh"))
    val hashed = docsP
      .select(col(idCol), col("_nsh"), hashCol.as("_hs"))
      .repartition(col(idCol))
    val withSig = hashed
      // native expression: one tight loop per row instead of
      // numBands×rowsPerBand interpreted lambdas per shingle
      .withColumn("_sig", graft.functions.NativeFns.minhash(col("_hs"), params))
      .select(col(idCol), col("_sig"))
      .withColumn("_bands",
        if (sqlMirroredHashes) HashFns.lshBandKeysPlain(col("_sig"), numBands, rowsPerBand)
        else HashFns.lshBandKeys(col("_sig"), numBands, rowsPerBand))

    val buckets = withSig
      .select(col(idCol), explode(col("_bands")).as("_bk"))
      .distinct()
    val smallBuckets0 = buckets
      .withColumn("_bsz", count(lit(1)).over(Window.partitionBy(col("_bk"))))
      .where(col("_bsz") <= maxBucket)
    val smallBucketsP = graft.Caches.persist(smallBuckets0) // two self-join sides

    val l = smallBucketsP.select(col("_bk"), col(idCol).as("a"))
    val r = smallBucketsP.select(col("_bk"), col(idCol).as("b"))
    val candidates = l.join(r, Seq("_bk")).where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()

    // verify: true Jaccard over shingle sets
    val da = docsP.select(col(idCol).as("a"), col("_sh").as("_sha"), col("_nsh").as("_na"))
    val db = docsP.select(col(idCol).as("b"), col("_sh").as("_shb"), col("_nsh").as("_nb"))
    val verified = candidates.join(da, "a").join(db, "b")
      .withColumn("_inter", size(array_intersect(col("_sha"), col("_shb"))))
      .where(col("_inter") * tauDenom >=
        lit(tauNum) * (col("_na") + col("_nb") - col("_inter")))
      .select(col("a"), col("b"))

    keeperFromPairs(df.select(col(idCol)), idCol, verified)
  }

  /** SimHash near-dedup: bit-majority sketch over word tokens;
    * candidates via pigeonhole bit-chunks (hamming ≤ chunks-1 ⇒ equal on
    * some chunk), verified with exact hamming distance. The pigeonhole
    * candidate set is EXACT (not a recall tradeoff): with
    * `maxBucket = Int.MaxValue` the result equals a full all-pairs
    * hamming join — which is how the SQL oracle verifies it.
    *
    * @param sqlMirroredHashes hash tokens with the 60-bit md5 prefix
    *   ([[HashFns.md5Hash60]]) and sketch over 60 bits instead of
    *   xxhash64/64 — every bit of the sketch is then reproducible in an
    *   external SQL oracle. Default keeps xxhash64 (codegen'd, faster)
    *   for the production path. 60 must stay divisible by
    *   `maxHamming + 1` chunk count (3 → 4 chunks of 15 bits). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              maxHamming: Int = 3, maxBucket: Int = 1000,
              sqlMirroredHashes: Boolean = false): DataFrame = {
    graft.functions.NativeFns.register(df.sparkSession)
    val chunks = maxHamming + 1
    val bits = if (sqlMirroredHashes) MirroredSimhashBits else 64
    val sketch =
      if (sqlMirroredHashes)
        // md5 per token is codegen'd built-ins; the bit-majority fold is
        // one native pass over the materialized hash array
        graft.functions.NativeFns.simhashFromHashes(
          HashFns.shingleHashesWith(TextFns.wordTokens(col(textCol)),
            HashFns.md5Hash60), bits)
      else
        // native expression: one pass per row vs 64×numTokens
        // interpreted lambda evals in the HOF fold
        graft.functions.NativeFns.simhash(TextFns.wordTokens(col(textCol)))
    val docs = df.select(col(idCol), col(textCol))
      .repartition(col(idCol)) // spread single-file scans before the sketch fold
      .select(col(idCol), sketch.as("_sim"))
    val buckets = docs
      .select(col(idCol), col("_sim"),
        posexplode(HashFns.bitChunks(col("_sim"), chunks, bits)).as(Seq("_ci", "_ck")))
      .withColumn("_bsz", count(lit(1)).over(Window.partitionBy(col("_ci"), col("_ck"))))
      .where(col("_bsz") <= maxBucket)
    // consumed twice by the candidate self-join: persist so the
    // tokenize+sketch+window chain runs once (graft.Caches-registered)
    val bucketsP = graft.Caches.persist(buckets)
    val l = bucketsP.select(col("_ci"), col("_ck"), col(idCol).as("a"), col("_sim").as("_sa"))
    val r = bucketsP.select(col("_ci"), col("_ck"), col(idCol).as("b"), col("_sim").as("_sb"))
    val pairs = l.join(r, Seq("_ci", "_ck")).where(col("a") < col("b"))
      .where(HashFns.hamming64(col("_sa"), col("_sb")) <= maxHamming)
      .select(col("a"), col("b")).distinct()
    keeperFromPairs(df.select(col(idCol)), idCol, pairs)
  }

  /** N-gram Jaccard dedup without sketching: exact pairwise Jaccard over
    * word k-shingles, with candidates generated by sharing at least one
    * shingle (inverted-index join, frequent shingles capped). Exact
    * integer threshold test — mirrors the DuckDB oracle 1:1. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, tauNum: Int = 1, tauDenom: Int = 2,
                   maxPostings: Int = 1000): DataFrame =
    keeperFromPairs(df.select(col(idCol)), idCol,
      ngramJaccardPairs(df, idCol, textCol, shingleK, tauNum, tauDenom, maxPostings))

  /** The confirmed duplicate pairs (a < b) behind [[ngramJaccard]] —
    * exposed so alternative keeper policies (e.g.
    * [[keeperTransitiveFromPairs]]) can run on the same candidates. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 3, tauNum: Int = 1, tauDenom: Int = 2,
                        maxPostings: Int = 1000): DataFrame = {
    // The shingle set feeds the posting-list sides AND both size joins —
    // persist so tokenize+shingle runs once, not 4× (graft.Caches-
    // registered; callers release after consuming results).
    val docs = graft.Caches.persist(df.select(col(idCol), col(textCol))
      .repartition(col(idCol)) // spread single-file scans before shingling
      .select(col(idCol),
        HashFns.wordShingles(TextFns.wordTokens(col(textCol)), shingleK).as("_sh"))
      .withColumn("_nsh", size(col("_sh"))))
    // (the posting list itself is NOT persisted: its two self-join
    // sides are identical subtrees whose window shuffle AQE serves from
    // one exchange — caching the wide exploded strings costs more than
    // the reuse saves)
    val postings = docs.select(col(idCol), explode(col("_sh")).as("_g"))
      .withColumn("_pf", count(lit(1)).over(Window.partitionBy(col("_g"))))
      .where(col("_pf") <= maxPostings)
    val inter = postings.select(col("_g"), col(idCol).as("a"))
      .join(postings.select(col("_g"), col(idCol).as("b")), Seq("_g"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("_inter"))
    val sizes = docs.select(col(idCol), col("_nsh"))
    inter
      .join(sizes.select(col(idCol).as("a"), col("_nsh").as("_na")), "a")
      .join(sizes.select(col(idCol).as("b"), col("_nsh").as("_nb")), "b")
      .where(col("_inter") * tauDenom >=
        lit(tauNum) * (col("_na") + col("_nb") - col("_inter")))
      .select(col("a"), col("b"))
  }

  /** MOSS-winnowing near-dup (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * positional k-gram hashes → sliding-window minima
    * ([[graft.functions.HashFns.winnow]]) → distinct fingerprints →
    * inverted-index pairing on shared fingerprints (≥ `minShared`) →
    * min-partner keeper. CONTIGUOUS-RUN sensitive — any shared token
    * run of ≥ w+k-1 tokens attests at least one shared fingerprint —
    * where bag-of-ngram Jaccard dilutes a long local overlap by global
    * document size; this is the detector for copy-pasted passages
    * inside otherwise-different documents. The posting shuffle carries
    * (fingerprint long, id) only, never text; `maxPostings` caps hot
    * fingerprints exactly like [[ngramJaccardPairs]]'s inverted index.
    * With `sqlMirroredHashes` the whole pipeline is SQL-mirrorable
    * (q73's oracle). */
  def winnowOverlap(df: DataFrame, idCol: String, textCol: String,
                    shingleK: Int = 3, w: Int = 4, minShared: Int = 2,
                    maxPostings: Int = 1000,
                    sqlMirroredHashes: Boolean = false): DataFrame = {
    val elem: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (sqlMirroredHashes) HashFns.md5Hash
      else s => pmod(xxhash64(s), lit(HashFns.MersennePrime))
    // fingerprints are row-local; persist them (not the exploded
    // postings) so tokenize+shingle+hash+winnow runs once, not per
    // posting-join side (graft.Caches-registered)
    val docs = graft.Caches.persist(df.select(col(idCol), col(textCol))
      .repartition(col(idCol)) // spread single-file scans before hashing
      .select(col(idCol),
        HashFns.winnow(
          HashFns.shingleHashesWith(
            HashFns.wordShingleSeq(TextFns.wordTokens(col(textCol)), shingleK),
            elem),
          w).as("_fp")))
    val postings = docs.select(col(idCol), explode(col("_fp")).as("_f"))
      .withColumn("_pf", count(lit(1)).over(Window.partitionBy(col("_f"))))
      .where(col("_pf") <= maxPostings)
    val pairs = postings.select(col("_f"), col(idCol).as("a"))
      .join(postings.select(col("_f"), col(idCol).as("b")), Seq("_f"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("_shared"))
      .where(col("_shared") >= minShared)
      .select(col("a"), col("b"))
    keeperFromPairs(df.select(col(idCol)), idCol, pairs)
  }

  /** Exact all-pairs embedding cosine dedup — the oracle-verifiable
    * baseline for [[embeddingCosine]]: every pair is scored, so recall
    * is 1 by construction. O(n²) dot products; right answer at
    * moderate n (the corpus side is broadcast, the pair loop is a
    * nested-loop join that never shuffles), while [[embeddingCosine]]
    * is the 100 TB path. Both compute the same normalize-then-dot in
    * left-to-right double precision, so thresholds agree bit-for-bit
    * with a SQL oracle mirroring that order. */
  def embeddingCosineExact(df: DataFrame, idCol: String, vecCol: String,
                           tau: Double = 0.95): DataFrame = {
    graft.functions.NativeFns.register(df.sparkSession)
    // the repartition is a materialization barrier: without it
    // CollapseProject inlines the l2-normalize HOF into the per-pair
    // join predicate, re-normalizing both vectors once per PAIR (n²
    // interpreted HOF evals) instead of once per row
    val normed = graft.Caches.persist( // both pair sides: normalize once
      df.select(col(idCol), VectorFns.l2Normalize(col(vecCol)).as("_nv"))
        .repartition(col(idCol)))
    val a = normed.select(col(idCol).as("a"), col("_nv").as("_na"))
    val b = normed.select(col(idCol).as("b"), col("_nv").as("_nb"))
    val pairs = a.join(broadcast(b), col("a") < col("b"))
      .where(graft.functions.NativeFns.dot(col("_na"), col("_nb")) >= tau)
      .select(col("a"), col("b"))
    keeperFromPairs(df.select(col(idCol)), idCol, pairs)
  }

  /** Embedding cosine near-dedup: candidates from random-hyperplane LSH
    * (sign-bit sketch of the embedding, bit-chunk buckets), verified
    * with exact cosine ≥ tau. Brute-force-free at scale; recall is
    * tunable via `planes`/`chunks`. */
  def embeddingCosine(df: DataFrame, idCol: String, vecCol: String,
                      tau: Double = 0.95, planes: Int = 16,
                      seed: Long = 7L, maxBucket: Int = 2000): DataFrame = {
    import graft.functions.{ExprUtils, NativeFns}
    NativeFns.register(df.sparkSession)
    val rnd = new scala.util.Random(seed)
    // L2-normalize ONCE (verification then needs only a dot product, a
    // single interpreted pass instead of cosine's three)
    // the dim probe, the sketch path, and both verification sides all
    // read this: persist so l2-normalize runs once, not 5×
    val normed = graft.Caches.persist(df.select(col(idCol), col(vecCol))
      .repartition(col(idCol))
      .select(col(idCol), VectorFns.l2Normalize(col(vecCol)).as("_nv")))
    // sign sketch: bit i = dot(v, plane_i) > 0; the normalized vector is
    // lambda-bound so it is computed once, not once per hyperplane
    def sketchOf(v: org.apache.spark.sql.Column, dim: Int) = {
      val hyperplanes = Seq.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
      ExprUtils.bind(v) { nv =>
        val sk = hyperplanes.zipWithIndex.map { case (p, i) =>
          when(NativeFns.dot(nv, array(p.toIndexedSeq.map(lit): _*)) > 0,
            call_function("shiftleft", lit(1L), lit(i))).otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b))
        // fail fast on width mismatch: a silent NULL dot would zero every
        // sketch bit and collapse all docs into one (dropped) bucket
        when(size(nv) === dim, sk).otherwise(raise_error(concat(
          lit(s"embeddingCosine: expected $vecCol width $dim, got "),
          size(nv).cast("string"))))
      }
    }
    // derive the hyperplane dimensionality from the data (one tiny job);
    // embedding width is a property of the table, not a config constant
    val dimRow = normed.where(col("_nv").isNotNull && size(col("_nv")) > 0)
      .select(size(col("_nv"))).limit(1).collect()
    require(dimRow.nonEmpty, s"embeddingCosine: no non-empty vectors in $vecCol")
    val dim = dimRow.head.getInt(0)
    val docs = normed.select(col(idCol), col("_nv"), sketchOf(col("_nv"), dim).as("_sk"))

    val chunks = 2 // 2×(planes/2)-bit chunk keys: candidates must agree on half the sketch
    val buckets = docs
      .select(col(idCol),
        posexplode(HashFns.bitChunks(col("_sk"), chunks, planes)).as(Seq("_ci", "_ck")))
      .withColumn("_bsz", count(lit(1)).over(Window.partitionBy(col("_ci"), col("_ck"))))
      .where(col("_bsz") <= maxBucket)
    val bucketsP = graft.Caches.persist(buckets) // two self-join sides
    val l = bucketsP.select(col("_ci"), col("_ck"), col(idCol).as("a"))
    val r = bucketsP.select(col("_ci"), col("_ck"), col(idCol).as("b"))
    // distinct on bare id pairs BEFORE re-attaching vectors: the shuffle
    // carries 16 bytes per candidate, not two embedding payloads
    val candidates = l.join(r, Seq("_ci", "_ck")).where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val da = normed.select(col(idCol).as("a"), col("_nv").as("_na"))
    val db = normed.select(col(idCol).as("b"), col("_nv").as("_nb"))
    val pairs = candidates.join(da, "a").join(db, "b")
      .where(graft.functions.NativeFns.dot(col("_na"), col("_nb")) >= tau)
      .select(col("a"), col("b"))
    keeperFromPairs(df.select(col(idCol)), idCol, pairs)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): near-duplicate pruning scoped WITHIN a
    * precomputed semantic cell — `bucketCol` names the cell (a KMeans
    * cluster id in the paper; any content-derived partition works).
    * Candidate pairs are cell-local, so pair cost is Σ|cell|² instead
    * of n², and missing cross-cell near-dups is the paper's own
    * documented recall trade. Pairs with cosine ≥ `tau` collapse to
    * the min-id keeper ([[keeperFromPairs]] contract, like
    * [[embeddingCosineExact]]).
    *
    * Scale shape: one l2-normalize pass, bare `(cell, id)` rows through
    * the self-join (embeddings re-attach per confirmed candidate, the
    * [[embeddingCosine]] discipline), `maxBucket` caps pathological
    * cells — a degenerate centroid that swallows 1% of a 100 TB corpus
    * must not submit a quadratic cell. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    bucketCol: String, tau: Double,
                    maxBucket: Int = 10000): DataFrame = {
    graft.functions.NativeFns.register(df.sparkSession)
    val normed = graft.Caches.persist( // id→vec side of both re-attaches
      df.select(col(idCol), col(bucketCol),
          VectorFns.l2Normalize(col(vecCol)).as("_nv"))
        .repartition(col(idCol)))
    val cells = normed.select(col(bucketCol).as("_bk"), col(idCol))
      .withColumn("_bsz", count(lit(1)).over(Window.partitionBy(col("_bk"))))
      .where(col("_bsz") <= maxBucket)
    val cellsP = graft.Caches.persist(cells) // two self-join sides
    val candidates = cellsP.select(col("_bk"), col(idCol).as("a"))
      .join(cellsP.select(col("_bk"), col(idCol).as("b")), Seq("_bk"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"))
    val da = normed.select(col(idCol).as("a"), col("_nv").as("_na"))
    val db = normed.select(col(idCol).as("b"), col("_nv").as("_nb"))
    val pairs = candidates.join(da, "a").join(db, "b")
      .where(graft.functions.NativeFns.dot(col("_na"), col("_nb")) >= tau)
      .select(col("a"), col("b"))
    keeperFromPairs(df.select(col(idCol)), idCol, pairs)
  }

}
