package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-side Barnes–Hut t-SNE with the cosine metric — the true
  * neighborhood-preserving projection behind every map in the
  * reference's Dash app (`ihop/visualizations.py:80-115`: sklearn
  * `TSNE(init="pca", metric="cosine", random_state=77)` over the
  * model's normed vectors). [[Projection.pca2d]] remains the
  * distributed default (SURVEY.md §7.4.3); this closes the visible
  * output-divergence gap for vocab-sized inputs — the same regime the
  * reference runs in (sklearn is equally driver-sized; a 10k × 150
  * vocabulary is the design point, 100 TB corpora project per-key
  * AFTER aggregation, never row-per-document).
  *
  * Algorithm (van der Maaten 2014, "Accelerating t-SNE using
  * Tree-Based Algorithms"): exact k-NN input affinities calibrated to
  * the target perplexity by per-point binary search, sparse symmetric
  * P, PCA initialization (deterministic — no RNG in the whole path;
  * `seed` only breaks exact input ties), early exaggeration, then
  * gradient descent where repulsive forces come from a quadtree with
  * the θ far-field criterion — O(n·k) attractive + O(n log n)
  * repulsive per iteration instead of O(n²).
  *
  * Determinism: every loop is either sequential or an index-parallel
  * map writing disjoint slots (no reduction-order dependence), so a
  * given (input order, config) always yields the identical embedding.
  */
object Tsne {

  /** Defaults mirror sklearn's (perplexity 30, θ 0.5, 1000 iters, 250
    * early-exaggeration iters at 12×, "auto" learning rate
    * max(n/48, 50)) and the reference's fixed `random_state=77`. */
  final case class Config(perplexity: Double = 30.0,
                          theta: Double = 0.5,
                          maxIter: Int = 1000,
                          earlyExagIter: Int = 250,
                          earlyExag: Double = 12.0,
                          learningRate: Double = 0.0, // <= 0 → auto
                          seed: Long = 77L)

  /** Project a (key, vector) table: collect (vocab-sized by contract),
    * fit, return `(key, tsne_1, tsne_2)` — the reference's
    * `generate_tsne_dataframe` schema. Rows are collected in key order
    * so the fit is reproducible regardless of upstream partitioning. */
  /** Driver-size ceiling: t-SNE is O(n²) in the k-NN stage and holds
    * n·k affinities in heap — beyond this, project per-key AFTER
    * aggregation (the reference's own regime) or use the distributed
    * [[Projection.pca2d]]. Fail loudly instead of OOMing the driver. */
  val MaxPoints: Int = 50000

  def project(df: DataFrame, keyCol: String, vecCol: String,
              cfg: Config = Config()): DataFrame = {
    val spark = df.sparkSession
    val n = df.count()
    require(n <= MaxPoints,
      s"Tsne.project: $n rows exceeds the driver-sized ceiling $MaxPoints — " +
        "t-SNE is a vocab-scale visualization (aggregate first), not a " +
        "row-per-document operator; use Projection.pca2d for distributed 2-D")
    // Order by the ORIGINAL-typed key (numeric keys sort numerically,
    // not lexicographically) with the vector as tiebreaker, so
    // duplicate keys still get a partition-independent total order; the
    // output key column keeps the input type.
    val sel = df.select(col(keyCol).as("_k"),
        graft.functions.VectorFns.toDoubles(col(vecCol)).as("_v"))
      .orderBy(col("_k"), col("_v"))
    val rows = sel.collect()
    val y = fitTransform(rows.map(_.getSeq[Double](1).toArray), cfg)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      sel.schema.head.copy(name = keyCol),
      org.apache.spark.sql.types.StructField("tsne_1",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("tsne_2",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val outRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(rows.indices.map(i =>
        org.apache.spark.sql.Row(rows(i).get(0), y(i)(0), y(i)(1))): _*)
    spark.createDataFrame(outRows, outSchema)
  }

  /** The reference's CSV artifact (`visualizations.py:118-131`). */
  def projectToCsv(df: DataFrame, keyCol: String, vecCol: String,
                   dir: String, cfg: Config = Config()): Unit =
    graft.sources.Writers.singleCsv(project(df, keyCol, vecCol, cfg), dir)

  /** Fit n×2 coordinates for n input vectors (cosine metric). */
  def fitTransform(x: Array[Array[Double]], cfg: Config = Config()): Array[Array[Double]] = {
    val n = x.length
    require(n >= 4, s"tsne: need at least 4 points, got $n")
    require(x(0).length >= 2,
      s"tsne: input vectors need >= 2 dimensions for the 2-D PCA init, " +
        s"got ${x(0).length}")
    val k = math.min(n - 1, math.max(1, (3 * cfg.perplexity).toInt))

    // --- cosine distances to the k nearest neighbors of each point ---
    val unit = x.map { v =>
      val nrm = math.sqrt(v.map(a => a * a).sum)
      if (nrm == 0) v.clone() else v.map(_ / nrm)
    }
    val nbrIdx = Array.ofDim[Int](n, k)
    // RAW cosine distance: sklearn squares k-NN distances only for the
    // euclidean metric (_joint_probabilities gets metric distances
    // as-is for metric="cosine"), so calibration uses 1 - cos directly
    val nbrD = Array.ofDim[Double](n, k)
    parallelFor(n) { i =>
      val cand = new Array[(Double, Int)](n - 1)
      var c = 0
      var j = 0
      while (j < n) {
        if (j != i) {
          var s = 0.0; var t = 0
          val ui = unit(i); val uj = unit(j)
          while (t < ui.length) { s += ui(t) * uj(t); t += 1 }
          cand(c) = (1.0 - s, j); c += 1
        }
        j += 1
      }
      // deterministic total order: distance, then index
      val sorted = cand.sortBy(p => (p._1, p._2))
      var m = 0
      while (m < k) {
        nbrIdx(i)(m) = sorted(m)._2
        nbrD(i)(m) = sorted(m)._1
        m += 1
      }
    }

    // --- per-point precision by binary search to the target entropy ---
    val logPerp = math.log(cfg.perplexity)
    val condP = Array.ofDim[Double](n, k)
    parallelFor(n) { i =>
      var betaMin = Double.NegativeInfinity
      var betaMax = Double.PositiveInfinity
      var beta = 1.0
      var iter = 0
      while (iter < 50) {
        var sum = 0.0; var m = 0
        while (m < k) { condP(i)(m) = math.exp(-beta * nbrD(i)(m)); sum += condP(i)(m); m += 1 }
        if (sum == 0) sum = Double.MinPositiveValue
        var entropy = 0.0
        m = 0
        while (m < k) {
          val p = condP(i)(m) / sum
          if (p > 1e-12) entropy -= p * math.log(p)
          m += 1
        }
        val diff = entropy - logPerp
        if (math.abs(diff) < 1e-5) iter = 50
        else {
          if (diff > 0) { betaMin = beta
            beta = if (betaMax.isInfinite) beta * 2 else (beta + betaMax) / 2 }
          else { betaMax = beta
            beta = if (betaMin.isInfinite) beta / 2 else (beta + betaMin) / 2 }
          iter += 1
        }
      }
      var sum = 0.0; var m = 0
      while (m < k) { sum += condP(i)(m); m += 1 }
      if (sum == 0) sum = Double.MinPositiveValue
      m = 0
      while (m < k) { condP(i)(m) /= sum; m += 1 }
    }

    // --- symmetrize into sparse row-major P (union of neighborhoods) ---
    val pMap = Array.fill(n)(new java.util.TreeMap[Integer, java.lang.Double]())
    for (i <- 0 until n; m <- 0 until k) {
      val j = nbrIdx(i)(m); val v = condP(i)(m) / (2.0 * n)
      pMap(i).merge(j, v, (a, b) => a + b)
      pMap(j).merge(i, v, (a, b) => a + b)
    }
    val pCols = pMap.map(_.keySet().toArray(Array.empty[Integer]).map(_.intValue))
    val pVals = pMap.map(_.values().toArray(Array.empty[java.lang.Double]).map(_.doubleValue))

    // --- PCA init (sklearn: scaled so std(col 0) = 1e-4) ---
    val y = pcaInit2d(x)
    val std0 = {
      val c0 = y.map(_(0))
      val mu = c0.sum / n
      math.sqrt(c0.map(v => (v - mu) * (v - mu)).sum / n)
    }
    val scale = if (std0 > 0) 1e-4 / std0 else 1.0
    y.foreach { r => r(0) *= scale; r(1) *= scale }

    // --- gradient descent with momentum + gains ---
    val eta = if (cfg.learningRate > 0) cfg.learningRate
              else math.max(n / (cfg.earlyExag * 4.0), 50.0)
    val inc = Array.ofDim[Double](n, 2)
    val gains = Array.fill(n, 2)(1.0)
    val grad = Array.ofDim[Double](n, 2)
    var it = 0
    while (it < cfg.maxIter) {
      val exag = if (it < cfg.earlyExagIter) cfg.earlyExag else 1.0
      val momentum = if (it < cfg.earlyExagIter) 0.5 else 0.8
      computeGradient(y, pCols, pVals, exag, cfg.theta, grad)
      var i = 0
      while (i < n) {
        var d = 0
        while (d < 2) {
          val g = grad(i)(d)
          gains(i)(d) =
            if (math.signum(g) != math.signum(inc(i)(d))) gains(i)(d) + 0.2
            else math.max(gains(i)(d) * 0.8, 0.01)
          inc(i)(d) = momentum * inc(i)(d) - eta * gains(i)(d) * g
          y(i)(d) += inc(i)(d)
          d += 1
        }
        i += 1
      }
      // recenter (t-SNE is translation-invariant; keeps coords bounded)
      var mx = 0.0; var my = 0.0
      i = 0
      while (i < n) { mx += y(i)(0); my += y(i)(1); i += 1 }
      mx /= n; my /= n
      i = 0
      while (i < n) { y(i)(0) -= mx; y(i)(1) -= my; i += 1 }
      it += 1
    }
    y
  }

  /** KL gradient: attractive term over sparse P, repulsive term via a
    * quadtree with the θ far-field criterion (Barnes–Hut). */
  private def computeGradient(y: Array[Array[Double]],
                              pCols: Array[Array[Int]], pVals: Array[Array[Double]],
                              exag: Double, theta: Double,
                              grad: Array[Array[Double]]): Unit = {
    val n = y.length
    val tree = QuadTree.build(y)
    val rep = Array.ofDim[Double](n, 2)
    val zParts = new Array[Double](n)
    parallelFor(n) { i =>
      zParts(i) = tree.repulsion(y(i)(0), y(i)(1), theta, rep(i))
    }
    val z = math.max(zParts.sum, Double.MinPositiveValue)
    parallelFor(n) { i =>
      var ax = 0.0; var ay = 0.0
      val cols = pCols(i); val vals = pVals(i)
      var m = 0
      while (m < cols.length) {
        val j = cols(m)
        val dx = y(i)(0) - y(j)(0); val dy = y(i)(1) - y(j)(1)
        val q = 1.0 / (1.0 + dx * dx + dy * dy)
        ax += vals(m) * q * dx
        ay += vals(m) * q * dy
        m += 1
      }
      grad(i)(0) = 4.0 * (exag * ax - rep(i)(0) / z)
      grad(i)(1) = 4.0 * (exag * ay - rep(i)(1) / z)
    }
  }

  /** Top-2 PCA of the raw vectors, driver-side (deterministic sign:
    * largest-|entry| coordinate of each component is positive). */
  private def pcaInit2d(x: Array[Array[Double]]): Array[Array[Double]] = {
    val n = x.length; val d = x(0).length
    val mu = new Array[Double](d)
    x.foreach { r => var i = 0; while (i < d) { mu(i) += r(i); i += 1 } }
    var i = 0
    while (i < d) { mu(i) /= n; i += 1 }
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    x.foreach { r =>
      var a = 0
      while (a < d) {
        val ca = r(a) - mu(a)
        var b = a
        while (b < d) { cov(a, b) += ca * (r(b) - mu(b)); cov(b, a) = cov(a, b); b += 1 }
        a += 1
      }
    }
    cov :/= math.max(n - 1, 1).toDouble
    val es = breeze.linalg.eigSym(cov)
    def comp(rank: Int): Array[Double] = {
      val v = es.eigenvectors(::, d - 1 - rank).toArray
      val m = v.indices.maxBy(idx => math.abs(v(idx)))
      if (v(m) < 0) v.map(-_) else v
    }
    val p1 = comp(0); val p2 = comp(1)
    x.map { r =>
      var c1 = 0.0; var c2 = 0.0; var t = 0
      while (t < d) { val c = r(t) - mu(t); c1 += c * p1(t); c2 += c * p2(t); t += 1 }
      Array(c1, c2)
    }
  }

  /** Index-parallel loop with disjoint output slots — deterministic
    * (no cross-index reduction), uses the common ForkJoin pool. */
  private def parallelFor(n: Int)(body: Int => Unit): Unit =
    java.util.stream.IntStream.range(0, n).parallel().forEach(i => body(i))

  /** Quadtree over 2-D points with center-of-mass summaries. */
  private final class QuadTree(minX: Double, minY: Double, size: Double) {
    private var count = 0
    private var comX = 0.0
    private var comY = 0.0
    private var pointX = 0.0
    private var pointY = 0.0
    private var children: Array[QuadTree] = _

    def insert(px: Double, py: Double): Unit = {
      if (count == 0) { pointX = px; pointY = py }
      else {
        if (children == null) {
          // split: push the resident point down (coincident points stack
          // in the same leaf via the recursion cutoff below)
          if (size < 1e-12) { /* coincident cluster: keep aggregated */ }
          else {
            children = spawn()
            childFor(pointX, pointY).insert(pointX, pointY)
          }
        }
        if (children != null) childFor(px, py).insert(px, py)
      }
      comX = (comX * count + px) / (count + 1)
      comY = (comY * count + py) / (count + 1)
      count += 1
    }

    private def spawn(): Array[QuadTree] = {
      val h = size / 2
      Array(new QuadTree(minX, minY, h), new QuadTree(minX + h, minY, h),
        new QuadTree(minX, minY + h, h), new QuadTree(minX + h, minY + h, h))
    }

    private def childFor(px: Double, py: Double): QuadTree = {
      val h = size / 2
      val ix = if (px >= minX + h) 1 else 0
      val iy = if (py >= minY + h) 1 else 0
      children(iy * 2 + ix)
    }

    /** Accumulate the (unnormalized) repulsive force on (px, py) into
      * `out`; returns this subtree's contribution to Z. */
    def repulsion(px: Double, py: Double, theta: Double,
                  out: Array[Double]): Double = {
      if (count == 0) return 0.0
      val dx = px - comX; val dy = py - comY
      val d2 = dx * dx + dy * dy
      val isSelfOnly = count == 1 && d2 == 0.0
      if (isSelfOnly) return 0.0
      if (children == null || size * size < theta * theta * d2) {
        // far-field (or leaf): treat as `count` points at the c.o.m.;
        // a leaf stacking coincident points contributes d2=0 → q=1
        val q = 1.0 / (1.0 + d2)
        val effCount = if (d2 == 0.0) count - 1 else count // exclude self
        out(0) += effCount * q * q * dx
        out(1) += effCount * q * q * dy
        effCount * q
      } else {
        var z = 0.0
        var c = 0
        while (c < 4) { z += children(c).repulsion(px, py, theta, out); c += 1 }
        z
      }
    }
  }

  private object QuadTree {
    def build(y: Array[Array[Double]]): QuadTree = {
      var minX = Double.MaxValue; var minY = Double.MaxValue
      var maxX = Double.MinValue; var maxY = Double.MinValue
      y.foreach { p =>
        if (p(0) < minX) minX = p(0); if (p(0) > maxX) maxX = p(0)
        if (p(1) < minY) minY = p(1); if (p(1) > maxY) maxY = p(1)
      }
      val size = math.max(maxX - minX, maxY - minY) max 1e-12
      val t = new QuadTree(minX, minY, size * (1 + 1e-9))
      y.foreach(p => t.insert(p(0), p(1)))
      t
    }
  }
}
