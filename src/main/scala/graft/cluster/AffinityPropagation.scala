package graft.cluster

/** Affinity propagation (Frey & Dueck 2007) — the last cell of the
  * reference's clustering-model factory
  * (`ihop/clustering.py:353-447`: sklearn `AffinityPropagation` with
  * `affinity="precomputed"`, `max_iter=1000`, `convergence_iter=50`).
  *
  * Driver-side over a precomputed similarity matrix, exactly like the
  * reference (sklearn is equally in-memory; the input is the vocab-
  * sized embedding table, never row-per-document data).
  *
  * Semantics note (deliberate divergence, documented): the reference
  * factory feeds gensim COSINE DISTANCES straight into sklearn's
  * `precomputed` slot (`clustering.py:424-430`), which expects
  * SIMILARITIES — maximizing raw distances would seat exemplars at the
  * farthest points. This implementation takes similarities as the
  * standard algorithm defines them; [[negCosineDistances]] builds the
  * conventional `-(1 - cos)` matrix from points. Everything else
  * mirrors sklearn: median-of-S default preference, 0.5 damping,
  * exemplar-stability convergence, and the final two-pass cluster
  * refinement.
  */
object AffinityPropagation {

  final case class Config(damping: Double = 0.5,
                          maxIter: Int = 1000,
                          convergenceIter: Int = 50,
                          preference: Option[Double] = None) {
    require(damping >= 0.5 && damping < 1.0, "damping must be in [0.5, 1)")
  }

  final case class Result(labels: Array[Int], exemplars: Array[Int],
                          iterations: Int, converged: Boolean)

  /** Conventional similarity matrix from points: `-(1 - cosine)`. */
  def negCosineDistances(points: Array[Array[Double]]): Array[Array[Double]] = {
    val unit = points.map { v =>
      val n = math.sqrt(v.map(a => a * a).sum)
      if (n == 0) v.clone() else v.map(_ / n)
    }
    Array.tabulate(points.length, points.length) { (i, j) =>
      var s = 0.0; var t = 0
      while (t < unit(i).length) { s += unit(i)(t) * unit(j)(t); t += 1 }
      -(1.0 - s)
    }
  }

  /** Cluster points by cosine affinity. */
  def fitPredictPoints(points: Array[Array[Double]],
                       cfg: Config = Config()): Result =
    fitPredict(negCosineDistances(points), cfg)

  /** Driver-size ceiling: three n×n double matrices ≈ 24·n² bytes
    * (20k → ~10 GB). Affinity propagation is a vocab-scale algorithm
    * (sklearn's is equally in-memory); fail loudly instead of OOMing. */
  val MaxPoints: Int = 20000

  /** Cluster a precomputed similarity matrix (higher = more similar). */
  def fitPredict(similarity: Array[Array[Double]],
                 cfg: Config = Config()): Result = {
    val n = similarity.length
    require(n >= 2, s"affinity propagation: need at least 2 points, got $n")
    require(n <= MaxPoints,
      s"affinity propagation: $n points exceeds the driver-sized ceiling " +
        s"$MaxPoints (three n×n matrices); cluster aggregates, not rows")
    require(similarity.forall(_.length == n), "similarity matrix must be square")

    // preference (self-similarity): sklearn default = median of S
    val pref = cfg.preference.getOrElse(median(similarity.flatten))
    // deterministic tie-break jitter — sklearn adds seeded noise here
    // for the same reason (exactly symmetric inputs otherwise never
    // elect an exemplar: the indicator r+a sits at 0 forever); ours is
    // a splitmix64 hash of (i,j), so reruns are bit-identical
    def jitter(i: Int, j: Int, v: Double): Double = {
      var z = i.toLong * n + j + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= z >>> 31
      val g = (z >>> 11).toDouble / (1L << 53).toDouble * 2 - 1 // [-1, 1)
      (2.220446049250313e-16 * math.abs(v) + 1e-100) * g
    }
    // flat row-major matrices: the message-passing loops are pure
    // memory sweeps, and 1-D indexing keeps them in-cache (the nested
    // Array[Array[_]] form measured ~10× slower on a 500-point corpus)
    val s = new Array[Double](n * n)
    var ii = 0
    while (ii < n) {
      var jj = 0
      while (jj < n) {
        val v = if (ii == jj) pref else similarity(ii)(jj)
        s(ii * n + jj) = v + jitter(ii, jj, v)
        jj += 1
      }
      ii += 1
    }

    val r = new Array[Double](n * n) // responsibilities
    val a = new Array[Double](n * n) // availabilities
    val colSumPos = new Array[Double](n)
    val lastE = new Array[Boolean](n)
    val damp = cfg.damping; val keep = 1 - cfg.damping
    var stable = 0
    var it = 0
    var converged = false
    while (it < cfg.maxIter && !converged) {
      // responsibilities: r(i,k) = s(i,k) - max_{k'≠k} (a(i,k') + s(i,k'))
      var i = 0
      while (i < n) {
        val row = i * n
        var max1 = Double.NegativeInfinity; var max2 = Double.NegativeInfinity
        var argmax1 = -1
        var k = 0
        while (k < n) {
          val v = a(row + k) + s(row + k)
          if (v > max1) { max2 = max1; max1 = v; argmax1 = k }
          else if (v > max2) max2 = v
          k += 1
        }
        k = 0
        while (k < n) {
          val excl = if (k == argmax1) max2 else max1
          r(row + k) = damp * r(row + k) + keep * (s(row + k) - excl)
          k += 1
        }
        i += 1
      }
      // availabilities: a(i,k) = min(0, r(k,k) + Σ_{i'∉{i,k}} max(0, r(i',k)))
      //                 a(k,k) = Σ_{i'≠k} max(0, r(i',k)); computed from
      // per-column positive sums accumulated in one row-major sweep
      java.util.Arrays.fill(colSumPos, 0.0)
      i = 0
      while (i < n) {
        val row = i * n
        var k = 0
        while (k < n) {
          if (i != k) {
            val v = r(row + k)
            if (v > 0) colSumPos(k) += v
          }
          k += 1
        }
        i += 1
      }
      i = 0
      while (i < n) {
        val row = i * n
        var k = 0
        while (k < n) {
          val raw =
            if (i == k) colSumPos(k)
            else {
              val own = r(row + k)
              math.min(0.0, r(k * n + k) + colSumPos(k) -
                (if (own > 0) own else 0.0))
            }
          a(row + k) = damp * a(row + k) + keep * raw
          k += 1
        }
        i += 1
      }
      // convergence: exemplar indicator stable for convergenceIter rounds
      var changed = false
      var anyExemplar = false
      i = 0
      while (i < n) {
        val e = r(i * n + i) + a(i * n + i) > 0
        if (e != lastE(i)) { changed = true; lastE(i) = e }
        anyExemplar ||= e
        i += 1
      }
      stable = if (changed) 0 else stable + 1
      converged = anyExemplar && stable >= cfg.convergenceIter
      it += 1
    }

    // exemplars + sklearn's final refinement: reseat each cluster's
    // exemplar at the member maximizing intra-cluster similarity, then
    // re-assign
    var exemplars = (0 until n).filter(i => r(i * n + i) + a(i * n + i) > 0).toArray
    if (exemplars.isEmpty) exemplars = Array((0 until n).maxBy(i => s(i * n + i)))
    def assign(ex: Array[Int]): Array[Int] = {
      val exSet = ex.zipWithIndex.toMap
      Array.tabulate(n) { i =>
        exSet.getOrElse(i, {
          var best = 0; var bestV = Double.NegativeInfinity
          var c = 0
          while (c < ex.length) {
            val v = s(i * n + ex(c))
            if (v > bestV) { bestV = v; best = c }
            c += 1
          }
          best
        })
      }
    }
    val first = assign(exemplars)
    val refined = exemplars.indices.map { c =>
      val members = (0 until n).filter(first(_) == c)
      members.maxBy(m => (members.map(o => s(o * n + m)).sum, -m))
    }.toArray
    val labels = assign(refined)
    Result(labels, refined, it, converged)
  }

  private def median(xs: Array[Double]): Double = {
    val sorted = xs.sorted
    val n = sorted.length
    if (n % 2 == 1) sorted(n / 2) else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
  }
}
