package graft.cluster

/** Average-linkage agglomerative clustering over cosine distances
  * (SURVEY.md §2.10 X6; reference uses sklearn
  * `AgglomerativeClustering(n_clusters=250, linkage="average",
  * affinity="cosine")`, `ihop/clustering.py:353-447`).
  *
  * No Spark ML equivalent exists; like the reference, this runs on the
  * driver over the collected embedding matrix — valid because the input
  * is a vocabulary-sized table (~10k × 100 floats), never the corpus.
  * O(n² log n) with a lazily-invalidated distance heap.
  *
  * AffinityPropagation (reference factory option, never used by the
  * DVC pipeline) is intentionally unsupported — call sites get a clear
  * error instead of a silent fallback (SURVEY.md §7.4.2).
  */
object Agglomerative {

  /** Cosine distance between rows after L2 normalization. */
  private def cosineDistance(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
  }

  /** Cluster `points` into `k` clusters; returns the cluster id per
    * input row (ids are 0..k-1 in order of first member appearance). */
  def fitPredict(points: Array[Array[Double]], k: Int): Array[Int] = {
    val n = points.length
    require(k >= 1 && k <= n, s"k=$k out of range for n=$n")
    // active clusters: member lists + pairwise average distances
    val members = scala.collection.mutable.Map[Int, List[Int]]()
    (0 until n).foreach(i => members(i) = List(i))
    // average-linkage distance between clusters = mean pairwise point
    // distance; maintained incrementally via the Lance-Williams update.
    // Keys are (lo, hi) id pairs packed into a Long: LongMap avoids the
    // tuple boxing that dominated the original profile at n≈500.
    val dist = scala.collection.mutable.LongMap[Double]()
    def key(a: Int, b: Int): Long =
      if (a < b) (a.toLong << 32) | b else (b.toLong << 32) | a
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) { dist(key(i, j)) = cosineDistance(points(i), points(j)); j += 1 }
      i += 1
    }

    val pq = scala.collection.mutable.PriorityQueue[(Double, Int, Int)]()(
      Ordering.by[(Double, Int, Int), Double](_._1).reverse)
    dist.foreach { case (p, d) => pq.enqueue((d, (p >>> 32).toInt, (p & 0xffffffffL).toInt)) }

    var nextId = n
    var active = members.keySet.size
    while (active > k) {
      val (d, a, b) = pq.dequeue()
      if (members.contains(a) && members.contains(b) && dist.get(key(a, b)).contains(d)) {
        val na = members(a).size.toDouble
        val nb = members(b).size.toDouble
        val merged = nextId; nextId += 1
        members(merged) = members(a) ++ members(b)
        // Lance-Williams for average linkage:
        // d(merged, c) = (na·d(a,c) + nb·d(b,c)) / (na+nb)
        members.keys.filter(c => c != a && c != b && c != merged).foreach { c =>
          val dac = dist(key(a, c)); val dbc = dist(key(b, c))
          val dmc = (na * dac + nb * dbc) / (na + nb)
          dist(key(merged, c)) = dmc
          pq.enqueue((dmc, math.min(merged, c), math.max(merged, c)))
        }
        // Stale dist entries for a/b are left in place deliberately: a
        // pair's distance is written exactly once (merged ids are fresh)
        // and the PQ validity check requires BOTH ids in `members`, so
        // dead entries can never be acted on — scanning every key to
        // delete them (the previous code) was the O(n³) hot spot.
        members.remove(a); members.remove(b)
        active -= 1
      }
    }
    val labels = new Array[Int](n)
    members.values.toSeq.sortBy(_.min).zipWithIndex.foreach { case (ms, c) =>
      ms.foreach(i => labels(i) = c)
    }
    labels
  }

  /** Reference-factory parity: cosine affinity propagation
    * (`ihop/clustering.py:353-447`) — delegates to
    * [[AffinityPropagation.fitPredictPoints]]. */
  def affinityPropagation(points: Array[Array[Double]],
                          cfg: AffinityPropagation.Config = AffinityPropagation.Config())
      : AffinityPropagation.Result =
    AffinityPropagation.fitPredictPoints(points, cfg)
}
