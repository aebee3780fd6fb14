package graft.analysis

import org.apache.spark.ml.feature.{PCA => MlPCA}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Embedding projection + clustering (reference V8,
  * api/app/services/embedding_projection_service.py:641-807): the reference
  * collects ≤10⁴ embeddings to the driver and runs sklearn t-SNE/UMAP +
  * DBSCAN. The Spark-native substitution (SURVEY §7.3): distributed PCA to
  * 3 components (MLlib computes the covariance eigenbasis without
  * collecting rows), then DBSCAN on the projected 3-D points via a
  * grid-cell join — neighbor pairs only form between points whose cells
  * touch, so the pair join is bounded by local density, never O(n²).
  *
  * [[tsne]] keeps the reference's DEFAULT algorithm available with the
  * reference's own execution shape (a driver-side step over a bounded
  * collected sample — the reference never projects more than 10⁴ points);
  * PCA remains the distributed scale path.
  */
object Projection {

  /** PCA to `k` components. Input: (id, embedding array<float|double>).
    * Output: (id, p0..p{k-1}). */
  def pca(df: DataFrame, idCol: String, vecCol: String, k: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val assembled = df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .map(r => (r.getAs[Any]("id").toString, Vectors.dense(r.getSeq[Double](1).toArray)))
      .toDF("id", "features")
    val model = new MlPCA().setInputCol("features").setOutputCol("pca")
      .setK(k).fit(assembled)
    val out = model.transform(assembled)
    val cols = (0 until k).map(i => element_at(vector_to_array(col("pca")), i + 1).as(s"p$i"))
    out.select(col("id") +: cols: _*)
  }

  /** The reference's small-dataset perplexity clamp
    * (embedding_projection_service.py:702-709, unit-tested by its
    * test_projection_perplexity_clamp.py): `min(p, (n-1)//3)`, raised to at
    * least 2 when it falls under 5, capped at n−1. */
  def effectivePerplexity(perplexity: Int, nSamples: Int): Int = {
    var eff = math.min(perplexity, (nSamples - 1) / 3)
    if (eff < 5) eff = math.max(2, eff)
    math.min(eff, nSamples - 1)
  }

  /** Exact t-SNE (van der Maaten & Hinton 2008) to `dims` components — the
    * reference's default projection algorithm
    * (embedding_projection_service.py:641-747: perplexity clamp, PCA init
    * for n > 50 else seeded random, auto learning rate, max_iter=1000).
    * Like the reference's preprocessing, the collected sample is centered
    * (mean subtracted) and each row L2-normalized before distances: on the
    * unit sphere squared Euclidean distance is monotone in cosine, which
    * reproduces the reference's metric='cosine' + normalize_l2 combination
    * and removes the anisotropy artifact centering exists to fix. Driver-
    * side over a deterministic ≤`maxSamples` sample, exactly like the
    * reference (it collects every embedding it projects); the O(n²)
    * affinity matrix is the reason this is bounded, and [[pca]] is the
    * unbounded distributed path. When the input exceeds `maxSamples` the
    * overflow is logged and only the first `maxSamples` ids (ascending) are
    * projected. Output: (id, p0..p{dims-1}). */
  def tsne(df: DataFrame, idCol: String, vecCol: String, dims: Int = 3,
      perplexity: Int = 30, iterations: Int = 1000, seed: Long = 42L,
      maxSamples: Int = 2000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // limit(maxSamples+1): one extra row detects truncation without a
    // separate count job over the full input.
    val fetched = df.select(col(idCol).cast("string").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
      .orderBy(col("id")).limit(maxSamples + 1)
      .collect()
    if (fetched.length > maxSamples)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"t-SNE input exceeds maxSamples=$maxSamples; projecting only the " +
          "first " + maxSamples + " ids — use the distributed PCA path for " +
          "full-corpus projection")
    val rows = fetched.take(maxSamples)
    val n = rows.length
    require(n >= 3, s"t-SNE needs at least 3 samples, got $n (reference floor)")
    val ids = rows.map(_.getString(0))
    val x = rows.map(_.getSeq[Double](1).toArray)
    centerAndNormalize(x)
    val y = TsneKernel.run(x, dims,
      effectivePerplexity(perplexity, n), iterations, seed)
    val out = ids.indices.map(i => (ids(i), y(i).toSeq)).toSeq
      .toDF("id", "p")
    val cols = (0 until dims).map(i => element_at(col("p"), i + 1).as(s"p$i"))
    out.select(col("id") +: cols: _*)
  }

  /** UMAP (McInnes, Healy & Melville 2018) to `dims` components — the
    * reference's `algorithm=umap` alternative
    * (embedding_projection_service.py:719-729: n_neighbors clamped to
    * n−1, min_dist/spread drive the low-dimensional curve, fixed
    * random_state, cosine metric). Same execution shape and bounds as
    * [[tsne]]: driver-side over a deterministic ≤`maxSamples` sample
    * (ascending ids, overflow logged), centered + L2-normalized so
    * Euclidean distance is cosine-monotone, [[pca]] the unbounded
    * distributed path. The kernel is the published algorithm: fuzzy
    * simplicial set from smoothed k-NN distances (per-point rho/sigma
    * calibrated to log2(k)), probabilistic t-conorm symmetrization,
    * (a, b) least-squares-fit from (min_dist, spread), PCA init, and
    * negative-sampling SGD on the cross-entropy — seeded and sequential,
    * so a fixed seed reproduces coordinates exactly.
    * Output: (id, p0..p{dims-1}). */
  def umap(df: DataFrame, idCol: String, vecCol: String, dims: Int = 3,
      nNeighbors: Int = 15, minDist: Double = 0.1, spread: Double = 1.0,
      epochs: Int = 200, seed: Long = 42L, maxSamples: Int = 2000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fetched = df.select(col(idCol).cast("string").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
      .orderBy(col("id")).limit(maxSamples + 1)
      .collect()
    if (fetched.length > maxSamples)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"UMAP input exceeds maxSamples=$maxSamples; projecting only the " +
          "first " + maxSamples + " ids — use the distributed PCA path for " +
          "full-corpus projection")
    val rows = fetched.take(maxSamples)
    val n = rows.length
    require(n >= 3, s"UMAP needs at least 3 samples, got $n")
    val ids = rows.map(_.getString(0))
    val x = rows.map(_.getSeq[Double](1).toArray)
    centerAndNormalize(x)
    val y = UmapKernel.run(x, dims, math.min(nNeighbors, n - 1), minDist,
      spread, epochs, seed)
    val out = ids.indices.map(i => (ids(i), y(i).toSeq)).toSeq.toDF("id", "p")
    val cols = (0 until dims).map(i => element_at(col("p"), i + 1).as(s"p$i"))
    out.select(col("id") +: cols: _*)
  }

  /** In-place: subtract the sample mean from every row, then L2-normalize
    * each row (zero rows are left at zero). Reference preprocessing for the
    * cosine-metric t-SNE path (embedding_projection_service.py:641-747). */
  private[analysis] def centerAndNormalize(x: Array[Array[Double]]): Unit = {
    if (x.isEmpty) return
    val d = x(0).length
    val mean = new Array[Double](d)
    x.foreach { r => var k = 0; while (k < d) { mean(k) += r(k); k += 1 } }
    var k = 0
    while (k < d) { mean(k) /= x.length; k += 1 }
    x.foreach { r =>
      var norm = 0.0
      k = 0
      while (k < d) { r(k) -= mean(k); norm += r(k) * r(k); k += 1 }
      norm = math.sqrt(norm)
      if (norm > 0) { k = 0; while (k < d) { r(k) /= norm; k += 1 } }
    }
  }

  /** The reference's DBSCAN eps auto-tune
    * (embedding_projection_service.py:753-807): 40th percentile of the
    * k-NN distances (k = minPts), floored at 1% of the coordinate range
    * and 1e-6. Driver-side over the projected points, like the reference. */
  def suggestEps(points: DataFrame, dims: Seq[String], minPts: Int = 5): Double = {
    val rows = points.select(dims.map(c => col(c).cast("double")): _*).collect()
    val p = rows.map(r => Array.tabulate(dims.length)(r.getDouble))
    val n = p.length
    if (n < minPts) return 1e-6
    val kth = Array.tabulate(n) { i =>
      val d = Array.tabulate(n) { j =>
        var s = 0.0
        var k = 0
        while (k < dims.length) { val t = p(i)(k) - p(j)(k); s += t * t; k += 1 }
        math.sqrt(s)
      }
      java.util.Arrays.sort(d)
      d(math.min(minPts - 1, n - 1)) // self at d(0), kth neighbor inclusive of self like sklearn kneighbors
    }
    java.util.Arrays.sort(kth)
    // numpy linear-interpolation percentile
    val pos = 0.40 * (n - 1)
    val lo = pos.toInt
    val frac = pos - lo
    val eps = if (lo + 1 < n) kth(lo) * (1 - frac) + kth(lo + 1) * frac else kth(lo)
    val range = (0 until dims.length).map { k =>
      val vals = p.map(_(k)); vals.max - vals.min
    }.max
    math.max(math.max(eps, range * 0.01), 1e-6)
  }

  /** DBSCAN on low-dimensional points via the grid-cell method:
    * cell side = eps, so all eps-neighbors of a point lie in its own or
    * adjacent cells (3^d candidates). Steps, all distributed:
    *  1. assign cell ids
    *  2. candidate pairs = join points to the 3^d neighbor cells
    *  3. exact distance filter → eps-neighbor graph
    *  4. core points: ≥ minPts neighbors (incl. self)
    *  5. clusters = connected components of the core-core graph (iterative
    *     label propagation: min-label spread until fixpoint)
    *  6. border points adopt a neighboring core's cluster; rest are noise (-1)
    *
    * Output: (id, cluster) with noise = -1. */
  def dbscan(points: DataFrame, idCol: String, dims: Seq[String],
      eps: Double, minPts: Int, maxIters: Int = 20): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    val d = dims.length
    val p = points.select((col(idCol).cast("string").as("id") +:
      dims.map(c => col(c).cast("double"))): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 1. cell coordinates
    val cellCols = dims.map(c => floor(col(c) / eps).cast("long").as(s"__c_$c"))
    val withCell = p.select((col("id") +: dims.map(col) ++: cellCols): _*)

    // 2. each point also registers in all 3^d neighbor cells as a probe
    val offsets = Seq.fill(d)(Seq(-1L, 0L, 1L))
      .foldLeft(Seq(Seq.empty[Long]))((acc, o) => acc.flatMap(a => o.map(a :+ _)))
    val probeRows = offsets.map { off =>
      struct(dims.zipWithIndex.map { case (c, i) =>
        (col(s"__c_$c") + lit(off(i))).as(s"__n_$c")
      }: _*)
    }
    val probes = withCell.select((col("id").as("b_id") +:
        dims.map(c => col(c).as(s"b_$c")) :+
          explode(array(probeRows: _*)).as("ncell")): _*)
      .select((col("b_id") +: dims.map(c => col(s"b_$c")) ++:
        dims.map(c => col(s"ncell.__n_$c").as(s"__c_$c"))): _*)

    // 3. eps-neighbor pairs (a sees b if b probes a's cell and dist ≤ eps)
    val distExpr = dims.map(c => pow(col(c) - col(s"b_$c"), 2)).reduce(_ + _)
    val neighbors = withCell.join(probes, dims.map(c => s"__c_$c"))
      .where(sqrt(distExpr) <= eps)
      .select(col("id"), col("b_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 4. core points (neighbor count includes self-pair)
    val cores = neighbors.groupBy("id").agg(count(lit(1)).as("deg"))
      .where(col("deg") >= minPts)
      .select(col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 5. connected components over core-core edges by min-label propagation
    val coreEdges = neighbors
      .join(cores, Seq("id"), "left_semi")
      .join(cores.withColumnRenamed("id", "b_id"), Seq("b_id"), "left_semi")
      .select(col("id"), col("b_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = cores.withColumn("label", col("id"))
    // One propagation round: neighbor-min then pointer jumping
    // (label := label(label)) — chains halve each round, so convergence is
    // O(log n) rounds instead of O(diameter). Returns (next, changed).
    def round(cur: org.apache.spark.sql.DataFrame)
        : (org.apache.spark.sql.DataFrame, Boolean) = {
      val propagated = coreEdges
        .join(cur.withColumnRenamed("id", "b_id").withColumnRenamed("label", "b_label"),
          Seq("b_id"))
        .groupBy("id").agg(min(col("b_label")).as("nbr_label"))
      val stepped = cur.join(propagated, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      val next = stepped.as("x")
        .join(stepped.select(col("id").as("label"), col("label").as("ll")).as("y"),
          Seq("label"), "left")
        .select(col("x.id").as("id"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.join(cur.withColumnRenamed("label", "old"), "id")
        .where(col("label") =!= col("old")).limit(1).count() > 0
      (next, changed)
    }
    var changed = true
    var it = 0
    while (changed && it < maxIters) {
      it += 1
      val (next, c) = round(labels)
      labels = next
      changed = c
    }
    if (changed) {
      // The cap was reached with the final round still changing — that
      // round may itself have completed convergence, so verify with one
      // non-adopted round before declaring failure.
      val (_, stillChanging) = round(labels)
      if (stillChanging)
        throw new IllegalStateException(
          s"DBSCAN label propagation did not converge in $maxIters rounds")
    }

    // 6. border points adopt the min cluster label of a neighboring core
    val borderLabels = neighbors
      .join(labels.withColumnRenamed("id", "b_id").withColumnRenamed("label", "b_label"),
        Seq("b_id"))
      .groupBy(col("id")).agg(min(col("b_label")).as("border_label"))
    val result = p.select(col("id"))
      .join(labels, Seq("id"), "left")
      .join(borderLabels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("label"), col("border_label"), lit("-1")).as("cluster"))
    Seq(p, neighbors, cores, coreEdges).foreach(_.unpersist())
    result
  }
}

/** UMAP gradient machinery (McInnes, Healy & Melville, arXiv:1802.03426)
  * with umap-learn's published defaults: smoothed-kNN bandwidth calibrated
  * to log2(k) by bisection, rho = nearest-neighbor distance, fuzzy-union
  * symmetrization w + wᵀ − w∘wᵀ, curve (1 + a·d^{2b})⁻¹ fit to the
  * min_dist/spread membership target, epochs-per-sample edge scheduling,
  * gradient clipping at ±4, linearly decaying learning rate. Dense O(n²)
  * k-NN — callers bound n (Projection.umap caps the sample). Visible to
  * the test package so the curve fit can be pinned against umap-learn's
  * published constants. */
private[graft] object UmapKernel {

  def run(x: Array[Array[Double]], dims: Int, nNeighbors: Int,
      minDist: Double, spread: Double, epochs: Int,
      seed: Long): Array[Array[Double]] = {
    val n = x.length
    val k = math.max(2, nNeighbors)
    // pairwise Euclidean distances (inputs are centered + L2-normalized,
    // so this is cosine-monotone like the reference's metric='cosine')
    val d = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var s = 0.0
        var t = 0
        val xi = x(i); val xj = x(j)
        while (t < xi.length) { val u = xi(t) - xj(t); s += u * u; t += 1 }
        val dist = math.sqrt(s)
        d(i)(j) = dist; d(j)(i) = dist
        j += 1
      }
      i += 1
    }
    // k nearest neighbor indices per point (self excluded)
    val knn = Array.tabulate(n) { i =>
      (0 until n).filter(_ != i).sortBy(j => (d(i)(j), j)).take(k).toArray
    }
    // smooth_knn_dist: rho = nearest positive distance; sigma solves
    // Σ exp(-(max(0, d - rho))/sigma) = log2(k) by 64-step bisection
    val target = math.log(k.toDouble) / math.log(2.0)
    val rho = new Array[Double](n)
    val sigma = new Array[Double](n)
    val meanDist = {
      var s = 0.0; var c = 0L
      var a = 0
      while (a < n) { var b = a + 1; while (b < n) { s += d(a)(b); c += 1; b += 1 }; a += 1 }
      if (c > 0) s / c else 1.0
    }
    i = 0
    while (i < n) {
      val pos = knn(i).map(j => d(i)(j)).filter(_ > 0.0)
      rho(i) = if (pos.nonEmpty) pos.min else 0.0
      var lo = 0.0
      var hi = Double.PositiveInfinity
      var mid = 1.0
      var it = 0
      while (it < 64) {
        var psum = 0.0
        knn(i).foreach { j =>
          val dd = d(i)(j) - rho(i)
          psum += (if (dd > 0) math.exp(-dd / mid) else 1.0)
        }
        if (math.abs(psum - target) < 1e-5) it = 64
        else {
          if (psum > target) { hi = mid; mid = (lo + hi) / 2.0 }
          else {
            lo = mid
            mid = if (hi.isPosInfinity) mid * 2.0 else (lo + hi) / 2.0
          }
          it += 1
        }
      }
      // umap-learn floors sigma at 1e-3 × the mean distance
      sigma(i) = math.max(mid, 1e-3 * meanDist)
      i += 1
    }
    // directed fuzzy weights, then fuzzy-union symmetrization over the
    // union of both directions' supports
    val w = scala.collection.mutable.HashMap.empty[(Int, Int), Double]
    i = 0
    while (i < n) {
      knn(i).foreach { j =>
        val dd = d(i)(j) - rho(i)
        w((i, j)) = if (dd <= 0) 1.0 else math.exp(-dd / sigma(i))
      }
      i += 1
    }
    val sym = scala.collection.mutable.HashMap.empty[(Int, Int), Double]
    w.foreach { case ((a, b), wab) =>
      val key = if (a < b) (a, b) else (b, a)
      if (!sym.contains(key)) {
        val wba = w.getOrElse((b, a), 0.0)
        sym(key) = wab + wba - wab * wba
      }
    }
    val edges = sym.toArray.sortBy(_._1) // deterministic order
    val (ca, cb) = fitCurve(minDist, spread)
    val y = init(x, dims, seed)

    // epochs-per-sample schedule (umap-learn make_epochs_per_sample)
    val wMax = edges.iterator.map(_._2).foldLeft(1e-12)(math.max)
    val eps = edges.map { case (_, wgt) => wMax / math.max(wgt, 1e-12) }
    val nextSample = eps.clone()
    val negativeSamples = 5
    val epsNeg = eps.map(_ / negativeSamples)
    val nextNeg = epsNeg.clone()
    val rnd = new java.util.Random(seed)
    def clip(v: Double): Double = math.max(-4.0, math.min(4.0, v))

    var epoch = 1
    while (epoch <= epochs) {
      val alpha = 1.0 * (1.0 - (epoch - 1).toDouble / epochs)
      var e = 0
      while (e < edges.length) {
        if (nextSample(e) <= epoch) {
          val (a, b) = edges(e)._1
          // attraction moves both ends
          var d2 = 0.0
          var t = 0
          while (t < dims) { val u = y(a)(t) - y(b)(t); d2 += u * u; t += 1 }
          if (d2 > 0.0) {
            val coeff = (-2.0 * ca * cb * math.pow(d2, cb - 1.0)) /
              (1.0 + ca * math.pow(d2, cb))
            t = 0
            while (t < dims) {
              val g = clip(coeff * (y(a)(t) - y(b)(t)))
              y(a)(t) += alpha * g
              y(b)(t) -= alpha * g
              t += 1
            }
          }
          nextSample(e) += eps(e)
          // negative samples move only the head
          var nNeg = ((epoch - nextNeg(e)) / epsNeg(e)).toInt
          if (nNeg < 0) nNeg = 0
          var s = 0
          while (s < nNeg) {
            val c = rnd.nextInt(n)
            if (c != a) {
              var nd2 = 0.0
              t = 0
              while (t < dims) { val u = y(a)(t) - y(c)(t); nd2 += u * u; t += 1 }
              val coeff = (2.0 * cb) /
                ((0.001 + nd2) * (1.0 + ca * math.pow(nd2, cb)))
              t = 0
              while (t < dims) {
                val g = if (coeff > 0) clip(coeff * (y(a)(t) - y(c)(t))) else 4.0
                y(a)(t) += alpha * g
                t += 1
              }
            }
            s += 1
          }
          nextNeg(e) += nNeg * epsNeg(e)
        }
        e += 1
      }
      epoch += 1
    }
    y
  }

  /** Least-squares fit of (a, b) in (1 + a·d^{2b})⁻¹ to the membership
    * target ψ(d) = 1 for d ≤ min_dist, exp(−(d − min_dist)/spread) past it
    * — umap-learn's find_ab_params, done with a deterministic two-stage
    * grid search instead of scipy.curve_fit (same objective; the curve is
    * smooth and unimodal in this box, so a 3-stage refinement lands within
    * ~1e-3 of the scipy optimum — e.g. min_dist 0.1/spread 1.0 fits
    * a≈1.58, b≈0.90 vs scipy's 1.577, 0.8951). */
  private[graft] def fitCurve(minDist: Double, spread: Double): (Double, Double) = {
    val xs = Array.tabulate(300)(i => 3.0 * spread * (i + 1) / 300.0)
    val ys = xs.map(dd =>
      if (dd <= minDist) 1.0 else math.exp(-(dd - minDist) / spread))
    def err(a: Double, b: Double): Double = {
      var s = 0.0
      var i = 0
      while (i < xs.length) {
        val f = 1.0 / (1.0 + a * math.pow(xs(i), 2.0 * b))
        val u = f - ys(i)
        s += u * u
        i += 1
      }
      s
    }
    var (bestA, bestB) = (1.0, 1.0)
    var bestErr = Double.MaxValue
    var (aLo, aHi, bLo, bHi) = (0.01, 20.0, 0.1, 3.0)
    var stage = 0
    while (stage < 3) {
      val steps = 40
      var ia = 0
      while (ia <= steps) {
        // log-spaced in a, linear in b
        val a = aLo * math.pow(aHi / aLo, ia.toDouble / steps)
        var ib = 0
        while (ib <= steps) {
          val b = bLo + (bHi - bLo) * ib / steps
          val e = err(a, b)
          if (e < bestErr) { bestErr = e; bestA = a; bestB = b }
          ib += 1
        }
        ia += 1
      }
      // shrink the box around the incumbent
      aLo = bestA / 2.0; aHi = bestA * 2.0
      bLo = math.max(0.05, bestB - 0.3); bHi = bestB + 0.3
      stage += 1
    }
    (bestA, bestB)
  }

  /** PCA init scaled to max-abs 10 (umap-learn scales its spectral init
    * into the [−10, 10] box; PCA keeps the init deterministic without an
    * eigensolver of the graph Laplacian). */
  private def init(x: Array[Array[Double]], dims: Int,
      seed: Long): Array[Array[Double]] = {
    val y = TsneKernel.pcaScores(x, dims, seed)
    var maxAbs = 1e-12
    y.foreach(r => r.foreach(v => maxAbs = math.max(maxAbs, math.abs(v))))
    val scale = 10.0 / maxAbs
    y.foreach { r => var t = 0; while (t < dims) { r(t) *= scale; t += 1 } }
    y
  }
}

/** Exact t-SNE gradient machinery (van der Maaten & Hinton, JMLR 2008) with
  * sklearn's published defaults: early exaggeration 12 for the first 250
  * iterations, momentum 0.5 → 0.8 at iteration 250, adaptive per-parameter
  * gains, auto learning rate max(n/12/4, 50). Dense arrays, O(n²) per
  * iteration — callers bound n (Projection.tsne caps the sample). */
private[analysis] object TsneKernel {

  def run(x: Array[Array[Double]], dims: Int, perplexity: Int,
      iterations: Int, seed: Long): Array[Array[Double]] = {
    val n = x.length
    val d2 = squaredDistances(x)
    val p = jointProbabilities(d2, perplexity)
    val y = if (n > 50) pcaInit(x, dims, seed) else randomInit(n, dims, seed)
    val lr = math.max(n / 12.0 / 4.0, 50.0)
    descend(p, y, iterations, lr)
    y
  }

  private def squaredDistances(x: Array[Array[Double]]): Array[Array[Double]] = {
    val n = x.length
    val d2 = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var s = 0.0
        var k = 0
        val xi = x(i); val xj = x(j)
        while (k < xi.length) { val t = xi(k) - xj(k); s += t * t; k += 1 }
        d2(i)(j) = s; d2(j)(i) = s
        j += 1
      }
      i += 1
    }
    d2
  }

  /** Per-point bandwidth by bisection on entropy (target = ln perplexity),
    * then symmetrized joint probabilities with sklearn's 1e-12 floor. */
  private def jointProbabilities(d2: Array[Array[Double]],
      perplexity: Int): Array[Array[Double]] = {
    val n = d2.length
    val targetH = math.log(perplexity.toDouble)
    val cond = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var beta = 1.0
      var betaMin = Double.NegativeInfinity
      var betaMax = Double.PositiveInfinity
      var it = 0
      var done = false
      while (it < 50 && !done) {
        var sumP = 0.0
        var sumDP = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val pj = math.exp(-d2(i)(j) * beta)
            cond(i)(j) = pj
            sumP += pj
            sumDP += d2(i)(j) * pj
          }
          j += 1
        }
        val h = if (sumP > 0) math.log(sumP) + beta * sumDP / sumP else 0.0
        val diff = h - targetH
        if (math.abs(diff) < 1e-5 || sumP == 0.0) done = true
        else if (diff > 0) {
          betaMin = beta
          beta = if (betaMax.isPosInfinity) beta * 2 else (beta + betaMax) / 2
        } else {
          betaMax = beta
          beta = if (betaMin.isNegInfinity) beta / 2 else (beta + betaMin) / 2
        }
        it += 1
      }
      val norm = { var s = 0.0; var j = 0; while (j < n) { s += cond(i)(j); j += 1 }; s }
      if (norm > 0) { var j = 0; while (j < n) { cond(i)(j) /= norm; j += 1 } }
      i += 1
    }
    val p = Array.ofDim[Double](n, n)
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        p(i)(j) = math.max((cond(i)(j) + cond(j)(i)) / (2.0 * n), 1e-12)
        j += 1
      }
      i += 1
    }
    p
  }

  /** PCA init (n > 50, sklearn behavior): top-`dims` principal scores via
    * [[pcaScores]], scaled so the first coordinate has std 1e-4. */
  private def pcaInit(x: Array[Array[Double]], dims: Int,
      seed: Long): Array[Array[Double]] = {
    val n = x.length
    val y = pcaScores(x, dims, seed)
    // scale: std of first coordinate → 1e-4 (sklearn init='pca')
    var s0 = 0.0
    var mean0 = 0.0
    y.foreach(r => mean0 += r(0)); mean0 /= n
    y.foreach(r => s0 += (r(0) - mean0) * (r(0) - mean0))
    val std0 = math.sqrt(s0 / n)
    val scale = if (std0 > 0) 1e-4 / std0 else 1.0
    y.foreach { r => var q = 0; while (q < dims) { r(q) *= scale; q += 1 } }
    y
  }

  /** Top-`dims` principal-component scores via power iteration with
    * Gram-Schmidt deflation — unscaled; shared by the t-SNE and UMAP
    * deterministic inits. Deterministic for a fixed seed. */
  private[analysis] def pcaScores(x: Array[Array[Double]], dims: Int,
      seed: Long): Array[Array[Double]] = {
    val n = x.length
    val d = x(0).length
    val mean = new Array[Double](d)
    x.foreach { r => var k = 0; while (k < d) { mean(k) += r(k); k += 1 } }
    var k = 0
    while (k < d) { mean(k) /= n; k += 1 }
    val c = x.map { r => Array.tabulate(d)(k => r(k) - mean(k)) }
    val rnd = new java.util.Random(seed)
    val comps = Array.ofDim[Double](dims, d)
    val y = Array.ofDim[Double](n, dims)
    var m = 0
    while (m < dims) {
      val v = Array.fill(d)(rnd.nextGaussian())
      var it = 0
      while (it < 60) {
        // orthogonalize against found components, then v := Cᵀ(Cv) normalized
        var p = 0
        while (p < m) {
          var dot = 0.0
          k = 0
          while (k < d) { dot += v(k) * comps(p)(k); k += 1 }
          k = 0
          while (k < d) { v(k) -= dot * comps(p)(k); k += 1 }
          p += 1
        }
        val t = new Array[Double](n)
        var i = 0
        while (i < n) {
          var s = 0.0
          k = 0
          while (k < d) { s += c(i)(k) * v(k); k += 1 }
          t(i) = s
          i += 1
        }
        java.util.Arrays.fill(v, 0.0)
        i = 0
        while (i < n) {
          k = 0
          while (k < d) { v(k) += c(i)(k) * t(i); k += 1 }
          i += 1
        }
        var norm = 0.0
        k = 0
        while (k < d) { norm += v(k) * v(k); k += 1 }
        norm = math.sqrt(norm)
        if (norm > 0) { k = 0; while (k < d) { v(k) /= norm; k += 1 } }
        it += 1
      }
      comps(m) = v
      var i = 0
      while (i < n) {
        var s = 0.0
        k = 0
        while (k < d) { s += c(i)(k) * v(k); k += 1 }
        y(i)(m) = s
        i += 1
      }
      m += 1
    }
    y
  }

  private def randomInit(n: Int, dims: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)(Array.fill(dims)(rnd.nextGaussian() * 1e-4))
  }

  /** In-place gradient descent on the KL divergence with the Student-t
    * low-dimensional kernel. */
  private def descend(p: Array[Array[Double]], y: Array[Array[Double]],
      iterations: Int, lr: Double): Unit = {
    val n = y.length
    val dims = y(0).length
    val explorationIters = math.min(250, iterations)
    val update = Array.ofDim[Double](n, dims)
    val gains = Array.fill(n, dims)(1.0)
    val num = Array.ofDim[Double](n, n)
    var iter = 0
    while (iter < iterations) {
      val exaggeration = if (iter < explorationIters) 12.0 else 1.0
      val momentum = if (iter < explorationIters) 0.5 else 0.8
      // Student-t numerators and normalizer
      var z = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          var s = 0.0
          var k = 0
          while (k < dims) { val t = y(i)(k) - y(j)(k); s += t * t; k += 1 }
          val q = 1.0 / (1.0 + s)
          num(i)(j) = q; num(j)(i) = q
          z += 2.0 * q
          j += 1
        }
        i += 1
      }
      // Phase 1: every gradient against the SAME frozen y (num and z were
      // computed from it) — updating positions mid-pass would mix stale
      // kernel values with moved points and diverge.
      i = 0
      while (i < n) {
        val gi = new Array[Double](dims)
        var j = 0
        while (j < n) {
          if (j != i) {
            val mult = (p(i)(j) * exaggeration - num(i)(j) / z) * num(i)(j)
            var k = 0
            while (k < dims) { gi(k) += 4.0 * mult * (y(i)(k) - y(j)(k)); k += 1 }
          }
          j += 1
        }
        var k = 0
        while (k < dims) {
          val g = gi(k)
          gains(i)(k) =
            math.max(0.01,
              if (math.signum(g) != math.signum(update(i)(k))) gains(i)(k) + 0.2
              else gains(i)(k) * 0.8)
          update(i)(k) = momentum * update(i)(k) - lr * gains(i)(k) * g
          k += 1
        }
        i += 1
      }
      // Phase 2: apply all updates, then recenter (van der Maaten's
      // reference implementation recenters every iteration).
      val mean = new Array[Double](dims)
      i = 0
      while (i < n) {
        var k = 0
        while (k < dims) {
          y(i)(k) += update(i)(k)
          mean(k) += y(i)(k)
          k += 1
        }
        i += 1
      }
      var k = 0
      while (k < dims) { mean(k) /= n; k += 1 }
      i = 0
      while (i < n) {
        k = 0
        while (k < dims) { y(i)(k) -= mean(k); k += 1 }
        i += 1
      }
      iter += 1
    }
  }
}
