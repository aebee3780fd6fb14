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
