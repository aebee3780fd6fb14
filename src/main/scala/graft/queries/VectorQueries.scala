package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{NearestCentroid, QuantizedCosine, VectorOps}
import graft.sources.Tables

/** Vector / semantic-search coverage (SURVEY.md §2.10) over the
  * `embeddings` table (64-dim float vectors, 10 labels).
  *
  * The V1 kernel — scored full scan → threshold → top-k — uses the native
  * codegen [[graft.functions.CosineSimilarity]] expression; the query
  * vector is a driver-side constant broadcast into the plan as a literal
  * array, mirroring the reference where the query embedding is a parameter
  * (api/app/lib/age_client/query.py:35-119).
  */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic query vector: the embedding of vec_id = 0, fetched once
    * driver-side (a parameter lookup, not a data loop). */
  def queryVector(s: SparkSession, dir: String): Column = {
    val v = Tables.embeddings(s, dir)
      .where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    VectorOps.vecLit(v)
  }

  private val duckQueryVec =
    "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"

  /** Lloyd assignment shared by q78/q84: nearest of the k seed centroids
    * (squared-L2, deterministic min-centroid-id tiebreak) for every vector
    * of the embeddings table. Returns (vec_id, v, cluster).
    *
    * One projection, no join: the k seed centroids (k = N/250 under the
    * SemDeDup knob — a bounded, metadata-scale driver read) ride into a
    * single [[graft.functions.NearestCentroid]] codegen expression. The
    * previous crossJoin + min(struct(dist, cid)) shape pushed N×k rows
    * through a partial aggregate — 160M rows and 23 s at sf10; this is the
    * same argmin, bit-identical (same accumulation order and tie-break),
    * at scan cost. */
  private def kmeansAssign(s: SparkSession, dir: String, k: Int): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val seedRows = e.where(col("vec_id") < k).orderBy(col("vec_id")).collect()
    val ids = seedRows.map(_.getLong(0))
    val cents = seedRows.map(_.getSeq[Double](1).toArray)
    e.withColumn("cluster", NearestCentroid.col(col("v"), ids, cents))
  }

  val queries: Map[String, Q] = Map(
    // V1: cosine top-k over a full scan — threshold, sort desc, slice
    // (age_client/query.py:62-116). Ordering on the ROUNDED similarity so
    // fp noise below 1e-6 cannot flip oracle row order.
    "q25_cosine_topk" -> ((s, dir) => {
      val q = queryVector(s, dir)
      Tables.embeddings(s, dir)
        .withColumn("sim", round(VectorOps.cosine(col("embedding"), q), 6))
        .where(col("sim") >= 0.0 && col("vec_id") > 0)
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(15)
        .select(col("vec_id"), col("label"), col("sim"))
    }),

    // kNN self-join: near-neighbor pairs above a threshold (the V3
    // match-or-create scan shape, ingestion.py:432-507).
    "q26_knn_pairs" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(
        col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val a = e.where(col("vec_id") < 300).toDF("a_id", "a_emb")
      val b = e.where(col("vec_id") < 300).toDF("b_id", "b_emb")
      // broadcast(b): without it the non-equi join plans as a
      // CartesianProduct whose p_a × p_b tasks EACH re-run their input
      // partitions — at sf10 the candidate filter survives in ~12 scan
      // partitions per side, so the full embeddings table was decoded
      // ~12× per run (measured 10× slowdown). The candidate set is
      // bounded by construction (the V3 match window), so the broadcast
      // side is always small and each side is scanned exactly once.
      a.join(broadcast(b), col("a_id") < col("b_id"))
        .withColumn("sim", round(VectorOps.cosine(col("a_emb"), col("b_emb")), 6))
        .where(col("sim") >= 0.25)
        .select(col("a_id"), col("b_id"), col("sim"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // A10: per-label centroid (elementwise mean), long form (label, pos,
    // value) — ontology centroid (ontology_scorer.py:301-407).
    "q27_centroid" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding").cast("array<double>")))
        .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim"))
        .agg(round(avg(col("col")), 6).as("centroid_val"))
        .orderBy(col("label"), col("dim"))
    }),

    // A6: Gini-Simpson-style diversity = 1 − mean pairwise cosine within
    // each label group (diversity_analyzer.py:48-185).
    // LINEAR closed form, not the all-pairs join (which is N²/labels —
    // quadratic; the sf10 audit bar): for unit vectors u_i,
    //   Σ_{i<j} cos(v_i, v_j) = (‖Σ u_i‖² − n) / 2
    // so mean pairwise cosine = (Σ_d (Σ_i u_{i,d})² − n) / (n(n−1)).
    // One pass to normalize, one 64·N-row posexplode aggregated on
    // (label, dim) — |labels|·d groups — then a |labels|-row reduce.
    // The oracle stays the literal pairwise SQL: at the sf0.01 gate the
    // join is trivial, and agreement there proves the algebra.
    "q28_diversity" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("label"), col("embedding").cast("array<double>").as("v"))
      // The norm must be OUTSIDE any lambda: an interpreted HOF inside
      // `transform` re-evaluates aggregate(v) per element (64× per row,
      // tripled again by the Generate null-filter's expression copies —
      // measured 1.1 s warm on 2k rows). One per-row norm in the same
      // projection as the explode, divided after exploding, is linear with
      // per-row (not per-element) HOF cost.
      val dimSums = e
        .select(col("label"),
          sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)).as("nrm"),
          posexplode(col("v")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("col") / col("nrm")).as("sd"))
        .groupBy(col("label"))
        .agg(sum(col("sd") * col("sd")).as("s2"))
      e.groupBy(col("label")).agg(count(lit(1)).as("n"))
        .join(dimSums, "label")
        .select(
          col("label"),
          round(lit(1.0) - (col("s2") - col("n")) /
            (col("n") * (col("n") - 1)), 6).as("diversity"),
          (col("n") * (col("n") - 1) / 2).cast("long").as("n_pairs"))
        .orderBy(col("label"))
    }),
    // A12: synonym detection — pairwise cosine over a small "vocabulary"
    // table (vec_id < 32 as vocab types) with a strong/moderate threshold
    // ladder (vocabulary_scoring.py:613-747; thresholds scaled to this
    // corpus's similarity range).
    "q46_synonyms" -> ((s, dir) => {
      val v = Tables.embeddings(s, dir).where(col("vec_id") < 32).select(
        col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val a = v.toDF("a_id", "a_emb")
      val b = v.toDF("b_id", "b_emb")
      a.join(b, col("a_id") < col("b_id"))
        .withColumn("sim", round(VectorOps.cosine(col("a_emb"), col("b_emb")), 6))
        .where(col("sim") >= 0.25)
        .withColumn("strength",
          when(col("sim") >= 0.30, "strong").otherwise("moderate"))
        .select(col("a_id"), col("b_id"), col("sim"), col("strength"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // One k-means step (Lloyd iteration) over the embedding corpus: assign
    // every vector to its nearest of k=8 seed centroids (squared-L2,
    // deterministic tiebreak on centroid id), then the per-cluster centroid
    // update for the first 4 dims. The seeds broadcast (k rows); assignment
    // is scan-shaped; the update is one partial-aggregated groupBy — the
    // exact shape an MLlib KMeans iteration shuffles, but oracle-checkable:
    // per-dim sums go through floor-to-micros fixed point so the mean is
    // order-independent and bit-identical cross-engine.
    "q78_kmeans_step" -> ((s, dir) => {
      kmeansAssign(s, dir, k = 8)
        .select(col("cluster"), posexplode(col("v")))
        .where(col("pos") < 4)
        .groupBy(col("cluster"), col("pos").cast("long").as("dim"))
        .agg(count(lit(1)).as("n_vecs"),
          (sum(floor(col("col") * 1e6).cast("long")).cast("double") /
            count(lit(1)) / lit(1e6)).as("dim_mean"))
        .orderBy(col("cluster"), col("dim"))
    }),

    // Semantic dedup (the SemDeDup shape, Abbas et al. 2023): q78's k-means
    // assignment bounds the candidate space, then cosine pairs form ONLY
    // within a cluster — an equi-join on the cluster id (shuffled hash,
    // never a nested loop), so pair count is Σ|cluster|² instead of N².
    // That bounding is the whole point at 100 TB: all-pairs cosine is
    // impossible, within-cluster pairs are routine. a_id is the kept
    // (smaller) id, b_id the candidate duplicate.
    "q84_semantic_dedup" -> ((s, dir) => {
      // SemDeDup's scale knob: k grows with the corpus (k = N/250, floor 8)
      // so E|cluster| stays ~constant and Σ|cluster|² grows LINEARLY in N —
      // with a fixed k the pair count is quadratic (measured 10.7× runtime
      // at 10× rows in the sf1 audit, SCALE.md). The count() prepass is one
      // metadata-cheap scan; at sf0.01/sf0.1 the formula still yields k=8,
      // so small-SF results are unchanged.
      val n = Tables.embeddings(s, dir).count()
      val withV = kmeansAssign(s, dir, k = math.max(8L, n / 250L).toInt)
        .localCheckpoint(true)
      val a = withV.select(col("vec_id").as("a_id"), col("v").as("a_v"), col("cluster"))
      val b = withV.select(col("vec_id").as("b_id"), col("v").as("b_v"),
        col("cluster").as("b_cluster"))
      a.join(b, col("cluster") === col("b_cluster") && col("a_id") < col("b_id"))
        .withColumn("sim", round(VectorOps.cosine(col("a_v"), col("b_v")), 6))
        .where(col("sim") >= 0.35)
        .select(col("cluster"), col("a_id"), col("b_id"), col("sim"))
        .orderBy(col("cluster"), col("a_id"), col("b_id"))
    }),

    // Quantized coarse search + exact re-rank: score the int8-quantized
    // vectors (q53's kernel — at 100 TB the int8 column is what's STORED,
    // so the coarse pass scans ¼ of the bytes; cosine is scale-invariant,
    // so the per-vector scales drop out of the coarse score entirely),
    // keep the top 30 coarse candidates (TakeOrdered — n_partitions × 30
    // rows move), then join ONLY those ids back to the full-precision
    // table for the exact top-10 — the memory-bound ANN ladder rung
    // between q25's exact scan and q26's IVF cells (Ann.scala tiers).
    // The coarse score is ONE fused codegen kernel ([[QuantizedCosine]]:
    // scale + quantize + cosine in a single per-row loop) — the composed
    // HOF form it replaces ran three interpreted array passes per row,
    // whose shared LambdaFunction dispatch went JIT-megamorphic in ~1/3
    // of full-suite JVMs and made the query 5× BIMODAL at sf10 (the
    // r13/r14 verdict mystery).
    "q92_quantized_rerank" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
      // the query quantizes driver-side with the same half-away-from-zero
      // rule (java.lang.Math floor/ceil ≡ Spark's on IEEE doubles)
      val qSeq = Tables.embeddings(s, dir).where(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      val qScale = qSeq.map(math.abs).max / 127.0
      val qQuant =
        if (qScale == 0) qSeq.map(_ => 0.0)
        else qSeq.map { x =>
          val d = x / qScale
          if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)
        }
      val coarse = e.where(col("vec_id") > 0)
        .withColumn("coarse_sim",
          round(QuantizedCosine(col("v"), VectorOps.vecLit(qQuant)), 6))
        .orderBy(col("coarse_sim").desc, col("vec_id").asc)
        .limit(30)
        .select("vec_id", "label", "coarse_sim")
      broadcast(coarse).join(e.select(col("vec_id"), col("v")), "vec_id")
        .withColumn("exact_sim",
          round(VectorOps.cosine(col("v"), VectorOps.vecLit(qSeq)), 6))
        .orderBy(col("exact_sim").desc, col("vec_id").asc)
        .limit(10)
        .select("vec_id", "label", "coarse_sim", "exact_sim")
    }),

    // Consolidation merge recommendations (ADR-603 preserve decision,
    // synonym_detector.py:396-446 + vocabulary_manager.py:688-691) over the
    // q46 pseudo-vocabulary: for every strong synonym pair, preserve the
    // higher-usage side (label as the usage proxy; tie → lower id) and rank
    // by priority = sim·2 − min_usage/100. The analytical core of
    // [[graft.analysis.Consolidation]], oracle-checkable.
    "q95_merge_recs" -> ((s, dir) => {
      val v = Tables.embeddings(s, dir).where(col("vec_id") < 32).select(
        col("vec_id"), col("label"), col("embedding").cast("array<double>").as("emb"))
      val a = v.toDF("a_id", "a_usage", "a_emb")
      val b = v.toDF("b_id", "b_usage", "b_emb")
      a.join(b, col("a_id") < col("b_id"))
        .withColumn("sim", round(VectorOps.cosine(col("a_emb"), col("b_emb")), 6))
        .where(col("sim") >= 0.30)
        .select(
          when(col("a_usage") > col("b_usage"), col("a_id"))
            .when(col("b_usage") > col("a_usage"), col("b_id"))
            .otherwise(least(col("a_id"), col("b_id"))).as("preserve_id"),
          when(col("a_usage") > col("b_usage"), col("b_id"))
            .when(col("b_usage") > col("a_usage"), col("a_id"))
            .otherwise(greatest(col("a_id"), col("b_id"))).as("deprecate_id"),
          col("sim"),
          round(col("sim") * 2 -
            least(col("a_usage"), col("b_usage")) / lit(100.0), 6).as("priority"))
        .orderBy(col("priority").desc, col("deprecate_id").asc, col("preserve_id").asc)
    }),

    // IVF index AT REST (V1's 10¹⁰-row shape, similarity/AnnIndex): cells
    // 1..8 of the embeddings table are the centroids, the rest is indexed
    // into a store CLUSTERED BY cell (one file band per cell), and the
    // query probes its 2 nearest cells — a `cell IN (...)` predicate the
    // manifest zone maps turn into file pruning (AnnIndexSpec pins the
    // pruning; this entry pins the search RESULT against DuckDB
    // recomputing assignment + probes over the original parquet). Build is
    // idempotent across runs: min-of-2 bench timings measure the warm
    // probed read. Tiebreaks mirror assignCells/nearestCells: max
    // similarity then max cell.
    "q98_ivf_store" -> ((s, dir) => {
      // Keyed on the DATA's fingerprint, not the path — see q97.
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q98_" +
        Tables.fingerprint(dir, "embeddings")
      val store = new graft.core.SnapshotStore(s, root)
      // fixture caches persist across builds: stamp pre-sentinel stores
      store.migrateLegacyTable("ivf")
      val cents: Seq[Seq[Double]] = Tables.embeddings(s, dir)
        .where(col("vec_id").between(1, 8))
        .orderBy(col("vec_id"))
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      if (store.latestVersion("ivf").isEmpty)
        graft.similarity.AnnIndex.build(store, "ivf",
          Tables.embeddings(s, dir).where(col("vec_id") > 8)
            .select(col("vec_id"), col("label"), col("embedding").as("v")),
          "vec_id", "v", cents)
      val q = Tables.embeddings(s, dir).where(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      val probes = graft.similarity.Ann.nearestCells(cents, q, nprobe = 2)
      s.read.format("graft").option("root", root).option("table", "ivf")
        .load()
        .where(col("cell").isin(probes: _*))
        .withColumn("sim", round(VectorOps.cosine(col("v"), VectorOps.vecLit(q)), 6))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(12)
        .select(col("vec_id"), col("label"), col("sim"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q98_ivf_store" ->
      """WITH cents AS (
        |  SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |assign AS (
        |  SELECT e.vec_id, e.label, e.embedding::DOUBLE[] AS v,
        |    (SELECT c.cell FROM cents c
        |     ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
        |       c.cell DESC LIMIT 1) AS cell
        |  FROM embeddings e WHERE e.vec_id > 8),
        |probes AS (
        |  SELECT c.cell FROM cents c, q
        |  ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cell DESC
        |  LIMIT 2)
        |SELECT a.vec_id, a.label,
        |  round(list_cosine_similarity(a.v, q.qv), 6) AS sim
        |FROM assign a, q
        |WHERE a.cell IN (SELECT cell FROM probes)
        |ORDER BY sim DESC, a.vec_id ASC LIMIT 12""".stripMargin,

    "q92_quantized_rerank" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |sc AS (SELECT vec_id, label, v,
        |  list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM v),
        |qz AS (SELECT vec_id, label, v,
        |  list_transform(v, x -> CASE WHEN scale IS NULL OR scale = 0 THEN 0.0
        |    WHEN x / scale >= 0 THEN floor(x / scale + 0.5)
        |    ELSE ceil(x / scale - 0.5) END) AS qv
        |  FROM sc),
        |coarse AS (
        |  SELECT z.vec_id, z.label, z.v,
        |    round(list_cosine_similarity(z.qv,
        |      (SELECT qv FROM qz WHERE vec_id = 0)), 6) AS coarse_sim
        |  FROM qz z WHERE z.vec_id > 0
        |  ORDER BY coarse_sim DESC, z.vec_id ASC LIMIT 30)
        |SELECT vec_id, label, coarse_sim,
        |  round(list_cosine_similarity(v,
        |    (SELECT v FROM v WHERE vec_id = 0)), 6) AS exact_sim
        |FROM coarse
        |ORDER BY exact_sim DESC, vec_id ASC LIMIT 10""".stripMargin,

    "q84_semantic_dedup" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |seeds AS (SELECT vec_id AS cid, v AS c FROM v
        |          WHERE vec_id < (SELECT greatest(8, count(*) // 250) FROM v)),
        |d AS (
        |  SELECT v.vec_id, s.cid,
        |    list_reduce(list_transform(range(1, len(v.v) + 1),
        |      i -> (v.v[i] - s.c[i]) * (v.v[i] - s.c[i])),
        |      (acc, x) -> acc + x) AS dist
        |  FROM v, seeds s),
        |a AS (
        |  SELECT vec_id, cid AS cluster FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d) t
        |  WHERE rn = 1)
        |SELECT aa.cluster, aa.vec_id AS a_id, ab.vec_id AS b_id,
        |  round(list_cosine_similarity(va.v, vb.v), 6) AS sim
        |FROM a aa JOIN a ab ON aa.cluster = ab.cluster AND aa.vec_id < ab.vec_id
        |JOIN v va ON va.vec_id = aa.vec_id
        |JOIN v vb ON vb.vec_id = ab.vec_id
        |WHERE round(list_cosine_similarity(va.v, vb.v), 6) >= 0.35
        |ORDER BY aa.cluster, a_id, b_id""".stripMargin,

    "q46_synonyms" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim,
        |  CASE WHEN round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.30
        |       THEN 'strong' ELSE 'moderate' END AS strength
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < b.vec_id AND a.vec_id < 32 AND b.vec_id < 32
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.25
        |ORDER BY a_id, b_id""".stripMargin,
    "q25_cosine_topk" ->
      s"""SELECT vec_id, label,
         |  round(list_cosine_similarity(embedding::DOUBLE[], $duckQueryVec), 6) AS sim
         |FROM embeddings
         |WHERE round(list_cosine_similarity(embedding::DOUBLE[], $duckQueryVec), 6) >= 0.0
         |  AND vec_id > 0
         |ORDER BY sim DESC, vec_id ASC LIMIT 15""".stripMargin,

    "q26_knn_pairs" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < b.vec_id AND a.vec_id < 300 AND b.vec_id < 300
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.25
        |ORDER BY a_id, b_id""".stripMargin,

    "q27_centroid" ->
      """SELECT label, dim, round(avg(val), 6) AS centroid_val
        |FROM (
        |  SELECT label,
        |    unnest(embedding::DOUBLE[]) AS val,
        |    unnest(generate_series(1, len(embedding))) AS dim
        |  FROM embeddings) t
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "q28_diversity" ->
      """SELECT a.label,
        |  round(1.0 - avg(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])), 6)
        |    AS diversity,
        |  count(*) AS n_pairs
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |GROUP BY a.label ORDER BY a.label""".stripMargin,

    "q78_kmeans_step" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |seeds AS (SELECT vec_id AS cid, v AS c FROM v WHERE vec_id < 8),
        |d AS (
        |  SELECT v.vec_id, s.cid,
        |    list_reduce(list_transform(range(1, len(v.v) + 1),
        |      i -> (v.v[i] - s.c[i]) * (v.v[i] - s.c[i])),
        |      (acc, x) -> acc + x) AS dist
        |  FROM v, seeds s),
        |a AS (
        |  SELECT vec_id, cid AS cluster FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d) t
        |  WHERE rn = 1)
        |SELECT a.cluster, p.pos AS dim, count(*) AS n_vecs,
        |  CAST(sum(CAST(floor(v.v[p.pos + 1] * 1e6) AS BIGINT)) AS DOUBLE)
        |    / count(*) / 1e6 AS dim_mean
        |FROM a JOIN v USING (vec_id), (SELECT unnest(range(0, 4)) AS pos) p
        |GROUP BY a.cluster, p.pos
        |ORDER BY a.cluster, dim""".stripMargin,

    "q95_merge_recs" ->
      """WITH p AS (
        |  SELECT a.vec_id AS a_id, a.label AS a_usage,
        |    b.vec_id AS b_id, b.label AS b_usage,
        |    round(list_cosine_similarity(a.embedding::DOUBLE[],
        |      b.embedding::DOUBLE[]), 6) AS sim
        |  FROM embeddings a JOIN embeddings b
        |    ON a.vec_id < b.vec_id AND a.vec_id < 32 AND b.vec_id < 32)
        |SELECT
        |  CASE WHEN a_usage > b_usage THEN a_id
        |       WHEN b_usage > a_usage THEN b_id
        |       ELSE least(a_id, b_id) END AS preserve_id,
        |  CASE WHEN a_usage > b_usage THEN b_id
        |       WHEN b_usage > a_usage THEN a_id
        |       ELSE greatest(a_id, b_id) END AS deprecate_id,
        |  sim,
        |  round(sim * 2 - least(a_usage, b_usage) / 100.0, 6) AS priority
        |FROM p WHERE sim >= 0.30
        |ORDER BY priority DESC, deprecate_id, preserve_id""".stripMargin,
  )
}
