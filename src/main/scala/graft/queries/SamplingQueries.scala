package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.dedup.Dedup
import graft.sources.Tables

/** Training-data-pipeline operators beyond the reference's own surface:
  * deterministic stratified sampling, exact quantile calibration, n-gram
  * statistics, and int8 embedding quantization. All four are the standard
  * corpus-curation ladder a 100 TB pipeline runs between dedup and
  * training-shard writes; each is oracle-checked against DuckDB via
  * engine-portable math (md5-derived hashes, linear-interpolated
  * quantiles, away-from-zero rounding).
  */
object SamplingQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Deterministic per-stratum sample: rank docs inside each language by
    // a portable content-independent hash and keep the first 30 — a
    // reproducible "random" sample with exact per-stratum counts (the
    // distributed analog of reservoir sampling; one window shuffle keyed
    // by the stratum).
    "q50_stratified_sample" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          Dedup.portableHash60(col("doc_id").cast("string")).as("h"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 30)
        .select(col("lang"), col("doc_id"), col("rk").cast("long").as("sample_rank"))
        .orderBy(col("lang"), col("sample_rank"))
    }),

    // Quality-threshold calibration: exact p50/p90 of document character
    // length per language (linear interpolation — the same formula DuckDB's
    // quantile_cont uses). Partial aggregation keeps the shuffle at one row
    // per (lang, percentile).
    "q51_quantile_calibration" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), length(col("text")).cast("double").as("n_chars"))
        .groupBy(col("lang"))
        .agg(
          expr("percentile(n_chars, array(0.5D, 0.9D))").as("q"),
          count(lit(1)).as("n_docs"))
        .select(col("lang"),
          round(element_at(col("q"), 1), 4).as("p50_chars"),
          round(element_at(col("q"), 2), 4).as("p90_chars"),
          col("n_docs"))
        .orderBy(col("lang"))
    }),

    // Corpus bigram statistics: adjacent-token pairs via one zip_with over
    // two array slices (no per-token self-join), global top-20 with a
    // total-order tiebreak.
    "q52_bigrams" -> ((s, dir) => {
      val tk = TextQueries.tokens(col("text"))
      Tables.documents(s, dir)
        .select(tk.as("tk"))
        .where(size(col("tk")) >= 2)
        .select(explode(zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(20)
    }),

    // Int8 embedding quantization (the storage/ANN compression path at
    // 100 TB): per-vector absmax scale, values rounded to [-127, 127];
    // emits the scale plus checksums of the quantized vector rather than
    // the array itself (driver compare needs scalar cells).
    "q53_quantize_int8" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("scale",
          array_max(transform(col("v"), x => abs(x))) / lit(127.0))
      // Half-away-from-zero via explicit floor/ceil on IEEE doubles — both
      // engines' built-in round() differ on shortest-representation edge
      // cases, but d + 0.5 and floor/ceil are bit-identical everywhere.
      // A zero (or empty) vector has scale 0/NULL → x/scale is NaN/NULL,
      // and NaN→BIGINT casts diverge between Spark ANSI and DuckDB; the
      // quantization of an all-zero vector is all zeros, so short-circuit.
      val q = transform(col("v"), x => {
        val d = x / col("scale")
        when(col("scale").isNull || col("scale") === 0, lit(0L))
          .when(d >= 0, floor(d + lit(0.5)).cast("long"))
          .otherwise(ceil(d - lit(0.5)).cast("long"))
      })
      // The display rounding happens AFTER q is consumed: aliasing
      // round(scale, 6) AS "scale" in the same projection would shadow the
      // full-precision column inside q's lambda and shift quantization.
      e.select(
          col("vec_id"),
          col("scale"),
          aggregate(q, lit(0L), (acc, x) => acc + x).as("qsum"),
          array_max(q).as("qmax"),
          array_min(q).as("qmin"))
        .withColumn("scale", round(col("scale"), 6))
        .orderBy(col("vec_id"))
    }),

    // Domain mixture weights: per (lang, source) token counts → sampling
    // weight ∝ sqrt(tokens) (temperature-scaled upsampling of small
    // domains, the mixture step before training-shard writes). The
    // normalizer sums DECIMAL(18,4)-cast sqrt weights — exact fixed-point
    // addition is order-independent, so partial aggregation order can't
    // perturb the total (the repo's standard double-sum discipline).
    // token_share is a single exact-int IEEE division (bit-identical
    // cross-engine, no rounding). The normalizer is an unpartitioned
    // window over the AGGREGATE — a post-aggregation bound (rows =
    // langs × sources, dims not corpus), so the single-partition window is
    // fine at any input scale, and the whole query stays lazy (building
    // the plan runs no jobs).
    "q63_domain_mixture" -> ((s, dir) => {
      val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.documents(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextQueries.tokens(col("text")))).cast("long").as("n_tokens"))
        .withColumn("w_dec",
          sqrt(col("n_tokens").cast("double")).cast("decimal(18,4)"))
        .withColumn("tw", sum(col("w_dec")).over(all))
        .withColumn("tt", sum(col("n_tokens")).over(all))
        .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
          round(col("w_dec").cast("double") / col("tw").cast("double"), 6).as("weight"),
          (col("n_tokens").cast("double") / col("tt").cast("double")).as("token_share"))
        .orderBy(col("lang"), col("source"))
    }),

    // Length-outlier flagging: per-language z-score of document length,
    // docs beyond 1.5σ flagged (the curation step that drops truncated and
    // runaway documents before training). mean/std derive from EXACT
    // sums: Σchars fits BIGINT, but Σchars² is staged through
    // DECIMAL(38,0) — at 100 TB (1e9 docs × ~1e5 chars, Σchars² ≈ 1e19)
    // a BIGINT accumulator overflows where the oracle's HUGEINT does not;
    // both exact accumulators convert to the same double. One dims-bounded
    // aggregation broadcast back onto the scan.
    "q67_length_outliers" -> ((s, dir) => {
      val stats = Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("cs"),
          sum((col("n_chars") * col("n_chars")).cast("decimal(38,0)")).as("css"))
        .select(col("lang"),
          (col("cs").cast("double") / col("n").cast("double")).as("mean"),
          sqrt(col("css").cast("double") / col("n").cast("double") -
            (col("cs").cast("double") / col("n").cast("double")) *
              (col("cs").cast("double") / col("n").cast("double"))).as("std"))
      Tables.documents(s, dir)
        .join(broadcast(stats), "lang")
        .where(abs(col("n_chars") - col("mean")) > lit(1.5) * col("std"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round((col("n_chars") - col("mean")) / col("std"), 6).as("z"))
        .orderBy(col("doc_id"))
    }),

    // Training-shard assignment: deterministic portable-hash bucketing of
    // docs into 16 shards plus the per-shard balance audit (doc/token/char
    // totals) a pipeline checks before writing shards. One shuffle keyed by
    // the shard id; the md5-derived hash makes the assignment reproducible
    // across engines and runs (content-independent, id-keyed).
    // Reproducible training data order: shard assignment (q64's portable
    // hash) + a seeded pseudorandom position WITHIN each shard — the
    // "global shuffle" a training run needs, as a deterministic function
    // of (seed, doc_id) so any worker can recompute any shard's order
    // independently (restart/resume without coordination). The rank
    // window partitions by shard — shard sizes are bounded by design
    // (q64's balance audit), so no single-partition sort ever forms; at
    // 100 TB the same plan writes each shard's file in one task.
    "q94_train_order" -> ((s, dir) => {
      val seeded = Tables.documents(s, dir).select(
        col("doc_id"),
        (Dedup.portableHash60(col("doc_id").cast("string")) % 16).as("shard"),
        Dedup.portableHash60(concat(lit("seed42:"), col("doc_id").cast("string")))
          .as("order_key"))
      seeded
        .withColumn("position", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
            .orderBy(col("order_key"), col("doc_id"))))
        .select(col("doc_id"), col("shard"), col("position").cast("long").as("position"))
        .orderBy(col("shard"), col("position"))
    }),

    "q64_shard_assign" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(
          (Dedup.portableHash60(col("doc_id").cast("string")) % 16).as("shard"),
          col("doc_id"),
          size(TextQueries.tokens(col("text"))).cast("long").as("toks"),
          length(col("text")).cast("long").as("chars"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
          sum(col("chars")).as("n_chars"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("shard"))
    }),

    // Sequence packing: assign docs (in doc_id order) to fixed 2048-token
    // training packs by the global token offset at each doc's start —
    // deterministic greedy packing, the step that turns a curated corpus
    // into fixed-length training rows. The global running sum goes through
    // operators.GlobalWindow (range-partition + prefix offsets), so no
    // task ever holds the whole corpus; the per-pack audit is one
    // partial-aggregated groupBy.
    "q77_pack_sequences" -> ((s, dir) => {
      val budget = 2048L
      val d = Tables.documents(s, dir)
        .select(col("doc_id"),
          size(TextQueries.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.GlobalWindow.rankedRunningSum(
          d, Seq(col("doc_id").asc), col("n_tokens"),
          "rank", "cum", "total")
        .withColumn("pack_id", floor((col("cum") - col("n_tokens")) / budget))
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("pack_id"))
    }),

    // q50's sampling semantics through the bounded top-k AGGREGATE
    // (functions.TopK) instead of a window: per language, the 5 docs with
    // the smallest portable hash — the same consistent sample, but
    // map-side ≤k heaps mean the shuffle carries O(langs·k·partitions)
    // rows where q50's window shuffles and sorts every document. The
    // hash is compared as DOUBLE in both engines (same IEEE rounding), so
    // selection is bit-identical to the oracle's window replay.
    "q82_sample_topk_agg" -> ((s, dir) => {
      val topk = graft.functions.TopK.topK(5)
      Tables.documents(s, dir)
        .select(col("lang"),
          (-Dedup.portableHash60(col("doc_id").cast("string")).cast("double"))
            .as("score"),
          col("doc_id").cast("string").as("key"))
        .groupBy(col("lang"))
        .agg(topk(col("score"), col("key")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("sample_rank"),
          col("col.key").as("doc_id"))
        .orderBy(col("lang"), col("sample_rank"))
    }),
  )

  private val wordPat = graft.functions.Text.wordPat

  val oracles: Map[String, String] = Map(
    "q82_sample_topk_agg" ->
      """SELECT lang, sample_rank, doc_id FROM (
        |  SELECT lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      -CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE) DESC,
        |      CAST(doc_id AS VARCHAR) ASC) AS sample_rank,
        |    CAST(doc_id AS VARCHAR) AS doc_id
        |  FROM documents) t
        |WHERE sample_rank <= 5
        |ORDER BY lang, sample_rank""".stripMargin,

    "q77_pack_sequences" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(lower(text), '$wordPat')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM d)
         |SELECT CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY pack_id ORDER BY pack_id""".stripMargin,

    "q50_stratified_sample" ->
      """SELECT lang, doc_id, CAST(rk AS BIGINT) AS sample_rank FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
        |               doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 30
        |ORDER BY lang, sample_rank""".stripMargin,

    "q51_quantile_calibration" ->
      """SELECT lang,
        |  round(quantile_cont(n_chars, [0.5, 0.9])[1], 4) AS p50_chars,
        |  round(quantile_cont(n_chars, [0.5, 0.9])[2], 4) AS p90_chars,
        |  count(*) AS n_docs
        |FROM (SELECT lang, CAST(length(text) AS DOUBLE) AS n_chars FROM documents) t
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q52_bigrams" ->
      s"""WITH tk AS (
        |  SELECT regexp_extract_all(lower(text), '$wordPat') AS tk FROM documents),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(tk)),
        |    i -> tk[i] || ' ' || tk[i + 1])) AS bigram
        |  FROM tk WHERE len(tk) >= 2)
        |SELECT bigram, count(*) AS n
        |FROM bg GROUP BY bigram
        |ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin,

    "q53_quantize_int8" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, scale,
        |    list_transform(v, x -> CAST(
        |      CASE WHEN scale IS NULL OR scale = 0 THEN 0
        |           WHEN x / scale >= 0 THEN floor(x / scale + 0.5)
        |           ELSE ceil(x / scale - 0.5) END AS BIGINT)) AS q
        |  FROM v)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  CAST(list_sum(q) AS BIGINT) AS qsum,
        |  list_max(q) AS qmax,
        |  list_min(q) AS qmin
        |FROM q ORDER BY vec_id""".stripMargin,

    "q63_domain_mixture" ->
      s"""WITH agg AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |    CAST(sum(len(regexp_extract_all(lower(text), '$wordPat'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang, source),
        |w AS (
        |  SELECT *, CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(18,4)) AS w_dec FROM agg),
        |t AS (SELECT sum(w_dec) AS tw, sum(n_tokens) AS tt FROM w)
        |SELECT lang, source, n_docs, n_tokens,
        |  round(CAST(w_dec AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS weight,
        |  n_tokens / CAST(tt AS DOUBLE) AS token_share
        |FROM w, t ORDER BY lang, source""".stripMargin,

    "q67_length_outliers" ->
      """WITH st AS (
        |  SELECT lang, count(*) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS cs,
        |    CAST(sum(n_chars * n_chars) AS DOUBLE) AS css
        |  FROM documents GROUP BY lang),
        |m AS (
        |  SELECT lang,
        |    cs / CAST(n AS DOUBLE) AS mean,
        |    sqrt(css / CAST(n AS DOUBLE)
        |      - (cs / CAST(n AS DOUBLE)) * (cs / CAST(n AS DOUBLE))) AS std
        |  FROM st)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |  round((d.n_chars - m.mean) / m.std, 6) AS z
        |FROM documents d JOIN m USING (lang)
        |WHERE abs(d.n_chars - m.mean) > 1.5 * m.std
        |ORDER BY d.doc_id""".stripMargin,

    "q94_train_order" ->
      """WITH seeded AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 16 AS shard,
        |    ('0x' || substr(md5('seed42:' || doc_id::VARCHAR), 1, 15))::BIGINT AS order_key
        |  FROM documents)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY order_key, doc_id)
        |    AS BIGINT) AS position
        |FROM seeded ORDER BY shard, position""".stripMargin,

    "q64_shard_assign" ->
      s"""SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 16 AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(lower(text), '$wordPat'))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY shard ORDER BY shard""".stripMargin,
  )
}
