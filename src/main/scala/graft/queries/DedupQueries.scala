package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sources.Tables

/** Deduplication ladder over `documents` (SURVEY §2 pipeline extensions):
  * exact hash dedup, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup. ALL variants are fully hash-oracle-checked:
  * MinHash rides the portable md5-affine permutation family and SimHash a
  * portable md5 bit mixer (graft.dedup.Dedup), both of which DuckDB
  * reproduces exactly in SQL — q36/q37 match rows+schema+hash, not just
  * row counts.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Exact dedup: the corpus unioned with a shifted copy of itself — every
    // fingerprint group must collapse to size 2 with the original id as
    // representative (M1 MERGE-dedup semantics, ingestion.py:194-487).
    "q34_exact_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val copy = d.withColumn("doc_id", col("doc_id") + 1000000)
      Dedup.exactDedup(d.unionAll(copy), "doc_id", "text")
        .select(col("fingerprint"), col("rep_id"), col("group_size"))
        .orderBy(col("rep_id"))
    }),

    // Exact n-gram Jaccard near-dup pairs (verify kernel of the LSH path).
    "q35_jaccard_pairs" -> ((s, dir) => {
      Dedup.exactJaccardPairs(
          Tables.documents(s, dir).where(col("doc_id") < 120),
          "doc_id", "text", shingleK = 4, minJaccard = 0.35)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // MinHash + banded LSH candidate generation, Jaccard-verified.
    // Oracle-checked via the portable md5-derived hash family (same BIGINT
    // values in DuckDB); xxhash64 stays the scale path, and MinhashSpec
    // asserts both variants' recall against the exact q35 kernel.
    "q36_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashNearDups(
          Tables.documents(s, dir).where(col("doc_id") < 120),
          "doc_id", "text", shingleK = 4, numHashes = 32, bands = 16,
          minJaccard = 0.35, portable = true)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // SimHash fingerprints + Hamming-near pairs, oracle-checked via the
    // portable 60-bit hash family.
    "q37_simhash" -> ((s, dir) => {
      // The 200-row fingerprint table is checkpointed so the pair join
      // reads it twice without recomputing the tokenize+aggregate twice.
      val fp = Dedup.simhash64(
        Tables.documents(s, dir).where(col("doc_id") < 200), "doc_id", "text",
        portable = true)
        .localCheckpoint(true)
      val a = fp.toDF("a_id", "a_fp")
      val b = fp.toDF("b_id", "b_fp")
      a.join(b, col("a_id") < col("b_id"))
        .withColumn("hamming", Dedup.hamming64(col("a_fp"), col("b_fp")).cast("long"))
        .where(col("hamming") <= 12)
        .select(col("a_id"), col("b_id"), col("hamming"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Embedding-cosine near-dup: per probe vector, its top-3 nearest
    // neighbors (ANN brute-force baseline; the reference V3 match kernel).
    "q38_embed_neardup" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(
        col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val probes = e.where(col("vec_id") < 10).toDF("a_id", "a_emb")
      val cands = e.toDF("b_id", "b_emb")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("a_id"))
        .orderBy(col("sim").desc, col("b_id").asc)
      probes.join(cands, col("a_id") =!= col("b_id"))
        .withColumn("sim",
          round(graft.functions.VectorOps.cosine(col("a_emb"), col("b_emb")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("a_id"), col("rn"), col("b_id"), col("sim"))
        .orderBy(col("a_id"), col("rn"))
    }),

    // Asymmetric containment dedup: C(A,B) = |A∩B| / min(|A|,|B|) — the
    // near-superset detector (a doc quoted inside a larger one scores ≈1
    // here while its symmetric Jaccard can be arbitrarily low). Same
    // inverted-index shape as q35.
    "q58_containment" -> ((s, dir) => {
      Dedup.containmentPairs(
          Tables.documents(s, dir).where(col("doc_id") < 120),
          "doc_id", "text", shingleK = 4, minContainment = 0.5)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // End-to-end near-dup clustering: the q36 LSH pair set closed under
    // transitivity (connected components) with one canonical doc per
    // cluster — the complete "keep one per duplicate family" dedup step.
    // Oracle: q36's SQL pair replay + a recursive-CTE closure (q48 shape).
    "q61_neardup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashNearDups(
          Tables.documents(s, dir).where(col("doc_id") < 120),
          "doc_id", "text", shingleK = 4, numHashes = 32, bands = 16,
          minJaccard = 0.35, portable = true)
        .select(col("a_id"), col("b_id"))
      Dedup.dedupClusters(pairs).orderBy(col("doc_id"))
    }),

    // Benchmark decontamination: training docs sharing a word 4-gram with
    // the held-out eval slice (doc_id ≡ 0 mod 40) — the n-gram-overlap
    // test-set leak check, with the eval n-gram set broadcast.
    "q62_decontaminate" -> ((s, dir) => {
      Dedup.decontaminationHits(Tables.documents(s, dir), "doc_id", "text",
          isEval = col("doc_id") % 40 === 0, n = 4)
        .orderBy(col("doc_id"))
    }),

    // Cross-document boilerplate (line-dedup analog for unstructured text):
    // per doc, the fraction of its distinct 8-token windows that also occur
    // in at least one OTHER document. The wide window-string table shuffles
    // ONCE: n_windows per doc is scan-side (size of the distinct array —
    // no shuffle), and since (doc, window) rows are distinct,
    // n_shared = n_windows − (windows owned by exactly this doc alone), so
    // one partial-aggregated groupBy(window) → filter n_docs=1 →
    // tiny per-doc count replaces the join-back of every (doc, window)
    // row. The per-doc join at the end is one row per doc on both sides.
    "q72_boilerplate" -> ((s, dir) => {
      val win = 8
      val tk = graft.functions.Text.tokens(col("text"))
      // Windows travel as 64-bit xxhash64 FINGERPRINTS, never as strings:
      // an 8-token window string is ~50 bytes, and at sf10 the corpus has
      // ~10^9 distinct windows — checkpointing and shuffling the strings
      // moved ~50 GB per run (measured: the single biggest litter/spill
      // source in the first sf10 audit). The fingerprint is 8 bytes, the
      // distinct/groupBy/ownership logic is identical over it, and a
      // 64-bit collision (≈2.7% chance of ONE among 10^9 windows) shifts
      // one doc's shared_frac by one window — far below the signal; at
      // the sf0.01 oracle gate the collision probability is ~1e-7.
      // The window STRING isn't even built scan-side: xxhash64 chains the
      // 8 tokens directly (tuple ↔ joined-string bijective — tokens carry
      // no whitespace), dropping ~10^9 ~50 B allocations per run.
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), tk.as("tk"))
        .where(size(col("tk")) >= win)
        .select(col("doc_id"), array_distinct(
          transform(sequence(lit(1), size(col("tk")) - (win - 1)),
            i => xxhash64((0 until win).map(j => element_at(col("tk"), i + lit(j))): _*))).as("ws"))
        .localCheckpoint(true) // feeds the explode AND the per-doc sizes
      // min(doc_id) is well-defined as "the owner" only when n_docs = 1.
      val uniq = docs.select(col("doc_id"), explode(col("ws")).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("doc_id"))
        .where(col("n_docs") === 1)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_unique"))
      docs.select(col("doc_id"), size(col("ws")).cast("long").as("n_windows"))
        .join(uniq, Seq("doc_id"), "left")
        .withColumn("n_shared",
          col("n_windows") - coalesce(col("n_unique"), lit(0L)))
        .select(col("doc_id"), col("n_windows"), col("n_shared"),
          (col("n_shared").cast("double") / col("n_windows").cast("double"))
            .as("shared_frac"))
        .orderBy(col("doc_id"))
    }),

    // Substring-dedup EXCISION MASK (Lee et al. 2021, arXiv:2107.06499 —
    // the remove-the-span step their suffix array drives, n-gram-hashed
    // here): which token POSITIONS of each doc are covered by an 8-token
    // span that also occurs in ≥2 distinct documents. q72 reports the
    // distinct-window SIGNAL; this produces the removal mask — a doc can
    // share 90% of its windows but have 100% position coverage, and the
    // mask is what a rewrite pass consumes. Coverage = |union of [pos,
    // pos+7] hit intervals|, computed as countDistinct over the exploded
    // position ranges (set-union semantics, no interval-merge window — the
    // ×8 blowup is a constant, and the per-doc partial agg collapses it
    // map-side). Shuffles: one gram→distinct-doc-count (map-side combined,
    // distinct-gram wire), one AQE-sized join of hits to the repeated-gram
    // set, one per-doc partial agg. All corpus-linear.
    "q96_span_coverage" -> ((s, dir) => {
      val win = 8
      val tk = graft.functions.Text.tokens(col("text"))
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), tk.as("tk"))
        .where(size(col("tk")) >= win)
        .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
          // grams ride as 64-bit fingerprints (same rationale + collision
          // math as q72: strings are ~50 B each and dominate checkpoint +
          // shuffle bytes at 10^9 grams; the hash is 8 — and hashed from
          // the token tuple directly, the string is never allocated).
          transform(sequence(lit(1), size(col("tk")) - (win - 1)),
            i => struct(i.as("pos"),
              xxhash64((0 until win).map(j => element_at(col("tk"), i + lit(j))): _*).as("g"))).as("gs"))
        .localCheckpoint(true) // feeds gram explode AND the final join
      val grams = docs.select(col("doc_id"), explode(col("gs")).as("s"))
        .select(col("doc_id"), col("s.pos").as("pos"), col("s.g").as("g"))
      val rep = grams.groupBy(col("g"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .where(col("n_docs") >= 2)
        .select(col("g"))
      // Coverage = |union of [pos, pos+7] over shared positions|. The
      // first cut exploded the 8 covered positions of every shared gram
      // and countDistinct-ed them — an 8× row multiplier through a second
      // expand-shaped shuffle. For SORTED distinct starts the union
      // length is closed-form: Σ min(p_{i+1} − p_i, win) + win, so one
      // collect_list per doc (no multiplier, no distinct) computes it
      // exactly; per-doc array size is bounded by token count.
      val covered = grams.join(rep, "g")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("pos"))).as("ps"))
        .select(col("doc_id"),
          (aggregate(
            zip_with(
              slice(col("ps"), lit(1), size(col("ps")) - 1),
              slice(col("ps"), lit(2), size(col("ps")) - 1),
              (a, b) => least(b - a, lit(win))),
            lit(0L), (acc, x) => acc + x) + lit(win)).as("n_covered"))
      docs.select(col("doc_id"), col("n_tokens"))
        .join(covered, Seq("doc_id"), "left")
        .withColumn("n_covered", coalesce(col("n_covered"), lit(0L)))
        .select(col("doc_id"), col("n_tokens"), col("n_covered"),
          round(col("n_covered").cast("double") / col("n_tokens"), 6)
            .as("covered_frac"))
        .orderBy(col("doc_id"))
    }),

    // Content-defined chunking (FastCDC/rsync shape): a chunk boundary
    // falls at position i (16 ≤ i < n) where the polynomial hash of the
    // trailing 16-char window ≡ 0 (mod 64) — boundaries move with content,
    // so an insertion re-chunks only its neighborhood (the property that
    // makes CDC the dedup-at-scale primitive). Purely scan-shaped: every
    // boundary is computed row-locally, no shuffle at any corpus size.
    // All arithmetic is the q56 portable rolling hash.
    "q73_cdc_chunks" -> ((s, dir) => {
      val p = 2147483647L
      val n = length(col("text"))
      def winHash(i: Column): Column =
        aggregate(transform(sequence(i - 15, i), j =>
            ascii(col("text").substr(j, lit(1))).cast("long")),
          lit(0L), (acc, c) => (acc * 131L + c) % lit(p))
      val bounds = when(n >= 17,
        filter(transform(sequence(lit(16), n - 1), i =>
            when(winHash(i) % 64 === 0, i).otherwise(lit(null).cast("int"))),
          x => x.isNotNull))
        .otherwise(array().cast("array<int>"))
      Tables.documents(s, dir)
        .select(col("doc_id"), n.cast("long").as("n_chars"), bounds.as("bounds"))
        .select(col("doc_id"), col("n_chars"),
          (size(col("bounds")) + 1).cast("long").as("n_chunks"),
          try_element_at(col("bounds"), lit(1)).cast("long").as("first_boundary"),
          (col("n_chars").cast("double") / (size(col("bounds")) + 1))
            .as("mean_chunk_len"))
        .orderBy(col("doc_id"))
    }),
  )

  private val wordPat = graft.functions.Text.wordPat

  val oracles: Map[String, String] = Map(
    "q72_boilerplate" ->
      s"""WITH tk AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '$wordPat') AS tk
         |  FROM documents),
         |w AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 6),
         |    i -> array_to_string(tk[i : i + 7], ' ')))) AS w
         |  FROM tk WHERE len(tk) >= 8),
         |c AS (SELECT w, count(*) AS n_docs FROM w GROUP BY w)
         |SELECT doc_id, count(*) AS n_windows,
         |  CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS shared_frac
         |FROM w JOIN c USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q73_cdc_chunks" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |    CASE WHEN length(text) >= 17 THEN
        |      list_filter(range(16, length(text)), i ->
        |        list_reduce(
        |          list_transform(range(i - 15, i + 1),
        |            j -> CAST(ord(substring(text, j, 1)) AS BIGINT)),
        |          (acc, c) -> (acc * 131 + c) % 2147483647) % 64 = 0)
        |    ELSE [] END AS bounds
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(len(bounds) + 1 AS BIGINT) AS n_chunks,
        |  CAST(bounds[1] AS BIGINT) AS first_boundary,
        |  CAST(n_chars AS DOUBLE) / (len(bounds) + 1) AS mean_chunk_len
        |FROM b ORDER BY doc_id""".stripMargin,

    "q34_exact_dedup" ->
      """SELECT md5(lower(trim(text))) AS fingerprint,
        |  min(doc_id) AS rep_id, count(*) AS group_size
        |FROM (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents) t
        |GROUP BY fingerprint ORDER BY rep_id""".stripMargin,

    "q35_jaccard_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(length(text) - 3, 1)),
        |      i -> substring(text, i, 4))) AS sh
        |  FROM documents WHERE doc_id < 120)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(len(list_intersect(a.sh, b.sh))
        |    / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE round(len(list_intersect(a.sh, b.sh))
        |    / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) >= 0.35
        |ORDER BY a_id, b_id""".stripMargin,

    "q36_minhash_lsh" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(length(text) - 3, 1)),
        |      i -> substring(text, i, 4))) AS sh
        |  FROM documents WHERE doc_id < 120),
        |hs AS (
        |  SELECT doc_id, sh,
        |    list_transform(sh, s ->
        |      ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS hs
        |  FROM sh),
        |sig AS (
        |  SELECT doc_id, sh,
        |    list_transform(generate_series(0, 31), j ->
        |      list_min(list_transform(hs, h ->
        |        ((1 + ((j + 1) * 2654435761) % 2147483646) * h
        |         + ((j + 1) * 2246822519) % 2147483647) % 2147483647))) AS sig
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, sh, b,
        |    array_to_string(sig[b * 2 + 1 : b * 2 + 2], ',') AS bk
        |  FROM sig, (SELECT unnest(generate_series(0, 15)) AS b) bs),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.sh AS a_sh, b.sh AS b_sh
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id,
        |  round(len(list_intersect(a_sh, b_sh))
        |    / CAST(len(list_distinct(list_concat(a_sh, b_sh))) AS DOUBLE), 6) AS jaccard
        |FROM cand
        |WHERE round(len(list_intersect(a_sh, b_sh))
        |    / CAST(len(list_distinct(list_concat(a_sh, b_sh))) AS DOUBLE), 6) >= 0.35
        |ORDER BY a_id, b_id""".stripMargin,

    "q37_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents WHERE doc_id < 200),
        |h AS (
        |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        |votes AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h, (SELECT unnest(generate_series(0, 59)) AS b) bs
        |  GROUP BY doc_id, b),
        |fp AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS fp
        |  FROM votes GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 12
        |ORDER BY a_id, b_id""".stripMargin,

    "q38_embed_neardup" ->
      """SELECT a_id, rn, b_id, sim FROM (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) DESC,
        |               b.vec_id ASC) AS rn
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND a.vec_id != b.vec_id) t
        |WHERE rn <= 3 ORDER BY a_id, rn""".stripMargin,

    "q61_neardup_clusters" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(length(text) - 3, 1)),
        |      i -> substring(text, i, 4))) AS sh
        |  FROM documents WHERE doc_id < 120),
        |hs AS (
        |  SELECT doc_id, sh,
        |    list_transform(sh, s ->
        |      ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS hs
        |  FROM sh),
        |sig AS (
        |  SELECT doc_id, sh,
        |    list_transform(generate_series(0, 31), j ->
        |      list_min(list_transform(hs, h ->
        |        ((1 + ((j + 1) * 2654435761) % 2147483646) * h
        |         + ((j + 1) * 2246822519) % 2147483647) % 2147483647))) AS sig
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, sh, b,
        |    array_to_string(sig[b * 2 + 1 : b * 2 + 2], ',') AS bk
        |  FROM sig, (SELECT unnest(generate_series(0, 15)) AS b) bs),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.sh AS a_sh, b.sh AS b_sh
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id),
        |pairs AS (
        |  SELECT a_id, b_id FROM cand
        |  WHERE round(len(list_intersect(a_sh, b_sh))
        |    / CAST(len(list_distinct(list_concat(a_sh, b_sh))) AS DOUBLE), 6) >= 0.35),
        |und AS (
        |  SELECT a_id AS node, b_id AS next FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        |nodes AS (SELECT DISTINCT node FROM und),
        |reach(node, r) AS (
        |  SELECT node, node AS r FROM nodes
        |  UNION
        |  SELECT u.next AS node, re.r FROM reach re JOIN und u ON u.node = re.node),
        |comp AS (SELECT node AS doc_id, min(r) AS canonical_id FROM reach GROUP BY node),
        |sizes AS (SELECT canonical_id, count(*) AS cluster_size FROM comp GROUP BY 1)
        |SELECT c.doc_id, c.canonical_id, s.cluster_size,
        |  CAST(c.doc_id = c.canonical_id AS INT) AS is_canonical
        |FROM comp c JOIN sizes s USING (canonical_id) ORDER BY doc_id""".stripMargin,

    "q62_decontaminate" ->
      s"""WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '$wordPat') AS tk FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(tk) - 3),
        |      i -> array_to_string(tk[i : i + 3], ' '))) AS g
        |  FROM toks WHERE len(tk) >= 4),
        |eg AS (SELECT unnest(g) AS gram, doc_id AS eval_id FROM grams WHERE doc_id % 40 = 0),
        |egm AS (SELECT gram, min(eval_id) AS first_eval_id FROM eg GROUP BY gram),
        |tg AS (SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 40 != 0)
        |SELECT doc_id, count(*) AS n_hits, min(first_eval_id) AS first_eval_id
        |FROM tg JOIN egm USING (gram) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q96_span_coverage" ->
      s"""WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '$wordPat') AS tk FROM documents),
        |d AS (SELECT doc_id, len(tk) AS n_tokens, tk FROM toks WHERE len(tk) >= 8),
        |grams AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 7),
        |    i -> {'pos': i, 'g': array_to_string(tk[i : i + 7], ' ')}), recursive := true)
        |  FROM d),
        |rep AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (
        |  SELECT doc_id, count(DISTINCT cp) AS n_covered
        |  FROM (SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS cp
        |        FROM grams JOIN rep USING (g))
        |  GROUP BY doc_id)
        |SELECT d.doc_id, d.n_tokens, coalesce(cov.n_covered, 0) AS n_covered,
        |  round(coalesce(cov.n_covered, 0) / CAST(d.n_tokens AS DOUBLE), 6) AS covered_frac
        |FROM d LEFT JOIN cov USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q58_containment" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(length(text) - 3, 1)),
        |      i -> substring(text, i, 4))) AS sh
        |  FROM documents WHERE doc_id < 120)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(len(list_intersect(a.sh, b.sh))
        |    / CAST(least(len(a.sh), len(b.sh)) AS DOUBLE), 6) AS containment
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE round(len(list_intersect(a.sh, b.sh))
        |    / CAST(least(len(a.sh), len(b.sh)) AS DOUBLE), 6) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
  )
}
