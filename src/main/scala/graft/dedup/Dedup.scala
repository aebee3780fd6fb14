package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication primitives.
  *
  * Beyond the reference's own ingest-time dedup (content-hash of whole
  * documents + two-tier embedding match, api/app/lib/ingestion.py:432-507),
  * a 100 TB training-data pipeline needs the standard near-dup ladder:
  *
  *  - exact:   hash-groupBy on a normalized fingerprint (one shuffle)
  *  - MinHash: shingle → k independent min-hashes → banded LSH buckets →
  *             candidate pairs from bucket joins only (never all-pairs)
  *  - SimHash: 64-bit weighted-bit-vote fingerprint; near-dups differ in
  *             few bits
  *  - n-gram Jaccard: exact verify step for candidate pairs
  *
  * Everything is expressed as DataFrame transforms (no UDFs): shingling via
  * `sequence`/`transform`, hashing via codegen'd `xxhash64`/`hash`, so the
  * whole ladder stays in whole-stage codegen and scales by partitioning on
  * the hash keys.
  */
object Dedup {

  /** Normalized content fingerprint (exact dedup key). */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))

  /** Exact dedup: one row per distinct fingerprint, keeping the smallest id
    * as representative plus the group size. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("group_size"))

  /** Portable 60-bit hash: first 15 hex chars of md5 decoded to BIGINT.
    * The identical value is computable in DuckDB as
    * `('0x' || substr(md5(x),1,15))::BIGINT`, which makes the minhash /
    * simhash pipelines oracle-checkable cross-engine. `xxhash64` remains
    * the scale path (one codegen'd hash vs md5 + string decode). */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min hash value over the shingle set. Returns array<long>. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingleCol, sh => xxhash64(sh, seed))))

  /** Prime modulus + affine multipliers for the portable minhash family
    * h_j(x) = (a_j·h(x) + b_j) mod p over the base [[portableHash60]].
    * All arithmetic stays below 2^62, so BIGINT math is identical (and
    * overflow-free) in Spark and DuckDB. */
  val MinhashPrime: Long = 2147483647L // 2^31 - 1
  def minhashA(j: Int): Long = 1L + ((j + 1) * 2654435761L) % (MinhashPrime - 1)
  def minhashB(j: Int): Long = ((j + 1) * 2246822519L) % MinhashPrime

  /** Portable minhash signatures, one row per id, computed entirely
    * per-row: the base hash array is materialized ONCE per document (md5 is
    * the expensive part), then each of the `numHashes` seeds is an
    * `array_min` over a cheap affine transform of that array. No explode,
    * no aggregation, NO SHUFFLE — each document's signature is computed
    * where the document lives, which is the shape that survives 100 TB
    * (signature cost is O(shingles × seeds) arithmetic but only
    * O(shingles) hashing, all inside one codegen stage). */
  def portableMinhashSignatures(withShingles: DataFrame, numHashes: Int): DataFrame = {
    val p = MinhashPrime
    withShingles
      .select(col("id"),
        transform(col("sh"), sh => portableHash60(sh) % lit(p)).as("hs"))
      .select(col("id"),
        array((0 until numHashes).map { j =>
          array_min(transform(col("hs"),
            h => (lit(minhashA(j)) * h + lit(minhashB(j))) % lit(p)))
        }: _*).as("sig"))
  }

  /** LSH band keys: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band; docs sharing ANY band key become candidates.
    * `portable` keeps the raw comma-joined band string as the key (exactly
    * reproducible in SQL) instead of re-hashing it. */
  def lshBandKeys(sigCol: Column, bands: Int, rowsPerBand: Int,
      portable: Boolean = false): Column =
    transform(sequence(lit(0), lit(bands - 1)), b => {
      val bandStr = concat_ws(",",
        transform(slice(sigCol, b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")))
      if (portable) struct(b.as("band"), bandStr.as("key"))
      else struct(b.as("band"), xxhash64(bandStr).as("key"))
    })

  /** Candidate near-dup pairs via banded MinHash LSH, verified with exact
    * Jaccard over the shingle sets. Output: (a_id, b_id, jaccard).
    * The bucket join replaces the O(n²) all-pairs comparison: cost is
    * sum over buckets of |bucket|², shuffled by band key.
    *
    * `maxBucketSize`: skew guard for the |bucket|² term. At corpus scale a
    * DEGENERATE band key — millions of empty/boilerplate docs whose
    * signatures agree on a band — turns one bucket into a trillions-of-
    * pairs task. Buckets larger than the cap are dropped BEFORE the
    * self-join (one cheap count per bucket); the recall loss is bounded
    * and usually zero for genuine near-dups, because a pair colliding in
    * a pathological bucket still forms from ANY of its other bands,
    * while the mega-bucket's members (near-identical boilerplate) are
    * better handled by exact dedup upstream. Default None preserves the
    * complete-candidate contract q36's oracle replays. */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 4, numHashes: Int = 32, bands: Int = 8,
      minJaccard: Double = 0.5, portable: Boolean = false,
      maxBucketSize: Option[Int] = None): DataFrame = {
    // Materialized ONCE (same discipline as the affinity membership table):
    // the shingle table feeds the signature aggregation AND both sides of
    // the verification join — without the checkpoint the shingling (regex +
    // distinct over every document) re-executes three times. EAGER
    // localCheckpoint (here and at every other checkpoint in a query path):
    // a LAZY checkpoint can be first materialized by a broadcast-exchange
    // thread, and RDDCheckpointData.checkpoint() then takes the companion
    // lock before the RDD's monitor while the DAG event loop submitting a
    // concurrent job over the same RDD takes them in the OPPOSITE order —
    // an observed JVM deadlock (r19, this exact function under DedupSpec).
    // Eager materialization happens on the constructing thread before any
    // other job can reference the RDD, which closes the inversion window.
    val withShingles = df.select(
      col(idCol).as("id"),
      charShingles(col(textCol), shingleK).as("sh"))
      .localCheckpoint(true)
    val sigs =
      if (portable) portableMinhashSignatures(withShingles, numHashes)
      else withShingles.select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
    // The band fan-out and bucket self-join carry ONLY (id, band key):
    // exploding with the shingle arrays attached would replicate every
    // array `bands` times through the shuffle. The (typically rare)
    // candidate pairs re-join the shingle table for exact verification.
    // Also materialized once: both sides of the bucket self-join otherwise
    // re-run the whole signature aggregation. (id, band-key) rows are tiny —
    // `bands` rows per doc regardless of document size.
    val allBandRows = sigs
      .withColumn("bk", explode(lshBandKeys(col("sig"), bands, numHashes / bands, portable)))
      .select(col("id"), col("bk"))
      .localCheckpoint(true)
    val bandRows = maxBucketSize match {
      case Some(cap) =>
        // one partial-aggregated count per bucket, then a semi-join that
        // shares the band-key shuffle partitioning with the pair join
        val keep = allBandRows.groupBy(col("bk"))
          .agg(count(lit(1)).as("__bn")).where(col("__bn") <= cap)
          .select(col("bk"))
        allBandRows.join(keep, Seq("bk"), "left_semi")
      case None => allBandRows
    }
    val pairs = bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    pairs
      .join(withShingles.select(col("id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(withShingles.select(col("id").as("b_id"), col("sh").as("b_sh")), "b_id")
      // Round BEFORE thresholding (same 6-digit grid both engines compare
      // on) — filtering the unrounded value lets a pair that rounds up
      // across the threshold appear in the oracle but not here.
      .withColumn("jaccard", round(jaccard(col("a_sh"), col("b_sh")), 6))
      .where(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Exact Jaccard similarity of two array columns (inputs must already be
    * deduplicated, as [[charShingles]] guarantees): |A∩B| / (|A|+|B|−|A∩B|)
    * — derives the union size arithmetically instead of materializing
    * `array_union`, so only one intersection pass runs per pair (the
    * repeated subtree is eliminated by codegen CSE). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a).cast("double") + size(b).cast("double") - inter)
  }

  /** Exact all-pairs Jaccard above a threshold via an inverted shingle
    * index: explode shingles, self-join by shingle (pairs that share
    * nothing never form), count shared shingles per pair, derive the union
    * size from per-doc set sizes. No per-pair array intersection, no
    * broadcast of whole shingle arrays — the shuffle is keyed by shingle
    * and the pair aggregation map-side combines, which is the shape that
    * survives a large corpus (the threshold guarantees every surviving
    * pair shares ≥1 shingle, so the index join is lossless). */
  def exactJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 4, minJaccard: Double = 0.5): DataFrame =
    indexedPairs(df, idCol, textCol, shingleK,
      round(col("inter") / (col("a_n") + col("b_n") - col("inter")), 6),
      "jaccard", minJaccard)

  /** Inverted-index exact pair scoring. One shuffle builds the postings
    * (groupBy shingle → sorted id list); shingles owned by a single doc are
    * dropped BEFORE any pair materializes (on real corpora that is most of
    * them), and each surviving posting emits its C(k,2) ordered pairs
    * map-side — the self-join formulation this replaces shuffled the whole
    * inverted index twice and probed unique shingles for nothing. The pair
    * fan-out is TWO-LEVEL (posexplode the posting, then explode each
    * element's suffix slice), so no task ever materializes a hot shingle's
    * quadratic pair set as one value — peak per-row memory is O(posting),
    * the same as the posting row itself. Pair OUTPUT is still inherently
    * quadratic per hot shingle (it is in the self-join formulation too);
    * at corpus scale callers bound that with LSH banding
    * ([[minhashNearDups]]) or candidate scoping, not here. */
  private def indexedPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int, score: Column, scoreName: String,
      minScore: Double): DataFrame = {
    val d = df.select(col(idCol).as("id"),
        charShingles(col(textCol), shingleK).as("sh"))
      .localCheckpoint(true)
    val sizes = d.select(col("id"), size(col("sh")).as("n"))
    val postings = d.select(col("id"), explode(col("sh")).as("s"))
      .groupBy(col("s")).agg(array_sort(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) >= 2)
    val pairs = postings
      .select(col("ids"), posexplode(col("ids")))
      .select(col("col").as("a_id"),
        explode(slice(col("ids"), col("pos") + lit(2), size(col("ids")))).as("b_id"))
    pairs
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("a_id", "a_n"), "a_id")
      .join(sizes.toDF("b_id", "b_n"), "b_id")
      .withColumn(scoreName, score)
      .where(col(scoreName) >= minScore)
      .select(col("a_id"), col("b_id"), col(scoreName))
  }

  /** Exact all-pairs containment above a threshold, same inverted-index
    * shape as [[exactJaccardPairs]]: C(A,B) = |A∩B| / min(|A|,|B|). The
    * asymmetric-size dedup kernel — a document wholly embedded in a larger
    * one scores containment ≈ 1 while its Jaccard can be arbitrarily low,
    * so this catches the near-superset duplicates (quoted articles,
    * concatenated shards) that symmetric similarity misses. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 4, minContainment: Double = 0.8): DataFrame =
    indexedPairs(df, idCol, textCol, shingleK,
      round(col("inter") / least(col("a_n"), col("b_n")), 6),
      "containment", minContainment)

  /** Distinct character k-gram shingles of `text`. */
  def charShingles(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => text.substr(i, lit(k))))

  /** 64-bit SimHash over word tokens: each token's xxhash64 votes ±1 per
    * bit, weighted by term frequency; fingerprint bit b is 1 iff the vote
    * sum is positive. Near-dup docs have small Hamming distance.
    *
    * Shape: ONE shuffle. Per token occurrence the hash is computed once
    * and 64 `when` columns derive the per-bit votes, all inside one
    * codegen stage; a single groupBy(id) with 64 `sum`s partially
    * aggregates map-side, so the shuffle carries one 64-column row per
    * (doc × partition) — never a per-token or per-bit row. (Per-occurrence
    * ±1 votes sum to exactly the tf-weighted votes, so fingerprints are
    * bit-identical to the tf-grouped formulation but skip its extra
    * (id, token) shuffle and 64-way row fan-out.) */
  def simhash64(df: DataFrame, idCol: String, textCol: String,
      portable: Boolean = false): DataFrame = {
    val nBits = if (portable) 60 else 64
    val toks = df.select(col(idCol).as("id"),
        explode(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).as("tok"))
      .withColumn("h",
        if (portable) portableHash60(col("tok")) else xxhash64(col("tok")))
    // `b` is a Scala literal so shifts stay codegen'd.
    val voteSums = (0 until nBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v$b")
    }
    toks.groupBy(col("id"))
      .agg(voteSums.head, voteSums.tail: _*)
      .select(col("id"),
        (0 until nBits).map { b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _).as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** All pairs with Hamming(fp) ≤ `maxHamming` via pigeonhole banding —
    * the EQUI-JOIN form of the fingerprint pair search: split the
    * fingerprint into `maxHamming + 1` disjoint bit blocks; two
    * fingerprints within distance t must agree exactly on ≥1 block, so
    * candidates come from a shuffle join keyed by (block, value) and are
    * then verified exactly. No cross join at any scale. Pruning power is
    * the per-block value space (2^width), so this is the shape to use when
    * maxHamming is small relative to nBits — the all-pairs theta join is
    * only acceptable over an explicitly bounded probe set (see q37). */
  def hammingNearPairs(fp: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int, nBits: Int = 64): DataFrame = {
    val blocks = maxHamming + 1
    require(blocks <= nBits, s"need at least one bit per block ($blocks > $nBits)")
    val bandCols = (0 until blocks).map { b =>
      val lo = b * nBits / blocks
      val width = (b + 1) * nBits / blocks - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      struct(lit(b).as("b"),
        shiftright(col("fp"), lo).bitwiseAND(lit(mask)).as("v"))
    }
    val bands = fp.select(col(idCol).as("id"), col(fpCol).as("fp"))
      .withColumn("band", explode(array(bandCols: _*)))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.fp").as("a_fp"), col("b.fp").as("b_fp"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", hamming64(col("a_fp"), col("b_fp")).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Scala-side hamming distance (driver/test use). */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** End-to-end near-duplicate clustering: candidate pairs (from any of the
    * pair generators above) → connected components → one canonical
    * representative per cluster (the minimum numeric id — the same
    * representative rule as [[exactDedup]]'s `min(id)`). Transitivity is
    * the point: if A≈B and B≈C, all three land in one cluster even when
    * A and C were never a candidate pair, which is what lets a curation
    * pipeline keep exactly one doc per duplicate family. Components run on
    * GraphX (Pregel label propagation, or the in-memory union-find
    * accelerator below the auto-dispatch threshold); the output carries
    * only docs that appear in some pair — untouched docs are implicitly
    * their own singleton clusters and never shuffle.
    *
    * Input: (aCol, bCol) numeric id pairs. Output: (doc_id, canonical_id,
    * cluster_size, is_canonical 0/1), one row per clustered doc. */
  def dedupClusters(pairs: DataFrame,
      aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val edges = pairs.select(col(aCol).cast("string").as("src"),
      col(bCol).cast("string").as("dst"))
    // component is the min node NAME (a string — lexicographic): correct as
    // a grouping key, wrong as a numeric representative ("10" < "2"), so
    // the canonical id is re-derived numerically per component.
    val assign = graft.graph.GraphXOps.connectedComponentsAuto(edges)
      .select(col("node").cast("long").as("doc_id"), col("component"))
    val canon = assign.groupBy(col("component"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("cluster_size"))
    assign.join(canon, "component")
      .select(col("doc_id"), col("canonical_id"), col("cluster_size"),
        (col("doc_id") === col("canonical_id")).cast("int").as("is_canonical"))
  }

  /** Benchmark decontamination: flag training documents that share at least
    * one word `n`-gram with any document of the held-out eval set (the
    * standard n-gram-overlap test-set leak check run before training).
    * The eval side is aggregated to its distinct n-grams and BROADCAST —
    * an eval benchmark is small by definition while the training corpus is
    * the 100 TB side, so the contaminant check is a map-side semi-join with
    * no shuffle of training n-grams. Per contaminated doc: the number of
    * distinct shared n-grams and the smallest eval doc id sharing one.
    *
    * `isEval` is any boolean Column over `docs`' columns partitioning the
    * corpus into eval (true) and training (false) rows. Docs with fewer
    * than `n` tokens carry no n-grams and cannot collide.
    *
    * N-grams travel as 64-bit xxhash64 fingerprints of the window's token
    * TUPLE — the gram string is never built (same policy as the q72/q96
    * window kernels, where ~50-byte strings at 10^9 windows dominated
    * checkpoint + shuffle bytes; here they also dominated the explode and
    * the broadcast probe — measured 21 s → ~3 s warm at sf10). Tokens contain
    * no whitespace, so tuple ↔ joined-string is bijective and the
    * distinct-fingerprint counts equal the oracle's distinct-string
    * counts modulo 64-bit collisions. */
  def decontaminationHits(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, n: Int): DataFrame = {
    val tk = graft.functions.Text.tokens(col(textCol))
    // r20 (guide §1.2): the eval and training branches PARTITION the
    // corpus, so filtering each branch BEFORE the tokenize+gram kernel
    // does exactly one corpus's worth of gram work in total — the former
    // shared localCheckpoint also computed grams once but additionally
    // materialized every document's gram ARRAY to executor-local blocks
    // (the corpus-sized write this operator's 100 TB story cannot
    // afford). The isEval/!isEval predicates push into both scans; the
    // double column-pruned parquet scan is cheap next to the regex.
    //
    // The gram kernel is INLINED into the explode, never projected as a
    // named column first: InferFiltersFromGenerate turns an exploded
    // COLUMN into a pushed-down `size(col) > 0` filter whose pushdown
    // substitutes the column's full defining expression — the whole
    // tokenize+transform kernel then re-evaluates per row inside the
    // Filter (measured: 78 s vs 1.5 s at sf10). With the expression as
    // the generator child the rule does not fire and the kernel runs
    // once per row, in the Generate.
    // The <n-token guard lives INSIDE the expression (explode of an empty
    // array drops the row exactly like the old filter): a
    // `.where(size(tk) >= n)` would push below the tk projection and
    // re-evaluate the tokenizer per row in the Filter — tokenize ran 2×
    // per document that way (measured +10% at sf10).
    def explodedGrams(side: Column, asId: String): DataFrame = docs
      .where(side)
      .select(col(idCol).as(asId), tk.as("tk"))
      .select(col(asId),
        explode(when(size(col("tk")) >= n,
          array_distinct(transform(sequence(lit(1), size(col("tk")) - (n - 1)),
            i => xxhash64((0 until n).map(j => element_at(col("tk"), i + lit(j))): _*))))
          .otherwise(array().cast("array<long>")))
          .as("gram"))
    val evalGrams = explodedGrams(isEval, "eval_id")
      .groupBy(col("gram")).agg(min(col("eval_id")).as("first_eval_id"))
    val trainGrams = explodedGrams(!isEval, "doc_id")
    // g is array_distinct per doc and evalGrams is distinct per gram, so
    // count(*) below counts DISTINCT shared n-grams without an expensive
    // distinct aggregate.
    trainGrams.join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("first_eval_id")).as("first_eval_id"))
  }

  /** Incremental exact dedup: admit only the rows of `newDocs` whose
    * content fingerprint is NOT in the accumulated index — the
    * dedup-at-ingest shape for a growing corpus (the reference's
    * content-hash ingest check, api/app/services/content_hasher.py, made
    * incremental the way [[graft.core.Incremental]] makes aggregates
    * incremental). Returns (fresh, indexDelta):
    *
    *  - `fresh`: admitted rows, with batch-internal duplicates collapsed
    *    to the min-`idCol` representative (the [[exactDedup]] rule) — one
    *    fingerprint shuffle and a left-anti join; the CORPUS is never
    *    re-read or re-hashed, only its fingerprint index is touched.
    *  - `indexDelta`: the (fingerprint, rep_id) rows the caller appends to
    *    the index before the next epoch.
    *
    * At 100 TB: the index is one short row per corpus document. Stored
    * bucketed by fingerprint, the anti-join co-locates — the new epoch's
    * delta shuffles to the index's bucketing and the index itself never
    * moves; the epoch cost is O(delta + matching index buckets),
    * independent of corpus size. Pair with [[graft.core.SnapshotStore]]
    * for the index: a reader pins an immutable version, so `fresh` can be
    * materialized AFTER the delta append without re-admitting its own
    * fingerprints (DedupSpec proves the two-epoch round-trip). */
  def dedupAgainstIndex(newDocs: DataFrame, idCol: String, textCol: String,
      index: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val fp = newDocs.withColumn("fingerprint", fingerprint(col(textCol)))
    val novel = index match {
      case Some(ix) =>
        fp.join(ix.select(col("fingerprint")), Seq("fingerprint"), "left_anti")
      case None => fp
    }
    val cols = newDocs.columns
    val fresh = novel
      .groupBy(col("fingerprint"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("r"))
      .select(col("fingerprint") +: cols.map(c => col(s"r.$c")): _*)
    (fresh.drop("fingerprint"),
      fresh.select(col("fingerprint"), col(idCol).as("rep_id")))
  }
}
