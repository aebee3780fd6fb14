package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Training-data-pipeline operators: sessionization (stateful-stream shape),
  * document chunking (reference S2/S3 as `flatMap`/`sequence` fan-out), and
  * multimodal binary-column plumbing with a stubbed decode.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Sessionization: 30-min-gap sessions per user — the batch-equivalent
    // of flatMapGroupsWithState sessionization (§2.12); gap math in epoch
    // micros so Spark and DuckDB agree on sub-second timestamps.
    "q39_sessionize" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val flagged = e
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1)
            .otherwise(0))
      val sessions = flagged
        .withColumn("session_id", sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("session_events"))
      sessions.groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_sessions"),
          sum(col("session_events")).as("n_events"),
          max(col("session_events")).as("max_session_events"))
        .orderBy(col("user_id"))
    }),

    // Fixed-window word chunker with overlap, fully declarative:
    // sequence() fan-out + slice(), the scale path of the S2 chunker
    // (1 doc → N chunk rows with no UDF).
    "q40_chunker" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("toks", TextQueries.tokens(col("text")))
        .withColumn("n_words", size(col("toks")))
        .where(col("n_words") > 0)
      d.select(col("doc_id"), col("toks"), col("n_words"),
          explode(sequence(lit(0), floor((col("n_words") - 1) / 30).cast("int"))).as("chunk_idx"))
        .where(col("chunk_idx") * 30 < col("n_words"))
        .select(
          col("doc_id"),
          col("chunk_idx").cast("long").as("chunk_idx"),
          size(slice(col("toks"), (col("chunk_idx") * 30 + 1).cast("int"), lit(40)))
            .as("word_count"),
          element_at(col("toks"), (col("chunk_idx") * 30 + 1).cast("int")).as("first_word"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Smart boundary-priority chunker (reference S2 semantics) as a typed
    // Dataset.flatMap — rows-only driver check; ChunkerSpec asserts offsets,
    // overlap and boundary ranking on fixtures.
    "q41_smart_chunker" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
      docs.flatMap { case (id, text) =>
        graft.ingest.Chunker.chunk(text, minWords = 20, maxWords = 40, overlapWords = 5)
          .map(c => (id, c.chunkNumber.toLong, c.startChar.toLong, c.endChar.toLong,
            c.wordCount.toLong, c.boundaryType))
      }.toDF("doc_id", "chunk_number", "start_char", "end_char", "word_count", "boundary_type")
        .orderBy(col("doc_id"), col("chunk_number"))
    }),

    // Multimodal plumbing: text → binary "asset" column + typed metadata,
    // with the decode step a deterministic stub (no image libs in this
    // container) — the schema/partitioning/batch shape is the real part
    // (reference S9 binary assets, api/app/lib/garage_client.py).
    "q42_multimodal" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("asset", to_binary(col("text"), lit("utf-8")))
      d.select(
          col("doc_id"),
          length(col("asset")).cast("long").as("n_bytes"),
          // stubbed "decoded" metadata: deterministic fake dimensions
          (lit(320) + (length(col("asset")) * 7) % 1280).cast("long").as("fake_width"),
          (lit(240) + (length(col("asset")) * 13) % 720).cast("long").as("fake_height"),
          substring(hex(col("asset")), 1, 8).as("magic"))
        .orderBy(col("doc_id"))
    }),
    // Multimodal frame sampling: one binary "video" asset → N frame rows
    // (sequence fan-out; the Spark-side shape of decode-and-sample, with
    // the codec stubbed deterministically — real decoders plug into the
    // same flatMap/mapInPandas batch shape).
    "q54_frame_sample" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("asset", to_binary(col("text"), lit("utf-8")))
        .withColumn("n_bytes", length(col("asset")).cast("long"))
        // stub "container metadata": frame count from asset size, ≤ 8
        .withColumn("n_frames", least(expr("n_bytes div 100 + 1"), lit(8L)))
      d.select(col("doc_id"), col("n_bytes"),
          explode(sequence(lit(0L), col("n_frames") - 1L)).as("frame_idx"))
        .withColumn("ts_ms", expr("frame_idx * 1000 div 24")) // 24 fps clock
        .withColumn("frame_key",
          graft.dedup.Dedup.portableHash60(
            concat_ws(":", col("doc_id"), col("frame_idx"))) % 1000000L)
        .select(col("doc_id"), col("frame_idx"), col("ts_ms"),
          col("n_bytes"), col("frame_key"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),
    // PII scrub (C4/Dolma-style redaction pass): detect and redact
    // emails, phone numbers, and IPv4s; emit per-doc detection counts and
    // the redacted length. The corpus is synthetic word soup with no
    // natural PII, so the query injects a deterministic PII tail derived
    // from doc_id (identically in the oracle) — the assertion is that the
    // regex kernels FIND and REMOVE exactly what was planted, with a
    // count that varies per row (doc_id % 3 extra emails). Purely
    // scan-shaped: regexes are row-local, no shuffle at any corpus size;
    // patterns chosen for identical Java-regex/RE2 semantics.
    "q74_pii_scrub" -> ((s, dir) => {
      val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phonePat = "\\b555-[0-9]{4}\\b"
      val ipPat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com"),
        repeat(concat(lit(" cc"), col("doc_id"), lit("@test.org")),
          (col("doc_id") % 3).cast("int")),
        lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), (col("doc_id") % 100).cast("string"), lit(" end"))
      Tables.documents(s, dir)
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("aug"), lit(emailPat), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("aug"), lit(phonePat), lit(0)))
            .cast("long").as("n_phones"),
          size(regexp_extract_all(col("aug"), lit(ipPat), lit(0)))
            .cast("long").as("n_ips"),
          length(regexp_replace(regexp_replace(regexp_replace(col("aug"),
            emailPat, "[EMAIL]"), phonePat, "[PHONE]"), ipPat, "[IP]"))
            .cast("long").as("redacted_len"))
        .orderBy(col("doc_id"))
    }),

    // Multimodal feature extraction (REAL, not stubbed): 16-bucket
    // character-class histogram per asset — the feature-vector shape a
    // decoder plugs into, as one explode + partial-aggregated groupBy
    // (long format: one row per non-empty bucket).
    "q57_feature_histogram" -> ((s, dir) => {
      Tables.documents(s, dir)
        .where(col("doc_id") < 200 && length(col("text")) > 0)
        .select(col("doc_id"),
          explode(expr(
            "transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1)) div 16)"))
            .as("bucket"))
        .groupBy(col("doc_id"), col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("doc_id"), col("bucket"))
    }),
  )

  /** SQL replay of the smart chunker (ingest.Chunker.chunk): words are
    * segmented by a char scan (start = non-space after space), each word's
    * cut-boundary quality is classified exactly like `boundaryAt`
    * (paragraph = gap contains a blank line, then sentence/pause
    * terminators, else hard; the final word's synthetic gap is a paragraph
    * break), and the greedy split loop is a recursive CTE whose per-step
    * argmax prefers the highest rank then the LATEST position — the same
    * tie-break as the Scala `r >= bestRank` scan.
    *
    * Known latent divergence: offsets here are codepoint-indexed while the
    * Scala chunker's are UTF-16 code units, so they'd differ on astral
    * (non-BMP) characters — the corpus is ASCII (verified at every SF). */
  private def smartChunkerOracleSql(minW: Int, maxW: Int, ovl: Int): String = {
    val ws = "(' ', chr(9), chr(10), chr(11), chr(12), chr(13))"
    def best(startExpr: String): String =
      s"""(SELECT b.w FROM bounds b WHERE b.doc_id = c.doc_id
         |       AND b.w BETWEEN least($startExpr + $minW, n.n_words) - 1
         |                   AND least($startExpr + $maxW, n.n_words) - 1
         |     ORDER BY b.rnk DESC, b.w DESC LIMIT 1)""".stripMargin
    s"""WITH RECURSIVE
       |chars AS MATERIALIZED (
       |  SELECT doc_id, i, substring(text, i, 1) AS c
       |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
       |        FROM documents WHERE length(text) > 0) t),
       |flags AS (
       |  SELECT doc_id, i,
       |    c IN $ws AS sp,
       |    coalesce(lag(c) OVER (PARTITION BY doc_id ORDER BY i), ' ') AS prevc
       |  FROM chars),
       |widx AS (
       |  SELECT doc_id, i, sp,
       |    sum(CASE WHEN NOT sp AND prevc IN $ws THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY i) - 1 AS w
       |  FROM flags),
       |words AS MATERIALIZED (
       |  SELECT doc_id, w, min(i) - 1 AS s0, max(i) AS e1
       |  FROM widx WHERE NOT sp GROUP BY doc_id, w),
       |nw AS MATERIALIZED (SELECT doc_id, count(*) AS n_words FROM words GROUP BY doc_id),
       |bounds AS MATERIALIZED (
       |  SELECT w.doc_id, w.w, w.s0, w.e1,
       |    CASE
       |      WHEN strpos(coalesce(g.gap, chr(10) || chr(10)), chr(10) || chr(10)) > 0 THEN 3
       |      WHEN w.lastc IN ('.', '!', '?') THEN 2
       |      WHEN w.lastc IN (',', ';', ':') THEN 1
       |      ELSE 0 END AS rnk,
       |    CASE
       |      WHEN strpos(coalesce(g.gap, chr(10) || chr(10)), chr(10) || chr(10)) > 0 THEN 'paragraph'
       |      WHEN w.lastc IN ('.', '!', '?') THEN 'sentence'
       |      WHEN w.lastc IN (',', ';', ':') THEN 'pause'
       |      ELSE 'hard' END AS btype
       |  FROM (
       |    SELECT ws.*, substring(d.text, ws.e1, 1) AS lastc
       |    FROM words ws JOIN documents d USING (doc_id)) w
       |  LEFT JOIN (
       |    SELECT a.doc_id, a.w,
       |      substring(d.text, a.e1 + 1, b.s0 + 1 - (a.e1 + 1)) AS gap
       |    FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.w = a.w + 1
       |    JOIN documents d ON d.doc_id = a.doc_id) g
       |  ON g.doc_id = w.doc_id AND g.w = w.w),
       |chunks(doc_id, chunk_no, start_w, best_w) AS (
       |  SELECT c.doc_id, 0, 0, ${best("0")}
       |  FROM nw n JOIN nw c USING (doc_id)
       |  UNION ALL
       |  SELECT c.doc_id, c.chunk_no + 1,
       |    greatest(c.best_w + 1 - $ovl, c.start_w + 1),
       |    ${best(s"greatest(c.best_w + 1 - $ovl, c.start_w + 1)")}
       |  FROM chunks c JOIN nw n USING (doc_id)
       |  WHERE c.best_w + 1 < n.n_words)
       |SELECT c.doc_id,
       |  CAST(c.chunk_no AS BIGINT) AS chunk_number,
       |  CAST(ws.s0 AS BIGINT) AS start_char,
       |  CAST(be.e1 AS BIGINT) AS end_char,
       |  CAST(c.best_w - c.start_w + 1 AS BIGINT) AS word_count,
       |  be.btype AS boundary_type
       |FROM chunks c
       |JOIN words ws ON ws.doc_id = c.doc_id AND ws.w = c.start_w
       |JOIN bounds be ON be.doc_id = c.doc_id AND be.w = c.best_w
       |ORDER BY c.doc_id, chunk_number""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q41_smart_chunker" -> smartChunkerOracleSql(minW = 20, maxW = 40, ovl = 5),

    "q74_pii_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id, text
        |    || ' contact user' || doc_id || '@example.com'
        |    || repeat(' cc' || doc_id || '@test.org', CAST(doc_id % 3 AS INT))
        |    || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    || ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
        |    || ' end' AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '\b555-[0-9]{4}\b')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(aug,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(length(regexp_replace(regexp_replace(regexp_replace(aug,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |    '\b555-[0-9]{4}\b', '[PHONE]', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g'))
        |    AS BIGINT) AS redacted_len
        |FROM aug ORDER BY doc_id""".stripMargin,

    "q57_feature_histogram" ->
      """SELECT doc_id,
        |  CAST(ord(substring(text, i, 1)) // 16 AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM (
        |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        |  FROM documents WHERE doc_id < 200 AND length(text) > 0) t
        |GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin,

    "q54_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |frames AS (
        |  SELECT doc_id, n_bytes,
        |    CAST(unnest(generate_series(0, least(n_bytes // 100 + 1, 8) - 1)) AS BIGINT)
        |      AS frame_idx
        |  FROM d)
        |SELECT doc_id, frame_idx,
        |  CAST(frame_idx * 1000 // 24 AS BIGINT) AS ts_ms,
        |  n_bytes,
        |  ('0x' || substr(md5(doc_id || ':' || frame_idx), 1, 15))::BIGINT
        |    % 1000000 AS frame_key
        |FROM frames
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q39_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id,
        |    epoch_us(ts::TIMESTAMP) AS us,
        |    lag(epoch_us(ts::TIMESTAMP), 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |sess AS (
        |  SELECT user_id,
        |    sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged),
        |per_session AS (
        |  SELECT user_id, session_id, count(*) AS session_events
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(session_events) AS BIGINT) AS n_events,
        |  max(session_events) AS max_session_events
        |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q40_chunker" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks,
        |    len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words
        |  FROM documents
        |  WHERE len(regexp_extract_all(lower(text), '[a-z]+')) > 0)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  len(toks[chunk_idx * 30 + 1 : chunk_idx * 30 + 40]) AS word_count,
        |  toks[chunk_idx * 30 + 1] AS first_word
        |FROM (
        |  SELECT doc_id, toks, n_words,
        |    unnest(generate_series(0, (n_words - 1) // 30)) AS chunk_idx
        |  FROM d) t
        |WHERE chunk_idx * 30 < n_words
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q42_multimodal" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(320 + (octet_length(encode(text)) * 7) % 1280 AS BIGINT) AS fake_width,
        |  CAST(240 + (octet_length(encode(text)) * 13) % 720 AS BIGINT) AS fake_height,
        |  substring(hex(encode(text)), 1, 8) AS magic
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
