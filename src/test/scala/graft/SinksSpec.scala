package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.sources.Sinks

/** Export + backup/restore sinks and the SQL extension registration. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("GEXF export writes well-formed XML with sizes and weights") {
    val nodes = Seq(("c1", "Way", 10L), ("c2", "Graph <&> Co", 1L))
      .toDF("id", "label", "instance_count")
    val edges = Seq(("c1", "c2", "SUPPORTS", 0.9)).toDF("src", "dst", "rel_type", "confidence")
    val path = Files.createTempDirectory("gexf").resolve("g.gexf").toString
    Sinks.writeGexf(nodes, edges, path)
    val xml = scala.xml.XML.loadFile(path) // parses → well-formed
    assert((xml \\ "node").size == 2)
    assert((xml \\ "edge").size == 1)
    assert(((xml \\ "edge").head \ "@weight").text == "0.9000")
    assert((xml \\ "node").map(n => (n \ "@label").text).contains("Graph <&> Co"))
  }

  test("backup writes snapshot + manifest; restore remaps colliding ids (S8)") {
    val dir = Files.createTempDirectory("bak").toString
    val concepts = Seq(("c1", "alpha"), ("c2", "beta")).toDF("concept_id", "label")
    val edges = Seq(("c1", "c2", "R")).toDF("src", "dst", "rel_type")
    val manifest = Sinks.backup(spark, Map("concepts" -> concepts, "edges" -> edges),
      dir, epoch = 7L)
    assert(manifest.count() == 2)

    val restoredRaw = spark.read.parquet(s"$dir/concepts")
    // target already holds c1 → collision; c2 is free
    val target = Seq(("c1", "existing")).toDF("concept_id", "label")
    val (restored, remap) = Sinks.restoreWithRemap(restoredRaw, target,
      "concept_id", suffix = "_r1")
    val ids = restored.select("concept_id").as[String].collect().toSet
    assert(ids == Set("c1_r1", "c2"))
    // FK remap follows
    val backEdges = spark.read.parquet(s"$dir/edges")
    val remapped = Sinks.remapColumn(
      Sinks.remapColumn(backEdges, "src", remap), "dst", remap)
    assert(remapped.select("src", "dst").as[(String, String)].collect().toSeq ==
      Seq(("c1_r1", "c2")))
  }

  test("binaryFile source reads opaque assets with metadata (S9)") {
    val dir = Files.createTempDirectory("assets")
    Files.write(dir.resolve("img1.bin"), Array[Byte](0x50, 0x4e, 0x47, 1, 2, 3))
    Files.write(dir.resolve("img2.bin"), Array[Byte](0x4a, 0x50))
    val df = spark.read.format("binaryFile").load(dir.toString)
    val rows = df.select("path", "length").as[(String, Long)].collect()
      .map { case (p, l) => p.split('/').last -> l }.toMap
    assert(rows == Map("img1.bin" -> 6L, "img2.bin" -> 2L))
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
  }

  test("cosine_similarity is SQL-callable after registration (2.13)") {
    // Extension-injection wiring (builder shape) + live registration on the
    // shared session; cluster deploys use
    // spark.sql.extensions=graft.GraftExtensions with the same builder.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val orth = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(0.0d, 2.0d)) AS c")
      .head().getDouble(0)
    assert(orth == 0.0)
  }

  test("graph TVFs are SQL-callable: SELECT * FROM graft_neighborhood(...) (2.13)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq(("a", "b", "R"), ("b", "c", "R"), ("c", "d", "R"), ("x", "y", "R"))
      .toDF("src", "dst", "rel_type")
      .createOrReplaceTempView("tvf_edges")
    // the graph_accel_neighborhood analog: set-returning SQL over a view
    val hood = spark.sql(
      "SELECT node, distance FROM graft_neighborhood('tvf_edges', 'a', 2) " +
        "WHERE distance > 0 ORDER BY distance, node")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(hood == Seq(("b", 1), ("c", 2)))
    val deg = spark.sql(
      "SELECT node, total_degree FROM graft_degree('tvf_edges') " +
        "ORDER BY total_degree DESC, node LIMIT 2")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(deg == Seq(("b", 2L), ("c", 2L)))
    // TVF output composes with ordinary SQL (joins/filters on the result)
    val sub = spark.sql(
      "SELECT count(*) FROM graft_subgraph('tvf_edges', 'a', 2)")
      .head().getLong(0)
    assert(sub == 2L) // a→b, b→c
    // shortest path as rows; status/invalidate round-trip
    val path = spark.sql(
      "SELECT step, node FROM graft_path('tvf_edges', 'a', 'd', 4) ORDER BY step")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(path == Seq((0, "a"), (1, "b"), (2, "c"), (3, "d")))
    // k-shortest paths as rows: 1 path only in this chain graph
    val paths = spark.sql(
      "SELECT path_idx, step, node FROM graft_paths('tvf_edges', 'a', 'c', 4, 3) " +
        "ORDER BY path_idx, step")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(paths == Seq((0, 0, "a"), (0, 1, "b"), (0, 2, "c")))
    val resident = spark.sql(
      "SELECT loaded_graphs FROM graft_accel_status()").head().getLong(0)
    assert(resident >= 1L) // the traversals above loaded the tiny graph
    assert(spark.sql("SELECT * FROM graft_accel_invalidate()").head().getBoolean(0))
    assert(spark.sql("SELECT loaded_graphs FROM graft_accel_status()")
      .head().getLong(0) == 0L)
    // load analog: explicit bulk-load after the invalidate re-populates;
    // a second call is an idempotent cache hit, not a false "not loaded"
    (1 to 2).foreach { _ =>
      val load = spark.sql(
        "SELECT loaded, resident_nodes FROM graft_accel_load('tvf_edges')")
        .head()
      assert(load.getBoolean(0) && load.getLong(1) == 6L) // a b c d x y
    }
  }

  test("snapshot TVFs time-travel from SQL: graft_snapshot VERSION-AS-OF (2.13)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("snap-tvf").toString
    val store = new graft.core.SnapshotStore(spark, root)
    store.commit("t", Seq((1L, "a")).toDF("id", "v"))
    store.commit("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // current snapshot, pinned time travel, and history — all from SQL
    assert(spark.sql(s"SELECT count(*) FROM graft_snapshot('$root', 't')")
      .head().getLong(0) == 2L)
    assert(spark.sql(s"SELECT v FROM graft_snapshot('$root', 't', 1)")
      .collect().map(_.getString(0)).toSeq == Seq("a"))
    val hist = spark.sql(
      s"SELECT version, is_latest FROM graft_snapshot_history('$root', 't') " +
        "ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(hist == Seq((1L, false), (2L, true)))
    // the TVF result composes with ordinary SQL, like every other TVF
    assert(spark.sql(
      s"SELECT count(*) FROM graft_snapshot('$root', 't') WHERE v = 'b'")
      .head().getLong(0) == 1L)
  }

  test("graft_changes reads the batch change feed from SQL (2.13)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("changes-tvf").toString
    val store = new graft.core.SnapshotStore(spark, root)
    store.append("t", Seq(1L).toDF("id"))
    store.append("t", Seq(2L).toDF("id"))
    assert(spark.sql(s"SELECT id, _version FROM graft_changes('$root', 't') " +
      "ORDER BY id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 1L), (2L, 2L)))
    assert(spark.sql(s"SELECT id FROM graft_changes('$root', 't', 1)")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("graft_change_feed reads the CDF with delete tags from SQL (2.13)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("cdf-tvf").toString
    val store = new graft.core.SnapshotStore(spark, root)
    store.append("t", Seq(1L, 2L).toDF("id"))
    store.append("t", Seq(3L).toDF("id"))
    store.delete("t", org.apache.spark.sql.functions.col("id") === 2L)
    assert(spark.sql(
      s"SELECT id, _change_type FROM graft_change_feed('$root', 't') " +
        "ORDER BY id, _change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "insert"), (2L, "delete"), (2L, "insert"), (3L, "insert")))
    // since-version form: only changes after the offset
    assert(spark.sql(
      s"SELECT id, _change_type FROM graft_change_feed('$root', 't', 2)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((2L, "delete")))
  }

  test("graft_feed_bootstrap: the below-horizon SQL catch-up folds exactly (2.13)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    GraftExtensions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("boot-tvf").toString
    val store = new graft.core.SnapshotStore(spark, root)
    store.append("t", Seq(1L, 2L).toDF("id"))
    store.delete("t", col("id") === 2L)
    store.compact("t")
    store.append("t", Seq(3L).toDF("id"))
    store.vacuum("t", keepLast = 2)
    assert(store.vacuumHorizon("t") > 0L)
    // the plain feed TVF refuses a from-zero consumer (deltas vacuumed)…
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_change_feed('$root', 't')").collect())
    assert(e.getMessage.contains("vacuumed"))
    // …the bootstrap TVF is its remedy: a from-empty signed fold over it
    // equals the head snapshot exactly
    val folded = spark.sql(
      s"""SELECT id FROM graft_feed_bootstrap('$root', 't')
         |GROUP BY id
         |HAVING sum(CASE WHEN _change_type = 'delete' THEN -1 ELSE 1 END) > 0
         |ORDER BY id""".stripMargin).collect().map(_.getLong(0)).toSeq
    assert(folded == Seq(1L, 3L))
  }

  test("graft_snapshot_all: one consistent cut, pinnable from SQL (2.13)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("cut-tvf").toString
    val store = new graft.core.SnapshotStore(spark, root)
    store.commit("concepts", Seq((1L, "a")).toDF("cid", "label"))
    store.commit("edges", Seq((10L, 1L)).toDF("eid", "cid"))
    store.appendAll(Map(
      "concepts" -> Seq((2L, "b")).toDF("cid", "label"),
      "edges" -> Seq((20L, 2L)).toDF("eid", "cid")))
    val cut = spark.sql(
      s"SELECT table_name, version FROM graft_snapshot_all('$root', " +
        "'concepts', 'edges') ORDER BY table_name")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(cut == Seq(("concepts", 2L), ("edges", 2L)))
    // the cut's versions pin graft_snapshot reads — the SQL consumer's
    // protocol for a concept⋈edge query that cannot straddle a cascade
    val joined = spark.sql(
      s"""SELECT c.label, e.eid
         |FROM graft_snapshot('$root', 'concepts', ${cut.head._2}) c
         |JOIN graft_snapshot('$root', 'edges', ${cut(1)._2}) e
         |  ON c.cid = e.cid ORDER BY e.eid""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(joined == Seq(("a", 10L), ("b", 20L)))
  }

  test("view-refresh TVFs maintain aggregates from SQL (2.13)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("refresh-tvf").toString
    val store = new graft.core.SnapshotStore(spark, root)
    store.append("src", Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"))
    assert(spark.sql(
      s"SELECT up_to_version FROM graft_refresh_view('$root', 'src', 'view', 'k', 'v')")
      .head().getLong(0) == 1L)
    store.append("src", Seq(("a", 10.0)).toDF("k", "v"))
    assert(spark.sql(
      s"SELECT up_to_version FROM graft_refresh_view('$root', 'src', 'view', 'k', 'v')")
      .head().getLong(0) == 2L)
    assert(spark.sql(s"SELECT k, n FROM graft_snapshot('$root', 'view') ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("a", 2L), ("b", 1L)))
    // the join-view twin: the maintained rollup lands the joined values
    store.commit("concepts", Seq((1L, 7L)).toDF("cid2", "gen"))
    store.commit("edges", Seq((10L, 1L, 2.5), (11L, 1L, 1.5)).toDF("eid", "cid", "w"))
    val cut = spark.sql(
      s"""SELECT left_version, right_version FROM graft_refresh_join_view(
         |'$root', 'edges', 'concepts', 'cid', 'cid2', 'gen', 'w', 'jview')"""
        .stripMargin).head()
    assert((cut.getLong(0), cut.getLong(1)) == (1L, 1L))
    assert(spark.sql(
      s"SELECT gen, n, CAST(total AS DOUBLE) FROM graft_snapshot('$root', 'jview')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      == Seq((7L, 2L, 4.0)))
  }

  test("pipeline TVFs run dedup and quality from SQL (2.13)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // 1 and 2 normalize to the same fingerprint (trailing space) AND
    // share raw-text shingles (the LSH kernel is case-sensitive)
    Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma "),
      (3L, "something else entirely"))
      .toDF("id", "text").createOrReplaceTempView("tvf_docs")
    // exact dedup: 1≡2 normalize together, min id represents
    val groups = spark.sql(
      "SELECT rep_id, group_size FROM graft_exact_dedup('tvf_docs') " +
        "ORDER BY rep_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(groups == Seq((1L, 2L), (3L, 1L)))
    // near-dups: the exact-dup pair survives the LSH + verify ladder
    val pairs = spark.sql(
      "SELECT a_id, b_id FROM graft_near_dups('tvf_docs', 0.5)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // quality: doc 10 satisfies every rule (60 distinct alphabetic words
    // — the tokenizer is letters-only, so digit-suffixed words would all
    // collapse to one token — no repeated bigrams, two stopword hits);
    // doc 11 fails word count
    val sixty = (0 until 60)
      .map(i => s"w${('a' + i / 10).toChar}${('a' + i % 10).toChar}xx")
    Seq((10L, sixty.mkString(" ") + " the end and more"), (11L, "tiny"))
      .toDF("doc_id", "text").createOrReplaceTempView("tvf_qdocs")
    val q = spark.sql(
      "SELECT doc_id, passes FROM graft_quality('tvf_qdocs') ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(q.map(_._1) == Seq(10L, 11L))
    assert(q(0)._2 == 1L && q(1)._2 == 0L)
  }

  test("store backup/restore round-trips standing metadata and the bucket layout") {
    import org.apache.spark.sql.functions._
    val srcRoot = java.nio.file.Files.createTempDirectory("graft-bk-src").toString
    val src = new graft.core.SnapshotStore(spark, srcRoot)
    src.commitBucketed("f", spark.range(0, 1000)
      .select(col("id").as("k"), (col("id") * 2).as("v")), "k", 4)
    src.addCheckConstraint("f", "v_pos", "v >= 0")
    src.addKeyConstraint("f", "f_pk", "primary", Seq("k"), rely = true)
    src.setTableProperties("f", Map("owner.team" -> "graft"))
    src.commit("d", Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    src.delete("d", col("id") === 2L)
    // COMPOSITE layout: the meta must carry per-column dims, and the
    // restore must re-bucket through the Seq API (the joined column
    // string is not a column name)
    src.commitBucketed("fc", spark.range(0, 1000)
      .select((col("id") % 10).as("a"), (col("id") % 7).as("b"),
        col("id").as("v")), Seq("a", "b"), 4)
    val out = java.nio.file.Files.createTempDirectory("graft-bk-out").toString
    Sinks.backupStore(spark, src, Seq("f", "d", "fc"), out)
    val dstRoot = java.nio.file.Files.createTempDirectory("graft-bk-dst").toString
    val dst = new graft.core.SnapshotStore(spark, dstRoot)
    assert(Sinks.restoreStore(spark, dst, out).toSet == Set("f", "d", "fc"))
    // content exact: the delete's effect was materialized in the snapshot
    assert(dst.read("d").as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    assert(dst.read("f").count() == 1000L)
    // standing metadata survived the cycle
    val v = dst.latestVersion("f").get
    assert(dst.checkConstraintsOf("f", v) == Map("v_pos" -> "v >= 0"))
    val kc = dst.keyConstraintsOf("f", v)("f_pk")
    assert(kc.kind == "primary" && kc.columns == Seq("k") && kc.rely)
    assert(dst.tablePropertiesOf("f", v).get("owner.team").contains("graft"))
    // the bucket layout claim survived: SPJ-eligible on the restored store
    assert(dst.bucketSpecOf("f", v).contains(("k", 4)),
      "restore must re-bucket a layout-claimed table")
    assert(dst.bucketLayoutOf("fc", dst.latestVersion("fc").get)
      .contains((Seq("a", "b"), Seq(4, 4))),
      "restore must re-bucket a COMPOSITE layout with its per-column dims")
    assert(dst.read("fc").count() == 1000L)
    // constraints are LIVE post-restore, not just displayed
    val bad = intercept[Exception](
      dst.append("f", Seq((5000L, -1L)).toDF("k", "v")))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(bad).exists(_.contains("v_pos")), bad.toString)
    // refusing to clobber an existing table
    val dup = intercept[Exception](Sinks.restoreStore(spark, dst, out))
    assert(messages(dup).exists(_.contains("already exists")), dup.toString)
  }

  test("dedup kernels are SQL-callable after registration (2.13)") {
    GraftExtensions.register(spark)
    val j = spark.sql(
      "SELECT jaccard_similarity(array('a','b','c'), array('b','c','d')) AS j")
      .head().getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
    val h = spark.sql("SELECT hamming64(7L, 1L) AS h").head().getInt(0)
    assert(h == 2) // bits 1 and 2 differ
    val ph = spark.sql("SELECT portable_hash60('hello') AS h").head().getLong(0)
    assert(ph == 419982666956583591L) // same value as DuckDB's hex decode
  }
}
