package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{FileStats, SnapshotStore}

/** Manifest data skipping (`_stats.json` zone maps) through the graft
  * connector's FileIndex: files that provably cannot match the pushed
  * predicates are dropped before listing/footer I/O; everything else about
  * the scan is Spark's parquet path. Correctness contract: pruning NEVER
  * changes results — every case cross-checks rows against an unprunable
  * recompute. */
class GraftDataSkippingSpec extends SparkSpec {

  private def tmpRoot(): String =
    Files.createTempDirectory("skipspec").toString

  private def graftRead(root: String, table: String): DataFrame =
    spark.read.format("graft").option("root", root).option("table", table).load()

  test("clustered appends: point and range predicates skip whole files") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    // Three chain links with disjoint id ranges; clusterBy keeps each
    // file's [min, max] tight inside its link.
    store.commitClustered("t",
      spark.range(0, 300).select(col("id"), (col("id") % 5).as("grp")),
      clusterBy = Seq("id"))
    store.appendClustered("t",
      spark.range(300, 600).select(col("id"), (col("id") % 5).as("grp")),
      clusterBy = Seq("id"))
    store.appendClustered("t",
      spark.range(600, 900).select(col("id"), (col("id") % 5).as("grp")),
      clusterBy = Seq("id"))

    val base = graftRead(root, "t")
    val total = scannedFiles(base).size
    assert(total >= 3, "each chain link contributes at least one file")

    val point = base.filter(col("id") === 450)
    assert(scannedFiles(point).size < total, "point lookup prunes files")
    assert(point.count() === 1)

    val range = base.filter(col("id") >= 600)
    assert(scannedFiles(range).size < total, "range predicate prunes files")
    assert(range.count() === 300)

    val nothing = base.filter(col("id") > 10000)
    assert(scannedFiles(nothing).isEmpty, "impossible predicate prunes ALL files")
    assert(nothing.count() === 0)

    val in = base.filter(col("id").isin(10L, 20L))
    assert(in.count() === 2)
    assert(scannedFiles(in).size < total, "IN list prunes to covering files")
  }

  test("pruning never changes results vs the manifest-less read") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    store.commitClustered("t",
      spark.range(0, 500).select(col("id"),
        concat(lit("doc-"), format_string("%04d", col("id"))).as("name")),
      clusterBy = Seq("id"))
    store.appendClustered("t",
      spark.range(500, 1000).select(col("id"),
        concat(lit("doc-"), format_string("%04d", col("id"))).as("name")),
      clusterBy = Seq("id"))

    val preds = Seq(
      col("id") === 750L, col("id") < 100L, col("id") >= 990L,
      col("name") === "doc-0042", col("name").startsWith("doc-09"),
      col("name") < "doc-0100", col("id").isNull, col("id").isNotNull)
    val pruned = preds.map(p => graftRead(root, "t").filter(p).count())

    // Destroy the manifests: same store, now unprunable.
    for (v <- new SnapshotStore(spark, root).history("t"))
      Files.deleteIfExists(Paths.get(root, "t", s"v=$v", FileStats.StatsFileName))
    graft.core.SnapshotStore.dropCachesForTests()
    val flat = preds.map(p => graftRead(root, "t").filter(p).count())
    assert(pruned === flat, "zone-map pruning must be invisible in results")
  }

  test("schema evolution: predicate on a later-added column prunes old chain files") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    store.commit("t", spark.range(0, 100).select(col("id")))
    store.append("t",
      spark.range(100, 200).select(col("id"), lit("fresh").as("tag")))

    val base = graftRead(root, "t")
    val total = scannedFiles(base).size
    // Old files lack `tag` entirely → read as NULL → `tag = 'fresh'`
    // cannot match them; the manifest's leaf-set check prunes them.
    val tagged = base.filter(col("tag") === "fresh")
    assert(scannedFiles(tagged).size < total)
    assert(tagged.count() === 100)
    // And IsNull must NOT prune them.
    assert(base.filter(col("tag").isNull).count() === 100)
  }

  test("SQL catalog face prunes too (same GraftTable under kg.*)") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    store.commitClustered("evs",
      spark.range(0, 400).select(col("id"), (col("id") * 2).as("v")),
      clusterBy = Seq("id"))
    store.appendClustered("evs",
      spark.range(400, 800).select(col("id"), (col("id") * 2).as("v")),
      clusterBy = Seq("id"))
    spark.conf.set("spark.sql.catalog.kgskip",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.kgskip.root", root)

    val all = spark.sql("SELECT * FROM kgskip.evs")
    val hit = spark.sql("SELECT * FROM kgskip.evs WHERE id = 600")
    assert(scannedFiles(hit).size < scannedFiles(all).size)
    assert(hit.count() === 1)
  }

  test("timestamp zone maps prune through the micros domain") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    // Two links with disjoint time ranges.
    store.commitClustered("t",
      spark.range(0, 100).select(col("id"),
        to_timestamp(lit("2026-01-05 00:00:00")).as("ts")), Seq("ts"))
    store.appendClustered("t",
      spark.range(100, 200).select(col("id"),
        to_timestamp(lit("2026-03-05 00:00:00")).as("ts")), Seq("ts"))
    val base = graftRead(root, "t")
    val total = scannedFiles(base).size
    val feb = base.filter(col("ts") > lit("2026-02-01").cast("timestamp"))
    assert(scannedFiles(feb).size < total)
    assert(feb.count() === 100)
  }

  test("manifest JSON round-trips exactly") {
    import FileStats._
    val fs = Map(
      "part-0.parquet" -> FileStat(42L, 1234L, 99L,
        Map(
          "id" -> ColStats(Some(LongVal(-3)), Some(LongVal(900)), Some(0L)),
          "score" -> ColStats(Some(DoubleVal(0.25)), Some(DoubleVal(Double.PositiveInfinity)), Some(2L)),
          "name" -> ColStats(Some(StringVal("a")), Some(StringVal("zz")), None),
          "flag" -> ColStats(Some(BoolVal(false)), Some(BoolVal(true)), Some(41L)),
          "allnull" -> ColStats(None, None, Some(42L))),
        Set("id", "score", "name", "flag", "allnull")),
      "part-1.parquet" -> FileStat(0L, 10L, 98L, Map.empty, Set.empty))
    assert(FileStats.fromJson(FileStats.toJson(fs)) === fs)
  }

  test("a corrupt manifest disables pruning but not reading") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    store.commitClustered("t", spark.range(0, 100).toDF("id"), Seq("id"))
    Files.writeString(Paths.get(root, "t", "v=1", FileStats.StatsFileName),
      "{ not json ]")
    graft.core.SnapshotStore.dropCachesForTests()
    val df = graftRead(root, "t").filter(col("id") === 5)
    assert(df.count() === 1)
  }
}
