package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Export / backup sinks (reference S7/S8).
  *
  * GEXF (api/app/lib/gexf_exporter.py:1-45): graph → Gephi XML with node
  * size = log(instance_count), edge thickness = confidence. XML assembly is
  * inherently single-writer, so nodes/edges are streamed through
  * `toLocalIterator` — partitions are pulled one at a time, never the whole
  * graph at once.
  *
  * Backup/restore (api/app/lib/backup_streaming.py, restore_modes.py):
  * parquet snapshot per table + manifest; restore with ID remap = a join
  * against the collision-mapping table (tests/unit/test_id_remap.py).
  */
object Sinks {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Write a GEXF file. nodes: (id, label, instance_count); edges:
    * (src, dst, rel_type, confidence). */
  def writeGexf(nodes: DataFrame, edges: DataFrame, path: String): Unit = {
    val w = new java.io.PrintWriter(new java.io.BufferedWriter(
      new java.io.FileWriter(path)))
    try {
      w.println("""<?xml version="1.0" encoding="UTF-8"?>""")
      w.println("""<gexf xmlns="http://gexf.net/1.3" version="1.3">""")
      w.println("""  <graph mode="static" defaultedgetype="directed">""")
      w.println("    <nodes>")
      val nit = nodes.select(col("id").cast("string"), col("label").cast("string"),
        coalesce(col("instance_count"), lit(1L)).cast("long")).toLocalIterator()
      while (nit.hasNext) {
        val r = nit.next()
        val size = math.log(r.getLong(2).toDouble + 1.0)
        w.println(s"""      <node id="${esc(r.getString(0))}" label="${esc(r.getString(1))}">""")
        w.println(f"""        <viz:size xmlns:viz="http://gexf.net/1.3/viz" value="$size%.4f"/>""")
        w.println("      </node>")
      }
      w.println("    </nodes>")
      w.println("    <edges>")
      val eit = edges.select(col("src").cast("string"), col("dst").cast("string"),
        coalesce(col("rel_type"), lit("RELATED")).cast("string"),
        coalesce(col("confidence"), lit(1.0)).cast("double")).toLocalIterator()
      var i = 0
      while (eit.hasNext) {
        val r = eit.next()
        w.println(s"""      <edge id="$i" source="${esc(r.getString(0))}" """ +
          s"""target="${esc(r.getString(1))}" label="${esc(r.getString(2))}" """ +
          f"""weight="${r.getDouble(3)}%.4f"/>""")
        i += 1
      }
      w.println("    </edges>")
      w.println("  </graph>")
      w.println("</gexf>")
    } finally w.close()
  }

  /** Snapshot backup: one parquet dir per table + a manifest row per table
    * (name, row count, epoch). */
  def backup(spark: SparkSession, tables: Map[String, DataFrame], outDir: String,
      epoch: Long): DataFrame = {
    import spark.implicits._
    val manifest = tables.toSeq.sortBy(_._1).map { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name")
      (name, df.count(), epoch)
    }.toDF("table", "row_count", "epoch")
    manifest.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/_manifest")
    manifest
  }

  /** Restore a backed-up table, remapping ids that collide with the target:
    * colliding ids get a suffix; every FK column listed in `fkCols` follows
    * the same map (the reference's ID-remap restore mode,
    * tests/unit/test_id_remap.py). Returns (restoredTable, remapTable). */
  def restoreWithRemap(
      backup: DataFrame, target: DataFrame, idCol: String,
      suffix: String): (DataFrame, DataFrame) = {
    // distinct: a duplicated id in the backup must produce ONE remap row,
    // or both join-backs below fan out every matching row per duplicate.
    val collisions = backup.select(col(idCol)).distinct()
      .join(target.select(col(idCol)), Seq(idCol), "left_semi")
    val remap = collisions
      .select(col(idCol).as("old_id"),
        concat(col(idCol), lit(suffix)).as("new_id"))
    val restored = backup
      .join(remap, backup(idCol) === remap("old_id"), "left")
      .withColumn(idCol, coalesce(col("new_id"), col(idCol)))
      .drop("old_id", "new_id")
    (restored, remap)
  }

  /** Apply a remap table to a foreign-key column (edges after node remap). */
  def remapColumn(df: DataFrame, fkCol: String, remap: DataFrame): DataFrame =
    df.join(broadcast(remap), df(fkCol) === remap("old_id"), "left")
      .withColumn(fkCol, coalesce(col("new_id"), col(fkCol)))
      .drop("old_id", "new_id")

  /** STORE-level backup: the content snapshot of each table (its pinned
    * head, read through tombstones and deletion vectors) PLUS its
    * STANDING METADATA — CHECK constraints, informational key
    * constraints, user table properties, and the bucket layout claim —
    * as a `_store_meta.json` sidecar. The content-only [[backup]] is the
    * reference's shape (backup_streaming.py: rows per table); a store
    * whose tables carry write contracts must not silently shed them
    * across a backup/restore cycle. Returns the manifest. */
  def backupStore(spark: SparkSession, store: graft.core.SnapshotStore,
      tables: Seq[String], outDir: String): DataFrame = {
    import org.json4s._
    val meta = JObject(tables.sorted.toList.map { t =>
      val v = store.latestVersion(t).getOrElse(
        throw new IllegalArgumentException(s"no committed version of $t"))
      t -> JObject(List(
        "version" -> JLong(v),
        "checks" -> JObject(store.checkConstraintsOf(t, v).toList.sortBy(_._1)
          .map { case (n, sql) => n -> (JString(sql): JValue) }),
        "keycons" -> JObject(store.keyConstraintsOf(t, v).toList.sortBy(_._1)
          .map { case (n, kc) => n -> (JObject(List(
            "kind" -> JString(kc.kind),
            "columns" -> JArray(kc.columns.toList.map(JString(_))),
            "rely" -> JBool(kc.rely)) ++
            kc.refTable.map(r => "refTable" -> (JString(r): JValue)).toList ++
            (if (kc.refColumns.nonEmpty)
              List("refColumns" -> JArray(kc.refColumns.toList.map(JString(_))))
            else Nil)): JValue) }),
        "props" -> JObject(store.tablePropertiesOf(t, v).toList.sortBy(_._1)
          .map { case (k, value) => k -> (JString(value): JValue) }),
        "bucket" -> store.bucketLayoutOf(t, v).map { case (cols, dims) =>
          JObject(List(
            "col" -> JString(cols.mkString(",")),
            "n" -> JInt(dims.product),
            // per-column counts: what composite restores re-bucket by
            "dims" -> JArray(dims.toList.map(JInt(_))))): JValue
        }.getOrElse(JNull)))
    })
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "_store_meta.json"),
      jackson.JsonMethods.compact(jackson.JsonMethods.render(meta)))
    backup(spark, tables.map(t => t -> store.read(t)).toMap, outDir,
      epoch = tables.flatMap(store.latestVersion(_)).foldLeft(0L)(math.max))
  }

  /** Restore a [[backupStore]] into a (typically fresh) store: content
    * committed — re-BUCKETED when the backup's head held a layout claim,
    * so storage-partitioned joins survive the cycle — then the standing
    * metadata re-applied (CHECK constraints validate against the restored
    * rows, per ANSI ADD; key constraints and user props re-pin). Refuses
    * tables that already exist, like CREATE. */
  def restoreStore(spark: SparkSession, store: graft.core.SnapshotStore,
      inDir: String): Seq[String] = {
    import org.json4s._
    val meta = jackson.JsonMethods.parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get(inDir, "_store_meta.json")))
      .asInstanceOf[JObject].obj
    meta.map { case (t, m) =>
      require(store.latestVersion(t).isEmpty,
        s"restore target table $t already exists — restore into a fresh " +
          "store or drop it first")
      val df = spark.read.parquet(s"$inDir/$t")
      m \ "bucket" match {
        case JObject(b) =>
          val cols = graft.core.SnapshotStore.bucketColsOf(
            b.collectFirst { case ("col", JString(x)) => x }.get)
          val n = b.collectFirst { case ("n", JInt(x)) => x.toInt }.get
          val dims = b.collectFirst { case ("dims", JArray(xs)) =>
            xs.collect { case JInt(x) => x.toInt }
          }.getOrElse(List(n))
          require(dims.length == cols.length,
            s"restore of $t: bucket dims $dims don't match columns $cols")
          // per-column dims restore verbatim — non-uniform layouts
          // ((16, 4): a hot leading column over a low-card sub-key) are
          // first-class in the write API since r19
          store.commitBucketed(t, df, cols, dims, None)
        case _ => store.commit(t, df)
      }
      (m \ "checks").asInstanceOf[JObject].obj.foreach {
        case (name, JString(sql)) => store.addCheckConstraint(t, name, sql)
        case _ => ()
      }
      (m \ "keycons").asInstanceOf[JObject].obj.foreach {
        case (name, kc: JObject) =>
          def strs(f: String): Seq[String] = kc \ f match {
            case JArray(xs) => xs.collect { case JString(x) => x }
            case _ => Nil
          }
          store.addKeyConstraint(t, name,
            kind = (kc \ "kind") match { case JString(k) => k; case _ => "" },
            columns = strs("columns"),
            refTable = (kc \ "refTable") match {
              case JString(r) => Some(r); case _ => None },
            refColumns = strs("refColumns"),
            rely = (kc \ "rely") match { case JBool(b) => b; case _ => false })
        case _ => ()
      }
      val props = (m \ "props").asInstanceOf[JObject].obj.collect {
        case (k, JString(value)) => k -> value
      }.toMap
      if (props.nonEmpty) store.setTableProperties(t, props)
      t
    }
  }
}
