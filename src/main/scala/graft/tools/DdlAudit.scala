package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.SnapshotStore
import graft.sources.Tables

/** Measures what the DATA-LESS schema DDL is worth at a given scale
  * factor: on a store-committed `orders`, time (a) `dropColumns` of a fat
  * string column, (b) `addColumns`, (c) `addCheckConstraint` (which must
  * scan existing rows — the one DDL with an O(table) validation read),
  * and (d) the COUNTERFACTUAL a format without schema links would pay —
  * a full `commit` rewrite of the narrowed projection. At 100 TB the
  * ratio (a)/(d) is the whole argument for metadata-only evolution:
  * dropping a fat column is one ~KB link commit instead of rewriting the
  * table. Also times the post-DDL read to show narrowing costs the scan
  * nothing. Prints one JSON line.
  *
  *   sbt "runMain graft.tools.DdlAudit /tmp/sf10"
  */
object DdlAudit {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-ddl-audit").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-ddlaudit").toString
    val store = new SnapshotStore(spark, root)
    val orders = Tables.orders(spark, sfDir)
    val (_, tCommit) = timed {
      store.commitClustered("orders", orders, clusterBy = Seq("o_orderkey"))
    }
    val rows = store.read("orders").count()

    // (a) the metadata drop of the widest columns the synthetic table has
    val (_, tDrop) = timed {
      store.dropColumns("orders", Seq("o_orderpriority", "o_orderdate"))
    }
    // (b) the metadata widen
    val (_, tAdd) = timed {
      store.addColumns("orders", org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("audit_note",
          org.apache.spark.sql.types.StringType))))
    }
    // (c) ADD CONSTRAINT pays one validation scan of existing rows
    val (_, tConstraint) = timed {
      store.addCheckConstraint("orders", "price_pos", "o_totalprice > 0")
    }
    // (e) metadata RENAME (r15, field-ID chains): must cost ≈ drop — one
    // data-less link — not the 2.8 s rewrite it was in r14
    val (_, tRename) = timed {
      store.renameColumns("orders", Map("o_orderstatus" -> "o_status"))
    }
    // post-DDL read: pruning means the narrowed scan pays nothing extra
    val (_, tRead) = timed {
      store.read("orders").agg(count(lit(1)), sum(col("o_totalprice"))).collect()
    }
    // (d) counterfactual: the rewrite a link-less format would need for
    // the same drop (same clustering, same projection)
    val narrowed = store.read("orders")
    val (_, tRewrite) = timed {
      store.commitClustered("orders_rewrite", narrowed,
        clusterBy = Seq("o_orderkey"))
    }

    val ratio = if (tDrop > 0) tRewrite / tDrop else -1.0
    val renOp = store.commitProps("orders", store.latestVersion("orders").get)
      .getOrElse(SnapshotStore.OpProp, "?")
    println(
      f"""{"metric":"ddl_audit","sf":"$sfDir","rows":$rows,""" +
        f""""commit_sec":$tCommit%.3f,"drop_columns_sec":$tDrop%.3f,""" +
        f""""add_columns_sec":$tAdd%.3f,"add_constraint_sec":$tConstraint%.3f,""" +
        f""""rename_sec":$tRename%.3f,"rename_op":"$renOp",""" +
        f""""post_ddl_read_sec":$tRead%.3f,"rewrite_counterfactual_sec":$tRewrite%.3f,""" +
        f""""rewrite_over_drop":$ratio%.1f}""")

    // leave nothing behind
    val w = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    try {
      import scala.jdk.CollectionConverters._
      w.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    } finally w.close()
    spark.stop()
  }
}
