package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational operator coverage (SURVEY.md §2.2-2.8) exercised on the
  * driver's TPC-H-ish testdata, each paired with an ANSI-SQL DuckDB oracle.
  *
  * Numeric-parity convention: any order-dependent floating aggregate is
  * summed through DECIMAL(18,4) and cast back to double, so Spark's partial
  * aggregation (arbitrary partition order) and DuckDB's single-threaded sum
  * produce bit-identical values. Every query ends in a total-order sort.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** sum through decimal → exact, order-independent; back to double. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")

  val queries: Map[String, Q] = Map(
    // A1/A4: grouped aggregation ladder (count/sum/avg/countDistinct) —
    // reference confidence signals (confidence_analyzer.py:384-516) shape.
    "q01_pricing_summary" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.where(col("l_shipdate") <= lit("1997-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          countDistinct(col("l_partkey")).as("distinct_parts"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // F1/F2: projection + predicate zoo (eq, IN, range, LIKE-regex, null-safe)
    "q02_filter_project" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      c.where(col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE")
          && col("c_acctbal").between(100.0, 9000.0)
          && col("c_name").rlike("Customer#0+1"))
        .select(
          col("c_custkey"),
          col("c_name"),
          col("c_mktsegment").as("segment"),
          round(col("c_acctbal") * lit(1.1), 4).as("adj_balance"))
        .orderBy(col("c_custkey"))
    }),

    // J1-shape: chained 4-way equi-join with small-dim broadcast
    // (evidence join concepts⋈instances⋈sources, queries.py:1085-1103).
    // JOIN ORDER IS HAND-PICKED — without table statistics Catalyst's
    // cost-based reorder is inert and the declared order IS the plan.
    // Joining the two mid-size tables first (orders⋈customer, keyed
    // custkey) and decorating with the broadcast dim keeps the custkey
    // exchange at |orders| rows; the naive lineitem-first order shuffles
    // the |lineitem|-sized join RESULT a second time on custkey. Local
    // min-of-2 at sf10 is neutral (6.0 vs 5.8 s — loopback shuffle is
    // memory-speed), but the exchange this deletes carries the query's
    // BIGGEST intermediate, which on a real cluster is its dominant
    // wire cost — the plan is chosen for that, not for local[32].
    "q03_join_chain" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val orderNation = o
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("o_orderkey"), col("n_name"))
      li.join(orderNation, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"))
    }),

    // J3: batch hydration — small IN-list broadcast-joined to a dim table
    // (graph_facade.py:930-967).
    "q04_hydration" -> ((s, dir) => {
      import s.implicits._
      val ids = Seq(1L, 3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L, 29L).toDF("id")
      val p = Tables.part(s, dir)
      broadcast(ids).join(p, col("id") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    }),

    // J4: join + grouped collect (concepts-per-source batch,
    // graph_facade.py:890-924); arrays sorted for determinism.
    "q05_group_collect" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      // Collected list is emitted as a sorted comma-joined string: the
      // driver's pandas compare sorts every output column, and raw array
      // cells are unhashable there.
      o.where(col("o_custkey") <= 50)
        .groupBy(col("o_custkey"))
        .agg(
          array_join(
            expr("transform(array_sort(collect_list(o_orderkey)), x -> cast(x as string))"),
            ",").as("orderkeys"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_custkey"))
    }),

    // P1-P3 + J8: set algebra via semi/anti joins — customers with orders
    // minus customers with any 'F' order (program_operators.py:65-108).
    "q06_semi_anti" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val withOrders = c.join(o.select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_semi")
      val withF = o.where(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
      withOrders.join(withF, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // W3: best-row-per-group via row_number (best chunk per source,
    // queries.py:350-462).
    "q07_best_per_group" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("best_orderkey"),
          col("o_totalprice").as("best_price"))
        .orderBy(col("o_custkey"))
    }),

    // W4: lag + moving average over an ordered partition (usage trend,
    // vocabulary_scoring.py:349-395).
    "q08_lag_trend" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      e.where(col("user_id") <= 20)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("delta", round(col("value") - coalesce(col("prev_value"), lit(0.0)), 4))
        .select(col("user_id"), col("event_id"), round(col("value"), 4).as("value"),
          round(coalesce(col("prev_value"), lit(0.0)), 4).as("prev_value"), col("delta"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // K1: deterministic top-k (TakeOrderedAndProject — the V1 sort/slice,
    // age_client/query.py:114-116).
    "q09_topk" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(20)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    }),

    // K2: offset pagination via row_number window (queries.py:591-599).
    // Scale shape: the page end is a constant (offset+limit = 30), so take
    // the global top-30 first — TakeOrderedAndProject, per-partition top-k
    // merged at the driver, never a full sort — and only then number rows.
    // The single-partition window sees 30 rows whatever the table size.
    "q10_pagination" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val order = Seq(col("c_acctbal").desc, col("c_custkey").asc)
      val w = Window.orderBy(order: _*)
      c.orderBy(order: _*).limit(30)
        .withColumn("rn", row_number().over(w))
        .where(col("rn").between(11, 30))
        .select(col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("rn"))
    }),

    // K2 scale path: keyset pagination — the drop-in replacement for the
    // reference's offset form once a global row_number window stops
    // scaling: filter past the last-seen key, pushed into the scan, then
    // TakeOrderedAndProject. No single-partition window anywhere.
    "q55_keyset_page" -> ((s, dir) => {
      Tables.customer(s, dir)
        .where(col("c_custkey") > 500) // last key of the previous page
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
        .limit(20)
    }),

    // K4: below-threshold band hint — count/min/max + suggested_threshold =
    // round(min - 0.02, 2) (queries.py:720-746).
    "q11_band_hint" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val scored = c.withColumn("score", col("c_acctbal") / lit(10000.0))
      scored.where(col("score").between(0.3, 0.7))
        .agg(
          count(lit(1)).as("n_below"),
          round(min(col("score")), 6).as("min_score"),
          round(max(col("score")), 6).as("max_score"),
          round(round(min(col("score")), 6) - lit(0.02), 2).as("suggested_threshold"))
    }),

    // A4: Michaelis-Menten saturation scoring + when-ladder levels
    // (confidence_analyzer.py:54-62,561-627).
    "q12_mm_confidence" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      // Two countDistincts would EXPAND the 60M-row scan 3x before the
      // exchange (one replica per distinct column + one for the plain
      // count); per-order groups are tiny (~4 lines), so size(collect_set)
      // keeps the pass single and the partial-aggregate state a handful
      // of longs per key — the wire carries one row per (order,partition)
      // instead of three.
      val sig = li.groupBy(col("l_orderkey")).agg(
        count(lit(1)).as("n_items"),
        size(collect_set(col("l_partkey"))).cast("long").as("n_parts"),
        size(collect_set(col("l_suppkey"))).cast("long").as("n_supps"))
      sig
        .withColumn("composite",
          col("n_items") / lit(10.0) + col("n_parts") / lit(5.0) + col("n_supps") / lit(10.0))
        .withColumn("score", round(col("composite") / (col("composite") + lit(2.0)), 6))
        .withColumn("level",
          when(col("n_items") >= 5 && col("n_parts") >= 3, "confident")
            .when(col("n_items") >= 2, "tentative")
            .otherwise("insufficient"))
        .select(col("l_orderkey"), col("n_items"), col("n_parts"), col("n_supps"),
          col("score"), col("level"))
        .orderBy(col("l_orderkey"))
    }),

    // A5: confidence-weighted mean — sum(w*x)/sum(w) (grounding aggregate,
    // grounding.py:349-373).
    "q13_weighted_mean" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy(col("l_suppkey"))
        .agg(
          (dsum(col("l_discount") * col("l_extendedprice")) /
            dsum(col("l_discount"))).as("weighted_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_suppkey"))
    }),

    // Pearson correlation per group (polarity grounding correlation,
    // polarity_axis.py:392-452).
    "q14_corr" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // A13: avg/stddev + epistemic when-ladder classification
    // (epistemic_status_service.py:1-50).
    "q15_epistemic" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.groupBy(col("event_type"))
        .agg(
          (dsum(col("value")) / count(lit(1))).as("avg_value"),
          round(stddev(col("value")), 4).as("sd_value"),
          count(lit(1)).as("n"))
        .withColumn("status",
          when(col("n") < 3, "INSUFFICIENT_DATA")
            .when(col("avg_value") > 60.0, "WELL_GROUNDED")
            .when(col("avg_value") < 40.0, "CONTRADICTED")
            .otherwise("MIXED"))
        .orderBy(col("event_type"))
    }),

    // P1 union / P2 except / P3 intersect on key sets, tagged and unioned
    // into one result (program set algebra, program_operators.py:65-137).
    "q16_set_algebra" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val a = c.where(col("c_acctbal") > 5000.0).select(col("c_custkey"))
      val b = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val union = a.union(b).distinct().withColumn("op", lit("union"))
      val inter = a.intersect(b).withColumn("op", lit("intersect"))
      val diff  = a.except(b).withColumn("op", lit("except"))
      union.unionAll(inter).unionAll(diff)
        .select(col("op"), col("c_custkey"))
        .orderBy(col("op"), col("c_custkey"))
    }),

    // W1: recency window — latest k rows per partition then distinct
    // (age_client/query.py:143-153).
    "q17_recency_distinct" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_set(col("event_type"))), ",")
          .as("recent_types"))
        .orderBy(col("user_id"))
    }),

    // Multi-way star join + conditional aggregation (TPC-H Q5-ish) —
    // exercises join reordering + broadcast of the dim chain.
    "q18_star_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      // NEGATIVE RESULT (r16, do not re-try): pre-aggregating the fact
      // stream to (orderkey, region) partial sums before the fact⋈fact
      // join measured STRICTLY WORSE at sf10 — composite-key groupBy +
      // orderkey join exchange the 60M-row side twice (7.2-8.2 s vs
      // 5.1-5.5 s), and forcing one shared exchange via
      // repartition(l_orderkey) still lost (6.3-13 s, erratic: the
      // explicit exchange defeats AQE and the in-partition rollup's hash
      // map costs more than the ~3.5× sort shrink saves at a ~4-rows/
      // order collapse factor). The straight join chain below IS the
      // best measured plan: one exchange per fact side, partial
      // aggregation where Spark's own SMJ+agg pipeline puts it.
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          dsum(when(col("o_orderstatus") === "F", col("l_extendedprice")).otherwise(lit(0.0)))
            .as("f_revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("r_name"))
    }),

    // Snapshot-store round trip with zone-map point read (M8 + the new
    // data-skipping layer): commit `orders` into a clustered store once
    // (idempotent across runs — min-of-2 bench timings measure the warm
    // READ), then read back a narrow o_orderkey band through the graft
    // connector. The clusterBy makes each file's [min,max] tight, so the
    // `_stats.json` manifests prune all non-covering files before any
    // listing or footer I/O (GraftDataSkippingSpec pins the pruning;
    // this entry pins end-to-end result fidelity against DuckDB reading
    // the ORIGINAL parquet — the store round trip must be value-exact).
    "q97_store_pointread" -> ((s, dir) => {
      // Keyed on the DATA's fingerprint (file names/sizes/mtimes), not the
      // path: regenerating or rescaling the dataset at the same path gets a
      // fresh store instead of a stale one diverging from the oracle.
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q97_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      // fixture caches persist across builds: stamp pre-sentinel stores
      store.migrateLegacyTable("orders")
      if (store.latestVersion("orders").isEmpty)
        store.commitClustered("orders", Tables.orders(s, dir),
          clusterBy = Seq("o_orderkey"))
      s.read.format("graft").option("root", root).option("table", "orders")
        .load()
        .filter(col("o_orderkey").between(1000L, 2000L))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Row-level DELETE round trip (M4/M5's store-level mechanism): commit
    // `orders` clustered, apply two STACKED deletes — the second's
    // predicate overlaps the first's survivor rewrite, so the read
    // crosses original files, first-generation survivors, and
    // second-generation survivors of survivors — then read the final
    // snapshot through the graft connector. The oracle replays the
    // deletes as WHERE NOT(...) over the ORIGINAL parquet: the
    // tombstone/rewrite machinery must be value-invisible. Build is
    // idempotent across runs (mutations only on first creation), so
    // min-of-2 bench timings measure the warm tombstone-resolved READ.
    "q99_store_delete" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q99_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      // fixture caches persist across builds: stamp pre-sentinel stores
      store.migrateLegacyTable("orders")
      // final head is v3 (commit + two stacked deletes): a crash between
      // them re-runs the whole block (overwrite commit self-heals)
      if (store.latestVersion("orders").forall(_ < 3L)) {
        store.commitClustered("orders", Tables.orders(s, dir),
          clusterBy = Seq("o_orderkey"))
        store.delete("orders", col("o_orderkey").between(500L, 1499L))
        store.delete("orders", col("o_orderstatus") === "F" &&
          col("o_orderkey").between(1000L, 2999L))
      }
      s.read.format("graft").option("root", root).option("table", "orders")
        .load()
        .filter(col("o_orderkey") < 4000L)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Deletion-vector round trip (the sparse twin of q99): the predicate
    // matches ~1% of every clustered file — under the DV threshold, so the
    // delete rewrites NOTHING and commits a row-vector sidecar instead;
    // the connector read drops the vectored rows inside its scan. The
    // oracle replays the delete as WHERE NOT(...) over the ORIGINAL
    // parquet: the vector path must be value-invisible, exactly like the
    // tombstone path. Build idempotent like q97/q99.
    "q101_store_dv_delete" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q101_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders")
      // final head is v2 (commit + DV delete): torn builds re-run whole
      if (store.latestVersion("orders").forall(_ < 2L)) {
        store.commitClustered("orders", Tables.orders(s, dir),
          clusterBy = Seq("o_orderkey"))
        val d = store.delete("orders", col("o_orderkey") % 97 === 0)
        require(store.dvAt("orders", d).nonEmpty,
          "q101 fixture must exercise the deletion-vector path")
      }
      s.read.format("graft").option("root", root).option("table", "orders")
        .load()
        .filter(col("o_orderkey") < 4000L)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // TIMESTAMP AS OF round trip (M8's epoch clock as wall time): commit
    // `orders` clustered, delete a band at a LATER version, then read the
    // snapshot AS OF the FIRST commit's expose-time stamp through the
    // connector — the pre-delete table, value-exact. The oracle is a plain
    // SELECT over the ORIGINAL parquet: timestamp resolution + the pinned
    // historical read must be invisible. Build idempotent like q97/q99
    // (stamps live on disk, so re-runs resolve the same instant).
    "q103_store_timetravel" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q103_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders")
      // final head is v2 (commit + delete): torn builds re-run whole
      if (store.latestVersion("orders").forall(_ < 2L)) {
        store.commitClustered("orders", Tables.orders(s, dir),
          clusterBy = Seq("o_orderkey"))
        store.delete("orders", col("o_orderkey") < 2000L)
      }
      val t1 = store.commitTimeOf("orders", 1L).getOrElse(
        throw new IllegalStateException("q103 fixture: v1 carries no stamp"))
      s.read.format("graft").option("root", root).option("table", "orders")
        .option("timestampAsOf", t1.toString)
        .load()
        .filter(col("o_orderkey") < 4000L)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Storage-partitioned join round trip: orders and lineitem committed
    // HASH-BUCKETED on the join key (commitBucketed: file part index =
    // pmod(murmur3(key, 42), 8)), then joined + aggregated through the
    // SQL catalog with v2 bucketing on — the scan reports
    // KeyGroupedPartitioning and the join plans with NO exchange on
    // either side (shape pinned in StoragePartitionJoinSpec; this entry
    // pins VALUE fidelity: the bucketed write→scan→join→agg must equal
    // DuckDB's plain join over the original parquet). Build idempotent
    // like q97/q99.
    "q104_store_bucketed_join" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q104_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders_b")
      store.migrateLegacyTable("lineitem_b")
      // Guarded on the LAST build step's observable state: a crash mid-
      // build (between the two commits, or before the mutations) then
      // re-runs the WHOLE block — every commit is an overwrite, so a
      // torn fixture self-heals instead of wedging until tmp is wiped.
      if (store.latestVersion("lineitem_b").isEmpty) {
        store.commitBucketed("orders_b", Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")),
          "o_orderkey", 8)
        store.commitBucketed("lineitem_b", Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_quantity"),
            col("l_extendedprice")),
          "l_orderkey", 8)
      }
      // Catalog name embeds the fixture fingerprint: CatalogManager CACHES
      // catalog instances by name at first use, so re-pointing the same
      // name's `.root` at another scale's fixture is silently ignored —
      // the sf10 block of the dual-scale bench was reading (and timing)
      // the sf0.1 tables through the stale cached instance.
      val cat = s"q104_${Tables.fingerprint(dir, "orders")}"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.sql(s"""
        SELECT o_orderkey, o_orderstatus,
          count(*) AS n_items,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM $cat.orders_b JOIN $cat.lineitem_b ON o_orderkey = l_orderkey
        WHERE o_orderkey < 8000
        GROUP BY o_orderkey, o_orderstatus
        ORDER BY o_orderkey""")
    }),

    // Storage-partitioned join UNDER MUTATION (the r16 claim): orders and
    // lineitem co-bucketed on the order key, then a dense copy-on-write
    // UPDATE re-statuses an order band and a copy-on-write DELETE drops
    // heavy lineitems — both rewrites land bucket-attributed (survivors
    // and post-images repartition by the claimed spec at write), so the
    // fact⋈fact join STILL plans with no exchange on either side
    // (StoragePartitionJoinSpec pins the shape; this entry pins VALUE
    // fidelity: the mutated-bucketed write→scan→join→agg must equal
    // DuckDB's replay of the same mutations over the original parquet).
    // At 100 TB this is the difference between an upsert-heavy fact table
    // keeping its zero-exchange joins and re-bucketing after every merge.
    // Build idempotent like q97/q99.
    "q109_spj_mutated" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q109_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders_m")
      store.migrateLegacyTable("lineitem_m")
      // Guarded on the LAST build step's observable state: a crash mid-
      // build (between the two commits, or before the mutations) then
      // re-runs the WHOLE block — every commit is an overwrite, so a
      // torn fixture self-heals instead of wedging until tmp is wiped.
      if (store.latestVersion("lineitem_m").forall(_ < 2L)) {
        store.commitBucketed("orders_m", Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
          "o_orderkey", 8)
        store.commitBucketed("lineitem_m", Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
          "l_orderkey", 8)
        // dense copy-on-write mutations (dvMaxFraction = 0 pins the COW
        // path at every scale, so the bench measures the same work at
        // sf0.01 and sf10): re-status a key band; drop heavy items
        store.update("orders_m", col("o_orderkey") < 2000L,
          Map("o_orderstatus" -> lit("M")), dvMaxFraction = 0.0)
        store.delete("lineitem_m", col("l_quantity") >= 45.0,
          dvMaxFraction = 0.0)
      }
      val cat = s"q109_${Tables.fingerprint(dir, "orders")}"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.sql(s"""
        SELECT o_orderkey, o_orderstatus,
          count(*) AS n_items,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM $cat.orders_m JOIN $cat.lineitem_m ON o_orderkey = l_orderkey
        WHERE o_orderkey < 8000
        GROUP BY o_orderkey, o_orderstatus
        ORDER BY o_orderkey""")
    }),

    // q18's star join with the FACT⋈FACT leg routed through the store:
    // orders and lineitem co-bucketed on the order key (32 buckets — one
    // per local core; a cluster sizes this to its executor count), so the
    // headline join's dominant cost — the two 60M-row exchanges feeding
    // the lineitem⋈orders SMJ — disappears into a storage-partitioned
    // join, while the dim chain (customer, supplier, nation, region)
    // stays broadcast exactly as in q18. The q18 plan itself is proven
    // optimal FOR A SINGLE-TABLE LAYOUT (pinned negative result above);
    // this is the structural headroom that note pointed at: co-locating
    // the two fact tables at WRITE time, which only a storage layer can
    // do. Same aggregate, same oracle as q18 — the bucketed layout must
    // be value-invisible. Build idempotent like q97/q99.
    "q113_star_join_spj" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q113_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders_s")
      store.migrateLegacyTable("lineitem_s")
      // Guarded on the LAST build step's observable state: a crash mid-
      // build (between the two commits, or before the mutations) then
      // re-runs the WHOLE block — every commit is an overwrite, so a
      // torn fixture self-heals instead of wedging until tmp is wiped.
      FixtureBuild.track("q113_star_join_spj", root)
      if (store.latestVersion("lineitem_s").isEmpty)
        FixtureBuild.timed("q113_star_join_spj", root) {
          store.commitBucketed("orders_s", Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")),
            "o_orderkey", 32)
          store.commitBucketed("lineitem_s", Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_suppkey"),
              col("l_extendedprice"), col("l_discount")),
            "l_orderkey", 32)
        }
      val cat = s"q113_${Tables.fingerprint(dir, "orders")}"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.table(s"$cat.lineitem_s")
        .join(s.table(s"$cat.orders_s"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          dsum(when(col("o_orderstatus") === "F", col("l_extendedprice")).otherwise(lit(0.0)))
            .as("f_revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("r_name"))
    }),

    // COMPOSITE-key storage-partitioned join (the r18 multi-column bucket
    // layout, end to end at the query level): lineitem and its per-
    // (partkey, suppkey) aggregate twin co-bucketed on the COMPOUND key —
    // partsupp's natural key — with 8 buckets PER COLUMN (64 partitions),
    // so the fact⋈fact equality join covering the tuple plans with no
    // exchange and no sort on either side. What the composite layout buys
    // over bucketing on partkey alone: the distribution keys on the full
    // tuple, so a hot part spreads across its supplier sub-buckets
    // instead of landing one giant partition — the skew profile of the
    // layout follows the COMPOUND key's cardinality, which is the key
    // real compound-keyed facts actually join on. Values oracle-exact vs
    // DuckDB computing the same derivation over the raw parquet. Build
    // idempotent like q113.
    "q116_composite_spj" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q116_" +
        Tables.fingerprint(dir, "lineitem")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("li_ps")
      store.migrateLegacyTable("ps_agg")
      FixtureBuild.track("q116_composite_spj", root)
      if (store.latestVersion("ps_agg").isEmpty)
        FixtureBuild.timed("q116_composite_spj", root) {
          store.commitBucketed("li_ps", Tables.lineitem(s, dir)
            .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
              col("l_extendedprice")),
            Seq("l_partkey", "l_suppkey"), 8)
          store.commitBucketed("ps_agg", Tables.lineitem(s, dir)
            .groupBy(col("l_partkey").as("ps_partkey"),
              col("l_suppkey").as("ps_suppkey"))
            .agg(count(lit(1)).as("ps_lines"),
              dsum(col("l_quantity")).as("ps_qty")),
            Seq("ps_partkey", "ps_suppkey"), 8)
        }
      val cat = s"q116_${Tables.fingerprint(dir, "lineitem")}"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.table(s"$cat.li_ps")
        .join(s.table(s"$cat.ps_agg"),
          col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
        .groupBy((col("l_suppkey") % 10).as("sgrp"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice")).as("revenue"),
          sum(col("ps_lines")).as("line_weight"),
          dsum(col("ps_qty")).as("qty_weight"))
        .orderBy(col("sgrp"))
    }),

    // NON-UNIFORM composite dims (r19): the per-column bucket counts
    // follow the per-column CARDINALITY instead of paying n^k uniform
    // fan-out — lineitem's natural compound key is (l_orderkey,
    // l_linenumber) where orderkey carries ~all the cardinality and
    // linenumber is 1..7, so the layout is (16, 4): 16 buckets for the
    // hot leading column, 4 for the sub-key, 64 partitions total. Both
    // sides of a line-level fact⋈fact join (charges vs tax/discount
    // attributes, split column families) carry the same (16, 4) claim,
    // so the compound-key join plans with no exchange and no sort on
    // either side (pinned in StoragePartitionJoinSpec). Values
    // oracle-exact vs DuckDB's self-join over the raw parquet. Build
    // idempotent like q116.
    "q118_composite_dims" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q118_" +
        Tables.fingerprint(dir, "lineitem")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("li_ln")
      store.migrateLegacyTable("li_tax")
      FixtureBuild.track("q118_composite_dims", root)
      if (store.latestVersion("li_tax").isEmpty)
        FixtureBuild.timed("q118_composite_dims", root) {
          store.commitBucketed("li_ln", Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("l_extendedprice")),
            Seq("l_orderkey", "l_linenumber"), Seq(16, 4), None)
          store.commitBucketed("li_tax", Tables.lineitem(s, dir)
            .select(col("l_orderkey").as("t_orderkey"),
              col("l_linenumber").as("t_linenumber"),
              col("l_tax"), col("l_discount")),
            Seq("t_orderkey", "t_linenumber"), Seq(16, 4), None)
        }
      val cat = s"q118_${Tables.fingerprint(dir, "lineitem")}"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.table(s"$cat.li_ln")
        .join(s.table(s"$cat.li_tax"),
          col("l_orderkey") === col("t_orderkey") &&
            col("l_linenumber") === col("t_linenumber"))
        .groupBy(col("l_linenumber").as("ln"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_quantity")).as("qty"),
          // 3-factor product: each factor cast to decimal BEFORE the
          // multiply, no intermediate rounding. A double product cast to
          // DECIMAL(18,4) has <=6 true decimals and lands on exact .XXXX5
          // ties where Spark (HALF_UP) and DuckDB (double->decimal is
          // nearest-even) disagree; the all-decimal product is exact
          // (scale 6), so both engines sum the identical rational and
          // only the final double conversion remains.
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")) *
            (lit(1).cast("decimal(3,2)") + col("l_tax").cast("decimal(3,2)")))
            .cast("double").as("charged"))
        .orderBy(col("ln"))
    }),

    // BAND-JOIN runtime pruning (r19, GraftBandJoinPruning end to end at
    // the query level): "all lineitems shipped inside the 60-day windows
    // after the 3 biggest orders" — the reference's interval shape
    // (recency/lifetime windows over the event stream, queries.py
    // temporal filters) as a genuine NON-EQUI join. The fact chain is
    // clustered by l_shipdate, so its zone maps are selective on the
    // band column; Catalyst plans a BroadcastNestedLoopJoin (no equi
    // key exists), and the AQE stage rule reads the MATERIALIZED
    // broadcast's 3 windows and hands the graft scan ONE BAND PER
    // WINDOW (an OR-of-bands predicate Spark's own runtime filtering
    // never emits) — the fact scan reads only the files under each
    // window, not the multi-year hull spanning them (these 3 windows
    // sit in 1995, 2000 and 2001). At 100 TB this is the interval-query
    // difference
    // between scanning a time-ordered fact's whole history and the few
    // files under the requested windows. Values oracle-exact vs
    // DuckDB's plain interval join. Build idempotent like q114.
    "q119_band_window" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q119_" +
        Tables.fingerprint(dir, "lineitem")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("lineitem_t")
      FixtureBuild.track("q119_band_window", root)
      if (store.latestVersion("lineitem_t").isEmpty)
        FixtureBuild.timed("q119_band_window", root) {
          store.commitClustered("lineitem_t", Tables.lineitem(s, dir)
            .select(col("l_shipdate"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount")),
            clusterBy = Seq("l_shipdate"), targetPartitions = 64)
        }
      val li = s.read.format("graft").option("root", root)
        .option("table", "lineitem_t").load()
      val w = Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(3)
        .select(col("o_orderkey").as("w_key"),
          col("o_orderdate").as("w_start"),
          (col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("w_end"))
      li.join(w, col("l_shipdate") >= col("w_start") &&
          col("l_shipdate") < col("w_end"))
        .groupBy(col("w_key"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_quantity")).as("qty"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy(col("w_key"))
    }),

    // RUNTIME-pruned hydration (the r17 SupportsRuntimeV2Filtering layer,
    // end to end at the query level): "fetch every lineitem of customer
    // 37's orders" — the reference's batch-hydration-by-id-list shape
    // (J3, api/app routes hydrating edges for a concept batch). THREE
    // store layers compose, none needing a hint:
    //   1. the DIM (orders clustered by o_custkey) zone-map-prunes the
    //      custkey point filter to ~one file, and the manifest-true scan
    //      statistics report the few surviving rows, so Catalyst
    //      auto-broadcasts the dim;
    //   2. the broadcast build side's 8 order keys feed the fact scan's
    //      RUNTIME filter (DPP — the keys are unknowable statically: the
    //      predicate is on o_custkey, not the join key, so no static
    //      inference reaches lineitem);
    //   3. the FACT (lineitem clustered by l_orderkey, 64 files) drops
    //      every file whose key range provably misses all 8 keys —
    //      ~8/64 files read instead of all.
    // At 100 TB this is the difference between a full fact-chain scan
    // and reading only the files behind the hydration batch. Values are
    // oracle-exact vs DuckDB's plain join. Build idempotent like q97.
    "q114_runtime_hydration" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q114_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders_c")
      store.migrateLegacyTable("lineitem_h")
      // Guarded on the LAST build step's observable state: a crash mid-
      // build (between the two commits, or before the mutations) then
      // re-runs the WHOLE block — every commit is an overwrite, so a
      // torn fixture self-heals instead of wedging until tmp is wiped.
      if (store.latestVersion("lineitem_h").isEmpty) {
        store.commitClustered("orders_c", Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")),
          clusterBy = Seq("o_custkey"))
        store.commitClustered("lineitem_h", Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice")),
          clusterBy = Seq("l_orderkey"), targetPartitions = 64)
      }
      val li = s.read.format("graft").option("root", root)
        .option("table", "lineitem_h").load()
      val o = s.read.format("graft").option("root", root)
        .option("table", "orders_c").load()
        .where(col("o_custkey") === 37L)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"),
          col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // RELY'd key constraint driving the optimizer (the r16 rule): orders
    // committed to the store with PRIMARY KEY (o_orderkey) NOT ENFORCED
    // RELY, then a grouped COUNT(DISTINCT o_orderkey) through the SQL
    // catalog — RelyKeyOptimization rewrites it to a plain COUNT, deleting
    // the distinct expansion's extra exchange (plan pinned in
    // PlanShapeSpec; this entry pins VALUE fidelity: the rewrite must be
    // value-invisible vs DuckDB computing the REAL count-distinct over
    // the original parquet — which only holds because the key actually IS
    // unique, exactly the promise RELY lets the user make). At 100 TB the
    // rewrite is the difference between one shuffle of partial counts and
    // shuffling the expanded (status, orderkey) stream twice. Build
    // idempotent like q97/q99.
    "q110_rely_agg" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q110_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders_r")
      // final head is v2 (commit + RELY constraint link): torn builds re-run
      if (store.latestVersion("orders_r").forall(_ < 2L)) {
        store.commitClustered("orders_r", Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
          clusterBy = Seq("o_orderkey"))
        store.addKeyConstraint("orders_r", "pk_orders", "primary",
          Seq("o_orderkey"), rely = true)
      }
      val cat = s"q110_${Tables.fingerprint(dir, "orders")}"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(s"""
        SELECT o_orderstatus,
          count(DISTINCT o_orderkey) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM $cat.orders_r
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")
    }),

    // RELY'd FK JOIN ELIMINATION (the r16 rule's second half): lineitem
    // committed with FOREIGN KEY (l_orderkey) REFERENCES orders_j RELY,
    // orders_j with its RELY'd PK — an inner join that groups only fact
    // columns then needs NO join at all: RelyKeyOptimization reduces it
    // to the fact scan (+ an IS NOT NULL on the key), deleting the
    // dimension scan AND the join exchange (plan pinned in
    // PlanShapeSpec; this entry pins VALUE fidelity: DuckDB executes the
    // REAL join over the original parquet, and the rewrite is only
    // value-invisible because referential integrity genuinely holds —
    // exactly the promise RELY lets the user make). At 100 TB the
    // eliminated join is the difference between touching one table and
    // two. Build idempotent like q97/q99.
    "q111_rely_join" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q111_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders_j")
      store.migrateLegacyTable("lineitem_j")
      if (store.latestVersion("orders_j").isEmpty) {
        store.commitClustered("orders_j", Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus")),
          clusterBy = Seq("o_orderkey"))
        store.addKeyConstraint("orders_j", "pk_orders_j", "primary",
          Seq("o_orderkey"), rely = true)
        store.commitClustered("lineitem_j", Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
          clusterBy = Seq("l_orderkey"))
        store.addKeyConstraint("lineitem_j", "fk_lineitem_orders", "foreign",
          Seq("l_orderkey"), refTable = Some("orders_j"),
          refColumns = Seq("o_orderkey"), rely = true)
      }
      val cat = s"q111_${Tables.fingerprint(dir, "orders")}"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(s"""
        SELECT CAST(l_quantity AS BIGINT) AS qty_band,
          count(*) AS n_items,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM $cat.lineitem_j JOIN $cat.orders_j ON l_orderkey = o_orderkey
        GROUP BY 1
        ORDER BY qty_band""")
    }),

    // INCREMENTALLY MAINTAINED JOIN VIEW (r16): a revenue-by-status
    // rollup over lineitem ⋈ orders, maintained by JoinMaterializedView's
    // delta algebra — Δ(L⋈R) = ΔL⋈R@new + L@old⋈ΔR, the old term read
    // from the versioned store via time travel, the cut taken with
    // snapshotAll — through an incremental schedule: half the facts, a
    // refresh (the recompute), the other half appended, the dimension
    // UPDATEd (order band re-statused), a fact DELETE, refreshes folding
    // only the deltas. The oracle replays the *final state* in SQL over
    // the original parquet: any double-fold, half-fold, or torn cut in
    // the maintenance surfaces as a value mismatch. At 100 TB a
    // maintained joined rollup trickles O(delta ⋈ dims) per refresh
    // instead of re-joining the corpus. Build idempotent like q97/q99.
    "q112_join_view" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q112_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders_v")
      store.migrateLegacyTable("lineitem_v")
      if (store.latestVersion("orders_v").isEmpty) {
        store.commit("orders_v", Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus")))
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"))
        store.commit("lineitem_v", li.where(col("l_linenumber") <= 3))
        graft.core.JoinMaterializedView.refresh(store, "lineitem_v",
          "orders_v", "l_orderkey", "o_orderkey", "o_orderstatus",
          "l_extendedprice", "rev_by_status")
        store.append("lineitem_v", li.where(col("l_linenumber") > 3))
        store.update("orders_v", col("o_orderkey") < 2000L,
          Map("o_orderstatus" -> lit("M")))
        graft.core.JoinMaterializedView.refresh(store, "lineitem_v",
          "orders_v", "l_orderkey", "o_orderkey", "o_orderstatus",
          "l_extendedprice", "rev_by_status")
        store.delete("lineitem_v", col("l_quantity") >= 48.0)
      }
      graft.core.JoinMaterializedView.refresh(store, "lineitem_v",
        "orders_v", "l_orderkey", "o_orderkey", "o_orderstatus",
        "l_extendedprice", "rev_by_status")
      graft.core.JoinMaterializedView.read(store, "rev_by_status")
        .select(col("o_orderstatus"), col("n").as("n_items"),
          col("total").cast("double").as("revenue"))
        .orderBy(col("o_orderstatus"))
    }),

    // DROP COLUMN round trip: commit `orders` clustered, then drop every
    // column except three as a DATA-LESS schema link (dropColumns — the
    // fat-column amputation that costs one metadata commit at 100 TB, not
    // a rewrite), and read the snapshot back through the connector with
    // SELECT *. The oracle selects exactly the three survivors from the
    // ORIGINAL parquet: a drop that failed to narrow the scan surfaces as
    // a schema mismatch, a drop that touched values surfaces as a hash
    // mismatch. Build idempotent like q97/q99.
    "q105_store_drop_column" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q105_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders")
      val keep = Set("o_orderkey", "o_orderstatus", "o_totalprice")
      // final head is v2: a torn build (crash between steps) re-runs
      // the whole block — the overwrite commit self-heals it
      if (store.latestVersion("orders").forall(_ < 2L)) {
        val src = Tables.orders(s, dir)
        store.commitClustered("orders", src, clusterBy = Seq("o_orderkey"))
        store.dropColumns("orders",
          src.columns.toSeq.filterNot(keep.contains))
      }
      s.read.format("graft").option("root", root).option("table", "orders")
        .load()
        .filter(col("o_orderkey") < 4000L)
        .orderBy(col("o_orderkey"))
    }),

    // SQL write-surface round trip: CREATE TABLE AS SELECT seeds half of
    // `orders` through the catalog (a store rewrite commit), INSERT INTO
    // appends the other half (the store's OCC chain-link append), and the
    // read goes back through the same catalog. The oracle is a plain
    // SELECT over the ORIGINAL parquet: the V1-write fallback, the commit
    // protocol, and the chain read must all be value-invisible. Build
    // idempotent like q97/q99.
    "q107_store_sql_insert" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q107_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders")
      // Fingerprinted catalog name — same stale-cached-instance hazard as
      // q104 (CatalogManager memoizes by name; a CTAS through a stale
      // instance finds the OTHER scale's table and refuses ALREADY_EXISTS).
      val cat = s"q107_${Tables.fingerprint(dir, "orders")}"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      // final head is v2: a torn build (crash between CTAS and INSERT)
      // re-runs the whole block — unlike the overwrite-commit fixtures,
      // CTAS refuses an existing table, so the heal DROPs the torn half
      // first (CREATE's contract; never reached on a complete fixture)
      if (store.latestVersion("orders").forall(_ < 2L)) {
        if (store.latestVersion("orders").isDefined)
          s.sql(s"DROP TABLE $cat.orders")
        Tables.orders(s, dir).createOrReplaceTempView("q107_src")
        s.sql(s"""CREATE TABLE $cat.orders AS
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM q107_src WHERE o_orderkey < 2000""")
        s.sql(s"""INSERT INTO $cat.orders
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM q107_src WHERE o_orderkey >= 2000 AND o_orderkey < 4000""")
      }
      s.sql(s"""SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM $cat.orders ORDER BY o_orderkey""")
    }),

    // CHECK-constraint round trip: seed half of `orders`, pin an ANSI
    // CHECK constraint (existing rows validated), append the other half
    // THROUGH enforcement, and — every run — prove a violating append
    // refuses without committing anything. The oracle is a plain SELECT
    // over the ORIGINAL parquet: enforcement must be value-invisible for
    // conforming writes and state-invisible for refused ones. Build
    // idempotent like q97/q99.
    "q108_store_constraint" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q108_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders")
      // final head is v3: a torn build (crash between steps) re-runs
      // the whole block — the overwrite commit self-heals it
      if (store.latestVersion("orders").forall(_ < 3L)) {
        val src = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        store.commitClustered("orders",
          src.filter(col("o_orderkey") < 2000L), clusterBy = Seq("o_orderkey"))
        store.addCheckConstraint("orders", "price_pos", "o_totalprice > 0")
        store.append("orders", src.filter(
          col("o_orderkey") >= 2000L && col("o_orderkey") < 4000L))
      }
      // refused writes must leave the table untouched — exercised per run
      val refused =
        try {
          store.append("orders", s.range(1).select(
            lit(9999999L).as("o_orderkey"), lit("X").as("o_orderstatus"),
            lit(-1.0).as("o_totalprice")))
          false
        } catch { case e: IllegalArgumentException =>
          e.getMessage.contains("price_pos")
        }
      if (!refused) throw new IllegalStateException(
        "q108: the violating append must refuse via the CHECK constraint")
      s.read.format("graft").option("root", root).option("table", "orders")
        .load()
        .orderBy(col("o_orderkey"))
    }),

    // RENAME COLUMN round trip: commit `orders` clustered, rename two
    // columns through the store's OCC rewrite, read the snapshot back
    // through the connector. The oracle aliases the ORIGINAL columns to
    // the new names: the rewrite must be value-invisible (a rename that
    // nulled a column — the data-less-rename hazard renameColumns exists
    // to prevent — fails the hash). Build idempotent like q97/q99.
    "q106_store_rename" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q106_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders")
      // final head is v2: a torn build (crash between steps) re-runs
      // the whole block — the overwrite commit self-heals it
      if (store.latestVersion("orders").forall(_ < 2L)) {
        store.commitClustered("orders", Tables.orders(s, dir),
          clusterBy = Seq("o_orderkey"))
        store.renameColumns("orders",
          Map("o_totalprice" -> "price", "o_orderpriority" -> "priority"))
      }
      s.read.format("graft").option("root", root).option("table", "orders")
        .load()
        .filter(col("o_orderkey") < 4000L)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("price"), col("priority"))
        .orderBy(col("o_orderkey"))
    }),

    // MERGE round trip (the reference's two-tier match-or-create ingest as
    // one atomic upsert): source = an update band derived from orders
    // itself (keys 100-999 re-prioritized) plus synthetic insert rows
    // (keys offset by 5M). The oracle replays the merge as CASE WHEN +
    // UNION ALL over the ORIGINAL parquet — matched-file rewrite, by-name
    // inserts (absent source columns read NULL), and the tombstone
    // resolution must all be value-invisible. Build idempotent like q99.
    "q102_store_merge" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q102_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      store.migrateLegacyTable("orders")
      // final head is v2: a torn build (crash between steps) re-runs
      // the whole block — the overwrite commit self-heals it
      if (store.latestVersion("orders").forall(_ < 2L)) {
        store.commitClustered("orders", Tables.orders(s, dir),
          clusterBy = Seq("o_orderkey"))
        val o = Tables.orders(s, dir)
        val src = o.where(col("o_orderkey").between(100L, 999L))
          .select(col("o_orderkey"), lit("9-MERGED").as("o_orderpriority"))
          .unionByName(o.where(col("o_orderkey") < 100L)
            .select((col("o_orderkey") + 5000000L).as("o_orderkey"),
              lit("9-NEW").as("o_orderpriority")))
        store.merge("orders", src,
          col("target.o_orderkey") === col("source.o_orderkey"),
          matchedUpdate = Some(Map(
            "o_orderpriority" -> col("source.o_orderpriority"))))
      }
      s.read.format("graft").option("root", root).option("table", "orders")
        .load()
        .filter(col("o_orderkey") < 4000L || col("o_orderkey") >= 5000000L)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    // Row-level UPDATE round trip (M5 merge_edge_types' store-level
    // mechanism): commit `orders` clustered, update a predicate band
    // (assignment references the OLD row: price scaled 1.1x, priority
    // re-tagged), read the final snapshot through the connector. The
    // oracle replays the update as CASE WHEN over the original parquet —
    // the copy-on-write rewrite must be value-invisible (the double
    // multiply is IEEE-identical cross-engine). Build idempotent, like
    // q97/q99.
    "q100_store_update" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q100_" +
        Tables.fingerprint(dir, "orders")
      val store = new graft.core.SnapshotStore(s, root)
      // fixture caches persist across builds: stamp pre-sentinel stores
      store.migrateLegacyTable("orders")
      // final head is v2: a torn build (crash between steps) re-runs
      // the whole block — the overwrite commit self-heals it
      if (store.latestVersion("orders").forall(_ < 2L)) {
        store.commitClustered("orders", Tables.orders(s, dir),
          clusterBy = Seq("o_orderkey"))
        store.update("orders",
          col("o_orderstatus") === "F" && col("o_orderkey") < 2000L,
          Map("o_totalprice" -> (col("o_totalprice") * 1.1),
            "o_orderpriority" -> lit("0-UPDATED")))
      }
      s.read.format("graft").option("root", root).option("table", "orders")
        .load()
        .filter(col("o_orderkey") < 4000L)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Epoch-log clock (M8/T8): per-kind event counts + min/max event id —
    // committed epoch = max(event_id) (ingestion.py:31-152).
    "q19_epoch_clock" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.groupBy(col("event_type").as("kind"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("committed_epoch"))
        .orderBy(col("kind"))
    }),

    // Time-bucketed aggregation (streaming-shaped, batch-equivalent of the
    // windowed stream agg in §2.12): hourly tumbling windows per type.
    "q20_time_window" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),
    // T8: concept-lifetime stream — per entity, the ordered evidence page
    // (first 10 events by event id, NULLS-LAST tiebreak contract) plus
    // totals and distinct-epoch counts (epoch_facade.py:52-196).
    "q47_lifetime" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id").asc_nulls_last)
      e.where(col("user_id") <= 30)
        .withColumn("rn", row_number().over(w))
        .withColumn("total_events", count(lit(1)).over(Window.partitionBy(col("user_id"))))
        .withColumn("distinct_kinds",
          size(collect_set(col("event_type")).over(Window.partitionBy(col("user_id"))))
            .cast("long"))
        .where(col("rn") <= 10)
        .select(col("user_id"), col("rn"), col("event_id"), col("event_type"),
          col("total_events"), col("distinct_kinds"))
        .orderBy(col("user_id"), col("rn"))
    }),

    // Backward as-of join (pipeline extension — the reference has only
    // equi-joins, §2.3): every error event matched to the same user's
    // latest click at-or-before it, via graft.operators.AsOfJoin's
    // union-tag + single-window shape (one shuffle, no range join).
    // Oracle: DuckDB's native ASOF JOIN. gap_us is exact BIGINT micros.
    "q65_asof_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val errors = e.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      graft.operators.AsOfJoin.asofBackward(errors, clicks,
          key = "user_id", ts = "ts", rightCols = Seq("click_id", "ts"))
        .where(col("r_click_id").isNotNull)
        .select(col("event_id"), col("user_id"),
          col("r_click_id").as("click_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("r_ts"))).as("gap_us"))
        .orderBy(col("event_id"))
    }),

    // Funnel analysis: users progressing signup → view → click → purchase
    // with strictly increasing timestamps (each stage's first event must
    // follow the previous stage's). Stage tables shrink monotonically and
    // each is PERSISTED — it feeds both the next stage's join and its own
    // count, which would otherwise recompute the chain. persist(), not
    // localCheckpoint: the lazy-checkpoint deadlock (Dedup.scala note)
    // does not apply to the cache path (no RDDCheckpointData locks), and
    // an EAGER checkpoint chain here serializes 8 blocking jobs where the
    // cache lets ONE job pipeline all four stages (measured at sf10:
    // eager 4.8-5.0 s vs 3.2-3.8 s; r19). The per-stage join is keyed by
    // user_id (broadcast while small, shuffle at scale), the classic
    // event-funnel shape.
    "q70_funnel" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_type"))
        .persist()
      def stageAfter(eventType: String, prev: DataFrame,
          prevTs: String, outTs: String): DataFrame =
        e.where(col("event_type") === eventType)
          .join(prev.select(col("user_id"), col(prevTs)), "user_id")
          .where(col("ts") > col(prevTs))
          .groupBy(col("user_id")).agg(min(col("ts")).as(outTs))
          .persist()
      val s1 = e.where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        .persist()
      val s2 = stageAfter("view", s1, "t1", "t2")
      val s3 = stageAfter("click", s2, "t2", "t3")
      val s4 = stageAfter("purchase", s3, "t3", "t4")
      Seq((1L, "signup", s1), (2L, "view", s2), (3L, "click", s3),
          (4L, "purchase", s4))
        .map { case (ord, name, df) =>
          df.agg(count(lit(1)).as("n_users"))
            .select(lit(ord).as("stage_ord"), lit(name).as("stage"),
              col("n_users"))
        }
        .reduce(_.unionByName(_))
        .orderBy(col("stage_ord"))
    }),

    // Cohort retention: users bucketed by first-seen week, distinct active
    // users per (cohort, week offset) — the engagement rollup every event
    // log feeds. First-seen is one aggregation joined back on user_id
    // (shuffle join on the key at scale); offsets are exact multiples of 7
    // days because both ends are week-truncated, so the division is
    // bit-exact cross-engine.
    "q66_cohort_retention" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val first = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      e.join(first, "user_id")
        .groupBy(
          date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          (datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Runtime-filter join (semi-join reduction): lineitem pruned by a Bloom
    // filter of the selective supplier subset's keys BEFORE the shuffle,
    // then exactly joined — identical rows to the plain join (the oracle
    // IS the plain join), with the fact-side shuffle cut to ~the matching
    // sliver. operators.RuntimeFilter; the 100 TB star-join pattern when
    // the dim is selective but not broadcast-visible to the planner.
    "q79_bloom_prune" -> ((s, dir) => {
      val rich = Tables.supplier(s, dir).where(col("s_acctbal") > 6000)
      graft.operators.RuntimeFilter.bloomPrunedJoin(
          Tables.lineitem(s, dir), rich, "l_suppkey", "s_suppkey",
          expectedKeys = 100000L)
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("s_suppkey"))
    }),

    // Bounded top-k aggregate (functions.TopK): top-3 orders by price per
    // priority via per-group ≤k heaps with map-side partial aggregation —
    // the scale path for the W3/K1 window pattern (shuffle carries
    // O(groups·k·partitions) rows, not every order). Oracle: the window
    // row_number form — the two shapes must agree row-for-row.
    "q80_group_topk" -> ((s, dir) => {
      val topk = graft.functions.TopK.topK(3)
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(topk(col("o_totalprice"), col("o_orderkey").cast("string")).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rank"),
          col("col.key").as("o_orderkey"), col("col.score").as("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rank"))
    }),

    // Keyless range join (operators.RangeJoin), aggregate-pushdown form:
    // purchases within one hour of ANY signup. The original shape —
    // pointInInterval (bucketed equi-join with the exact BETWEEN as
    // post-filter) then groupBy(signup) — is output-optimal when the PAIRS
    // are the product, but here they collapse straight into per-signup
    // count/min, and pair count grows as density² (the sf10 audit measured
    // 5.65 G pairs from 2 M + 2 M events, 34 s). intervalAggregate computes
    // the same aggregates from per-bucket SORTED point arrays via two
    // binary-search probes per (signup, bucket) row (functions.LowerBound,
    // codegen) — linear in the inputs at any density. Equivalence to the
    // pair-join form is differential-spec'd (AsOfJoinSpec); the SQL oracle
    // still states the literal join, so every run re-proves the algebra.
    // Micros arithmetic is integral, so both engines compare bit-exactly.
    "q81_interval_join" -> ((s, dir) => {
      val hourUs = 3600L * 1000000L
      val e = Tables.events(s, dir)
      val signups = e.where(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), unix_micros(col("ts")).as("lo"))
        .withColumn("hi", col("lo") + lit(hourUs))
      val purchases = e.where(col("event_type") === "purchase")
        .select(unix_micros(col("ts")).as("pt"))
      graft.operators.RangeJoin.intervalAggregate(
          purchases, signups, "pt", "lo", "hi", bucketWidth = hourUs,
          countName = "n_purchases", minName = "min_pt")
        .select(col("signup_id"), col("n_purchases"),
          (col("min_pt") - col("lo")).as("min_gap_us"))
        .orderBy(col("signup_id"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q81_interval_join" ->
      """SELECT s.event_id AS signup_id, count(*) AS n_purchases,
        |  min(p.pt - s.lo) AS min_gap_us
        |FROM (SELECT event_id, epoch_us(ts) AS lo FROM events
        |      WHERE event_type = 'signup') s
        |JOIN (SELECT event_id, epoch_us(ts) AS pt FROM events
        |      WHERE event_type = 'purchase') p
        |  ON p.pt BETWEEN s.lo AND s.lo + 3600000000
        |GROUP BY s.event_id
        |ORDER BY s.event_id""".stripMargin,

    "q79_bloom_prune" ->
      """SELECT s_suppkey, s_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_acctbal > 6000
        |GROUP BY s_suppkey, s_name
        |ORDER BY s_suppkey""".stripMargin,

    "q80_group_topk" ->
      """SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, CAST(o_orderkey AS VARCHAR) ASC) AS rank,
        |    CAST(o_orderkey AS VARCHAR) AS o_orderkey, o_totalprice
        |  FROM orders) t
        |WHERE rank <= 3
        |ORDER BY o_orderpriority, rank""".stripMargin,

    "q65_asof_join" ->
      """SELECT e.event_id, e.user_id, c.event_id AS click_event_id,
        |  epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY e.event_id""".stripMargin,

    "q70_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY e.user_id),
        |s4 AS (
        |  SELECT e.user_id, min(e.ts) AS t4 FROM events e JOIN s3 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_ord, 'signup' AS stage, count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'view', count(*) FROM s2
        |  UNION ALL SELECT 3, 'click', count(*) FROM s3
        |  UNION ALL SELECT 4, 'purchase', count(*) FROM s4) t
        |ORDER BY stage_ord""".stripMargin,

    "q66_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q47_lifetime" ->
      """SELECT user_id, rn, event_id, event_type, total_events, distinct_kinds
        |FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id ASC NULLS LAST) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS total_events,
        |    count(DISTINCT event_type) OVER (PARTITION BY user_id) AS distinct_kinds
        |  FROM events WHERE user_id <= 30) t
        |WHERE rn <= 10 ORDER BY user_id, rn""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(DISTINCT l_partkey) AS distinct_parts,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT c_custkey, c_name, c_mktsegment AS segment,
        |  round(c_acctbal * 1.1, 4) AS adj_balance
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING','MACHINERY','AUTOMOBILE')
        |  AND c_acctbal BETWEEN 100.0 AND 9000.0
        |  AND regexp_matches(c_name, 'Customer#0+1')
        |ORDER BY c_custkey""".stripMargin,

    "q03_join_chain" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q04_hydration" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice
        |FROM part
        |WHERE p_partkey IN (1,3,5,7,11,13,17,19,23,29)
        |ORDER BY p_partkey""".stripMargin,

    "q05_group_collect" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys,
        |  count(*) AS n_orders
        |FROM orders WHERE o_custkey <= 50
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q06_semi_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q07_best_per_group" ->
      """SELECT o_custkey, best_orderkey, best_price FROM (
        |  SELECT o_custkey, o_orderkey AS best_orderkey, o_totalprice AS best_price,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q08_lag_trend" ->
      """SELECT user_id, event_id, round(value, 4) AS value,
        |  round(coalesce(prev_value, 0.0), 4) AS prev_value,
        |  round(value - coalesce(prev_value, 0.0), 4) AS delta
        |FROM (
        |  SELECT user_id, event_id, value,
        |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
        |  FROM events WHERE user_id <= 20) t
        |ORDER BY user_id, event_id""".stripMargin,

    "q09_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 20""".stripMargin,

    "q10_pagination" ->
      """SELECT rn, c_custkey, c_acctbal FROM (
        |  SELECT c_custkey, c_acctbal,
        |    row_number() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer) t
        |WHERE rn BETWEEN 11 AND 30 ORDER BY rn""".stripMargin,

    "q55_keyset_page" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer WHERE c_custkey > 500
        |ORDER BY c_custkey LIMIT 20""".stripMargin,

    "q11_band_hint" ->
      """SELECT count(*) AS n_below,
        |  round(min(score), 6) AS min_score,
        |  round(max(score), 6) AS max_score,
        |  round(round(min(score), 6) - 0.02, 2) AS suggested_threshold
        |FROM (SELECT c_acctbal / 10000.0 AS score FROM customer) t
        |WHERE score BETWEEN 0.3 AND 0.7""".stripMargin,

    "q12_mm_confidence" ->
      """SELECT l_orderkey, n_items, n_parts, n_supps,
        |  round(composite / (composite + 2.0), 6) AS score,
        |  CASE WHEN n_items >= 5 AND n_parts >= 3 THEN 'confident'
        |       WHEN n_items >= 2 THEN 'tentative'
        |       ELSE 'insufficient' END AS level
        |FROM (
        |  SELECT l_orderkey, count(*) AS n_items,
        |    count(DISTINCT l_partkey) AS n_parts,
        |    count(DISTINCT l_suppkey) AS n_supps,
        |    count(*) / 10.0 + count(DISTINCT l_partkey) / 5.0
        |      + count(DISTINCT l_suppkey) / 10.0 AS composite
        |  FROM lineitem GROUP BY l_orderkey) t
        |ORDER BY l_orderkey""".stripMargin,

    "q13_weighted_mean" ->
      """SELECT l_suppkey,
        |  CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    / CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS weighted_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q14_corr" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q15_epistemic" ->
      """SELECT event_type, avg_value, sd_value, n,
        |  CASE WHEN n < 3 THEN 'INSUFFICIENT_DATA'
        |       WHEN avg_value > 60.0 THEN 'WELL_GROUNDED'
        |       WHEN avg_value < 40.0 THEN 'CONTRADICTED'
        |       ELSE 'MIXED' END AS status
        |FROM (
        |  SELECT event_type,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_value,
        |    round(stddev_samp(value), 4) AS sd_value,
        |    count(*) AS n
        |  FROM events GROUP BY event_type) t
        |ORDER BY event_type""".stripMargin,

    "q16_set_algebra" ->
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0),
        |     b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM a UNION SELECT c_custkey FROM b) u
        |UNION ALL
        |SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b) i
        |UNION ALL
        |SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b) e
        |ORDER BY op, c_custkey""".stripMargin,

    "q17_recency_distinct" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS recent_types
        |FROM (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn <= 5
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q18_star_join" ->
      """SELECT r_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN l_extendedprice ELSE 0.0 END
        |        AS DECIMAL(18,4))) AS DOUBLE) AS f_revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    // Same oracle as q18: the co-bucketed store layout must be
    // value-invisible — only the plan shape (zero fact⋈fact exchange)
    // differs.
    "q113_star_join_spj" ->
      """SELECT r_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN l_extendedprice ELSE 0.0 END
        |        AS DECIMAL(18,4))) AS DOUBLE) AS f_revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    // the composite bucket layout must be value-invisible: the same
    // derivation over the raw parquet
    "q116_composite_spj" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    CAST(count(*) AS BIGINT) AS ps_lines,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS ps_qty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT CAST(l_suppkey % 10 AS BIGINT) AS sgrp,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(sum(ps_lines) AS BIGINT) AS line_weight,
        |  CAST(sum(CAST(ps_qty AS DECIMAL(18,4))) AS DOUBLE) AS qty_weight
        |FROM lineitem l
        |JOIN ps ON l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
        |GROUP BY 1 ORDER BY sgrp""".stripMargin,

    // the non-uniform (16, 4) layout must be value-invisible: a plain
    // self-join over the raw parquet on the same compound key
    "q118_composite_dims" ->
      """SELECT l.l_linenumber AS ln,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
        |        * (CAST(1 AS DECIMAL(3,2)) - CAST(t.l_discount AS DECIMAL(3,2)))
        |        * (CAST(1 AS DECIMAL(3,2)) + CAST(t.l_tax AS DECIMAL(3,2))))
        |      AS DOUBLE) AS charged
        |FROM lineitem l
        |JOIN lineitem t
        |  ON l.l_orderkey = t.l_orderkey AND l.l_linenumber = t.l_linenumber
        |GROUP BY 1 ORDER BY ln""".stripMargin,

    // the time-clustered layout and the band-join runtime pruning must
    // be value-invisible: a plain interval join over the raw parquet
    "q119_band_window" ->
      """WITH w AS (
        |  SELECT o_orderkey AS w_key, o_orderdate AS w_start,
        |    o_orderdate + INTERVAL 60 DAY AS w_end
        |  FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 3)
        |SELECT w_key,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN w
        |  ON l_shipdate >= w_start AND l_shipdate < w_end
        |GROUP BY 1 ORDER BY w_key""".stripMargin,

    // The clustered layouts and the runtime pruning must be
    // value-invisible: a plain join over the original parquet.
    "q114_runtime_hydration" ->
      """SELECT l_orderkey, l_linenumber, o_orderstatus,
        |  l_quantity, l_extendedprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_custkey = 37
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q97_store_pointread" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey BETWEEN 1000 AND 2000
        |ORDER BY o_orderkey""".stripMargin,

    "q99_store_delete" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE NOT (o_orderkey BETWEEN 500 AND 1499)
        |  AND NOT (o_orderstatus = 'F' AND o_orderkey BETWEEN 1000 AND 2999)
        |  AND o_orderkey < 4000
        |ORDER BY o_orderkey""".stripMargin,

    "q101_store_dv_delete" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey % 97 <> 0
        |  AND o_orderkey < 4000
        |ORDER BY o_orderkey""".stripMargin,

    // The AS OF read pins the PRE-delete snapshot: the oracle is the
    // original table, no delete replay.
    "q103_store_timetravel" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey < 4000
        |ORDER BY o_orderkey""".stripMargin,

    // The bucketed layout must be value-invisible: plain join over the
    // original parquet.
    "q104_store_bucketed_join" ->
      """SELECT o_orderkey, o_orderstatus,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey < 8000
        |GROUP BY o_orderkey, o_orderstatus
        |ORDER BY o_orderkey""".stripMargin,

    // DuckDB computes the REAL count-distinct over the original parquet;
    // the RELY-driven COUNT rewrite must be value-invisible (sound only
    // because the key is genuinely unique — RELY's contract).
    "q110_rely_agg" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_orderkey) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // DuckDB executes the REAL inner join over the original parquet; the
    // FK-driven join elimination must be value-invisible (sound only
    // because every l_orderkey genuinely exists in orders — RELY's
    // referential-integrity contract).
    "q111_rely_join" ->
      """SELECT CAST(l_quantity AS BIGINT) AS qty_band,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1
        |ORDER BY qty_band""".stripMargin,

    // DuckDB replays the maintained join view's FINAL state over the
    // original parquet: the UPDATE as a CASE on the status band, the
    // DELETE as a WHERE on quantity. The incremental folds (half the
    // facts, then deltas on both sides) must land exactly here — a
    // double-fold, half-fold, or torn cut is a value mismatch.
    "q112_join_view" ->
      """SELECT CASE WHEN o_orderkey < 2000 THEN 'M' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_quantity < 48
        |GROUP BY 1
        |ORDER BY o_orderstatus""".stripMargin,

    // The mutations replay in SQL over the original parquet: the UPDATE
    // as a CASE over the status, the DELETE as a WHERE on quantity. The
    // bucketed layout, COW rewrite, and zero-exchange join must all be
    // value-invisible.
    "q109_spj_mutated" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey < 2000 THEN 'M' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey < 8000 AND l_quantity < 45
        |GROUP BY 1, 2
        |ORDER BY o_orderkey""".stripMargin,

    // The three survivors of the drop, straight off the original parquet:
    // schema compare pins the narrowing, value compare pins untouched data.
    "q105_store_drop_column" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey < 4000
        |ORDER BY o_orderkey""".stripMargin,

    // Conforming writes through CHECK enforcement are value-invisible;
    // the refused violator is state-invisible.
    "q108_store_constraint" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey < 4000
        |ORDER BY o_orderkey""".stripMargin,

    // CTAS seeded the <2000 band, INSERT INTO appended [2000, 4000): the
    // SQL write surface must be value-invisible vs the original parquet.
    "q107_store_sql_insert" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey < 4000
        |ORDER BY o_orderkey""".stripMargin,

    // The original columns aliased to the renamed names: the OCC rewrite
    // must be value-invisible.
    "q106_store_rename" ->
      """SELECT o_orderkey, o_orderstatus,
        |  o_totalprice AS price, o_orderpriority AS priority
        |FROM orders
        |WHERE o_orderkey < 4000
        |ORDER BY o_orderkey""".stripMargin,

    "q102_store_merge" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey BETWEEN 100 AND 999
        |         THEN '9-MERGED' ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey < 4000
        |  UNION ALL
        |  SELECT o_orderkey + 5000000 AS o_orderkey,
        |    NULL AS o_orderstatus, '9-NEW' AS o_orderpriority
        |  FROM orders WHERE o_orderkey < 100
        |) ORDER BY o_orderkey""".stripMargin,

    "q100_store_update" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'F' AND o_orderkey < 2000
        |       THEN '0-UPDATED' ELSE o_orderpriority END AS o_orderpriority,
        |  CASE WHEN o_orderstatus = 'F' AND o_orderkey < 2000
        |       THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice
        |FROM orders
        |WHERE o_orderkey < 4000
        |ORDER BY o_orderkey""".stripMargin,

    "q19_epoch_clock" ->
      """SELECT event_type AS kind, count(*) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS committed_epoch
        |FROM events GROUP BY event_type ORDER BY kind""".stripMargin,

    "q20_time_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
  )
}
