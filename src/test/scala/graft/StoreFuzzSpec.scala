package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.core.SnapshotStore

import scala.util.Random

/** Model-based fuzz of the snapshot store's mutation surface: a seeded
  * random interleaving of append / delete / update / addColumns /
  * dropColumns / renameColumns / compact is applied BOTH to the store and
  * to a trivially-correct in-memory model, asserting full read parity at
  * every step. What the hand-written specs pin one interaction at a time,
  * this pins compositionally: schema links layered over deltas over
  * tombstones over deletion vectors must read exactly like the flat model
  * no matter the order they stack in. The seed is fixed — a failure
  * replays deterministically (print `ops` to see the failing script). */
class StoreFuzzSpec extends SparkSpec {

  // The model: column names in STORE ORDER (adds append, drops remove,
  // renames in place) and rows as name->value maps (None = SQL NULL).
  private final class Model {
    var cols: Vector[String] = Vector.empty
    var rows: Vector[Map[String, Option[Long]]] = Vector.empty
    var dropped: Set[String] = Set.empty

    def snapshot: Seq[Seq[Option[Long]]] = rows.map(r => cols.map(r(_)))
    def addCol(c: String): Unit = {
      cols :+= c; rows = rows.map(_ + (c -> None))
    }
    def dropCols(cs: Seq[String]): Unit = {
      cols = cols.filterNot(cs.contains)
      rows = rows.map(_ -- cs)
      dropped ++= cs.map(_.toLowerCase)
    }
    def rename(from: String, to: String): Unit = {
      cols = cols.map(c => if (c == from) to else c)
      rows = rows.map(r => (r - from) + (to -> r(from)))
    }
    def append(newRows: Seq[Map[String, Option[Long]]], newCols: Seq[String]): Unit = {
      newCols.filterNot(cols.contains).foreach(addCol)
      rows ++= newRows.map(r => cols.map(c => c -> r.getOrElse(c, None)).toMap)
    }
    // delete where col % m == rem (NULL never matches, like SQL)
    def delete(c: String, m: Long, rem: Long): Unit =
      rows = rows.filterNot(_(c).exists(v => Math.floorMod(v, m) == rem))
    // update set tgt = tgt + 1 where col % m == rem (NULL + 1 = NULL)
    def update(c: String, m: Long, rem: Long, tgt: String): Unit =
      rows = rows.map { r =>
        if (r(c).exists(v => Math.floorMod(v, m) == rem))
          r + (tgt -> r(tgt).map(_ + 1L))
        else r
      }
  }

  test("random mutation interleavings read exactly like the flat model") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("graft-fuzz").toString
    val st = new SnapshotStore(spark, root)
    val rnd = new Random(421405L)
    val model = new Model
    var nextCol = 0
    def freshCol(): String = { nextCol += 1; s"c$nextCol" }
    val ops = scala.collection.mutable.ArrayBuffer[String]()

    def df(rows: Seq[Seq[Option[Long]]], cols: Seq[String]): DataFrame = {
      val schema = StructType(cols.map(StructField(_, LongType)))
      spark.createDataFrame(
        rows.map(r => Row.fromSeq(r.map(_.map(Long.box).orNull))).asJava,
        schema)
    }

    // seed commit: two columns, a handful of rows
    val c0 = freshCol(); val c1 = freshCol()
    model.append(Seq.tabulate(8)(i =>
      Map(c0 -> Some(i.toLong), c1 -> Some(rnd.nextInt(50).toLong))),
      Seq(c0, c1))
    st.commit("t", df(model.snapshot, model.cols))
    ops += s"commit($c0,$c1)"

    def verify(step: String): Unit = {
      val got = st.read("t")
      assert(got.columns.toSeq == model.cols,
        s"schema drift after $step\nops: ${ops.mkString("; ")}")
      val gotRows = got.collect().toSeq
        .map(r => model.cols.indices.map(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i))))
        .sortBy(_.toString)
      val want = model.snapshot.sortBy(_.toString)
      assert(gotRows == want,
        s"row drift after $step\nops: ${ops.mkString("; ")}\n" +
          s"got:  $gotRows\nwant: $want")
    }
    verify("seed")

    // Time-travel checkpoints: (version, schema, rows) captured mid-run;
    // every later mutation/DDL must leave them byte-readable unchanged.
    val checkpoints = scala.collection.mutable.ArrayBuffer[
      (Long, Vector[String], Seq[Seq[Option[Long]]])]()
    // One live CHECK constraint from mid-run on: its column is excluded
    // from drop/rename (the store would refuse; the model mirrors by not
    // proposing), and its predicate is never violated by the generators
    // (values stay far below the bound) — so every subsequent write path
    // runs THROUGH enforcement.
    var protectedCol: Option[String] = None

    (1 to 40).foreach { step =>
      if (step % 10 == 0)
        checkpoints += ((st.latestVersion("t").get, model.cols, model.snapshot))
      if (step == 20) {
        val c = model.cols(rnd.nextInt(model.cols.size))
        st.addCheckConstraint("t", "fuzz_bound", s"$c IS NULL OR $c < 100000")
        protectedCol = Some(c)
        ops += s"addCheckConstraint($c < 100000)"
        // a violating append must refuse and leave the table untouched
        val e = intercept[IllegalArgumentException](
          st.append("t", df(Seq(Seq(Some(200000L))), Seq(c))))
        assert(e.getMessage.contains("fuzz_bound"))
        verify("constraint refusal leaves state intact")
      }
      rnd.nextInt(7) match {
        case 0 | 1 => // append, sometimes with a brand-new column
          val extra =
            if (rnd.nextBoolean() && model.cols.size < 6) Seq(freshCol())
            else Nil
          val useCols = rnd.shuffle(model.cols.toSeq)
            .take(1 + rnd.nextInt(model.cols.size)) ++ extra
          val n = 1 + rnd.nextInt(5)
          val newRows = Seq.fill(n)(useCols.map(c =>
            c -> (if (rnd.nextInt(8) == 0) None
                  else Some(rnd.nextInt(60).toLong))).toMap)
          model.append(newRows, useCols)
          st.append("t", df(
            newRows.map(r => useCols.map(r(_))), useCols))
          ops += s"append($n rows, ${useCols.mkString(",")})"
        case 2 => // delete by modulus (exercises tombstones AND DVs)
          val c = model.cols(rnd.nextInt(model.cols.size))
          val m = 2L + rnd.nextInt(5); val r = rnd.nextInt(m.toInt).toLong
          model.delete(c, m, r)
          st.delete("t", pmod(col(c), lit(m)) === lit(r))
          ops += s"delete($c % $m == $r)"
        case 3 => // update tgt = tgt + 1 by modulus
          val c = model.cols(rnd.nextInt(model.cols.size))
          val tgt = model.cols(rnd.nextInt(model.cols.size))
          val m = 2L + rnd.nextInt(5); val r = rnd.nextInt(m.toInt).toLong
          model.update(c, m, r, tgt)
          st.update("t", pmod(col(c), lit(m)) === lit(r),
            Map(tgt -> (col(tgt) + lit(1L))))
          ops += s"update($tgt += 1 where $c % $m == $r)"
        case 4 => // schema widen
          if (model.cols.size < 7) {
            val c = freshCol()
            model.addCol(c)
            st.addColumns("t", StructType(Seq(StructField(c, LongType))))
            ops += s"addColumns($c)"
          }
        case 5 => // schema narrow (keep at least two columns; the
          // constraint's column is excluded — the store would refuse)
          val droppable = model.cols.filterNot(protectedCol.contains)
          if (model.cols.size > 2 && droppable.nonEmpty) {
            val c = droppable(rnd.nextInt(droppable.size))
            model.dropCols(Seq(c))
            st.dropColumns("t", Seq(c))
            ops += s"dropColumns($c)"
          }
        case 6 =>
          val renameable = model.cols.filterNot(protectedCol.contains)
          if (rnd.nextBoolean() && renameable.nonEmpty) {
            // rename — a data-less metadata link on this ID'd chain
            // (fresh target names keep it off the swap-fallback path);
            // drop markers persist through it, unlike the old rewrite
            val from = renameable(rnd.nextInt(renameable.size))
            val to = freshCol()
            model.rename(from, to)
            st.renameColumns("t", Map(from -> to))
            ops += s"rename($from -> $to)"
          } else { // compact (content-neutral; clears drops)
            model.dropped = Set.empty
            st.compact("t")
            ops += "compact"
          }
      }
      verify(ops.last)
    }

    // ID'd-chain resurrection SAFETY (the r15 contract): re-introducing a
    // dropped name is allowed — the re-added column mints a fresh field
    // id, so the dead column's bytes are unreachable and prior rows read
    // null under it. freshCol is monotonic, so the run itself never
    // reused a name; trip the path deliberately from the end state.
    if (model.dropped.nonEmpty) {
      val dead = model.dropped.head
      val priorRows = model.rows.size
      model.append(Seq(Map(dead -> Some(1L))), Seq(dead))
      st.append("t", df(Seq(Seq(Some(1L))), Seq(dead)))
      ops += s"re-add dropped $dead"
      verify("re-added dropped name reads null on prior rows, value on new")
      assert(st.read("t").where(col(dead).isNotNull).count() == 1L &&
        priorRows + 1 == model.rows.size,
        "exactly the one new row may carry the re-added column")
    }

    // time travel: every mid-run checkpoint reads back EXACTLY as captured,
    // untouched by the 20-30 mutations and DDL links layered after it
    assert(checkpoints.nonEmpty)
    checkpoints.foreach { case (v, cols, snap) =>
      val at = st.readAt("t", v)
      assert(at.columns.toSeq == cols,
        s"time-travel schema drift at v=$v\nops: ${ops.mkString("; ")}")
      val got = at.collect().toSeq
        .map(r => cols.indices.map(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i))))
        .sortBy(_.toString)
      assert(got == snap.sortBy(_.toString),
        s"time-travel row drift at v=$v\nops: ${ops.mkString("; ")}")
    }
  }

  test("rename-heavy schedule: metadata renames stack over mutations exactly") {
    // The r15 metadata-rename path under pressure: renames dominate the
    // op mix, interleaved with appends/deletes/updates, so the pruning
    // name-mapping, the pinned per-version schemas, and the feed-neutral
    // links stack many deep. Every rename to a fresh name must be the
    // DATA-LESS link (op tag pinned), and reads must match the model at
    // every step and at every time-travel checkpoint.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("graft-fuzz-ren").toString
    val st = new SnapshotStore(spark, root)
    val rnd = new Random(150815L)
    val model = new Model
    var nextCol = 0
    def freshCol(): String = { nextCol += 1; s"r$nextCol" }
    val ops = scala.collection.mutable.ArrayBuffer[String]()
    def df(rows: Seq[Seq[Option[Long]]], cols: Seq[String]): DataFrame = {
      val schema = StructType(cols.map(StructField(_, LongType)))
      spark.createDataFrame(
        rows.map(r => Row.fromSeq(r.map(_.map(Long.box).orNull))).asJava,
        schema)
    }
    val c0 = freshCol(); val c1 = freshCol(); val c2 = freshCol()
    model.append(Seq.tabulate(10)(i => Map(
      c0 -> Some(i.toLong), c1 -> Some((i * 3).toLong),
      c2 -> Some(rnd.nextInt(40).toLong))), Seq(c0, c1, c2))
    st.commit("t", df(model.snapshot, model.cols))
    def verify(step: String): Unit = {
      val got = st.read("t")
      assert(got.columns.toSeq == model.cols,
        s"schema drift after $step\nops: ${ops.mkString("; ")}")
      val gotRows = got.collect().toSeq
        .map(r => model.cols.indices.map(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i))))
        .sortBy(_.toString)
      assert(gotRows == model.snapshot.sortBy(_.toString),
        s"row drift after $step\nops: ${ops.mkString("; ")}")
    }
    val checkpoints = scala.collection.mutable.ArrayBuffer[
      (Long, Vector[String], Seq[Seq[Option[Long]]])]()
    var metadataRenames = 0
    (1 to 24).foreach { step =>
      if (step % 8 == 0)
        checkpoints += ((st.latestVersion("t").get, model.cols, model.snapshot))
      rnd.nextInt(5) match {
        case 0 | 1 | 2 => // RENAME to a fresh name — must stay data-less
          val from = model.cols(rnd.nextInt(model.cols.size))
          val to = freshCol()
          model.rename(from, to)
          st.renameColumns("t", Map(from -> to))
          val tag = st.commitProps("t", st.latestVersion("t").get)
            .get(graft.core.SnapshotStore.OpProp)
          assert(tag.contains("rename-columns-metadata"),
            s"fresh-name rename took $tag, not the metadata path " +
              s"(ops: ${ops.mkString("; ")})")
          metadataRenames += 1
          ops += s"rename($from -> $to)"
        case 3 => // append through the renamed schema
          val n = 1 + rnd.nextInt(4)
          val useCols = model.cols
          val newRows = Seq.fill(n)(useCols.map(c =>
            c -> (if (rnd.nextInt(8) == 0) None
                  else Some(rnd.nextInt(60).toLong))).toMap)
          model.append(newRows, useCols)
          st.append("t", df(newRows.map(r => useCols.map(r(_))), useCols))
          ops += s"append($n)"
        case 4 => // delete/update by modulus on a renamed column
          val c = model.cols(rnd.nextInt(model.cols.size))
          val m = 2L + rnd.nextInt(4); val r = rnd.nextInt(m.toInt).toLong
          if (rnd.nextBoolean()) {
            model.delete(c, m, r)
            st.delete("t", pmod(col(c), lit(m)) === lit(r))
            ops += s"delete($c % $m == $r)"
          } else {
            val tgt = model.cols(rnd.nextInt(model.cols.size))
            model.update(c, m, r, tgt)
            st.update("t", pmod(col(c), lit(m)) === lit(r),
              Map(tgt -> (col(tgt) + lit(1L))))
            ops += s"update($tgt += 1 where $c % $m == $r)"
          }
      }
      verify(ops.last)
    }
    assert(metadataRenames >= 8, s"schedule drew too few renames: $metadataRenames")
    // time travel under many stacked renames: pinned schemas hold
    checkpoints.foreach { case (v, cols, snap) =>
      val at = st.readAt("t", v)
      assert(at.columns.toSeq == cols,
        s"time-travel schema drift at v=$v\nops: ${ops.mkString("; ")}")
      val got = at.collect().toSeq
        .map(r => cols.indices.map(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i))))
        .sortBy(_.toString)
      assert(got == snap.sortBy(_.toString),
        s"time-travel row drift at v=$v\nops: ${ops.mkString("; ")}")
    }
  }
}
