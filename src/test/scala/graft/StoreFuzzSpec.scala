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
          if (rnd.nextBoolean() && renameable.nonEmpty) { // rename (OCC rewrite; clears drops)
            val from = renameable(rnd.nextInt(renameable.size))
            val to = freshCol()
            model.rename(from, to)
            model.dropped = Set.empty // rewrite resets the chain
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

    // the guard held throughout: no appended column ever reused a dropped
    // name (freshCol is monotonic), so the run never tripped resurrection
    // — now trip it deliberately from the fuzz end-state if a drop is live
    if (model.dropped.nonEmpty) {
      val dead = model.dropped.head
      val e = intercept[IllegalArgumentException](
        st.append("t", df(Seq(Seq(Some(1L))), Seq(dead))))
      assert(e.getMessage.contains("re-introduces dropped"))
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
}
