package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Argmin-L2² centroid assignment as one projection — the k-means/SemDeDup
  * assignment step (reference: numpy row loop,
  * embedding_projection_service.py:753-807) without the N×k join.
  *
  * The DataFrame-shaped alternative (crossJoin to a k-row centroid table,
  * then `min(struct(dist, cid))` per vector) materializes N×k rows into a
  * partial aggregate — measured 23 s at sf10 (200k vectors × 800
  * centroids) even with a codegen distance kernel, because 160M
  * (dist, cid) structs still flow through the hash aggregate. This
  * expression keeps the whole argmin inside whole-stage codegen: the
  * centroid matrix rides along as a reference object (k·d doubles — the
  * SemDeDup knob k = N/250 keeps it ~4 MB at 2M vectors), each row costs
  * one fused k×d loop, and nothing shuffles.
  *
  * Semantics are BIT-IDENTICAL to the join+min(struct) form it replaces:
  * per-centroid distance accumulates (x−c)² sequentially in index order
  * (same IEEE ops as the `aggregate(zip_with(...))` HOF and the DuckDB
  * oracle's list_reduce), centroids are visited in ascending id order with
  * a strict `<` improvement test, so exact-tie distances keep the smallest
  * centroid id — `min(struct(dist, cid))` semantics. A centroid whose
  * dimension differs from the input vector is skipped (its HOF distance
  * was NULL, which `min` ignored); no candidate at all → NULL.
  *
  * Beyond literal-broadcast scale (k in the tens of millions at 100 TB),
  * assignment moves to the IVF index's cell-probe path (AnnIndex) — this
  * expression is the dense exact rung below it. */
case class NearestCentroid(child: Expression, ids: Array[Long],
    centroids: Array[Array[Double]]) extends UnaryExpression {

  require(ids.length == centroids.length,
    s"ids (${ids.length}) and centroids (${centroids.length}) must align")
  require(ids.length > 0, "at least one centroid required")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid requires array<double> input, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var best = Double.PositiveInfinity
    var bestId = -1L
    var found = false
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (cent.length == n) {
        var acc = 0.0
        var i = 0
        while (i < n) {
          val d = x.getDouble(i) - cent(i)
          acc += d * d
          i += 1
        }
        if (!found || acc < best) { best = acc; bestId = ids(c); found = true }
      }
      c += 1
    }
    if (found) bestId else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val cids = ctx.addReferenceObj("centroidIds", ids, "long[]")
    val n = ctx.freshName("n")
    val best = ctx.freshName("best")
    val bestId = ctx.freshName("bestId")
    val found = ctx.freshName("found")
    val c = ctx.freshName("c")
    val cent = ctx.freshName("cent")
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |final int $n = $a.numElements();
         |double $best = Double.POSITIVE_INFINITY;
         |long $bestId = -1L;
         |boolean $found = false;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  final double[] $cent = $cents[$c];
         |  if ($cent.length == $n) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      final double $d = $a.getDouble($i) - $cent[$i];
         |      $acc += $d * $d;
         |    }
         |    if (!$found || $acc < $best) {
         |      $best = $acc; $bestId = $cids[$c]; $found = true;
         |    }
         |  }
         |}
         |if ($found) { ${ev.value} = $bestId; } else { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point; `ids`/`centroids` must be sorted ascending by
    * id for the min-id tie-break contract. */
  def col(v: Column, ids: Array[Long], centroids: Array[Array[Double]]): Column =
    Bridge.column(NearestCentroid(
      Bridge.expression(v.cast("array<double>")), ids, centroids))
}
