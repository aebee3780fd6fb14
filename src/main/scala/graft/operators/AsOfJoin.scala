package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the right row with the
  * greatest timestamp ≤ the left row's timestamp within the same key
  * (the "latest state as of this event" lookup: last click before an
  * error, last quote before a trade, last config before a job).
  *
  * The reference has no as-of/range join anywhere (SURVEY §2.3: all its
  * joins are equi-joins), so this is a pipeline extension. It is NOT
  * implemented as a range join — a theta join on `r.ts <= l.ts` explodes
  * to every-prior-row pairs before picking the max. Instead both sides
  * are union-tagged and a single window pass carries the latest right
  * payload forward:
  *
  *   1. tag right rows 0, left rows 1; union on (key, ts, tag, payload)
  *   2. one window partitioned by key, ordered by (ts, tag), running
  *      `last(right_payload, ignoreNulls)` — right rows sort before left
  *      rows at equal ts, so the match is inclusive (ts_right ≤ ts_left),
  *      exactly DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` semantics
  *   3. keep left rows; the carried struct is the match (null = no prior
  *      right row)
  *
  * Cost: ONE shuffle keyed by `key` and a linear in-partition pass —
  * survives a 100 TB event log where the per-key candidate range join
  * would not. Ties among right rows with identical (key, ts) are broken
  * arbitrarily; with sub-second event timestamps they do not occur, and
  * callers needing total determinism should disambiguate ts first.
  *
  * Output: every left column, plus each `rightCols` column as
  * `r_<name>` (null when no right row precedes). Filter
  * `r_<first>.isNotNull` for inner-join semantics.
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(key).as("__k"), col(ts).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"))
    val r = right.select(
      col(key).as("__k"), col(ts).as("__t"), lit(0).as("__side"),
      struct(rightCols.map(col): _*).as("__r"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__m.$c").as(s"r_$c")): _*)
  }
}
