package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the builder-prompt checklist:
  * "salting for skew, AQE for runtime re-plan"). AQE's skew-join handles
  * sort-merge cases automatically; these helpers cover the two shapes AQE
  * does not: skewed aggregation and broadcast-unfriendly skewed joins with
  * a known-hot key distribution.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial → groupBy(key)
    * final. Correct for algebraic aggregates expressed as (partial, merge)
    * column pairs — here sum/count/min/max, which cover the engine's
    * aggregate surface after the DECIMAL-sum convention. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
      saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Salted join for a skewed fact against a small-ish dim that is still
    * too big to broadcast: replicate each dim row `saltBuckets` times, salt
    * the fact side randomly-but-deterministically, join on (key, salt).
    * Result equals the plain join; the hot key's rows spread over
    * `saltBuckets` reducers. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
