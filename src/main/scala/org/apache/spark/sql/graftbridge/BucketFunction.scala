package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The store's BUCKET transform as a DSv2 catalog function — the piece
  * that makes storage-partitioned joins resolvable.
  *
  * `SnapshotStore.commitBucketed(t, df, c, n)` writes each file so that
  * every row in it satisfies `bucketId(c) = pmod(murmur3(c, seed=42), n)`
  * (it IS Spark's own `HashPartitioning.partitionIdExpression` — the
  * writer just calls `df.repartition(n, col(c))` and the task partition
  * index, which names the file, is exactly that expression). The graft
  * scan then reports `KeyGroupedPartitioning(bucket(n, c), n)`; Catalyst's
  * V2ScanPartitioningAndOrdering resolves the `bucket` transform against
  * the table's catalog AS A FUNCTION CATALOG (GraftCatalog.loadFunction),
  * and EnsureRequirements can plan two co-bucketed graft tables' join
  * with NO exchange on either side — Iceberg/Delta's storage-partitioned
  * join, on the snapshot store.
  *
  * [[GraftBucketFunction.bucketId]] is the single definition of the hash
  * both the writer and this function's `produceResult` (used when Spark
  * shuffles a NON-bucketed side to match, `…bucketing.shuffle.enabled`)
  * must agree on — it replicates `Murmur3Hash(Seq(c), 42)` + `Pmod`
  * exactly, nulls hashing to the untouched seed like the expression. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): pmod(murmur3(col, 42), numBuckets) — the " +
      "graft store's write-time bucket id"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.simpleString}")
    require(inputType.head.dataType == IntegerType,
      s"bucket's first argument is the int bucket count, got " +
        inputType.head.dataType.simpleString)
    BoundBucket(inputType(1).dataType)
  }

  /** Spark's `HashPartitioning.partitionIdExpression` for one expression:
    * `pmod(Murmur3Hash(Seq(e), seed = 42), n)`. Null folds the seed
    * through unchanged, exactly like the HashExpression. */
  def bucketId(value: Any, valueType: DataType, numBuckets: Int): Int = {
    val h =
      if (value == null) 42
      else Murmur3HashFunction.hash(value, valueType, 42L).toInt
    ((h % numBuckets) + numBuckets) % numBuckets
  }
}

/** The bound face: (int numBuckets, `valueType` value) -> int bucket id.
  * `canonicalName` is what makes two graft tables' bucket transforms
  * compare equal across scans — EnsureRequirements' co-partition check
  * keys on it plus the bucket count. */
final case class BoundBucket(valueType: DataType)
    extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer =
    GraftBucketFunction.bucketId(
      input.get(1, valueType), valueType, input.getInt(0))
}
