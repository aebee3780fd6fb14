package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The store's BUCKET transform as a DSv2 catalog function — the piece
  * that makes storage-partitioned joins resolvable.
  *
  * `SnapshotStore.commitBucketed(t, df, cols, n)` writes each file so that
  * every row in it satisfies `bucketId(cols) = pmod(murmur3(cols, seed=42),
  * n)` (it IS Spark's own `HashPartitioning.partitionIdExpression` — the
  * writer just calls `df.repartition(n, cols…)` and the task partition
  * index, which names the file, is exactly that expression). The graft
  * scan then reports `KeyGroupedPartitioning(bucket(n, cols…), n)`;
  * Catalyst's V2ScanPartitioningAndOrdering resolves the `bucket`
  * transform against the table's catalog AS A FUNCTION CATALOG
  * (GraftCatalog.loadFunction), and EnsureRequirements can plan two
  * co-bucketed graft tables' join with NO exchange on either side —
  * Iceberg/Delta's storage-partitioned join, on the snapshot store.
  * COMPOSITE keys ride the same machinery: `bucket(n, a, b)` is one
  * transform whose murmur3 folds over the key tuple, exactly like
  * `HashPartitioning(Seq(a, b), n)` does — so a two-column fact⋈fact
  * equality join gets the zero-exchange plan too.
  *
  * [[GraftBucketFunction.bucketId]] is the single definition of the hash
  * both the writer and this function's `produceResult` (used when Spark
  * shuffles a NON-bucketed side to match, `…bucketing.shuffle.enabled`)
  * must agree on — it replicates `Murmur3Hash(children, 42)` + `Pmod`
  * exactly: the running hash seeds each column's murmur3 in order, and a
  * null column folds the running seed through unchanged, like the
  * HashExpression. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col...): pmod(murmur3(cols, 42), numBuckets) — " +
      "the graft store's write-time bucket id"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      s"bucket takes (numBuckets, col...), got ${inputType.simpleString}")
    require(inputType.head.dataType == IntegerType,
      s"bucket's first argument is the int bucket count, got " +
        inputType.head.dataType.simpleString)
    BoundBucket(inputType.fields.drop(1).map(_.dataType).toSeq)
  }

  /** Spark's `HashPartitioning.partitionIdExpression` for one expression:
    * `pmod(Murmur3Hash(Seq(e), seed = 42), n)`. Null folds the seed
    * through unchanged, exactly like the HashExpression. */
  def bucketId(value: Any, valueType: DataType, numBuckets: Int): Int =
    bucketIdOf(Seq((value, valueType)), numBuckets)

  /** The COMPOSITE form: `pmod(Murmur3Hash(values, 42), n)` — the fold
    * `HashExpression.eval` runs, each column's hash seeding the next. */
  def bucketIdOf(values: Seq[(Any, DataType)], numBuckets: Int): Int = {
    var h = 42
    values.foreach { case (v, t) =>
      if (v != null) h = Murmur3HashFunction.hash(v, t, h.toLong).toInt
    }
    ((h % numBuckets) + numBuckets) % numBuckets
  }
}

/** The bound face: (int numBuckets, values…) -> int bucket id.
  * `canonicalName` is what makes two graft tables' bucket transforms
  * compare equal across scans — EnsureRequirements' co-partition check
  * keys on it plus the bucket count. */
final case class BoundBucket(valueTypes: Seq[DataType])
    extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def inputTypes(): Array[DataType] =
    (IntegerType +: valueTypes).toArray
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer =
    GraftBucketFunction.bucketIdOf(
      valueTypes.zipWithIndex.map { case (t, i) => (input.get(i + 1, t), t) },
      input.getInt(0))
}

object BoundBucket {
  /** Binary-compat face for the single-column case. */
  def apply(valueType: DataType): BoundBucket = BoundBucket(Seq(valueType))
}

/** A snapshot chain's bucket LAYOUT: the claim columns and the
  * PER-COLUMN bucket counts. Single-key tables have one dim; COMPOSITE
  * keys carry one dim per column, and a file's partition index encodes
  * the component ids in mixed radix (row-major over `dims`):
  * `idx = ((b₁·n₂ + b₂)·n₃ + b₃)…`, with `bᵢ = pmod(murmur3(colᵢ, 42),
  * nᵢ)` — each column hashed INDEPENDENTLY, which is what lets the scan
  * report one single-reference `bucket(nᵢ, colᵢ)` transform per column
  * (Spark's storage-partitioned joins refuse multi-reference transforms:
  * `KeyGroupedPartitioning.satisfies0` requires exactly one reference
  * per partition expression). */
final case class BucketLayout(cols: Seq[String], dims: Seq[Int]) {
  require(cols.length == dims.length && cols.nonEmpty,
    s"bucket layout arity mismatch: $cols vs $dims")
  val total: Int = dims.product

  /** Mixed-radix decode: partition index → per-column component ids. */
  def decode(idx: Int): Array[Int] = {
    val out = new Array[Int](dims.length)
    var rest = idx
    var i = dims.length - 1
    while (i >= 0) { out(i) = rest % dims(i); rest /= dims(i); i -= 1 }
    out
  }

  /** Position of `colLower` in the key tuple, if it is a key column. */
  def posOf(colLower: String): Option[Int] = {
    val i = cols.indexWhere(_.toLowerCase(java.util.Locale.ROOT) == colLower)
    if (i < 0) None else Some(i)
  }
}

object GraftBucketRouting {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()

  /** `tokens(r)` = the smallest non-negative int whose
    * `pmod(murmur3(int, 42), total)` equals `r` — the routing column a
    * composite-key writer adds so `repartition(total, token)` lands each
    * row on EXACTLY partition `r` (plain repartition hashes; only via a
    * preimage can the writer pick the index, and the part index IS the
    * file's bucket attribution). Driver-side, memoized per `total`;
    * expected scan length ≈ total·ln(total). */
  def tokens(total: Int): Array[Int] =
    cache.computeIfAbsent(total, t => {
      val out = new Array[Int](t)
      val found = new Array[Boolean](t)
      var remaining = t
      var i = 0
      while (remaining > 0) {
        val r = GraftBucketFunction.bucketId(i, IntegerType, t)
        if (!found(r)) { found(r) = true; out(r) = i; remaining -= 1 }
        i += 1
      }
      out
    })
}
