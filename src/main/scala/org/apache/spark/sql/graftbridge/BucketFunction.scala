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
  * scan then reports `KeyGroupedPartitioning(bucket(n, c), n)`;
  * Catalyst's V2ScanPartitioningAndOrdering resolves the `bucket`
  * transform against the table's catalog AS A FUNCTION CATALOG
  * (GraftCatalog.loadFunction), and EnsureRequirements can plan two
  * co-bucketed graft tables' join with NO exchange on either side —
  * Iceberg/Delta's storage-partitioned join, on the snapshot store.
  * COMPOSITE keys do NOT use a multi-argument form of this function:
  * Spark's SPJ machinery requires single-reference partition
  * transforms, so a composite layout reports one `bucket(nᵢ, colᵢ)` per
  * key column and composes the per-column ids into a MIXED-RADIX
  * partition index ([[BucketLayout]]) — `bind` refuses extra arguments
  * so no consumer can compute a tuple-fold id that matches no file.
  *
  * [[GraftBucketFunction.bucketId]] is the single definition of the hash
  * both the writer and this function's `produceResult` (used when Spark
  * shuffles a NON-bucketed side to match, `…bucketing.shuffle.enabled`)
  * must agree on — it replicates `Murmur3Hash(Seq(col), 42)` + `Pmod`
  * exactly, nulls hashing to the untouched seed like the expression. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): pmod(murmur3(col, 42), numBuckets) — the " +
      "graft store's write-time bucket id (one per column on composite keys)"

  override def bind(inputType: StructType): BoundFunction = {
    // exactly ONE key column: composite layouts are per-column
    // transforms over mixed-radix indices, never a tuple fold — a
    // multi-arg bind would let a consumer compute ids no file carries
    require(inputType.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.simpleString}")
    require(inputType.head.dataType == IntegerType,
      s"bucket's first argument is the int bucket count, got " +
        inputType.head.dataType.simpleString)
    BoundBucket(inputType.fields.drop(1).map(_.dataType).toSeq)
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

/** The bound face: (int numBuckets, values…) -> int bucket id.
  * `canonicalName` is what makes two graft tables' bucket transforms
  * compare equal across scans — EnsureRequirements' co-partition check
  * keys on it plus the bucket count. */
final case class BoundBucket(valueTypes: Seq[DataType])
    extends ScalarFunction[Integer] {
  // bind refuses multi-argument input today; produceResult reads only
  // the first value, so keep the invariant LOCAL — a future relaxation
  // of bind must change this function, not silently hash one column.
  require(valueTypes.length == 1,
    s"bucket binds exactly one key column, got $valueTypes")
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def inputTypes(): Array[DataType] =
    (IntegerType +: valueTypes).toArray
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer =
    GraftBucketFunction.bucketId(
      input.get(1, valueTypes.head), valueTypes.head, input.getInt(0))
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
    * expected scan length ≈ total·ln(total) (coupon collector over a
    * uniform hash), so the bound below — 64·total + 4096 — is dozens of
    * standard deviations out: hitting it means the hash is broken, and
    * failing loudly beats spinning on non-negative ints forever. */
  def tokens(total: Int): Array[Int] =
    cache.computeIfAbsent(total, t => {
      val out = new Array[Int](t)
      val found = new Array[Boolean](t)
      val bound = 64L * t + 4096L
      var remaining = t
      var i = 0
      while (remaining > 0) {
        require(i < bound, s"bucket-routing preimage search for $t " +
          s"buckets found only ${t - remaining} residues in $bound " +
          "candidates — murmur3 residues are not behaving uniformly")
        val r = GraftBucketFunction.bucketId(i, IntegerType, t)
        if (!found(r)) { found(r) = true; out(r) = i; remaining -= 1 }
        i += 1
      }
      out
    })

  private val bcCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), org.apache.spark.broadcast.Broadcast[Array[Int]]]()

  /** The token table as a REUSED broadcast — large layouts route through
    * a broadcast lookup instead of a multi-MB plan literal, and a
    * maintained view appending every ingest batch must not leak one new
    * broadcast per write for the same immutable array. Keyed by
    * application id so a restarted context never serves a dead handle. */
  def tokensBroadcast(sc: org.apache.spark.SparkContext, total: Int)
      : org.apache.spark.broadcast.Broadcast[Array[Int]] =
    bcCache.computeIfAbsent((sc.applicationId, total),
      _ => sc.broadcast(tokens(total)))
}
