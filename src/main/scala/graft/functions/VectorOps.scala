package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels over `array<float|double>` columns.
  *
  * The reference computes these row-at-a-time in Python/numpy
  * (api/app/lib/similarity_calculator.py:31-80, polarity_axis.py:70-130);
  * here they are declarative column expressions so Catalyst keeps them
  * inside whole-stage codegen and the 1536-dim × N-row scan distributes.
  *
  * Two tiers:
  *  - HOF forms (`zip_with` + `aggregate`): pure built-ins, always available.
  *  - [[CosineSimilarity]]: custom codegen Expression for the hot path.
  */
object VectorOps {

  /** Elementwise cast to double — all kernels promote float32 up front so
    * accumulation order/precision matches a double-based oracle. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** dot(a,b) via built-in HOFs (codegen'd, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** HOF cosine; NULL-safe, 0-norm → NULL (division yields NULL via nullif). */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0))

  /** Cosine via the native codegen Expression — preferred in hot paths. */
  def cosine(a: Column, b: Column): Column =
    CosineSimilarity(asDouble(a), asDouble(b))

  /** Squared L2 distance via the native codegen Expression — bit-identical
    * to the `aggregate(zip_with(...))` HOF form (same accumulation order)
    * but whole-stage-codegen'd; the k-means assignment kernel. */
  def l2Sq(a: Column, b: Column): Column =
    L2DistanceSquared(asDouble(a), asDouble(b))

  /** a - b elementwise. */
  def sub(a: Column, b: Column): Column =
    zip_with(asDouble(a), asDouble(b), (x, y) => x - y)

  /** a + b elementwise. */
  def add(a: Column, b: Column): Column =
    zip_with(asDouble(a), asDouble(b), (x, y) => x + y)

  /** v / scalar elementwise. */
  def scale(v: Column, k: Column): Column = transform(asDouble(v), x => x * k)

  /** L2-normalized copy of v (NULL elements when zero-norm). The norm is
    * computed ONCE as the second `zip_with` argument (Catalyst does not
    * hoist loop-invariant subtrees out of HOF lambdas — referencing
    * `l2Norm(v)` inside a `transform` lambda would re-evaluate the full
    * O(d) aggregate per element, O(d²) per row). */
  def normalize(v: Column): Column =
    zip_with(asDouble(v),
      array_repeat(nullif(l2Norm(v), lit(0.0)), size(v)),
      (x, n) => x / n)

  /** A vector literal (for broadcast query vectors — the V1 kernel scores a
    * full scan against one driver-provided query embedding,
    * reference api/app/lib/age_client/query.py:62-116). */
  def vecLit(v: Seq[Double]): Column = array(v.map(lit): _*)
}
