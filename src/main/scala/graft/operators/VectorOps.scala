package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, composed from
  * codegen'd higher-order functions (zip_with/aggregate) — no UDFs, no
  * serialization boundary, scales as pure map-side compute.
  *
  * Cross-engine determinism: dot products fold element products (exact in
  * double) through DECIMAL(38,18) accumulation, which is associative —
  * Spark and DuckDB get bit-identical sums regardless of evaluation order.
  */
object VectorOps {

  /** Embedding dimensionality of the testdata tables (TESTDATA.md). */
  val Dim = 64

  // Accumulate at precision 30 so decimal ADD yields (31,18) — SAME scale,
  // exact. At (38,18) the add result is (38,17): one digit rounded away
  // per element, which silently diverges from an exact decimal sum.
  private val decT = "decimal(30,18)"

  /** Exact, order-independent dot product: double products → decimal sum.
    * Dispatches to the native codegen'd VectorDotDecimal expression
    * (requires GraftFunctions.register on the session); semantics are
    * identical to [[dotDecimalFold]], the declarative reference variant.
    */
  def dotDecimal(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vecDotDecimal(a, b)

  /** Declarative fold with the same decimal semantics — kept as the
    * executable specification of [[dotDecimal]] (VectorOpsSpec asserts
    * they agree bitwise); interpreted per-element, so hot paths use the
    * native expression instead.
    */
  def dotDecimalFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(java.math.BigDecimal.ZERO).cast(decT),
      (acc, x) => (acc + x.cast(decT)).cast(decT)).cast("double")

  def norm(a: Column): Column = sqrt(dotDecimal(a, a))

  /** Fast production path: plain-double codegen'd dot/norm (no decimal
    * boxing). Use for ANN/scoring where no cross-engine oracle must
    * reproduce sums order-independently.
    */
  def dotFast(a: Column, b: Column): Column = graft.functions.GraftFunctions.vecDot(a, b)

  def normFast(a: Column): Column = sqrt(dotFast(a, a))

  /** Cosine similarity with precomputed norms. */
  def cosine(dot: Column, na: Column, nb: Column): Column = dot / (na * nb)

  /** DuckDB SUM aggregate with identical decimal semantics, for a relation
    * already joined with `range(1, Dim+1) t(i)`.
    */
  def dotDecimalSql(a: String, b: String): String =
    s"CAST(SUM(CAST(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)"

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    * Knuth-multiplicative arithmetic, no RNG state (reproducible at any
    * scale, any partitioning).
    */
  def hyperplane(j: Int): Seq[Double] =
    (0 until Dim).map(i => ((j.toLong * Dim + i) * 2654435761L % 1000003L).toDouble / 1000003.0 - 0.5)

  /** Sign-bit bucket id over `planes` random hyperplanes (random-hyperplane
    * LSH: cos-similar vectors share sign patterns with high probability).
    */
  def lshBucket(emb: Column, planes: Int): Column =
    (0 until planes).map { j =>
      val hp = array(hyperplane(j).map(lit): _*)
      val dot = aggregate(
        zip_with(emb, hp, (x, h) => x.cast("double") * h),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
}
