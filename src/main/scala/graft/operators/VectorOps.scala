package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Exact, order-independent squared L2 distance: per-element double
    * difference-squares → decimal sum (the [[dotDecimalFold]] idiom on
    * (x−y)²). Differences of float32 values are EXACT in a double, the
    * square is one correctly-rounded multiply, and the decimal
    * accumulation is order-free — so both engines produce the identical
    * value regardless of partitioning. Used by the PQ encoder (q149),
    * whose codeword argmin must agree bitwise with the DuckDB oracle.
    */
  def dist2Decimal(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(java.math.BigDecimal.ZERO).cast(decT),
      (acc, x) => (acc + x.cast(decT)).cast(decT)).cast("double")

  /** DuckDB SUM aggregate matching [[dist2Decimal]], for a relation
    * already joined with `range(1, len+1) t(i)`.
    */
  def dist2DecimalSql(a: String, b: String): String =
    s"""CAST(SUM(CAST((CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) *
       |              (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
       |         AS DECIMAL(38,18))) AS DOUBLE)""".stripMargin

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
    * Plain-double fold — fast, but not cross-engine reproducible.
    */
  def lshBucket(emb: Column, planes: Int): Column =
    (0 until planes).map { j =>
      val hp = array(hyperplane(j).map(lit): _*)
      val dot = aggregate(
        zip_with(emb, hp, (x, h) => x.cast("double") * h),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Integer hyperplane weights: sign(Σ vᵢ·hᵢ) == sign(Σ vᵢ·wᵢ) for
    * wᵢ = 2·cᵢ − 1000003 (the [[hyperplane]] rationals scaled by the
    * positive constant 2·1000003). float32 · 2^21-integer products are
    * exact in a double, so the decimal-accumulated sum — and therefore the
    * sign — is bit-identical across engines.
    */
  def lshPlaneW(j: Int): Seq[Long] =
    (0 until Dim).map(i =>
      2L * ((j.toLong * Dim + i) * 2654435761L % 1000003L) - 1000003L)

  /** [[lshBucket]] with exact cross-engine semantics: per-plane sign of the
    * decimal-accumulated integer-weight dot. The oracle rendering is
    * [[lshBucketSql]]; both derive the weights from the same arithmetic.
    */
  def lshBucketExact(emb: Column, planes: Int): Column =
    (0 until planes).map { j =>
      // The weights are < 2^21 integers — exact as float32 — so the plane
      // sum can ride the native codegen'd decimal dot (float-array
      // literals) instead of an interpreted per-element decimal fold.
      val w = array(lshPlaneW(j).map(v => lit(v.toFloat)): _*)
      when(dotDecimal(emb, w) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hard cosine assignment of every (vec_id, embedding) row to its
    * argmax-cosine centroid from `cents(cid, ce)` (ties break on cid) —
    * the scoring pass of [[kmeans]] and q110's one-step twin. The centroid
    * side is always broadcast: assignment is linear, map-side work.
    */
  def assignToCentroids(data: DataFrame, cents: DataFrame): DataFrame = {
    val byVec = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid").asc)
    data.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .withColumn("csim",
        dotDecimal(col("embedding"), col("ce")) /
          (norm(col("embedding")) * norm(col("ce"))))
      .withColumn("arnk", row_number().over(byVec))
      .filter(col("arnk") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"), col("csim"))
  }

  /** Spherical k-means (Lloyd's loop): assign by cosine, update centroids
    * to component means — cosine is scale-invariant, so the unnormalized
    * mean assigns identically to the normalized spherical centroid, and
    * the objective Σ cos(x, c_assigned) is non-decreasing per iteration
    * (VectorOpsSpec pins this). The driver holds only k×Dim means per
    * round (the same bounded-state shape as the EM loop): each iteration
    * is ONE broadcast-scoring pass + ONE hash-aggregate whose shuffle
    * carries k×Dim decimal partial sums, never vectors. Empty clusters
    * keep their previous centroid. Deterministic: decimal-summed means,
    * id-tiebroken assignment, seed centroids sorted by id.
    *
    * Returns (per-iteration objective, final centroids (cid → mean
    * components), last-iteration assignment frame). NOTE: the assignment
    * corresponds to the LAST SCORING PASS — i.e. the centroids from before
    * the final M-step update — exactly like Lloyd's loop leaves them.
    * Callers that need the assignment under the returned (post-update)
    * centroids should run [[assignToCentroids]] once more themselves.
    */
  def kmeans(data: DataFrame, seedIds: Seq[Long], iterations: Int)
      : (Seq[Double], Seq[(Long, Array[Double])], DataFrame) = {
    val spark = data.sparkSession
    var cents: Seq[(Long, Array[Float])] = data
      .filter(col("vec_id").isin(seedIds: _*))
      .select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val objectives = Seq.newBuilder[Double]
    var assigned: DataFrame = null
    for (_ <- 1 to iterations) {
      val cdf = spark.createDataFrame(cents).toDF("cid", "ce")
      assigned = assignToCentroids(data, cdf)
      val stats = assigned
        .select(col("cid"), col("csim"), posexplode(col("embedding")))
        .select(col("cid"), col("csim"), col("pos"),
          col("col").cast("double").cast("decimal(38,18)").as("x"))
        .groupBy("cid", "pos")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("csim").cast("decimal(38,18)")).as("so"))
        .collect()
      // Each vector's csim is summed once per component; divide back out.
      objectives += stats
        .foldLeft(java.math.BigDecimal.ZERO)((acc, r) => acc.add(r.getDecimal(4)))
        .doubleValue() / Dim
      val meanOf: Map[(Long, Int), Double] = stats.map { r =>
        (r.getLong(0), r.getInt(1)) ->
          r.getDecimal(3).doubleValue() / r.getLong(2).toDouble
      }.toMap
      cents = cents.map { case (cid, old) =>
        val fresh = (0 until Dim).map(j => meanOf.get((cid, j)))
        if (fresh.forall(_.isDefined)) (cid, fresh.map(_.get.toFloat).toArray)
        else (cid, old) // empty cluster: keep the previous centroid
      }
    }
    (objectives.result(), cents.map { case (c, a) => (c, a.map(_.toDouble)) }, assigned)
  }

  /** DuckDB CTE `buckets(vec_id, bucket)` ≡ [[lshBucketExact]] over a
    * relation `rel(vec_id, embedding)`; the weight arithmetic is inlined
    * so the oracle can never drift from [[lshPlaneW]].
    */
  def lshBucketSqlCte(rel: String, planes: Int): String =
    s"""buckets AS (
       |  SELECT vec_id,
       |         CAST(SUM(CASE WHEN s >= 0 THEN CAST(power(2, j) AS BIGINT)
       |                       ELSE 0 END) AS BIGINT) AS bucket
       |  FROM (
       |    SELECT vec_id, j,
       |           SUM(CAST(CAST(embedding[i] AS DOUBLE) *
       |               (2 * ((j * $Dim + i - 1) * 2654435761 % 1000003) - 1000003)
       |               AS DECIMAL(30,18))) AS s
       |    FROM $rel, range(0, $planes) p(j), range(1, ${Dim + 1}) t(i)
       |    GROUP BY vec_id, j)
       |  GROUP BY vec_id)""".stripMargin

  /** Hyperplane count DERIVED FROM THE CORPUS COUNT (the q68 derived-k
    * rule applied to hyperplane LSH): smallest p in [MinLshPlanes,
    * MaxLshPlanes] with 2^p · LshTargetOccupancy ≥ n, so expected bucket
    * occupancy n/2^p stays ≤ LshTargetOccupancy and the bucket self-join
    * stays ~occupancy·n instead of n²/2^planes at a FIXED plane count
    * (the old 8-plane q45 was n²/256 at every corpus size). Pure integer
    * arithmetic — the DuckDB rendering ([[lshPlanesSqlCte]]) cannot
    * drift on float log rounding.
    */
  val MinLshPlanes = 8
  val MaxLshPlanes = 24
  val LshTargetOccupancy = 64L

  def lshPlanesFor(n: Long): Int =
    (MinLshPlanes to MaxLshPlanes)
      .find(p => (1L << p) * LshTargetOccupancy >= n).getOrElse(MaxLshPlanes)

  /** DuckDB scalar CTE `pl(planes)` ≡ [[lshPlanesFor]] over COUNT(`rel`). */
  def lshPlanesSqlCte(rel: String): String =
    s"""pl AS (
       |  SELECT COALESCE(MIN(p), $MaxLshPlanes) AS planes
       |  FROM range($MinLshPlanes, ${MaxLshPlanes + 1}) t(p)
       |  WHERE (CAST(1 AS BIGINT) << p) * $LshTargetOccupancy >=
       |        (SELECT COUNT(*) FROM $rel))""".stripMargin

  /** [[lshBucketSqlCte]] with the plane count read from a `pl(planes)`
    * CTE ([[lshPlanesSqlCte]]) instead of a literal — the oracle side of
    * a derived-plane [[lshBucketExact]] call.
    */
  def lshBucketSqlCteDerived(rel: String): String =
    s"""buckets AS (
       |  SELECT vec_id,
       |         CAST(SUM(CASE WHEN s >= 0 THEN CAST(power(2, j) AS BIGINT)
       |                       ELSE 0 END) AS BIGINT) AS bucket
       |  FROM (
       |    SELECT vec_id, j,
       |           SUM(CAST(CAST(embedding[i] AS DOUBLE) *
       |               (2 * ((j * $Dim + i - 1) * 2654435761 % 1000003) - 1000003)
       |               AS DECIMAL(30,18))) AS s
       |    FROM $rel, range(0, $MaxLshPlanes) p(j), range(1, ${Dim + 1}) t(i)
       |    WHERE j < (SELECT planes FROM pl)
       |    GROUP BY vec_id, j)
       |  GROUP BY vec_id)""".stripMargin

  /** Multi-band signature: `bands` keys of `bitsPerBand` sign bits each,
    * over DISTINCT hyperplanes (plane j = band·bitsPerBand + bit). Two
    * vectors are LSH CANDIDATES when ANY band key matches — the standard
    * banding construction that turns a cosine threshold into an equi-join
    * with tunable recall (miss probability (1−p^r)^b per pair). Exact
    * cross-engine semantics like [[lshBucketExact]].
    */
  def lshBandKeysExact(emb: Column, bands: Int, bitsPerBand: Int): Column =
    array((0 until bands).map { t =>
      (0 until bitsPerBand).map { i =>
        val j = t * bitsPerBand + i
        val w = array(lshPlaneW(j).map(v => lit(v.toFloat)): _*)
        when(dotDecimal(emb, w) >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  // (The DuckDB mirror of lshBandKeysExact was removed: no query consumed
  // it, so nothing pinned it against the Scala band-key arithmetic — a
  // consumer should reintroduce it together with its oracle.)
}
