package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's `df_ops` compute-layer surface
  * (reference: src/person_linkage_case_study_utils/distributed_compute.py),
  * re-expressed Spark-first. A user of the reference's DfOps can switch to
  * this object method-for-method; everything stays declarative so Catalyst
  * fuses these into surrounding plans (no materialization boundaries except
  * where documented).
  */
object DfOps {

  /** reference:366 persist / reference:380 compute — in Spark, persistence
    * is lazy caching; `materialize` forces it (returns the same df).
    */
  def persist(df: DataFrame): DataFrame = df.cache()

  def materialize(df: DataFrame): DataFrame = { df.cache().count(); df }

  /** reference:396 add_unique_id_col. Deterministic: ids follow a total
    * order on `orderBy` (global window = one single-partition pass over the
    * compacted row_number input — use only when determinism matters; for
    * uniqueness alone use [[addUniqueIdFast]]).
    */
  def addUniqueIdCol(df: DataFrame, orderBy: Seq[Column], colName: String = "unique_id",
      valuePrefix: String = ""): DataFrame =
    df.withColumn(colName,
      org.apache.spark.sql.functions.concat(lit(valuePrefix),
        (row_number().over(Window.orderBy(orderBy: _*)) - 1).cast("string")))

  /** Unique (not contiguous) ids with no global sort — the scalable path,
    * matching the reference's dask branch ("we just need uniqueness").
    */
  def addUniqueIdFast(df: DataFrame, colName: String = "unique_id",
      valuePrefix: String = ""): DataFrame =
    df.withColumn(colName, org.apache.spark.sql.functions.concat(lit(valuePrefix), monotonically_increasing_id().cast("string")))

  /** Contiguous 0-based ids equal to `row_number() over (order by orderCol)
    * - 1` WITHOUT the single-partition global window: range-partition on
    * the order key, number rows per partition in parallel, and add
    * precomputed per-partition offsets (one tiny count action — the only
    * driver-side data is `numPartitions` longs). Range partitions are
    * totally ordered on the key, so local rank + offset IS the global
    * rank. Requires `orderCol` to be duplicate-free (ties could straddle a
    * partition boundary and tie order would then be partitioner-dependent).
    *
    * The ranged frame is localCheckpointed before the counts action:
    * RangePartitioner samples boundaries with a seed derived from the RDD
    * id, so re-executing the shuffle in a second job can choose DIFFERENT
    * boundaries — offsets from run 1 applied to partitions from run 2 shift
    * every id after the first moved boundary. Checkpointing freezes one
    * layout for both the counts job and the numbering job (the id pass
    * materializes the table once either way).
    */
  def addContiguousId(df: DataFrame, orderCol: String, colName: String = "unique_id",
      numPartitions: Int = 0): DataFrame = {
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = new Array[Long](n)
    var acc = 0L
    counts.foreach { case (pid, c) => offsets(pid) = acc; acc += c }
    val offExpr = element_at(
      array(offsets.map(lit(_)).toIndexedSeq: _*), col("__pid") + 1)
    val w = Window.partitionBy("__pid").orderBy(col(orderCol))
    ranged
      .withColumn(colName, row_number().over(w).cast("long") - 1 + offExpr)
      .drop("__pid")
  }

  /** reference:419 add_unique_record_id. */
  def addUniqueRecordId(df: DataFrame, datasetName: String, orderBy: Seq[Column]): DataFrame =
    addUniqueIdCol(df, orderBy, colName = "record_id", valuePrefix = s"${datasetName}_")

  /** reference:426 drop_duplicates(subset, sort_col, keep): keeps the
    * first/last row per subset key under sort_col order. Rows with a NULL
    * in any subset column are never considered duplicates (the reference's
    * explicit null-handling branch). One window over the shuffle on
    * `subset` — no extra exchange.
    */
  def dropDuplicates(df: DataFrame, subset: Seq[String] = Nil, sortCol: Option[String] = None,
      keepLast: Boolean = true): DataFrame = {
    val keys = if (subset.nonEmpty) subset else df.columns.toSeq // reference: subset=None → all
    val tiebreak = df.columns.map(col) // total order for determinism on ties
    val ordering = sortCol.map(c => if (keepLast) col(c).desc else col(c).asc).toSeq ++
      (if (keepLast) tiebreak.map(_.desc) else tiebreak.map(_.asc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    val hasNullKey = keys.map(col(_).isNull).reduce(_ || _)
    val deduped = df.filter(!hasNullKey)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    df.filter(hasNullKey).unionByName(deduped)
  }

  /** reference:534 groupby_agg_small_groups — in Spark a plain groupBy:
    * partial aggregation handles small groups without special-casing.
    */
  def groupbyAgg(df: DataFrame, by: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)

  /** reference:559 concat — column-name based union, tolerating missing
    * columns (filled with NULL) like pandas concat.
    */
  def concat(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** reference 02_generate_case_study_files.ipynb cell 60
    * best_data_from_columns: keep each key's best row under an event-date
    * column in yyyyMMdd text (latest by default). Invalid or missing
    * dates fill with the value LEAST likely to win, so an undated row
    * survives only when the key has nothing better — one window over the
    * shuffle on `by`, no extra exchange.
    */
  def bestDataFromColumns(df: DataFrame, by: Seq[String], dateCol: String,
      bestIsLatest: Boolean = true): DataFrame = {
    val parsed = try_to_timestamp(col(dateCol), lit("yyyyMMdd")).cast("date")
    val fill = if (bestIsLatest) "1900-01-01" else "2100-01-01"
    val filled = df.withColumn("__best_date", coalesce(parsed, lit(fill).cast("date")))
    dropDuplicates(filled, by, Some("__best_date"), keepLast = bestIsLatest)
      .drop("__best_date")
  }

  /** pandas-style merge with optional relationship validation ("1:1",
    * "1:m", "m:1") — the reference merges with validate="1:1" in its
    * post-search confirm step. Validation is an action (two tiny aggs).
    */
  def merge(left: DataFrame, right: DataFrame, on: Seq[String], how: String = "inner",
      validate: Option[String] = None): DataFrame = {
    validate.foreach { v =>
      def assertUnique(df: DataFrame, side: String): Unit = {
        val dups = df.groupBy(on.map(col): _*).count().filter(col("count") > 1).limit(1).count()
        require(dups == 0, s"merge validate=$v: $side side has duplicate keys on ${on.mkString(",")}")
      }
      v match {
        case "1:1" => assertUnique(left, "left"); assertUnique(right, "right")
        case "1:m" => assertUnique(left, "left")
        case "m:1" => assertUnique(right, "right")
        case other => throw new IllegalArgumentException(s"unknown validate: $other")
      }
    }
    left.join(right, on, how)
  }

  /** reference:574 rebalance — repartition to spread skewed partitions. */
  def rebalance(df: DataFrame, numPartitions: Int): DataFrame = df.repartition(numPartitions)

  /** Default bytes-per-partition for [[rebalanceBySize]]: Spark's
    * `spark.sql.files.maxPartitionBytes` / AQE advisory default (128 MB)
    * — executor-memory-friendly at any table size.
    */
  val DefaultPartitionBytes: Long = 128L * 1024 * 1024

  /** Partition count DERIVED FROM THE FRAME'S BYTES — the memory-aware
    * half of the reference's rebalance (`_optimal_partition_size`,
    * distributed_compute.py:609-635, which sizes partitions from
    * measured frame bytes instead of a hand-picked count). Spark-first:
    * the size estimate is the Catalyst plan's `stats.sizeInBytes` (file
    * sizes at the scan, propagated through the optimized plan), so the
    * derivation costs NO job — at 100 TB a measure-by-persist pass would
    * itself be a full materialization. Clamped to [1, maxPartitions].
    */
  def derivedPartitionCount(df: DataFrame,
      targetBytesPerPartition: Long = DefaultPartitionBytes,
      maxPartitions: Int = 1 << 20): Int = {
    require(targetBytesPerPartition > 0, "targetBytesPerPartition must be > 0")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (bytes + targetBytesPerPartition - 1) / targetBytesPerPartition
    n.min(BigInt(maxPartitions)).max(BigInt(1)).toInt
  }

  /** [[rebalance]] with the partition count derived from frame bytes
    * ([[derivedPartitionCount]]) — a 10× bigger input lands ~10× the
    * partitions at the same bytes-per-partition, instead of spilling a
    * fixed count.
    */
  def rebalanceBySize(df: DataFrame,
      targetBytesPerPartition: Long = DefaultPartitionBytes): DataFrame =
    df.repartition(derivedPartitionCount(df, targetBytesPerPartition))

  /** value_counts (reference uses it for cut/QA summaries). */
  def valueCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc +: cols.map(col(_).asc): _*)

  /** reference:672 empty_dataframe. */
  def emptyDataFrame(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** reference:681 head — small driver-side preview. */
  def head(df: DataFrame, n: Int = 10): Array[org.apache.spark.sql.Row] = df.head(n)

  /** Deterministic engine-portable sample by hash-mod (the reference
    * samples for Splink training; hash-mod keeps it reproducible across
    * partitionings and engines).
    */
  def deterministicSample(df: DataFrame, keyCol: String, mod: Int, slot: Int = 0): DataFrame =
    df.filter(pmod(col(keyCol), lit(mod)) === slot)

  // -- pandas-ish scalar conveniences (df_ops exposes these in its API) ----

  def isin(c: Column, values: Seq[Any]): Column = c.isin(values: _*)

  def fillna(df: DataFrame, replacements: Map[String, Any]): DataFrame = df.na.fill(replacements)

  def replaceValues(df: DataFrame, colName: String, mapping: Map[String, String]): DataFrame =
    df.withColumn(colName,
      mapping.foldLeft(col(colName)) { case (acc, (from, to)) =>
        when(acc === from, lit(to)).otherwise(acc)
      })

  /** Tolerant multi-format datetime parse (pandas to_datetime(errors=
    * 'coerce') analog; see also operators.Preprocess.tolerantDate).
    */
  def toDatetime(c: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)
}
