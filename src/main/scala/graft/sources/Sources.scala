package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (reference df_ops read_parquet/to_parquet,
  * distributed_compute.py:648/659, plus the csv/json files its notebooks
  * load). Readers take an optional explicit schema — at 100 TB you never
  * want schema inference scanning the dataset twice; writers expose the
  * partitioning controls that decide downstream scan pruning.
  */
object Sources {

  def parquet(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.parquet(path)
  }

  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
      header: Boolean = true, delimiter: String = ","): DataFrame = {
    val r = spark.read.option("header", header.toString).option("delimiter", delimiter)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  def json(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  def orc(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.orc(path)
  }

  /** Parquet writer; `partitionBy` columns become directory partitions
    * (downstream partition pruning), `coalesceTo` bounds small-file count.
    */
  def writeParquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil, coalesceTo: Option[Int] = None): Unit = {
    val out = coalesceTo.fold(df)(df.coalesce)
    val w = out.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
      header: Boolean = true): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC writer with the same partition-pruning controls as parquet. */
  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil, coalesceTo: Option[Int] = None): Unit = {
    val out = coalesceTo.fold(df)(df.coalesce)
    val w = out.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Bucketed managed table: co-locates both sides of a repeated equi-join
    * (e.g. census × input on block keys) so the join needs NO shuffle —
    * the cluster-scale path for iterated linkage passes.
    */
  def writeBucketed(df: DataFrame, table: String, bucketBy: Seq[String], buckets: Int,
      sortBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketBy.head, bucketBy.tail: _*)
    (if (sortBy.nonEmpty) w.sortBy(sortBy.head, sortBy.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }
}
