package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark: runs every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints one JSON line of per-query seconds.
  *
  * Each query is forced through a full-column hash-aggregate (NOT count(),
  * which would let Catalyst prune the scored/derived columns and benchmark
  * a different, cheaper plan than the one users run).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: JIT + parquet footers, so the first measured query isn't
    // charged for JVM/codegen startup.
    Tables.all.foreach(t =>
      try Tables.load(spark, sfDir, t).limit(1000).count() catch { case _: Throwable => })
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        // hash of every column per row, summed: forces complete evaluation
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(sum("h")).collect()
      } catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
