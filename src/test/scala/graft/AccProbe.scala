package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: times q120's pieces to find what re-executes despite the
  * accFrames memo. Run:
  * sbt -batch "Test/runMain graft.AccProbe /root/testdata/sf0.1"
  */
object AccProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("warm reffile_chain + accuracy") {
      graft.queries.RefFileQueries.warmSteps.foreach(_._2(spark, dir))
    }
    val q = SparkEntry.queries("q120_accuracy_definitions")
    time("q120 collect 1")(q(spark, dir).collect())
    time("q120 collect 2")(q(spark, dir).collect())
    val df = q(spark, dir)
    time("q120 hash-agg (bench shape)") {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
    }
    spark.stop()
  }
}
