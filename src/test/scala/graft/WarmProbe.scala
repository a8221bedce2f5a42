package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (not a test): times the pieces of the Bench warmup to
  * attribute side-frame cache-build cost. Run:
  * sbt -batch "Test/runMain graft.WarmProbe /root/testdata/sf0.1"
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-warm-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    graft.functions.GraftFunctions.register(spark)
    time("persons count")(graft.queries.People.persons(spark, dir).count())
    time("census count")(graft.queries.LinkageQueries.census(spark, dir).count())
    time("census count 2")(graft.queries.LinkageQueries.census(spark, dir).count())
    time("input count")(graft.queries.LinkageQueries.input(spark, dir).count())
    time("input count 2")(graft.queries.LinkageQueries.input(spark, dir).count())
    time("linkage warm (incl scoredBlock)")(graft.queries.LinkageQueries.warm(spark, dir))
    time("pipeline warm")(graft.queries.PipelineQueries.warm(spark, dir))
    time("pipeline warm 2")(graft.queries.PipelineQueries.warm(spark, dir))
    spark.stop()
  }
}
