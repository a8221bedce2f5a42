package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"SCRATCH $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    graft.functions.GraftFunctions.register(spark)
    time("persons.count")(graft.queries.People.persons(spark, sfDir).count())
    time("persons.count again")(graft.queries.People.persons(spark, sfDir).count())
    val i = time("input build")(graft.queries.LinkageQueries.input(spark, sfDir))
    time("input materialize")(i.count())
    val c = time("census build")(graft.queries.LinkageQueries.census(spark, sfDir))
    time("census materialize")(c.count())
    time("input recount (cached)")(i.count())
    spark.stop()
  }
}
