package graft

import graft.queries.LinkageQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not a test): q94 self-dedup timing + blocking-cost stats at
  * an arbitrary SF. Caught two real defects: the zip3 demo block is
  * quadratic-infeasible for a SELF-join (~11M pairs at sf0.1), and the
  * Components cache+unpersist loop recomputed its whole history each
  * iteration (see Components.connectedComponents's checkpoint comment).
  */
object DedupeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.functions.GraftFunctions.register(spark)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val cen = LinkageQueries.census(spark, d)
    println("census rows: " + cen.count())
    def pairTotal(keys: Seq[String]): Any = cen
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*).count()
      .agg(sum(col("count") * (col("count") - 1) / 2)).first().get(0)
    println(s"geokey_blk self-pairs: ${pairTotal(Seq("geokey_blk"))}")
    println(s"dob+zip3 self-pairs: ${pairTotal(Seq("dob_year", "dob_month", "dob_day", "zip3"))}")
    val byName = LinkageQueries.defs.map(x => x.name -> x).toMap
    time("q94 run 1")(println(byName("q94_person_dedupe").query(spark, d).count()))
    time("q94 run 2")(println(byName("q94_person_dedupe").query(spark, d).count()))
    spark.stop()
  }
}
