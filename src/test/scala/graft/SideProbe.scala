package graft

import graft.functions.GraftFunctions
import graft.queries.{LinkageQueries, People}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: where does the 15.6 s census+input cache build go?
  * Forces full-column materialization (count() alone would prune the
  * whole expression tree away).
  */
object SideProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def mat(df: DataFrame): Unit = {
      val c = df.columns.map(col)
      df.select(xxhash64(c: _*).as("h")).agg(expr("bit_xor(h)")).collect()
    }

    val dir = "/root/testdata/sf0.1"
    t("warmup (customer count)")(graft.Tables.customer(spark, dir).count())
    t("persons count")(People.persons(spark, dir).count())
    t("persons materialize")(mat(People.persons(spark, dir)))
    t("persons materialize again")(mat(People.persons(spark, dir)))
    t("census materialize")(mat(LinkageQueries.census(spark, dir)))
    t("census materialize again")(mat(LinkageQueries.census(spark, dir)))
    t("input materialize")(mat(LinkageQueries.input(spark, dir)))
    t("census cache+count") {
      val d = LinkageQueries.census(spark, dir).cache(); d.count()
    }
    t("input cache+count") {
      val d = LinkageQueries.input(spark, dir).cache(); d.count()
    }
    spark.stop()
  }
}
