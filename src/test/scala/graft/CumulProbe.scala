package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not a test): attributes q108's cost. */
object CumulProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-cumul-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.linkage.LinkageCascade
    import graft.queries.LinkageQueries._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val cen = census(spark, dir)
    val inp = input(spark, dir)
    time("warm sides")(cen.count() + inp.count())
    for (r <- 1 to 2) {
      val n = time(s"r$r union count") {
        passes.zipWithIndex.map { case (p, i) =>
          LinkageCascade.pairs(cen, inp, p)
            .select(col("l_pik").as("pik"), col("r_rec_id").as("rec_id"),
              lit(i + 1).as("ordinal"))
        }.reduce(_.unionByName(_)).count()
      }
      println(s"  pairs=$n")
      time(s"r$r min-ordinal agg") {
        passes.zipWithIndex.map { case (p, i) =>
          LinkageCascade.pairs(cen, inp, p)
            .select(col("l_pik").as("pik"), col("r_rec_id").as("rec_id"),
              lit(i + 1).as("ordinal"))
        }.reduce(_.unionByName(_))
          .groupBy("pik", "rec_id").agg(min("ordinal").as("ordinal"))
          .groupBy("ordinal").agg(count(lit(1)).as("n_new")).collect()
      }
      time(s"r$r blockCostSummaryAll") {
        LinkageCascade.blockCostSummaryAll(cen, inp, passes).collect()
      }
    }
    spark.stop()
  }
}
