package graft

import graft.functions.GraftFunctions
import graft.linkage._
import graft.queries.LinkageQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: gamma distribution of the EM training pairs and the m
  * trajectory, to understand what the EM converges to under a model change.
  */
object EmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    val cfg = LinkageQueries.config
    val census = LinkageQueries.census(spark, dir).cache()
    val input = LinkageQueries.input(spark, dir).cache()

    for (pass <- LinkageQueries.emPasses) {
      println(s"== session ${pass.name} (keys=${pass.keys}, excludes=${pass.excludeComparisons})")
      val cmps = pass.comparisonsFor(cfg)
      val cv = cmps.foldLeft(LinkageCascade.pairs(census, input, pass)) { (df, c) =>
        df.withColumn(c.gammaName, FellegiSunter.gammaCol(c))
      }.withColumn("is_match", (col("l_pik") === col("r_rec_id")).cast("int"))
        .cache()
      println(s"pairs: ${cv.count()}, true matches: ${cv.filter(col("is_match") === 1).count()}")
      for (c <- cmps) {
        println(s"-- ${c.name} gamma distribution (by is_match):")
        cv.groupBy("is_match", c.gammaName).count()
          .orderBy("is_match", c.gammaName).collect()
          .foreach(r => println(s"   match=${r.get(0)} gamma=${r.get(1)} n=${r.get(2)}"))
      }
      cv.unpersist()
    }

    val m = LinkageCascade.emTrainMMulti(census, input, LinkageQueries.emPasses, cfg, iterations = 3)
    m.foreach { case (n, g, v) => println(f"m[$n%8s][$g%2d] = $v%.4f") }
    spark.stop()
  }
}
