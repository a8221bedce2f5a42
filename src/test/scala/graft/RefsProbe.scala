package graft

import graft.functions.GraftFunctions
import graft.linkage.LinkageCascade
import graft.queries.LinkageQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: sanity of the reference-file cascade — frame sizes, class-M
  * recovery (married-surname records reachable only through the Name/DOB
  * Reference File's alternate rows), per-pass link/accuracy counts.
  */
object RefsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    val census = LinkageQueries.census(spark, dir)
    val input = LinkageQueries.input(spark, dir)
    val nd = LinkageQueries.namedob(spark, dir)
    val gb = LinkageQueries.geobase(spark, dir)
    println(s"census=${census.count()} input=${input.count()} " +
      s"namedob=${nd.count()} geobase=${gb.count()}")

    val links = LinkageCascade.run(
      LinkageQueries.cascadeRefs(spark, dir), input, LinkageQueries.config).cache()
    val n = links.count()
    val correct = links.filter(col("pik") === col("rec_id")).count()
    println(s"links=$n correct=$correct nTrue=${census.count()}")
    links.groupBy("pass")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pik") === col("rec_id"), 1L).otherwise(0L)).as("ok"))
      .orderBy("pass").show(30, truncate = false)

    // Class M membership — the one shared definition (ClassPredicates).
    def isM(k: Long): Boolean = ClassPredicates.isMRec(k)
    val mRecovered = links.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .filter { case (_, rec, _) => isM(rec) }
    val mInCensus = census.select("pik").collect().map(_.getLong(0)).filter(isM)
    println(s"class M planted in census coverage: ${mInCensus.length}")
    println(s"class M recovered: ${mRecovered.length} " +
      s"correct=${mRecovered.count { case (p, r, _) => p == r }}")
    mRecovered.groupBy(_._3).foreach { case (pass, xs) =>
      println(s"  M via $pass: ${xs.length}")
    }
    spark.stop()
  }
}
