package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not a test): attributes q104's cost between the Bloom
  * build job and the probe job. Run:
  * sbt -batch "Test/runMain graft.BloomProbe /root/testdata/sf0.1"
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-bloom-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.{bloomBuild, bloomMightContain}
    import graft.operators.TextOps

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val passage = " shared benchmark passage alpha beta gamma delta epsilon zeta"
    val isBench = pmod(col("doc_id"), lit(97)) === 0
    val planted = concat(col("text"),
      when(isBench || pmod(col("doc_id"), lit(13)) === 0, lit(passage)).otherwise(lit("")))
    def sh = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.wordShingles(planted, 5).as("grams"))
    def bench = sh.filter(isBench).select(explode(col("grams")).as("shingle")).distinct()

    for (round <- 1 to 2) {
      val filt = time(s"r$round bloom build")(
        bench.select(bloomBuild(xxhash64(col("shingle")), 1 << 19, 6).as("f"))
          .head.getAs[Array[Byte]](0))
      val probed = time(s"r$round probe+verify") {
        val hits = sh.filter(!isBench)
          .select(col("doc_id"), explode(col("grams")).as("shingle"))
          .filter(bloomMightContain(lit(filt), xxhash64(col("shingle"))))
          .join(broadcast(bench), Seq("shingle"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        hits.count()
      }
      val probeOnly = time(s"r$round probe only (no verify join)") {
        sh.filter(!isBench)
          .select(col("doc_id"), explode(col("grams")).as("shingle"))
          .filter(bloomMightContain(lit(filt), xxhash64(col("shingle"))))
          .count()
      }
      val noFilter = time(s"r$round explode only") {
        sh.filter(!isBench)
          .select(col("doc_id"), explode(col("grams")).as("shingle"))
          .count()
      }
      println(s"  probed=$probed probeOnly=$probeOnly exploded=$noFilter")
    }
    spark.stop()
  }
}
