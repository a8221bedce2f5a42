package graft

import org.apache.spark.sql.functions._

/** Phase-timing probe for q156_image_keep: where do the seconds go?
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "Test/runMain graft.Q156Probe"
  */
object Q156Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("q156-probe",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[q156probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.queries.PipelineQueries
    time("memo build (sigs)") { PipelineQueries.imageDhashSigs(spark, sfDir).count() }
    val imgs = PipelineQueries.imageDhashSigRes(spark, sfDir)
      .select(col("doc_id").as("node"), col("res"))
    time("imgs from memo") { noop(imgs) }
    val edges0 = PipelineQueries.hammingClassPairs(
      PipelineQueries.imageDhashSigs(spark, sfDir))
    time("edges (class pairs)") { noop(edges0) }
    val edges = edges0.select(col("doc_a").as("a"), col("doc_b").as("b"))
    val cc = time("cc") {
      val r = graft.operators.Components.connectedComponents(
        imgs.select("node"), edges)
      noop(r); r
    }
    time("full q156") {
      noop(SparkEntry.queries("q156_image_keep")(spark, sfDir))
    }
    time("full q156 again") {
      noop(SparkEntry.queries("q156_image_keep")(spark, sfDir))
    }
    spark.stop()
  }
}
