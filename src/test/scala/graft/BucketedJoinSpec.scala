package graft

import graft.queries.LinkageQueries
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** The cluster-scale path for iterated linkage: write both sides bucketed
  * by the block key once, and every subsequent pass's equi-join on that key
  * needs NO shuffle (reference re-blocks per pass; bucketing amortizes the
  * shuffle across all passes and reruns).
  */
class BucketedJoinSpec extends SparkTestBase {

  test("join on the bucket key plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Sources.writeBucketed(
        LinkageQueries.census(spark, sfDir).withColumn("zip3h", hash(col("zip3"))),
        "census_bkt", Seq("zip3h"), buckets = 8)
      Sources.writeBucketed(
        LinkageQueries.input(spark, sfDir).withColumn("zip3h", hash(col("zip3"))),
        "input_bkt", Seq("zip3h"), buckets = 8)
      val joined = spark.table("census_bkt")
        .join(spark.table("input_bkt"), "zip3h")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS census_bkt")
      spark.sql("DROP TABLE IF EXISTS input_bkt")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
