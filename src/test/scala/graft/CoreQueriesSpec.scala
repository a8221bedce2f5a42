package graft

import graft.queries.CoreQueries

class CoreQueriesSpec extends SparkTestBase {

  test("every core query runs and returns rows") {
    CoreQueries.defs.foreach { qd =>
      val df = qd.query(spark, sfDir)
      assert(df.count() > 0, s"${qd.name} returned no rows")
    }
  }

  test("q02_agg_group matches a hand-computed group") {
    val df = CoreQueries.defs.find(_.name == "q02_agg_group").get.query(spark, sfDir)
    val total = df.select(org.apache.spark.sql.functions.sum("count_order")).head().getLong(0)
    assert(total == Tables.lineitem(spark, sfDir).count())
  }

  test("q06_dedup_keep_last yields one row per user") {
    val df = CoreQueries.defs.find(_.name == "q06_dedup_keep_last").get.query(spark, sfDir)
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("q08_add_unique_id ids are unique") {
    val df = CoreQueries.defs.find(_.name == "q08_add_unique_id").get.query(spark, sfDir)
    assert(df.select("unique_id").distinct().count() == df.count())
  }

  test("broadcast join plan for q03 contains BroadcastHashJoin") {
    val df = CoreQueries.defs.find(_.name == "q03_join_broadcast").get.query(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q01 pushes the filter to the parquet scan") {
    val df = CoreQueries.defs.find(_.name == "q01_scan_filter_project").get.query(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), scan)
    assert(scan.contains("l_quantity"), scan)
  }
}
