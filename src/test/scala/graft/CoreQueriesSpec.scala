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

  test("q70 merge: deletes gone, updates applied, inserts present, count balances") {
    import org.apache.spark.sql.functions._
    val base = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val merged = CoreQueries.defs.find(_.name == "q70_upsert_merge").get
      .query(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val deleted = base.keySet.filter(_ % 37 == 0)
    assert(deleted.forall(k => !merged.contains(k)), "a deleted key survived")
    base.foreach { case (k, bal) =>
      if (k % 37 != 0 && k % 10 == 0)
        assert(math.abs(merged(k) - (bal + 100.0)) < 1e-6, s"update not applied to $k")
      else if (k % 37 != 0)
        assert(merged(k) == bal, s"untouched row $k changed")
    }
    val inserts = base.keySet.filter(_ % 100 == 7)
    inserts.foreach(k => assert(merged.contains(k + 1000000L), s"insert $k missing"))
    assert(merged.size == base.size - deleted.size + inserts.size, "merge count off")
  }
}
