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

  test("q90 SCD2 history: contiguous non-overlapping intervals, full coverage") {
    val byName = CoreQueries.defs.map(d => d.name -> d).toMap
    // o_orderdate is TIMESTAMP_NTZ (LocalDateTime rows) — compare the
    // interval bounds structurally, not through java.sql.Timestamp.
    val rows = byName("q90_scd2_history").query(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2),
        r.get(3), Option(r.get(4)), r.getLong(5), r.getBoolean(6))
    }
    val totalOrders = Tables.orders(spark, sfDir).count()
    assert(rows.map(_._6).sum == totalOrders,
      "interval order counts must partition the order stream")
    rows.groupBy(_._1).foreach { case (cust, hist) =>
      val sorted = hist.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.size).toSeq,
        s"customer $cust: versions not contiguous from 1")
      assert(sorted.count(_._7) == 1 && sorted.last._7,
        s"customer $cust: exactly the last version must be current")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4),
            s"customer $cust: version ${a._2} does not close at the next start")
          assert(a._3 != b._3,
            s"customer $cust: adjacent versions carry the same status (run not collapsed)")
        case _ =>
      }
    }
  }
}
