package graft

import graft.ops.DfOps
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DfOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("dropDuplicates keep=last under sort_col, nulls never deduped") {
    val df = Seq(
      (1L, Some("a"), 10), (2L, Some("a"), 20), (3L, Some("b"), 5),
      (4L, None, 1), (5L, None, 2)
    ).toDF("id", "key", "v")
    val out = DfOps.dropDuplicates(df, Seq("key"), sortCol = Some("v"), keepLast = true)
      .collect().map(r => r.getLong(0)).toSet
    // key=a keeps id 2 (max v), key=b keeps 3, both null rows survive.
    assert(out == Set(2L, 3L, 4L, 5L))
  }

  test("merge validate=1:1 passes on unique keys and rejects duplicates") {
    val l = Seq((1, "x"), (2, "y")).toDF("k", "lv")
    val r = Seq((1, "p"), (2, "q")).toDF("k", "rv")
    assert(DfOps.merge(l, r, Seq("k"), validate = Some("1:1")).count() == 2)
    val rDup = Seq((1, "p"), (1, "q")).toDF("k", "rv")
    intercept[IllegalArgumentException] {
      DfOps.merge(l, rDup, Seq("k"), validate = Some("1:1"))
    }
  }

  test("bestDataFromColumns keeps the latest valid date, undated only as fallback") {
    val df = Seq(
      (1L, "s1", "20200115"), (2L, "s1", "20230704"), (3L, "s1", "garbage"),
      (4L, "s2", "bad"), (5L, "s2", null.asInstanceOf[String]),
      (6L, "s3", "19991231")
    ).toDF("id", "ssn", "event_date")
    val latest = DfOps.bestDataFromColumns(df, Seq("ssn"), "event_date")
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    // s1: the valid 2023 row beats 2020 and the unparseable row; s2 has
    // only invalid dates, so one of its rows still survives; s3 trivial.
    assert(latest("s1") == 2L, s"s1 kept ${latest("s1")}")
    assert(Set(4L, 5L).contains(latest("s2")))
    assert(latest("s3") == 6L)
    val earliest = DfOps.bestDataFromColumns(df, Seq("ssn"), "event_date",
      bestIsLatest = false).collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(earliest("s1") == 1L, s"s1 earliest kept ${earliest("s1")}")
  }

  test("concat tolerates missing columns like pandas") {
    val a = Seq((1, "x")).toDF("id", "name")
    val b = Seq(2).toDF("id")
    val out = DfOps.concat(Seq(a, b))
    assert(out.count() == 2)
    assert(out.filter(col("name").isNull).count() == 1)
  }

  test("addUniqueIdCol is deterministic and dense; fast variant unique") {
    val df = Tables.part(spark, sfDir)
    val ids = DfOps.addUniqueIdCol(df, Seq(col("p_partkey")), valuePrefix = "p_")
      .select("unique_id").collect().map(_.getString(0))
    assert(ids.toSet.size == ids.length)
    assert(ids.contains("p_0"))
    val fast = DfOps.addUniqueIdFast(df).select("unique_id").collect().map(_.getString(0))
    assert(fast.toSet.size == fast.length)
  }

  test("addContiguousId matches the global row_number ids without a global window") {
    val df = Tables.part(spark, sfDir)
    val slow = DfOps.addUniqueIdCol(df, Seq(col("p_partkey")))
      .select(col("p_partkey"), col("unique_id")).collect()
      .map(r => (r.getLong(0), r.getString(1).toLong)).toMap
    val fast = DfOps.addContiguousId(df, "p_partkey")
      .select(col("p_partkey"), col("unique_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fast == slow, "range-partitioned ids diverge from global row_number")
    val plan = DfOps.addContiguousId(df, "p_partkey")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"addContiguousId still plans a single-partition exchange:\n$plan")
  }

  test("valueCounts orders by count desc") {
    val vc = DfOps.valueCounts(Tables.events(spark, sfDir), Seq("event_type")).collect()
    val counts = vc.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("replaceValues and toDatetime behave like the pandas counterparts") {
    val df = Seq(("STREET", "2001-02-03"), ("AVE", "02/03/2001"), ("X", "nope"))
      .toDF("w", "d")
    val out = df
      .transform(d => DfOps.replaceValues(d, "w", Map("STREET" -> "ST")))
      .withColumn("ts", DfOps.toDatetime(col("d"), Seq("yyyy-MM-dd", "MM/dd/yyyy")))
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("ST", "AVE", "X"))
    assert(out.count(_.isNullAt(2)) == 1)
  }

  test("emptyDataFrame carries the schema; head previews") {
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val e = DfOps.emptyDataFrame(spark, schema)
    assert(e.count() == 0 && e.schema == schema)
    assert(DfOps.head(Tables.nation(spark, sfDir), 3).length == 3)
  }

  test("sources round-trip parquet/csv/json with explicit schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sources").toString
    val df = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    Sources.writeParquet(df, s"$dir/p", coalesceTo = Some(1))
    Sources.writeCsv(df, s"$dir/c")
    Sources.writeJson(df, s"$dir/j")
    val schema = df.schema
    assert(Sources.parquet(spark, s"$dir/p").count() == 25)
    val c = Sources.csv(spark, s"$dir/c", Some(schema))
    assert(c.count() == 25 && c.schema == schema)
    val j = Sources.json(spark, s"$dir/j", Some(schema))
    assert(j.count() == 25 && j.schema == schema)
    Sources.writeOrc(df, s"$dir/o", coalesceTo = Some(1))
    val o = Sources.orc(spark, s"$dir/o")
    assert(o.count() == 25 && o.schema == schema)
    assert(o.collect().map(_.getAs[Number](0).longValue()).sorted.toSeq ==
      df.collect().map(_.getAs[Number](0).longValue()).sorted.toSeq,
      "orc round-trip lost rows")
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Sources.writeParquet(Tables.customer(spark, sfDir), s"$dir/cust",
      partitionBy = Seq("c_mktsegment"))
    val pruned = Sources.parquet(spark, s"$dir/cust")
      .filter(col("c_mktsegment") === "BUILDING")
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(c_mktsegment"),
      s"partition filter not applied:\n$scan")
  }

  test("rebalanceBySize: derived partition count tracks frame bytes") {
    val one = Tables.customer(spark, sfDir)
    val ten = (1 to 10).map(_ => one).reduce(_ unionByName _)
    // Pin the derivation at a target that splits the small frame into a
    // handful of partitions; the 10x-unioned frame (Catalyst stats sum
    // across union children) must land ~10x the count.
    val bytes1 = one.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val target = math.max(1L, bytes1 / 4)
    val n1 = DfOps.derivedPartitionCount(one, target)
    val n10 = DfOps.derivedPartitionCount(ten, target)
    assert(n1 >= 4 && n1 <= 5, s"small frame derived $n1 partitions")
    assert(n10 >= 9 * n1 / 2 && n10 <= 11 * n1,
      s"10x frame derived $n10 vs $n1 — not tracking size")
    // Clamps: a huge target floors at 1; a tiny target hits the cap.
    assert(DfOps.derivedPartitionCount(one, Long.MaxValue) == 1)
    assert(DfOps.derivedPartitionCount(ten, 1L, maxPartitions = 7) == 7)
    // The rebalanced frame actually carries the derived count.
    assert(DfOps.rebalanceBySize(one, target).rdd.getNumPartitions == n1)
  }
}
