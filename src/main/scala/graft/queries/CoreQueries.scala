package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.A — the relational core of the reference's `df_ops` compute layer
  * (reference: src/person_linkage_case_study_utils/distributed_compute.py:366-691),
  * re-expressed as declarative Spark plans on the TPC-H-ish testdata.
  *
  * Scale notes: dims (nation/region) are broadcast; aggregations rely on
  * map-side partial aggregation; dedup-keep-last is a single window over
  * the natural shuffle partitioning (no extra exchange).
  */
object CoreQueries {

  /** Exact, order-independent sum: double → decimal → sum → double. */
  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(28,4)")).cast("double")

  private def dsumExpr(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(e.cast("decimal(28,4)")).cast("double")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q01_scan_filter_project",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1999-01-01") && col("l_quantity") < 5)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
              FROM lineitem
              WHERE l_shipdate >= '1999-01-01' AND l_quantity < 5""")
    ),
    QueryDef(
      "q02_agg_group",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum("l_quantity").as("sum_qty"),
            dsum("l_extendedprice").as("sum_base_price"),
            dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            count(lit(1)).as("count_order")
          ),
      Some("""SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
                CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
                COUNT(*) AS count_order
              FROM lineitem GROUP BY l_returnflag, l_linestatus""")
    ),
    QueryDef(
      "q03_join_broadcast",
      (s, d) =>
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("num_customers"), dsum("c_acctbal").as("sum_acctbal")),
      Some("""SELECT r_name, n_name, COUNT(*) AS num_customers,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_acctbal
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name""")
    ),
    QueryDef(
      "q04_multi_join_agg",
      (s, d) =>
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .filter(col("c_mktsegment") === "BUILDING" && col("o_orderdate") < lit("1997-01-01"))
          .groupBy("o_orderkey", "o_orderdate")
          .agg(dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"), col("revenue")),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING' AND o_orderdate < '1997-01-01'
              GROUP BY o_orderkey, o_orderdate""")
    ),
    QueryDef(
      "q05_window_rank",
      (s, d) => {
        val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables.customer(s, d)
          .withColumn("rank_in_nation", row_number().over(w))
          .filter(col("rank_in_nation") <= 3)
          .select("c_nationkey", "c_custkey", "c_acctbal", "rank_in_nation")
      },
      Some("""SELECT c_nationkey, c_custkey, c_acctbal, rank_in_nation FROM (
                SELECT c_nationkey, c_custkey, c_acctbal,
                  ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rank_in_nation
                FROM customer) t
              WHERE rank_in_nation <= 3""")
    ),
    QueryDef(
      // Reference df_ops.drop_duplicates(subset, sort_col, keep="last")
      // (distributed_compute.py:426): latest event per user.
      "q06_dedup_keep_last",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "event_type")
      },
      Some("""SELECT user_id, event_id, event_type FROM (
                SELECT user_id, event_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) t
              WHERE rn = 1""")
    ),
    QueryDef(
      // Reference df_ops.concat (distributed_compute.py:559): stack files.
      "q07_union_concat",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_custkey").as("id"), col("c_name").as("name"),
            col("c_acctbal").as("acctbal"), lit("customer").as("src"))
        val sup = Tables.supplier(s, d)
          .select(col("s_suppkey").as("id"), col("s_name").as("name"),
            col("s_acctbal").as("acctbal"), lit("supplier").as("src"))
        c.unionByName(sup)
      },
      Some("""SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal, 'customer' AS src FROM customer
              UNION ALL
              SELECT s_suppkey AS id, s_name AS name, s_acctbal AS acctbal, 'supplier' AS src FROM supplier""")
    ),
    QueryDef(
      // Reference df_ops.add_unique_id_col (distributed_compute.py:396):
      // deterministic via a total order on p_partkey — but NOT a global
      // row_number window (single-partition pass over the whole table at
      // scale). DfOps.addContiguousId range-partitions on the key and adds
      // per-partition offsets; identical ids, parallel everywhere.
      "q08_add_unique_id",
      (s, d) =>
        graft.ops.DfOps.addContiguousId(Tables.part(s, d), "p_partkey", "uid")
          .select(col("p_partkey"), concat(lit("part_"), col("uid")).as("unique_id")),
      Some("""SELECT p_partkey, 'part_' || CAST(ROW_NUMBER() OVER (ORDER BY p_partkey) - 1 AS VARCHAR) AS unique_id
              FROM part""")
    ),
    QueryDef(
      "q09_value_counts",
      (s, d) =>
        Tables.events(s, d).groupBy("event_type").agg(count(lit(1)).as("cnt")),
      Some("SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type")
    ),
    QueryDef(
      // Reference groupby_agg_small_groups w/ sum+mean (the probable-GQ
      // detection shape, 03_link_datasets.ipynb "probable_gq_geokeys").
      "q10_groupby_small_groups",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(
            dsum("o_totalprice").as("sum_totalprice"),
            count(lit(1)).as("num_orders"),
            (sum(col("o_totalprice").cast("decimal(28,4)")) / count(lit(1)))
              .cast("decimal(28,6)").cast("double").as("mean_totalprice")
          ),
      Some("""SELECT o_custkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_totalprice,
                COUNT(*) AS num_orders,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) / COUNT(*) AS DECIMAL(28,6)) AS DOUBLE) AS mean_totalprice
              FROM orders GROUP BY o_custkey""")
    ),
    QueryDef(
      // The cascade's "only records not already linked" anti-join shape.
      "q11_semi_anti_join",
      (s, d) => {
        val bigOrders = Tables.orders(s, d)
          .filter(col("o_totalprice") > 400000).select("o_custkey")
        Tables.customer(s, d)
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""")
    ),
    QueryDef(
      // Deterministic engine-portable "sampling" (reference samples 1M rows
      // for Splink training; we key off modular arithmetic so DuckDB agrees).
      "q12_sample_deterministic",
      (s, d) =>
        Tables.customer(s, d)
          .filter(pmod(col("c_custkey"), lit(10)) === 3)
          .select("c_custkey", "c_name", "c_mktsegment"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey % 10 = 3""")
    ),
    QueryDef(
      // CDC/upsert merge (lakehouse MERGE INTO semantics, expressed as a
      // plan): apply a change batch — updates for key%10=0 (acctbal +100),
      // deletes for key%37=0, inserts above the key space — to the base
      // table. Shape: base anti-join the touched keys ∪ surviving
      // changes; ONE shuffle on the merge key either way. At 100 TB this
      // is the merge-on-read compaction pattern — the change batch is
      // usually small enough to broadcast the anti-join, and a bucketed
      // base table makes the whole merge shuffle-free.
      "q70_upsert_merge",
      (s, d) => {
        val base = Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        val updates = base.filter(pmod(col("c_custkey"), lit(10)) === 0)
          .select(col("c_custkey"), col("c_name"),
            round(col("c_acctbal") + lit(100.0), 2).as("c_acctbal"),
            col("c_mktsegment"))
        val inserts = base.filter(pmod(col("c_custkey"), lit(100)) === 7)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            col("c_name"), col("c_acctbal"), col("c_mktsegment"))
        val deletes = base.filter(pmod(col("c_custkey"), lit(37)) === 0)
          .select("c_custkey")
        val touched = updates.select("c_custkey").unionByName(deletes).distinct()
        base.join(broadcast(touched), Seq("c_custkey"), "left_anti")
          .unionByName(updates.join(broadcast(deletes), Seq("c_custkey"), "left_anti"))
          .unionByName(inserts)
      },
      Some("""WITH base AS (
             |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer),
             |updates AS (
             |  SELECT c_custkey, c_name, round(c_acctbal + 100.0, 2) AS c_acctbal, c_mktsegment
             |  FROM base WHERE c_custkey % 10 = 0),
             |inserts AS (
             |  SELECT c_custkey + 1000000 AS c_custkey, c_name, c_acctbal, c_mktsegment
             |  FROM base WHERE c_custkey % 100 = 7),
             |deletes AS (SELECT c_custkey FROM base WHERE c_custkey % 37 = 0),
             |touched AS (
             |  SELECT c_custkey FROM updates UNION SELECT c_custkey FROM deletes)
             |SELECT * FROM base WHERE c_custkey NOT IN (SELECT c_custkey FROM touched)
             |UNION ALL
             |SELECT * FROM updates WHERE c_custkey NOT IN (SELECT c_custkey FROM deletes)
             |UNION ALL
             |SELECT * FROM inserts""".stripMargin)
    ),
    QueryDef(
      // SCD2 history build (the lakehouse slowly-changing-dimension shape
      // a training-data pipeline uses to version metadata): per customer,
      // collapse the order-status stream into validity intervals. Runs
      // found gaps-and-islands style — a lag() marks changes, a running
      // sum numbers the run, one groupBy collapses it, a lead() closes
      // each interval with the next run's start. Every window partitions
      // by o_custkey (the natural shuffle key), so the build is one
      // shuffle and scales with the keyspace — no global window anywhere.
      "q90_scd2_history",
      (s, d) => {
        val byOrd = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val runs = Tables.orders(s, d)
          .select("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
          .withColumn("chg",
            when(lag("o_orderstatus", 1).over(byOrd).isNull ||
              lag("o_orderstatus", 1).over(byOrd) =!= col("o_orderstatus"), 1L)
              .otherwise(0L))
          .withColumn("version",
            sum("chg").over(byOrd.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("o_custkey", "version")
          .agg(
            max("o_orderstatus").as("o_orderstatus"),
            min("o_orderdate").as("valid_from"),
            count(lit(1)).as("n_orders"))
        val byVer = Window.partitionBy("o_custkey").orderBy("version")
        runs
          .withColumn("valid_to", lead("valid_from", 1).over(byVer))
          .withColumn("is_current", col("valid_to").isNull)
          .select("o_custkey", "version", "o_orderstatus",
            "valid_from", "valid_to", "n_orders", "is_current")
      },
      Some("""WITH seq AS (
             |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
             |         CASE WHEN lag(o_orderstatus) OVER w IS NULL
             |                OR lag(o_orderstatus) OVER w <> o_orderstatus
             |              THEN 1 ELSE 0 END AS chg
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
             |runs AS (
             |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
             |         CAST(SUM(chg) OVER (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
             |  FROM seq),
             |grp AS (
             |  SELECT o_custkey, version, MAX(o_orderstatus) AS o_orderstatus,
             |         MIN(o_orderdate) AS valid_from, COUNT(*) AS n_orders
             |  FROM runs GROUP BY o_custkey, version)
             |SELECT o_custkey, version, o_orderstatus, valid_from,
             |       lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version) AS valid_to,
             |       n_orders,
             |       lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version) IS NULL AS is_current
             |FROM grp""".stripMargin)
    )
  )
}
