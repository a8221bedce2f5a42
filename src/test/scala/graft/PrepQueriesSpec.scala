package graft

import graft.operators.Preprocess
import graft.queries.PrepQueries
import org.apache.spark.sql.functions._

class PrepQueriesSpec extends SparkTestBase {

  private val byName = PrepQueries.defs.map(d => d.name -> d).toMap

  test("all prep queries run and return rows at sf0.001") {
    PrepQueries.defs.foreach { d =>
      val n = d.query(spark, sfDir).count()
      assert(n > 0, s"${d.name} returned no rows")
    }
  }

  test("standardizeAddressPart: trim/collapse/upper/abbrev/empty→NULL") {
    val df = spark.range(1).select(
      Preprocess.standardizeAddressPart(lit("  north   Main  Street ")).as("a"),
      Preprocess.standardizeAddressPart(lit("")).as("b"),
      Preprocess.standardizeAddressPart(lit("OAK AVENUE")).as("c"))
    val row = df.collect()(0)
    assert(row.getString(0) == "N MAIN ST")
    assert(row.isNullAt(1))
    assert(row.getString(2) == "OAK AVE")
  }

  test("geokey is null-safe and '|'-delimited") {
    val g = spark.range(1)
      .select(Preprocess.geokey(lit("12"), lit(null).cast("string"), lit("X")).as("g"))
      .collect()(0).getString(0)
    assert(g == "12||X")
  }

  test("q17 tolerant dob parse handles both formats and rejects junk") {
    val rows = byName("q17_split_dob").query(spark, sfDir)
      .select("k", "byear").collect()
    // k%11==0 → 'UNKNOWN' → null year; others parse.
    rows.foreach { r =>
      val k = r.getLong(0)
      if (k % 11 == 0) assert(r.isNullAt(1), s"k=$k should be unparseable")
      else {
        val (p, q) = graft.queries.People.yearPQ
        assert(r.getInt(1) == 1940 + (k * p % q) % 60, s"k=$k wrong year")
      }
    }
  }

  test("q18 expands exactly the nicknamed rows") {
    val df = byName("q18_nickname_expand").query(spark, sfDir)
    val nickRows = df.filter(col("variant_type") === "nick")
    val nickSet = Preprocess.nicknames.map(_._1).toSet
    assert(nickRows.count() > 0)
    nickRows.select("first_name").collect()
      .foreach(r => assert(nickSet.contains(r.getString(0))))
  }

  test("q20 groups meet the threshold") {
    byName("q20_gq_threshold").query(spark, sfDir).select("n_people").collect()
      .foreach(r => assert(r.getLong(0) >= 3))
  }
}
