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

  test("q137 parse rules: prefix/suffix peeling, standardization, guards") {
    val df = spark.createDataFrame(Seq(
      (1L, "MR. JOHN Q SMITH JR."),
      (2L, "JOHN SMITH JUNIOR"),
      (3L, "DR MARY ANN LOPEZ 2ND"),
      (4L, "MARY LOPEZ"),
      (5L, "MR JR"), // suffix token with no core left: JR is the bare last name
      (6L, "miss sarah o brien iv"))).toDF("k", "full_name")
    val parsed = df.select(col("k") +:
      Preprocess.parseName(col("full_name")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) ->
        (0 to 4).map(i => Option(r.getString(i + 1))).toList).toMap
    assert(parsed(1L) == List(Some("MR"), Some("JOHN"), Some("Q"), Some("SMITH"), Some("JR")))
    assert(parsed(2L) == List(None, Some("JOHN"), None, Some("SMITH"), Some("JR")))
    assert(parsed(3L) == List(Some("DR"), Some("MARY"), Some("ANN"), Some("LOPEZ"), Some("II")))
    assert(parsed(4L) == List(None, Some("MARY"), None, Some("LOPEZ"), None))
    // Single-core-token convention (round 16): last-name-only — first_p
    // is NULL when no second core token exists.
    assert(parsed(5L) == List(Some("MR"), None, None, Some("JR"), None))
    assert(parsed(6L) == List(Some("MISS"), Some("SARAH"), Some("O"), Some("BRIEN"), Some("IV")))
  }

  test("q137 namesearch: parsed keys recover suffix variants exact keys miss") {
    // The reference file renders a person "FIRST MIDDLE LAST JR."; the
    // input file renders the SAME person "MR FIRST LAST JUNIOR". Exact
    // full-name keys recover nobody; blocking on the PARSED
    // (first, last, standardized-suffix) key recovers every planted
    // record — the Wagner & Layne p. 9 motivation for parsing names
    // before the namesearch module.
    val cohort = graft.queries.People.persons(spark, sfDir)
      .select("k", "first_name", "middle_name", "last_name")
      .filter(pmod(col("k"), lit(5)) === 0)
    val n = cohort.count()
    val ref = cohort.select(col("k").as("ref_k"),
      concat_ws(" ", col("first_name"), col("middle_name"), col("last_name"),
        lit("JR.")).as("full_name"))
    val inp = cohort.select(col("k").as("in_k"),
      concat_ws(" ", lit("MR"), col("first_name"), col("last_name"),
        lit("JUNIOR")).as("full_name"))
    assert(inp.join(ref, Seq("full_name")).count() == 0,
      "exact full-name keys should miss every suffix variant")
    def withParsed(df: org.apache.spark.sql.DataFrame) = df.select(
      df.columns.map(col) ++
        Preprocess.parseName(col("full_name")).map { case (nm, c) => c.as(nm) }: _*)
    val recovered = withParsed(inp)
      .join(withParsed(ref), Seq("first_p", "last_p", "suffix_std"))
      .filter(col("in_k") === col("ref_k")).count()
    assert(recovered == n,
      s"parsed keys recovered $recovered of $n planted suffix variants")
  }
}
