package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic person records derived from `customer`, defined
  * identically in Spark and DuckDB SQL so linkage queries are oracle-
  * verifiable. Names come from fixed pools indexed by key arithmetic;
  * "messy" variants inject deterministic typos (drop/swap/append) the way
  * the reference's simulated census data carries noise
  * (/root/reference/02_generate_simulated_data*.ipynb).
  *
  * `persons` extends the base name records with address parts (raw, with
  * deterministic dirt: stray case, doubled whitespace, padding), a DOB in
  * mixed formats, and account balance — the full input surface of the
  * reference's preprocessing stage (/root/reference/03_link_datasets.ipynb
  * "Pre-processing" cells).
  */
object People {

  val firstNames: Seq[String] = Seq(
    "JOHN", "MARY", "ROBERT", "PATRICIA", "MICHAEL", "JENNIFER", "WILLIAM",
    "LINDA", "DAVID", "ELIZABETH", "RICHARD", "BARBARA", "JOSEPH", "SUSAN",
    "THOMAS", "JESSICA", "CHARLES", "SARAH", "CHRISTOPHER", "KAREN")

  val lastNames: Seq[String] = Seq(
    "SMITH", "JOHNSON", "WILLIAMS", "BROWN", "JONES", "GARCIA", "MILLER",
    "DAVIS", "RODRIGUEZ", "MARTINEZ", "HERNANDEZ", "LOPEZ", "GONZALEZ",
    "WILSON", "ANDERSON", "TAYLOR", "MOORE", "JACKSON", "MARTIN", "LEE")

  val streetNames: Seq[String] = Seq(
    "MAPLE STREET", "OAK AVENUE", "CEDAR ROAD", "ELM BOULEVARD", "PINE DRIVE",
    "WASHINGTON LANE", "LAKE STREET", "HILL ROAD", "SUNSET BOULEVARD",
    "RIVER AVENUE", "PARK DRIVE", "NORTH MAIN STREET", "SOUTH HIGH STREET",
    "EAST CENTER AVENUE", "WEST SECOND STREET", "THIRD AVENUE",
    "CHURCH STREET", "SPRING LANE", "MILL ROAD", "FRANKLIN STREET")

  val cities: Seq[String] = Seq(
    "SPRINGFIELD", "RIVERTON", "FAIRVIEW", "GREENVILLE", "BRISTOL",
    "CLINTON", "SALEM", "MADISON", "GEORGETOWN", "ARLINGTON")

  val states: Seq[String] = Seq(
    "CA", "TX", "NY", "FL", "IL", "PA", "OH", "GA", "NC", "MI")

  /** Per-field (multiplier, modulus) pairs for index derivation. The pool
    * index is ((k*P) % Q) % size with gcd(P, Q) = 1 and Q large, so the
    * period of every field is Q and the JOINT cycle of (names, DOB) is
    * astronomically long — a small-modulus scheme would mint exact
    * "doppelgänger" clones every lcm(periods) rows, which makes blocked
    * linkage degenerate (every best-link is an ambiguous tie).
    */
  private val firstPQ = (7919, 104729)
  private val lastPQ = (6841, 104723)
  private val middlePQ = (5801, 104717)
  private val streetPQ = (4789, 104711)
  private val cityPQ = (3571, 104707)
  private val statePQ = (2693, 104701)
  val yearPQ: (Int, Int) = (6007, 104681)
  val monthPQ: (Int, Int) = (3511, 104651)
  val dayPQ: (Int, Int) = (2003, 104647)

  // ---- Spark side --------------------------------------------------------

  private def pick(pool: Seq[String], k: Column, pq: (Int, Int)): Column =
    element_at(array(pool.map(lit): _*),
      (pmod(pmod(k * pq._1, lit(pq._2)), lit(pool.size)) + 1).cast("int"))

  def firstName(k: Column): Column = pick(firstNames, k, firstPQ)
  def lastName(k: Column): Column = pick(lastNames, k, lastPQ)

  /** The married surname of person k — a SECOND deterministic last-name
    * pick, decorrelated from [[lastName]] by the affine index shift. The
    * reference-file side records it as an era-1 refile (the Name/DOB
    * Reference File's alternate-name rows: "all possible combinations of
    * alternate names", /root/reference/03_link_datasets.ipynb NameSearch
    * header quoting Wagner & Layne p. 15); the input-side class-M noise
    * plants the same surname so only the reference-side alternate row can
    * match it.
    */
  def marriedLast(k: Column): Column = pick(lastNames, k * 3 + 11, lastPQ)

  /** SQL mirror of [[marriedLast]]. */
  def marriedLastSql(k: String): String =
    pickSql(lastNames, s"($k) * 3 + 11", lastPQ)

  /** Deterministic typo: k%4==0 drop 2nd char, ==1 swap first two chars,
    * ==2 append 'X', else unchanged.
    */
  def typo(name: Column, k: Column): Column =
    when(pmod(k, lit(4)) === 0, concat(substring(name, 1, 1), substring(name, 3, 64)))
      .when(pmod(k, lit(4)) === 1,
        concat(substring(name, 2, 1), substring(name, 1, 1), substring(name, 3, 64)))
      .when(pmod(k, lit(4)) === 2, concat(name, lit("X")))
      .otherwise(name)

  /** k, first_name, last_name, messy_first, messy_last — one row per customer. */
  def people(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    Tables.customer(s, d)
      .select(
        k.as("k"),
        firstName(k).as("first_name"),
        lastName(k).as("last_name"))
      .withColumn("messy_first", typo(col("first_name"), col("k")))
      .withColumn("messy_last", typo(col("last_name"), col("k") + 1))
  }

  /** Household key: people share addresses. Most households are 4
    * consecutive keys; every 200-key block starts with a 20-person
    * group-quarters (GQ) "household" (dorm/prison-style), the skew the
    * reference defuses by excluding probable-GQ geokeys from blocking
    * (/root/reference/03_link_datasets.ipynb "HACK: Remove address
    * information from GQ"). GQ households: hh ≡ 0 (mod 200).
    */
  def household(k: Column): Column =
    when(pmod(k, lit(200)) < 20, k - pmod(k, lit(200)))
      .otherwise(k - pmod(k, lit(4)))

  def householdSql(k: String): String =
    s"CASE WHEN ($k) % 200 < 20 THEN ($k) - (($k) % 200) ELSE ($k) - (($k) % 4) END"

  /** Whole-household moves (reference file carries the OLD address): every
    * 13th regular household; GQ households never move (keeps the GQ
    * detection test deterministic).
    */
  def householdMoved(hh: Column): Column =
    pmod(hh, lit(13)) === 0 && pmod(hh, lit(200)) =!= 0

  val householdMovedSql: String = "(hh % 13 = 0 AND hh % 200 <> 0)"

  /** Full preprocessing input: names + middle + raw address parts + mixed-
    * format DOB + acctbal. Addresses derive from the HOUSEHOLD key (shared
    * by household members); the *_old variants are the previous address
    * (used by the reference file for moved households/records). Deterministic
    * dirt: k%3 selects a whitespace/case corruption of the street; hh%10
    * selects unit presence ('' vs NULL vs APARTMENT n); k%11 makes the DOB
    * unparseable, k%7 makes it US-format. housing_type is the noisy GQ
    * indicator (true membership hh%200==0, flipped when k%31==0).
    */
  def persons(s: SparkSession, d: String): DataFrame = {
    val k = col("k")
    val hh = col("hh")
    val street = pick(streetNames, hh, streetPQ)
    val streetOld = pick(streetNames, hh + 53, streetPQ)
    val base = Tables.customer(s, d).select(
      col("c_custkey").as("k"),
      household(col("c_custkey")).as("hh"),
      col("c_acctbal").as("acctbal"),
      firstName(col("c_custkey")).as("first_name"),
      lastName(col("c_custkey")).as("last_name"),
      pick(firstNames, col("c_custkey"), middlePQ).as("middle_name"))
    val mid = base
      .withColumn("city", pick(cities, hh, cityPQ))
      .withColumn("state", pick(states, hh, statePQ))
      .withColumn("city_old", pick(cities, hh + 53, cityPQ))
      .withColumn("state_old", pick(states, hh + 53, statePQ))
      .withColumn("middle_initial", substring(col("middle_name"), 1, 1))
      .withColumn("messy_first", typo(col("first_name"), k))
      .withColumn("messy_last", typo(col("last_name"), k + 1))
      .withColumn("street_num", (lit(100) + pmod(hh * 37, lit(9900))).cast("string"))
      .withColumn("street_num_old",
        (lit(100) + pmod((hh + 53) * 37, lit(9900))).cast("string"))
      .withColumn("street_raw",
        when(pmod(k, lit(3)) === 0, concat(lit("  "), lower(street), lit(" ")))
          .when(pmod(k, lit(3)) === 1, regexp_replace(street, " ", "  "))
          .otherwise(street))
      .withColumn("street_raw_old", streetOld)
      .withColumn("unit_raw",
        when(pmod(hh, lit(10)) === 0,
          concat(lit("APARTMENT "), pmod(hh, lit(50)).cast("string")))
          .when(pmod(hh, lit(10)) === 5, lit(""))
          .otherwise(lit(null).cast("string")))
      .withColumn("zipcode", (lit(10000) + pmod(hh * 7919, lit(90000))).cast("string"))
      .withColumn("zipcode_old",
        (lit(10000) + pmod((hh + 53) * 7919, lit(90000))).cast("string"))
      .withColumn("housing_type",
        when((pmod(k, lit(200)) < 20) =!= (pmod(k, lit(31)) === 0), lit("GQ"))
          .otherwise(lit("Household")))
      .withColumn("dob_year",
        (lit(1940) + pmod(pmod(k * yearPQ._1, lit(yearPQ._2)), lit(60))).cast("int"))
      .withColumn("dob_month",
        (lit(1) + pmod(pmod(k * monthPQ._1, lit(monthPQ._2)), lit(12))).cast("int"))
      .withColumn("dob_day",
        (lit(1) + pmod(pmod(k * dayPQ._1, lit(dayPQ._2)), lit(28))).cast("int"))
    mid.withColumn("dob_raw",
      when(pmod(k, lit(11)) === 0, lit("UNKNOWN"))
        .when(pmod(k, lit(7)) === 0,
          concat(
            lpad(col("dob_month").cast("string"), 2, "0"), lit("/"),
            lpad(col("dob_day").cast("string"), 2, "0"), lit("/"),
            col("dob_year").cast("string")))
        .otherwise(concat(
          col("dob_year").cast("string"), lit("-"),
          lpad(col("dob_month").cast("string"), 2, "0"), lit("-"),
          lpad(col("dob_day").cast("string"), 2, "0"))))
  }

  /** Standardized geokey of the CURRENT address (the input file's view).
    * Expects the persons columns in scope.
    */
  def geokeyCur: Column = {
    import graft.operators.Preprocess._
    geokey(col("street_num"), standardizeAddressPart(col("street_raw")),
      standardizeAddressPart(col("unit_raw")), col("city"), col("state"),
      col("zipcode"))
  }

  /** Standardized geokey of the OLD address (what the reference file holds
    * for moved households/records). Old addresses carry no unit.
    */
  def geokeyOld: Column = {
    import graft.operators.Preprocess._
    geokey(col("street_num_old"), standardizeAddressPart(col("street_raw_old")),
      lit(""), col("city_old"), col("state_old"), col("zipcode_old"))
  }

  // ---- DuckDB-SQL side (identical semantics) -----------------------------

  private def sqlList(pool: Seq[String]): String =
    pool.map(n => s"'$n'").mkString("[", ", ", "]")

  private def pickSql(pool: Seq[String], k: String, pq: (Int, Int)): String =
    s"${sqlList(pool)}[1 + ((($k) * ${pq._1}) % ${pq._2}) % ${pool.size}]"

  def typoSql(name: String, k: String): String =
    s"""CASE WHEN ($k) % 4 = 0 THEN ($name)[1:1] || ($name)[3:]
       |     WHEN ($k) % 4 = 1 THEN ($name)[2:2] || ($name)[1:1] || ($name)[3:]
       |     WHEN ($k) % 4 = 2 THEN ($name) || 'X'
       |     ELSE ($name) END""".stripMargin

  import graft.operators.Preprocess.{geokeySql, standardizeAddressPartSql}

  /** SQL mirror of [[geokeyCur]]. */
  val geokeyCurSql: String = geokeySql(Seq(
    "street_num", standardizeAddressPartSql("street_raw"),
    standardizeAddressPartSql("unit_raw"), "city", "state", "zipcode"))

  /** SQL mirror of [[geokeyOld]]. */
  val geokeyOldSql: String = geokeySql(Seq(
    "street_num_old", standardizeAddressPartSql("street_raw_old"),
    "''", "city_old", "state_old", "zipcode_old"))

  /** CTE producing the same columns as [[people]]. */
  val peopleCte: String =
    s"""people AS (
       |  SELECT k, first_name, last_name,
       |         ${typoSql("first_name", "k")} AS messy_first,
       |         ${typoSql("last_name", "k + 1")} AS messy_last
       |  FROM (
       |    SELECT c_custkey AS k,
       |           ${pickSql(firstNames, "c_custkey", firstPQ)} AS first_name,
       |           ${pickSql(lastNames, "c_custkey", lastPQ)} AS last_name
       |    FROM customer))""".stripMargin

  /** CTE producing the same columns as [[persons]]. */
  val personsCte: String =
    s"""persons AS (
       |  SELECT *,
       |         CASE WHEN k % 11 = 0 THEN 'UNKNOWN'
       |              WHEN k % 7 = 0 THEN lpad(CAST(dob_month AS VARCHAR), 2, '0') || '/' ||
       |                   lpad(CAST(dob_day AS VARCHAR), 2, '0') || '/' || CAST(dob_year AS VARCHAR)
       |              ELSE CAST(dob_year AS VARCHAR) || '-' ||
       |                   lpad(CAST(dob_month AS VARCHAR), 2, '0') || '-' ||
       |                   lpad(CAST(dob_day AS VARCHAR), 2, '0') END AS dob_raw
       |  FROM (
       |    SELECT k, hh, acctbal, first_name, last_name, middle_name,
       |           ${pickSql(cities, "hh", cityPQ)} AS city,
       |           ${pickSql(states, "hh", statePQ)} AS state,
       |           ${pickSql(cities, "hh + 53", cityPQ)} AS city_old,
       |           ${pickSql(states, "hh + 53", statePQ)} AS state_old,
       |           substr(middle_name, 1, 1) AS middle_initial,
       |           ${typoSql("first_name", "k")} AS messy_first,
       |           ${typoSql("last_name", "k + 1")} AS messy_last,
       |           CAST(100 + (hh * 37) % 9900 AS VARCHAR) AS street_num,
       |           CAST(100 + ((hh + 53) * 37) % 9900 AS VARCHAR) AS street_num_old,
       |           CASE WHEN k % 3 = 0 THEN '  ' || lower(street) || ' '
       |                WHEN k % 3 = 1 THEN replace(street, ' ', '  ')
       |                ELSE street END AS street_raw,
       |           street_old AS street_raw_old,
       |           CASE WHEN hh % 10 = 0 THEN 'APARTMENT ' || CAST(hh % 50 AS VARCHAR)
       |                WHEN hh % 10 = 5 THEN ''
       |                ELSE NULL END AS unit_raw,
       |           CAST(10000 + (hh * 7919) % 90000 AS VARCHAR) AS zipcode,
       |           CAST(10000 + ((hh + 53) * 7919) % 90000 AS VARCHAR) AS zipcode_old,
       |           CASE WHEN (k % 200 < 20) <> (k % 31 = 0) THEN 'GQ'
       |                ELSE 'Household' END AS housing_type,
       |           CAST(1940 + ((k * ${yearPQ._1}) % ${yearPQ._2}) % 60 AS INTEGER) AS dob_year,
       |           CAST(1 + ((k * ${monthPQ._1}) % ${monthPQ._2}) % 12 AS INTEGER) AS dob_month,
       |           CAST(1 + ((k * ${dayPQ._1}) % ${dayPQ._2}) % 28 AS INTEGER) AS dob_day
       |    FROM (
       |      SELECT k, hh, acctbal,
       |             ${pickSql(firstNames, "k", firstPQ)} AS first_name,
       |             ${pickSql(lastNames, "k", lastPQ)} AS last_name,
       |             ${pickSql(firstNames, "k", middlePQ)} AS middle_name,
       |             ${pickSql(streetNames, "hh", streetPQ)} AS street,
       |             ${pickSql(streetNames, "hh + 53", streetPQ)} AS street_old
       |      FROM (SELECT c_custkey AS k, ${householdSql("c_custkey")} AS hh,
       |                   c_acctbal AS acctbal
       |            FROM customer))))""".stripMargin
}
