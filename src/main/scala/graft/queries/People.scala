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

  /** Full preprocessing input: names + middle + raw address parts + mixed-
    * format DOB + acctbal. Deterministic dirt: k%3 selects a whitespace/case
    * corruption of the street; k%10 selects unit presence ('' vs NULL vs
    * APARTMENT n); k%11 makes the DOB unparseable, k%7 makes it US-format.
    */
  def persons(s: SparkSession, d: String): DataFrame = {
    val k = col("k")
    val street = pick(streetNames, k, streetPQ)
    val base = Tables.customer(s, d).select(
      col("c_custkey").as("k"),
      col("c_acctbal").as("acctbal"),
      firstName(col("c_custkey")).as("first_name"),
      lastName(col("c_custkey")).as("last_name"),
      pick(firstNames, col("c_custkey"), middlePQ).as("middle_name"),
      pick(cities, col("c_custkey"), cityPQ).as("city"),
      pick(states, col("c_custkey"), statePQ).as("state"))
    val mid = base
      .withColumn("middle_initial", substring(col("middle_name"), 1, 1))
      .withColumn("messy_first", typo(col("first_name"), k))
      .withColumn("messy_last", typo(col("last_name"), k + 1))
      .withColumn("street_num", (lit(100) + pmod(k * 37, lit(9900))).cast("string"))
      .withColumn("street_raw",
        when(pmod(k, lit(3)) === 0, concat(lit("  "), lower(street), lit(" ")))
          .when(pmod(k, lit(3)) === 1, regexp_replace(street, " ", "  "))
          .otherwise(street))
      .withColumn("unit_raw",
        when(pmod(k, lit(10)) === 0,
          concat(lit("APARTMENT "), pmod(k, lit(50)).cast("string")))
          .when(pmod(k, lit(10)) === 5, lit(""))
          .otherwise(lit(null).cast("string")))
      .withColumn("zipcode", (lit(10000) + pmod(k * 7919, lit(90000))).cast("string"))
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

  // ---- DuckDB-SQL side (identical semantics) -----------------------------

  private def sqlList(pool: Seq[String]): String =
    pool.map(n => s"'$n'").mkString("[", ", ", "]")

  private def pickSql(pool: Seq[String], k: String, pq: (Int, Int)): String =
    s"${sqlList(pool)}[1 + (($k * ${pq._1}) % ${pq._2}) % ${pool.size}]"

  def typoSql(name: String, k: String): String =
    s"""CASE WHEN ($k) % 4 = 0 THEN ($name)[1:1] || ($name)[3:]
       |     WHEN ($k) % 4 = 1 THEN ($name)[2:2] || ($name)[1:1] || ($name)[3:]
       |     WHEN ($k) % 4 = 2 THEN ($name) || 'X'
       |     ELSE ($name) END""".stripMargin

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
       |    SELECT k, acctbal, first_name, last_name, middle_name, city, state,
       |           substr(middle_name, 1, 1) AS middle_initial,
       |           ${typoSql("first_name", "k")} AS messy_first,
       |           ${typoSql("last_name", "k + 1")} AS messy_last,
       |           CAST(100 + (k * 37) % 9900 AS VARCHAR) AS street_num,
       |           CASE WHEN k % 3 = 0 THEN '  ' || lower(street) || ' '
       |                WHEN k % 3 = 1 THEN replace(street, ' ', '  ')
       |                ELSE street END AS street_raw,
       |           CASE WHEN k % 10 = 0 THEN 'APARTMENT ' || CAST(k % 50 AS VARCHAR)
       |                WHEN k % 10 = 5 THEN ''
       |                ELSE NULL END AS unit_raw,
       |           CAST(10000 + (k * 7919) % 90000 AS VARCHAR) AS zipcode,
       |           CAST(1940 + ((k * ${yearPQ._1}) % ${yearPQ._2}) % 60 AS INTEGER) AS dob_year,
       |           CAST(1 + ((k * ${monthPQ._1}) % ${monthPQ._2}) % 12 AS INTEGER) AS dob_month,
       |           CAST(1 + ((k * ${dayPQ._1}) % ${dayPQ._2}) % 28 AS INTEGER) AS dob_day
       |    FROM (
       |      SELECT c_custkey AS k, c_acctbal AS acctbal,
       |             ${pickSql(firstNames, "c_custkey", firstPQ)} AS first_name,
       |             ${pickSql(lastNames, "c_custkey", lastPQ)} AS last_name,
       |             ${pickSql(firstNames, "c_custkey", middlePQ)} AS middle_name,
       |             ${pickSql(streetNames, "c_custkey", streetPQ)} AS street,
       |             ${pickSql(cities, "c_custkey", cityPQ)} AS city,
       |             ${pickSql(states, "c_custkey", statePQ)} AS state
       |      FROM customer)))""".stripMargin
}
