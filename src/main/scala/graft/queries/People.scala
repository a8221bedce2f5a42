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

  // ---- Spark side --------------------------------------------------------

  private def pick(pool: Seq[String], k: Column, mult: Int): Column =
    element_at(array(pool.map(lit): _*),
      (pmod(k * mult, lit(pool.size)) + 1).cast("int"))

  def firstName(k: Column): Column = pick(firstNames, k, 7)
  def lastName(k: Column): Column = pick(lastNames, k, 11)

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

  // ---- DuckDB-SQL side (identical semantics) -----------------------------

  private def sqlList(pool: Seq[String]): String =
    pool.map(n => s"'$n'").mkString("[", ", ", "]")

  private def pickSql(pool: Seq[String], k: String, mult: Int): String =
    s"${sqlList(pool)}[1 + ($k * $mult) % ${pool.size}]"

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
       |           ${pickSql(firstNames, "c_custkey", 7)} AS first_name,
       |           ${pickSql(lastNames, "c_custkey", 11)} AS last_name
       |    FROM customer))""".stripMargin
}
