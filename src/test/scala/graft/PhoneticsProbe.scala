package graft

import graft.functions.Phonetics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: prints `name TAB spark_sdx TAB spark_rsdx TAB spark_nys`
  * for sample names plus the generated DuckDB SQL templates, so a DuckDB
  * run over the same names can be diffed against the Spark values
  * (cross-engine drift in the phonetic chains would silently break the
  * cascade oracle otherwise).
  */
object PhoneticsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq(
      "JOHN", "MARY", "ROBERT", "PATRICIA", "MICHAEL", "JENNIFER", "WILLIAM",
      "LINDA", "DAVID", "ELIZABETH", "RICHARD", "BARBARA", "JOSEPH", "SUSAN",
      "THOMAS", "JESSICA", "CHARLES", "SARAH", "CHRISTOPHER", "KAREN",
      "SMITH", "JOHNSON", "WILLIAMS", "BROWN", "JONES", "GARCIA", "MILLER",
      "DAVIS", "RODRIGUEZ", "MARTINEZ", "HERNANDEZ", "LOPEZ", "GONZALEZ",
      "WILSON", "ANDERSON", "TAYLOR", "MOORE", "JACKSON", "MARTIN", "LEE",
      "MAPLE STREET", "OAK AVENUE", "NORTH MAIN STREET", "PFISTER",
      "ASHCRAFT", "TYMCZAK", "KNUTH", "MACDONALD", "SCHWARTZ", "PHILLIP",
      "JHN", "OJHN", "JOHNX", "A", "HW", "X")
    import spark.implicits._
    val df = names.toDF("n").select(
      col("n"), Phonetics.sdx(col("n")).as("s"),
      Phonetics.rsdx(col("n")).as("r"), Phonetics.nysKey(col("n")).as("y"))
    df.collect().foreach { row =>
      println(s"ROW\t${row.getString(0)}\t${row.getString(1)}\t${row.getString(2)}\t${row.getString(3)}")
    }
    println("SQL_SDX\t" + Phonetics.sdxSql("n"))
    println("SQL_RSDX\t" + Phonetics.rsdxSql("n"))
    println("SQL_NYS\t" + Phonetics.nysKeySql("n"))
    spark.stop()
  }
}
