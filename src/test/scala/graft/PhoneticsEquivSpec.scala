package graft

import graft.functions.Phonetics
import org.apache.spark.sql.functions._

/** The compact codegen'd phonetic keys (PhoneticsImpl) must agree with the
  * Dual regexp/translate chains on EVERY input — the chains are what the
  * DuckDB oracle executes, so any divergence would silently break the
  * cross-engine hash verification of every blocking key downstream.
  */
class PhoneticsEquivSpec extends SparkTestBase {

  private def compare(inputs: Seq[String]): Unit = {
    import spark.implicits._
    val rows = spark.createDataset(inputs).toDF("s")
      .select(
        col("s"),
        Phonetics.sdx(col("s")).as("sdx_e"), Phonetics.sdxChain(col("s")).as("sdx_c"),
        Phonetics.rsdx(col("s")).as("rsdx_e"), Phonetics.rsdxChain(col("s")).as("rsdx_c"),
        Phonetics.nysKey(col("s")).as("nys_e"), Phonetics.nysChain(col("s")).as("nys_c"))
      .collect()
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.get(1) == r.get(2), s"sdx('$s'): expr=${r.get(1)} chain=${r.get(2)}")
      assert(r.get(3) == r.get(4), s"rsdx('$s'): expr=${r.get(3)} chain=${r.get(4)}")
      assert(r.get(5) == r.get(6), s"nys('$s'): expr=${r.get(5)} chain=${r.get(6)}")
    }
  }

  test("expression == chain on the edge-case fixtures") {
    compare(Seq(
      "", " ", "---", "123", "A", "H", "W", "HH", "WH", "S", "AY", "AAA",
      "EE", "IE", "EV", "KN", "K", "MAC", "MACK", "KNOWLES", "SCHMIDT",
      "PHILLIPS", "PFISTER", "SCHSCH", "AHAB", "XHHH", "OOMPH", "EVEV",
      "MCDONALD O'BRIEN", "VAN DER BERG", "ASHCRAFT", "TYMCZAK", "LEE",
      "BOOTH-DAVIS", "D", "DT", "ADT", "SHAW", "AW", "XAW", "YAH",
      "MARY", "JOHN", "WILLIAM", "ELIZABETH", "CHRISTOPHER"))
  }

  test("expression == chain on 2000 random alpha-ish strings") {
    // Seeded (deterministic) sampling, PropertySpec-style. Mixed-case
    // letters with occasional digits/punct/spaces — the chain strips
    // non-A-Z first, so this also exercises the cleaning step.
    val rnd = new scala.util.Random(20260813L)
    val pool = ('A' to 'Z') ++ ('a' to 'z') ++ "0123456789 -'."
    def randStr(): String = {
      val n = rnd.nextInt(25)
      (1 to n).map(_ => pool(rnd.nextInt(pool.length))).mkString
    }
    compare((1 to 2000).map(_ => randStr()))
  }
}
