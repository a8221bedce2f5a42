package graft

import graft.functions.Phonetics
import org.apache.spark.sql.functions._

/** Fixtures for the dual-rendered phonetic blocking keys. Soundex values
  * are the US National Archives' published examples; NYSIIS-key checks
  * assert the invariances the cascade passes rely on (vowel substitution
  * after the first letter, soundex-class first-letter swaps for the
  * reverse key). Cross-engine equality with the DuckDB rendering is
  * enforced end-to-end by the q23/q32 oracles.
  */
class PhoneticsSpec extends SparkTestBase {

  private def eval(c: org.apache.spark.sql.Column): String = {
    val row = spark.range(1).select(c.as("v")).collect()(0)
    if (row.isNullAt(0)) null else row.getString(0)
  }

  test("soundex matches the National Archives examples") {
    val expected = Map(
      "ROBERT" -> "R163", "RUPERT" -> "R163", "ASHCRAFT" -> "A261",
      "TYMCZAK" -> "T522", "PFISTER" -> "P236", "JACKSON" -> "J250",
      "WASHINGTON" -> "W252", "GUTIERREZ" -> "G362", "VANDEUSEN" -> "V532",
      "LEE" -> "L000")
    expected.foreach { case (name, code) =>
      assert(eval(Phonetics.sdx(lit(name))) === code, name)
    }
    assert(eval(Phonetics.sdx(lit(""))) === null)
    assert(eval(Phonetics.sdx(lit("MAPLE STREET"))) === eval(Phonetics.sdx(lit("MAPLESTREET"))))
  }

  test("reverse soundex survives first-letter corruption in its code class") {
    // The class-V planted noise swaps first letters within a soundex code
    // class (C<->S, G<->J, M<->N, ...): forward keys break, reverse holds.
    val pairs = Seq("CAREN" -> "KAREN", "GOHN" -> "JOHN", "NARY" -> "MARY",
      "CMITH" -> "SMITH", "HILSON" -> "WILSON", "ENDERSON" -> "ANDERSON")
    pairs.foreach { case (a, b) =>
      assert(eval(Phonetics.rsdx(lit(a))) === eval(Phonetics.rsdx(lit(b))), s"$a/$b")
      val forwardDiffers = eval(Phonetics.sdx(lit(a))) != eval(Phonetics.sdx(lit(b)))
      assert(forwardDiffers || a.head == 'H' || a.head == 'W' || a.head == 'E', s"$a/$b forward")
    }
  }

  test("nysiis key folds vowels and matches classic values") {
    assert(eval(Phonetics.nysKey(lit("JOHN"))) === "JAN")
    assert(eval(Phonetics.nysKey(lit("SMITH"))) === "SNAT")
    // Invariance under post-initial vowel substitution (class-N noise).
    Seq("JOHN" -> "JAHN", "SMITH" -> "SMETH", "MARY" -> "MERY",
      "GARCIA" -> "GERCIA", "JENNIFER" -> "JANNIFER").foreach { case (a, b) =>
      assert(eval(Phonetics.nysKey(lit(a))) === eval(Phonetics.nysKey(lit(b))), s"$a/$b")
    }
    // First-letter normalizations from the classic head rules.
    assert(eval(Phonetics.nysKey(lit("KNUTH"))) === eval(Phonetics.nysKey(lit("NNUTH"))))
    assert(eval(Phonetics.nysKey(lit("A"))) === "A")
    assert(eval(Phonetics.nysKey(lit(""))) === null)
  }
}
