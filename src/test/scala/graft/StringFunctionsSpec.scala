package graft

import graft.functions.{JaroWinklerImpl, NysiisImpl}
import org.scalatest.funsuite.AnyFunSuite

/** Golden parity tests. JW goldens were produced by DuckDB 1.0.0
  * `jaro_winkler_similarity` (the oracle engine) — full precision, so any
  * drift in the algorithm fails loudly before the rounded oracle compare.
  */
class StringFunctionsSpec extends AnyFunSuite {

  private val jwGolden = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("", "", 0.0),
    ("A", "", 0.0),
    ("", "A", 0.0),
    ("ABC", "ABC", 1.0),
    ("AB", "BA", 0.0),
    ("JONES", "JOHNSON", 0.8323809523809523),
    ("SMITH", "SMYTH", 0.8933333333333333),
    ("a", "a", 1.0),
    ("a", "b", 0.0),
    ("PREFIX", "PREFIXX", 0.9714285714285714),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("ABCDEF", "FEDCBA", 0.38888888888888884),
    ("AAAA", "AAAAAA", 0.9333333333333333),
    ("X", "XYZ", 0.7999999999999999),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("hello world", "hello there", 0.8545454545454545),
    // boost threshold: jaro <= 0.7 must NOT get the prefix bonus
    ("ABXXXXX", "ABYYYYYYYYYYYYYYYYYY", 0.4619047619047619),
    ("ABCD", "ABCDXXXXXXXXXXXXXXXX", 0.8400000000000001)
  )

  test("jaro-winkler matches DuckDB bit-for-bit") {
    jwGolden.foreach { case (a, b, want) =>
      val got = JaroWinklerImpl.similarity(a, b)
      assert(got == want, s"jw($a, $b): got $got want $want")
    }
  }

  test("jaro-winkler is symmetric") {
    jwGolden.foreach { case (a, b, _) =>
      assert(JaroWinklerImpl.similarity(a, b) == JaroWinklerImpl.similarity(b, a))
    }
  }

  test("nysiis known codes") {
    // jellyfish-algorithm outputs (computed by hand from the published
    // algorithm; stable golden for regression).
    val cases = Seq(
      "MACDONALD" -> "MCDANALD",
      "KNIGHT" -> "NAGT",
      "KAREN" -> "CARAN",
      "PHILLIP" -> "FALAP",
      "SCHMIDT" -> "SNAD",
      "BROWN" -> "BRAN",
      "O" -> "O",
      "" -> ""
    )
    cases.foreach { case (in, want) =>
      val got = NysiisImpl.code(in)
      assert(got == want, s"nysiis($in): got $got want $want")
    }
  }

  test("nysiis collapses runs and is case-insensitive") {
    assert(NysiisImpl.code("smith") == NysiisImpl.code("SMITH"))
    assert(NysiisImpl.code("AAAA") == "A")
  }
}
