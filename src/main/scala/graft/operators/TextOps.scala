package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for LLM training-data curation (dedup,
  * language-ID, quality scoring, fingerprinting), composed from codegen'd
  * built-ins and higher-order functions. Everything here is map-side scalar
  * work — at 100 TB the only shuffles are the bucket joins the dedup
  * queries add on top.
  */
object TextOps {

  /** Whitespace tokens (the testdata corpus is single-space separated). */
  def words(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles, space-joined. Documents shorter than
    * `n` words yield an EMPTY list — the guard is load-bearing: Spark's
    * sequence(1, 0) defaults to step -1 and returns the descending [1, 0],
    * whose index 0 makes slice() throw at runtime (unlike DuckDB's
    * range(1, 1), which is empty).
    */
  def wordShingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", slice(w, i, lit(n))))))
  }

  /** Murmur3-based minhash signature over shingles: for each of `k` hash
    * functions h_i(x) = (a_i*x + b_i) mod p, the min over the shingle set.
    * Array-composed (k array traversals), stays in codegen.
    */
  val MinhashP = 2147483647L // 2^31 - 1

  /** Independent (a, b) pairs per hash function via a seeded PRNG — a
    * LINEAR family a_i = a_0*(i+1) makes h_i(x) = y*(i+1)+b_i, so any
    * shingle with small y = x*a_0 mod p is the argmin for most i and
    * signatures collapse (observed: J=8/9 pairs sharing only 4/32
    * positions).
    */
  def minhashParams(k: Int): Seq[(Long, Long)] = (0 until k).map { i =>
    val rnd = new java.util.Random(987654321L + i)
    (rnd.nextInt(Int.MaxValue - 2).toLong + 1, rnd.nextInt(Int.MaxValue - 1).toLong)
  }

  /** Per-row minhash signature (k traversals of the shingle array). Fine
    * for short shingle lists; the LSH query uses the explode + hash-agg
    * formulation instead, which murmurs each shingle ONCE and gets
    * map-side partial mins (the scalable shape — per-row higher-order
    * functions re-evaluate the shingle expression per hash function).
    */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val sigs = minhashParams(k).map { case (a, b) =>
      array_min(transform(shingles,
        s => pmod(abs(hash(s)).cast("long") * a + b, lit(MinhashP))))
    }
    array(sigs: _*)
  }

  /** Cross-engine string hashing: 12 hex chars of md5 (48 bits) parsed as
    * a BIGINT. Spark's murmur `hash()` has no DuckDB counterpart, so the
    * oracle-checked dedup queries hash through md5, which both engines
    * compute identically (lowercase hex). 48 bits keeps downstream
    * (a * x + b) arithmetic inside a BIGINT for a < 2^31 coefficients
    * (after the mod), and stays positive so `%`, `>>` and `&` agree
    * across engines.
    */
  def md5Fold48(mhHex: Column, startPos: Int): Column =
    conv(substring(mhHex, startPos, 12), 16, 10).cast("long")

  /** [[md5Fold48]] of the value's md5, reduced mod [[MinhashP]]. */
  def md5Mod(c: Column): Column =
    pmod(md5Fold48(md5(c), 1), lit(MinhashP))

  /** DuckDB rendering of [[md5Fold48]] over a hex-string expression
    * `mhExpr` (hoist `md5(...)` into its own column first — the fold reads
    * it 12 times). DuckDB 1.0 has no conv(), so the hex chars fold
    * arithmetically: digit · 16^(12-i) is exact in a DOUBLE up to
    * 16^11 ≪ 2^53.
    */
  def md5Fold48Sql(mhExpr: String, startPos: Int): String =
    s"""list_aggregate([(strpos('0123456789abcdef', substr($mhExpr, ${startPos - 1} + i, 1)) - 1)
       |     * CAST(power(16, 12 - i) AS BIGINT) FOR i IN range(1, 13)],
       |   'sum')""".stripMargin

  /** DuckDB rendering of [[md5Mod]]. */
  def md5ModSql(mhExpr: String): String =
    s"${md5Fold48Sql(mhExpr, 1)} % $MinhashP"

  /** Per-language stopword lists for the language-ID heuristic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "los"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "les", "des", "une"),
    "zh" -> Seq("de5", "shi4", "le5", "he2"))

  def stopwordHits(text: Column, stops: Seq[String]): Column = {
    val stopArr = array(stops.map(lit): _*)
    size(filter(words(text), w => array_contains(stopArr, w)))
  }

  def stopwordHitsSql(textExpr: String, stops: Seq[String]): String = {
    val list = stops.map(s => s"'$s'").mkString("[", ", ", "]")
    s"len(list_filter(string_split($textExpr, ' '), w -> list_contains($list, w)))"
  }

  /** Stopword hits against the document's OWN language list — the gate
    * input a quality rule needs: scoring every doc against the English
    * list zeroes stop_ratio for non-English docs, so a stopword-floor
    * GATE (q153's r_stop) would hard-drop them regardless of quality.
    * Languages outside the table fall back to the English list (the
    * unknown-language behavior is then explicit, not accidental). The
    * dispatch is a codegen'd CASE over the O(1) static lists — no join.
    */
  def stopwordHitsByLang(text: Column, lang: Column): Column =
    stopwords.foldRight(stopwordHits(text, stopwords.head._2)) {
      case ((l, stops), acc) =>
        when(lang === l, stopwordHits(text, stops)).otherwise(acc)
    }

  /** DuckDB rendering of [[stopwordHitsByLang]]. */
  def stopwordHitsByLangSql(textExpr: String, langExpr: String): String =
    stopwords.map { case (l, stops) =>
      s"WHEN $langExpr = '$l' THEN ${stopwordHitsSql(textExpr, stops)}"
    }.mkString("CASE ", " ",
      s" ELSE ${stopwordHitsSql(textExpr, stopwords.head._2)} END")

  /** Polynomial rolling hash of the whole document (base 31, mod 1e9+7) —
    * an order-sensitive fingerprint, unlike the bag-of-words hashes.
    *
    * Linear: the text splits into a char array ONCE and the fold walks it.
    * (A sequence(1, length) + substr(text, i) formulation is O(n²) per row:
    * Spark re-evaluates the lambda's input per element and each substr
    * re-scans the string's bytes.) Java-regex split on the empty pattern
    * emits a trailing "" — slice(…, 1, length) drops it in the same pass.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(slice(split(text, ""), lit(1), length(text)),
        c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => pmod(acc * 31 + x, lit(1000000007L)))

  def fingerprintSql(textExpr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  [CAST(ascii(($textExpr)[i:i]) AS BIGINT) FOR i IN range(1, len($textExpr) + 1)]),
       |  (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin
}
