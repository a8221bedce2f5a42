package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Census-style phonetic BLOCKING keys (soundex, reverse soundex, a
  * NYSIIS-style key), built as translate/regexp chains that are rendered
  * simultaneously as a Spark Column tree and as DuckDB SQL from the SAME
  * combinator chain — the two engines cannot drift, so cascade passes that
  * block on these keys stay fully oracle-verifiable.
  *
  * Reference behavior: /root/reference/03_link_datasets.ipynb
  * "add_name_phonetics" (Layne/Wagner/Rothhaas p. 26: "phonetics are used
  * in blocking (not matching) — Soundex for Street Name, NYSIIS code for
  * First/Last Name, Reverse Soundex for First/Last Name"). The reference
  * calls jellyfish; these chains implement the same classic algorithms as
  * pure scalar string expressions (codegen'd, zero shuffles — at 100 TB
  * key derivation is scan-bound map work).
  *
  * [[graft.functions.Nysiis]] remains the exact-jellyfish codegen
  * expression (q24); `nysKey` here is the relinkable variant used for
  * blocking, where cross-engine verifiability matters more than matching
  * jellyfish bit-for-bit.
  */
object Phonetics {

  /** A scalar string expression carried through both renderers at once.
    * Every combinator appends the same operation to the Column tree and
    * the SQL string; group references are written `$1` (Java) and rendered
    * `\1` (RE2) for DuckDB. Only RE2-compatible patterns are allowed (no
    * backreferences in patterns, no lookaround).
    */
  final case class Dual(col: Column, sql: String) {
    def re(pat: String, repl: String): Dual =
      Dual(
        regexp_replace(col, pat, repl),
        s"regexp_replace($sql, '${q(pat)}', '${q(repl.replace("$", "\\"))}', 'g')")
    def tr(from: String, to: String): Dual =
      Dual(translate(col, from, to), s"translate($sql, '${q(from)}', '${q(to)}')")
    def upper: Dual = Dual(org.apache.spark.sql.functions.upper(col), s"upper($sql)")
    def rev: Dual = Dual(org.apache.spark.sql.functions.reverse(col), s"reverse($sql)")
    def substr(pos: Int, len: Int): Dual =
      Dual(substring(col, pos, len), s"substr($sql, $pos, $len)")
    def substrFrom(pos: Int): Dual =
      Dual(substring(col, pos, Int.MaxValue), s"substr($sql, $pos)")
    def rpad(len: Int, pad: String): Dual =
      Dual(org.apache.spark.sql.functions.rpad(col, len, pad), s"rpad($sql, $len, '${q(pad)}')")
    def cat(other: Dual): Dual = Dual(concat(col, other.col), s"($sql || ${other.sql})")
    private def q(s: String): String = s.replace("'", "''")
  }

  object Dual {
    /** Lift a column reference (or any SQL-and-Spark-identical expression). */
    def ref(name: String): Dual = Dual(col(name), name)
    val nullStr: Dual = Dual(lit(null).cast("string"), "NULL")
  }

  /** Branch on a condition rendered in both dialects. */
  private def ifElse(condCol: Column, condSql: String)(t: Dual, e: Dual): Dual =
    Dual(
      when(condCol, t.col).otherwise(e.col),
      s"(CASE WHEN $condSql THEN ${t.sql} ELSE ${e.sql} END)")

  // ---- soundex -----------------------------------------------------------

  /** Letter → code table: vowels+Y → 0 (break runs, then dropped), H/W → 7
    * (transparent: removed BEFORE run-collapse, so same-coded consonants
    * separated by H/W collapse — the American Soundex rule), else digit.
    */
  private val sdxFrom = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val sdxTo   = "01230127022455012623017202"

  /** American Soundex of a name: first letter + 3 digits.
    *
    * Chain: strip non-alpha → code every letter → drop H/W markers →
    * collapse each digit's runs → drop the leading group (the first
    * letter's own code, unless the first letter is H/W, which has no
    * code) → drop vowel zeros → take 3, zero-pad. Empty input → NULL.
    */
  def sdxD(in: Dual): Dual = {
    val clean = in.upper.re("[^A-Z]", "")
    val fc = clean.substr(1, 1)
    val coded = clean.tr(sdxFrom, sdxTo).tr("7", "")
    val collapsed = (0 to 6).foldLeft(coded)((d, i) => d.re(s"$i+", s"$i"))
    val body = ifElse(fc.col.isin("H", "W"), s"${fc.sql} IN ('H', 'W')")(
      collapsed, collapsed.substrFrom(2))
    val digits = body.tr("0", "").substr(1, 3).rpad(3, "0")
    ifElse(clean.col === "", s"${clean.sql} = ''")(Dual.nullStr, fc.cat(digits))
  }

  /** Reverse Soundex: soundex of the reversed cleaned name (PVS blocks on
    * this to survive corrupted FIRST letters, which break every
    * initial/prefix/forward-phonetic key).
    */
  def rsdxD(in: Dual): Dual = sdxD(in.upper.re("[^A-Z]", "").rev)

  // ---- NYSIIS-style key --------------------------------------------------

  /** Head/tail normalizations of classic NYSIIS (applied to the whole
    * name), then the per-character rules expressed as ordered regex/
    * translate rewrites over the tail (first letter preserved).
    */
  private def nysTail(t: Dual): Dual =
    t.re("EV", "AF")
      .tr("AEIOU", "AAAAA")
      .tr("QZM", "GSN")
      .re("KN", "N")
      .tr("K", "C")
      .re("SCH", "SSS")
      .re("PH", "FF")
      // H is transparent next to a non-vowel: it copies the previous
      // letter. Two passes resolve HH runs; then vowel-H boundaries.
      .re("([^A])H", "$1$1")
      .re("([^A])H", "$1$1")
      .re("AH([^A])", "AA$1")
      .re("AH$", "AA")
      .re("AW", "AA")

  /** NYSIIS-style phonetic key: head/tail rewrites, vowel fold to A,
    * consonant normalizations, duplicate collapse, trailing S/AY/A
    * cleanup. Invariant under vowel substitutions after the first letter
    * (the property phonetic blocking exists for).
    */
  def nysD(in: Dual): Dual = {
    val clean = in.upper.re("[^A-Z]", "")
    val head = clean
      .re("^MAC", "MCC").re("^KN", "NN").re("^K", "C")
      .re("^(PH|PF)", "FF").re("^SCH", "SSS")
      .re("(EE|IE)$", "Y").re("(DT|RT|RD|NT|ND)$", "D")
    val fc = head.substr(1, 1)
    val assembled = fc.cat(nysTail(head.substrFrom(2)))
    val collapsed = ('A' to 'Z').foldLeft(assembled)((d, c) => d.re(s"$c+", s"$c"))
    val post = collapsed.re("S$", "").re("AY$", "Y").re("A+$", "")
    val keyOrInitial = ifElse(post.col === "", s"${post.sql} = ''")(fc, post)
    ifElse(clean.col === "", s"${clean.sql} = ''")(Dual.nullStr, keyOrInitial)
  }

  // ---- convenience single-dialect views -----------------------------------

  /** Spark-side keys are the compact codegen'd expressions
    * ([[PhoneticsImpl]]) — semantically identical to the chains (asserted
    * by PhoneticsEquivSpec), but a few generated lines instead of ~50
    * inline regex ops each, so derive()-style projections that compute 5
    * keys per record stay inside whole-stage codegen (the chain variant
    * blew Janino's 64 KB method limit and silently fell back to
    * interpreted evaluation). SQL views still render the chains — that is
    * what DuckDB executes, and the hash gate keeps the two in lockstep.
    */
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def toExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  def sdx(c: Column): Column = toCol(SdxKey(toExpr(c)))
  def sdxSql(e: String): String = sdxD(Dual(lit(""), e)).sql
  def rsdx(c: Column): Column = toCol(ReverseSdxKey(toExpr(c)))
  def rsdxSql(e: String): String = rsdxD(Dual(lit(""), e)).sql
  def nysKey(c: Column): Column = toCol(NysKey(toExpr(c)))
  def nysKeySql(e: String): String = nysD(Dual(lit(""), e)).sql

  /** The chain-built Column variants, kept for the equivalence spec. */
  def sdxChain(c: Column): Column = sdxD(Dual(c, "?")).col
  def rsdxChain(c: Column): Column = rsdxD(Dual(c, "?")).col
  def nysChain(c: Column): Column = nysD(Dual(c, "?")).col
}
