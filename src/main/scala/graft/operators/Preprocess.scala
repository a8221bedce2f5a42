package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's record-linkage preprocessing stage
  * (/root/reference/03_link_datasets.ipynb "Pre-processing" cells), as
  * composable codegen-friendly Column transforms. Each transform also has a
  * DuckDB-SQL renderer generated from the SAME rule tables, so Spark and
  * oracle semantics cannot drift.
  *
  * All of this is scalar, whole-stage-codegen'd work: at 100 TB it is pure
  * map-side compute with zero shuffles, so throughput is scan-bound.
  */
object Preprocess {

  /** Word-level USPS-style abbreviations applied after case/whitespace
    * normalization (reference standardizes address parts the same way).
    */
  val addressWordRules: Seq[(String, String)] = Seq(
    "STREET" -> "ST", "AVENUE" -> "AVE", "ROAD" -> "RD", "BOULEVARD" -> "BLVD",
    "DRIVE" -> "DR", "LANE" -> "LN", "APARTMENT" -> "APT", "NORTH" -> "N",
    "SOUTH" -> "S", "EAST" -> "E", "WEST" -> "W")

  /** trim → collapse whitespace → upper → whole-token abbreviation →
    * empty→NULL. Token mapping is split → per-word CASE → rejoin (one
    * codegen'd pass), NOT one \b-regex per rule — N regex passes scan the
    * string N times, which at 100 TB is the difference between scan-bound
    * and regex-bound preprocessing.
    */
  def standardizeAddressPart(c: Column): Column = {
    val cleaned = regexp_replace(trim(upper(c)), "\\s+", " ")
    val mapWord: Column => Column = w =>
      addressWordRules.foldLeft(Option.empty[Column]) { case (acc, (from, to)) =>
        Some(acc.fold(when(w === from, to))(_.when(w === from, to)))
      }.get.otherwise(w)
    val normalized = array_join(transform(split(cleaned, " "), mapWord), " ")
    when(normalized === "", lit(null).cast("string")).otherwise(normalized)
  }

  /** DuckDB SQL with identical semantics to [[standardizeAddressPart]]. */
  def standardizeAddressPartSql(x: String): String = {
    val cleaned = s"regexp_replace(trim(upper($x)), '\\s+', ' ', 'g')"
    val cases = addressWordRules
      .map { case (from, to) => s"WHEN w = '$from' THEN '$to'" }
      .mkString(" ")
    val mapped =
      s"array_to_string(list_transform(string_split($cleaned, ' '), w -> CASE $cases ELSE w END), ' ')"
    s"nullif($mapped, '')"
  }

  /** PVS-style geokey: '|'-joined standardized address parts, NULL-safe
    * (reference builds geokey by concatenating 6 address columns).
    */
  def geokey(parts: Column*): Column =
    concat_ws("|", parts.map(p => coalesce(p, lit(""))): _*)

  def geokeySql(parts: Seq[String]): String =
    parts.map(p => s"coalesce($p, '')").mkString(" || '|' || ")

  /** First/last-initial cut categories (PVS partitions the namesearch module
    * by these; reference 03_link_datasets.ipynb "cut" columns).
    */
  def initialCut(initial: Column): Column =
    when(initial.isNull || initial === "" || initial === "A", "A_BLANK")
      .when(initial <= "G", "B_G")
      .when(initial <= "L", "H_L")
      .when(initial <= "R", "M_R")
      .when(initial <= "T", "S_T")
      .otherwise("U_Z")

  def initialCutSql(x0: String): String = {
    val x = s"($x0)" // parenthesize: callers may pass compound expressions
    s"""CASE WHEN $x IS NULL OR $x = '' OR $x = 'A' THEN 'A_BLANK'
       |     WHEN $x <= 'G' THEN 'B_G'
       |     WHEN $x <= 'L' THEN 'H_L'
       |     WHEN $x <= 'R' THEN 'M_R'
       |     WHEN $x <= 'T' THEN 'S_T'
       |     ELSE 'U_Z' END""".stripMargin
  }

  /** Tolerant DOB parse: ISO yyyy-MM-dd first, then US MM/dd/yyyy; anything
    * else NULL (reference's to_datetime(errors='coerce') + split).
    */
  def tolerantDate(c: Column): Column =
    coalesce(try_to_timestamp(c, lit("yyyy-MM-dd")), try_to_timestamp(c, lit("MM/dd/yyyy")))
      .cast("date")

  def tolerantDateSql(x: String): String =
    s"CAST(coalesce(try_strptime($x, '%Y-%m-%d'), try_strptime($x, '%m/%d/%Y')) AS DATE)"

  /** Nickname → canonical alternates (reference expands records with extra
    * rows per alternate name from a nickname file).
    */
  val nicknames: Seq[(String, String)] = Seq(
    "WILLIAM" -> "BILL", "ROBERT" -> "BOB", "RICHARD" -> "DICK",
    "ELIZABETH" -> "BETH", "JOHN" -> "JACK", "MICHAEL" -> "MIKE",
    "JENNIFER" -> "JEN", "THOMAS" -> "TOM", "CHRISTOPHER" -> "CHRIS",
    "PATRICIA" -> "PAT")

  def nicknamesSqlValues: String =
    nicknames.map { case (n, a) => s"('$n', '$a')" }.mkString(", ")

  /** Names treated as placeholders and nulled out (reference joins against
    * a fake-names list, e.g. 'BABY', 'UNKNOWN'). q19 demonstrates the
    * operator with common pool names so the join path has hits at tiny SF.
    */
  val fakeNames: Seq[String] = Seq("JOHN", "MARY")

  def fakeNamesSqlValues: String = fakeNames.map(n => s"('$n')").mkString(", ")

  /** The placeholder strings the CASCADE nulls out before blocking — the
    * realistic fake-name list (a placeholder name is no evidence either
    * way; nulling it routes the comparison to Splink's null level instead
    * of a heavy disagreement penalty). Tiny list → a codegen'd IN filter,
    * the same plan a broadcast join against a fake-name file would reach.
    */
  val placeholderNames: Seq[String] = Seq("UNKNOWN", "BABY")

  def placeholderNamesSqlList: String =
    placeholderNames.map(n => s"'$n'").mkString(", ")

  // ---- free-text name parsing (q137) -------------------------------------
  // The real PVS parses free-text names into components before
  // standardization (reference 03_link_datasets.ipynb cell 16 skips it
  // because the CUF arrives pre-parsed; Wagner & Layne p. 9 list the
  // edits). Rule-based: tokenize on whitespace with periods stripped,
  // peel a leading courtesy/honorific prefix and a trailing generational
  // suffix, standardize the suffix spelling, and read first/middle/last
  // from the remaining core tokens. Pure codegen'd scalar work; the SQL
  // renderer derives from the SAME rule tables.

  val namePrefixes: Seq[String] = Seq("MR", "MRS", "MS", "DR", "MISS", "REV")

  /** Recognized raw generational-suffix spellings. */
  val nameSuffixes: Seq[String] =
    Seq("JR", "JUNIOR", "SR", "SENIOR", "II", "2ND", "III", "3RD", "IV", "4TH")

  /** Raw suffix spelling → canonical form (identity where not listed). */
  val suffixStdRules: Seq[(String, String)] = Seq(
    "JUNIOR" -> "JR", "SENIOR" -> "SR", "2ND" -> "II", "3RD" -> "III",
    "4TH" -> "IV")

  /** Canonical generational suffix: JUNIOR→JR, 2ND→II, … identity on
    * already-canonical spellings.
    */
  def standardizeSuffix(c: Column): Column =
    suffixStdRules.foldLeft(Option.empty[Column]) { case (acc, (from, to)) =>
      Some(acc.fold(when(c === from, to))(_.when(c === from, to)))
    }.get.otherwise(c)

  def standardizeSuffixSql(x: String): String =
    s"CASE $x " + suffixStdRules
      .map { case (from, to) => s"WHEN '$from' THEN '$to'" }
      .mkString(" ") + s" ELSE $x END"

  /** Parse a free-text name into its five components. Returns columns
    * (name_prefix, first_p, middle_p, last_p, suffix_std); prefix/middle/
    * suffix are NULL when absent. A trailing suffix token is only peeled
    * when at least one core token remains ("MR JR" parses JR as the bare
    * last name, not as a suffix of nothing). Core-token conventions
    * (identical in both renderers, and total under ANSI mode — no
    * index ever exceeds the token array):
    *   - ONE core token → it is the LAST name, first_p is NULL
    *     ("MR SMITH JR" → last=SMITH, first=NULL);
    *   - ZERO core tokens (a bare prefix like "MR") → first_p and
    *     last_p are both NULL.
    */
  def parseName(full: Column): Seq[(String, Column)] = {
    val toks = split(trim(regexp_replace(upper(full), "\\.", "")), " +")
    val n = size(toks)
    val hasPre = element_at(toks, 1).isin(namePrefixes: _*)
    val startI = when(hasPre, lit(2)).otherwise(lit(1))
    val hasSuf = element_at(toks, n).isin(nameSuffixes: _*) && n > startI
    val endI = when(hasSuf, n - 1).otherwise(n)
    Seq(
      "name_prefix" -> when(hasPre, element_at(toks, 1)),
      "first_p" -> when(endI > startI, element_at(toks, startI)),
      "middle_p" -> when(endI - startI >= 2,
        array_join(slice(toks, startI + 1, endI - startI - 1), " ")),
      "last_p" -> when(endI >= startI, element_at(toks, endI)),
      "suffix_std" -> when(hasSuf, standardizeSuffix(element_at(toks, n))))
  }

  /** DuckDB CTE chain `<rel>_parsed` with identical semantics to
    * [[parseName]] over `rel(…, full_name)`: carries every column of
    * `rel` plus the five parsed components.
    */
  def parseNameSqlCte(rel: String): String = {
    val pre = namePrefixes.map(p => s"'$p'").mkString(", ")
    val suf = nameSuffixes.map(s0 => s"'$s0'").mkString(", ")
    s"""${rel}_tok AS (
       |  SELECT *, regexp_split_to_array(trim(replace(upper(full_name), '.', '')), ' +') AS toks
       |  FROM $rel),
       |${rel}_dim AS (
       |  SELECT *, len(toks) AS n,
       |         CASE WHEN toks[1] IN ($pre) THEN 2 ELSE 1 END AS si
       |  FROM ${rel}_tok),
       |${rel}_dim2 AS (
       |  SELECT *, CASE WHEN toks[n] IN ($suf) AND n > si THEN n - 1 ELSE n END AS ei
       |  FROM ${rel}_dim),
       |${rel}_parsed AS (
       |  SELECT * EXCLUDE (toks, n, si, ei),
       |         CASE WHEN si = 2 THEN toks[1] END AS name_prefix,
       |         CASE WHEN ei > si THEN toks[si] END AS first_p,
       |         CASE WHEN ei - si >= 2 THEN array_to_string(toks[si+1:ei-1], ' ') END AS middle_p,
       |         CASE WHEN ei >= si THEN toks[ei] END AS last_p,
       |         CASE WHEN ei = n - 1 THEN ${standardizeSuffixSql("toks[n]")} END AS suffix_std
       |  FROM ${rel}_dim2)""".stripMargin
  }
}
