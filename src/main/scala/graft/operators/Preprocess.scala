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
}
