package graft.queries

import graft.QueryDef
import graft.functions.{GraftFunctions, Phonetics}
import graft.linkage._
import graft.operators.Preprocess
import graft.ops.Lineage
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.D — the Fellegi-Sunter linkage engine (flagship). Two deterministic
  * sides derive from `persons`:
  *
  *  - `census` (the reference file, keyed pik): clean names, 80% coverage
  *    (k%5 != 4); its address is STALE for moved households and for the
  *    individually-stale classes (admin data lags the input file).
  *  - `input` (the messy input file, keyed rec_id): noisy names, current
  *    addresses, plus planted noise classes that each exercise one cascade
  *    mechanism (see below). Ground truth is pik == rec_id.
  *
  * The PVS-style cascade mirrors the reference's FULL 15-pass inventory
  * (/root/reference/03_link_datasets.ipynb cells 83-142):
  * geosearch (cut zip3, scores geokey): geokey → geokey+name-switch →
  * house-number+street-Soundex → street-Soundex+name-switch → name2+yob;
  * namesearch (cut initial categories): DOB+NYSIIS → DOB+initials →
  * yob+name2 → bday+name2; dobsearch (cut day+month): initials+name-switch
  * → name3 → reverse-Soundex → first2+yob; hhcomp: initials → yob.
  * Probable-GQ geokeys are nulled out of every blocking column first
  * (reference "HACK: Remove address information from GQ", cells 31-33) —
  * both a correctness feature and the defusal of the worst blocking skew.
  *
  * Planted noise classes (input side), each recovered by exactly the pass
  * the reference added for it:
  *  - k%13: wrong DOB day           → geokey pass scores through it
  *  - k%17: zip typo                → street-Soundex pass (zip3 cut holds)
  *  - k%23: first/last switched + bumped DOB day+month → geokey name-switch
  *    pass (the DOB noise keeps the plain geokey pass from scoring through
  *    swapped names on address+DOB alone)
  *  - k%29 (N): post-initial vowel swap in both names + stale census
  *    address → DOB+NYSIIS pass (NYSIIS folds vowels)
  *  - k%19 (V): first letter swapped within its Soundex code class in both
  *    names + stale census address → reverse-Soundex pass
  *  - moved households ∧ k%4==1 (Ha): clean names, yob+1 and month bumped →
  *    hhcomp initials pass
  *  - moved households ∧ k%4==2 (Hb): first char of first name
  *    dropped, day+month bumped → hhcomp yob pass
  *  - k%47 (SwZ): transposed names AND the zip typo → street-Soundex
  *    name-switch pass (geokey broken, so neither geokey pass blocks; the
  *    bumped Sw DOB day+month keeps the dobsearch initials-switch cut out)
  *  - k%31 (SwD): transposed clean names, DOB intact, stale census
  *    address → dobsearch initials+name-switch pass
  *  - k%43 (L): last name reversed wholesale (remarriage-style), first
  *    name and DOB clean, stale census address → dobsearch first2+yob pass
  *
  * Everything — sides, passes, model — renders to BOTH Spark plans and
  * DuckDB SQL from the same config objects, so the full 15-pass cascade
  * (including the phonetic keys) is hash-verified against the oracle.
  */
object LinkageQueries {

  // ---- the model (shared by all queries + the oracle SQL) ----------------

  /** The full Splink settings (reference cell 62): truncated-name JW at
    * 750/900 with an exact level first (jaro_winkler_at_thresholds on
    * first_name_15 / last_name_12), exact middle initial, DOB
    * day/month/year numeric comparisons with inexact windows 5/3/5
    * (numeric_column_comparison), and a whole-geokey JW comparison at
    * 650/900. Either side NULL → Splink's null_level (gamma -1, weight 0).
    * m/u are fixed here — the reference trains them with EM, machinery
    * q30/q31 reproduce; u values track the synthetic pools'
    * random-agreement rates (day uniform 1..28 → exact u ≈ 1/28, etc.).
    */
  val comparisons: Seq[Comparison] = Seq(
    Comparison("first", "fn15",
      Seq(ComparisonLevel(ExactMatch, 0.70, 0.01),
        ComparisonLevel(JwAtLeast(750.0 / 900.0), 0.20, 0.05)), 0.10, 0.94),
    Comparison("last", "ln12",
      Seq(ComparisonLevel(ExactMatch, 0.65, 0.02),
        ComparisonLevel(JwAtLeast(750.0 / 900.0), 0.20, 0.04)), 0.15, 0.94),
    Comparison("mid", "middle_initial",
      Seq(ComparisonLevel(ExactMatch, 0.90, 0.05)), 0.10, 0.95),
    Comparison("bday", "dob_day",
      Seq(ComparisonLevel(ExactMatch, 0.85, 0.036),
        ComparisonLevel(AbsDiffAtMost(5), 0.10, 0.32)), 0.05, 0.644),
    Comparison("bmonth", "dob_month",
      Seq(ComparisonLevel(ExactMatch, 0.90, 0.083),
        ComparisonLevel(AbsDiffAtMost(3), 0.07, 0.45)), 0.03, 0.467),
    Comparison("byear", "dob_year",
      Seq(ComparisonLevel(ExactMatch, 0.90, 0.017),
        ComparisonLevel(AbsDiffAtMost(5), 0.05, 0.16)), 0.05, 0.823),
    Comparison("geo", "geokey",
      Seq(ComparisonLevel(ExactMatch, 0.60, 0.002),
        ComparisonLevel(JwAtLeast(650.0 / 900.0), 0.15, 0.01)), 0.25, 0.988))

  /** Cascade modules outside geosearch don't score the geokey comparison
    * (reference matching_columns, cells 101/114/138).
    */
  private val noGeo = Set("geo")

  /** Name-switch remap: output column := source column. The truncations are
    * taken from the OPPOSITE name's same-length truncation (fn15 := ln15,
    * not ln12) — the reference re-runs add_truncated_name_cols after
    * switch_first_and_last_names, so a swapped fn15 is a 15-char cut of the
    * swapped first name, never a 12-char one. Phonetic/prefix keys swap
    * pairwise for the same reason.
    */
  private val switchNames = Map(
    "first_name" -> "last_name", "last_name" -> "first_name",
    "fn15" -> "ln15", "ln12" -> "fn12",
    "fn12" -> "ln12", "ln15" -> "fn15",
    "fn1" -> "ln1", "ln1" -> "fn1",
    "fn2" -> "ln2", "ln2" -> "fn2",
    "fn3" -> "ln3", "ln3" -> "fn3",
    "cut_first" -> "cut_last", "cut_last" -> "cut_first",
    "nys_first" -> "nys_last", "nys_last" -> "nys_first",
    "rsdx_first" -> "rsdx_last", "rsdx_last" -> "rsdx_first")

  /** hhcompsearch scores its cut (being in the bridged household) as a
    * fixed Bayes factor of 1000 (reference cell 138,
    * bayes_factor_cut_columns=1_000).
    */
  val hhWeightOffset: Double = math.log(1000.0) / math.log(2.0)

  /** Blocking on geokey_blk implies the geokey comparison's exact level
    * (geokey_blk = geokey wherever non-null), so p1/p2 pin gamma_geo to 2
    * instead of evaluating the whole-geokey JW — the most expensive scalar
    * in the model — over every candidate pair.
    */
  private val geoExact = Map("geo" -> 2)

  /** The full reference pass inventory — 13 non-household passes in the
    * reference's order (03_link_datasets.ipynb cells 85-122), plus the two
    * hhcomp passes below. Geosearch passes (p1-p4b) score the geokey
    * comparison (module matching_columns include geokey, cell 83);
    * namesearch passes (p5-p7) carry the module's first/last-initial cut
    * columns (cell 101 cut_columns) and dobsearch passes (p7b-p8b) the
    * day+month cuts (cell 114), both rendered as extra blocking equalities
    * exactly like the reference composes cut_columns into every pass.
    */
  val passes: Seq[BlockingPass] = Seq(
    // geosearch (cut zip3; scores geokey; searches the GeoBase file)
    BlockingPass("p1_geokey", Seq("geokey_blk"), constGammas = geoExact,
      ref = "geobase"),
    BlockingPass("p2_geokey_switch", Seq("geokey_blk"), rightRemap = switchNames,
      constGammas = geoExact, ref = "geobase"),
    BlockingPass("p3_street_sdx", Seq("street_num_blk", "sdx_street_blk"),
      cuts = Seq("zip3"), ref = "geobase"),
    BlockingPass("p3b_street_sdx_switch", Seq("street_num_blk", "sdx_street_blk"),
      rightRemap = switchNames, cuts = Seq("zip3"), ref = "geobase"),
    BlockingPass("p4_name_yob", Seq("fn2", "ln2", "dob_year"), ref = "geobase"),
    // namesearch (cut first/last-initial categories; no geokey scoring;
    // searches the Name/DOB Reference File)
    BlockingPass("p5_dob_nysiis",
      Seq("dob_year", "dob_month", "dob_day", "nys_first", "nys_last"),
      cuts = Seq("cut_first", "cut_last"), excludeComparisons = noGeo,
      ref = "namedob"),
    BlockingPass("p6_dob_initials",
      Seq("dob_year", "dob_month", "dob_day", "fn1", "ln1"),
      cuts = Seq("cut_first", "cut_last"), excludeComparisons = noGeo,
      ref = "namedob"),
    BlockingPass("p6b_yob_name", Seq("fn2", "ln2", "dob_year"),
      cuts = Seq("cut_first", "cut_last"), excludeComparisons = noGeo,
      ref = "namedob"),
    BlockingPass("p7_bday_name", Seq("dob_month", "dob_day", "fn2", "ln2"),
      cuts = Seq("cut_first", "cut_last"), excludeComparisons = noGeo,
      ref = "namedob"),
    // dobsearch (cut day+month; no geokey scoring; searches the Name/DOB
    // Reference File)
    BlockingPass("p7b_initials_switch", Seq("fn1", "ln1"), rightRemap = switchNames,
      cuts = Seq("dob_day", "dob_month"), excludeComparisons = noGeo,
      ref = "namedob"),
    BlockingPass("p7c_name3", Seq("fn3", "ln3"),
      cuts = Seq("dob_day", "dob_month"), excludeComparisons = noGeo,
      ref = "namedob"),
    BlockingPass("p8_rev_sdx", Seq("rsdx_first", "rsdx_last"),
      cuts = Seq("dob_day", "dob_month"), excludeComparisons = noGeo,
      ref = "namedob"),
    BlockingPass("p8b_fn2_yob", Seq("fn2", "dob_year"),
      cuts = Seq("dob_day", "dob_month"), excludeComparisons = noGeo,
      ref = "namedob"))

  val hhPasses: Seq[BlockingPass] = Seq(
    BlockingPass("p9_hh_initials", Seq("hh_geokey", "fn1", "ln1"),
      weightOffset = hhWeightOffset, excludeComparisons = noGeo),
    BlockingPass("p10_hh_yob", Seq("hh_geokey", "dob_year"),
      weightOffset = hhWeightOffset, excludeComparisons = noGeo))

  val config: LinkageConfig = LinkageConfig(comparisons, lambda = 0.5,
    thresholdWeight = 9.0, passes = passes, hhPasses = hhPasses)

  /** The Movers module's unit-search pass (reference 03 cell 99): members
    * of eligible households block on person attributes ONLY ("without
    * regard for address" — Alexander et al. p. 6), score without the geo
    * comparison, and carry the hhcomp-style fixed Bayes-factor offset;
    * the household-as-a-unit constraint lives in
    * [[graft.linkage.LinkageCascade.moversStage]].
    */
  val moversPass: BlockingPass = BlockingPass("p11_movers",
    Seq("dob_year", "dob_month", "dob_day", "ln1"),
    excludeComparisons = noGeo, weightOffset = hhWeightOffset)

  /** ZIP3 Adjacency Search (reference 03 cell 98; two passes per Layne/
    * Wagner/Rothhaas App. A): the geosearch street-soundex passes re-run
    * with the zip3 cut widened to the adjacency neighborhood (the small
    * cascade-remainder side explodes via
    * [[graft.linkage.LinkageCascade.zip3Adjacent]]; the reference file
    * keeps its natural size).
    */
  val zip3AdjPasses: Seq[BlockingPass] = Seq(
    BlockingPass("z1_street_sdx_zip3adj", Seq("street_num_blk", "sdx_street_blk"),
      cuts = Seq("zip3"), ref = "geobase"),
    BlockingPass("z2_street_sdx_switch_zip3adj",
      Seq("street_num_blk", "sdx_street_blk"),
      rightRemap = switchNames, cuts = Seq("zip3"), ref = "geobase"))

  /** MAFMatch (reference 03 cell 24, Wagner & Layne p. 11): records match
    * the Master Address File on the address WITHOUT its zipcode, minting a
    * MAFID that then serves as a blocking key — two different renderings
    * (e.g. a zip typo) of one physical address block together even though
    * their geokeys differ.
    */
  val mafPass: BlockingPass = BlockingPass("p12_mafmatch", Seq("mafid"))

  val blockPass: BlockingPass = BlockingPass("zip3_block", Seq("zip3"))

  /** Block-key column → the comparison it conditions. An EM training
    * session must not estimate m for a comparison its blocking keys pin:
    * the blocked population is degenerate in it (see the degenerate-mode
    * doc on [[LinkageCascade.emTrainMMulti]] — a zip3/geokey block is
    * dominated by same-area/same-household pairs, so the geokey comparison
    * makes EM latch onto "same household" as the match class; a dob_year
    * key makes every pair agree exactly on byear). Mirrors Splink's
    * estimate-everything-except-the-blocked-columns sessions (reference
    * 03_link_datasets.ipynb cells 67/70).
    */
  private val keyConditions: Map[String, String] = Map(
    "zip3" -> "geo", "geokey_blk" -> "geo", "street_num_blk" -> "geo",
    "sdx_street_blk" -> "geo", "hh_geokey" -> "geo",
    "fn1" -> "first", "fn2" -> "first", "fn3" -> "first", "fn15" -> "first",
    "nys_first" -> "first", "rsdx_first" -> "first", "cut_first" -> "first",
    "ln1" -> "last", "ln2" -> "last", "ln3" -> "last", "ln12" -> "last",
    "nys_last" -> "last", "rsdx_last" -> "last", "cut_last" -> "last",
    "dob_year" -> "byear", "dob_month" -> "bmonth", "dob_day" -> "bday")

  /** The comparisons a training pass with these block keys must exclude. */
  def emExclusions(keys: Seq[String]): Set[String] =
    keys.flatMap(keyConditions.get).toSet

  /** The two EM training sessions (reference trains on first_name_15+zipcode
    * and geokey; ours block zip3 and fn2+dob_year over the synthetic sides),
    * each excluding exactly the comparisons its blocking implies.
    */
  val emPasses: Seq[BlockingPass] = Seq(
    BlockingPass("em_zip3", Seq("zip3")),
    BlockingPass("em_name_yob", Seq("fn2", "dob_year"))
  ).map(p => p.copy(excludeComparisons = emExclusions(p.keys)))

  // ---- planted-noise transforms (Spark + SQL in lockstep) ----------------

  /** Replace the first vowel after position 1 with a different vowel —
    * breaks fn2/ln2/prefix keys while leaving every phonetic key intact
    * (NYSIIS folds vowels to A; soundex drops them).
    */
  private def vowelMangle(c: Column): Column = {
    val v = regexp_extract(c, "^.[^AEIOU]*([AEIOU])", 1)
    val nv = when(v === "A", lit("E")).otherwise(lit("A"))
    when(v === "", c).otherwise(
      replace(regexp_replace(c, "^(.[^AEIOU]*)[AEIOU]", "$1#"), lit("#"), nv))
  }

  private def vowelMangleSql(x: String): String = {
    val v = s"regexp_extract($x, '^.[^AEIOU]*([AEIOU])', 1)"
    s"CASE WHEN $v = '' THEN $x ELSE replace(regexp_replace($x, " +
      s"'^(.[^AEIOU]*)[AEIOU]', '\\1#', 'g'), '#', " +
      s"CASE WHEN $v = 'A' THEN 'E' ELSE 'A' END) END"
  }

  /** Swap the first letter within its soundex code class (C↔S, G↔J, M↔N,
    * B↔P, D↔T, F↔V, W↔H, vowel↔vowel, K→X): forward keys (initials, fn2,
    * NYSIIS, forward soundex) break; REVERSE soundex is invariant.
    */
  private val lmFrom = "GJCSKMNBPDTFVWHAEIOU"
  private val lmTo = "JGSCXNMPBTDVFHWEAOIA"

  private def letterMangle(c: Column): Column =
    concat(translate(substring(c, 1, 1), lmFrom, lmTo), substring(c, 2, Int.MaxValue))

  private def letterMangleSql(x: String): String =
    s"(translate(substr($x, 1, 1), '$lmFrom', '$lmTo') || substr($x, 2))"

  // ---- the two sides (Spark + CTE in lockstep) ---------------------------

  private val sideCols: Seq[String] = Seq(
    "first_name", "last_name", "middle_initial",
    "dob_year", "dob_month", "dob_day",
    "zipcode", "zip3", "fn1", "fn2", "fn3", "ln1", "ln2", "ln3",
    "fn15", "ln12", "fn12", "ln15", "cut_first", "cut_last",
    "nys_first", "nys_last", "rsdx_first", "rsdx_last",
    "geokey", "geokey_blk", "street_num_blk", "sdx_street_blk")

  private val inputCols: Seq[String] = "rec_id" +: sideCols

  /** Adds the derived key columns shared by both sides: zip3, name
    * prefixes, phonetic keys, street soundex, geokey. Expects first_name,
    * last_name, street_num, street_std, unit_std, city, state, zipcode.
    */
  /** The first-name-derived key columns, split out so nickname alternate
    * rows recompute EXACTLY these after replacing first_name (mirrors the
    * reference re-deriving name columns on the expanded frame).
    */
  private def deriveFirst(df: DataFrame): DataFrame =
    df.withColumn("fn1", substring(col("first_name"), 1, 1))
      .withColumn("fn2", substring(col("first_name"), 1, 2))
      .withColumn("fn3", substring(col("first_name"), 1, 3))
      .withColumn("fn15", substring(col("first_name"), 1, 15))
      .withColumn("fn12", substring(col("first_name"), 1, 12))
      .withColumn("cut_first", Preprocess.initialCut(substring(col("first_name"), 1, 1)))
      .withColumn("nys_first", Phonetics.nysKey(col("first_name")))
      .withColumn("rsdx_first", Phonetics.rsdx(col("first_name")))

  /** Both names' derived key columns (no address columns) — the subset a
    * Name/DOB Reference File row needs (namesearch/dobsearch block on
    * name+DOB keys only).
    */
  private def deriveNames(df: DataFrame): DataFrame =
    deriveFirst(df)
      .withColumn("ln1", substring(col("last_name"), 1, 1))
      .withColumn("ln2", substring(col("last_name"), 1, 2))
      .withColumn("ln3", substring(col("last_name"), 1, 3))
      .withColumn("ln12", substring(col("last_name"), 1, 12))
      .withColumn("ln15", substring(col("last_name"), 1, 15))
      .withColumn("cut_last", Preprocess.initialCut(substring(col("last_name"), 1, 1)))
      .withColumn("nys_last", Phonetics.nysKey(col("last_name")))
      .withColumn("rsdx_last", Phonetics.rsdx(col("last_name")))

  private def derive(df: DataFrame): DataFrame =
    deriveNames(df)
      .withColumn("zip3", substring(col("zipcode"), 1, 3))
      .withColumn("sdx_street", Phonetics.sdx(col("street_std")))
      .withColumn("geokey", Preprocess.geokey(col("street_num"),
        col("street_std"), col("unit_std"), col("city"), col("state"),
        col("zipcode")))

  /** Null the blocking views of the address for probable-GQ geokeys
    * (reference cells 31-33), then project the final side columns.
    */
  private def finish(base: DataFrame, gq: DataFrame, idCol: String): DataFrame =
    base.join(gq, Seq("geokey"), "left")
      .withColumn("geokey_blk", when(col("is_gq").isNull, col("geokey")))
      .withColumn("street_num_blk", when(col("is_gq").isNull, col("street_num")))
      .withColumn("sdx_street_blk", when(col("is_gq").isNull, col("sdx_street")))
      .select((idCol +: sideCols).map(col): _*)

  private def std(c: Column): Column = Preprocess.standardizeAddressPart(c)

  /** Swap the first two characters (class-Z3 noise): breaks fn1/fn2/fn3,
    * NYSIIS, and the initial cut while Jaro-Winkler (transposition-
    * tolerant) keeps the comparison near its close level.
    */
  private def swapFirstTwo(c: Column): Column =
    concat(substring(c, 2, 1), substring(c, 1, 1), substring(c, 3, 64))

  private def swapFirstTwoSql(x: String): String =
    s"(substr($x, 2, 1) || substr($x, 1, 1) || substr($x, 3))"

  /** Cross a zip3 boundary (+100 on the 5-digit zip; -100 at the top of
    * the range so the result stays 5 digits) — the class-Z3 planted move:
    * zip3 shifts by exactly ±1, street/city/state unchanged.
    */
  private def zipBumpZip3(z: Column): Column =
    (z.cast("int") +
      when(z.cast("int") >= 99900, lit(-100)).otherwise(lit(100)))
      .cast("string")

  private def zipBumpZip3Sql(x: String): String =
    s"CAST(CAST($x AS INTEGER) + (CASE WHEN CAST($x AS INTEGER) >= 99900 " +
      s"THEN -100 ELSE 100 END) AS VARCHAR)"

  /** The canonical first names the nickname file can expand back to. */
  private val nickCanonicals: Seq[String] = Preprocess.nicknames.map(_._1)

  /** canonical → nickname as a scalar CASE (used to PLANT class-K noise;
    * the cascade's expansion goes the other way via the nickname table).
    */
  private def nickOf(c: Column): Column =
    Preprocess.nicknames.foldLeft(Option.empty[Column]) {
      case (acc, (canon, nick)) =>
        Some(acc.fold(when(c === canon, nick))(_.when(c === canon, nick)))
    }.get.otherwise(c)

  private def nickOfSql(x: String): String = {
    val cases = Preprocess.nicknames
      .map { case (canon, nick) => s"WHEN '$canon' THEN '$nick'" }
      .mkString(" ")
    s"CASE $x $cases ELSE $x END"
  }

  /** Fake-name null-out (reference "Pre-processing": fake names are nulled
    * before blocking): a placeholder name carries no identifying evidence,
    * so it routes comparisons to the null level (gamma -1, weight 0)
    * instead of a heavy disagreement penalty.
    */
  private def nullPlaceholder(c: Column): Column =
    when(c.isin(Preprocess.placeholderNames: _*), lit(null).cast("string"))
      .otherwise(c)

  /** Messy input file: current addresses (plus the k%17 zip typo), noisy
    * names/DOB per the planted classes. Still carries housing_type for the
    * probable-GQ aggregation. Two classes exercise the reference's
    * preprocessing wiring (both avoid every other class, moved households,
    * and for F also zip typos/GQ, so exactly one mechanism recovers each):
    *  - k%37 (F): the FIRST name is the placeholder "UNKNOWN" (the last
    *    name is real) and DOB day+month are bumped. The fake-name null-out
    *    routes the first-name comparison to the Splink null level (gamma
    *    -1, weight 0) instead of a ~-3.2 hard-disagreement penalty —
    *    exactly the reference's per-column null-out (cell 21 loops over
    *    first_name, last_name separately). p1 recovers them on geokey.
    *  - k%59 (F2): BOTH names are placeholders. After the null-out the
    *    record has no name data, and the reference's insufficient-
    *    information edit (cell 26) DROPS it before linking — these records
    *    never enter any pass and stay unPIKed.
    *  - k%41 (K): the first name arrives as a NICKNAME of the canonical
    *    (BILL for WILLIAM) and the census address is stale, so no address
    *    pass blocks and no phonetic/prefix key of the nickname matches.
    *    Only the nickname-expanded alternate row (canonical first name)
    *    can block in p4_name_yob.
    */
  /** Persons + the class-membership flags, computed ONCE each. The big
    * CASE projections in [[inputPre]]/[[censusPre]] reference the boolean
    * ATTRIBUTES: inlining the pmod-trees into every branch of every output
    * column (7 classes × 6 columns, on top of the persons synthesis and
    * the regex-heavy mangle/standardize expressions in ONE fused
    * whole-stage) blew the generated processNext() past Janino's 64 KB
    * method limit — codegen failed, the entire synthetic-side build fell
    * back to interpreted evaluation, and every warmup action re-attempted
    * (and re-failed) the multi-second compile. sides() CACHES this frame so
    * the downstream projections sit directly on a row-producing scan,
    * where Spark's expression method-splitting works (after any fused
    * projection, values live in codegen locals and splitting is disabled).
    */
  private def flaggedPersons(s: SparkSession, d: String): DataFrame = {
    val k = col("k")
    val isN0 = pmod(k, lit(29)) === 0
    val isV0 = pmod(k, lit(19)) === 0 && !isN0
    val hhm = People.householdMoved(col("hh"))
    val isF0 = pmod(k, lit(37)) === 0 && !isN0 && !isV0 && !hhm &&
      pmod(k, lit(23)) =!= 0 && pmod(k, lit(17)) =!= 0 && pmod(k, lit(200)) >= 20
    val isK0 = pmod(k, lit(41)) === 0 && !isN0 && !isV0 && !hhm &&
      pmod(k, lit(23)) =!= 0 && pmod(k, lit(37)) =!= 0 &&
      col("first_name").isin(nickCanonicals: _*)
    val isHa0 = hhm && pmod(k, lit(4)) === 1 && !isN0 && !isV0
    val isHb0 = hhm && pmod(k, lit(4)) === 2 && !isN0 && !isV0
    val isSw0 = pmod(k, lit(23)) === 0 && !isN0 && !isV0 &&
      !(hhm && (pmod(k, lit(4)) === 1 || pmod(k, lit(4)) === 2))
    // SwZ (geosearch street-switch): transposed messy names + zip typo +
    // the Sw DOB bumps. The broken zip keeps both geokey passes from
    // blocking, the transposition keeps the plain street pass below
    // threshold, and the bumped day+month keeps the dobsearch
    // initials-switch cut out — p3b is the only recoverer.
    val isSwz0 = pmod(k, lit(47)) === 0 && !isN0 && !isV0 && !hhm &&
      pmod(k, lit(23)) =!= 0 && pmod(k, lit(37)) =!= 0 && pmod(k, lit(41)) =!= 0 &&
      pmod(k, lit(200)) >= 20
    // SwD (dobsearch initials-switch): names transposed CLEAN, DOB intact,
    // census address stale — only the swapped-initials blocking with the
    // day+month cut can reach these.
    val isSwd0 = pmod(k, lit(31)) === 0 && !isN0 && !isV0 && !hhm &&
      pmod(k, lit(23)) =!= 0 && pmod(k, lit(37)) =!= 0 &&
      pmod(k, lit(41)) =!= 0 && pmod(k, lit(47)) =!= 0 &&
      pmod(k, lit(17)) =!= 0 && pmod(k, lit(13)) =!= 0
    // L (dobsearch fn2+yob): last name replaced wholesale (reversed —
    // breaks ln1/ln2/ln3, NYSIIS, forward and reverse Soundex), first name
    // and DOB clean, census address stale — only fn2+yob blocking reaches
    // these, and the weight survives one full-disagreement name.
    val isL0 = pmod(k, lit(43)) === 0 && !isN0 && !isV0 && !hhm &&
      pmod(k, lit(23)) =!= 0 && pmod(k, lit(37)) =!= 0 &&
      pmod(k, lit(41)) =!= 0 && pmod(k, lit(31)) =!= 0 &&
      pmod(k, lit(47)) =!= 0 &&
      pmod(k, lit(17)) =!= 0 && pmod(k, lit(13)) =!= 0
    // F2 (insufficient information): BOTH names are placeholders, so after
    // the fake-name null-out the record has no name data at all and the
    // reference DROPS it before linking (03_link_datasets.ipynb cell 26:
    // keep first_name notnull OR last_name notnull). Mutually exclusive
    // with every other class by construction.
    val isF20 = pmod(k, lit(59)) === 0 && !isN0 && !isV0 && !hhm &&
      pmod(k, lit(23)) =!= 0 && pmod(k, lit(37)) =!= 0 &&
      pmod(k, lit(41)) =!= 0 && pmod(k, lit(47)) =!= 0 &&
      pmod(k, lit(31)) =!= 0 && pmod(k, lit(43)) =!= 0 &&
      pmod(k, lit(200)) >= 20
    // M (married-name class, recovered ONLY through the Name/DOB Reference
    // File): FIRST name clean, LAST name the MARRIED surname — a string
    // that exists nowhere on the census PRIMARY row but IS the reference
    // side's era-1 refile (People.marriedLast, the k%21 alternate-name
    // subset) — dob_year bumped (+1) so p4's fn2+ln2+yob block and every
    // yob-keyed namesearch/dobsearch block miss, census address stale so
    // geosearch misses. p7_bday_name (dob_month+dob_day+fn2+ln2) blocks
    // them against the reference file's married alternate row. Excludes
    // k%13 (would bump the day and break p7's dob_day key) and k%17 (zip
    // typo — kept out so the class is pure).
    val isM0 = pmod(k, lit(21)) === 0 && !isN0 && !isV0 && !hhm &&
      pmod(k, lit(23)) =!= 0 && pmod(k, lit(37)) =!= 0 &&
      pmod(k, lit(41)) =!= 0 && pmod(k, lit(47)) =!= 0 &&
      pmod(k, lit(31)) =!= 0 && pmod(k, lit(43)) =!= 0 &&
      pmod(k, lit(59)) =!= 0 && pmod(k, lit(13)) =!= 0 && pmod(k, lit(17)) =!= 0
    // Mv (movers, household-level; reference 03 cell 99 quoting Alexander
    // et al. p. 6): EVERY member of an hh%52 regular household (52 = 4·13,
    // so the household is also MOVED — census carries the old address)
    // arrives with a placeholder FIRST name and clean last/DOB. The
    // null-out removes the first name, so every first-keyed block misses,
    // geosearch misses on the stale address, and hhcomp never bridges
    // (zero members link, so the household contributes no bridge row) —
    // only a household-as-a-unit search (q128_movers) can recover them.
    // Takes precedence over every member-level class (branch order).
    // Every ODD-indexed moved household (regular moved households are
    // exactly the hh%52 multiples — lcm(4, 13) — so taking them ALL would
    // leave hhcompsearch nothing to recover; the odd half is movers', the
    // even half stays hhcomp's).
    val isMv0 = pmod(col("hh"), lit(52)) === 0 &&
      pmod(col("hh"), lit(200)) =!= 0 &&
      pmod((col("hh") / 52).cast("long"), lit(2)) === 1
    // Z3 (cross-zip3 short-distance mover; reference 03 cell 98, the ZIP3
    // Adjacency module of Layne/Wagner/Rothhaas App. A): zipcode crosses a
    // zip3 boundary (+100), first name transposed (first two chars
    // swapped), DOB day bumped — geokey and the exact-zip3 street cut
    // miss, every namesearch/dobsearch key or cut is broken, and the
    // census address is CURRENT (class excludes moved households), so
    // only a zip3-adjacent street-soundex pass (q129) can block them.
    // Disjoint from every other class by construction.
    val isZ30 = pmod(k, lit(61)) === 0 && !isN0 && !isV0 && !hhm && !isMv0 &&
      pmod(k, lit(23)) =!= 0 && pmod(k, lit(37)) =!= 0 &&
      pmod(k, lit(41)) =!= 0 && pmod(k, lit(47)) =!= 0 &&
      pmod(k, lit(31)) =!= 0 && pmod(k, lit(43)) =!= 0 &&
      pmod(k, lit(59)) =!= 0 && pmod(k, lit(21)) =!= 0 &&
      pmod(k, lit(17)) =!= 0 && pmod(k, lit(200)) >= 20
    // Census staleness: moved households, the N/V classes, and the
    // K/SwD/L/M classes (stale admin data keeps address passes from
    // recovering them first).
    val stale0 = hhm || isN0 || pmod(k, lit(19)) === 0 || isK0 || isSwd0 || isL0 || isM0
    People.persons(s, d).select(col("*"),
      isN0.as("is_n"), isV0.as("is_v"), isF0.as("is_f"), isK0.as("is_k"),
      isHa0.as("is_ha"), isHb0.as("is_hb"), isSw0.as("is_sw"),
      isSwz0.as("is_swz"), isSwd0.as("is_swd"), isL0.as("is_l"),
      isF20.as("is_f2"), isM0.as("is_m"), isMv0.as("is_mv"),
      isZ30.as("is_z3"), stale0.as("is_stale"))
  }

  private def inputPre(flagged: DataFrame): DataFrame = {
    val k = col("k")
    val isN = col("is_n"); val isV = col("is_v"); val isF = col("is_f")
    val isK = col("is_k"); val isHa = col("is_ha"); val isHb = col("is_hb")
    val isSw = col("is_sw"); val isSwz = col("is_swz")
    val isSwd = col("is_swd"); val isL = col("is_l"); val isF2 = col("is_f2")
    val isM = col("is_m"); val isMv = col("is_mv"); val isZ3 = col("is_z3")
    val pre = flagged.select(
      k.as("rec_id"),
      when(isMv, lit("UNKNOWN"))
        .when(isZ3, swapFirstTwo(col("first_name")))
        .when(isN, vowelMangle(col("first_name")))
        .when(isV, letterMangle(col("first_name")))
        .when(isF || isF2, lit("UNKNOWN"))
        .when(isK, nickOf(col("first_name")))
        .when(isHa, col("first_name"))
        .when(isHb, substring(col("first_name"), 2, Int.MaxValue))
        .when(isSw || isSwz, col("messy_last"))
        .when(isSwd, col("last_name"))
        .when(isL || isM, col("first_name"))
        .otherwise(col("messy_first")).as("first_name"),
      when(isMv || isZ3, col("last_name"))
        .when(isN, vowelMangle(col("last_name")))
        .when(isV, letterMangle(col("last_name")))
        .when(isF2, lit("UNKNOWN"))
        .when(isF || isK || isHa || isHb, col("last_name"))
        .when(isSw || isSwz, col("messy_first"))
        .when(isSwd, col("first_name"))
        .when(isL, reverse(col("last_name")))
        .when(isM, People.marriedLast(k))
        .otherwise(col("messy_last")).as("last_name"),
      col("middle_initial"),
      when(isMv || isZ3, col("dob_year"))
        .when(isHa || isM, col("dob_year") + 1).otherwise(col("dob_year"))
        .cast("int").as("dob_year"),
      when(isMv || isZ3, col("dob_month"))
        .when(isHa || isHb || isSw || isSwz || isF, pmod(col("dob_month"), lit(12)) + 1)
        .otherwise(col("dob_month")).cast("int").as("dob_month"),
      when(isMv, col("dob_day"))
        .when(isZ3, pmod(col("dob_day"), lit(28)) + 1)
        .when(isHb || isSw || isSwz || isF, pmod(col("dob_day"), lit(28)) + 1)
        .when(isN || isV || isHa || isK || isSwd || isL, col("dob_day"))
        .when(pmod(k, lit(13)) === 0, pmod(col("dob_day"), lit(28)) + 1)
        .otherwise(col("dob_day")).cast("int").as("dob_day"),
      col("street_num"),
      std(col("street_raw")).as("street_std"),
      std(col("unit_raw")).as("unit_std"),
      col("city"), col("state"),
      when(isMv, col("zipcode"))
        .when(isZ3, zipBumpZip3(col("zipcode")))
        .when(pmod(k, lit(17)) === 0 || isSwz,
          concat(substring(col("zipcode"), 1, 3), lit("99")))
        .otherwise(col("zipcode")).as("zipcode"),
      col("housing_type"))
    // Fake-name null-out runs FIRST among the preprocessing steps (a
    // placeholder is not a name, so it must not feed nickname expansion or
    // any derived key). Then the reference's insufficient-information edit
    // (cell 26): a record with NO name data left cannot be linked with any
    // confidence and is dropped before the search modules.
    pre
      .withColumn("first_name", nullPlaceholder(col("first_name")))
      .withColumn("last_name", nullPlaceholder(col("last_name")))
      .filter(col("first_name").isNotNull || col("last_name").isNotNull)
  }

  /** Clean reference file (80% coverage): names exact; the address is the
    * household's PREVIOUS one for moved households and for the N/V classes
    * (stale admin data).
    */
  private def censusPre(flagged: DataFrame): DataFrame = {
    val p = flagged.filter(pmod(col("k"), lit(5)) =!= 4)
    val stale = col("is_stale")
    val pre = p.select(
      col("k").as("pik"),
      col("first_name"), col("last_name"), col("middle_initial"),
      col("dob_year"), col("dob_month"), col("dob_day"),
      when(stale, col("street_num_old")).otherwise(col("street_num")).as("street_num"),
      std(when(stale, col("street_raw_old")).otherwise(col("street_raw"))).as("street_std"),
      when(stale, lit(null).cast("string")).otherwise(std(col("unit_raw"))).as("unit_std"),
      when(stale, col("city_old")).otherwise(col("city")).as("city"),
      when(stale, col("state_old")).otherwise(col("state")).as("state"),
      when(stale, col("zipcode_old")).otherwise(col("zipcode")).as("zipcode"))
    pre
  }

  /** Probable-GQ geokeys from the input file's noisy housing_type
    * (reference cell 31: sum >= threshold AND mean >= 0.70).
    */
  private def probableGq(ib: DataFrame): DataFrame =
    ib.select(col("geokey"),
        (col("housing_type") =!= "Household").cast("int").as("rgq"))
      .groupBy("geokey")
      .agg(count(lit(1)).as("n"), sum("rgq").as("s"))
      .filter(col("s") >= 3 &&
        round(col("s").cast("double") / col("n").cast("double"), 6) >= 0.7)
      .select(col("geokey"), lit(true).as("is_gq"))

  /** Both sides, derived once per (session, dir) and CACHED: every linkage
    * query (q26–q38) consumes the same preprocessed frames, exactly like
    * the reference persists its preprocessed files once before the search
    * modules (df_ops.persist). Without this, each query re-runs the
    * phonetic/geokey scalar chains and the probable-GQ aggregation — the
    * derivation, not the joins, dominates at bench scale. Only the latest
    * key is kept (switching dir/session unpersists the previous frames).
    *
    * The input base is cached too: it feeds the GQ aggregation AND both
    * finish() joins, and Spark does not share work across those branches
    * without explicit materialization. It is small (one row per input
    * record, scalar columns only).
    */
  private val sideFrames = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String),
      (DataFrame, DataFrame, DataFrame, DataFrame, Seq[DataFrame])]

  private def sides(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    sideFrames.synchronized {
      val key = (s, d)
      val (c, i, nd0, gb0, _) = sideFrames.getOrElse(key, {
        sideFrames.values.foreach(_._5.foreach(_.unpersist()))
        sideFrames.clear()
        // The pre-frames are cached BEFORE derive(): without the barrier,
        // ProjectionCollapse inlines the noise-class CASE/regex trees into
        // every phonetic/prefix column (~8 copies per name), and the
        // resulting mega-expression dominates the derivation cost. The
        // oracle mirrors this with its MATERIALIZED input_pre/census_pre
        // CTEs; at 100 TB these would be persisted intermediate tables.
        // flaggedPersons is cached FIRST so each heavyweight projection
        // (inputPre's class CASEs, censusPre's stale switches, derive's
        // phonetics) compiles as its own stage directly over a scan — the
        // shape whole-stage codegen can method-split (see flaggedPersons).
        // It is also FANNED OUT to the session parallelism: the local
        // bench parquet arrives as 1-2 scan partitions (file < split
        // size), which would run every downstream phonetic/noise
        // projection single-threaded; a cluster scan splits naturally.
        val praw = flaggedPersons(s, d)
          .repartition(s.sessionState.conf.numShufflePartitions).cache()
        val ipre = inputPre(praw).cache()
        val ib = derive(ipre).cache()
        // GQ detection runs on the PRE-expansion frame (one row per input
        // record — alternate rows must not double-count people at a geokey).
        val gq = probableGq(ib).cache()
        // Nickname expansion (reference "Pre-processing": nickname
        // standardization adds alternate-name rows): every record whose
        // first name appears as a nickname gains an extra row carrying the
        // canonical name, with the first-name-derived keys RECOMPUTED from
        // it. Address-derived columns are reused — the expensive
        // standardization/geokey work runs once per record, not per
        // variant. The nickname table is broadcast (tiny dim).
        val nickDim = broadcast(
          s.createDataFrame(Preprocess.nicknames).toDF("canonical", "nickname"))
        val alt = deriveFirst(
          ib.join(nickDim, ib("first_name") === nickDim("nickname"))
            .drop("first_name", "nickname")
            .withColumnRenamed("canonical", "first_name"))
          .select(ib.columns.map(col): _*)
        val ibx = ib.unionByName(alt)
        val cpre = censusPre(praw).cache()
        val in = finish(ibx, gq, "rec_id").cache()
        val cen = finish(derive(cpre), gq, "pik").cache()
        // ---- per-module reference files (the PVS searches FILES, not the
        // raw census: 03_link_datasets.ipynb NameSearch header, 02 cells
        // 62/66/70/84). A census-side numident holds an era-0 clean filing
        // per covered pik plus era-1 refiles: the k%21 subset under the
        // MARRIED surname, the k%6 subset with an alternate DOB day. The
        // same Lineage operators that build q72's file dedupe the
        // alternates and cross name × DOB per pik ("all possible
        // combinations of alternate names and dates of birth"); name keys
        // re-derive on the combined rows like the input side's nickname
        // alternates.
        val n0 = cpre.select(
          concat(lit("cn0_"), col("pik")).as("record_id"), col("pik").as("ssn"),
          col("first_name"), col("last_name"), col("middle_initial"),
          col("dob_year"), col("dob_month"), col("dob_day"))
        val n1 = cpre
          .filter(pmod(col("pik"), lit(21)) === 0 || pmod(col("pik"), lit(6)) === 0)
          .select(
            concat(lit("cn1_"), col("pik")).as("record_id"), col("pik").as("ssn"),
            col("first_name"),
            when(pmod(col("pik"), lit(21)) === 0, People.marriedLast(col("pik")))
              .otherwise(col("last_name")).as("last_name"),
            col("middle_initial"), col("dob_year"), col("dob_month"),
            when(pmod(col("pik"), lit(6)) === 0, pmod(col("dob_day"), lit(28)) + 1)
              .otherwise(col("dob_day")).cast("int").as("dob_day"))
        val cnum = n0.unionByName(n1)
        val (altN, pN) = Lineage.dedupeRawPreservingSourceRecords(
          cnum.select("record_id", "ssn", "first_name", "last_name", "middle_initial"),
          Seq("ssn", "first_name", "last_name", "middle_initial"), "can")
        val (altD, pD) = Lineage.dedupeRawPreservingSourceRecords(
          cnum.select("record_id", "ssn", "dob_year", "dob_month", "dob_day"),
          Seq("ssn", "dob_year", "dob_month", "dob_day"), "cad")
        val (ndrRaw, _) = Lineage.mergePreservingSourceRecords(
          altN, pN, altD, pD, Seq("ssn"), "cndr")
        val nd = deriveNames(ndrRaw.select(
          col("ssn").as("pik"), col("first_name"), col("last_name"),
          col("middle_initial"), col("dob_year"), col("dob_month"), col("dob_day")))
          .cache()
        // GeoBase = the name/DOB file with each pik's (possibly stale)
        // census address keys appended (02 cell 84); the GQ null-out rides
        // in via cen's *_blk columns.
        val gb = nd.join(
          cen.select("pik", "zip3", "geokey", "geokey_blk", "street_num_blk",
            "sdx_street_blk"),
          Seq("pik")).cache()
        val entry = (cen, in, nd, gb,
          Seq(praw, ipre, ib, gq, cpre, in, cen, nd, gb))
        // Dev attribution only (GRAFT_REF_TIMING): force each cached side
        // in dependency order and print its marginal build time.
        if (sys.env.contains("GRAFT_REF_TIMING")) {
          def force(label: String, df: DataFrame): Unit = {
            val t0 = System.nanoTime()
            df.count()
            System.err.println(
              f"SIDES $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
          }
          force("praw", praw); force("cpre", cpre); force("in", in)
          force("cen", cen); force("nd", nd); force("gb", gb)
        }
        sideFrames.put(key, entry)
        entry
      })
      (c, i, nd0, gb0)
    }

  def input(s: SparkSession, d: String): DataFrame = sides(s, d)._2

  def census(s: SparkSession, d: String): DataFrame = sides(s, d)._1

  /** The Name/DOB Reference File frame the namesearch/dobsearch modules
    * search (alternate name × DOB rows per pik, name keys derived).
    */
  def namedob(s: SparkSession, d: String): DataFrame = sides(s, d)._3

  /** The GeoBase frame the geosearch module searches (name/DOB rows +
    * address keys).
    */
  def geobase(s: SparkSession, d: String): DataFrame = sides(s, d)._4

  /** The per-module reference frames [[LinkageCascade.run]] searches. */
  def cascadeRefs(s: SparkSession, d: String): Map[String, DataFrame] = {
    val (c, _, nd, gb) = sides(s, d)
    Map("census" -> c, "namedob" -> nd, "geobase" -> gb)
  }

  /** Forces the memoized side frames into the cache (Bench warmup): the
    * one-time derivation cost stops landing on whichever linkage query
    * happens to run first.
    */
  def warm(s: SparkSession, d: String): Unit =
    warmSteps.foreach { case (_, f) => f(s, d) }

  /** Force a set of independent cached frames concurrently (one count
    * job each, submitted from futures so the jobs overlap).
    */
  private def forcePar(dfs: Seq[DataFrame]): Unit = {
    import scala.concurrent.duration.Duration
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(
      scala.concurrent.Future.sequence(dfs.map(df => Future(df.count()))),
      Duration.Inf); ()
  }

  /** The memo builds behind [[warm]], individually named so Bench can
    * attribute warm-time growth to the memo that grew (the
    * `warm_breakdown` map in the bench JSON).
    */
  def warmSteps: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "linkage_sides" -> ((s: SparkSession, d: String) => {
      GraftFunctions.register(s)
      // The two sides derive from independent cached subtrees (census from
      // cpre, input from ib/gq); force them concurrently — this step heads
      // the warm DAG's critical path (guide §2.6).
      val c = census(s, d); val i = input(s, d)
      forcePar(Seq(c, i)); ()
    }),
    "linkage_reffiles" -> ((s: SparkSession, d: String) => {
      val nd = namedob(s, d); val gb = geobase(s, d)
      forcePar(Seq(nd, gb)); ()
    }),
    "linkage_scored_block" -> ((s: SparkSession, d: String) => {
      scoredBlock(s, d).count(); ()
    }),
    "linkage_cost_summary" -> ((s: SparkSession, d: String) => {
      costSummary(s, d).count(); ()
    }),
    "cascade_links" -> ((s: SparkSession, d: String) => {
      cascadeLinks(s, d).count(); ()
    }))

  // ---- SQL mirrors of the sides ------------------------------------------

  import Preprocess.{geokeySql, standardizeAddressPartSql => stdSql}

  private val hhmSql = "(hh % 13 = 0 AND hh % 200 <> 0)"
  private val nSql = "(k % 29 = 0)"
  private val vSql = "(k % 19 = 0 AND k % 29 <> 0)"
  private val notNV = "k % 29 <> 0 AND k % 19 <> 0"
  private val nickCanonList = nickCanonicals.map(n => s"'$n'").mkString(", ")
  private val fSql =
    s"(k % 37 = 0 AND $notNV AND NOT $hhmSql AND k % 23 <> 0 AND k % 17 <> 0 AND k % 200 >= 20)"
  private val kSql =
    s"(k % 41 = 0 AND $notNV AND NOT $hhmSql AND k % 23 <> 0 AND k % 37 <> 0 AND first_name IN ($nickCanonList))"
  private val haSql = s"($hhmSql AND k % 4 = 1 AND $notNV)"
  private val hbSql = s"($hhmSql AND k % 4 = 2 AND $notNV)"
  private val swSql =
    s"(k % 23 = 0 AND $notNV AND NOT ($hhmSql AND (k % 4 = 1 OR k % 4 = 2)))"
  private val swzSql =
    s"(k % 47 = 0 AND $notNV AND NOT $hhmSql AND k % 23 <> 0 AND k % 37 <> 0 " +
      "AND k % 41 <> 0 AND k % 200 >= 20)"
  private val swdSql =
    s"(k % 31 = 0 AND $notNV AND NOT $hhmSql AND k % 23 <> 0 AND k % 37 <> 0 " +
      "AND k % 41 <> 0 AND k % 47 <> 0 AND k % 17 <> 0 AND k % 13 <> 0)"
  private val lSql =
    s"(k % 43 = 0 AND $notNV AND NOT $hhmSql AND k % 23 <> 0 AND k % 37 <> 0 " +
      "AND k % 41 <> 0 AND k % 31 <> 0 AND k % 47 <> 0 AND k % 17 <> 0 AND k % 13 <> 0)"
  private val f2Sql =
    s"(k % 59 = 0 AND $notNV AND NOT $hhmSql AND k % 23 <> 0 AND k % 37 <> 0 " +
      "AND k % 41 <> 0 AND k % 47 <> 0 AND k % 31 <> 0 AND k % 43 <> 0 AND k % 200 >= 20)"
  private val mSql =
    s"(k % 21 = 0 AND $notNV AND NOT $hhmSql AND k % 23 <> 0 AND k % 37 <> 0 " +
      "AND k % 41 <> 0 AND k % 47 <> 0 AND k % 31 <> 0 AND k % 43 <> 0 " +
      "AND k % 59 <> 0 AND k % 13 <> 0 AND k % 17 <> 0)"
  private val mvSql = "(hh % 52 = 0 AND hh % 200 <> 0 AND (hh // 52) % 2 = 1)"
  private val z3Sql =
    s"(k % 61 = 0 AND $notNV AND NOT $hhmSql AND NOT $mvSql AND k % 23 <> 0 " +
      "AND k % 37 <> 0 AND k % 41 <> 0 AND k % 47 <> 0 AND k % 31 <> 0 " +
      "AND k % 43 <> 0 AND k % 59 <> 0 AND k % 21 <> 0 AND k % 17 <> 0 " +
      "AND k % 200 >= 20)"

  private def nullPlaceholderSql(x: String): String =
    s"CASE WHEN $x IN (${Preprocess.placeholderNamesSqlList}) THEN NULL ELSE $x END"

  private val inputPreCte: String =
    s"""input_pre AS MATERIALIZED (
       |  SELECT * FROM (
       |  SELECT rec_id,
       |         ${nullPlaceholderSql("first_name")} AS first_name,
       |         ${nullPlaceholderSql("last_name")} AS last_name,
       |         middle_initial, dob_year, dob_month, dob_day,
       |         street_num, street_std, unit_std, city, state, zipcode,
       |         housing_type
       |  FROM (
       |  SELECT k AS rec_id,
       |         CASE WHEN $mvSql THEN 'UNKNOWN'
       |              WHEN $z3Sql THEN ${swapFirstTwoSql("first_name")}
       |              WHEN $nSql THEN ${vowelMangleSql("first_name")}
       |              WHEN $vSql THEN ${letterMangleSql("first_name")}
       |              WHEN $fSql OR $f2Sql THEN 'UNKNOWN'
       |              WHEN $kSql THEN ${nickOfSql("first_name")}
       |              WHEN $haSql THEN first_name
       |              WHEN $hbSql THEN substr(first_name, 2)
       |              WHEN $swSql OR $swzSql THEN messy_last
       |              WHEN $swdSql THEN last_name
       |              WHEN $lSql OR $mSql THEN first_name
       |              ELSE messy_first END AS first_name,
       |         CASE WHEN $mvSql OR $z3Sql THEN last_name
       |              WHEN $nSql THEN ${vowelMangleSql("last_name")}
       |              WHEN $vSql THEN ${letterMangleSql("last_name")}
       |              WHEN $f2Sql THEN 'UNKNOWN'
       |              WHEN $fSql OR $kSql OR $haSql OR $hbSql THEN last_name
       |              WHEN $swSql OR $swzSql THEN messy_first
       |              WHEN $swdSql THEN first_name
       |              WHEN $lSql THEN reverse(last_name)
       |              WHEN $mSql THEN ${People.marriedLastSql("k")}
       |              ELSE messy_last END AS last_name,
       |         middle_initial,
       |         CAST(CASE WHEN $mvSql OR $z3Sql THEN dob_year
       |              WHEN $haSql OR $mSql THEN dob_year + 1 ELSE dob_year END AS INTEGER) AS dob_year,
       |         CAST(CASE WHEN $mvSql OR $z3Sql THEN dob_month
       |              WHEN $haSql OR $hbSql OR $swSql OR $swzSql OR $fSql THEN dob_month % 12 + 1 ELSE dob_month END AS INTEGER) AS dob_month,
       |         CAST(CASE WHEN $mvSql THEN dob_day
       |              WHEN $z3Sql THEN dob_day % 28 + 1
       |              WHEN $hbSql OR $swSql OR $swzSql OR $fSql THEN dob_day % 28 + 1
       |              WHEN $nSql OR $vSql OR $haSql OR $kSql OR $swdSql OR $lSql THEN dob_day
       |              WHEN k % 13 = 0 THEN dob_day % 28 + 1
       |              ELSE dob_day END AS INTEGER) AS dob_day,
       |         street_num,
       |         ${stdSql("street_raw")} AS street_std,
       |         ${stdSql("unit_raw")} AS unit_std,
       |         city, state,
       |         CASE WHEN $mvSql THEN zipcode
       |              WHEN $z3Sql THEN ${zipBumpZip3Sql("zipcode")}
       |              WHEN k % 17 = 0 OR $swzSql THEN substr(zipcode, 1, 3) || '99' ELSE zipcode END AS zipcode,
       |         housing_type
       |  FROM persons) raw) named
       |  WHERE first_name IS NOT NULL OR last_name IS NOT NULL)""".stripMargin

  private val censusStaleSql =
    s"($hhmSql OR k % 29 = 0 OR k % 19 = 0 OR $kSql OR $swdSql OR $lSql OR $mSql)"

  private val censusPreCte: String =
    s"""census_pre AS MATERIALIZED (
       |  SELECT k AS pik, first_name, last_name, middle_initial,
       |         dob_year, dob_month, dob_day,
       |         CASE WHEN $censusStaleSql THEN street_num_old ELSE street_num END AS street_num,
       |         CASE WHEN $censusStaleSql THEN ${stdSql("street_raw_old")} ELSE ${stdSql("street_raw")} END AS street_std,
       |         CASE WHEN $censusStaleSql THEN NULL ELSE ${stdSql("unit_raw")} END AS unit_std,
       |         CASE WHEN $censusStaleSql THEN city_old ELSE city END AS city,
       |         CASE WHEN $censusStaleSql THEN state_old ELSE state END AS state,
       |         CASE WHEN $censusStaleSql THEN zipcode_old ELSE zipcode END AS zipcode
       |  FROM persons WHERE k % 5 <> 4)""".stripMargin

  /** Derived-columns select list over a *_pre relation (mirror of
    * [[derive]]).
    */
  /** SQL mirror of [[deriveNames]] — the name-key select-list fragment. */
  private val deriveNamesSql: String =
    s"""substr(first_name, 1, 1) AS fn1,
       |         substr(first_name, 1, 2) AS fn2,
       |         substr(first_name, 1, 3) AS fn3,
       |         substr(last_name, 1, 1) AS ln1,
       |         substr(last_name, 1, 2) AS ln2,
       |         substr(last_name, 1, 3) AS ln3,
       |         substr(first_name, 1, 15) AS fn15,
       |         substr(last_name, 1, 12) AS ln12,
       |         substr(first_name, 1, 12) AS fn12,
       |         substr(last_name, 1, 15) AS ln15,
       |         ${Preprocess.initialCutSql("substr(first_name, 1, 1)")} AS cut_first,
       |         ${Preprocess.initialCutSql("substr(last_name, 1, 1)")} AS cut_last,
       |         ${Phonetics.nysKeySql("first_name")} AS nys_first,
       |         ${Phonetics.nysKeySql("last_name")} AS nys_last,
       |         ${Phonetics.rsdxSql("first_name")} AS rsdx_first,
       |         ${Phonetics.rsdxSql("last_name")} AS rsdx_last""".stripMargin

  private def deriveSql(extra: String): String =
    s"""substr(zipcode, 1, 3) AS zip3,
       |         $deriveNamesSql,
       |         ${Phonetics.sdxSql("street_std")} AS sdx_street,
       |         ${geokeySql(Seq("street_num", "street_std", "unit_std", "city", "state", "zipcode"))} AS geokey$extra""".stripMargin

  private val baseColsSeq = Seq(
    "first_name", "last_name", "middle_initial",
    "dob_year", "dob_month", "dob_day", "zipcode", "street_num")

  private val sharedBaseCols = baseColsSeq.mkString(", ")

  /** Column set of input_base (mirror of what derive() leaves in scope). */
  private val derivedColsSeq = Seq(
    "zip3", "fn1", "fn2", "fn3", "ln1", "ln2", "ln3",
    "fn15", "ln12", "fn12", "ln15", "cut_first", "cut_last",
    "nys_first", "nys_last", "rsdx_first", "rsdx_last", "sdx_street", "geokey")

  /** The first-name-derived columns an alternate row recomputes (mirror of
    * [[deriveFirst]]).
    */
  private val firstDerivedSql: Map[String, String] = Map(
    "fn1" -> "substr(first_name, 1, 1)",
    "fn2" -> "substr(first_name, 1, 2)",
    "fn3" -> "substr(first_name, 1, 3)",
    "fn15" -> "substr(first_name, 1, 15)",
    "fn12" -> "substr(first_name, 1, 12)",
    "cut_first" -> Preprocess.initialCutSql("substr(first_name, 1, 1)"),
    "nys_first" -> Phonetics.nysKeySql("first_name"),
    "rsdx_first" -> Phonetics.rsdxSql("first_name"))

  private val inputExpCols: Seq[String] =
    ("rec_id" +: baseColsSeq) ++ derivedColsSeq :+ "housing_type"

  /** Mirror of the nickname expansion in [[sides]]: orig rows ∪ alternate
    * rows with the canonical first name and recomputed first-name keys.
    */
  private val inputExpCte: String = {
    val origBranch = inputExpCols.mkString(", ")
    val altOuter = inputExpCols
      .map(c => firstDerivedSql.get(c).map(e => s"$e AS $c").getOrElse(c))
      .mkString(",\n         ")
    val altInner = inputExpCols.filterNot(firstDerivedSql.contains)
      .map {
        case "first_name" => "n.canonical AS first_name"
        case c            => s"b.$c"
      }
      .mkString(", ")
    val nickValues = Preprocess.nicknames
      .map { case (c, n) => s"('$c', '$n')" }
      .mkString(", ")
    s"""nick AS (SELECT * FROM (VALUES $nickValues) t(canonical, nickname)),
       |input_exp AS MATERIALIZED (
       |  SELECT $origBranch FROM input_base
       |  UNION ALL
       |  SELECT $altOuter
       |  FROM (SELECT $altInner
       |        FROM input_base b JOIN nick n ON b.first_name = n.nickname) a)""".stripMargin
  }

  private val inputBaseCte: String =
    s"""input_base AS MATERIALIZED (
       |  SELECT rec_id, $sharedBaseCols,
       |         ${deriveSql(", housing_type")}
       |  FROM input_pre)""".stripMargin

  private val censusBaseCte: String =
    s"""census_base AS MATERIALIZED (
       |  SELECT pik, $sharedBaseCols,
       |         ${deriveSql("")}
       |  FROM census_pre)""".stripMargin

  private val gqCte: String =
    """gq AS MATERIALIZED (
      |  SELECT geokey FROM (
      |    SELECT geokey, CAST(housing_type <> 'Household' AS INTEGER) AS rgq
      |    FROM input_base)
      |  GROUP BY geokey
      |  HAVING SUM(rgq) >= 3
      |     AND round(CAST(SUM(rgq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) >= 0.7)""".stripMargin

  private def finishSql(id: String, baseRel: String): String = {
    val cols = sideCols.filterNot(
      Set("geokey_blk", "street_num_blk", "sdx_street_blk")).map("b." + _)
    s"""  SELECT b.$id, ${cols.mkString(", ")},
       |         CASE WHEN g.geokey IS NULL THEN b.geokey END AS geokey_blk,
       |         CASE WHEN g.geokey IS NULL THEN b.street_num END AS street_num_blk,
       |         CASE WHEN g.geokey IS NULL THEN b.sdx_street END AS sdx_street_blk
       |  FROM $baseRel b LEFT JOIN gq g ON b.geokey = g.geokey""".stripMargin
  }

  private val inputCte: String = s"input AS MATERIALIZED (\n${finishSql("rec_id", "input_exp")})"
  private val censusCte: String = s"census AS MATERIALIZED (\n${finishSql("pik", "census_base")})"

  private val base =
    s"WITH ${People.personsCte},\n$inputPreCte,\n$censusPreCte,\n$inputBaseCte,\n$censusBaseCte,\n$inputExpCte,\n$gqCte,\n$inputCte,\n$censusCte"

  /** SQL mirror of the per-module reference-file frames built in [[sides]]:
    * the census-side numident (era-0 clean + era-1 married-surname and
    * alternate-DOB refiles), the Name/DOB Reference File (distinct names ×
    * distinct DOBs per pik — exactly what Lineage dedupe+merge produce,
    * record ids dropped because the cascade never reads them), and the
    * GeoBase (address keys appended from the census frame). Appended to
    * `base` only by the oracles that search them.
    */
  private val refCtes: String = {
    val married = People.marriedLastSql("pik")
    s"""cnum AS MATERIALIZED (
       |  SELECT pik AS ssn, first_name, last_name, middle_initial,
       |         dob_year, dob_month, dob_day
       |  FROM census_pre
       |  UNION ALL
       |  SELECT pik, first_name,
       |         CASE WHEN pik % 21 = 0 THEN $married ELSE last_name END,
       |         middle_initial, dob_year, dob_month,
       |         CAST(CASE WHEN pik % 6 = 0 THEN dob_day % 28 + 1 ELSE dob_day END AS INTEGER)
       |  FROM census_pre WHERE pik % 21 = 0 OR pik % 6 = 0),
       |namedob AS MATERIALIZED (
       |  SELECT pik, first_name, last_name, middle_initial,
       |         dob_year, dob_month, dob_day,
       |         $deriveNamesSql
       |  FROM (
       |    SELECT an.ssn AS pik, an.first_name, an.last_name, an.middle_initial,
       |           ad.dob_year, ad.dob_month, ad.dob_day
       |    FROM (SELECT DISTINCT ssn, first_name, last_name, middle_initial FROM cnum) an
       |    JOIN (SELECT DISTINCT ssn, dob_year, dob_month, dob_day FROM cnum) ad
       |      ON an.ssn = ad.ssn) nd0),
       |geobase AS MATERIALIZED (
       |  SELECT n.*, c.zip3, c.geokey, c.geokey_blk, c.street_num_blk, c.sdx_street_blk
       |  FROM namedob n JOIN census c ON n.pik = c.pik)""".stripMargin
  }

  /** `base` plus the reference-file CTEs — the WITH chain for every oracle
    * whose passes search the per-module frames.
    */
  private val baseWithRefs = s"$base,\n$refCtes"

  // ---- SQL fragments generated from the config ---------------------------

  private def keysOn(keys: Seq[String]): String =
    keys.map(k => s"c.$k = i.$k").mkString(" AND ")

  /** Mirror of LinkageCascade's rightRemap: rename right-side columns
    * before pairing (the name-switch pass).
    */
  private def remappedRel(rel: String, remap: Map[String, String]): String =
    if (remap.isEmpty) rel
    else {
      val sel = inputCols.map(c => s"${remap.getOrElse(c, c)} AS $c").mkString(", ")
      s"(SELECT $sel FROM $rel remap_t)"
    }

  private def gammaSelects: String =
    comparisons.map(c => s"${FellegiSunter.gammaSql(c, "c", "i")} AS ${c.gammaName}").mkString(",\n         ")

  /** One-step-EM oracle for the em_zip3 session (q101): gamma-pattern
    * histogram → per-pattern posterior p under the documented init (top
    * level m=0.8, uniform lower mass; u and λ from config) → decimal-
    * summed level masses → per-comparison normalization. Every literal
    * renders from the SAME config the driver-side loop reads, and the
    * arithmetic mirrors its evaluation order (factor products left-to-
    * right in comparison order), so the SQL can't drift from
    * [[LinkageCascade.emTrainSession]].
    */
  private def emStepSql: String = {
    val sess = emPasses.head
    val cmps = sess.comparisonsFor(config)
    val lam = config.lambda
    val gsel = cmps
      .map(c => s"${FellegiSunter.gammaSql(c, "c", "i")} AS ${c.gammaName}")
      .mkString(",\n         ")
    val gnames = cmps.map(_.gammaName).mkString(", ")
    val mFactors = cmps.map(c =>
      s"(CASE WHEN ${c.gammaName} = -1 THEN 1.0 WHEN ${c.gammaName} = ${c.numLevels} " +
        s"THEN 0.8 ELSE ${0.2 / c.numLevels} END)").mkString(" * ")
    val uFactors = cmps.map { c =>
      val whens = c.params.init
        .map { case (g, _, u) => s"WHEN ${c.gammaName} = $g THEN $u" }
        .mkString(" ")
      s"(CASE WHEN ${c.gammaName} = -1 THEN 1.0 $whens ELSE ${c.params.last._3} END)"
    }.mkString(" * ")
    val stackedSel = cmps.map(c =>
      s"SELECT '${c.name}' AS comparison, ${c.gammaName} AS gamma, " +
        s"CAST(n * p AS DECIMAL(38,18)) AS w FROM pw WHERE ${c.gammaName} <> -1")
      .mkString("\n  UNION ALL\n  ")
    val levelRows = cmps.flatMap(c => c.params.map { case (g, _, _) =>
      s"('${c.name}', $g, ${if (g == c.numLevels) 0.8 else 0.2 / c.numLevels})"
    }).mkString(", ")
    s"""$base,
       |prs AS (
       |  SELECT $gsel
       |  FROM census c JOIN input i ON ${keysOn(sess.blockKeys)}),
       |hist AS (
       |  SELECT $gnames, CAST(COUNT(*) AS DOUBLE) AS n
       |  FROM prs GROUP BY $gnames),
       |pw AS (
       |  SELECT *, $lam * ($mFactors) / ($lam * ($mFactors) + (1.0 - $lam) * ($uFactors)) AS p
       |  FROM hist),
       |stacked AS (
       |  $stackedSel),
       |grouped AS (SELECT comparison, gamma, SUM(w) AS s FROM stacked GROUP BY comparison, gamma),
       |tot AS (SELECT comparison, SUM(s) AS t FROM grouped GROUP BY comparison),
       |levels AS (SELECT * FROM (VALUES $levelRows) AS t(comparison, gamma, m0))
       |SELECT l.comparison, l.gamma,
       |       round(CASE WHEN CAST(coalesce(t.t, 0) AS DOUBLE) < 1e-12 THEN l.m0
       |                  ELSE CAST(coalesce(g.s, 0) AS DOUBLE) / CAST(t.t AS DOUBLE) END, 6) AS m_step
       |FROM levels l
       |LEFT JOIN grouped g ON g.comparison = l.comparison AND g.gamma = l.gamma
       |LEFT JOIN tot t ON t.comparison = l.comparison""".stripMargin
  }

  /** Unrolled-EM oracle for q105: the em_zip3 session's full m TRAJECTORY
    * at a fixed iteration count, one CTE block per iteration, each reading
    * the previous iteration's m TABLE (scalar subqueries per comparison,
    * multiplied in comparison order like the driver loop). m is quantized
    * to 6 dp between iterations in BOTH engines (see
    * [[graft.linkage.LinkageCascade.emHistory]]), so the iterations can't
    * compound cross-engine ulp noise — each starts from bit-identical
    * inputs. This makes the ITERATIVE EM hash-checkable, not just its
    * one-step update rule (q101).
    */
  private def emHistorySql(iters: Int): String = {
    // Converged flag per iteration: max |Δm| vs the previous stage as an
    // EXACT DECIMAL compare (the 6-dp m's are grid points; a double
    // subtraction's ulp could split `< tol` at the boundary) — mirrors
    // emHistoryConverged's BigDecimal rule. Iteration 0 is never converged.
    def convSql(it: Int): String =
      if (it == 0) "FALSE AS converged"
      else
        s"""(SELECT MAX(ABS(CAST(a.m AS DECIMAL(18,6)) - CAST(b.m AS DECIMAL(18,6))))
           |          FROM m_z_$it a JOIN m_z_${it - 1} b
           |            ON a.comparison = b.comparison AND a.gamma = b.gamma)
           |         < CAST(0.0001 AS DECIMAL(18,6)) AS converged""".stripMargin
    s"""$base,
       |${emSessionCtes(emPasses.head, iters, "z")}
       |${(0 to iters)
        .map(it => s"SELECT $it AS iter, comparison, gamma, m,\n       ${convSql(it)} FROM m_z_$it")
        .mkString("\n  UNION ALL\n  ")}""".stripMargin
  }

  /** The CTE chain of one session's unrolled quantized EM (see
    * [[emHistorySql]]) with every relation name suffixed `_pfx`, so two
    * sessions can coexist in one oracle query (q107). Ends with
    * `m_pfx_<iters>` = the session's final 6-dp m table.
    */
  private def emSessionCtes(sess: BlockingPass, iters: Int, pfx: String): String = {
    val cmps = sess.comparisonsFor(config)
    val lam = config.lambda
    val gsel = cmps
      .map(c => s"${FellegiSunter.gammaSql(c, "c", "i")} AS ${c.gammaName}")
      .mkString(",\n         ")
    val gnames = cmps.map(_.gammaName).mkString(", ")
    def q6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val m0Rows = cmps.flatMap(c => c.params.map { case (g, _, _) =>
      s"('${c.name}', $g, ${q6(if (g == c.numLevels) 0.8 else 0.2 / c.numLevels)})"
    }).mkString(", ")
    val uFactors = cmps.map { c =>
      val whens = c.params.init
        .map { case (g, _, u) => s"WHEN ${c.gammaName} = $g THEN $u" }
        .mkString(" ")
      s"(CASE WHEN ${c.gammaName} = -1 THEN 1.0 $whens ELSE ${c.params.last._3} END)"
    }.mkString(" * ")
    def mFactors(mrel: String) = cmps.map { c =>
      val known = c.params.map(_._1).mkString(", ")
      s"(CASE WHEN ${c.gammaName} = -1 THEN 1.0 ELSE (" +
        s"SELECT mm.m FROM $mrel mm WHERE mm.comparison = '${c.name}' AND mm.gamma = " +
        s"(CASE WHEN ${c.gammaName} IN ($known) THEN ${c.gammaName} ELSE 0 END)) END)"
    }.mkString(" * ")
    val iterCtes = (1 to iters).map { it =>
      val prev = s"m_${pfx}_${it - 1}"
      val stackedSel = cmps.map(c =>
        s"SELECT '${c.name}' AS comparison, ${c.gammaName} AS gamma, " +
          s"CAST(n * p AS DECIMAL(38,18)) AS w FROM pw_${pfx}_$it WHERE ${c.gammaName} <> -1")
        .mkString("\n  UNION ALL\n  ")
      s"""pw_${pfx}_$it AS MATERIALIZED (
         |  SELECT *, $lam * (${mFactors(prev)}) / ($lam * (${mFactors(prev)}) + (1.0 - $lam) * ($uFactors)) AS p
         |  FROM hist_$pfx),
         |stacked_${pfx}_$it AS (
         |  $stackedSel),
         |grouped_${pfx}_$it AS (SELECT comparison, gamma, SUM(w) AS s FROM stacked_${pfx}_$it GROUP BY comparison, gamma),
         |tot_${pfx}_$it AS (SELECT comparison, SUM(s) AS t FROM grouped_${pfx}_$it GROUP BY comparison),
         |m_${pfx}_$it AS MATERIALIZED (
         |  SELECT p.comparison, p.gamma,
         |         round(CASE WHEN CAST(coalesce(t.t, 0) AS DOUBLE) < 1e-12 THEN p.m
         |                    ELSE CAST(coalesce(g.s, 0) AS DOUBLE) / CAST(t.t AS DOUBLE) END, 6) AS m
         |  FROM m_${pfx}_${it - 1} p
         |  LEFT JOIN grouped_${pfx}_$it g ON g.comparison = p.comparison AND g.gamma = p.gamma
         |  LEFT JOIN tot_${pfx}_$it t ON t.comparison = p.comparison)""".stripMargin
    }.mkString(",\n")
    s"""prs_$pfx AS (
       |  SELECT $gsel
       |  FROM census c JOIN input i ON ${keysOn(sess.blockKeys)}),
       |hist_$pfx AS MATERIALIZED (
       |  SELECT $gnames, CAST(COUNT(*) AS DOUBLE) AS n
       |  FROM prs_$pfx GROUP BY $gnames),
       |m_${pfx}_0 AS MATERIALIZED (SELECT comparison, gamma, CAST(m AS DOUBLE) AS m
       |       FROM (VALUES $m0Rows) AS t(comparison, gamma, m)),
       |$iterCtes""".stripMargin
  }

  /** cand/scored/best CTE chain for one pass of `censusRel` × `inputRel`.
    * Gamma/weight fragments render from the PASS's comparison subset
    * (mirror of [[LinkageCascade.predict]]'s comparisonsFor).
    */
  private def passSql(pass: BlockingPass, inputRel: String, tag: String,
      censusRel: String = "census"): String = {
    val cmps = pass.comparisonsFor(config)
    val gsel = cmps
      .map(c => pass.constGammas.get(c.name)
        .map(g => s"$g AS ${c.gammaName}")
        .getOrElse(s"${FellegiSunter.gammaSql(c, "c", "i")} AS ${c.gammaName}"))
      .mkString(",\n         ")
    val weight =
      if (pass.weightOffset == 0.0) FellegiSunter.matchWeightSql(cmps)
      else s"${FellegiSunter.matchWeightSql(cmps)} + ${pass.weightOffset}"
    s"""cand_$tag AS (
       |  SELECT c.pik, i.rec_id,
       |         $gsel
       |  FROM $censusRel c JOIN $inputRel i ON ${keysOn(pass.blockKeys)}),
       |scored_$tag AS (
       |  SELECT pik, rec_id, $weight AS match_weight
       |  FROM cand_$tag),
       |best_$tag AS MATERIALIZED (
       |  SELECT DISTINCT pik, rec_id, match_weight FROM (
       |    SELECT *, COUNT(DISTINCT pik) OVER (PARTITION BY rec_id) AS n_piks FROM (
       |      SELECT * FROM (
       |        SELECT pik, rec_id, match_weight,
       |               MAX(match_weight) OVER (PARTITION BY rec_id) AS w_max
       |        FROM scored_$tag
       |        WHERE match_weight >= ${config.thresholdWeight}) t1
       |      WHERE match_weight = w_max) t2) t3
       |  WHERE n_piks = 1)""".stripMargin
  }

  private val allPasses: Seq[BlockingPass] = passes ++ hhPasses

  /** Relation of input records not linked by any of `prevBest`. */
  private def remainingRel(prevBest: Seq[String]): String =
    if (prevBest.isEmpty) "input"
    else {
      val excluded = prevBest.map(b => s"SELECT rec_id FROM $b").mkString(" UNION ALL ")
      s"(SELECT * FROM input WHERE rec_id NOT IN ($excluded))"
    }

  /** CTE chain mirroring LinkageCascade.run over config.passes +
    * config.hhPasses (the hhcomp reference file is built from the main
    * passes' links, mirroring [[LinkageCascade.hhcompReference]]).
    */
  private def cascadeCtes: String = {
    val parts = new StringBuilder(baseWithRefs)
    var prevBest = List.empty[String]
    passes.zipWithIndex.foreach { case (pass, idx) =>
      val tag = s"p${idx + 1}"
      val rel = remainingRel(prevBest)
      parts.append(",\n").append(
        passSql(pass, remappedRel(rel, pass.rightRemap), tag, censusRel = pass.ref))
      prevBest = prevBest :+ s"best_$tag"
    }
    val mains = prevBest
    parts.append(",\n").append(
      s"""linked_main AS MATERIALIZED (
         |  ${mains.map(b => s"SELECT pik, rec_id FROM $b").mkString("\n  UNION ALL\n  ")}),
         |hh_bridge AS MATERIALIZED (
         |  SELECT DISTINCT i.geokey_blk AS hh_geokey, c.geokey_blk AS ref_geokey
         |  FROM linked_main b
         |  JOIN input i ON i.rec_id = b.rec_id
         |  JOIN census c ON c.pik = b.pik
         |  WHERE i.geokey_blk IS NOT NULL AND c.geokey_blk IS NOT NULL),
         |hh_ref AS MATERIALIZED (
         |  SELECT c.*, g.hh_geokey
         |  FROM census c JOIN hh_bridge g ON c.geokey_blk = g.ref_geokey
         |  WHERE c.pik NOT IN (SELECT pik FROM linked_main))""".stripMargin)
    hhPasses.zipWithIndex.foreach { case (pass, idx) =>
      val tag = s"p${passes.size + idx + 1}"
      val rel =
        s"(SELECT t.*, t.geokey_blk AS hh_geokey FROM ${remainingRel(prevBest)} t)"
      parts.append(",\n").append(passSql(pass, rel, tag, censusRel = "hh_ref"))
      prevBest = prevBest :+ s"best_$tag"
    }
    parts.toString
  }

  private def cascadeUnions: String =
    allPasses.zipWithIndex
      .map { case (p, idx) =>
        s"SELECT pik, rec_id, round(match_weight, 6) AS mw, '${p.name}' AS pass FROM best_p${idx + 1}"
      }
      .mkString("\nUNION ALL\n")

  private def cascadeSql: String = s"$cascadeCtes\n$cascadeUnions"

  /** Notebook-04 surface: PIK rate + link counts per pass and overall. */
  private def pikRateSql: String = {
    val links = allPasses.zipWithIndex
      .map { case (p, idx) => s"SELECT pik, rec_id, '${p.name}' AS pass FROM best_p${idx + 1}" }
      .mkString("\n  UNION ALL\n  ")
    s"""$cascadeCtes,
       |links AS (
       |  $links),
       |per AS (
       |  SELECT pass, COUNT(*) AS n_piked,
       |         CAST(SUM(CASE WHEN pik = rec_id THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
       |  FROM links GROUP BY pass
       |  UNION ALL
       |  SELECT 'all' AS pass, COUNT(*) AS n_piked,
       |         CAST(SUM(CASE WHEN pik = rec_id THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
       |  FROM links),
       |tot AS (SELECT CAST(COUNT(DISTINCT rec_id) AS BIGINT) AS n_records FROM input)
       |SELECT pass, n_records, n_piked, n_correct,
       |       round(CAST(n_piked AS DOUBLE) / CAST(n_records AS DOUBLE), 6) AS pik_rate,
       |       round(CAST(n_correct AS DOUBLE) / CAST(n_piked AS DOUBLE), 6) AS precision_
       |FROM per CROSS JOIN tot""".stripMargin
  }

  /** PVS module of each cascade pass (reference modules geosearch /
    * namesearch / dobsearch / hhcompsearch; 03_link_datasets.ipynb cells
    * 83/101/114/138 — notebook 04 cells 55-58 aggregate accuracy by it).
    */
  val passModules: Seq[(String, String)] =
    passes.map(_.name).map { n =>
      val m =
        if (Seq("p1_", "p2_", "p3_", "p3b", "p4_").exists(n.startsWith)) "geosearch"
        else if (Seq("p5_", "p6_", "p6b", "p7_").exists(n.startsWith)) "namesearch"
        else "dobsearch"
      n -> m
    } ++ hhPasses.map(_.name -> "hhcompsearch")

  /** Notebook 04 cells 55/57: link accuracy by PVS module. */
  private def accuracyByModuleSql: String = {
    val links = allPasses.zipWithIndex
      .map { case (p, idx) => s"SELECT pik, rec_id, '${p.name}' AS pass FROM best_p${idx + 1}" }
      .mkString("\n  UNION ALL\n  ")
    val moduleRows = passModules
      .map { case (p, m) => s"('$p', '$m')" }.mkString(", ")
    s"""$cascadeCtes,
       |links AS (
       |  $links),
       |mods AS (SELECT * FROM (VALUES $moduleRows) AS t(pass, module_name))
       |SELECT m.module_name, COUNT(*) AS n_links,
       |       CAST(SUM(CASE WHEN l.pik = l.rec_id THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |       round(CAST(SUM(CASE WHEN l.pik = l.rec_id THEN 1 ELSE 0 END) AS DOUBLE) /
       |             CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
       |FROM links l JOIN mods m ON l.pass = m.pass
       |GROUP BY m.module_name""".stripMargin
  }

  /** Notebook 04 cell 10: distribution of links per PIK. */
  private def pikSizesSql: String = {
    val links = allPasses.zipWithIndex
      .map { case (_, idx) => s"SELECT pik, rec_id FROM best_p${idx + 1}" }
      .mkString("\n  UNION ALL\n  ")
    s"""$cascadeCtes,
       |links AS (
       |  $links)
       |SELECT pik_size, COUNT(*) AS n_piks FROM (
       |  SELECT pik, COUNT(*) AS pik_size FROM links GROUP BY pik) t
       |GROUP BY pik_size""".stripMargin
  }

  /** Notebook 04 cells 19/66: reachable ground truth and missed links. */
  private def possibleToPikSql: String = {
    val links = allPasses.zipWithIndex
      .map { case (_, idx) => s"SELECT pik, rec_id FROM best_p${idx + 1}" }
      .mkString("\n  UNION ALL\n  ")
    s"""$cascadeCtes,
       |links AS (
       |  $links),
       |c AS (
       |  SELECT CAST((SELECT COUNT(DISTINCT rec_id) FROM input) AS BIGINT) AS n_records,
       |         CAST((SELECT COUNT(DISTINCT rec_id) FROM input
       |               WHERE rec_id IN (SELECT pik FROM census)) AS BIGINT) AS n_possible,
       |         CAST((SELECT COUNT(DISTINCT rec_id) FROM links) AS BIGINT) AS n_piked,
       |         CAST((SELECT COUNT(DISTINCT rec_id) FROM input
       |               WHERE rec_id IN (SELECT pik FROM census)
       |                 AND rec_id NOT IN (SELECT rec_id FROM links)) AS BIGINT) AS n_missed)
       |SELECT n_records, n_possible, n_piked, n_missed,
       |       round(CAST(n_possible AS DOUBLE) / CAST(n_records AS DOUBLE), 6) AS possible_rate,
       |       CASE WHEN n_possible = 0 THEN 0.0
       |            ELSE round(CAST(n_missed AS DOUBLE) / CAST(n_possible AS DOUBLE), 6) END AS missed_rate
       |FROM c""".stripMargin
  }

  /** Accuracy over the cascade links vs ground truth pik == rec_id. */
  private def accuracySql: String = {
    val links = allPasses.zipWithIndex
      .map { case (_, idx) => s"SELECT pik, rec_id FROM best_p${idx + 1}" }
      .mkString("\n  UNION ALL\n  ")
    s"""$cascadeCtes,
       |links AS (
       |  $links)
       |SELECT COUNT(*) AS n_links,
       |       CAST(SUM(CASE WHEN pik = rec_id THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |       (SELECT COUNT(*) FROM census) AS n_true,
       |       round(CAST(SUM(CASE WHEN pik = rec_id THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS precision_,
       |       round(CAST(SUM(CASE WHEN pik = rec_id THEN 1 ELSE 0 END) AS DOUBLE) / CAST((SELECT COUNT(*) FROM census) AS DOUBLE), 6) AS recall_
       |FROM links""".stripMargin
  }

  /** SQL mirror of [[graft.linkage.LinkageCascade.moversStage]] over the
    * full cascade's remainder.
    */
  private def moversSql: String = {
    val cmps = moversPass.comparisonsFor(config)
    val gsel = cmps
      .map(c => s"${FellegiSunter.gammaSql(c, "c", "i")} AS ${c.gammaName}")
      .mkString(",\n         ")
    val weight =
      s"${FellegiSunter.matchWeightSql(cmps)} + ${moversPass.weightOffset}"
    val linkedUnions = allPasses.indices
      .map(i => s"SELECT rec_id FROM best_p${i + 1}").mkString(" UNION ALL ")
    s"""$cascadeCtes,
       |mv_linked AS (SELECT DISTINCT rec_id FROM ($linkedUnions) lu),
       |mv_eligible AS (
       |  SELECT geokey_blk FROM (
       |    SELECT i.geokey_blk, COUNT(*) AS n_members,
       |           SUM(CASE WHEN l.rec_id IS NOT NULL THEN 1 ELSE 0 END) AS n_linked
       |    FROM input i LEFT JOIN mv_linked l ON i.rec_id = l.rec_id
       |    WHERE i.geokey_blk IS NOT NULL
       |    GROUP BY i.geokey_blk) t
       |  WHERE n_members > 1 AND n_linked = 0),
       |mv_members AS (
       |  SELECT i.* FROM input i JOIN mv_eligible e ON i.geokey_blk = e.geokey_blk),
       |mv_cand AS (
       |  SELECT c.pik, i.rec_id, c.geokey_blk AS ref_geokey, i.geokey_blk AS hh_geokey,
       |         $gsel
       |  FROM census c JOIN mv_members i ON ${keysOn(moversPass.blockKeys)}
       |  WHERE c.geokey_blk IS NOT NULL),
       |mv_thr AS MATERIALIZED (
       |  SELECT pik, rec_id, ref_geokey, hh_geokey, match_weight FROM (
       |    SELECT pik, rec_id, ref_geokey, hh_geokey, $weight AS match_weight
       |    FROM mv_cand) s
       |  WHERE match_weight >= ${config.thresholdWeight}),
       |mv_units AS (
       |  SELECT hh_geokey, ref_geokey FROM (
       |    SELECT hh_geokey, ref_geokey,
       |           COUNT(DISTINCT rec_id) AS nm, COUNT(DISTINCT pik) AS np
       |    FROM mv_thr GROUP BY hh_geokey, ref_geokey) u
       |  WHERE nm >= 2 AND np >= 2),
       |mv_unit_scored AS (
       |  SELECT s.pik, s.rec_id, s.match_weight
       |  FROM mv_thr s JOIN mv_units u
       |    ON s.hh_geokey = u.hh_geokey AND s.ref_geokey = u.ref_geokey),
       |mv_best AS (
       |  SELECT DISTINCT pik, rec_id, match_weight FROM (
       |    SELECT *, COUNT(DISTINCT pik) OVER (PARTITION BY rec_id) AS n_piks FROM (
       |      SELECT * FROM (
       |        SELECT pik, rec_id, match_weight,
       |               MAX(match_weight) OVER (PARTITION BY rec_id) AS w_max
       |        FROM mv_unit_scored) t1
       |      WHERE match_weight = w_max) t2) t3
       |  WHERE n_piks = 1)
       |SELECT pik, rec_id, round(match_weight, 6) AS mw, '${moversPass.name}' AS pass
       |FROM mv_best""".stripMargin
  }

  /** SQL mirror of the ZIP3 Adjacency passes over the cascade remainder:
    * the geobase side explodes into the {z-1, z, z+1} neighborhood, then
    * the two street-soundex passes run in order.
    */
  private def zip3AdjSql: String = {
    val prevBest = allPasses.indices.map(i => s"best_p${i + 1}").toList
    val z1 = zip3AdjPasses(0)
    val z2 = zip3AdjPasses(1)
    // Mirror of the Spark side: the adjacency explode runs on the small
    // cascade REMAINDER, never the national reference file (and the
    // lpad-truncation edge rendering must live on the same side in both
    // engines).
    def adjRel(rel: String): String =
      s"""(SELECT r.* REPLACE (lpad(CAST(CAST(r.zip3 AS INTEGER) + o.off AS VARCHAR), 3, '0') AS zip3)
         | FROM $rel r, (VALUES (-1), (0), (1)) o(off))""".stripMargin
    s"""$cascadeCtes,
       |${passSql(z1, adjRel(remappedRel(remainingRel(prevBest), z1.rightRemap)), "z1", censusRel = "geobase")},
       |${passSql(z2, adjRel(remappedRel(remainingRel(prevBest :+ "best_z1"), z2.rightRemap)), "z2", censusRel = "geobase")}
       |SELECT pik, rec_id, round(match_weight, 6) AS mw, '${z1.name}' AS pass FROM best_z1
       |UNION ALL
       |SELECT pik, rec_id, round(match_weight, 6) AS mw, '${z2.name}' AS pass FROM best_z2""".stripMargin
  }

  /** SQL mirror of q130: MAF = every distinct sans-zip address rendering
    * (current + old) in the universe, MAFIDs minted by sorted key; both
    * sides join the MAF on their geokey stripped of its zip segment, then
    * one predict pass blocks on mafid.
    */
  private def mafSql: String = {
    val curKey = geokeySql(Seq("street_num", stdSql("street_raw"),
      stdSql("unit_raw"), "city", "state"))
    val oldKey = geokeySql(Seq("street_num_old", stdSql("street_raw_old"),
      "''", "city_old", "state_old"))
    s"""$base,
       |maf_addr AS (
       |  SELECT DISTINCT maf_key FROM (
       |    SELECT $curKey AS maf_key FROM persons
       |    UNION ALL
       |    SELECT $oldKey AS maf_key FROM persons) u),
       |maf AS MATERIALIZED (
       |  SELECT maf_key, row_number() OVER (ORDER BY maf_key) - 1 AS mafid
       |  FROM maf_addr),
       |input_maf AS (
       |  SELECT i.*, m.mafid FROM input i
       |  JOIN maf m ON regexp_replace(i.geokey, '\\|[^|]*$$', '') = m.maf_key),
       |census_maf AS (
       |  SELECT c.*, m.mafid FROM census c
       |  JOIN maf m ON regexp_replace(c.geokey, '\\|[^|]*$$', '') = m.maf_key),
       |${passSql(mafPass, "input_maf", "mm", censusRel = "census_maf")}
       |SELECT pik, rec_id, round(match_weight, 6) AS mw, '${mafPass.name}' AS pass
       |FROM best_mm""".stripMargin
  }

  // ---- the queries -------------------------------------------------------

  private def reg(s: SparkSession): Unit = GraftFunctions.register(s)

  /** q32/q33/q36/q37 all need the full cascade; its per-pass links are
    * already localCheckpointed, so memoizing the assembled frame per
    * (session, dir) means every consumer reuses the materialized links
    * instead of re-running the predict passes. Only the LATEST key is kept:
    * switching dir/session evicts the previous frame so checkpointed
    * blocks and session references don't accumulate for process lifetime.
    */
  private val cascadeFrames =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def cascadeLinks(s: SparkSession, d: String): DataFrame =
    cascadeFrames.synchronized {
      val key = (s, d)
      cascadeFrames.getOrElse(key, {
        cascadeFrames.clear()
        // Checkpoint the ASSEMBLED link set once: with the overlapped
        // cascade, per-pass links are checkpointed but the within-group
        // anti-join resolution on top of them is lazy, and every memo
        // consumer (q32/q33/q36/q37/q39/q83/q84/q112…) re-executed those
        // ~13 small joins per query (measured +0.3-0.4 s each). One
        // KB-scale materialization here gives consumers a single
        // LogicalRDD, like the pre-overlap shape.
        val df = LinkageCascade.run(cascadeRefs(s, d), input(s, d), config)
          .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        cascadeFrames.put(key, df)
        df
      })
    }

  private val countInputSql = "(SELECT CAST(COUNT(*) AS DOUBLE) FROM input)"
  private val countCensusSql = "(SELECT CAST(COUNT(*) AS DOUBLE) FROM census)"

  /** q27/q28/q29 all demonstrate scoring over the SAME zip3 demo blocking;
    * the blocked+scored frame is built once, projected narrow (ids, gamma
    * ints, weight) and cached — each consumer is then a projection or a
    * filter+window over the cached frame instead of a fresh join + JW
    * evaluation. Same latest-key-only eviction as [[cascadeFrames]].
    */
  private val scoredFrames =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  // q78 and q108 both price every pass's blocks; the 13-row summary is
  // memoized like the other shared frames (cache holds the materialized
  // rows, not a plan — blockCostSummaryAll's two explode-aggregates are
  // the cost).
  private val costFrames = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private def costSummary(s: SparkSession, d: String): DataFrame =
    costFrames.synchronized {
      costFrames.getOrElse((s, d), {
        costFrames.values.foreach(_.unpersist())
        costFrames.clear()
        val df = LinkageCascade
          .blockCostSummaryAll(cascadeRefs(s, d), input(s, d), passes).cache()
        costFrames.put((s, d), df)
        df
      })
    }

  private def scoredBlock(s: SparkSession, d: String): DataFrame =
    scoredFrames.synchronized {
      val key = (s, d)
      scoredFrames.getOrElse(key, {
        scoredFrames.clear()
        // tf_ln12 rides along for q92: the TERM the pair agreed on must be
        // the pairing row's own ln12 (nickname expansion makes rec_id
        // non-unique in input, so a later re-join on rec_id would fan out).
        val df = LinkageCascade
          .score(LinkageCascade.pairs(census(s, d), input(s, d), blockPass), config)
          .select(col("l_pik").as("pik") +: col("r_rec_id").as("rec_id") +:
            col("r_ln12").as("tf_ln12") +:
            comparisons.map(c => col(c.gammaName)) :+ col("match_weight"): _*)
          .cache()
        scoredFrames.put(key, df)
        df
      })
    }

  // ---- model / pass diagnostics (the splink_reports surface) -------------

  private def r12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def log2d(x: Double): Double = math.log(x) / math.log(2.0)

  /** Human-readable predicate label, shared verbatim by both renderers. */
  private def levelDesc(p: LevelPred): String = p match {
    case ExactMatch       => "exact"
    case JwAtLeast(t)     => s"jw>=$t"
    case AbsDiffAtMost(d) => s"absdiff<=$d"
  }

  /** One row per (comparison, gamma level) of the model the cascade scores
    * with: m, u, Bayes factor K=m/u and log2 match weight — the tabular
    * content of Splink's m/u-parameters and match-weights charts that the
    * reference saves per pass (diagnostics/splink_reports/&#42;.html). Both
    * sides render from [[comparisons]], so the report can never drift from
    * the scoring.
    */
  private val modelReportRows: Seq[(String, String, Int, String,
      Option[Double], Option[Double], Option[Double], Double)] =
    comparisons.flatMap { c =>
      val descByGamma: Map[Int, String] =
        c.levels.zipWithIndex.map { case (l, i) =>
          (c.numLevels - i) -> levelDesc(l.pred)
        }.toMap + (0 -> "else")
      val levels = c.params.map { case (gamma, m, u) =>
        (c.name, c.column, gamma, descByGamma(gamma),
          Some(r12(m)), Some(r12(u)), Some(r12(m / u)), r12(log2d(m / u)))
      }
      levels :+ ((c.name, c.column, -1, "null",
        Option.empty[Double], Option.empty[Double], Option.empty[Double], 0.0))
    }

  private val modelReportSql: String = {
    val rows = modelReportRows.map { case (cmp, coln, g, desc, m, u, k, w) =>
      def d(o: Option[Double]) = o.fold("CAST(NULL AS DOUBLE)")(_.toString)
      s"('$cmp', '$coln', $g, '$desc', ${d(m)}, ${d(u)}, ${d(k)}, $w)"
    }
    s"""SELECT * FROM (VALUES ${rows.mkString(", ")})
       |AS t(comparison, col_name, gamma, level_desc, m, u, bayes_factor, weight)""".stripMargin
  }

  /** One row per (pass, comparison): whether the pass scores it, any
    * blocking-implied constant gamma, the pass's blocking keys and fixed
    * weight offset — the reference's per-module matching_columns /
    * cut_columns configuration (cells 83/101/114/138) as a queryable table.
    */
  private val passMatrixRows: Seq[(String, Int, String, String, Int, String,
      Int, Option[Int], Double)] =
    (passes ++ hhPasses).zipWithIndex.flatMap { case (p, i) =>
      // hh passes search the derived household-composition reference, not
      // a refs-map entry — report them under their module's file name.
      val refFile = if (hhPasses.contains(p)) "hhcomp" else p.ref
      comparisons.map { c =>
        (p.name, i + 1, refFile, p.blockKeys.mkString("+"),
          if (p.rightRemap.nonEmpty) 1 else 0, c.name,
          if (p.excludeComparisons.contains(c.name)) 0 else 1,
          p.constGammas.get(c.name), r12(p.weightOffset))
      }
    }

  private val passMatrixSql: String = {
    val rows = passMatrixRows.map { case (pass, ord, rf, keys, sw, cmp, sc, cg, wo) =>
      val cgs = cg.fold("CAST(NULL AS INTEGER)")(_.toString)
      s"('$pass', $ord, '$rf', '$keys', $sw, '$cmp', $sc, $cgs, $wo)"
    }
    s"""SELECT * FROM (VALUES ${rows.mkString(", ")})
       |AS t(pass, ordinal, ref_file, block_keys, name_switch, comparison, scored, const_gamma, weight_offset)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q26_block_pairs",
      (s, d) =>
        LinkageCascade.pairs(census(s, d), input(s, d), blockPass)
          .select(col("l_pik").as("pik"), col("r_rec_id").as("rec_id")),
      Some(s"""$base
              |SELECT c.pik, i.rec_id FROM census c JOIN input i ON c.zip3 = i.zip3""".stripMargin)
    ),
    QueryDef(
      "q27_comparison_vectors",
      (s, d) => {
        reg(s)
        scoredBlock(s, d).select(col("pik") +: col("rec_id") +:
          comparisons.map(c => col(c.gammaName)): _*)
      },
      Some(s"""$base
              |SELECT c.pik, i.rec_id,
              |       $gammaSelects
              |FROM census c JOIN input i ON c.zip3 = i.zip3""".stripMargin)
    ),
    QueryDef(
      // Posterior probabilities use the λ estimated from the two files'
      // record counts (reference cells 56-57), not a hardcoded prior.
      "q28_match_weights",
      (s, d) => {
        reg(s)
        val lam = LinkageCascade.estimateLambda(census(s, d), input(s, d))
        scoredBlock(s, d)
          .select(
            col("pik"), col("rec_id"),
            round(col("match_weight"), 6).as("mw"),
            round(FellegiSunter.probabilityCol(col("match_weight"), lam), 6)
              .as("match_probability"))
      },
      Some(s"""$base,
              |lam AS (SELECT ${LinkageCascade.lambdaSql(countInputSql, countCensusSql)} AS v),
              |cand AS (
              |  SELECT c.pik, i.rec_id,
              |         $gammaSelects
              |  FROM census c JOIN input i ON c.zip3 = i.zip3),
              |scored AS (
              |  SELECT pik, rec_id, ${FellegiSunter.matchWeightSql(comparisons)} AS match_weight
              |  FROM cand)
              |SELECT pik, rec_id, round(match_weight, 6) AS mw,
              |       round(${FellegiSunter.probabilitySqlDyn("match_weight", "(SELECT v FROM lam)")}, 6) AS match_probability
              |FROM scored""".stripMargin)
    ),
    QueryDef(
      "q29_predict_links",
      (s, d) => {
        reg(s)
        LinkageCascade.bestLink(
            scoredBlock(s, d)
              .filter(col("match_weight") >= config.thresholdWeight)
              .select(col("pik"), col("rec_id"), col("match_weight")))
          .select(col("pik"), col("rec_id"), round(col("match_weight"), 6).as("mw"))
      },
      Some(s"""$base,
              |${passSql(blockPass, "input", "b")}
              |SELECT pik, rec_id, round(match_weight, 6) AS mw FROM best_b""".stripMargin)
    ),
    QueryDef(
      "q30_u_estimation",
      (s, d) => {
        reg(s)
        LinkageCascade.estimateU(census(s, d), input(s, d), config)
      },
      Some(s"""$base,
              |csamp AS (SELECT * FROM census
              |          WHERE pik % greatest(1, (SELECT COUNT(*) FROM census) // ${LinkageCascade.uSampleTarget}) = 0),
              |isamp AS (SELECT * FROM input
              |          WHERE rec_id % greatest(1, (SELECT COUNT(*) FROM input) // ${LinkageCascade.uSampleTarget}) = 0),
              |prs AS (
              |  SELECT $gammaSelects
              |  FROM csamp c CROSS JOIN isamp i),
              |stacked AS (
              |  ${comparisons.map(c => s"SELECT '${c.name}' AS comparison, ${c.gammaName} AS gamma FROM prs")
                  .mkString("\n  UNION ALL\n  ")}),
              |grouped AS (SELECT comparison, gamma, COUNT(*) AS n FROM stacked GROUP BY comparison, gamma)
              |SELECT comparison, gamma, n,
              |       round(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY comparison) AS DOUBLE), 6) AS u_hat
              |FROM grouped""".stripMargin)
    ),
    QueryDef(
      // EM is iterative driver-orchestrated training → rows-only oracle;
      // LinkageSpec asserts convergence properties, and q101 pins the
      // single E+M step the loop iterates against DuckDB. Two training
      // blockings, like the reference (first_name+zipcode, geokey); each
      // session excludes the comparisons its blocking conditions on
      // (emExclusions), so no session estimates a comparison over a
      // population its own blocking made degenerate.
      "q31_em_training",
      (s, d) => {
        reg(s)
        // The zip3 session's blocking is the demo blockPass whose scored
        // frame is already cached — hand it over so the session skips the
        // join + gamma evaluation (its gammas are a superset of the
        // session's comparisons).
        val result = LinkageCascade.emTrainMMulti(
          census(s, d), input(s, d), emPasses, config,
          cvProvider = p =>
            if (p.keys == blockPass.keys && p.rightRemap.isEmpty && p.cuts.isEmpty)
              Some(scoredBlock(s, d))
            else None)
        s.createDataFrame(result.map { case (c, g, m) => (c, g, BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) })
          .toDF("comparison", "gamma", "m_hat")
      }
    ),
    QueryDef(
      // The EM update rule itself, oracle-checked: ONE E+M step of the
      // em_zip3 session from the documented init (top level 0.8, uniform
      // lower mass), run through the production emTrainSession path and
      // reproduced closed-form by the generated SQL (emStepSql). q31's
      // full training stays rows-only — it's iterative — but the update
      // it iterates is pinned against DuckDB here.
      "q101_em_step",
      (s, d) => {
        reg(s)
        val result = LinkageCascade.emTrainSession(
          census(s, d), input(s, d), emPasses.head, config, iterations = 1,
          cvOpt = Some(scoredBlock(s, d)))
        s.createDataFrame(result.map { case (c, g, m) =>
          (c, g, BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }).toDF("comparison", "gamma", "m_step")
      },
      Some(emStepSql)
    ),
    QueryDef(
      // Splink's m_u_values_interactive_history_chart data: the em_zip3
      // session's per-iteration m trajectory (iteration 0 = documented
      // init), 6-dp-quantized between iterations so the whole ITERATIVE
      // run is hash-exact against the unrolled DuckDB oracle — see
      // emHistorySql. Reuses the cached scored block; the per-iteration
      // work is driver-side over the O(patterns) histogram.
      "q105_em_history",
      (s, d) => {
        reg(s)
        // The trajectory plus Splink's convergence accounting: converged
        // flips true at the first iteration whose max |Δm| < DefaultEmTol
        // (exact-decimal compare in both engines — see emHistoryConverged).
        val hist = LinkageCascade.emHistoryConverged(
          census(s, d), input(s, d), emPasses.head, config, iterations = 3,
          cvOpt = Some(scoredBlock(s, d)))
        s.createDataFrame(hist).toDF("iter", "comparison", "gamma", "m", "converged")
      },
      Some(emHistorySql(3))
    ),
    QueryDef(
      // Splink's missingness/completeness chart: per model column and per
      // side, how many records carry NULL (the reference calls
      // missingness_chart on its inputs before training; a column that is
      // mostly null can't carry match evidence and its comparisons land on
      // the null level). ONE aggregate pass per side — column counters are
      // parallel SUMs in a single map-side agg, exploded to rows after.
      "q106_missingness",
      (s, d) => {
        reg(s)
        val cols = comparisons.map(_.column)
        def side(df: DataFrame, name: String): DataFrame = {
          val agg = df.agg(count(lit(1)).as("n_total"),
            cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c")): _*)
          agg.select(explode(array(cols.map(c =>
              struct(lit(c).as("column_name"), col("n_total"), col(s"nn_$c").as("n_null"))): _*))
              .as("e"))
            .select(lit(name).as("dataset"), col("e.column_name"), col("e.n_total"),
              col("e.n_null"),
              round(col("e.n_null").cast("double") / col("e.n_total").cast("double"), 6)
                .as("null_rate"))
        }
        side(input(s, d), "input").unionByName(side(census(s, d), "census"))
      },
      Some {
        val cols = comparisons.map(_.column)
        def sideSql(rel: String) = {
          val sums = cols.map(c =>
            s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$c")
            .mkString(",\n            ")
          val rows = cols.map(c =>
            s"SELECT '$rel' AS dataset, '$c' AS column_name, n_total, nn_$c AS n_null, " +
              s"round(CAST(nn_$c AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS null_rate " +
              s"FROM miss_$rel").mkString("\n  UNION ALL\n  ")
          (s"""miss_$rel AS (
              |  SELECT COUNT(*) AS n_total,
              |            $sums
              |  FROM $rel)""".stripMargin, rows)
        }
        val (ci, ri) = sideSql("input")
        val (cc, rc) = sideSql("census")
        s"""$base,
           |$ci,
           |$cc
           |  $ri
           |  UNION ALL
           |  $rc""".stripMargin
      }
    ),
    QueryDef(
      // Splink's parameter_estimate_comparisons_chart: the m each training
      // session produced for every comparison level, side by side, plus
      // the combined estimate (the average emTrainMMulti ships) — NULL
      // where a session's blocking forbids it from estimating that
      // comparison (em_zip3 can't train geo; em_name_yob can't train
      // first/byear). Endpoints come from the 6-dp-quantized 3-iteration
      // trajectories, so both sessions are hash-exact against the same
      // unrolled-EM oracle machinery as q105.
      "q107_param_compare",
      (s, d) => {
        reg(s)
        def fin(h: Seq[(Int, String, Int, Double)]): Map[(String, Int), Double] =
          h.filter(_._1 == 3).map { case (_, c, g, m) => (c, g) -> m }.toMap
        val m1 = fin(LinkageCascade.emHistory(
          census(s, d), input(s, d), emPasses(0), config, 3, Some(scoredBlock(s, d))))
        val m2 = fin(LinkageCascade.emHistory(
          census(s, d), input(s, d), emPasses(1), config, 3, None))
        def q6(x: Double): Double =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val rows = comparisons.flatMap(c => c.params.map { case (g, _, _) =>
          val a = m1.get((c.name, g))
          val b = m2.get((c.name, g))
          val comb = (a, b) match {
            case (Some(x), Some(y)) => q6((x + y) / 2)
            case (Some(x), None)    => x
            case (None, Some(y))    => y
            case _ => throw new IllegalStateException(s"no session estimates ${c.name}")
          }
          (c.name, g, a.map(Double.box).orNull, b.map(Double.box).orNull, comb)
        })
        s.createDataFrame(rows)
          .toDF("comparison", "gamma", "m_zip3", "m_name_yob", "m_combined")
      },
      Some {
        val levelRows = comparisons
          .flatMap(c => c.params.map { case (g, _, _) => s"('${c.name}', $g)" })
          .mkString(", ")
        s"""$base,
           |${emSessionCtes(emPasses(0), 3, "z")},
           |${emSessionCtes(emPasses(1), 3, "y")},
           |levels AS (SELECT * FROM (VALUES $levelRows) AS t(comparison, gamma))
           |SELECT l.comparison, l.gamma, z.m AS m_zip3, y.m AS m_name_yob,
           |       CASE WHEN z.m IS NULL THEN y.m WHEN y.m IS NULL THEN z.m
           |            ELSE round((z.m + y.m) / 2, 6) END AS m_combined
           |FROM levels l
           |LEFT JOIN m_z_3 z ON z.comparison = l.comparison AND z.gamma = l.gamma
           |LEFT JOIN m_y_3 y ON y.comparison = l.comparison AND y.gamma = l.gamma""".stripMargin
      }
    ),
    QueryDef(
      // Splink's estimate_m_from_label_column — the third m-training path
      // beside random-sampled u (q30) and EM (q31/q105): with ground-truth
      // labels, m is COUNTED directly as P(gamma = g | true match) over
      // the labeled pair set (null-level pairs excluded per comparison,
      // like the EM normalization). One identity join + one stacked
      // aggregate; at scale the join is on the label key, and the output
      // is O(levels).
      "q115_m_from_labels",
      (s, d) => {
        reg(s)
        val cen = census(s, d)
        val inp = input(s, d)
        val l = cen.select(cen.columns.map(c => col(c).as(s"l_$c")): _*)
        val r = inp.select(inp.columns.map(c => col(c).as(s"r_$c")): _*)
        val truth = l.join(r, col("l_pik") === col("r_rec_id"))
        val withGammas = comparisons.foldLeft(truth) { (df, c) =>
          df.withColumn(c.gammaName, FellegiSunter.gammaCol(c))
        }
        val stacked = withGammas
          .select(explode(array(comparisons.map(c =>
            struct(lit(c.name).as("comparison"), col(c.gammaName).as("gamma"))): _*)).as("e"))
          .select(col("e.comparison").as("comparison"), col("e.gamma").as("gamma"))
          .filter(col("gamma") =!= -1)
        stacked.groupBy("comparison", "gamma")
          .agg(count(lit(1)).as("n"))
          .withColumn("m_label",
            round(col("n").cast("double") /
              sum("n").over(Window.partitionBy("comparison")).cast("double"), 6))
      },
      Some {
        val stackedSel = comparisons.map(c =>
          s"SELECT '${c.name}' AS comparison, ${c.gammaName} AS gamma FROM tg " +
            s"WHERE ${c.gammaName} <> -1")
          .mkString("\n  UNION ALL\n  ")
        s"""$base,
           |tg AS (
           |  SELECT $gammaSelects
           |  FROM census c JOIN input i ON c.pik = i.rec_id),
           |stacked AS (
           |  $stackedSel)
           |SELECT comparison, gamma, COUNT(*) AS n,
           |       round(CAST(COUNT(*) AS DOUBLE) /
           |             CAST(SUM(COUNT(*)) OVER (PARTITION BY comparison) AS DOUBLE), 6)
           |         AS m_label
           |FROM stacked GROUP BY comparison, gamma""".stripMargin
      }
    ),
    QueryDef(
      // Splink's accuracy-from-labels / ROC surface: precision and recall
      // at EVERY integer match-weight threshold over the labeled scored
      // pairs (truth = pik == rec_id). No threshold×pairs join: pairs
      // collapse to per-integer-weight buckets (one aggregate), thresholds
      // union in as empty buckets, and a descending cumulative window
      // yields n_predicted/true-positives per threshold — O(pairs) work,
      // O(thresholds) output, at any scale.
      "q114_threshold_sweep",
      (s, d) => {
        reg(s)
        val buckets = scoredBlock(s, d)
          .select(floor(col("match_weight")).cast("long").as("wb"),
            when(col("pik") === col("rec_id"), 1L).otherwise(0L).as("correct"))
          .groupBy("wb")
          .agg(count(lit(1)).as("n"), sum("correct").as("tp"))
        val thr = s.range(-10, 31).select(col("id").as("wb"),
          lit(0L).as("n"), lit(0L).as("tp"))
        val allb = buckets.unionByName(thr)
          .groupBy("wb").agg(sum("n").as("n"), sum("tp").as("tp"))
        val desc = Window.orderBy(col("wb").desc)
        val cum = desc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val full = desc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        allb
          .withColumn("n_pred", sum("n").over(cum))
          .withColumn("n_tp", sum("tp").over(cum))
          .withColumn("n_true", sum("tp").over(full))
          .filter(col("wb").between(-10, 30))
          .select(col("wb").as("threshold"), col("n_pred"), col("n_tp"), col("n_true"),
            when(col("n_pred") === 0L, lit(null).cast("double"))
              .otherwise(round(col("n_tp").cast("double") / col("n_pred").cast("double"), 6))
              .as("precision_"),
            round(col("n_tp").cast("double") / col("n_true").cast("double"), 6)
              .as("recall_"))
      },
      Some(s"""$base,
              |cand AS (
              |  SELECT c.pik, i.rec_id,
              |         $gammaSelects
              |  FROM census c JOIN input i ON c.zip3 = i.zip3),
              |swp AS (
              |  SELECT pik, rec_id, ${FellegiSunter.matchWeightSql(comparisons)} AS mw
              |  FROM cand),
              |buckets AS (
              |  SELECT CAST(floor(mw) AS BIGINT) AS wb, CAST(COUNT(*) AS BIGINT) AS n,
              |         CAST(SUM(CASE WHEN pik = rec_id THEN 1 ELSE 0 END) AS BIGINT) AS tp
              |  FROM swp GROUP BY 1),
              |thr AS (SELECT CAST(t AS BIGINT) AS wb, CAST(0 AS BIGINT) AS n,
              |               CAST(0 AS BIGINT) AS tp
              |        FROM range(-10, 31) r(t)),
              |allb AS (
              |  SELECT wb, SUM(n) AS n, SUM(tp) AS tp
              |  FROM (SELECT * FROM buckets UNION ALL SELECT * FROM thr) u GROUP BY wb),
              |cum AS (
              |  SELECT wb,
              |         SUM(n) OVER (ORDER BY wb DESC ROWS UNBOUNDED PRECEDING) AS n_pred,
              |         SUM(tp) OVER (ORDER BY wb DESC ROWS UNBOUNDED PRECEDING) AS n_tp,
              |         SUM(tp) OVER () AS n_true
              |  FROM allb)
              |SELECT wb AS threshold, CAST(n_pred AS BIGINT) AS n_pred,
              |       CAST(n_tp AS BIGINT) AS n_tp, CAST(n_true AS BIGINT) AS n_true,
              |       CASE WHEN n_pred = 0 THEN NULL
              |            ELSE round(CAST(n_tp AS DOUBLE) / CAST(n_pred AS DOUBLE), 6) END
              |         AS precision_,
              |       round(CAST(n_tp AS DOUBLE) / CAST(n_true AS DOUBLE), 6) AS recall_
              |FROM cum WHERE wb BETWEEN -10 AND 30""".stripMargin)
    ),
    QueryDef(
      // Splink's cumulative_comparisons chart: blocking rules stacked in
      // cascade order — each pass's own pair count, the pairs it is FIRST
      // to generate, and the cumulative distinct total. The dedup is a
      // min-ordinal aggregate on the pair key (one shuffle of ids only —
      // pair payloads never travel), which is how the count stays honest
      // at 100 TB: no pass-by-pass anti-join chain, no pair
      // materialization beyond (pik, rec_id, ordinal).
      "q108_cumulative_comparisons",
      (s, d) => {
        reg(s)
        val inp = input(s, d)
        // Per-pass totals come from the q78 count-product formula (group
        // sizes multiplied per block key — no pair rows exist), so the
        // union of materialized pairs below has exactly ONE consumer: the
        // min-ordinal distinct accounting, which is the only part that
        // genuinely needs to touch every pair. (The first cut aggregated
        // the union twice and re-ran all 13 block joins per consumer:
        // 13 s -> ~6 s at sf0.1.)
        val own = costSummary(s, d)
          .select(col("pass"), col("ordinal"), col("n_pairs"))
        // All 13 rules in ONE equi-join: each side explodes to its
        // per-pass (ordinal, concatenated block key) entries — the same
        // encoding blockCostSummaryAll prices blocks with — so pair
        // generation is a single shuffle on (ordinal, bkey) instead of 13
        // separate joins (13 broadcast builds + 13 codegen'd stages of
        // pure overhead at bench scale; 13 shuffles at cluster scale).
        val sep = "\u0001"
        def entries(df: DataFrame, subset: Seq[(BlockingPass, Int)],
            applyRemap: Boolean, idCol: String): DataFrame =
          df.select(col(idCol), explode(array(subset.map { case (p, ord) =>
              val srcCols = p.blockKeys.map { k =>
                if (applyRemap) col(p.rightRemap.getOrElse(k, k)) else col(k)
              }
              val anyNull = srcCols.map(_.isNull).reduce(_ || _)
              when(anyNull, lit(null)).otherwise(struct(
                lit(ord).as("ordinal"),
                concat_ws(sep, srcCols.map(_.cast("string")): _*).as("bkey")))
            }: _*)).as("e"))
            .filter(col("e").isNotNull)
            .select(col(idCol), col("e.ordinal").as("ordinal"), col("e.bkey").as("bkey"))
        // Census-side entries come from each pass's OWN reference frame
        // (the frames the cascade searches) — one scan per distinct frame.
        val withOrd = passes.zipWithIndex.map { case (p, i) => (p, i + 1) }
        val refsMap = cascadeRefs(s, d)
        val perPass = withOrd.groupBy(_._1.ref).toSeq
          .map { case (ref, subset) =>
            entries(refsMap(ref), subset, applyRemap = false, "pik")
          }
          .reduce(_ unionByName _)
          .join(entries(inp, withOrd, applyRemap = true, "rec_id"), Seq("ordinal", "bkey"))
        val news = perPass.groupBy("pik", "rec_id").agg(min("ordinal").as("ordinal"))
          .groupBy("ordinal").agg(count(lit(1)).as("n_new"))
        val w = Window.orderBy("ordinal")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        own.join(news, Seq("ordinal"), "left")
          .select(col("pass"), col("ordinal"), col("n_pairs"),
            coalesce(col("n_new"), lit(0L)).as("n_new"))
          .withColumn("n_cumulative", sum("n_new").over(w))
      },
      Some {
        val parts = passes.zipWithIndex.map { case (p, i) =>
          val rel = remappedRel("input", p.rightRemap)
          s"""SELECT c.pik AS pik, i.rec_id AS rec_id, ${i + 1} AS ordinal
             |  FROM ${p.ref} c JOIN $rel i ON ${keysOn(p.blockKeys)}""".stripMargin
        }.mkString("\n  UNION ALL\n  ")
        val nameRows = passes.zipWithIndex
          .map { case (p, i) => s"('${p.name}', ${i + 1})" }.mkString(", ")
        s"""$baseWithRefs,
           |pairs_all AS (
           |  $parts),
           |own AS (SELECT ordinal, COUNT(*) AS n_pairs FROM pairs_all GROUP BY 1),
           |firsts AS (SELECT pik, rec_id, MIN(ordinal) AS ordinal
           |           FROM pairs_all GROUP BY 1, 2),
           |news AS (SELECT ordinal, COUNT(*) AS n_new FROM firsts GROUP BY 1),
           |names AS (SELECT * FROM (VALUES $nameRows) AS t(pass, ordinal))
           |SELECT n.pass, n.ordinal,
           |       CAST(coalesce(o.n_pairs, 0) AS BIGINT) AS n_pairs,
           |       CAST(coalesce(w.n_new, 0) AS BIGINT) AS n_new,
           |       CAST(SUM(coalesce(w.n_new, 0)) OVER (ORDER BY n.ordinal
           |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cumulative
           |FROM names n
           |LEFT JOIN own o ON n.ordinal = o.ordinal
           |LEFT JOIN news w ON n.ordinal = w.ordinal""".stripMargin
      }
    ),
    QueryDef(
      "q32_cascade_best_link",
      (s, d) => {
        reg(s)
        cascadeLinks(s, d)
          .select(col("pik"), col("rec_id"), round(col("match_weight"), 6).as("mw"), col("pass"))
      },
      Some(s"""$cascadeSql""".stripMargin)
    ),
    QueryDef(
      // Notebook 04 cells 55/57: accuracy by PVS module — Layne et al.'s
      // per-module comparison surface (the reference notes its sample
      // data INVERTS the real-life geosearch-is-most-accurate pattern).
      // One broadcast dim join over the memoized cascade links.
      "q112_accuracy_by_module",
      (s, d) => {
        reg(s)
        val dim = broadcast(
          s.createDataFrame(passModules).toDF("pass", "module_name"))
        cascadeLinks(s, d).join(dim, Seq("pass"))
          .groupBy("module_name")
          .agg(count(lit(1)).as("n_links"),
            sum(when(col("pik") === col("rec_id"), 1L).otherwise(0L)).as("n_correct"))
          .select(col("module_name"), col("n_links"), col("n_correct"),
            round(col("n_correct").cast("double") / col("n_links").cast("double"), 6)
              .as("accuracy"))
      },
      Some(accuracyByModuleSql)
    ),
    QueryDef(
      "q33_accuracy_eval",
      (s, d) => {
        reg(s)
        val links = cascadeLinks(s, d)
        val truth = census(s, d).select(count(lit(1)).as("n_true"))
        links
          .agg(
            count(lit(1)).as("n_links"),
            sum(when(col("pik") === col("rec_id"), 1L).otherwise(0L)).as("n_correct"))
          .crossJoin(truth)
          .select(
            col("n_links"), col("n_correct"), col("n_true"),
            round(col("n_correct").cast("double") / col("n_links").cast("double"), 6).as("precision_"),
            round(col("n_correct").cast("double") / col("n_true").cast("double"), 6).as("recall_"))
      },
      Some(accuracySql)
    ),
    QueryDef(
      // Probable-GQ geokeys + how many records each side loses from
      // address blocking (reference cells 31-33): the skew defusal made
      // visible and hash-verified.
      "q34_gq_blocking_exclusion",
      (s, d) => {
        val i = input(s, d).filter(col("geokey_blk").isNull)
          .groupBy("geokey").agg(count(lit(1)).as("n_input_excluded"))
        val c = census(s, d).filter(col("geokey_blk").isNull)
          .groupBy("geokey").agg(count(lit(1)).as("n_census_excluded"))
        i.join(c, Seq("geokey"), "left")
          .select(col("geokey"), col("n_input_excluded"),
            coalesce(col("n_census_excluded"), lit(0L)).as("n_census_excluded"))
      },
      Some(s"""$base,
              |ig AS (SELECT geokey, COUNT(*) AS n_input_excluded FROM input
              |       WHERE geokey_blk IS NULL GROUP BY geokey),
              |cg AS (SELECT geokey, COUNT(*) AS n_census_excluded FROM census
              |       WHERE geokey_blk IS NULL GROUP BY geokey)
              |SELECT ig.geokey, ig.n_input_excluded,
              |       coalesce(cg.n_census_excluded, 0) AS n_census_excluded
              |FROM ig LEFT JOIN cg ON ig.geokey = cg.geokey""".stripMargin)
    ),
    QueryDef(
      // Pseudo-households approximate household clustering from the
      // blocking geokey (reference cell 128). Ids are contiguous in
      // geokey_blk order via range-partitioned numbering + offsets
      // (DfOps.addContiguousId) — no single-partition global window.
      "q35_pseudo_household",
      (s, d) => {
        val members = input(s, d).filter(col("geokey_blk").isNotNull)
          .groupBy("geokey_blk").agg(count(lit(1)).as("n_members"))
        graft.ops.DfOps.addContiguousId(members, "geokey_blk", "pseudo_household_id")
          .withColumn("pseudo_household_id", col("pseudo_household_id") + 1L)
          .select("pseudo_household_id", "geokey_blk", "n_members")
      },
      Some(s"""$base
              |SELECT row_number() OVER (ORDER BY geokey_blk) AS pseudo_household_id,
              |       geokey_blk, n_members
              |FROM (SELECT geokey_blk, COUNT(*) AS n_members FROM input
              |      WHERE geokey_blk IS NOT NULL GROUP BY geokey_blk) m""".stripMargin)
    ),
    QueryDef(
      // The hhcompsearch module's own links (reference cells 138-142):
      // records only a within-household pass can recover.
      "q36_hhcomp_links",
      (s, d) => {
        reg(s)
        cascadeLinks(s, d)
          .filter(col("pass").isin(hhPasses.map(_.name): _*))
          .select(col("pik"), col("rec_id"), round(col("match_weight"), 6).as("mw"), col("pass"))
      },
      Some(s"""$cascadeCtes
              |SELECT * FROM (
              |$cascadeUnions
              |) u WHERE pass IN (${hhPasses.map(p => s"'${p.name}'").mkString(", ")})""".stripMargin)
    ),
    QueryDef(
      // Post-search confirm (reference cell 79 dates_of_death): links to
      // deceased PIKs are dropped by an anti-join against the numident-
      // style exclusion list.
      "q37_confirm_links",
      (s, d) => {
        reg(s)
        val deceased = People.persons(s, d)
          .filter(pmod(col("k"), lit(89)) === 0)
          .select(col("k").as("pik"))
        LinkageCascade.confirm(cascadeLinks(s, d), deceased)
          .select(col("pik"), col("rec_id"), round(col("match_weight"), 6).as("mw"), col("pass"))
      },
      Some(s"""$cascadeCtes
              |SELECT * FROM (
              |$cascadeUnions
              |) u WHERE pik NOT IN (SELECT k FROM persons WHERE k % 89 = 0)""".stripMargin)
    ),
    QueryDef(
      // λ estimated from record counts with the reference's overlap/
      // duplication assumptions (cells 56-57) — the prior q28 uses.
      "q38_lambda_estimate",
      (s, d) => {
        val nI = input(s, d).count()
        val nC = census(s, d).count()
        val lam = LinkageCascade.lambdaFromCounts(nI.toDouble, nC.toDouble)
        val row = (nI, nC, BigDecimal(lam).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
        s.createDataFrame(Seq(row)).toDF("n_input", "n_census", "lambda_")
      },
      Some(s"""$base
              |SELECT CAST($countInputSql AS BIGINT) AS n_input,
              |       CAST($countCensusSql AS BIGINT) AS n_census,
              |       round(${LinkageCascade.lambdaSql(countInputSql, countCensusSql)}, 12) AS lambda_
              |FROM (SELECT 1) one""".stripMargin)
    ),
    QueryDef(
      // Notebook 04's accuracy surface (reference
      // 04_calculate_ground_truth_accuracy.ipynb): PIK rate — how many
      // input RECORDS received a PIK (distinct rec_id; nickname expansion
      // means rows > records) — alongside correctness, overall ('all') and
      // per cascade pass. The single-row totals frame is an intended
      // broadcast cross join (PlanSpec whitelist).
      "q39_pik_rate",
      (s, d) => {
        reg(s)
        LinkageCascade.pikRateReport(cascadeLinks(s, d), input(s, d))
      },
      Some(pikRateSql)
    ),
    QueryDef(
      // The splink_reports surface (reference diagnostics/splink_reports):
      // m/u/Bayes-factor/match-weight per comparison level, straight from
      // the config the cascade scores with.
      "q75_model_report",
      (s, _) =>
        s.createDataFrame(modelReportRows).toDF("comparison", "col_name",
          "gamma", "level_desc", "m", "u", "bayes_factor", "weight"),
      Some(modelReportSql)
    ),
    QueryDef(
      // Splink waterfall-chart surface: per PAIR, the log2-Bayes-factor
      // contribution of every comparison next to its gamma, plus the total
      // weight — how a reviewer audits WHY one candidate outranked another
      // (the reference saves these per-pass charts in splink_reports).
      // Pure projection over the cached scored demo block: gammas are
      // already materialized, so each contribution is a CASE over an int.
      "q87_waterfall",
      (s, d) => {
        reg(s)
        scoredBlock(s, d).select(
          col("pik") +: col("rec_id") +:
            comparisons.flatMap(c => Seq(
              col(c.gammaName),
              round(FellegiSunter.weightTermCol(c), 6).as(s"bf_${c.name}"))) :+
            round(col("match_weight"), 6).as("mw"): _*)
      },
      Some(s"""$base,
              |cand AS (
              |  SELECT c.pik, i.rec_id,
              |         $gammaSelects
              |  FROM census c JOIN input i ON c.zip3 = i.zip3)
              |SELECT pik, rec_id,
              |       ${comparisons.map(c =>
                s"${c.gammaName}, round((${FellegiSunter.weightTermSql(c)}), 6) AS bf_${c.name}")
                .mkString(",\n       ")},
              |       round(${FellegiSunter.matchWeightSql(comparisons)}, 6) AS mw
              |FROM cand""".stripMargin)
    ),
    QueryDef(
      // Splink comparison_viewer_dashboard surface: the distinct
      // comparison-vector patterns over the demo block with their pair
      // counts. The weight is a pure function of the gamma vector, so
      // max() per group IS the pattern's weight — one hash-agg over the
      // cached scored frame, no re-scoring.
      "q88_comparison_patterns",
      (s, d) => {
        reg(s)
        scoredBlock(s, d)
          .groupBy(comparisons.map(c => col(c.gammaName)): _*)
          .agg(count(lit(1)).as("n_pairs"),
            round(max(col("match_weight")), 6).as("pattern_weight"))
      },
      Some(s"""$base,
              |cand AS (
              |  SELECT c.pik, i.rec_id,
              |         $gammaSelects
              |  FROM census c JOIN input i ON c.zip3 = i.zip3)
              |SELECT ${comparisons.map(_.gammaName).mkString(", ")},
              |       COUNT(*) AS n_pairs,
              |       round(MAX(${FellegiSunter.matchWeightSql(comparisons)}), 6) AS pattern_weight
              |FROM cand
              |GROUP BY ${comparisons.map(_.gammaName).mkString(", ")}""".stripMargin)
    ),
    QueryDef(
      // Splink term-frequency adjustment (beyond the reference's settings,
      // but core PVS/Splink machinery): an exact last-name agreement on
      // SMITH is far weaker evidence than on a rare name, so pairs at the
      // exact ln12 level trade the comparison's GENERIC u for the term's
      // observed frequency — adjustment = log2(u_exact / tf(term)), added
      // to the base match weight (Splink's tf_adjustments with weight 1).
      // Shape: the cached scored frame joins the input side's ln12 (one
      // equi-join), then a broadcast term-frequency dim built from census
      // — at 100 TB the tf dim is |distinct names|, always broadcastable.
      "q92_tf_adjustment",
      (s, d) => {
        reg(s)
        val uExact = comparisons.find(_.name == "last").get.levels.head.u
        val nCen = census(s, d).count()
        val tf = census(s, d).filter(col("ln12").isNotNull)
          .groupBy(col("ln12").as("tf_term"))
          .agg(count(lit(1)).as("tf_cnt"))
        val adjRaw = log2(lit(uExact) * lit(nCen.toDouble) / col("tf_cnt"))
        scoredBlock(s, d)
          .join(broadcast(tf), col("tf_ln12") === col("tf_term"), "left")
          .select(col("pik"), col("rec_id"),
            coalesce(col("tf_cnt"), lit(0L)).as("tf_cnt"),
            round(col("match_weight"), 6).as("base_weight"),
            when(col("gamma_last") === 2 && col("tf_cnt").isNotNull,
              round(adjRaw, 6)).otherwise(lit(0.0)).as("tf_adj"),
            when(col("gamma_last") === 2 && col("tf_cnt").isNotNull,
              round(col("match_weight") + adjRaw, 6))
              .otherwise(round(col("match_weight"), 6)).as("adjusted_weight"))
      }, {
        val uExact = comparisons.find(_.name == "last").get.levels.head.u
        val adjSql = s"log2($uExact * $countCensusSql / tf_cnt)"
        Some(s"""$base,
                |cand AS (
                |  SELECT c.pik, i.rec_id, i.ln12,
                |         $gammaSelects
                |  FROM census c JOIN input i ON c.zip3 = i.zip3),
                |scored AS (
                |  SELECT pik, rec_id, ln12, gamma_last,
                |         ${FellegiSunter.matchWeightSql(comparisons)} AS mw
                |  FROM cand),
                |tf AS (
                |  SELECT ln12 AS tf_term, COUNT(*) AS tf_cnt
                |  FROM census WHERE ln12 IS NOT NULL GROUP BY ln12)
                |SELECT pik, rec_id,
                |       CAST(coalesce(tf_cnt, 0) AS BIGINT) AS tf_cnt,
                |       round(mw, 6) AS base_weight,
                |       CASE WHEN gamma_last = 2 AND tf_cnt IS NOT NULL
                |            THEN round($adjSql, 6) ELSE 0.0 END AS tf_adj,
                |       CASE WHEN gamma_last = 2 AND tf_cnt IS NOT NULL
                |            THEN round(mw + $adjSql, 6)
                |            ELSE round(mw, 6) END AS adjusted_weight
                |FROM scored LEFT JOIN tf ON scored.ln12 = tf.tf_term""".stripMargin)
      }
    ),
    QueryDef(
      // Splink's match-weight distribution chart: integer-bucket histogram
      // of the demo block's match weights with the pair count above the
      // cascade threshold marked out. One hash-agg over the cached scored
      // frame; the floor buckets are sums of shared double literals, so
      // both engines bucket identically.
      "q93_weight_histogram",
      (s, d) => {
        reg(s)
        scoredBlock(s, d)
          .groupBy(floor(col("match_weight")).cast("long").as("weight_bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("match_weight") >= config.thresholdWeight, 1L)
              .otherwise(0L)).as("n_above_threshold"))
      },
      Some(s"""$base,
              |cand AS (
              |  SELECT c.pik, i.rec_id,
              |         $gammaSelects
              |  FROM census c JOIN input i ON c.zip3 = i.zip3),
              |scored AS (
              |  SELECT ${FellegiSunter.matchWeightSql(comparisons)} AS mw
              |  FROM cand)
              |SELECT CAST(FLOOR(mw) AS BIGINT) AS weight_bucket,
              |       COUNT(*) AS n_pairs,
              |       CAST(SUM(CASE WHEN mw >= ${config.thresholdWeight} THEN 1 ELSE 0 END) AS BIGINT) AS n_above_threshold
              |FROM scored""".stripMargin + "\nGROUP BY 1")
    ),
    QueryDef(
      // Splink's dedupe_only link type: the reference file deduped against
      // ITSELF — same FS scoring, but the pair space is the a < b
      // self-join and above-threshold pairs become duplicate CLUSTERS
      // (distributed min-label components), not links. Planted duplicate
      // filings (every pik%13 re-filed under a shifted id with the middle
      // initial missing) must cluster with their originals.
      // Scale note: a SELF-join is quadratic in block size, so dedupe
      // blocking must be far tighter than the linking demo's zip3 block
      // (15k rows / ~10 zip3s ≈ 11M scored pairs — measured 38 s at
      // sf0.1). Two tight union'd rules — exact geokey (the GQ-nulled
      // variant, which also defuses the worst block skew) and full
      // DOB+zip3 — keep blocks at household/birthday size, recover every
      // planted refiling, and run in ~1 s at the same scale.
      "q94_person_dedupe",
      (s, d) => {
        reg(s)
        val cols = Seq("pik", "zip3", "geokey_blk") ++ comparisons.map(_.column)
        val cen = census(s, d).select(cols.map(col): _*)
        val dup = cen.filter(pmod(col("pik"), lit(13)) === 0)
          .withColumn("pik", col("pik") + lit(10000000L))
          .withColumn("middle_initial", lit(null).cast("string"))
          .select(cols.map(col): _*)
        val cen2 = cen.unionByName(dup)
        // Both dedupe blocking rules in ONE self-join (the q108 encoding):
        // each row explodes to its per-rule (rule, concatenated-key)
        // entries and the join runs on that — one shuffle instead of two
        // self-joins, identical pair set after the id-order dedup.
        val rules = Seq(Seq("geokey_blk"), Seq("dob_year", "dob_month", "dob_day", "zip3"))
        val sep = "\u0001"
        val entries = cen2.select(cols.map(col) :+
            explode(array(rules.zipWithIndex.map { case (keys, i) =>
              val srcCols = keys.map(col)
              val anyNull = srcCols.map(_.isNull).reduce(_ || _)
              when(anyNull, lit(null)).otherwise(struct(
                lit(i).as("rule"),
                concat_ws(sep, srcCols.map(_.cast("string")): _*).as("bkey")))
            }: _*)).as("e"): _*)
          .filter(col("e").isNotNull)
          .select(cols.map(col) :+ col("e.rule").as("rule") :+ col("e.bkey").as("bkey"): _*)
        val l = entries.select(entries.columns.map(c =>
          if (c == "rule" || c == "bkey") col(c) else col(c).as(s"l_$c")): _*)
        val r = entries.select(entries.columns.map(c =>
          if (c == "rule" || c == "bkey") col(c) else col(c).as(s"r_$c")): _*)
        // Score BEFORE deduplicating the two rules' pair overlap: the
        // weight is a pure function of the pair's columns, so a pair
        // matched by both rules scores identically under each and the
        // dedup can run on the 2-column thresholded edge set instead of
        // shuffling the full 2×|cols|-wide candidate rows — far fewer
        // bytes through the distinct exchange, identical edges.
        val cand = l.join(r, Seq("rule", "bkey"))
          .filter(col("l_pik") < col("r_pik"))
          .drop("rule", "bkey")
        val scored = LinkageCascade.score(cand, config)
        val edges = scored
          .filter(col("match_weight") >= config.thresholdWeight)
          .select(col("l_pik").as("a"), col("r_pik").as("b"))
          .dropDuplicates(Seq("a", "b"))
        val cc = graft.operators.Components.connectedComponents(
          cen2.select(col("pik").as("node")), edges)
        val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
        cc.join(sizes, Seq("cluster_id"))
          .filter(col("n_members") > 1)
          .select(col("node").as("pik"), col("cluster_id"), col("n_members"),
            (col("node") === col("cluster_id")).as("is_survivor"))
      }, {
        val selfGammas = comparisons
          .map(c => s"${FellegiSunter.gammaSql(c, "a", "b")} AS ${c.gammaName}")
          .mkString(",\n         ")
        val cols = "zip3, geokey_blk, " + comparisons.map(_.column).mkString(", ")
        val dupCols = (Seq("zip3", "geokey_blk") ++ comparisons.map(c =>
          if (c.column == "middle_initial") "CAST(NULL AS VARCHAR) AS middle_initial"
          else c.column)).mkString(", ")
        // The reach CTE is recursive, so the leading WITH of the shared
        // base chain becomes WITH RECURSIVE (DuckDB allows non-recursive
        // CTEs under it).
        Some(s"""${base.replaceFirst("^WITH ", "WITH RECURSIVE ")},
                |census2 AS (
                |  SELECT pik, $cols FROM census
                |  UNION ALL
                |  SELECT pik + 10000000, $dupCols FROM census WHERE pik % 13 = 0),
                |dcand AS (
                |  SELECT a.pik AS pa, b.pik AS pb,
                |         $selfGammas
                |  FROM census2 a JOIN census2 b
                |    ON a.geokey_blk = b.geokey_blk AND a.pik < b.pik
                |  UNION
                |  SELECT a.pik AS pa, b.pik AS pb,
                |         $selfGammas
                |  FROM census2 a JOIN census2 b
                |    ON a.dob_year = b.dob_year AND a.dob_month = b.dob_month
                |   AND a.dob_day = b.dob_day AND a.zip3 = b.zip3 AND a.pik < b.pik),
                |dedges AS (
                |  SELECT pa AS a, pb AS b FROM dcand
                |  WHERE ${FellegiSunter.matchWeightSql(comparisons)} >= ${config.thresholdWeight}),
                |sym AS (SELECT a, b FROM dedges UNION SELECT b, a FROM dedges),
                |reach(src, dst) AS (
                |  SELECT a, b FROM sym
                |  UNION
                |  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a),
                |minreach AS (SELECT src, MIN(dst) AS m FROM reach GROUP BY src),
                |labels AS (
                |  SELECT c.pik, least(c.pik, coalesce(m.m, c.pik)) AS cluster_id
                |  FROM census2 c LEFT JOIN minreach m ON c.pik = m.src),
                |sizes AS (SELECT cluster_id, COUNT(*) AS n_members FROM labels GROUP BY cluster_id)
                |SELECT l.pik, l.cluster_id, s.n_members, l.pik = l.cluster_id AS is_survivor
                |FROM labels l JOIN sizes s ON l.cluster_id = s.cluster_id
                |WHERE s.n_members > 1""".stripMargin)
      }
    ),
    QueryDef(
      // Model calibration: is a predicted 70% match actually a match 70%
      // of the time? The demo block's posterior probabilities bucket into
      // deciles against the synthetic ground truth (pik == rec_id), the
      // reliability-diagram surface for the FS model. Both engines bucket
      // the 6dp-ROUNDED probability, so a decile can't flip on the last
      // ulp of pow(). One hash-agg over the cached scored frame.
      "q95_calibration",
      (s, d) => {
        reg(s)
        val lam = LinkageCascade.estimateLambda(census(s, d), input(s, d))
        val p = round(FellegiSunter.probabilityCol(col("match_weight"), lam), 6)
        scoredBlock(s, d)
          .select(col("pik"), col("rec_id"), p.as("prob"))
          .withColumn("decile", least(lit(9L), floor(col("prob") * 10)).cast("long"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("pik") === col("rec_id"), 1L).otherwise(0L)).as("n_true"))
          .select(col("decile"), col("n_pairs"), col("n_true"),
            round(col("n_true").cast("double") / col("n_pairs").cast("double"), 6)
              .as("true_rate"))
      },
      Some(s"""$base,
              |lam AS (SELECT ${LinkageCascade.lambdaSql(countInputSql, countCensusSql)} AS v),
              |cand AS (
              |  SELECT c.pik, i.rec_id,
              |         $gammaSelects
              |  FROM census c JOIN input i ON c.zip3 = i.zip3),
              |scored AS (
              |  SELECT pik, rec_id, ${FellegiSunter.matchWeightSql(comparisons)} AS match_weight
              |  FROM cand),
              |probs AS (
              |  SELECT pik, rec_id,
              |         round(${FellegiSunter.probabilitySqlDyn("match_weight", "(SELECT v FROM lam)")}, 6) AS prob
              |  FROM scored)
              |SELECT CAST(least(9, CAST(FLOOR(prob * 10) AS BIGINT)) AS BIGINT) AS decile,
              |       COUNT(*) AS n_pairs,
              |       CAST(SUM(CASE WHEN pik = rec_id THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
              |       round(CAST(SUM(CASE WHEN pik = rec_id THEN 1 ELSE 0 END) AS DOUBLE) /
              |             CAST(COUNT(*) AS DOUBLE), 6) AS true_rate
              |FROM probs GROUP BY 1""".stripMargin)
    ),
    QueryDef(
      // Splink count_comparisons pre-flight over every main pass: total
      // candidate pairs against the full input, block count, and the
      // largest single block (the straggler bound that decides salting
      // before a 100 TB run).
      "q78_pair_counts",
      (s, d) =>
        costSummary(s, d), {
        val parts = passes.zipWithIndex.map { case (p, idx) =>
          val keys = p.blockKeys
          val notNull = keys.map(k => s"$k IS NOT NULL").mkString(" AND ")
          val kList = keys.mkString(", ")
          val rel = remappedRel("input", p.rightRemap)
          s"""SELECT '${p.name}' AS pass, ${idx + 1} AS ordinal,
             |       CAST(COALESCE(SUM(n_pairs), 0) AS BIGINT) AS n_pairs,
             |       CAST(COUNT(*) AS BIGINT) AS n_blocks,
             |       CAST(COALESCE(MAX(n_pairs), 0) AS BIGINT) AS max_block_pairs
             |FROM (
             |  SELECT l.n_census * r.n_input AS n_pairs
             |  FROM (SELECT $kList, COUNT(*) AS n_census FROM ${p.ref}
             |        WHERE $notNull GROUP BY $kList) l
             |  JOIN (SELECT $kList, COUNT(*) AS n_input FROM $rel i0
             |        WHERE $notNull GROUP BY $kList) r
             |  ON ${keys.map(k => s"l.$k = r.$k").mkString(" AND ")}) t""".stripMargin
        }
        Some(s"$baseWithRefs\n${parts.mkString("\nUNION ALL\n")}")
      }
    ),
    QueryDef(
      // Blocking recall per pass: of the TRUE (pik == rec_id) pairs, how
      // many agree on the pass's block keys — the fraction of real
      // matches the pass's blocking can even SEE. The complement of q78:
      // q78 prices a pass's cost, this measures its reach; together they
      // are the blocking-design loop. One identity join, one explode —
      // the per-pass conditions evaluate on the joined row, so 13 passes
      // cost one scan.
      "q85_blocking_recall",
      (s, d) => {
        reg(s)
        // True pairs join the input against each pass's OWN reference
        // frame (the frame the cascade searches) — alternate rows of a pik
        // are distinct true pairs, so a pass reachable only through an
        // alternate (class M) shows up in its recall. One truth join per
        // distinct ref frame; the per-pass hit flags evaluate on the
        // joined row, so the pass count doesn't multiply the joins.
        val r = input(s, d).select(input(s, d).columns.map(c =>
          col(c).as(s"r_$c")): _*)
        val refsMap = cascadeRefs(s, d)
        passes.zipWithIndex.groupBy(_._1.ref).toSeq
          .map { case (ref, subset) =>
            val f = refsMap(ref)
            val l = f.select(f.columns.map(c => col(c).as(s"l_$c")): _*)
            val truth = l.join(r, col("l_pik") === col("r_rec_id"))
            val entries = explode(array(subset.map { case (p, i) =>
              val eq = p.blockKeys.map { k =>
                val rk = p.rightRemap.getOrElse(k, k)
                col(s"l_$k") === col(s"r_$rk")
              }.reduce(_ && _)
              struct(lit(p.name).as("pass"), lit(i + 1).as("ordinal"),
                when(eq, 1L).otherwise(0L).as("hit"))
            }: _*))
            truth.select(entries.as("e"))
              .select(col("e.pass").as("pass"), col("e.ordinal").as("ordinal"),
                col("e.hit").as("hit"))
          }
          .reduce(_ unionByName _)
          .groupBy("pass", "ordinal")
          .agg(count(lit(1)).as("n_true_pairs"), sum("hit").as("n_coblocked"))
          .select(col("pass"), col("ordinal"), col("n_true_pairs"),
            col("n_coblocked"),
            round(col("n_coblocked").cast("double") /
              col("n_true_pairs").cast("double"), 6).as("recall"))
      }, {
        val parts = passes.zipWithIndex.map { case (p, i) =>
          val eq = p.blockKeys.map { k =>
            val rk = p.rightRemap.getOrElse(k, k)
            s"c.$k = i.$rk"
          }.mkString(" AND ")
          s"""SELECT '${p.name}' AS pass, ${i + 1} AS ordinal,
             |       COUNT(*) AS n_true_pairs,
             |       CAST(SUM(CASE WHEN $eq THEN 1 ELSE 0 END) AS BIGINT) AS n_coblocked,
             |       round(CAST(SUM(CASE WHEN $eq THEN 1 ELSE 0 END) AS DOUBLE) /
             |             CAST(COUNT(*) AS DOUBLE), 6) AS recall
             |FROM ${p.ref} c JOIN input i ON c.pik = i.rec_id""".stripMargin
        }
        Some(s"$baseWithRefs\n${parts.mkString("\nUNION ALL\n")}")
      }
    ),
    QueryDef(
      // Notebook 04 cell 10: how many input rows share each assigned PIK
      // — sizes > 1 flag suspected in-file duplicates (pseudopeople
      // sometimes gives siblings the same common first name).
      "q83_pik_sizes",
      (s, d) => {
        reg(s)
        cascadeLinks(s, d)
          .groupBy("pik").agg(count(lit(1)).as("pik_size"))
          .groupBy("pik_size").agg(count(lit(1)).as("n_piks"))
      },
      Some(pikSizesSql)
    ),
    QueryDef(
      // Notebook 04 cells 19/66: how much of the input is REACHABLE —
      // records whose true identity exists in the reference at all — and
      // how many reachable records the cascade nonetheless missed. The
      // unPIKable remainder bounds every accuracy number downstream.
      "q84_possible_to_pik",
      (s, d) => {
        reg(s)
        // ONE aggregate job instead of four count() actions: every PIKed
        // rec_id comes from the input by construction, so all four
        // counters fall out of a single flagged join over the record set.
        val recs = input(s, d).select("rec_id").distinct()
        val truth = census(s, d).select(col("pik").as("rec_id")).distinct()
          .withColumn("in_truth", lit(1))
        val piked = cascadeLinks(s, d).select("rec_id").distinct()
          .withColumn("is_piked", lit(1))
        val agg = recs
          .join(truth, Seq("rec_id"), "left")
          .join(piked, Seq("rec_id"), "left")
          .agg(
            count(lit(1)).as("n_records"),
            sum(when(col("in_truth") === 1, 1L).otherwise(0L)).as("n_possible"),
            sum(when(col("is_piked") === 1, 1L).otherwise(0L)).as("n_piked"),
            sum(when(col("in_truth") === 1 && col("is_piked").isNull, 1L).otherwise(0L))
              .as("n_missed"))
          .head
        val (nRecords, nPossible, nPiked, nMissed) =
          (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
        def r6(x: Double): Double =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val row = (nRecords, nPossible, nPiked, nMissed,
          r6(nPossible.toDouble / nRecords.toDouble),
          if (nPossible == 0L) 0.0 else r6(nMissed.toDouble / nPossible.toDouble))
        s.createDataFrame(Seq(row)).toDF("n_records", "n_possible",
          "n_piked", "n_missed", "possible_rate", "missed_rate")
      },
      Some(possibleToPikSql)
    ),
    QueryDef(
      // Splink's unlinkables chart: each input record's best-achievable
      // match weight (top agreement level on every non-null column, the
      // null level contributing 0), histogrammed with the cumulative
      // record proportion. Records whose ceiling sits below the
      // threshold can NEVER link regardless of blocking — the data-
      // quality floor notebook 03 inspects per pass. The cumulative
      // window runs over the aggregated distinct-weight frame (bounded
      // by the model's level combinations, not the data), so the
      // unpartitioned window is O(levels), never O(rows).
      "q80_unlinkables",
      (s, d) => {
        val selfWeight = comparisons.map { c =>
          val (_, m, u) = c.params.head
          when(col(c.column).isNull, lit(0.0))
            .otherwise(lit(r12(log2d(m / u))))
        }.reduce(_ + _)
        val hist = input(s, d)
          .select(round(selfWeight, 6).as("self_weight"))
          .groupBy("self_weight").agg(count(lit(1)).as("n_records"))
        val total = hist.agg(sum("n_records")).first().getLong(0).toDouble
        // The cumsum window runs over the HISTOGRAM (one row per distinct
        // null-pattern weight, <= 2^|comparisons| rows at any data scale),
        // so a single partition is bounded by the model, not the data. The
        // partition key is constant-VALUED but must not be constant-FOLDABLE:
        // Spark's EliminateWindowPartitions strips foldable keys and the
        // window would plan unpartitioned again (tripping WindowExec's
        // single-partition warning, which is a lie here — the frame is tiny).
        hist.withColumn("cum_proportion",
          round(
            sum("n_records").over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("self_weight") * lit(0.0))
              .orderBy("self_weight")
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
              .cast("double") / lit(total), 6))
      }, {
        val terms = comparisons.map { c =>
          val (_, m, u) = c.params.head
          s"(CASE WHEN ${c.column} IS NULL THEN 0.0 ELSE ${r12(log2d(m / u))} END)"
        }.mkString(" + ")
        Some(s"""$base,
                |hist AS (
                |  SELECT round($terms, 6) AS self_weight, COUNT(*) AS n_records
                |  FROM input GROUP BY 1)
                |SELECT self_weight, n_records,
                |       round(CAST(SUM(n_records) OVER (ORDER BY self_weight
                |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                |             / (SELECT CAST(SUM(n_records) AS DOUBLE) FROM hist), 6) AS cum_proportion
                |FROM hist""".stripMargin)
      }
    ),
    QueryDef(
      // Per-module matching_columns/cut_columns configuration as a table:
      // which comparisons each pass scores, blocking-implied constant
      // gammas, and the hhcomp weight offset.
      "q76_pass_matrix",
      (s, _) =>
        s.createDataFrame(passMatrixRows).toDF("pass", "ordinal",
          "ref_file", "block_keys", "name_switch", "comparison", "scored",
          "const_gamma", "weight_offset"),
      Some(passMatrixSql)
    ),
    QueryDef(
      // The Movers module (reference 03 cell 99): households with >1
      // member and ZERO PIKs after the full cascade are searched as a
      // unit — members block on person attributes only, and links need
      // >=2 distinct members matching >=2 distinct PIKs at one reference
      // address. Positioned AFTER hhcompsearch: the eligibility anti-set
      // is the complete 15-pass link set.
      "q128_movers",
      (s, d) => {
        reg(s)
        LinkageCascade.moversStage(census(s, d), input(s, d),
            cascadeLinks(s, d), config, moversPass)
          .select(col("pik"), col("rec_id"),
            round(col("match_weight"), 6).as("mw"), col("pass"))
      },
      Some(moversSql)
    ),
    QueryDef(
      // ZIP3 Adjacency Search (reference 03 cell 98): the two geosearch
      // street-soundex passes re-run over the cascade remainder with the
      // zip3 cut widened to {z-1, z, z+1} — recovers short-distance
      // movers whose new address crosses a zip3 boundary, which the
      // exact-zip3 cut provably misses. The adjacency explode runs on
      // the REMAINDER side (the small post-cascade residue), not the
      // national GeoBase: the candidate set is identical (z_in adjacent
      // to z_ref is symmetric) but the 3× row blow-up lands on the side
      // that is orders of magnitude smaller at scale, and the reference
      // file shuffles at its natural size. The oracle SQL explodes the
      // same side so the wrap-edge rendering (lpad truncation at
      // 999+1/000-1) cannot diverge between engines.
      "q129_zip3_adjacency",
      (s, d) => {
        reg(s)
        val links = cascadeLinks(s, d)
        // Materialized: rem feeds pass 1's predict, pass 2's remainder
        // derivation AND (via rem2) pass 2's predict; l1 feeds both the
        // pass-2 anti-join and the final union — without the barriers
        // each consumer re-runs the anti-join / the whole pass-1 predict
        // (the foldPasses checkpoint discipline, applied to this manual
        // two-pass chain). l1 is ids + weight; rem is the small
        // post-cascade residue.
        val rem = input(s, d)
          .join(links.select("rec_id").distinct(), Seq("rec_id"), "left_anti")
          .localCheckpoint()
        val ref = geobase(s, d)
        val z1 = zip3AdjPasses(0)
        val z2 = zip3AdjPasses(1)
        // Both passes predict CONCURRENTLY over the same checkpointed
        // remainder (the foldPasses lookahead shape, guide §2.6): records
        // are independent within a pass and zip3Adjacent is a row-local
        // explode, so predict(ref, zip3Adjacent(rem ∖ L1), z2) ≡
        // predict(ref, zip3Adjacent(rem), z2) filtered to rec_id ∉ L1 —
        // the anti-join below applies that filter to the materialized
        // KB-scale link frames, links identical (oracle green).
        val zadj = LinkageCascade.zip3Adjacent(rem)
        import scala.concurrent.duration.Duration
        import scala.concurrent.{Await, ExecutionContext, Future}
        implicit val ec: ExecutionContext = ExecutionContext.global
        val l1F = Future(LinkageCascade.predict(ref, zadj, z1, config)
          .withColumn("pass", lit(z1.name))
          .localCheckpoint())
        val l2F = Future(LinkageCascade.predict(ref, zadj, z2, config)
          .withColumn("pass", lit(z2.name))
          .localCheckpoint())
        val l1 = Await.result(l1F, Duration.Inf)
        val l2 = Await.result(l2F, Duration.Inf)
          .join(l1.select("rec_id"), Seq("rec_id"), "left_anti")
        l1.unionByName(l2)
          .select(col("pik"), col("rec_id"),
            round(col("match_weight"), 6).as("mw"), col("pass"))
      },
      Some(zip3AdjSql)
    ),
    QueryDef(
      // MAFMatch (reference 03 cell 24): both sides resolve their address
      // sans zipcode against the Master Address File, minting a MAFID
      // used as a blocking key — records whose zip rendering is broken
      // (the k%17 zip-typo class) block against their census twin even
      // though geokey equality (p1/p2) misses them.
      "q130_mafmatch",
      (s, d) => {
        reg(s)
        val maf = mafFrame(s, d)
        def withMaf(side: DataFrame): DataFrame =
          side.join(maf,
            regexp_replace(side("geokey"), "\\|[^|]*$", "") === maf("maf_key"))
            .drop("maf_key")
        LinkageCascade.predict(
            withMaf(census(s, d)), withMaf(input(s, d)), mafPass, config)
          .withColumn("pass", lit(mafPass.name))
          .select(col("pik"), col("rec_id"),
            round(col("match_weight"), 6).as("mw"), col("pass"))
      },
      Some(mafSql)
    ),
    QueryDef(
      // TIGER-style geocode attachment after MAFMatch (reference 03 cell
      // 24: the real PVS carries MAFID → census tract/block codes; the
      // reference skips the attach). The join SHAPE is the deliverable:
      // geography is a typed-metadata dim keyed by mafid — broadcast
      // against the resolved input side, one narrow join, so the real
      // TIGER file drops in by replacing the dim. The dim here derives
      // tract/block deterministically from the mafid (multiplicative
      // arithmetic both engines reproduce) — a synthetic stand-in with
      // the real file's key structure.
      "q138_geocode_attach",
      (s, d) => {
        reg(s)
        val maf = mafFrame(s, d)
        val geo = maf.select(col("maf_key"), col("mafid"),
          lpad(pmod(pmod(col("mafid") * 7919, lit(104729)), lit(10000))
            .cast("string"), 6, "0").as("tract"),
          lpad(pmod(pmod(col("mafid") * 3571, lit(104707)), lit(1000))
            .cast("string"), 4, "0").as("block"))
        val inp = input(s, d).select(col("rec_id"), col("geokey"))
        inp.join(broadcast(geo),
            regexp_replace(inp("geokey"), "\\|[^|]*$", "") === geo("maf_key"))
          .select("rec_id", "mafid", "tract", "block")
      },
      Some {
        val curKey = geokeySql(Seq("street_num", stdSql("street_raw"),
          stdSql("unit_raw"), "city", "state"))
        val oldKey = geokeySql(Seq("street_num_old", stdSql("street_raw_old"),
          "''", "city_old", "state_old"))
        s"""$base,
           |maf_addr AS (
           |  SELECT DISTINCT maf_key FROM (
           |    SELECT $curKey AS maf_key FROM persons
           |    UNION ALL
           |    SELECT $oldKey AS maf_key FROM persons) u),
           |maf AS MATERIALIZED (
           |  SELECT maf_key, row_number() OVER (ORDER BY maf_key) - 1 AS mafid
           |  FROM maf_addr),
           |geo AS (
           |  SELECT maf_key, mafid,
           |         lpad(CAST((mafid * 7919) % 104729 % 10000 AS VARCHAR), 6, '0') AS tract,
           |         lpad(CAST((mafid * 3571) % 104707 % 1000 AS VARCHAR), 4, '0') AS block
           |  FROM maf)
           |SELECT i.rec_id, g.mafid, g.tract, g.block
           |FROM input i
           |JOIN geo g ON regexp_replace(i.geokey, '\\|[^|]*$$', '') = g.maf_key""".stripMargin
      }
    )
  )

  /** The Master Address File: every distinct sans-zip rendering of a
    * current or previous address in the universe, with a MAFID minted by
    * sorted key (range-partitioned contiguous id — no single-partition
    * window). Old addresses render with an empty unit, exactly like the
    * stale census side, so stale records resolve to their old address's
    * MAFID.
    */
  private[graft] def mafFrame(s: SparkSession, d: String): DataFrame = {
    val p = People.persons(s, d)
    val cur = p.select(Preprocess.geokey(col("street_num"),
      std(col("street_raw")), std(col("unit_raw")),
      col("city"), col("state")).as("maf_key"))
    val old = p.select(Preprocess.geokey(col("street_num_old"),
      std(col("street_raw_old")), lit(""),
      col("city_old"), col("state_old")).as("maf_key"))
    // Materialized: q130 resolves BOTH sides against the MAF (two
    // consumers of this frame) and q138 broadcasts it — without the
    // barrier each consumer re-ran the distinct + the per-partition
    // numbering window over the checkpointed ranged frame. Two narrow
    // columns per distinct address.
    graft.ops.DfOps.addContiguousId(
      cur.unionByName(old).distinct(), "maf_key", "mafid")
      .localCheckpoint()
  }
}
