package graft.linkage

import graft.functions.GraftFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fellegi-Sunter comparison model, declared once and rendered to BOTH a
  * Spark Column tree and DuckDB SQL — the two engines cannot drift because
  * they share the config object.
  *
  * Reference semantics: Splink comparison levels
  * (/root/reference/03_link_datasets.ipynb "Fellegi-Sunter model":
  * jaro_winkler_at_thresholds, exact middle_initial, numeric abs-diff DOB
  * levels). Everything here resolves to literals and codegen'd scalar
  * expressions at plan time, so a predict pass is ONE join + projections —
  * Catalyst sees through all of it, and at 100 TB the cost is the blocking
  * shuffle alone.
  */
sealed trait LevelPred
final case class JwAtLeast(threshold: Double) extends LevelPred
case object ExactMatch extends LevelPred
final case class AbsDiffAtMost(d: Int) extends LevelPred

/** One agreement level: predicate + fixed m/u probabilities. */
final case class ComparisonLevel(pred: LevelPred, m: Double, u: Double)

/** A comparison over one column shared by both sides. Levels are ordered
  * strongest-first; gamma = numLevels..1, else-level gamma = 0.
  */
final case class Comparison(
    name: String,
    column: String,
    levels: Seq[ComparisonLevel],
    elseM: Double,
    elseU: Double) {
  def gammaName: String = s"gamma_$name"
  def numLevels: Int = levels.size
  /** (gamma → m, u), including the else level at gamma 0. */
  def params: Seq[(Int, Double, Double)] =
    levels.zipWithIndex.map { case (l, i) => (numLevels - i, l.m, l.u) } :+ (0, elseM, elseU)
}

object FellegiSunter {

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  // ---- Spark renderers ---------------------------------------------------

  def predCol(p: LevelPred, l: Column, r: Column): Column = p match {
    case JwAtLeast(t)     => GraftFunctions.jaroWinkler(l, r) >= lit(t)
    case ExactMatch       => l === r
    case AbsDiffAtMost(d) => abs(l - r) <= lit(d)
  }

  /** Gamma level column for a prefixed pair frame (l_/r_ columns). Either
    * side missing → gamma -1, Splink's null_level (reference cell 62
    * cll.null_level): a missing field is no evidence either way, so
    * [[weightTermCol]] maps it to weight 0.
    */
  def gammaCol(c: Comparison): Column = {
    val l = col(s"l_${c.column}")
    val r = col(s"r_${c.column}")
    val chain = c.levels.zipWithIndex.foldLeft(when(l.isNull || r.isNull, lit(-1))) {
      case (acc, (level, i)) =>
        acc.when(predCol(level.pred, l, r), lit(c.numLevels - i))
    }
    chain.otherwise(lit(0))
  }

  /** log2 Bayes factor selected by this comparison's gamma column (null
    * level gamma -1 → 0.0, Bayes factor 1).
    */
  def weightTermCol(c: Comparison): Column = {
    val g = col(c.gammaName)
    val chain = c.params.init.foldLeft(when(g === lit(-1), lit(0.0))) {
      case (acc, (gamma, m, u)) =>
        acc.when(g === lit(gamma), lit(log2(m / u)))
    }
    chain.otherwise(lit(log2(c.elseM / c.elseU)))
  }

  /** Sum of per-comparison weight terms (left-associated, matching SQL). */
  def matchWeightCol(comparisons: Seq[Comparison]): Column =
    comparisons.map(weightTermCol).reduceLeft(_ + _)

  /** Posterior match probability from a weight column (round before
    * comparing across engines — pow may differ in the last ulp).
    */
  def probabilityCol(weight: Column, lambda: Double): Column = {
    val odds = lit(lambda / (1.0 - lambda)) * pow(lit(2.0), weight)
    odds / (odds + lit(1.0))
  }

  // ---- DuckDB-SQL renderers (identical semantics by construction) --------

  def predSql(p: LevelPred, l: String, r: String): String = p match {
    case JwAtLeast(t)     => s"jaro_winkler_similarity($l, $r) >= $t"
    case ExactMatch       => s"$l = $r"
    case AbsDiffAtMost(d) => s"abs($l - $r) <= $d"
  }

  /** Gamma CASE for table aliases (c = left/census, i = right/input).
    * Mirrors [[gammaCol]] including the null level at gamma -1.
    */
  def gammaSql(c: Comparison, la: String, ra: String): String = {
    val l = s"$la.${c.column}"
    val r = s"$ra.${c.column}"
    val cases = c.levels.zipWithIndex.map { case (level, i) =>
      s"WHEN ${predSql(level.pred, l, r)} THEN ${c.numLevels - i}"
    }
    s"CASE WHEN $l IS NULL OR $r IS NULL THEN -1 ${cases.mkString(" ")} ELSE 0 END"
  }

  /** Weight CASE over an existing gamma column. Double literals are printed
    * with shortest-roundtrip repr so both parsers recover identical bits.
    */
  def weightTermSql(c: Comparison): String = {
    val cases = c.params.init.map { case (gamma, m, u) =>
      s"WHEN ${c.gammaName} = $gamma THEN ${log2(m / u)}"
    }
    s"CASE WHEN ${c.gammaName} = -1 THEN 0.0 ${cases.mkString(" ")} ELSE ${log2(c.elseM / c.elseU)} END"
  }

  def matchWeightSql(comparisons: Seq[Comparison]): String =
    comparisons.map(c => s"(${weightTermSql(c)})").mkString(" + ")

  def probabilitySql(weight: String, lambda: Double): String = {
    val priorOdds = lambda / (1.0 - lambda)
    s"(($priorOdds * pow(2, $weight)) / (($priorOdds * pow(2, $weight)) + 1.0))"
  }

  /** As [[probabilitySql]] but with λ supplied as a SQL expression (e.g. a
    * scalar subquery over the estimated prior) — the division mirrors the
    * Scala `lambda / (1.0 - lambda)` so the doubles stay bit-identical.
    */
  def probabilitySqlDyn(weight: String, lambdaExpr0: String): String = {
    val lambdaExpr = s"($lambdaExpr0)" // parenthesize compound expressions
    val po = s"($lambdaExpr / (1.0 - $lambdaExpr))"
    s"(($po * pow(2, $weight)) / (($po * pow(2, $weight)) + 1.0))"
  }
}
