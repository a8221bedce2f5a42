package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-noise operators — the reference's custom noise
  * layer (02_generate_case_study_files.ipynb cells 17-19:
  * split_columns_incorrectly, shuffle_columns, truncate_column). The
  * reference gates rows with NumPy RNG draws; a distributed engine cannot
  * coordinate RNG state across partitions, so rows are gated by a
  * multiplicative hash of a key column (same device as
  * q12_sample_deterministic) — reproducible under any partitioning and
  * renderable identically in DuckDB SQL. All transforms project
  * SIMULTANEOUSLY (one select over the input row — later outputs must
  * never observe earlier outputs' overwrites) and stay inside codegen.
  * Hash arithmetic keeps products within BIGINT (DuckDB raises on
  * overflow where the JVM wraps).
  */
object Noise {

  /** Bernoulli(prob) gate keyed on `key` (+seed), in parts-per-million. */
  def gate(key: Column, prob: Double, seed: Int): Column =
    pmod((key + lit(seed)) * lit(2654435761L), lit(1000000L)) <
      lit(math.round(prob * 1e6))

  def gateSql(key: String, prob: Double, seed: Int): String =
    s"(($key + $seed) * 2654435761 % 1000000 + 1000000) % 1000000 < ${math.round(prob * 1e6)}"

  private def permIdx(key: Column, seed: Int, n: Int): Column =
    pmod(pmod((key + lit(seed)) * lit(5167L), lit(104729L)), lit(n))

  private def permIdxSql(key: String, seed: Int, n: Int): String =
    s"(((($key + $seed) * 5167 % 104729 + 104729) % 104729) % $n)"

  /** Replaces `cols` in one simultaneous projection, leaving the rest. */
  private def project(df: DataFrame, outs: Map[String, Column]): DataFrame =
    df.select(df.columns.map(c => outs.getOrElse(c, col(c)).as(c)): _*)

  /** reference truncate_column: hash-selected cells keep only the first
    * `len` chars (IRS-style "first four letters of the last name").
    */
  def truncateColumn(df: DataFrame, column: String, key: String,
      cellProbability: Double, len: Int, seed: Int): DataFrame =
    project(df, Map(column ->
      when(gate(col(key), cellProbability, seed), substring(col(column), 1, len))
        .otherwise(col(column))))

  def truncateColumnSql(column: String, key: String, cellProbability: Double,
      len: Int, seed: Int): String =
    s"CASE WHEN ${gateSql(key, cellProbability, seed)} THEN substr($column, 1, $len) ELSE $column END"

  /** reference shuffle_columns: selected rows permute the values among
    * `cols`. The permutation index derives from the key hash; the full
    * permutation table is expanded at plan time (|cols|! CASE arms —
    * fine for name-part counts).
    */
  def shuffleColumns(df: DataFrame, cols: Seq[String], key: String,
      rowProbability: Double, seed: Int): DataFrame = {
    val perms = cols.permutations.toSeq
    val idx = permIdx(col(key), seed, perms.size)
    val g = gate(col(key), rowProbability, seed)
    project(df, cols.zipWithIndex.map { case (c, i) =>
      val shuffled = perms.zipWithIndex.tail
        .foldLeft(when(idx === 0, col(perms.head(i)))) {
          case (w, (p, pi)) => w.when(idx === pi, col(p(i)))
        }.otherwise(col(c))
      c -> when(g, shuffled).otherwise(col(c))
    }.toMap)
  }

  def shuffleColumnsSql(cols: Seq[String], key: String, rowProbability: Double,
      seed: Int): Map[String, String] = {
    val perms = cols.permutations.toSeq
    val idx = permIdxSql(key, seed, perms.size)
    val g = gateSql(key, rowProbability, seed)
    cols.zipWithIndex.map { case (c, i) =>
      val arms = perms.zipWithIndex
        .map { case (p, pi) => s"WHEN $idx = $pi THEN ${p(i)}" }.mkString(" ")
      c -> s"CASE WHEN $g THEN (CASE $arms END) ELSE $c END"
    }.toMap
  }

  /** reference split_columns_incorrectly: join the name parts, split on
    * space/hyphen, and re-distribute the tokens across the columns at
    * arithmetic boundaries — wrong boundaries for most multi-token names,
    * exactly the "data entry split the full name wrong" failure the
    * reference simulates. A column left with no tokens becomes NULL.
    */
  def splitColumnsIncorrectly(df: DataFrame, cols: Seq[String], key: String,
      rowProbability: Double, seed: Int): DataFrame = {
    val c = cols.size
    val full = trim(regexp_replace(concat_ws(" ", cols.map(col): _*), "[ -]+", " "))
    val toks = split(full, " ")
    val n = size(toks)
    def bnd(i: Int): Column = floor((n * i + lit(c - 1)) / lit(c)).cast("int")
    val g = gate(col(key), rowProbability, seed)
    project(df, cols.zipWithIndex.map { case (cName, i) =>
      val part = array_join(slice(toks, bnd(i) + 1, bnd(i + 1) - bnd(i)), " ")
      cName -> when(g,
        when(part === "", lit(null).cast("string")).otherwise(part))
        .otherwise(col(cName))
    }.toMap)
  }

  def splitColumnsIncorrectlySql(cols: Seq[String], key: String,
      rowProbability: Double, seed: Int): Map[String, String] = {
    val c = cols.size
    val full =
      s"trim(regexp_replace(concat_ws(' ', ${cols.mkString(", ")}), '[ -]+', ' ', 'g'))"
    val toks = s"string_split($full, ' ')"
    val n = s"len($toks)"
    def bnd(i: Int): String = s"CAST(floor(($n * $i + ${c - 1}) / $c) AS INTEGER)"
    val g = gateSql(key, rowProbability, seed)
    cols.zipWithIndex.map { case (cName, i) =>
      val part = s"array_to_string(list_slice($toks, ${bnd(i)} + 1, ${bnd(i + 1)}), ' ')"
      cName -> (s"CASE WHEN $g THEN (CASE WHEN $part = '' THEN NULL ELSE $part END) " +
        s"ELSE $cName END")
    }.toMap
  }

  // ---- pseudopeople column-noise types (notebook 01, cell 16) ------------

  /** pseudopeople make_typos: cell_probability of the row key picking the
    * cell, then token_probability per character (QWERTY-adjacent
    * substitution, [[graft.functions.CharNoiseImpl]]).
    */
  def makeTypos(df: DataFrame, column: String, key: String,
      cellProbability: Double, tokenProbability: Double, seed: Int): DataFrame =
    project(df, Map(column ->
      when(gate(col(key), cellProbability, seed),
        graft.functions.GraftFunctions.typoNoise(col(column), col(key),
          math.round(tokenProbability * 1e6), seed + 1))
        .otherwise(col(column))))

  /** pseudopeople write_wrong_digits: as [[makeTypos]] but each gated
    * digit character becomes a different digit.
    */
  def writeWrongDigits(df: DataFrame, column: String, key: String,
      cellProbability: Double, tokenProbability: Double, seed: Int): DataFrame =
    project(df, Map(column ->
      when(gate(col(key), cellProbability, seed),
        graft.functions.GraftFunctions.wrongDigits(col(column), col(key),
          math.round(tokenProbability * 1e6), seed + 1))
        .otherwise(col(column))))

  /** Per-character transform shared by the two char-noise SQL renderers:
    * list_transform over character positions with the same hash
    * arithmetic as the JVM kernel, concatenated back in order.
    */
  private def charNoiseSql(column: String, key: String, tokenPpm: Long,
      seed: Int)(replaceCase: (String, String) => String): String = {
    val base = s"($key * 131 + i + $seed)"
    val cur = s"substr($column, CAST(i + 1 AS INT), 1)"
    s"CASE WHEN $column IS NULL THEN NULL WHEN length($column) = 0 THEN '' " +
      s"ELSE list_aggregate(list_transform(range(0, length($column)), i -> " +
      s"CASE WHEN ($base * 2654435761 % 1000000 + 1000000) % 1000000 < $tokenPpm " +
      s"THEN ${replaceCase(cur, base)} ELSE $cur END), 'string_agg', '') END"
  }

  def makeTyposSql(column: String, key: String, cellProbability: Double,
      tokenProbability: Double, seed: Int): String = {
    val tokenPpm = math.round(tokenProbability * 1e6)
    val inner = charNoiseSql(column, key, tokenPpm, seed + 1) { (cur, base) =>
      val arms = graft.functions.CharNoiseImpl.adjacency.toSeq.sortBy(_._1)
        .map { case (c, cand) =>
          s"WHEN '$c' THEN substr('$cand', " +
            s"CAST(($base * 5167 % 104729 + 104729) % 104729 % ${cand.length} AS INT) + 1, 1)"
        }.mkString(" ")
      s"(CASE $cur $arms ELSE $cur END)"
    }
    s"CASE WHEN ${gateSql(key, cellProbability, seed)} THEN $inner ELSE $column END"
  }

  def writeWrongDigitsSql(column: String, key: String, cellProbability: Double,
      tokenProbability: Double, seed: Int): String = {
    val tokenPpm = math.round(tokenProbability * 1e6)
    val inner = charNoiseSql(column, key, tokenPpm, seed + 1) { (cur, base) =>
      s"(CASE WHEN $cur BETWEEN '0' AND '9' THEN CAST((CAST($cur AS INT) + 1 + " +
        s"CAST(($base * 5167 % 104729 + 104729) % 104729 % 9 AS INT)) % 10 AS VARCHAR) ELSE $cur END)"
    }
    s"CASE WHEN ${gateSql(key, cellProbability, seed)} THEN $inner ELSE $column END"
  }

  /** pseudopeople leave_blank: hash-selected cells become NULL. */
  def leaveBlank(df: DataFrame, column: String, key: String,
      cellProbability: Double, seed: Int): DataFrame =
    project(df, Map(column ->
      when(gate(col(key), cellProbability, seed), lit(null).cast("string"))
        .otherwise(col(column))))

  def leaveBlankSql(column: String, key: String, cellProbability: Double,
      seed: Int): String =
    s"CASE WHEN ${gateSql(key, cellProbability, seed)} THEN NULL ELSE $column END"

  /** pseudopeople swap_month_and_day: selected rows exchange the two
    * columns (one simultaneous projection — neither side observes the
    * other's overwrite).
    */
  def swapColumns(df: DataFrame, c1: String, c2: String, key: String,
      rowProbability: Double, seed: Int): DataFrame = {
    val g = gate(col(key), rowProbability, seed)
    project(df, Map(
      c1 -> when(g, col(c2)).otherwise(col(c1)),
      c2 -> when(g, col(c1)).otherwise(col(c2))))
  }

  def swapColumnsSql(c1: String, c2: String, key: String,
      rowProbability: Double, seed: Int): Map[String, String] = {
    val g = gateSql(key, rowProbability, seed)
    Map(
      c1 -> s"CASE WHEN $g THEN $c2 ELSE $c1 END",
      c2 -> s"CASE WHEN $g THEN $c1 ELSE $c2 END")
  }

  /** pseudopeople misreport_age shape: selected cells shift an integer
    * column by a hash-picked nonzero delta.
    */
  def perturbInt(df: DataFrame, column: String, key: String,
      cellProbability: Double, deltas: Seq[Int], seed: Int): DataFrame = {
    val idx = permIdx(col(key), seed + 1, deltas.size)
    val shifted = deltas.zipWithIndex.tail
      .foldLeft(when(idx === 0, col(column) + lit(deltas.head))) {
        case (w, (d, i)) => w.when(idx === i, col(column) + lit(d))
      }.otherwise(col(column))
    project(df, Map(column ->
      when(gate(col(key), cellProbability, seed), shifted).otherwise(col(column))))
  }

  def perturbIntSql(column: String, key: String, cellProbability: Double,
      deltas: Seq[Int], seed: Int): String = {
    val idx = permIdxSql(key, seed + 1, deltas.size)
    val arms = deltas.zipWithIndex
      .map { case (d, i) => s"WHEN $idx = $i THEN $column + ($d)" }.mkString(" ")
    s"CASE WHEN ${gateSql(key, cellProbability, seed)} THEN (CASE $arms ELSE $column END) " +
      s"ELSE $column END"
  }

  /** pseudopeople choose_wrong_option: gated cells take a DIFFERENT value
    * from the categorical domain. The hash picks an index; a pick equal to
    * the current value advances to the next option, so a gated cell always
    * changes (pseudopeople samples from the incorrect options only).
    */
  def chooseWrongOption(df: DataFrame, column: String, key: String,
      domain: Seq[String], cellProbability: Double, seed: Int): DataFrame = {
    def pick(idx: Column): Column =
      domain.zipWithIndex.tail.foldLeft(when(idx === 0, lit(domain.head))) {
        case (w, (v, i)) => w.when(idx === i, lit(v))
      }.otherwise(lit(domain.head))
    val idx = permIdx(col(key), seed + 1, domain.size)
    val first = pick(idx)
    val second = pick(pmod(idx + 1, lit(domain.size)))
    project(df, Map(column ->
      when(gate(col(key), cellProbability, seed),
        when(first === col(column), second).otherwise(first))
        .otherwise(col(column))))
  }

  def chooseWrongOptionSql(column: String, key: String, domain: Seq[String],
      cellProbability: Double, seed: Int): String = {
    def pick(idx: String): String = {
      val arms = domain.zipWithIndex
        .map { case (v, i) => s"WHEN $idx = $i THEN '$v'" }.mkString(" ")
      s"(CASE $arms ELSE '${domain.head}' END)"
    }
    val idx = permIdxSql(key, seed + 1, domain.size)
    val first = pick(idx)
    val second = pick(s"(($idx + 1) % ${domain.size})")
    s"CASE WHEN ${gateSql(key, cellProbability, seed)} THEN " +
      s"(CASE WHEN $first = $column THEN $second ELSE $first END) ELSE $column END"
  }

  /** pseudopeople row noise (omit_row / do_not_respond): hash-selected
    * rows drop out of the dataset entirely.
    */
  def omitRows(df: DataFrame, key: String, rowProbability: Double,
      seed: Int): DataFrame =
    df.filter(!gate(col(key), rowProbability, seed))

  def omitRowsSql(key: String, rowProbability: Double, seed: Int): String =
    s"NOT (${gateSql(key, rowProbability, seed)})"

  // ---- config-driven surface ----------------------------------------------

  /** One configured noise operation — the reference's notebook 01 drives
    * pseudopeople from a noise CONFIG (which noise types at which rates
    * per column); this makes that configuration surface DATA rather than
    * a hard-wired call chain. Every case maps 1:1 to an operator above,
    * so a config is exactly as expressive as hand-chaining and
    * [[applyConfig]] folding entry i is definitionally identical to
    * calling operator i — a query that switches from the chain to the
    * equivalent config cannot change its output (q77's oracle hash pins
    * this for the default config).
    */
  sealed trait NoiseOp
  final case class MakeTypos(column: String, cellProbability: Double,
      tokenProbability: Double, seed: Int) extends NoiseOp
  final case class WrongDigits(column: String, cellProbability: Double,
      tokenProbability: Double, seed: Int) extends NoiseOp
  final case class SwapCols(c1: String, c2: String, rowProbability: Double,
      seed: Int) extends NoiseOp
  final case class PerturbIntOp(column: String, cellProbability: Double,
      deltas: Seq[Int], seed: Int) extends NoiseOp
  final case class Blank(column: String, cellProbability: Double,
      seed: Int) extends NoiseOp
  final case class WrongOption(column: String, domain: Seq[String],
      cellProbability: Double, seed: Int) extends NoiseOp
  final case class Truncate(column: String, cellProbability: Double,
      len: Int, seed: Int) extends NoiseOp
  final case class ShuffleCols(cols: Seq[String], rowProbability: Double,
      seed: Int) extends NoiseOp
  final case class SplitCols(cols: Seq[String], rowProbability: Double,
      seed: Int) extends NoiseOp
  final case class OmitRows(rowProbability: Double, seed: Int) extends NoiseOp

  /** Interpret a noise config over a frame: fold the entries in order,
    * each dispatching to its operator. Entries compose the way the
    * operators compose (each is one simultaneous codegen'd projection or
    * a filter), so an N-entry config is N stacked projections — the
    * optimizer collapses adjacent projections, leaving one scan at any
    * config size.
    */
  def applyConfig(df: DataFrame, key: String, ops: Seq[NoiseOp]): DataFrame =
    ops.foldLeft(df) { (d, op) =>
      op match {
        case MakeTypos(c, cp, tp, s)    => makeTypos(d, c, key, cp, tp, s)
        case WrongDigits(c, cp, tp, s)  => writeWrongDigits(d, c, key, cp, tp, s)
        case SwapCols(c1, c2, rp, s)    => swapColumns(d, c1, c2, key, rp, s)
        case PerturbIntOp(c, cp, ds, s) => perturbInt(d, c, key, cp, ds, s)
        case Blank(c, cp, s)            => leaveBlank(d, c, key, cp, s)
        case WrongOption(c, dom, cp, s) => chooseWrongOption(d, c, key, dom, cp, s)
        case Truncate(c, cp, l, s)      => truncateColumn(d, c, key, cp, l, s)
        case ShuffleCols(cs, rp, s)     => shuffleColumns(d, cs, key, rp, s)
        case SplitCols(cs, rp, s)       => splitColumnsIncorrectly(d, cs, key, rp, s)
        case OmitRows(rp, s)            => omitRows(d, key, rp, s)
      }
    }
}
