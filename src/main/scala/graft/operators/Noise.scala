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
}
