package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic per-character noise kernels — the pseudopeople column
  * noise types `make_typos` (QWERTY-adjacent substitutions at a
  * token_probability per character) and `write_wrong_digits` (wrong digit
  * at a token_probability per character) that the reference cranks up in
  * 01_generate_pseudopeople_simulated_datasets.ipynb cell 16
  * (cell_probability 0.1, token_probability 0.1 on name/street columns).
  *
  * pseudopeople gates each character with an RNG draw; a distributed
  * engine cannot coordinate RNG state across partitions, so each character
  * position is gated by a multiplicative hash of (row key, position, seed)
  * — reproducible under any partitioning and rendered identically in
  * DuckDB (list_transform over the same arithmetic; see
  * [[graft.operators.Noise.typoNoiseSql]]). All products stay within
  * BIGINT for keys below ~3e9, so DuckDB (which raises on overflow where
  * the JVM wraps) computes the identical values.
  */
object CharNoiseImpl {

  /** QWERTY adjacency for uppercase letters (the synthetic names are
    * upper-cased); characters outside the map pass through unchanged.
    * Both the JVM kernel and the SQL CASE render from this one table.
    */
  val adjacency: Map[Char, String] = Map(
    'A' -> "QWSZ", 'B' -> "VGHN", 'C' -> "XDFV", 'D' -> "SERFCX",
    'E' -> "WSDR", 'F' -> "DRTGVC", 'G' -> "FTYHBV", 'H' -> "GYUJNB",
    'I' -> "UJKO", 'J' -> "HUIKNM", 'K' -> "JIOLM", 'L' -> "KOP",
    'M' -> "NJK", 'N' -> "BHJM", 'O' -> "IKLP", 'P' -> "OL",
    'Q' -> "WA", 'R' -> "EDFT", 'S' -> "AWEDXZ", 'T' -> "RFGY",
    'U' -> "YHJI", 'V' -> "CFGB", 'W' -> "QASE", 'X' -> "ZSDC",
    'Y' -> "TGHU", 'Z' -> "ASX")

  @inline private def charBase(key: Long, pos: Int, seed: Int): Long =
    key * 131L + pos + seed

  @inline private def gateHit(base: Long, tokenPpm: Long): Boolean =
    java.lang.Math.floorMod(base * 2654435761L, 1000000L) < tokenPpm

  @inline private def pickIdx(base: Long, n: Int): Int =
    (java.lang.Math.floorMod(base * 5167L, 104729L) % n).toInt

  def typo(s: UTF8String, key: Long, tokenPpm: Long, seed: Int): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      val base = charBase(key, i, seed)
      val cand = adjacency.getOrElse(c, null)
      if (cand != null && gateHit(base, tokenPpm))
        sb.append(cand.charAt(pickIdx(base, cand.length)))
      else sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def wrongDigits(s: UTF8String, key: Long, tokenPpm: Long, seed: Int): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      val base = charBase(key, i, seed)
      if (c >= '0' && c <= '9' && gateHit(base, tokenPpm)) {
        val d = (c - '0' + 1 + pickIdx(base, 9)) % 10
        sb.append(('0' + d).toChar)
      } else sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd pseudopeople `make_typos`: QWERTY-adjacent substitution per
  * hash-gated character position. `left` is the string column, `right`
  * the BIGINT row key; token probability (ppm) and seed are plan-time
  * constants.
  */
case class TypoNoiseExpr(left: Expression, right: Expression,
    tokenPpm: Long, seed: Int) extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "typo_noise"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    CharNoiseImpl.typo(l.asInstanceOf[UTF8String], r.asInstanceOf[Long],
      tokenPpm, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CharNoiseImpl.typo($a, $b, ${tokenPpm}L, $seed)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TypoNoiseExpr =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd pseudopeople `write_wrong_digits`: each hash-gated digit
  * character is replaced by a DIFFERENT digit (offset 1..9 by hash).
  */
case class WrongDigitsExpr(left: Expression, right: Expression,
    tokenPpm: Long, seed: Int) extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "wrong_digits"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    CharNoiseImpl.wrongDigits(l.asInstanceOf[UTF8String], r.asInstanceOf[Long],
      tokenPpm, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CharNoiseImpl.wrongDigits($a, $b, ${tokenPpm}L, $seed)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WrongDigitsExpr =
    copy(left = newLeft, right = newRight)
}
