package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** NYSIIS phonetic code, jellyfish-compatible (the reference encodes
  * first/last names with `jellyfish.nysiis` for blocking — see
  * /root/reference/03_link_datasets.ipynb "add_name_phonetics"). No 6-char
  * truncation, matching jellyfish's modern behavior.
  */
object NysiisImpl {

  private def isVowel(c: Char): Boolean =
    c == 'A' || c == 'E' || c == 'I' || c == 'O' || c == 'U'

  def code(u: UTF8String): UTF8String = UTF8String.fromString(code(u.toString))

  def code(input: String): String = {
    if (input.isEmpty) return ""
    var s = input.toUpperCase

    // step 1 - prefixes
    if (s.startsWith("MAC")) s = "MCC" + s.substring(3)
    else if (s.startsWith("KN")) s = s.substring(1)
    else if (s.startsWith("K")) s = "C" + s.substring(1)
    else if (s.startsWith("PH") || s.startsWith("PF")) s = "FF" + s.substring(2)
    else if (s.startsWith("SCH")) s = "SSS" + s.substring(3)

    // step 2 - suffixes
    if (s.endsWith("IE") || s.endsWith("EE")) s = s.substring(0, s.length - 2) + "Y"
    else if (s.endsWith("DT") || s.endsWith("RT") || s.endsWith("RD") ||
      s.endsWith("NT") || s.endsWith("ND")) s = s.substring(0, s.length - 2) + "D"

    // step 3 - key starts with the first character of the (transformed) name
    val key = new StringBuilder
    key.append(s.charAt(0))

    // step 4 - translate remaining characters
    val n = s.length
    var i = 1
    while (i < n) {
      val c = s.charAt(i)
      var ch: String = String.valueOf(c)
      if (c == 'E' && i + 1 < n && s.charAt(i + 1) == 'V') {
        ch = "AF"; i += 1
      } else if (isVowel(c)) {
        ch = "A"
      } else if (c == 'Q') {
        ch = "G"
      } else if (c == 'Z') {
        ch = "S"
      } else if (c == 'M') {
        ch = "N"
      } else if (c == 'K') {
        ch = if (i + 1 < n && s.charAt(i + 1) == 'N') "N" else "C"
      } else if (c == 'S' && i + 2 < n && s.charAt(i + 1) == 'C' && s.charAt(i + 2) == 'H') {
        ch = "SSS"; i += 2
      } else if (c == 'P' && i + 1 < n && s.charAt(i + 1) == 'H') {
        ch = "FF"; i += 1
      } else if (c == 'H' && (!isVowel(s.charAt(i - 1)) ||
          (i + 1 < n && !isVowel(s.charAt(i + 1))) || i + 1 == n)) {
        // vowel+H -> A; consonant+H -> that consonant (classic NYSIIS)
        ch = if (isVowel(s.charAt(i - 1))) "A" else String.valueOf(s.charAt(i - 1))
      } else if (c == 'W' && isVowel(s.charAt(i - 1))) {
        ch = "A"
      }
      if (ch.charAt(ch.length - 1) != key.charAt(key.length - 1)) key.append(ch)
      i += 1
    }

    var out = key.toString
    // step 5 - remove trailing S
    if (out.endsWith("S") && out.length > 1) out = out.substring(0, out.length - 1)
    // step 6 - AY -> Y
    if (out.endsWith("AY")) out = out.substring(0, out.length - 2) + "Y"
    // step 7 - remove trailing A
    if (out.endsWith("A") && out.length > 1) out = out.substring(0, out.length - 1)
    out
  }
}

/** Codegen'd unary expression — same rationale as [[JaroWinklerSimilarity]]:
  * phonetic blocking keys are derived for every input record, so the encoder
  * must not break whole-stage codegen.
  */
case class Nysiis(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def prettyName: String = "nysiis"

  override protected def nullSafeEval(input: Any): Any =
    NysiisImpl.code(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NysiisImpl.code($c)")

  override protected def withNewChildInternal(newChild: Expression): Nysiis =
    copy(child = newChild)
}
