package graft

import graft.functions.{JaroWinklerImpl, NysiisImpl, VectorDotImpl}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (seeded sampling — deterministic) for the
  * scalar kernels that blocking, scoring and dedup lean on.
  */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)

  private def randName(maxLen: Int = 12): String = {
    val n = rnd.nextInt(maxLen + 1)
    (1 to n).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
  }

  private def randVec(n: Int = 16): Array[Float] =
    Array.fill(n)(rnd.nextFloat() * 2f - 1f)

  test("jaro-winkler: bounded, symmetric, identity on 2000 random pairs") {
    (1 to 2000).foreach { _ =>
      val a = randName(); val b = randName()
      val s = JaroWinklerImpl.similarity(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of range: jw($a,$b)=$s")
      assert(s == JaroWinklerImpl.similarity(b, a), s"asymmetric on ($a,$b)")
      if (a.nonEmpty) assert(JaroWinklerImpl.similarity(a, a) == 1.0)
    }
  }

  test("jaro-winkler: dropping the last char of a name keeps similarity high") {
    (1 to 500).foreach { _ =>
      val a = randName() + ('A' + rnd.nextInt(26)).toChar.toString * 4 // len >= 4
      assert(JaroWinklerImpl.similarity(a, a.dropRight(1)) > 0.7, s"low on $a")
    }
  }

  test("nysiis: deterministic, alphabetic, bounded length on 2000 random names") {
    (1 to 2000).foreach { _ =>
      val a = randName()
      val c = NysiisImpl.code(a)
      assert(c == NysiisImpl.code(a))
      assert(c.forall(ch => ch >= 'A' && ch <= 'Z'), s"non-alpha in nysiis($a)=$c")
      assert(c.length <= a.length + 1, s"code longer than input: $a -> $c")
    }
  }

  test("vec_dot matches a reference fold on 500 random vectors") {
    (1 to 500).foreach { _ =>
      val a = randVec(); val b = randVec()
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      val got = VectorDotImpl.dotDouble(ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      assert(got == expected)
    }
  }

  test("decimal dot is order-independent under reversal") {
    (1 to 500).foreach { _ =>
      val a = randVec(); val b = randVec()
      val fwd = VectorDotImpl.dotDecimal(ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      val rev = VectorDotImpl.dotDecimal(
        ArrayData.toArrayData(a.reverse), ArrayData.toArrayData(b.reverse))
      assert(fwd == rev, s"decimal sum depends on order: $fwd vs $rev")
    }
  }
}
