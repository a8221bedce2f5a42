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

  test("fast decimal dot is bit-identical to the BigDecimal reference") {
    // Wide random magnitudes: small products land > 18 fractional digits in
    // the shortest repr, exercising the HALF_UP integer-division path; large
    // ones exercise the 128-bit multiply; mixes exercise signed carries.
    (1 to 2000).foreach { _ =>
      val n = 1 + rnd.nextInt(33)
      val sa = math.pow(10.0, rnd.nextInt(14) - 9).toFloat // 1e-9 .. 1e4
      val sb = math.pow(10.0, rnd.nextInt(14) - 9).toFloat
      val a = Array.fill(n)((rnd.nextFloat() * 2f - 1f) * sa)
      val b = Array.fill(n)((rnd.nextFloat() * 2f - 1f) * sb)
      val fast = VectorDotImpl.dotDecimal(ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      val ref = VectorDotImpl.dotDecimalRef(ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      assert(fast == ref, s"fast=$fast ref=$ref a=${a.mkString(",")} b=${b.mkString(",")}")
    }
    val directed: Seq[(Array[Float], Array[Float])] = Seq(
      (Array(0f, -0f, 1f), Array(5f, 3f, 0f)),                    // signed zeros
      (Array(Float.MinPositiveValue, 1e-30f), Array(Float.MinPositiveValue, 1e-30f)), // rounds to 0E-18
      (Array(1e18f, -1e18f, 2f), Array(1e18f, 1e18f, 0.5f)),      // m > 18 fallback
      (Array(1.5f), Array(1e-19f)),                                // boundary division
      (Array(1f, 2f, 3f), Array(1f, 2f)),                          // mismatched lengths
      (Array.empty[Float], Array.empty[Float]))
    directed.foreach { case (a, b) =>
      val fast = VectorDotImpl.dotDecimal(ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      val ref = VectorDotImpl.dotDecimalRef(ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      assert(fast == ref, s"directed: fast=$fast ref=$ref on ${a.mkString(",")} · ${b.mkString(",")}")
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

  import graft.operators.Multimodal
  import graft.operators.Multimodal.MediaRecord

  private def randMedia(maxLen: Int = 512): MediaRecord = {
    val content = Array.fill(rnd.nextInt(maxLen + 1))(rnd.nextInt(256).toByte)
    MediaRecord(rnd.nextLong().abs, content,
      rnd.nextInt(640) + 1, rnd.nextInt(480) + 1, "jpeg")
  }

  test("resize: byte budget respected, never empty on nonempty input, idempotent dims") {
    (1 to 500).foreach { _ =>
      val r = randMedia()
      val (tw, th) = (rnd.nextInt(640) + 1, rnd.nextInt(480) + 1)
      val out = Multimodal.resizeStub(r, tw, th)
      val srcArea = r.width.toLong * r.height
      val dstArea = tw.toLong * th
      if (dstArea >= srcArea) assert(out.content.length == r.content.length)
      else {
        assert(out.content.length <= r.content.length)
        if (r.content.nonEmpty) assert(out.content.nonEmpty, "downsample emptied payload")
      }
      // Resizing an already-resized record to the same dims is identity.
      val twice = Multimodal.resizeStub(out, tw, th)
      assert(twice.content.sameElements(out.content), "resize not idempotent at fixed dims")
    }
  }

  test("frame sampling: strided indexes, full byte coverage at stride 1") {
    (1 to 500).foreach { _ =>
      val r = randMedia()
      val n = rnd.nextInt(5) + 1
      val frames = Multimodal.sampleFramesStub(r, n)
      assert(frames.map(_.frame_idx) == frames.map(_.frame_idx).sorted)
      frames.foreach(f => assert(f.frame_idx % n == 0, s"off-stride frame ${f.frame_idx}"))
      val all = Multimodal.sampleFramesStub(r, 1)
      assert(all.map(_.n_bytes).sum == r.content.length,
        "stride-1 frames don't cover the payload")
    }
  }

  test("quota-sampling hash: plain-BIGINT arithmetic stays in range and is total") {
    (1 to 2000).foreach { _ =>
      val id = rnd.nextLong().abs % 100000000L
      val h = (id * 2654435761L) % 4294967296L
      assert(h >= 0 && h < 4294967296L, s"hash out of range for $id")
      assert(h == (id * 2654435761L) % 4294967296L)
    }
  }
}
