package graft.index

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class VarByteSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("encode∘decode = id for arbitrary non-negative longs") {
    val gen = Gen.containerOf[Array, Long](Gen.chooseNum(0L, Long.MaxValue))
    check(Prop.forAll(gen) { xs =>
      VarByte.decode(VarByte.encode(xs), xs.length).sameElements(xs)
    })
  }

  test("gap encode∘decode = id for strictly increasing docId lists") {
    val gen = for {
      base <- Gen.chooseNum(0L, 1L << 40)
      gaps <- Gen.nonEmptyContainerOf[List, Long](Gen.chooseNum(1L, 1 << 20))
    } yield (base, gaps.scanLeft(base)(_ + _).tail.toArray)
    check(Prop.forAll(gen) { case (base, ids0) =>
      val ids = base +: ids0 // first element == base → first gap 0
      VarByte.decodeGaps(VarByte.encodeGaps(ids, base), ids.length, base).sameElements(ids)
    })
  }

  test("small gaps compress to ~1 byte per value") {
    val ids = Array.tabulate(1000)(i => 1000L + i * 3)
    val enc = VarByte.encodeGaps(ids, ids(0))
    assert(enc.length <= 1005, s"got ${enc.length} bytes for 1000 small gaps")
  }

  test("negative values rejected") {
    intercept[IllegalArgumentException](VarByte.encode(Array(-1L)))
    intercept[IllegalArgumentException](VarByte.encodeGaps(Array(5L, 5L), 0L))
  }
}
