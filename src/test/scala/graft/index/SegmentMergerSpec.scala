package graft.index

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import SegmentMerger.Posting

class SegmentMergerSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("merge of any partitioning of a posting list ≡ the list itself") {
    val gen = for {
      n <- Gen.chooseNum(0, 300)
      ids <- Gen.containerOfN[List, Long](n, Gen.chooseNum(0L, 1L << 30)).map(_.distinct.sorted)
      cuts <- Gen.listOf(Gen.chooseNum(0, math.max(0, ids.length)))
    } yield {
      val postings = ids.map(d => Posting(d, 1 + d % 7, 10 + d % 100))
      (postings, (0 +: cuts.sorted :+ postings.length).distinct)
    }
    check(Prop.forAll(gen) { case (postings, bounds) =>
      val runs = bounds.zip(bounds.tail).map { case (a, b) => postings.slice(a, b).iterator }
      SegmentMerger.merge(runs).toList == postings
    })
  }

  test("interleaved runs merge into sorted order") {
    val a = List(1L, 4L, 9L).map(Posting(_, 1, 1))
    val b = List(2L, 3L, 10L).map(Posting(_, 1, 1))
    val c = List(5L, 6L, 7L, 8L).map(Posting(_, 1, 1))
    assert(SegmentMerger.merge(Seq(a.iterator, b.iterator, c.iterator)).map(_.docId).toList
      == (1L to 10L).toList)
  }
}
