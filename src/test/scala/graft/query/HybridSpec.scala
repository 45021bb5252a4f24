package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HybridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed fusion: contributions, missing docs, ordering") {
    val a = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("doc_id", "score")
    val b = Seq((2L, 0.95), (4L, 0.5)).toDF("doc_id", "score")
    val out = Hybrid.rrf(Seq(a, b), "doc_id", "score", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // ranks: a → 1:1, 2:2, 3:3; b → 2:1, 4:2
    def f(rs: Seq[Int]) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      (2L, f(Seq(2, 1)), 2L), // in both lists → first
      (1L, f(Seq(1)), 1L),
      (4L, f(Seq(2)), 1L),
      (3L, f(Seq(3)), 1L)))
  }

  test("rank ties break by ascending id identically in every list") {
    val a = Seq((7L, 0.5), (3L, 0.5), (9L, 0.5)).toDF("doc_id", "score")
    val out = Hybrid.rrf(Seq(a), "doc_id", "score", k = 3).collect()
    // equal scores → rank by id: 3,7,9
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 7L, 9L))
  }

  test("partition invariance and k0 sensitivity") {
    val a = (1 to 50).map(i => (i.toLong, 1.0 / i)).toDF("doc_id", "score")
    val b = (1 to 50).map(i => (i.toLong, i.toDouble)).toDF("doc_id", "score")
    val x = Hybrid.rrf(Seq(a, b), "doc_id", "score", k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val y = Hybrid.rrf(Seq(a.repartition(13), b.repartition(7)),
      "doc_id", "score", k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(x == y)
    // opposed lists under RRF: extremes of either list beat the middle
    val ids = x.map(_._1)
    assert(ids.head == 1L || ids.head == 50L)
    // smaller k0 weights top ranks more
    val k0small = Hybrid.rrf(Seq(a, b), "doc_id", "score", k = 1, k0 = 1)
      .collect().head.getDouble(1)
    val k0big = Hybrid.rrf(Seq(a, b), "doc_id", "score", k = 1, k0 = 600)
      .collect().head.getDouble(1)
    assert(k0small > k0big)
  }

  test("temp-column collision is rejected loudly") {
    val bad = Seq((1L, 0.5, 9)).toDF("doc_id", "score", "_rrf_rank")
    assertThrows[IllegalArgumentException] {
      Hybrid.rrf(Seq(bad), "doc_id", "score", k = 1)
    }
  }
}
