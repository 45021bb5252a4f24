package graft

import org.scalatest.funsuite.AnyFunSuite

/** Flagship smoke: entry() drives the north-rule shape end to end —
  * synthesized pages → Iceberg table (own-kernel writer) → own-kernel
  * table-format read → byte-identical extract → BM25 top-k. */
class EntrySpec extends AnyFunSuite {
  test("entry() returns a full top-k over the Iceberg-backed corpus") {
    val rows = SparkEntry.entry(TestSpark.spark).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getDouble(1) > 0.0))
    // scores descending (ties broken by url upstream)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}
