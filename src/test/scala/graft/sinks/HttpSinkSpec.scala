package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sinks.HttpSink.Thresholds

/** HTTP sink encode: the reference's single-buffer greedy fold —
  * flush-before-add on request bytes (empty-buffer flush is a no-op),
  * flush-after-add on event count — sharded per worker. */
class HttpSinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: (Long, Long, String)*) =
    rows.toDF("ts", "id", "body")

  private def assigned(df: org.apache.spark.sql.DataFrame, th: Thresholds,
      shards: Int = 1) =
    HttpSink.assignBatches(df, "ts", "id", "body", th, shards)
      .orderBy("shard", "src_id")
      .collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("request_idx"),
        r.getAs[Long]("seq_in_request")))

  test("count cap: requests of exactly event_count, dense numbering") {
    val df = events((1L to 7L).map(i => (i, i, "aaaa")): _*)
    val out = assigned(df, Thresholds(maxEvents = 3))
    assert(out.map(e => (e._2, e._3)).toSeq == Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L), (3L, 1L)))
  }

  test("byte cap flushes BEFORE add; oversized event rides an empty buffer alone") {
    // sizes 10 each, cap 25: two fit (20), third would make 30 → flush
    val df = events((1L to 3L).map(i => (i, i, "a" * 10)): _*)
    assert(assigned(df, Thresholds(maxRequestBytes = 25))
      .map(e => (e._2, e._3)).toSeq ==
      Seq((1L, 1L), (1L, 2L), (2L, 1L)))
    // an event bigger than the cap joins the EMPTY buffer (no DLQ in this
    // sink) and the next event's byte check closes it
    val big = events((1L, 1L, "b" * 100), (2L, 2L, "cc"))
    assert(assigned(big, Thresholds(maxRequestBytes = 25))
      .map(e => (e._2, e._3)).toSeq == Seq((1L, 1L), (2L, 1L)))
  }

  test("count flush then byte accounting restarts clean") {
    // count cap 2: events 1,2 flush; event 3 (size 10) opens request 2
    // with fresh byte state, event 4 (size 10) still fits under cap 25
    val df = events((1L to 4L).map(i => (i, i, "a" * 10)): _*)
    assert(assigned(df, Thresholds(maxEvents = 2, maxRequestBytes = 25))
      .map(e => (e._2, e._3)).toSeq ==
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
  }

  test("shards fold independently; payloads join bodies in sequence order") {
    val df = events((1L to 10L).map(i => (100L + i, i, s"m$i")): _*)
    val a = HttpSink.assignBatches(df, "ts", "id", "body",
      Thresholds(maxEvents = 2), shards = 2)
    // shard = id % 2; within shard order by ts
    val byShard = a.collect().groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet == Set(0L, 1L))
    byShard.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("request_idx")).max == 3L) // 5 events / 2
    }
    val p = HttpSink.requestPayloads(a)
      .orderBy("shard", "request_idx").collect()
    assert(p.head.getAs[String]("payload") == "m2\nm4")
    assert(p.head.getAs[Long]("n_events") == 2L)
    assert(p.last.getAs[String]("payload") == "m9") // shard 1, request 3
  }
}
