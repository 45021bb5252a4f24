package graft.sinks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sinks.SqsSink.Thresholds

/** SQS sink encode: the reference's two-level greedy packaging — events
  * into messages (count + byte caps, strict-< append quirk), messages into
  * SendMessageBatch requests (10-message / 256 KiB API caps). */
class SqsSinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: (String, Long, Long, String)*) =
    rows.toDF("q", "ts", "id", "body")

  private def assigned(df: org.apache.spark.sql.DataFrame, th: Thresholds) =
    SqsSink.assignBatches(df, "q", "ts", "id", "body", th)
      .orderBy("queue_url", "src_id")
      .collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("request_idx"),
        r.getAs[Long]("message_idx"), r.getAs[Long]("seq_in_message")))

  test("event-count cap: messages of exactly max_events_per_message") {
    val df = events((1L to 7L).map(i => ("q1", i, i, "aaaa")): _*)
    val out = assigned(df, Thresholds(maxEventsPerMessage = 3))
    assert(out.map(e => (e._2, e._3, e._4)).toSeq == Seq(
      (1L, 1L, 1L), (1L, 1L, 2L), (1L, 1L, 3L),
      (1L, 2L, 1L), (1L, 2L, 2L), (1L, 2L, 3L), (1L, 3L, 1L)))
  }

  test("message-byte cap: STRICT < on append (the reference's addEntry quirk)") {
    // 10-byte bodies, max_message_size 20: s + e < 20 fails at s = 10
    // (10 + 10 = 20, not < 20) → every message holds exactly one event,
    // even though the request-level <= check said it fits
    val df = events((1L to 3L).map(i => ("q1", i, i, "a" * 10)): _*)
    val out = assigned(df, Thresholds(maxMessageBytes = 20))
    assert(out.map(e => (e._2, e._3, e._4)).toSeq == Seq(
      (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L)))
    // ...but 21 admits the pair (10 + 10 < 21)
    val out2 = assigned(df, Thresholds(maxMessageBytes = 21))
    assert(out2.map(e => (e._2, e._3, e._4)).toSeq == Seq(
      (1L, 1L, 1L), (1L, 1L, 2L), (1L, 2L, 1L)))
  }

  test("request flushes at 10 messages") {
    // 1 event per message (count cap 1) → 25 events = 10 + 10 + 5 messages
    val df = events((1L to 25L).map(i => ("q1", i, i, "aa")): _*)
    val out = assigned(df, Thresholds(maxEventsPerMessage = 1))
    assert(out.count(_._2 == 1L) == 10)
    assert(out.count(_._2 == 2L) == 10)
    assert(out.count(_._2 == 3L) == 5)
    assert(out.filter(_._2 == 2L).map(_._3).toSeq == (1L to 10L))
  }

  test("oversized event becomes its own message, never dropped") {
    val df = events(
      ("q1", 1L, 1L, "aa"), ("q1", 2L, 2L, "b" * 50), ("q1", 3L, 3L, "cc"))
    val out = assigned(df, Thresholds(maxEventsPerMessage = 5,
      maxMessageBytes = 30))
    assert(out.map(e => (e._1, e._3, e._4)).toSeq == Seq(
      (1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L)))
  }

  test("oversized FIRST event: no phantom empty request (reference never flushes an empty batch)") {
    // > 256 KiB request cap as the queue's first event: the reference's
    // willExceedMaxBatchSize returns false before the first addEntry
    // (SqsSinkService.java:170-181), so request numbering starts at 1
    val df = events(
      ("q1", 1L, 1L, "x" * 262200), ("q1", 2L, 2L, "aa"))
    val out = assigned(df, Thresholds(maxEventsPerMessage = 5))
    // (src_id, request_idx): oversized rides alone in request 1, the
    // next event flushes into request 2
    assert(out.map(e => (e._1, e._2)).toSeq == Seq((1L, 1L), (2L, 2L)))
  }

  test("queues pack independently; ties on ts break by src_id") {
    val df = events(
      ("q1", 5L, 11L, "aa"), ("q1", 5L, 10L, "aa"), ("q2", 1L, 20L, "aa"))
    val out = assigned(df, Thresholds(maxEventsPerMessage = 1))
    assert(out.toSeq == Seq(
      (10L, 1L, 1L, 1L), (11L, 1L, 2L, 1L), (20L, 1L, 1L, 1L)))
  }

  test("payloads: numeric message order, ndjson bodies, byte accounting") {
    val df = events(
      ("q1", 2L, 2L, "bb"), ("q1", 1L, 1L, "aaa"), ("q1", 3L, 3L, "c"))
    val a = SqsSink.assignBatches(df, "q", "ts", "id", "body",
      Thresholds(maxEventsPerMessage = 2))
    val p = SqsSink.sendMessageBatchPayloads(a).collect()
    assert(p.length == 1)
    val row = p.head
    assert(row.getAs[Long]("n_messages") == 2L)
    assert(row.getAs[Long]("request_bytes") == 6L)
    val payload = row.getAs[String]("payload")
    assert(payload ==
      """[{"Id":"1","MessageBody":"aaa\nbb"},{"Id":"2","MessageBody":"c"}]""")
  }

  test("thresholds validate like the reference SqsThresholdConfig") {
    intercept[IllegalArgumentException](Thresholds(maxEventsPerMessage = 0))
    intercept[IllegalArgumentException](
      Thresholds(maxMessageBytes = 512L * 1024))
  }

  test("plan: one keyed shuffle for the fold, no cartesian") {
    val plan = SqsSink.assignBatches(
      events(("q1", 1L, 1L, "aa")), "q", "ts", "id", "body", Thresholds())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
