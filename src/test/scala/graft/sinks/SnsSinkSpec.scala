package graft.sinks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sinks.SnsSink.Conf

/** SNS sink encode: count-based PublishBatch packaging in (ts, src_id)
  * order via the distributed two-phase rank, plus the FIFO
  * group/dedup-id surface. */
class SnsSinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: (Long, Long, String)*) =
    rows.toDF("ts", "id", "msg")

  test("batch_size chunks in (ts, src_id) order; 1-based coordinates") {
    val df = events((1L to 7L).map(i => (100L + i, i, s"m$i")): _*)
    val out = SnsSink.assignBatches(df, "ts", "id", "msg",
        Conf("arn:aws:sns:us-east-1:1:t", batchSize = 3))
      .orderBy("src_id")
      .select("request_idx", "seq_in_request").as[(Long, Long)]
      .collect().toSeq
    assert(out == Seq((1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L), (3L, 1L)))
  }

  test("order is (ts, src_id), not input order; batch_size clamps to 10") {
    val df = events((50L, 2L, "b"), (10L, 9L, "a"), (50L, 1L, "c"))
    val got = SnsSink.assignBatches(df, "ts", "id", "msg",
        Conf("arn:t", batchSize = 99))
      .orderBy("request_idx", "seq_in_request")
      .select("src_id").as[Long].collect().toSeq
    assert(got == Seq(9L, 1L, 2L)) // ts 10 first, then ts 50 by id
    // 25 events, clamp 99 → 10: three requests of 10/10/5
    val many = events((1L to 25L).map(i => (i, i, "x")): _*)
    val reqs = SnsSink.assignBatches(many, "ts", "id", "msg",
        Conf("arn:t", batchSize = 99))
      .groupBy("request_idx").count()
      .orderBy("request_idx").select("count").as[Long].collect().toSeq
    assert(reqs == Seq(10L, 10L, 5L))
  }

  test("two-phase rank is partition-invariant") {
    val df = events((1L to 40L).map(i => (1000L + i % 7, i, s"m$i")): _*)
    val conf = Conf("arn:t", batchSize = 4)
    val a = SnsSink.assignBatches(df.repartition(1), "ts", "id", "msg", conf)
    val b = SnsSink.assignBatches(df.repartition(13), "ts", "id", "msg", conf)
    val key = (d: org.apache.spark.sql.DataFrame) => d.orderBy("src_id")
      .select("src_id", "request_idx", "seq_in_request")
      .as[(Long, Long, Long)].collect().toSeq
    assert(key(a) == key(b))
  }

  test("standard topic carries no FIFO columns; payload shape") {
    val df = events((1L, 1L, "hello"), (2L, 2L, "world"))
    val assigned = SnsSink.assignBatches(df, "ts", "id", "msg",
      Conf("arn:aws:sns:us-east-1:1:t", batchSize = 10))
    assert(!assigned.columns.contains("message_group_id"))
    val p = SnsSink.publishBatchPayloads(assigned).collect()(0)
    assert(p.getAs[Long]("n_entries") == 2L)
    assert(p.getAs[String]("payload") ==
      """[{"Id":"1","Message":"hello"},{"Id":"2","Message":"world"}]""")
  }

  test("fifo topic: field-resolved group id, default per-flush group and per-event dedup") {
    val df = Seq((1L, 1L, "a", "g1"), (2L, 2L, "b", "g2"), (3L, 3L, "c", null))
      .toDF("ts", "id", "msg", "grp")
    // field-configured group id passes through (nulls included, as the
    // reference's event.get would return)
    val withField = SnsSink.assignBatches(df, "ts", "id", "msg",
      Conf("arn:t.fifo", batchSize = 2, messageGroupId = Some("grp")))
    assert(withField.orderBy("src_id").select("message_group_id")
      .as[String].collect().toSeq == Seq("g1", "g2", null))
    // defaults: one group per request, one dedup per event
    val dflt = SnsSink.assignBatches(df, "ts", "id", "msg",
        Conf("arn:t.fifo", batchSize = 2))
      .orderBy("src_id")
      .select("message_group_id", "message_deduplication_id")
      .as[(String, String)].collect().toSeq
    assert(dflt == Seq(("g-1", "d-1"), ("g-1", "d-2"), ("g-2", "d-3")))
    // payload carries the FIFO attributes
    val p = SnsSink.publishBatchPayloads(
      SnsSink.assignBatches(df.limit(1), "ts", "id", "msg",
        Conf("arn:t.fifo", batchSize = 2))).collect()(0)
    assert(p.getAs[String]("payload") ==
      """[{"Id":"1","Message":"a","MessageGroupId":"g-1","MessageDeduplicationId":"d-1"}]""")
  }
}
