package graft.sinks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sinks.CloudWatchLogs.{Thresholds, EventOverheadBytes}

/** CloudWatch Logs sink encode: the reference service loop's greedy
  * batching (flush-before-add on request size, flush-after-add on count,
  * DLQ on event size) reproduced as a per-stream fold, plus PutLogEvents
  * payload construction. */
class CloudWatchLogsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: (String, String, Long, Long, String)*) =
    rows.toDF("g", "s", "ts", "id", "msg")

  private def assigned(df: org.apache.spark.sql.DataFrame, th: Thresholds) =
    CloudWatchLogs.assignBatches(df, "g", "s", "ts", "id", "msg", th)
      .orderBy("log_stream", "src_id")
      .collect()
      .map(r => (r.getAs[String]("log_stream"), r.getAs[Long]("src_id"),
        r.getAs[Boolean]("dropped"),
        Option(r.getAs[java.lang.Long]("batch_idx")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("seq_in_batch")).map(_.toLong)))

  test("count cap: batches of exactly batch_size, seq restarts at 1") {
    val df = events((1L to 7L).map(i => ("g", "s1", i, i, "aaaa")): _*)
    val out = assigned(df, Thresholds(batchSize = 3))
    // 7 events, cap 3 → batches (1,1)(1,2)(1,3)(2,1)(2,2)(2,3)(3,1)
    assert(out.map(e => (e._4.get, e._5.get)).toSeq ==
      Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L), (3L, 1L)))
    assert(out.forall(!_._3))
  }

  test("request-size cap: flush BEFORE add — the breaking event opens the next batch") {
    // sizes 100 B each; cap fits 2 events: 2*100 + 3*26 = 278 > 260 for a
    // third (100+100+100 + 3*26 = 378 > 260 even for 2? 200+2*26=252 ≤ 260 ✓,
    // third: 300+3*26=378 > 260 → new batch)
    val msg = "a" * 100
    val df = events((1L to 5L).map(i => ("g", "s1", i, i, msg)): _*)
    val out = assigned(df, Thresholds(batchSize = 100, maxEventBytes = 200,
      maxRequestBytes = 260))
    assert(out.map(e => (e._4.get, e._5.get)).toSeq ==
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L)))
  }

  test("event-size cap: oversized events quarantine (dropped), batching unaffected") {
    val big = "b" * 300 // 300 + 26 > 200
    val df = events(
      ("g", "s1", 1L, 1L, "aa"), ("g", "s1", 2L, 2L, big),
      ("g", "s1", 3L, 3L, "aa"))
    val out = assigned(df, Thresholds(batchSize = 2, maxEventBytes = 200,
      maxRequestBytes = 1000))
    assert(out.toSeq == Seq(
      ("s1", 1L, false, Some(1L), Some(1L)),
      ("s1", 2L, true, None, None),
      ("s1", 3L, false, Some(1L), Some(2L))))
  }

  test("streams batch independently; ts ties break on src_id") {
    val df = events(
      ("g", "s1", 5L, 11L, "aa"), ("g", "s1", 5L, 10L, "aa"),
      ("g", "s2", 1L, 20L, "aa"))
    val out = assigned(df, Thresholds(batchSize = 1))
    assert(out.toSeq == Seq(
      ("s1", 10L, false, Some(1L), Some(1L)), // id 10 before id 11 on the tie
      ("s1", 11L, false, Some(2L), Some(1L)),
      ("s2", 20L, false, Some(1L), Some(1L))))
  }

  test("payloads: ts-ordered logEvents, 26 B/event accounting, json roundtrip") {
    val df = events(
      ("g", "s1", 2L, 2L, "bb"), ("g", "s1", 1L, 1L, "aaa"),
      ("g", "s1", 3L, 3L, "c"))
    val a = CloudWatchLogs.assignBatches(df, "g", "s", "ts", "id", "msg",
      Thresholds(batchSize = 10))
    val p = CloudWatchLogs.putLogEventsPayloads(a).collect()
    assert(p.length == 1)
    val row = p.head
    assert(row.getAs[Long]("n_events") == 3L)
    assert(row.getAs[Long]("request_bytes") ==
      (3L + 2L + 1L) + 3L * EventOverheadBytes)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("logGroupName",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("logStreamName",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("logEvents",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("timestamp",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("message",
              org.apache.spark.sql.types.StringType)))))))
    val back = Seq(row.getAs[String]("payload")).toDF("j")
      .select(from_json(col("j"), schema).as("p")).select("p.*").head()
    assert(back.getAs[String]("logGroupName") == "g")
    assert(back.getAs[String]("logStreamName") == "s1")
    val evs = back.getSeq[org.apache.spark.sql.Row](2)
      .map(e => (e.getLong(0), e.getString(1)))
    assert(evs == Seq((1L, "aaa"), (2L, "bb"), (3L, "c")))
  }

  test("thresholds validate like the reference ThresholdConfig") {
    intercept[IllegalArgumentException](Thresholds(batchSize = 0))
    intercept[IllegalArgumentException](Thresholds(batchSize = 10001))
    intercept[IllegalArgumentException](Thresholds(maxEventBytes = 2L << 20))
    intercept[IllegalArgumentException](
      Thresholds(maxEventBytes = 1000, maxRequestBytes = 999))
  }

  test("plan: one keyed shuffle, no cartesian") {
    val df = events(("g", "s1", 1L, 1L, "aa"))
    val plan = CloudWatchLogs.assignBatches(df, "g", "s", "ts", "id", "msg",
      Thresholds()).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
