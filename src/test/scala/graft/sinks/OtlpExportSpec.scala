package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sinks.OtlpExport.Thresholds

/** OTLP trace export: every payload is a valid ExportTraceServiceRequest —
  * the engine's OWN wire decoder must reproduce the input rows exactly —
  * and batches respect the reference ThresholdConfig caps. */
class OtlpExportSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cols = Seq("traceId", "spanId", "parentSpanId", "traceState",
    "name", "kind", "serviceName", "scopeName", "startTimeUnixNano",
    "endTimeUnixNano", "attributes", "statusCode")

  private def fixture: DataFrame = Seq(
    ("0af7651916cd43dd8448eb211c80319c", "b7ad6b7169203331", "",
      null.asInstanceOf[String], "GET /api", "SPAN_KIND_SERVER", "svc-a",
      "scope1", 1000000L, 2000000L,
      Map("uid" -> "7", "http.method" -> "GET"), "STATUS_CODE_OK"),
    ("0af7651916cd43dd8448eb211c80319c", "00f067aa0ba902b7",
      "b7ad6b7169203331", "w3c=1", "SELECT db", "SPAN_KIND_CLIENT", "svc-b",
      "scope2", 1100000L, 1900000L, Map("db.name" -> "orders"),
      "STATUS_CODE_ERROR"),
    // statusCode null — STATUS_CODE_UNSET is proto3's default (wire value
    // 0, never serialized), so absent IS the canonical unset form
    ("1bf7651916cd43dd8448eb211c80319d", "11f067aa0ba902b8", "",
      null.asInstanceOf[String], "worker", "SPAN_KIND_INTERNAL", "svc-a",
      "scope1", 5000000L, 6000000L, Map.empty[String, String],
      null.asInstanceOf[String]))
    .toDF(cols: _*)

  private def roundTrip(payloads: DataFrame): DataFrame =
    graft.sources.OtelJson.spansFromProto(payloads.select("payload"), "payload")

  private def asSet(df: DataFrame) =
    df.select(cols.head, cols.tail: _*).collect()
      .map(r => r.toSeq.map {
        case m: Map[_, _] => m.toSeq.sortBy(_._1.toString).toString
        case x => x
      }).toSet

  test("decode(export(rows)) == rows — own-decoder round trip, all fields") {
    val back = roundTrip(OtlpExport.traceRequests(fixture))
    assert(asSet(back) == asSet(fixture))
    // derived columns come back consistent too
    val d = back.select((col("endTimeUnixNano") - col("startTimeUnixNano"))
      === col("durationInNanos")).as[Boolean].collect()
    assert(d.forall(identity))
  }

  test("STATUS_CODE_UNSET canonicalizes to absent (proto3 default value)") {
    val unset = fixture.limit(1)
      .withColumn("statusCode", lit("STATUS_CODE_UNSET"))
    val back = roundTrip(OtlpExport.traceRequests(unset))
    assert(back.select("statusCode").collect().head.isNullAt(0))
  }

  test("count cap: payloads carry at most max_events spans, none lost") {
    val many = fixture.union(fixture).union(fixture).repartition(1)
    val p = OtlpExport.traceRequests(many, Thresholds(maxEvents = 2))
    val counts = p.select("n_spans").as[Long].collect().sorted.toSeq
    assert(counts.forall(_ <= 2) && counts.sum == 9)
    assert(roundTrip(p).count() == 9)
  }

  test("byte cap: flush-before-add keeps payloads under max_batch_size") {
    val one = OtlpExport.traceRequests(fixture.repartition(1),
      Thresholds(maxBatchBytes = 10)) // smaller than any single record
    assert(one.count() == 3) // each record flushes the previous
    val sizes = one.select("payload_bytes").as[Long].collect()
    // a single over-cap record still ships alone (reference: an event is
    // never split), so every payload here is exactly one record
    assert(one.select("n_spans").as[Long].collect().forall(_ == 1L))
    assert(sizes.forall(_ > 10L))
  }

  test("batching is concatenation: a 2-span payload decodes to its 2 spans") {
    val p = OtlpExport.traceRequests(fixture.limit(2).repartition(1),
      Thresholds(maxEvents = 2))
    assert(p.count() == 1)
    assert(roundTrip(p).select("spanId").as[String].collect().toSet ==
      Set("b7ad6b7169203331", "00f067aa0ba902b7"))
  }

  test("export plan has no shuffle") {
    val plan = OtlpExport.traceRequests(fixture)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"export must not shuffle:\n$plan")
  }

  test("logs: decode(export(rows)) == rows, attribute buckets split back by prefix") {
    val logs = Seq(
      (1000000L, 1500000L, "svc-a", 9, "INFO", "started",
        "0af7651916cd43dd8448eb211c80319c", "b7ad6b7169203331",
        Map("log.attributes.uid" -> "7",
          "log.attributes.http@method" -> "GET", // '@' → '.' on the wire
          "instrumentationScope.name" -> "graft",
          "resource.attributes.service@name" -> "svc-a")),
      (2000000L, 2500000L, "svc-b", 17, "ERROR", "boom",
        "1bf7651916cd43dd8448eb211c80319d", "11f067aa0ba902b8",
        Map("instrumentationScope.name" -> "graft",
          "resource.attributes.service@name" -> "svc-b")))
      .toDF("timeUnixNano", "observedTimeUnixNano", "serviceName",
        "severityNumber", "severityText", "body", "traceId", "spanId",
        "attributes")
    val back = graft.sources.OtelLogs.logsFromProto(
      OtlpExport.logRequests(logs).select("payload"), "payload")
    val got = back.orderBy("timeUnixNano")
      .select("timeUnixNano", "observedTimeUnixNano", "serviceName",
        "severityNumber", "severityText", "body", "traceId", "spanId")
      .collect().map(_.toSeq)
    assert(got(0) == Seq(1000000L, 1500000L, "svc-a", 9, "INFO", "started",
      "0af7651916cd43dd8448eb211c80319c", "b7ad6b7169203331"))
    assert(got(1) == Seq(2000000L, 2500000L, "svc-b", 17, "ERROR", "boom",
      "1bf7651916cd43dd8448eb211c80319d", "11f067aa0ba902b8"))
    // the merged attribute map reconstructs exactly (incl. the '@' key)
    val m = back.orderBy("timeUnixNano")
      .select("attributes").collect()(0).getAs[Map[String, String]](0)
    assert(m == Map("log.attributes.uid" -> "7",
      "log.attributes.http@method" -> "GET",
      "instrumentationScope.name" -> "graft",
      "resource.attributes.service@name" -> "svc-a"))
    // serviceName alone (no resource bucket) still lands as service.name
    val bare = Seq((1L, 2L, "svc-x", 5, "DEBUG", "b", "", "",
      Map.empty[String, String]))
      .toDF("timeUnixNano", "observedTimeUnixNano", "serviceName",
        "severityNumber", "severityText", "body", "traceId", "spanId",
        "attributes")
    val bb = graft.sources.OtelLogs.logsFromProto(
      OtlpExport.logRequests(bare).select("payload"), "payload").collect()(0)
    assert(bb.getAs[String]("serviceName") == "svc-x")
  }

  test("logs: batching caps hold and no records are lost") {
    val logs = (1L to 23L).map(i => (i, i + 1, "svc", 9, "INFO", s"m$i",
      "", "", Map.empty[String, String]))
      .toDF("timeUnixNano", "observedTimeUnixNano", "serviceName",
        "severityNumber", "severityText", "body", "traceId", "spanId",
        "attributes")
      .coalesce(1)
    val p = OtlpExport.logRequests(logs, Thresholds(maxEvents = 10)).collect()
    assert(p.map(_.getAs[Long]("n_records")).sum == 23L)
    assert(p.forall(_.getAs[Long]("n_records") <= 10L))
    val back = graft.sources.OtelLogs.logsFromProto(
      OtlpExport.logRequests(logs, Thresholds(maxEvents = 10))
        .select("payload"), "payload")
    assert(back.count() == 23L)
  }
}
