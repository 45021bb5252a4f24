package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FeedsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------------
  // Prometheus exposition format
  // ------------------------------------------------------------------

  test("prometheus: comments, labels, timestamps, special values") {
    val page =
      """# HELP http_requests_total Total requests.
        |# TYPE http_requests_total counter
        |http_requests_total{method="post",code="200"} 1027 1395066363000
        |http_requests_total{method="post",code="400"} 3 1395066363000
        |
        |msdos_file_access_time_seconds{path="C:\\DIR\\FILE.TXT"} 1.458255915e9
        |metric_without_labels 12.47
        |something_weird{problem="division by zero"} +Inf -3982045
        |minus_inf_metric -Inf
        |nan_metric NaN
        |""".stripMargin
    val out = Feeds.prometheusText(Seq(page).toDF("page"), "page")
      .select("metric_name", "labels", "value", "ts_ms")
      .collect()
    assert(out.length == 7)
    val byIdx = out.map(r => (r.getString(0), r.getMap[String, String](1),
      r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(byIdx(0) == (("http_requests_total",
      Map("method" -> "post", "code" -> "200"), 1027.0, Some(1395066363000L))))
    assert(byIdx(2)._1 == "msdos_file_access_time_seconds")
    assert(byIdx(2)._3 == 1.458255915e9)
    assert(byIdx(3) == (("metric_without_labels", Map.empty, 12.47, None)))
    // label value with a space + signed timestamp + infinity spelling
    assert(byIdx(4)._2 == Map("problem" -> "division by zero"))
    assert(byIdx(4)._3.isPosInfinity)
    assert(byIdx(4)._4.contains(-3982045L))
    assert(byIdx(5)._3.isNegInfinity)
    assert(byIdx(6)._3.isNaN)
  }

  // ------------------------------------------------------------------
  // RSS 2.0 items
  // ------------------------------------------------------------------

  test("rss: one row per item, channel title carried, ordinals aligned") {
    val xml =
      """<rss version="2.0"><channel><title>Graft Feed</title>
        |<link>https://example.org</link>
        |<item><title>First</title><link>https://example.org/1</link>
        |  <guid>g1</guid><pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>
        |<item><title>Second</title><link>https://example.org/2</link>
        |  <guid>g2</guid><pubDate>Tue, 02 Jan 2024 00:00:00 GMT</pubDate></item>
        |</channel></rss>""".stripMargin
    val out = Feeds.rssItems(Seq((7L, xml)).toDF("fid", "xml"), "xml")
      .orderBy("item_pos")
      .select("fid", "channel_title", "item_pos", "item_title", "item_link",
        "item_guid", "item_pub_date")
      .as[(Long, String, Int, String, String, String, String)].collect()
    assert(out.length == 2)
    assert(out(0) == ((7L, "Graft Feed", 0, "First", "https://example.org/1",
      "g1", "Mon, 01 Jan 2024 00:00:00 GMT")))
    assert(out(1) == ((7L, "Graft Feed", 1, "Second", "https://example.org/2",
      "g2", "Tue, 02 Jan 2024 00:00:00 GMT")))
  }

  // ------------------------------------------------------------------
  // OTLP/JSON spans
  // ------------------------------------------------------------------

  test("otlp json: span flattening, service name, ISO times, trace group") {
    val json =
      """{"resourceSpans":[{"resource":{"attributes":[
        |  {"key":"service.name","value":{"stringValue":"checkout"}},
        |  {"key":"host","value":{"stringValue":"h1"}}]},
        | "scopeSpans":[{"scope":{"name":"lib","version":"1.0"},"spans":[
        |  {"traceId":"0af7651916cd43dd8448eb211c80319c","spanId":"b7ad6b7169203331",
        |   "parentSpanId":"","name":"GET /cart","kind":"SPAN_KIND_SERVER",
        |   "startTimeUnixNano":"1544712660000000000","endTimeUnixNano":"1544712661500000123",
        |   "attributes":[{"key":"http.status","value":{"intValue":"200"}},
        |                 {"key":"ok","value":{"boolValue":true}}],
        |   "status":{"code":"STATUS_CODE_OK"}},
        |  {"traceId":"0af7651916cd43dd8448eb211c80319c","spanId":"00f067aa0ba902b7",
        |   "parentSpanId":"b7ad6b7169203331","name":"SELECT","kind":"SPAN_KIND_CLIENT",
        |   "startTimeUnixNano":"1544712660300000000","endTimeUnixNano":"1544712660600000000",
        |   "attributes":[],"status":{"code":"STATUS_CODE_OK"}}]}]}]}""".stripMargin
    val out = OtelJson.spans(Seq(json).toDF("otlp"), "otlp")
      .orderBy("spanId").collect()
    assert(out.length == 2)
    val byId = out.map(r => r.getAs[String]("spanId") -> r).toMap
    val root = byId("b7ad6b7169203331")
    assert(root.getAs[String]("serviceName") == "checkout")
    assert(root.getAs[String]("traceGroup") == "GET /cart") // root fills group
    assert(root.getAs[Long]("durationInNanos") == 1500000123L)
    // reference parity: Instant.ofEpochSecond(0, nanos).toString
    assert(root.getAs[String]("startTime") == "2018-12-13T14:51:00Z")
    assert(root.getAs[String]("endTime") == "2018-12-13T14:51:01.500000123Z")
    assert(root.getAs[Map[String, String]]("attributes") ==
      Map("http.status" -> "200", "ok" -> "true"))
    val child = byId("00f067aa0ba902b7")
    assert(child.getAs[String]("parentSpanId") == "b7ad6b7169203331")
    assert(child.getAs[String]("traceGroup") == null) // child: filled later
    assert(child.getAs[String]("scopeName") == "lib")
    assert(child.getAs[String]("statusCode") == "STATUS_CODE_OK")
  }

  test("cloudwatchSubscription: gunzip + explode, control messages dropped") {
    import spark.implicits._
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close()
      bo.toByteArray
    }
    val data = gz(
      """{"messageType":"DATA_MESSAGE","owner":"123456789012",""" +
        """"logGroup":"/app/web","logStream":"i-0abc","subscriptionFilters":["f1"],""" +
        """"logEvents":[{"id":"e1","timestamp":1700000000001,"message":"GET /"},""" +
        """{"id":"e2","timestamp":1700000000002,"message":"POST /x"}]}""")
    val ctrl = gz("""{"messageType":"CONTROL_MESSAGE","owner":"o","logGroup":"g",""" +
      """"logStream":"s","subscriptionFilters":[],"logEvents":[]}""")
    val corrupt = Array[Byte](1, 2, 3)
    val df = Seq((1L, data), (2L, ctrl), (3L, corrupt)).toDF("rec", "payload")
    val out = graft.sources.Feeds.cloudwatchSubscription(df, "payload")
      .orderBy("event_pos").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("log_group") == "/app/web")
    assert(out(0).getAs[String]("log_stream") == "i-0abc")
    assert(out(0).getAs[String]("event_id") == "e1")
    assert(out(0).getAs[Long]("ts_ms") == 1700000000001L)
    assert(out(0).getAs[String]("message") == "GET /")
    assert(out(1).getAs[String]("message") == "POST /x")
    assert(out(0).getAs[Long]("rec") == 1L) // passthrough column kept
  }
}
