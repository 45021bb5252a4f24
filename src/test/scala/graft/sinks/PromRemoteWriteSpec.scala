package graft.sinks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.OtelMetrics

/** prometheus-sink conversion + wire gates (PrometheusTimeSeries.java). */
class PromRemoteWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val fixture =
    """{"resourceMetrics":[{
      |"resource":{"attributes":[
      |  {"key":"service.name","value":{"stringValue":"svc-a"}},
      |  {"key":"host.name","value":{"stringValue":"h1"}}]},
      |"scopeMetrics":[{"scope":{"name":"graft","version":"1"},
      |"metrics":[
      | {"name":"req.latency","unit":"ms","description":"d",
      |  "gauge":{"dataPoints":[{"timeUnixNano":"1500000321","asDouble":2.5,
      |    "attributes":[{"key":"a.b","value":{"intValue":"7"}}]}]}},
      | {"name":"hits","unit":"{req}",
      |  "sum":{"isMonotonic":true,"aggregationTemporality":"AGGREGATION_TEMPORALITY_CUMULATIVE",
      |    "dataPoints":[{"timeUnixNano":"2000000000","asInt":"41"}]}},
      | {"name":"load","unit":"1",
      |  "gauge":{"dataPoints":[{"timeUnixNano":"2500000000","asDouble":0.7}]}},
      | {"name":"io.rate","unit":"By/s",
      |  "sum":{"isMonotonic":true,"aggregationTemporality":"AGGREGATION_TEMPORALITY_CUMULATIVE",
      |    "dataPoints":[{"timeUnixNano":"2600000000","asDouble":8.0}]}},
      | {"name":"lat.hist",
      |  "histogram":{"aggregationTemporality":"AGGREGATION_TEMPORALITY_DELTA",
      |    "dataPoints":[{"timeUnixNano":"3000000000","count":"6","sum":9.5,
      |      "bucketCounts":["1","2","3"],"explicitBounds":[10.0,20.0]}]}},
      | {"name":"q1",
      |  "summary":{"dataPoints":[{"timeUnixNano":"5000000000","count":"10","sum":55.0,
      |    "quantileValues":[{"quantile":0.5,"value":5.0},{"quantile":0.99,"value":9.9}]}]}}
      |]}]}]}""".stripMargin.replaceAll("\n", "")

  private lazy val ts = {
    import spark.implicits._
    PromRemoteWrite.timeSeries(
      OtelMetrics.metrics(Seq(fixture).toDF("otlp"), "otlp"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
  }

  test("gauge with mapped unit: name expansion, label sanitize + sort") {
    val g = ts.filter(_._1 == "req_latency_milliseconds")
    assert(g == Seq(("req_latency_milliseconds",
      "__name__=req_latency_milliseconds,a_b=7," +
        "resource_host_name=h1,resource_service_name=svc-a",
      1500L, 2.5)))
  }

  test("monotonic cumulative sum gets _total; {unit} is dropped") {
    val s = ts.filter(_._1 == "hits_total")
    assert(s.map(x => (x._1, x._3, x._4)) == Seq(("hits_total", 2000L, 41.0)))
    assert(s.head._2.startsWith("__name__=hits_total,"))
  }

  test("unit-1 gauge gets _ratio; a/b unit expands pairwise with _total") {
    assert(ts.exists(x => x._1 == "load_ratio" && x._4 == 0.7))
    assert(ts.exists(x => x._1 == "io_rate_bytes_seconds_total" && x._4 == 8.0))
  }

  test("histogram fans out count/sum/buckets with le labels, +Inf last") {
    val h = ts.filter(_._1.startsWith("lat_hist")).sortBy(x => (x._1, x._2))
    assert(h.map(_._1) ==
      Seq("lat_hist_bucket", "lat_hist_bucket", "lat_hist_bucket",
        "lat_hist_count", "lat_hist_sum"))
    val les = h.filter(_._1 == "lat_hist_bucket")
      .map(x => x._2.split(",").find(_.startsWith("le=")).get -> x._4).toMap
    assert(les == Map("le=10.0" -> 1.0, "le=20.0" -> 2.0, "le=+Inf" -> 3.0))
    assert(h.find(_._1 == "lat_hist_count").get._4 == 6.0)
    assert(h.find(_._1 == "lat_hist_sum").get._4 == 9.5)
  }

  test("summary fans out count/sum/quantile series") {
    val q = ts.filter(x => x._1 == "q1" || x._1.startsWith("q1_"))
    assert(q.size == 4)
    assert(q.exists(x => x._2.contains("quantile=0.5") && x._4 == 5.0))
    assert(q.exists(x => x._2.contains("quantile=0.99") && x._4 == 9.9))
  }

  test("WriteRequest wire roundtrip through snappy") {
    import PromRemoteWrite._
    val in = Seq(
      PromSeries(Seq("__name__" -> "up", "job" -> "graft"), 1234L, 1.0),
      PromSeries(Seq("__name__" -> "lat_bucket", "le" -> "+Inf"), 99L, -2.5))
    val wire = snappy(encodeWriteRequest(in))
    assert(decodeWriteRequest(unsnappy(wire)) == in)
  }

  test("requests() packs per partition under the byte bound, roundtrips") {
    import spark.implicits._
    val rows = (1 to 400).map(i =>
      (s"__name__=m$i,job=graft", i.toLong, i / 2.0))
    val df = rows.toDF("labels", "ts_ms", "value").repartition(3)
    val reqs = PromRemoteWrite.requests(df, maxRequestBytes = 512).collect()
    assert(reqs.length > 3) // the bound forced multiple batches per partition
    val back = reqs.flatMap(r => PromRemoteWrite.decodeWriteRequest(
      PromRemoteWrite.unsnappy(r.getAs[Array[Byte]]("payload"))))
      .map(s => (s.labels.map(kv => s"${kv._1}=${kv._2}").mkString(","),
        s.tsMs, s.value)).toSeq.sorted
    assert(back == rows.sorted)
    assert(reqs.map(_.getAs[Long]("series")).sum == 400L)
  }
}
