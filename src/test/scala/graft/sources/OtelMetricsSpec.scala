package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OtelMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def decode(json: String, maxScale: Int = 10) = {
    import spark.implicits._
    OtelMetrics.metrics(Seq(json).toDF("otlp"), "otlp",
      exponentialHistogramMaxAllowedScale = maxScale)
      .collect().map(r => r.getAs[String]("kind") -> r).toMap
  }

  private val fixture =
    """{"resourceMetrics":[{
      |"resource":{"attributes":[
      |  {"key":"service.name","value":{"stringValue":"svc-a"}},
      |  {"key":"host.name","value":{"stringValue":"h1"}}]},
      |"scopeMetrics":[{"scope":{"name":"graft","version":"1"},
      |"metrics":[
      | {"name":"g1","unit":"ms","description":"d",
      |  "gauge":{"dataPoints":[{"timeUnixNano":"1500000321","asDouble":2.5,
      |    "attributes":[{"key":"a.b","value":{"intValue":"7"}}]}]}},
      | {"name":"s1",
      |  "sum":{"isMonotonic":true,"aggregationTemporality":"AGGREGATION_TEMPORALITY_CUMULATIVE",
      |    "dataPoints":[{"timeUnixNano":"2000000000","asInt":"41"}]}},
      | {"name":"h1",
      |  "histogram":{"aggregationTemporality":"AGGREGATION_TEMPORALITY_DELTA",
      |    "dataPoints":[{"timeUnixNano":"3000000000","count":"6","sum":9.5,
      |      "bucketCounts":["1","2","3"],"explicitBounds":[10.0,20.0]}]}},
      | {"name":"e1",
      |  "exponentialHistogram":{"aggregationTemporality":"AGGREGATION_TEMPORALITY_DELTA",
      |    "dataPoints":[{"timeUnixNano":"4000000000","count":"3","sum":7.0,"scale":1,
      |      "positive":{"offset":0,"bucketCounts":["1","2"]},
      |      "negative":{"offset":1,"bucketCounts":["3"]}}]}},
      | {"name":"q1",
      |  "summary":{"dataPoints":[{"timeUnixNano":"5000000000","count":"10","sum":55.0,
      |    "quantileValues":[{"quantile":0.5,"value":5.0},{"quantile":0.99,"value":9.9}]}]}}
      |]}]}]}""".stripMargin.replaceAll("\n", "")

  test("all five kinds decode with reference field semantics") {
    val rows = decode(fixture)
    assert(rows.keySet ==
      Set("gauge", "sum", "histogram", "exponential_histogram", "summary"))

    val g = rows("gauge")
    assert(g.getAs[String]("name") == "g1" && g.getAs[String]("unit") == "ms")
    assert(g.getAs[String]("serviceName") == "svc-a")
    assert(g.getAs[Double]("value") == 2.5)
    assert(g.getAs[String]("time") == "1970-01-01T00:00:01.500000321Z")
    val attrs = g.getAs[Map[String, String]]("attributes")
    assert(attrs("metric.attributes.a@b") == "7")       // dot -> @, prefixed
    assert(attrs("resource.attributes.host@name") == "h1")
    assert(attrs("instrumentationScope.name") == "graft")

    val s = rows("sum")
    assert(s.getAs[Double]("value") == 41.0)            // asInt path
    assert(s.getAs[Boolean]("isMonotonic"))
    assert(s.getAs[String]("aggregationTemporality") ==
      "AGGREGATION_TEMPORALITY_CUMULATIVE")

    val q = rows("summary")
    assert(q.getAs[Long]("count") == 10L && q.getAs[Double]("sum") == 55.0)
    val quants = q.getAs[scala.collection.Seq[Row]]("quantiles")
    assert(quants.map(r => (r.getDouble(0), r.getDouble(1))).toSeq ==
      Seq((0.5, 5.0), (0.99, 9.9)))
  }

  test("histogram buckets: first min is -FloatMax, last max FloatMax") {
    val h = decode(fixture)("histogram")
    assert(h.getAs[Long]("count") == 6L && h.getAs[Double]("sum") == 9.5)
    assert(h.getAs[scala.collection.Seq[Long]]("bucketCounts").toSeq == Seq(1L, 2L, 3L))
    val b = h.getAs[scala.collection.Seq[Row]]("buckets")
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
    val fmax = java.lang.Float.MAX_VALUE.toDouble
    assert(b == Seq((-fmax, 10.0, 1L), (10.0, 20.0, 2L), (20.0, fmax, 3L)))
  }

  test("exponential buckets: 2^(i/2^scale) bounds from the offset") {
    val e = decode(fixture)("exponential_histogram")
    val b = e.getAs[scala.collection.Seq[Row]]("buckets")
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
    val r2 = math.pow(2.0, 0.5)
    // positive offset 0: [2^0,2^.5)x1, [2^.5,2^1)x2; negative offset 1: [2^.5,2^1)x3
    assert(b == Seq((1.0, r2, 1L), (r2, 2.0, 2L), (r2, 2.0, 3L)))
  }

  test("negative scale uses the 2^(2^i) branch; over-scale datapoints drop") {
    val json =
      """{"resourceMetrics":[{"resource":{},"scopeMetrics":[{"scope":{"name":"g"},
        |"metrics":[{"name":"e2","exponentialHistogram":{"dataPoints":[
        | {"timeUnixNano":"1","count":"1","scale":-1,
        |  "positive":{"offset":0,"bucketCounts":["4"]}},
        | {"timeUnixNano":"2","count":"1","scale":12,
        |  "positive":{"offset":0,"bucketCounts":["9"]}}]}}]}]}]}"""
        .stripMargin.replaceAll("\n", "")
    import spark.implicits._
    val out = OtelMetrics.metrics(Seq(json).toDF("otlp"), "otlp").collect()
    assert(out.length == 1) // |scale|=12 > maxAllowedScale=10 dropped
    val b = out(0).getAs[scala.collection.Seq[Row]]("buckets")
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(b == Seq((2.0, 4.0, 4L))) // 2^(2^0)=2, 2^(2^1)=4
  }

  test("JSON omitting proto3-default fields (offset/scale/quantile) " +
      "matches binary wire output") {
    // A spec-conformant JSON marshaller OMITS proto3-default fields
    // (scale=0, offset=0, quantile=0.0) — the binary decoder materializes
    // them as 0. Both wire forms must produce identical rows.
    val omitting =
      """{"resourceMetrics":[{"resource":{},"scopeMetrics":[{"scope":{"name":"g"},
        |"metrics":[
        | {"name":"e3","exponentialHistogram":{"dataPoints":[
        |  {"timeUnixNano":"1","count":"3",
        |   "positive":{"bucketCounts":["1","2"]}}]}},
        | {"name":"q3","summary":{"dataPoints":[
        |  {"timeUnixNano":"2","count":"1","sum":4.0,
        |   "quantileValues":[{"value":4.0}]}]}}]}]}]}"""
        .stripMargin.replaceAll("\n", "")
    import spark.implicits._
    val fromJson = OtelMetrics.metrics(Seq(omitting).toDF("otlp"), "otlp")
      .collect().map(r => r.getAs[String]("kind") -> r).toMap
    // scale omitted => 0 => bounds 2^i from offset 0: [1,2)x1, [2,4)x2
    val b = fromJson("exponential_histogram")
      .getAs[scala.collection.Seq[Row]]("buckets")
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(b == Seq((1.0, 2.0, 1L), (2.0, 4.0, 2L)))
    // quantile omitted => 0.0 (the p0/min quantile), not null
    val quants = fromJson("summary").getAs[scala.collection.Seq[Row]]("quantiles")
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(quants == Seq((0.0, 4.0)))

    // and the binary wire form of the equivalent payload agrees exactly
    import OtlpProto._
    val binReq = MMetricsRequest(Seq(MResourceMetrics(None, Seq(MScopeMetrics(
      Some(PScope(Some("g"), None)), Seq(
        MMetric(Some("e3"), None, None, None, None, None,
          Some(MExpHistogram(Seq(MExpDp(None, Some("1"), Some("3"), None,
            Some(0), None, Some(MBuckets(Some(0), Seq("1", "2"))), None,
            None, Nil)), None)), None),
        MMetric(Some("q3"), None, None, None, None, None, None,
          Some(MSummary(Seq(MSummDp(None, Some("2"), Some("1"), Some(4.0),
            Seq(MQuantile(Some(0.0), Some(4.0))), None, Nil)))))))))))
    val binDf = Seq(Tuple1(encodeMetricsRequest(binReq))).toDF("otlp")
    val fromProto = OtelMetrics.metricsFromProto(binDf, "otlp")
      .collect().map(_.toSeq).toSet
    assert(fromProto == fromJson.values.map(_.toSeq).toSet)
  }

  test("passthrough columns survive and plan stays shuffle-free") {
    import spark.implicits._
    val df = Seq((7L, fixture)).toDF("rid", "otlp")
    val out = OtelMetrics.metrics(df, "otlp")
    assert(out.select("rid").distinct().collect().map(_.getLong(0)).toSeq == Seq(7L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
