package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.OtlpProto._

class OtlpProtoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def span(i: Long): PSpan = PSpan(
    traceId = Some(f"$i%032x"),
    spanId = Some(f"${i + 1}%016x"),
    parentSpanId = if (i % 3 == 0) None else Some(f"${i / 3}%016x"),
    traceState = if (i % 4 == 0) Some("k=v") else None,
    name = Some(s"op-$i"),
    kind = Some(if (i % 2 == 0) "SPAN_KIND_SERVER" else "SPAN_KIND_CLIENT"),
    startTimeUnixNano = Some((1700000000000000000L + i * 1000).toString),
    endTimeUnixNano = Some((1700000000000000000L + i * 1000 + 500 * i).toString),
    attributes = Seq(
      PKV("uid", PAny(None, Some((i * 7).toString), None, None)),
      PKV("host", PAny(Some(s"h$i"), None, None, None)),
      PKV("score", PAny(None, None, Some(i * 0.25), None)),
      PKV("ok", PAny(None, None, None, Some(i % 2 == 0)))),
    status = Some(PStatus(Some("STATUS_CODE_OK"), None)))

  private def request(i: Long): PTraceRequest = PTraceRequest(Seq(
    PResourceSpans(
      Some(PResource(Seq(PKV("service.name",
        PAny(Some(s"svc-${i % 3}"), None, None, None))))),
      Seq(PScopeSpans(Some(PScope(Some("graft"), Some("1.0"))),
        Seq(span(i), span(i + 100)))))))

  /** The equivalent OTLP/JSON wire form of [[request]] (proto3 JSON
    * mapping: int64 as strings, ids as lowercase hex, defaults omitted). */
  private def requestJson(i: Long): String = {
    def spanJson(s: PSpan): String = {
      val attrs = s.attributes.map { kv =>
        val v = kv.value
        val body = v.stringValue.map(x => s""""stringValue":"$x"""")
          .orElse(v.intValue.map(x => s""""intValue":"$x""""))
          .orElse(v.doubleValue.map(x => s""""doubleValue":$x"""))
          .orElse(v.boolValue.map(x => s""""boolValue":$x""")).get
        s"""{"key":"${kv.key}","value":{$body}}"""
      }.mkString(",")
      val parent = s.parentSpanId.map(p => s""""parentSpanId":"$p",""").getOrElse("")
      val ts = s.traceState.map(t => s""""traceState":"$t",""").getOrElse("")
      s"""{"traceId":"${s.traceId.get}","spanId":"${s.spanId.get}",$parent$ts""" +
        s""""name":"${s.name.get}","kind":"${s.kind.get}",""" +
        s""""startTimeUnixNano":"${s.startTimeUnixNano.get}",""" +
        s""""endTimeUnixNano":"${s.endTimeUnixNano.get}",""" +
        s""""attributes":[$attrs],"status":{"code":"STATUS_CODE_OK"}}"""
    }
    val req = request(i)
    val rs = req.resourceSpans.head
    val svc = rs.resource.get.attributes.head.value.stringValue.get
    val spans = rs.scopeSpans.head.spans.map(spanJson).mkString(",")
    s"""{"resourceSpans":[{"resource":{"attributes":[{"key":"service.name",""" +
      s""""value":{"stringValue":"$svc"}}]},"scopeSpans":[{"scope":""" +
      s"""{"name":"graft","version":"1.0"},"spans":[$spans]}]}]}"""
  }

  test("binary wire decode ≡ JSON wire decode, byte for byte") {
    val ids = (0L until 50L).toSeq
    val binDf = ids.map(i => Tuple1(encodeTraceRequest(request(i))))
      .toDF("otlp")
    val jsonDf = ids.map(i => Tuple1(requestJson(i))).toDF("otlp")
    val fromProto = OtelJson.spansFromProto(binDf, "otlp")
      .collect().map(_.toSeq).toSet
    val fromJson = OtelJson.spans(jsonDf, "otlp")
      .collect().map(_.toSeq).toSet
    assert(fromProto == fromJson)
    assert(fromProto.size == ids.size * 2)
  }

  test("decoder skips unknown fields and tolerates empty/null payloads") {
    // append unknown fields of every wire type at the request level:
    // field 9 varint, field 10 fixed64, field 11 length-delimited
    val base = encodeTraceRequest(request(1L))
    val extra = new Writer
    extra.varintField(9, 12345L)
    extra.fixed64(10, 0x1122334455667788L)
    extra.str(11, "future-field")
    val withUnknown = base ++ extra.bytes
    assert(decodeTraceRequest(withUnknown) == decodeTraceRequest(base))
    assert(decodeTraceRequest(Array.emptyByteArray) == PTraceRequest(Nil))
    assert(decodeTraceRequest(null) == PTraceRequest(Nil))
  }

  test("corrupt/truncated payloads quarantine to an empty request, never throw") {
    val trace = encodeTraceRequest(request(1L))
    val logs = encodeLogsRequest(logsFixture(1L))
    val metrics = encodeMetricsRequest(metricsFixture(1L))
    // every strict prefix of each valid message must decode without
    // throwing (quarantine contract — one bad payload must not fail a job)
    for (n <- 1 until trace.length) decodeTraceRequest(trace.take(n))
    for (n <- 1 until logs.length) decodeLogsRequest(logs.take(n))
    for (n <- 1 until metrics.length) decodeMetricsRequest(metrics.take(n))
    // a mid-message cut loses the whole request, not a misparsed sibling
    assert(decodeTraceRequest(trace.take(trace.length / 2)) == PTraceRequest(Nil))
    assert(decodeLogsRequest(logs.take(3)) == LLogsRequest(Nil))
    assert(decodeMetricsRequest(Array.fill[Byte](64)(0x7f.toByte)) ==
      MMetricsRequest(Nil))
    // length prefix claiming more bytes than exist
    val lying = new Writer
    lying.tag(1, 2); lying.rawByte(120); lying.rawByte(1); lying.rawByte(2)
    assert(decodeTraceRequest(lying.bytes) == PTraceRequest(Nil))
  }

  test("encode/decode round-trips the model exactly") {
    val reqs = (0L until 20L).map(request)
    reqs.foreach { r =>
      assert(decodeTraceRequest(encodeTraceRequest(r)) == r)
    }
  }

  // ------------------------------------------------------------- metrics

  private def numDp(i: Long, int: Boolean): MNumDp = MNumDp(
    startTimeUnixNano = Some((1700000000000000000L + i).toString),
    timeUnixNano = Some((1700000000000001000L + i).toString),
    asDouble = if (int) None else Some(i * 1.5),
    asInt = if (int) Some((-3 * i).toString) else None,
    flags = None,
    attributes = Seq(PKV("k", PAny(Some(s"v$i"), None, None, None))))

  private def metricsFixture(i: Long): MMetricsRequest = MMetricsRequest(Seq(
    MResourceMetrics(
      Some(PResource(Seq(PKV("service.name",
        PAny(Some(s"svc-${i % 2}"), None, None, None))))),
      Seq(MScopeMetrics(Some(PScope(Some("graft"), Some("1.0"))), Seq(
        MMetric(Some(s"gauge-$i"), Some("d"), Some("ms"),
          Some(MGauge(Seq(numDp(i, int = false), numDp(i + 1, int = true)))),
          None, None, None, None),
        MMetric(Some(s"sum-$i"), None, Some("1"), None,
          Some(MSum(Seq(numDp(i + 2, int = false)), Some(true),
            Some("AGGREGATION_TEMPORALITY_CUMULATIVE"))), None, None, None),
        MMetric(Some(s"hist-$i"), None, None, None, None,
          Some(MHistogram(Seq(MHistDp(
            Some("1700000000000000000"), Some("1700000000000002000"),
            Some((10 + i).toString), Some(55.5 + i),
            bucketCounts = Seq("1", "4", (5 + i).toString),
            explicitBounds = Seq(0.5, 2.5),
            flags = None,
            attributes = Seq(PKV("h", PAny(None, Some(i.toString), None, None))))),
            Some("AGGREGATION_TEMPORALITY_DELTA"))), None, None),
        MMetric(Some(s"exp-$i"), None, None, None, None, None,
          Some(MExpHistogram(Seq(MExpDp(
            Some("1700000000000000000"), Some("1700000000000003000"),
            Some("7"), Some(12.25), scale = Some(if (i % 2 == 0) 2 else -1),
            zeroCount = Some("2"),
            positive = Some(MBuckets(Some(3), Seq("1", "2"))),
            negative = Some(MBuckets(Some(0), Seq("4"))),
            flags = None, attributes = Nil)),
            Some("AGGREGATION_TEMPORALITY_DELTA"))), None),
        MMetric(Some(s"summ-$i"), None, None, None, None, None, None,
          Some(MSummary(Seq(MSummDp(
            Some("1700000000000000000"), Some("1700000000000004000"),
            Some("20"), Some(99.5),
            quantileValues = Seq(MQuantile(Some(0.5), Some(1.25)),
              MQuantile(Some(0.99), Some(9.75))),
            flags = None, attributes = Nil)))))))))))

  /** Equivalent OTLP/JSON wire form (proto3 JSON: int64/uint64 strings,
    * enum names, defaults omitted). */
  private def metricsJson(req: MMetricsRequest): String = {
    def attrs(as: Seq[PKV]): String = as.map { kv =>
      val v = kv.value
      val body = v.stringValue.map(x => s""""stringValue":"$x"""")
        .orElse(v.intValue.map(x => s""""intValue":"$x""""))
        .orElse(v.doubleValue.map(x => s""""doubleValue":$x"""))
        .orElse(v.boolValue.map(x => s""""boolValue":$x""")).get
      s"""{"key":"${kv.key}","value":{$body}}"""
    }.mkString("[", ",", "]")
    def numDpJson(dp: MNumDp): String = {
      val value = dp.asDouble.map(d => s""""asDouble":$d""")
        .orElse(dp.asInt.map(x => s""""asInt":"$x"""")).get
      s"""{"startTimeUnixNano":"${dp.startTimeUnixNano.get}",""" +
        s""""timeUnixNano":"${dp.timeUnixNano.get}",$value,""" +
        s""""attributes":${attrs(dp.attributes)}}"""
    }
    def metricJson(m: MMetric): String = {
      val head = s""""name":"${m.name.get}"""" +
        m.description.map(d => s""","description":"$d"""").getOrElse("") +
        m.unit.map(u => s""","unit":"$u"""").getOrElse("")
      val kind = (m.gauge, m.sum, m.histogram, m.exponentialHistogram, m.summary) match {
        case (Some(g), _, _, _, _) =>
          s""""gauge":{"dataPoints":[${g.dataPoints.map(numDpJson).mkString(",")}]}"""
        case (_, Some(s), _, _, _) =>
          s""""sum":{"dataPoints":[${s.dataPoints.map(numDpJson).mkString(",")}],""" +
            s""""aggregationTemporality":"${s.aggregationTemporality.get}",""" +
            s""""isMonotonic":${s.isMonotonic.get}}"""
        case (_, _, Some(h), _, _) =>
          val dp = h.dataPoints.head
          s""""histogram":{"dataPoints":[{"startTimeUnixNano":"${dp.startTimeUnixNano.get}",""" +
            s""""timeUnixNano":"${dp.timeUnixNano.get}","count":"${dp.count.get}",""" +
            s""""sum":${dp.sum.get},"bucketCounts":[${dp.bucketCounts.map("\"" + _ + "\"").mkString(",")}],""" +
            s""""explicitBounds":[${dp.explicitBounds.mkString(",")}],""" +
            s""""attributes":${attrs(dp.attributes)}}],""" +
            s""""aggregationTemporality":"${h.aggregationTemporality.get}"}"""
        case (_, _, _, Some(h), _) =>
          val dp = h.dataPoints.head
          def buckets(b: MBuckets): String =
            s"""{"offset":${b.offset.get},"bucketCounts":[${b.bucketCounts.map("\"" + _ + "\"").mkString(",")}]}"""
          s""""exponentialHistogram":{"dataPoints":[{"startTimeUnixNano":"${dp.startTimeUnixNano.get}",""" +
            s""""timeUnixNano":"${dp.timeUnixNano.get}","count":"${dp.count.get}",""" +
            s""""sum":${dp.sum.get},"scale":${dp.scale.get},"zeroCount":"${dp.zeroCount.get}",""" +
            s""""positive":${buckets(dp.positive.get)},"negative":${buckets(dp.negative.get)}}],""" +
            s""""aggregationTemporality":"${h.aggregationTemporality.get}"}"""
        case (_, _, _, _, Some(s)) =>
          val dp = s.dataPoints.head
          val qs = dp.quantileValues.map(q =>
            s"""{"quantile":${q.quantile.get},"value":${q.value.get}}""").mkString(",")
          s""""summary":{"dataPoints":[{"startTimeUnixNano":"${dp.startTimeUnixNano.get}",""" +
            s""""timeUnixNano":"${dp.timeUnixNano.get}","count":"${dp.count.get}",""" +
            s""""sum":${dp.sum.get},"quantileValues":[$qs]}]}"""
        case _ => ""
      }
      s"{$head,$kind}"
    }
    val rm = req.resourceMetrics.head
    val svcAttrs = attrs(rm.resource.get.attributes)
    val sm = rm.scopeMetrics.head
    s"""{"resourceMetrics":[{"resource":{"attributes":$svcAttrs},""" +
      s""""scopeMetrics":[{"scope":{"name":"${sm.scope.get.name.get}","version":"${sm.scope.get.version.get}"},""" +
      s""""metrics":[${sm.metrics.map(metricJson).mkString(",")}]}]}]}"""
  }

  test("metrics: binary wire decode ≡ JSON wire decode across all five kinds") {
    val ids = (0L until 20L).toSeq
    val binDf = ids.map(i => Tuple1(encodeMetricsRequest(metricsFixture(i)))).toDF("otlp")
    val jsonDf = ids.map(i => Tuple1(metricsJson(metricsFixture(i)))).toDF("otlp")
    val fromProto = OtelMetrics.metricsFromProto(binDf, "otlp")
      .collect().map(_.toSeq).toSet
    val fromJson = OtelMetrics.metrics(jsonDf, "otlp")
      .collect().map(_.toSeq).toSet
    assert(fromProto.size == fromJson.size)
    assert(fromProto == fromJson)
    // every kind present
    val kinds = OtelMetrics.metricsFromProto(binDf, "otlp")
      .select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("gauge", "sum", "histogram", "exponential_histogram", "summary"))
  }

  test("metrics: encode/decode round-trips the model exactly") {
    (0L until 6L).map(metricsFixture).foreach { r =>
      assert(decodeMetricsRequest(encodeMetricsRequest(r)) == r)
    }
    assert(decodeMetricsRequest(Array.emptyByteArray) == MMetricsRequest(Nil))
    assert(decodeMetricsRequest(null) == MMetricsRequest(Nil))
  }

  test("metrics: unpacked repeated primitives decode like packed ones") {
    // some producers emit repeated fixed64/double unpacked (one tag per
    // element); the decoder must accept both encodings
    val w = new Writer
    w.fixed64(6, 3L); w.fixed64(6, 9L)                          // bucket_counts
    w.fixed64(7, java.lang.Double.doubleToLongBits(1.5))         // explicit_bounds
    w.fixed64(4, 12L)                                            // count
    val histDpBytes = w.bytes
    val hw = new Writer
    hw.bytesField(1, histDpBytes)                                // Histogram.data_points
    val mw = new Writer
    mw.str(1, "h"); mw.bytesField(9, hw.bytes)                   // Metric.histogram
    val smw = new Writer
    smw.bytesField(2, mw.bytes)                                  // ScopeMetrics.metrics
    val rmw = new Writer
    rmw.bytesField(2, smw.bytes)                                 // ResourceMetrics.scope_metrics
    val req = new Writer
    req.bytesField(1, rmw.bytes)                                 // request.resource_metrics
    val dp = decodeMetricsRequest(req.bytes)
      .resourceMetrics.head.scopeMetrics.head.metrics.head.histogram.get.dataPoints.head
    assert(dp.bucketCounts == Seq("3", "9"))
    assert(dp.explicitBounds == Seq(1.5))
    assert(dp.count.contains("12"))
  }

  // ---------------------------------------------------------------- logs

  private def logsFixture(i: Long): LLogsRequest = LLogsRequest(Seq(
    LResourceLogs(
      Some(PResource(Seq(
        PKV("service.name", PAny(Some(s"svc-${i % 3}"), None, None, None)),
        PKV("host.name", PAny(Some(s"h$i"), None, None, None))))),
      Seq(LScopeLogs(Some(PScope(Some("graft"), Some("1.0"))), Seq(
        LLogRecord(
          timeUnixNano = Some((1700000000000000000L + i * 1000).toString),
          observedTimeUnixNano = Some((1700000000000002000L + i * 1000).toString),
          severityNumber = Some((9 + i % 5).toInt),
          severityText = Some(if (i % 2 == 0) "INFO" else "WARN"),
          body = Some(PAny(Some(s"message $i"), None, None, None)),
          attributes = Seq(
            PKV("uid", PAny(None, Some((i * 3).toString), None, None)),
            PKV("a.dotted", PAny(Some("x"), None, None, None))),
          droppedAttributesCount = None,
          flags = if (i % 4 == 0) Some(1) else None,
          traceId = Some(f"$i%032x"),
          spanId = Some(f"${i + 1}%016x")),
        LLogRecord(Some((1700000000000009000L + i).toString), None, None,
          None, Some(PAny(None, Some(i.toString), None, None)), Nil,
          None, None, None, None)))))))

  private def logsJson(req: LLogsRequest): String = {
    def attrs(as: Seq[PKV]): String = as.map { kv =>
      val v = kv.value
      val body = v.stringValue.map(x => s""""stringValue":"$x"""")
        .orElse(v.intValue.map(x => s""""intValue":"$x""""))
        .orElse(v.doubleValue.map(x => s""""doubleValue":$x"""))
        .orElse(v.boolValue.map(x => s""""boolValue":$x""")).get
      s"""{"key":"${kv.key}","value":{$body}}"""
    }.mkString("[", ",", "]")
    def rec(l: LLogRecord): String = {
      val parts = Seq(
        l.timeUnixNano.map(t => s""""timeUnixNano":"$t""""),
        l.observedTimeUnixNano.map(t => s""""observedTimeUnixNano":"$t""""),
        l.severityNumber.map(v => s""""severityNumber":$v"""),
        l.severityText.map(v => s""""severityText":"$v""""),
        l.body.map(b => s""""body":{${
          b.stringValue.map(x => s""""stringValue":"$x"""")
            .orElse(b.intValue.map(x => s""""intValue":"$x"""")).get}}"""),
        if (l.attributes.nonEmpty) Some(s""""attributes":${attrs(l.attributes)}""") else None,
        l.flags.map(v => s""""flags":$v"""),
        l.traceId.map(v => s""""traceId":"$v""""),
        l.spanId.map(v => s""""spanId":"$v""""))
      parts.flatten.mkString("{", ",", "}")
    }
    val rl = req.resourceLogs.head
    val sl = rl.scopeLogs.head
    s"""{"resourceLogs":[{"resource":{"attributes":${attrs(rl.resource.get.attributes)}},""" +
      s""""scopeLogs":[{"scope":{"name":"${sl.scope.get.name.get}","version":"${sl.scope.get.version.get}"},""" +
      s""""logRecords":[${sl.logRecords.map(rec).mkString(",")}]}]}]}"""
  }

  test("logs: binary wire decode ≡ JSON wire decode") {
    val ids = (0L until 30L).toSeq
    val binDf = ids.map(i => Tuple1(encodeLogsRequest(logsFixture(i)))).toDF("otlp")
    val jsonDf = ids.map(i => Tuple1(logsJson(logsFixture(i)))).toDF("otlp")
    val fromProto = OtelLogs.logsFromProto(binDf, "otlp").collect().map(_.toSeq).toSet
    val fromJson = OtelLogs.logs(jsonDf, "otlp").collect().map(_.toSeq).toSet
    assert(fromProto == fromJson)
    assert(fromProto.size == ids.size * 2)
    // merged attribute map: log.attributes.* (dots -> @) + resource + scope
    val row = OtelLogs.logsFromProto(binDf, "otlp")
      .filter(col("severityText") === "INFO")
      .select("attributes").head().getMap[String, String](0)
    assert(row("log.attributes.a@dotted") == "x")
    assert(row("resource.attributes.host@name").startsWith("h"))
    assert(row("instrumentationScope.name") == "graft")
  }

  test("logs: encode/decode round-trips the model exactly") {
    (0L until 6L).map(logsFixture).foreach { r =>
      assert(decodeLogsRequest(encodeLogsRequest(r)) == r)
    }
    assert(decodeLogsRequest(null) == LLogsRequest(Nil))
  }

  test("unsigned 64-bit timestamps survive the fixed64 path") {
    // a nanos value with the top bit set must round-trip as unsigned
    val big = java.lang.Long.parseUnsignedLong("18446744073709551615")
    val s = span(0L).copy(startTimeUnixNano = Some(java.lang.Long.toUnsignedString(big)),
      endTimeUnixNano = Some(java.lang.Long.toUnsignedString(big)))
    val r = PTraceRequest(Seq(PResourceSpans(None,
      Seq(PScopeSpans(None, Seq(s))))))
    assert(decodeTraceRequest(encodeTraceRequest(r)) == r)
  }
}
