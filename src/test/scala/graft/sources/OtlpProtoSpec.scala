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

  test("encode/decode round-trips the model exactly") {
    val reqs = (0L until 20L).map(request)
    reqs.foreach { r =>
      assert(decodeTraceRequest(encodeTraceRequest(r)) == r)
    }
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
