package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** OTLP protobuf WIRE-FORM codec — own kernel, no protobuf runtime.
  *
  * The reference's `otlp-source` (otlp-source/.../OTLPSource.java:45)
  * receives `ExportTraceServiceRequest` as binary protobuf; round 2 decoded
  * only the JSON wire form. The binary wire format is public (proto3
  * encoding: varint / fixed64 / length-delimited) and the message layout is
  * the public opentelemetry-proto schema, so this decoder is feasible as an
  * own kernel in the [[IonText]] / [[EventJson]] style.
  *
  * The decoder materializes the SAME struct tree that
  * [[OtelJson.SpanSchemaDdl]]'s `from_json` yields — lowercase-hex ids,
  * int64 as decimal strings, enum names, absent-field → null (mirroring the
  * OTLP JSON marshaller, which omits proto3 defaults) — so the downstream
  * flattening is shared verbatim and JSON-wire vs proto-wire pipelines are
  * byte-identical (OtlpProtoSpec pins this; gate q_otel_spans_proto).
  *
  * A minimal encoder ships alongside: the test fixture synthesizer and the
  * sink-side parity of the reference's OTLP export both need one.
  */
object OtlpProto {

  // ---------------------------------------------------------------- model
  // Field names/nullability mirror OtelJson.SpanSchemaDdl so a UDF
  // returning this tree produces the same StructType as from_json.

  final case class PAny(stringValue: Option[String], intValue: Option[String],
      doubleValue: Option[Double], boolValue: Option[Boolean])
  final case class PKV(key: String, value: PAny)
  final case class PResource(attributes: Seq[PKV])
  final case class PScope(name: Option[String], version: Option[String])
  final case class PStatus(code: Option[String], message: Option[String])
  final case class PSpan(traceId: Option[String], spanId: Option[String],
      parentSpanId: Option[String], traceState: Option[String],
      name: Option[String], kind: Option[String],
      startTimeUnixNano: Option[String], endTimeUnixNano: Option[String],
      attributes: Seq[PKV], status: Option[PStatus])
  final case class PScopeSpans(scope: Option[PScope], spans: Seq[PSpan])
  final case class PResourceSpans(resource: Option[PResource],
      scopeSpans: Seq[PScopeSpans])
  final case class PTraceRequest(resourceSpans: Seq[PResourceSpans])

  /** SpanKind enum names (trace.proto). Index = wire value. */
  private val KindNames = Array("SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL",
    "SPAN_KIND_SERVER", "SPAN_KIND_CLIENT", "SPAN_KIND_PRODUCER",
    "SPAN_KIND_CONSUMER")

  /** StatusCode enum names (trace.proto Status.code). */
  private val StatusNames = Array("STATUS_CODE_UNSET", "STATUS_CODE_OK",
    "STATUS_CODE_ERROR")

  // ------------------------------------------------------------ wire reader

  /** Cursor over one length-delimited scope of the buffer. */
  private[sources] final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end

    // Every primitive reader bounds-checks against `end`, not just
    // buf.length: a corrupt length prefix must not let a sub-message read
    // its SIBLING's bytes silently (which would misparse adjacent fields
    // without ever throwing).
    def readVarint(): Long = {
      var shift = 0
      var r = 0L
      while (shift < 64) {
        require(pos < end, "truncated varint")
        val b = buf(pos); pos += 1
        r |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return r
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }

    def readFixed64(): Long = {
      require(pos + 8 <= end, "truncated fixed64")
      var r = 0L
      var i = 0
      while (i < 8) { r |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      r
    }

    def readFixed32(): Int = {
      require(pos + 4 <= end, "truncated fixed32")
      var r = 0
      var i = 0
      while (i < 4) { r |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4
      r
    }

    def readLen(): Int = {
      val n = readVarint().toInt
      require(n >= 0 && pos + n <= end, s"bad length $n")
      n
    }

    def readBytes(): Array[Byte] = {
      val n = readLen()
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      a
    }

    def readString(): String = new String(readBytes(), UTF_8)

    /** Sub-reader over a length-delimited field; advances this cursor. */
    def sub(): Reader = {
      val n = readLen()
      val r = new Reader(buf, pos, pos + n)
      pos += n
      r
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => require(pos + 8 <= end, "truncated fixed64"); pos += 8
      case 2 =>
        // readLen() itself advances pos past the length varint; compute it
        // FIRST (`pos += readLen()` reads the pre-varint pos — off by the
        // varint's width)
        val n = readLen(); pos += n
      case 5 => require(pos + 4 <= end, "truncated fixed32"); pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }

  private def hexOrNone(b: Array[Byte]): Option[String] =
    if (b.isEmpty) None
    else {
      val sb = new java.lang.StringBuilder(b.length * 2)
      b.foreach(x => sb.append(f"${x & 0xff}%02x"))
      Some(sb.toString)
    }

  private def strOrNone(s: String): Option[String] =
    if (s.isEmpty) None else Some(s)

  // -------------------------------------------------------------- decoders

  private def decodeAny(r: Reader): PAny = {
    var s: Option[String] = None
    var i: Option[String] = None
    var d: Option[Double] = None
    var b: Option[Boolean] = None
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) => s = Some(r.readString())            // string_value
        case (2, 0) => b = Some(r.readVarint() != 0L)      // bool_value
        case (3, 0) => i = Some(r.readVarint().toString)   // int_value
        case (4, 1) => d = Some(java.lang.Double.longBitsToDouble(r.readFixed64()))
        case (_, w) => r.skip(w) // array/kvlist/bytes unsupported → dropped
      }
    }
    PAny(s, i, d, b)
  }

  private def decodeKv(r: Reader): PKV = {
    var key = ""
    var v = PAny(None, None, None, None)
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) => key = r.readString()
        case (2, 2) => v = decodeAny(r.sub())
        case (_, w) => r.skip(w)
      }
    }
    PKV(key, v)
  }

  private def decodeStatus(r: Reader): PStatus = {
    var msg: Option[String] = None
    var code: Option[String] = None
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (2, 2) => msg = strOrNone(r.readString())
        case (3, 0) =>
          val c = r.readVarint().toInt
          code = if (c > 0 && c < StatusNames.length) Some(StatusNames(c)) else None
        case (_, w) => r.skip(w)
      }
    }
    PStatus(code, msg)
  }

  private def decodeSpan(r: Reader): PSpan = {
    var traceId, spanId, parentSpanId, traceState, name, kind: Option[String] = None
    var startNs, endNs: Option[String] = None
    val attrs = Seq.newBuilder[PKV]
    var status: Option[PStatus] = None
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) => traceId = hexOrNone(r.readBytes())
        case (2, 2) => spanId = hexOrNone(r.readBytes())
        case (3, 2) => traceState = strOrNone(r.readString())
        case (4, 2) => parentSpanId = hexOrNone(r.readBytes())
        case (5, 2) => name = strOrNone(r.readString())
        case (6, 0) =>
          val k = r.readVarint().toInt
          kind = if (k > 0 && k < KindNames.length) Some(KindNames(k)) else None
        case (7, 1) => startNs = Some(java.lang.Long.toUnsignedString(r.readFixed64()))
        case (8, 1) => endNs = Some(java.lang.Long.toUnsignedString(r.readFixed64()))
        case (9, 2) => attrs += decodeKv(r.sub())
        case (15, 2) => status = Some(decodeStatus(r.sub()))
        case (_, w) => r.skip(w)
      }
    }
    PSpan(traceId, spanId, parentSpanId, traceState, name, kind,
      startNs, endNs, attrs.result(), status)
  }

  private def decodeScopeSpans(r: Reader): PScopeSpans = {
    var scope: Option[PScope] = None
    val spans = Seq.newBuilder[PSpan]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val sr = r.sub()
          var n, v: Option[String] = None
          while (sr.hasMore) {
            val t = sr.readVarint().toInt
            (t >> 3, t & 7) match {
              case (1, 2) => n = strOrNone(sr.readString())
              case (2, 2) => v = strOrNone(sr.readString())
              case (_, w) => sr.skip(w)
            }
          }
          scope = Some(PScope(n, v))
        case (2, 2) => spans += decodeSpan(r.sub())
        case (_, w) => r.skip(w)
      }
    }
    PScopeSpans(scope, spans.result())
  }

  private def decodeResourceSpans(r: Reader): PResourceSpans = {
    var resource: Option[PResource] = None
    val ss = Seq.newBuilder[PScopeSpans]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val rr = r.sub()
          val attrs = Seq.newBuilder[PKV]
          while (rr.hasMore) {
            val t = rr.readVarint().toInt
            (t >> 3, t & 7) match {
              case (1, 2) => attrs += decodeKv(rr.sub())
              case (_, w) => rr.skip(w)
            }
          }
          resource = Some(PResource(attrs.result()))
        case (2, 2) => ss += decodeScopeSpans(r.sub())
        case (_, w) => r.skip(w)
      }
    }
    PResourceSpans(resource, ss.result())
  }

  /** Decode an ExportTraceServiceRequest (or a bare ResourceSpans-list
    * message — same field number). Null/empty input → empty request.
    * Corrupt/truncated input → empty request (quarantine contract, same
    * as IonBinary.toJson: one bad payload must not fail the whole job). */
  def decodeTraceRequest(bytes: Array[Byte]): PTraceRequest = {
    if (bytes == null || bytes.isEmpty) return PTraceRequest(Nil)
    try {
      val r = new Reader(bytes, 0, bytes.length)
      val rs = Seq.newBuilder[PResourceSpans]
      while (r.hasMore) {
        val tag = r.readVarint().toInt
        (tag >> 3, tag & 7) match {
          case (1, 2) => rs += decodeResourceSpans(r.sub())
          case (_, w) => r.skip(w)
        }
      }
      PTraceRequest(rs.result())
    } catch { case scala.util.control.NonFatal(_) => PTraceRequest(Nil) }
  }

  // -------------------------------------------------------------- logs model
  // Mirrors OtelLogs.LogsSchemaDdl (public opentelemetry-proto logs.proto).

  final case class LLogRecord(timeUnixNano: Option[String],
      observedTimeUnixNano: Option[String], severityNumber: Option[Int],
      severityText: Option[String], body: Option[PAny], attributes: Seq[PKV],
      droppedAttributesCount: Option[Int], flags: Option[Int],
      traceId: Option[String], spanId: Option[String])
  final case class LScopeLogs(scope: Option[PScope], logRecords: Seq[LLogRecord])
  final case class LResourceLogs(resource: Option[PResource],
      scopeLogs: Seq[LScopeLogs])
  final case class LLogsRequest(resourceLogs: Seq[LResourceLogs])

  private def decodeLogRecord(r: Reader): LLogRecord = {
    var time, observed: Option[String] = None
    var sevNum, dropped, flags: Option[Int] = None
    var sevText, traceId, spanId: Option[String] = None
    var body: Option[PAny] = None
    val attrs = Seq.newBuilder[PKV]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 1) => time = Some(u64s(r.readFixed64()))
        case (11, 1) => observed = Some(u64s(r.readFixed64()))
        case (2, 0) =>
          val v = r.readVarint().toInt; sevNum = if (v != 0) Some(v) else None
        case (3, 2) => sevText = strOrNone(r.readString())
        case (5, 2) => body = Some(decodeAny(r.sub()))
        case (6, 2) => attrs += decodeKv(r.sub())
        case (7, 0) =>
          val v = r.readVarint().toInt; dropped = if (v != 0) Some(v) else None
        case (8, 5) =>
          val v = r.readFixed32(); flags = if (v != 0) Some(v) else None
        case (9, 2) => traceId = hexOrNone(r.readBytes())
        case (10, 2) => spanId = hexOrNone(r.readBytes())
        case (_, w) => r.skip(w)
      }
    }
    LLogRecord(time, observed, sevNum, sevText, body, attrs.result(),
      dropped, flags, traceId, spanId)
  }

  /** Decode an ExportLogsServiceRequest. Null/empty → empty request;
    * corrupt/truncated → empty request (quarantine contract). */
  def decodeLogsRequest(bytes: Array[Byte]): LLogsRequest = {
    if (bytes == null || bytes.isEmpty) return LLogsRequest(Nil)
    try decodeLogsRequestStrict(bytes)
    catch { case scala.util.control.NonFatal(_) => LLogsRequest(Nil) }
  }

  private def decodeLogsRequestStrict(bytes: Array[Byte]): LLogsRequest = {
    val r = new Reader(bytes, 0, bytes.length)
    val rls = Seq.newBuilder[LResourceLogs]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val rr = r.sub()
          var resource: Option[PResource] = None
          val sls = Seq.newBuilder[LScopeLogs]
          while (rr.hasMore) {
            val t = rr.readVarint().toInt
            (t >> 3, t & 7) match {
              case (1, 2) =>
                val res = rr.sub()
                val attrs = Seq.newBuilder[PKV]
                while (res.hasMore) {
                  val tt = res.readVarint().toInt
                  if ((tt >> 3, tt & 7) == ((1, 2))) attrs += decodeKv(res.sub())
                  else res.skip(tt & 7)
                }
                resource = Some(PResource(attrs.result()))
              case (2, 2) =>
                val sl = rr.sub()
                var scope: Option[PScope] = None
                val recs = Seq.newBuilder[LLogRecord]
                while (sl.hasMore) {
                  val tt = sl.readVarint().toInt
                  (tt >> 3, tt & 7) match {
                    case (1, 2) =>
                      val sc = sl.sub()
                      var n, v: Option[String] = None
                      while (sc.hasMore) {
                        val t3 = sc.readVarint().toInt
                        (t3 >> 3, t3 & 7) match {
                          case (1, 2) => n = strOrNone(sc.readString())
                          case (2, 2) => v = strOrNone(sc.readString())
                          case (_, w) => sc.skip(w)
                        }
                      }
                      scope = Some(PScope(n, v))
                    case (2, 2) => recs += decodeLogRecord(sl.sub())
                    case (_, w) => sl.skip(w)
                  }
                }
                sls += LScopeLogs(scope, recs.result())
              case (_, w) => rr.skip(w)
            }
          }
          rls += LResourceLogs(resource, sls.result())
        case (_, w) => r.skip(w)
      }
    }
    LLogsRequest(rls.result())
  }

  /** Encode a full ExportLogsServiceRequest. */
  def encodeLogsRequest(req: LLogsRequest): Array[Byte] = {
    def encodeRecord(l: LLogRecord): Writer = {
      val w = new Writer
      l.timeUnixNano.foreach(n => w.fixed64(1, java.lang.Long.parseUnsignedLong(n)))
      l.severityNumber.foreach(v => w.varintField(2, v.toLong))
      l.severityText.foreach(w.str(3, _))
      l.body.foreach(b => w.msg(5, encodeAny(b)))
      l.attributes.foreach(kv => w.msg(6, encodeKv(kv)))
      l.droppedAttributesCount.foreach(v => w.varintField(7, v.toLong))
      l.flags.foreach { v =>
        w.tag(8, 5)
        var i = 0
        while (i < 4) { w.rawByte((v >>> (8 * i)) & 0xff); i += 1 }
      }
      l.traceId.foreach(h => w.bytesField(9, hexToBytes(h)))
      l.spanId.foreach(h => w.bytesField(10, hexToBytes(h)))
      l.observedTimeUnixNano.foreach(n => w.fixed64(11, java.lang.Long.parseUnsignedLong(n)))
      w
    }
    val w = new Writer
    req.resourceLogs.foreach { rl =>
      val rw = new Writer
      rl.resource.foreach { res =>
        val resW = new Writer
        res.attributes.foreach(kv => resW.msg(1, encodeKv(kv)))
        rw.msg(1, resW)
      }
      rl.scopeLogs.foreach { sl =>
        val slW = new Writer
        sl.scope.foreach { sc =>
          val scW = new Writer
          sc.name.foreach(scW.str(1, _))
          sc.version.foreach(scW.str(2, _))
          slW.msg(1, scW)
        }
        sl.logRecords.foreach(rec => slW.msg(2, encodeRecord(rec)))
        rw.msg(2, slW)
      }
      w.msg(1, rw)
    }
    w.bytes
  }

  // ----------------------------------------------------------- metrics model
  // Field names/nullability mirror OtelMetrics.MetricsSchemaDdl so the
  // decode UDF yields the same struct tree as from_json on the JSON wire
  // form. Message layout: public opentelemetry-proto metrics.proto.

  final case class MNumDp(startTimeUnixNano: Option[String],
      timeUnixNano: Option[String], asDouble: Option[Double],
      asInt: Option[String], flags: Option[Int], attributes: Seq[PKV])
  final case class MHistDp(startTimeUnixNano: Option[String],
      timeUnixNano: Option[String], count: Option[String],
      sum: Option[Double], bucketCounts: Seq[String],
      explicitBounds: Seq[Double], flags: Option[Int], attributes: Seq[PKV])
  final case class MBuckets(offset: Option[Int], bucketCounts: Seq[String])
  final case class MExpDp(startTimeUnixNano: Option[String],
      timeUnixNano: Option[String], count: Option[String],
      sum: Option[Double], scale: Option[Int], zeroCount: Option[String],
      positive: Option[MBuckets], negative: Option[MBuckets],
      flags: Option[Int], attributes: Seq[PKV])
  final case class MQuantile(quantile: Option[Double], value: Option[Double])
  final case class MSummDp(startTimeUnixNano: Option[String],
      timeUnixNano: Option[String], count: Option[String],
      sum: Option[Double], quantileValues: Seq[MQuantile],
      flags: Option[Int], attributes: Seq[PKV])
  final case class MGauge(dataPoints: Seq[MNumDp])
  final case class MSum(dataPoints: Seq[MNumDp], isMonotonic: Option[Boolean],
      aggregationTemporality: Option[String])
  final case class MHistogram(dataPoints: Seq[MHistDp],
      aggregationTemporality: Option[String])
  final case class MExpHistogram(dataPoints: Seq[MExpDp],
      aggregationTemporality: Option[String])
  final case class MSummary(dataPoints: Seq[MSummDp])
  final case class MMetric(name: Option[String], description: Option[String],
      unit: Option[String], gauge: Option[MGauge], sum: Option[MSum],
      histogram: Option[MHistogram],
      exponentialHistogram: Option[MExpHistogram], summary: Option[MSummary])
  final case class MScopeMetrics(scope: Option[PScope], metrics: Seq[MMetric])
  final case class MResourceMetrics(resource: Option[PResource],
      scopeMetrics: Seq[MScopeMetrics])
  final case class MMetricsRequest(resourceMetrics: Seq[MResourceMetrics])

  /** AggregationTemporality enum names (metrics.proto). */
  private val TemporalityNames = Array("AGGREGATION_TEMPORALITY_UNSPECIFIED",
    "AGGREGATION_TEMPORALITY_DELTA", "AGGREGATION_TEMPORALITY_CUMULATIVE")

  private def zigzag32(v: Long): Int = (((v >>> 1) ^ -(v & 1)).toInt)

  // ------------------------------------------------------- metrics decoders

  private def u64s(v: Long): String = java.lang.Long.toUnsignedString(v)

  /** Packed OR unpacked repeated fixed64 field; returns decimal strings
    * (the proto3-JSON uint64 mapping). */
  private def readPackedFixed64(r: Reader, wire: Int,
      out: scala.collection.mutable.Builder[String, Seq[String]]): Unit =
    if (wire == 1) out += u64s(r.readFixed64())
    else { val s = r.sub(); while (s.hasMore) out += u64s(s.readFixed64()) }

  private def readPackedDouble(r: Reader, wire: Int,
      out: scala.collection.mutable.Builder[Double, Seq[Double]]): Unit = {
    def d(x: Long) = java.lang.Double.longBitsToDouble(x)
    if (wire == 1) out += d(r.readFixed64())
    else { val s = r.sub(); while (s.hasMore) out += d(s.readFixed64()) }
  }

  private def readPackedVarint(r: Reader, wire: Int,
      out: scala.collection.mutable.Builder[String, Seq[String]]): Unit =
    if (wire == 0) out += u64s(r.readVarint())
    else { val s = r.sub(); while (s.hasMore) out += u64s(s.readVarint()) }

  private def decodeNumDp(r: Reader): MNumDp = {
    var start, time, asInt: Option[String] = None
    var asDouble: Option[Double] = None
    var flags: Option[Int] = None
    val attrs = Seq.newBuilder[PKV]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (2, 1) => start = Some(u64s(r.readFixed64()))
        case (3, 1) => time = Some(u64s(r.readFixed64()))
        case (4, 1) => asDouble = Some(java.lang.Double.longBitsToDouble(r.readFixed64()))
        case (6, 1) => asInt = Some(r.readFixed64().toString) // sfixed64
        case (7, 2) => attrs += decodeKv(r.sub())
        case (8, 0) =>
          val f = r.readVarint().toInt; flags = if (f != 0) Some(f) else None
        case (_, w) => r.skip(w)
      }
    }
    MNumDp(start, time, asDouble, asInt, flags, attrs.result())
  }

  private def decodeHistDp(r: Reader): MHistDp = {
    var start, time, count: Option[String] = None
    var sum: Option[Double] = None
    var flags: Option[Int] = None
    val counts = Seq.newBuilder[String]
    val bounds = Seq.newBuilder[Double]
    val attrs = Seq.newBuilder[PKV]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (2, 1) => start = Some(u64s(r.readFixed64()))
        case (3, 1) => time = Some(u64s(r.readFixed64()))
        case (4, 1) => count = Some(u64s(r.readFixed64()))
        case (5, 1) => sum = Some(java.lang.Double.longBitsToDouble(r.readFixed64()))
        case (6, w) => readPackedFixed64(r, w, counts)
        case (7, w) => readPackedDouble(r, w, bounds)
        case (9, 2) => attrs += decodeKv(r.sub())
        case (10, 0) =>
          val f = r.readVarint().toInt; flags = if (f != 0) Some(f) else None
        case (_, w) => r.skip(w)
      }
    }
    MHistDp(start, time, count, sum, counts.result(), bounds.result(),
      flags, attrs.result())
  }

  private def decodeBuckets(r: Reader): MBuckets = {
    var offset: Option[Int] = None
    val counts = Seq.newBuilder[String]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 0) => offset = Some(zigzag32(r.readVarint()))
        case (2, w) => readPackedVarint(r, w, counts)
        case (_, w) => r.skip(w)
      }
    }
    MBuckets(offset.orElse(Some(0)), counts.result())
  }

  private def decodeExpDp(r: Reader): MExpDp = {
    var start, time, count, zeroCount: Option[String] = None
    var sum: Option[Double] = None
    var scale: Option[Int] = None
    var pos, neg: Option[MBuckets] = None
    var flags: Option[Int] = None
    val attrs = Seq.newBuilder[PKV]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) => attrs += decodeKv(r.sub())
        case (2, 1) => start = Some(u64s(r.readFixed64()))
        case (3, 1) => time = Some(u64s(r.readFixed64()))
        case (4, 1) => count = Some(u64s(r.readFixed64()))
        case (5, 1) => sum = Some(java.lang.Double.longBitsToDouble(r.readFixed64()))
        case (6, 0) => scale = Some(zigzag32(r.readVarint()))
        case (7, 1) => zeroCount = Some(u64s(r.readFixed64()))
        case (8, 2) => pos = Some(decodeBuckets(r.sub()))
        case (9, 2) => neg = Some(decodeBuckets(r.sub()))
        case (10, 0) =>
          val f = r.readVarint().toInt; flags = if (f != 0) Some(f) else None
        case (_, w) => r.skip(w)
      }
    }
    MExpDp(start, time, count, sum, scale.orElse(Some(0)), zeroCount,
      pos, neg, flags, attrs.result())
  }

  private def decodeSummDp(r: Reader): MSummDp = {
    var start, time, count: Option[String] = None
    var sum: Option[Double] = None
    var flags: Option[Int] = None
    val qs = Seq.newBuilder[MQuantile]
    val attrs = Seq.newBuilder[PKV]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (2, 1) => start = Some(u64s(r.readFixed64()))
        case (3, 1) => time = Some(u64s(r.readFixed64()))
        case (4, 1) => count = Some(u64s(r.readFixed64()))
        case (5, 1) => sum = Some(java.lang.Double.longBitsToDouble(r.readFixed64()))
        case (6, 2) =>
          val s = r.sub()
          var q, v: Option[Double] = None
          while (s.hasMore) {
            val t = s.readVarint().toInt
            (t >> 3, t & 7) match {
              case (1, 1) => q = Some(java.lang.Double.longBitsToDouble(s.readFixed64()))
              case (2, 1) => v = Some(java.lang.Double.longBitsToDouble(s.readFixed64()))
              case (_, w) => s.skip(w)
            }
          }
          qs += MQuantile(q.orElse(Some(0.0)), v.orElse(Some(0.0)))
        case (7, 2) => attrs += decodeKv(r.sub())
        case (8, 0) =>
          val f = r.readVarint().toInt; flags = if (f != 0) Some(f) else None
        case (_, w) => r.skip(w)
      }
    }
    MSummDp(start, time, count, sum, qs.result(), flags, attrs.result())
  }

  private def temporality(v: Long): Option[String] =
    if (v > 0 && v < TemporalityNames.length) Some(TemporalityNames(v.toInt)) else None

  private def decodeMetric(r: Reader): MMetric = {
    var name, desc, unit: Option[String] = None
    var gauge: Option[MGauge] = None
    var msum: Option[MSum] = None
    var hist: Option[MHistogram] = None
    var exp: Option[MExpHistogram] = None
    var summ: Option[MSummary] = None
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) => name = strOrNone(r.readString())
        case (2, 2) => desc = strOrNone(r.readString())
        case (3, 2) => unit = strOrNone(r.readString())
        case (5, 2) => // Gauge
          val s = r.sub()
          val dps = Seq.newBuilder[MNumDp]
          while (s.hasMore) {
            val t = s.readVarint().toInt
            if ((t >> 3, t & 7) == ((1, 2))) dps += decodeNumDp(s.sub()) else s.skip(t & 7)
          }
          gauge = Some(MGauge(dps.result()))
        case (7, 2) => // Sum
          val s = r.sub()
          val dps = Seq.newBuilder[MNumDp]
          var temp: Option[String] = None
          var mono: Option[Boolean] = None
          while (s.hasMore) {
            val t = s.readVarint().toInt
            (t >> 3, t & 7) match {
              case (1, 2) => dps += decodeNumDp(s.sub())
              case (2, 0) => temp = temporality(s.readVarint())
              case (3, 0) => mono = Some(s.readVarint() != 0L)
              case (_, w) => s.skip(w)
            }
          }
          msum = Some(MSum(dps.result(), mono, temp))
        case (9, 2) => // Histogram
          val s = r.sub()
          val dps = Seq.newBuilder[MHistDp]
          var temp: Option[String] = None
          while (s.hasMore) {
            val t = s.readVarint().toInt
            (t >> 3, t & 7) match {
              case (1, 2) => dps += decodeHistDp(s.sub())
              case (2, 0) => temp = temporality(s.readVarint())
              case (_, w) => s.skip(w)
            }
          }
          hist = Some(MHistogram(dps.result(), temp))
        case (10, 2) => // ExponentialHistogram
          val s = r.sub()
          val dps = Seq.newBuilder[MExpDp]
          var temp: Option[String] = None
          while (s.hasMore) {
            val t = s.readVarint().toInt
            (t >> 3, t & 7) match {
              case (1, 2) => dps += decodeExpDp(s.sub())
              case (2, 0) => temp = temporality(s.readVarint())
              case (_, w) => s.skip(w)
            }
          }
          exp = Some(MExpHistogram(dps.result(), temp))
        case (11, 2) => // Summary
          val s = r.sub()
          val dps = Seq.newBuilder[MSummDp]
          while (s.hasMore) {
            val t = s.readVarint().toInt
            if ((t >> 3, t & 7) == ((1, 2))) dps += decodeSummDp(s.sub()) else s.skip(t & 7)
          }
          summ = Some(MSummary(dps.result()))
        case (_, w) => r.skip(w)
      }
    }
    MMetric(name, desc, unit, gauge, msum, hist, exp, summ)
  }

  /** Decode an ExportMetricsServiceRequest. Null/empty → empty request;
    * corrupt/truncated → empty request (quarantine contract). */
  def decodeMetricsRequest(bytes: Array[Byte]): MMetricsRequest = {
    if (bytes == null || bytes.isEmpty) return MMetricsRequest(Nil)
    try decodeMetricsRequestStrict(bytes)
    catch { case scala.util.control.NonFatal(_) => MMetricsRequest(Nil) }
  }

  private def decodeMetricsRequestStrict(bytes: Array[Byte]): MMetricsRequest = {
    val r = new Reader(bytes, 0, bytes.length)
    val rms = Seq.newBuilder[MResourceMetrics]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val rr = r.sub()
          var resource: Option[PResource] = None
          val sms = Seq.newBuilder[MScopeMetrics]
          while (rr.hasMore) {
            val t = rr.readVarint().toInt
            (t >> 3, t & 7) match {
              case (1, 2) => // Resource
                val res = rr.sub()
                val attrs = Seq.newBuilder[PKV]
                while (res.hasMore) {
                  val tt = res.readVarint().toInt
                  if ((tt >> 3, tt & 7) == ((1, 2))) attrs += decodeKv(res.sub())
                  else res.skip(tt & 7)
                }
                resource = Some(PResource(attrs.result()))
              case (2, 2) => // ScopeMetrics
                val sm = rr.sub()
                var scope: Option[PScope] = None
                val ms = Seq.newBuilder[MMetric]
                while (sm.hasMore) {
                  val tt = sm.readVarint().toInt
                  (tt >> 3, tt & 7) match {
                    case (1, 2) =>
                      val sc = sm.sub()
                      var n, v: Option[String] = None
                      while (sc.hasMore) {
                        val t3 = sc.readVarint().toInt
                        (t3 >> 3, t3 & 7) match {
                          case (1, 2) => n = strOrNone(sc.readString())
                          case (2, 2) => v = strOrNone(sc.readString())
                          case (_, w) => sc.skip(w)
                        }
                      }
                      scope = Some(PScope(n, v))
                    case (2, 2) => ms += decodeMetric(sm.sub())
                    case (_, w) => sm.skip(w)
                  }
                }
                sms += MScopeMetrics(scope, ms.result())
              case (_, w) => rr.skip(w)
            }
          }
          rms += MResourceMetrics(resource, sms.result())
        case (_, w) => r.skip(w)
      }
    }
    MMetricsRequest(rms.result())
  }

  // -------------------------------------------------------------- encoder

  /** Append-only proto writer (varint / fixed64 / length-delimited). */
  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray
    def varint(v0: Long): Writer = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt); this
    }
    def tag(field: Int, wire: Int): Writer = varint((field.toLong << 3) | wire)
    def fixed64(field: Int, v: Long): Writer = {
      tag(field, 1)
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    def bytesField(field: Int, b: Array[Byte]): Writer = {
      tag(field, 2).varint(b.length.toLong); out.write(b, 0, b.length); this
    }
    /** Raw little-endian 8 bytes, no tag — packed-array element. */
    def fixed64Raw(v: Long): Writer = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    /** One raw byte (fixed32 assembly). */
    def rawByte(b: Int): Writer = { out.write(b & 0xff); this }
    def str(field: Int, s: String): Writer = bytesField(field, s.getBytes(UTF_8))
    def varintField(field: Int, v: Long): Writer = { tag(field, 0).varint(v); this }
    def msg(field: Int, w: Writer): Writer = bytesField(field, w.bytes)
  }

  private def hexToBytes(h: String): Array[Byte] =
    if (h == null || h.isEmpty) Array.emptyByteArray
    else h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def encodeAny(a: PAny): Writer = {
    val w = new Writer
    a.stringValue.foreach(w.str(1, _))
    a.boolValue.foreach(b => w.varintField(2, if (b) 1L else 0L))
    a.intValue.foreach(i => w.varintField(3, i.toLong))
    a.doubleValue.foreach(d => w.fixed64(4, java.lang.Double.doubleToLongBits(d)))
    w
  }

  private def encodeKv(kv: PKV): Writer =
    new Writer().str(1, kv.key).msg(2, encodeAny(kv.value))

  private def encodeSpan(s: PSpan): Writer = {
    val w = new Writer
    s.traceId.foreach(h => w.bytesField(1, hexToBytes(h)))
    s.spanId.foreach(h => w.bytesField(2, hexToBytes(h)))
    s.traceState.foreach(w.str(3, _))
    s.parentSpanId.filter(_.nonEmpty).foreach(h => w.bytesField(4, hexToBytes(h)))
    s.name.foreach(w.str(5, _))
    s.kind.foreach(k => w.varintField(6, KindNames.indexOf(k).toLong))
    s.startTimeUnixNano.foreach(n => w.fixed64(7, java.lang.Long.parseUnsignedLong(n)))
    s.endTimeUnixNano.foreach(n => w.fixed64(8, java.lang.Long.parseUnsignedLong(n)))
    s.attributes.foreach(kv => w.msg(9, encodeKv(kv)))
    s.status.foreach { st =>
      val sw = new Writer
      st.message.foreach(sw.str(2, _))
      st.code.foreach(c => sw.varintField(3, StatusNames.indexOf(c).toLong))
      w.msg(15, sw)
    }
    w
  }

  private def dbl(w: Writer, field: Int, v: Double): Unit =
    w.fixed64(field, java.lang.Double.doubleToLongBits(v))
  private def u64(w: Writer, field: Int, s: String): Unit =
    w.fixed64(field, java.lang.Long.parseUnsignedLong(s))
  private def zig(v: Int): Long = ((v.toLong << 1) ^ (v.toLong >> 63)) & 0xffffffffL

  private def encodeNumDp(dp: MNumDp): Writer = {
    val w = new Writer
    dp.startTimeUnixNano.foreach(u64(w, 2, _))
    dp.timeUnixNano.foreach(u64(w, 3, _))
    dp.asDouble.foreach(dbl(w, 4, _))
    dp.asInt.foreach(i => w.fixed64(6, i.toLong))
    dp.attributes.foreach(kv => w.msg(7, encodeKv(kv)))
    dp.flags.foreach(f => w.varintField(8, f.toLong))
    w
  }

  private def encodeHistDp(dp: MHistDp): Writer = {
    val w = new Writer
    dp.startTimeUnixNano.foreach(u64(w, 2, _))
    dp.timeUnixNano.foreach(u64(w, 3, _))
    dp.count.foreach(u64(w, 4, _))
    dp.sum.foreach(dbl(w, 5, _))
    if (dp.bucketCounts.nonEmpty) { // packed fixed64
      val p = new Writer
      dp.bucketCounts.foreach(c => p.fixed64Raw(java.lang.Long.parseUnsignedLong(c)))
      w.bytesField(6, p.bytes)
    }
    if (dp.explicitBounds.nonEmpty) { // packed double
      val p = new Writer
      dp.explicitBounds.foreach(b => p.fixed64Raw(java.lang.Double.doubleToLongBits(b)))
      w.bytesField(7, p.bytes)
    }
    dp.attributes.foreach(kv => w.msg(9, encodeKv(kv)))
    dp.flags.foreach(f => w.varintField(10, f.toLong))
    w
  }

  private def encodeBuckets(b: MBuckets): Writer = {
    val w = new Writer
    b.offset.filter(_ != 0).foreach(o => w.varintField(1, zig(o)))
    if (b.bucketCounts.nonEmpty) { // packed varint
      val p = new Writer
      b.bucketCounts.foreach(c => p.varint(java.lang.Long.parseUnsignedLong(c)))
      w.bytesField(2, p.bytes)
    }
    w
  }

  private def encodeExpDp(dp: MExpDp): Writer = {
    val w = new Writer
    dp.attributes.foreach(kv => w.msg(1, encodeKv(kv)))
    dp.startTimeUnixNano.foreach(u64(w, 2, _))
    dp.timeUnixNano.foreach(u64(w, 3, _))
    dp.count.foreach(u64(w, 4, _))
    dp.sum.foreach(dbl(w, 5, _))
    dp.scale.filter(_ != 0).foreach(s => w.varintField(6, zig(s)))
    dp.zeroCount.foreach(u64(w, 7, _))
    dp.positive.foreach(b => w.msg(8, encodeBuckets(b)))
    dp.negative.foreach(b => w.msg(9, encodeBuckets(b)))
    dp.flags.foreach(f => w.varintField(10, f.toLong))
    w
  }

  private def encodeSummDp(dp: MSummDp): Writer = {
    val w = new Writer
    dp.startTimeUnixNano.foreach(u64(w, 2, _))
    dp.timeUnixNano.foreach(u64(w, 3, _))
    dp.count.foreach(u64(w, 4, _))
    dp.sum.foreach(dbl(w, 5, _))
    dp.quantileValues.foreach { q =>
      val qw = new Writer
      q.quantile.foreach(dbl(qw, 1, _))
      q.value.foreach(dbl(qw, 2, _))
      w.msg(6, qw)
    }
    dp.attributes.foreach(kv => w.msg(7, encodeKv(kv)))
    dp.flags.foreach(f => w.varintField(8, f.toLong))
    w
  }

  private def encodeMetric(m: MMetric): Writer = {
    val w = new Writer
    m.name.foreach(w.str(1, _))
    m.description.foreach(w.str(2, _))
    m.unit.foreach(w.str(3, _))
    m.gauge.foreach { g =>
      val gw = new Writer
      g.dataPoints.foreach(dp => gw.msg(1, encodeNumDp(dp)))
      w.msg(5, gw)
    }
    m.sum.foreach { s =>
      val sw = new Writer
      s.dataPoints.foreach(dp => sw.msg(1, encodeNumDp(dp)))
      s.aggregationTemporality.foreach(t =>
        sw.varintField(2, TemporalityNames.indexOf(t).toLong))
      s.isMonotonic.foreach(b => sw.varintField(3, if (b) 1L else 0L))
      w.msg(7, sw)
    }
    m.histogram.foreach { h =>
      val hw = new Writer
      h.dataPoints.foreach(dp => hw.msg(1, encodeHistDp(dp)))
      h.aggregationTemporality.foreach(t =>
        hw.varintField(2, TemporalityNames.indexOf(t).toLong))
      w.msg(9, hw)
    }
    m.exponentialHistogram.foreach { h =>
      val hw = new Writer
      h.dataPoints.foreach(dp => hw.msg(1, encodeExpDp(dp)))
      h.aggregationTemporality.foreach(t =>
        hw.varintField(2, TemporalityNames.indexOf(t).toLong))
      w.msg(10, hw)
    }
    m.summary.foreach { s =>
      val sw = new Writer
      s.dataPoints.foreach(dp => sw.msg(1, encodeSummDp(dp)))
      w.msg(11, sw)
    }
    w
  }

  /** Encode a full ExportMetricsServiceRequest. */
  def encodeMetricsRequest(req: MMetricsRequest): Array[Byte] = {
    val w = new Writer
    req.resourceMetrics.foreach { rm =>
      val rw = new Writer
      rm.resource.foreach { res =>
        val resW = new Writer
        res.attributes.foreach(kv => resW.msg(1, encodeKv(kv)))
        rw.msg(1, resW)
      }
      rm.scopeMetrics.foreach { sm =>
        val smW = new Writer
        sm.scope.foreach { sc =>
          val scW = new Writer
          sc.name.foreach(scW.str(1, _))
          sc.version.foreach(scW.str(2, _))
          smW.msg(1, scW)
        }
        sm.metrics.foreach(m => smW.msg(2, encodeMetric(m)))
        rw.msg(2, smW)
      }
      w.msg(1, rw)
    }
    w.bytes
  }

  /** Encode a full ExportTraceServiceRequest. */
  def encodeTraceRequest(req: PTraceRequest): Array[Byte] = {
    val w = new Writer
    req.resourceSpans.foreach { rs =>
      val rw = new Writer
      rs.resource.foreach { res =>
        val resW = new Writer
        res.attributes.foreach(kv => resW.msg(1, encodeKv(kv)))
        rw.msg(1, resW)
      }
      rs.scopeSpans.foreach { ss =>
        val ssW = new Writer
        ss.scope.foreach { sc =>
          val scW = new Writer
          sc.name.foreach(scW.str(1, _))
          sc.version.foreach(scW.str(2, _))
          ssW.msg(1, scW)
        }
        ss.spans.foreach(sp => ssW.msg(2, encodeSpan(sp)))
        rw.msg(2, ssW)
      }
      w.msg(1, rw)
    }
    w.bytes
  }
}
