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
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var r = 0L
      while (shift < 64) {
        val b = buf(pos); pos += 1
        r |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return r
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }

    def readFixed64(): Long = {
      var r = 0L
      var i = 0
      while (i < 8) { r |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
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
      case 1 => pos += 8
      case 2 =>
        // readLen() itself advances pos past the length varint; compute it
        // FIRST (`pos += readLen()` reads the pre-varint pos — off by the
        // varint's width)
        val n = readLen(); pos += n
      case 5 => pos += 4
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
    * message — same field number). Null/empty input → empty request. */
  def decodeTraceRequest(bytes: Array[Byte]): PTraceRequest = {
    if (bytes == null || bytes.isEmpty) return PTraceRequest(Nil)
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
