package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

import graft.sources.OtlpProto
import graft.sources.OtlpProto._

/** OTLP trace EXPORT — the encode direction of the otlp sink (reference
  * `otlp-sink/.../OtlpTraceHandler.java` + `buffer/OtlpSinkBuffer.java`):
  * each span event becomes ONE `ResourceSpans` (the reference's
  * `encodeEvent` → `convertToResourceSpans` shape — its own resource
  * carrying `service.name`, one scope, one span), batches respect the
  * reference ThresholdConfig's `max_events` / `max_batch_size` caps, and
  * each batch serializes to one `ExportTraceServiceRequest` — the gzip +
  * HTTP POST (`http/OtlpHttpSender.java`) is the documented egress seam.
  *
  * Wire trick that makes batching a pure byte concatenation:
  * `ExportTraceServiceRequest` is nothing but `repeated ResourceSpans
  * resource_spans = 1`, so the length-delimited field-1 record of a
  * single-entry request IS the record's contribution to any batch —
  * batches concatenate per-event encodings without re-encoding
  * (protobuf wire format: repeated message fields are independent
  * length-delimited records).
  *
  * Input = the engine's flattened span rows ([[graft.sources.OtelJson]]
  * `spans`/`spansFromProto` output). The flatten canonicalizes attribute
  * values to strings, so the export emits every attribute as
  * `stringValue` — `decode(export(rows)) == rows` exactly (the
  * OtlpExportSpec round trip and the q_otlp_export gate pin it against
  * q_otel_spans' own oracle); arbitrary-typed attribute round-tripping is
  * bounded by the flatten, not the export.
  *
  * Scale shape: the per-event encode is one projection (JVM-kernel UDF,
  * same seam as the proto decode); batching is a per-partition fold —
  * batches are transport units with no cross-partition ordering
  * requirement, so no shuffle at all.
  */
object OtlpExport {

  /** Reference otlp-sink ThresholdConfig: max_events default 512;
    * max_batch_size default ~1 MiB gzipped (we cap the UNcompressed
    * request bytes — the measurable analog; the reference sizes
    * serialized protos the same way via `getSerializedSize`). */
  final case class Thresholds(
      maxEvents: Int = 512,
      maxBatchBytes: Long = 4L * 1024 * 1024) {
    require(maxEvents >= 1, s"max_events >= 1, got $maxEvents")
    require(maxBatchBytes >= 1L, s"max_batch_size >= 1b, got $maxBatchBytes")
  }

  /** One length-delimited `ResourceSpans` field-1 record per span row —
    * the reference's `encodeEvent`. Exposed for tests; [[traceRequests]]
    * is the batched surface. */
  private[sinks] def encodeRow(r: Row): Array[Byte] = {
    def optS(name: String): Option[String] =
      if (r.schema.fieldNames.contains(name) && !r.isNullAt(r.fieldIndex(name)))
        Some(r.getString(r.fieldIndex(name)))
      else None
    def longS(name: String): Option[String] =
      if (r.schema.fieldNames.contains(name) && !r.isNullAt(r.fieldIndex(name)))
        Some(r.getLong(r.fieldIndex(name)).toString)
      else None
    val attrs: Seq[PKV] =
      if (!r.schema.fieldNames.contains("attributes") ||
          r.isNullAt(r.fieldIndex("attributes"))) Nil
      else r.getAs[Map[String, String]]("attributes").toSeq.sortBy(_._1)
        .map { case (k, v) => PKV(k, PAny(Option(v), None, None, None)) }
    val span = PSpan(
      traceId = optS("traceId"),
      spanId = optS("spanId"),
      parentSpanId = optS("parentSpanId"), // encoder drops ""
      traceState = optS("traceState"),
      name = optS("name"),
      kind = optS("kind"),
      startTimeUnixNano = longS("startTimeUnixNano"),
      endTimeUnixNano = longS("endTimeUnixNano"),
      attributes = attrs,
      status = optS("statusCode").map(c => PStatus(Some(c), None)))
    val rs = PResourceSpans(
      resource = optS("serviceName").map(svc => PResource(Seq(
        PKV("service.name", PAny(Some(svc), None, None, None))))),
      scopeSpans = Seq(PScopeSpans(
        optS("scopeName").map(n => PScope(Some(n), None)), Seq(span))))
    OtlpProto.encodeTraceRequest(PTraceRequest(Seq(rs)))
  }

  /** Batched export payloads: one row per `ExportTraceServiceRequest` —
    * `(payload binary, n_spans, payload_bytes)`. Greedy per-partition
    * packing in row order (flush BEFORE add on the byte cap, flush AFTER
    * add on the count cap — the buffer-worker contract); zero shuffles. */
  def traceRequests(spanRows: DataFrame,
      th: Thresholds = Thresholds()): DataFrame =
    batched(spanRows, OtlpExport.encodeRow, th, "n_spans")

  /** One length-delimited `ResourceLogs` field-1 record per flattened log
    * row ([[graft.sources.OtelLogs]] output shape) — the logs analog of
    * [[encodeRow]]. The flatten's merged attribute map splits back by
    * prefix: `log.attributes.*` → record attributes (`@` → `.` reversed),
    * `resource.attributes.*` → the resource (when absent, `serviceName`
    * alone becomes `service.name`), `instrumentationScope.name/version` →
    * the scope. Values ride as stringValue — identity is bounded by the
    * flatten, exactly like the trace export. */
  private[sinks] def encodeLogRow(r: Row): Array[Byte] = {
    def optS(name: String): Option[String] =
      if (r.schema.fieldNames.contains(name) && !r.isNullAt(r.fieldIndex(name)))
        Some(r.getString(r.fieldIndex(name)))
      else None
    def longS(name: String): Option[String] =
      if (r.schema.fieldNames.contains(name) && !r.isNullAt(r.fieldIndex(name)))
        Some(r.getLong(r.fieldIndex(name)).toString)
      else None
    def optI(name: String): Option[Int] =
      if (r.schema.fieldNames.contains(name) && !r.isNullAt(r.fieldIndex(name)))
        Some(r.getInt(r.fieldIndex(name)))
      else None
    val attrs: Map[String, String] =
      if (!r.schema.fieldNames.contains("attributes") ||
          r.isNullAt(r.fieldIndex("attributes"))) Map.empty
      else r.getAs[Map[String, String]]("attributes")
    def bucket(prefix: String): Seq[PKV] = attrs.toSeq
      .collect { case (k, v) if k.startsWith(prefix) =>
        PKV(k.stripPrefix(prefix).replace('@', '.'),
          PAny(Option(v), None, None, None)) }
      .sortBy(_.key)
    val resAttrs = bucket("resource.attributes.")
    val scope = (attrs.get("instrumentationScope.name"),
        attrs.get("instrumentationScope.version")) match {
      case (None, None) => None
      case (n, v) => Some(PScope(n, v))
    }
    val rec = LLogRecord(
      timeUnixNano = longS("timeUnixNano"),
      observedTimeUnixNano = longS("observedTimeUnixNano"),
      severityNumber = optI("severityNumber"),
      severityText = optS("severityText"),
      body = optS("body").map(b => PAny(Some(b), None, None, None)),
      attributes = bucket("log.attributes."),
      droppedAttributesCount = optI("droppedAttributesCount"),
      flags = optI("flags"),
      traceId = optS("traceId"),
      spanId = optS("spanId"))
    val rl = LResourceLogs(
      resource =
        if (resAttrs.nonEmpty) Some(PResource(resAttrs))
        else optS("serviceName").map(svc => PResource(Seq(
          PKV("service.name", PAny(Some(svc), None, None, None))))),
      scopeLogs = Seq(LScopeLogs(scope, Seq(rec))))
    OtlpProto.encodeLogsRequest(LLogsRequest(Seq(rl)))
  }

  /** Batched logs export: one row per `ExportLogsServiceRequest` —
    * `(payload binary, n_records, payload_bytes)`. Same field-1
    * concatenation trick and per-partition fold as [[traceRequests]]
    * (`ExportLogsServiceRequest` is `repeated ResourceLogs = 1`). */
  def logRequests(logRows: DataFrame,
      th: Thresholds = Thresholds()): DataFrame =
    batched(logRows, OtlpExport.encodeLogRow, th, "n_records")

  private def batched(rows: DataFrame, enc: Row => Array[Byte],
      th: Thresholds, countName: String): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val encoded: Dataset[Array[Byte]] = rows.mapPartitions(_.map(enc))(
      org.apache.spark.sql.Encoders.BINARY)
    val (me, mb) = (th.maxEvents, th.maxBatchBytes)
    encoded.mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Long, Long)]
      val buf = new java.io.ByteArrayOutputStream()
      var n = 0
      def flush(): Unit = if (n > 0) {
        val b = buf.toByteArray
        out += ((b, n.toLong, b.length.toLong))
        buf.reset(); n = 0
      }
      it.foreach { rec =>
        if (n > 0 && buf.size.toLong + rec.length > mb) flush()
        buf.write(rec); n += 1
        if (n >= me) flush()
      }
      flush()
      out.iterator
    }.toDF("payload", countName, "payload_bytes")
  }
}
