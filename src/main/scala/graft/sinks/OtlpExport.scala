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
      th: Thresholds = Thresholds()): DataFrame = {
    val spark = spanRows.sparkSession
    import spark.implicits._
    val encoded: Dataset[Array[Byte]] = spanRows.mapPartitions(
      _.map(OtlpExport.encodeRow))(
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
    }.toDF("payload", "n_spans", "payload_bytes")
  }
}
