package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OTLP/JSON trace codec — the decode half of the reference's
  * `otel_trace_source` for its JSON wire form (the gRPC/protobuf server
  * itself stays out of scope; this is the ResourceSpans → span-event
  * flattening of OTelProtoOpensearchCodec.java:332-359).
  *
  * Field mapping mirrors the reference span event:
  * traceId/spanId/parentSpanId (hex strings, per the OTLP JSON encoding),
  * name, kind, traceState, serviceName (resource attribute
  * `service.name`), startTime/endTime (ISO-8601 via
  * `Instant.ofEpochSecond(0, nanos).toString` — byte-identical to
  * OTelProtoCommonUtils.convertUnixNanosToISO8601),
  * durationInNanos = end - start, traceGroup = name when the span is a
  * root (empty parentSpanId; OTelProtoOpensearchCodec.getTraceGroup), and
  * span attributes collapsed to a string map.
  *
  * Shape: from_json + three ordinal explodes — a narrow, codegen'd
  * projection chain with no shuffle; at 100 TB this runs at scan speed.
  */
object OtelJson {

  /** OTLP/JSON ResourceSpans payload schema (proto3 JSON mapping:
    * int64 arrives as a string, ids as lowercase hex). */
  val SpanSchemaDdl: String =
    """resourceSpans ARRAY<STRUCT<
      |  resource: STRUCT<attributes: ARRAY<STRUCT<
      |    key: STRING,
      |    value: STRUCT<stringValue: STRING, intValue: STRING,
      |                  doubleValue: DOUBLE, boolValue: BOOLEAN>>>>,
      |  scopeSpans: ARRAY<STRUCT<
      |    scope: STRUCT<name: STRING, version: STRING>,
      |    spans: ARRAY<STRUCT<
      |      traceId: STRING, spanId: STRING, parentSpanId: STRING,
      |      traceState: STRING, name: STRING, kind: STRING,
      |      startTimeUnixNano: STRING, endTimeUnixNano: STRING,
      |      attributes: ARRAY<STRUCT<
      |        key: STRING,
      |        value: STRUCT<stringValue: STRING, intValue: STRING,
      |                      doubleValue: DOUBLE, boolValue: BOOLEAN>>>,
      |      status: STRUCT<code: STRING, message: STRING>>>>>>>
      |""".stripMargin.replaceAll("\n", " ")

  /** OTLP AnyValue → string (the reference's convertAnyValue flattens to
    * the JSON scalar; we render non-strings with Spark's cast). */
  private def anyToString(v: Column): Column =
    coalesce(v("stringValue"), v("intValue"),
      v("doubleValue").cast("string"), v("boolValue").cast("string"))

  /** Unix nanos → ISO-8601, byte-identical to the reference's
    * convertUnixNanosToISO8601 (`Instant.ofEpochSecond(0, nanos)
    * .toString`). Shared with [[OtelMetrics]]. */
  private[sources] val isoFromNanosUdf = udf { (nanos: java.lang.Long) =>
    if (nanos == null) null
    else java.time.Instant.ofEpochSecond(0L, nanos).toString
  }
  private def isoFromNanos(c: Column): Column = isoFromNanosUdf(c)

  /** Flatten an OTLP/JSON column into one row per span. Input columns
    * other than `jsonCol` pass through. */
  def spans(df: DataFrame, jsonCol: String): DataFrame =
    flattenSpans(
      df.withColumn("_otlp",
        from_json(col(jsonCol), SpanSchemaDdl, Map.empty[String, String])),
      df.columns.filter(_ != jsonCol).map(col).toSeq)

  /** Flatten an OTLP protobuf WIRE-FORM binary column into one row per
    * span — same output as [[spans]] byte-for-byte on equivalent payloads
    * (the decode UDF materializes the `from_json` struct tree; see
    * [[OtlpProto]]). The UDF is a JVM-kernel seam: a byte-cursor parser has
    * no Column-algebra form, and per row it is one allocation-light pass. */
  def spansFromProto(df: DataFrame, binCol: String): DataFrame = {
    val decode = udf((b: Array[Byte]) => OtlpProto.decodeTraceRequest(b))
    flattenSpans(df.withColumn("_otlp", decode(col(binCol))),
      df.columns.filter(_ != binCol).map(col).toSeq)
  }

  /** Shared ResourceSpans-tree → span-rows projection chain (three ordinal
    * explodes, no shuffle). `_otlp` must hold the [[SpanSchemaDdl]] tree. */
  private def flattenSpans(withTree: DataFrame,
      passthrough: Seq[Column]): DataFrame = {
    val parsed = withTree
      .select(passthrough :+ explode(col("_otlp.resourceSpans")).as("_rs"): _*)
      .withColumn("serviceName",
        element_at(filter(col("_rs.resource.attributes"),
          a => a("key") === "service.name"), 1)("value")("stringValue"))
      .select(passthrough ++ Seq(col("serviceName"),
        explode(col("_rs.scopeSpans")).as("_ss")): _*)
      .select(passthrough ++ Seq(col("serviceName"), col("_ss.scope.name").as("scopeName"),
        explode(col("_ss.spans")).as("_sp")): _*)
    val sp = col("_sp")
    val startN = sp("startTimeUnixNano").cast("long")
    val endN = sp("endTimeUnixNano").cast("long")
    val isRoot = sp("parentSpanId").isNull || sp("parentSpanId") === ""
    parsed.select(passthrough ++ Seq(
      sp("traceId").as("traceId"),
      sp("spanId").as("spanId"),
      coalesce(sp("parentSpanId"), lit("")).as("parentSpanId"),
      sp("traceState").as("traceState"),
      sp("name").as("name"),
      sp("kind").as("kind"),
      col("serviceName"),
      col("scopeName"),
      startN.as("startTimeUnixNano"),
      endN.as("endTimeUnixNano"),
      isoFromNanos(startN).as("startTime"),
      isoFromNanos(endN).as("endTime"),
      (endN - startN).as("durationInNanos"),
      when(isRoot, sp("name")).otherwise(lit(null)).as("traceGroup"),
      map_from_entries(transform(sp("attributes"),
        a => struct(a("key").as("key"), anyToString(a("value")).as("value"))))
        .as("attributes"),
      sp("status")("code").as("statusCode")): _*)
  }
}
