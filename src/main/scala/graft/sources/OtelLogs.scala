package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OTLP logs codec — the decode half of the reference's `otel_logs_source`
  * (otel-logs-source module; record mapping
  * OTelProtoOpensearchCodec.java:300-327 processLogsList → JacksonOtelLog).
  *
  * Reference semantics mirrored: time/observedTime ISO-8601 from unix
  * nanos (byte-identical convertUnixNanosToISO8601), serviceName from the
  * resource's `service.name`, severityNumber as the NUMERIC enum value
  * (getSeverityNumberValue), severityText, body via convertAnyValue,
  * traceId/spanId lowercase hex, flags, droppedAttributesCount, and ONE
  * merged attribute map: log attributes under `log.attributes.` +
  * resource attributes under `resource.attributes.` (dots in user keys →
  * `@`, OTelProtoOpensearchCodec.java:101,116-118) + the instrumentation
  * scope as `instrumentationScope.name`/`instrumentationScope.version`.
  *
  * Both wire forms: JSON via `from_json`, binary protobuf via the
  * [[OtlpProto]] own kernel — byte-identical outputs (OtlpProtoSpec).
  * Shape: from_json/UDF + two ordinal explodes, no shuffle — scan speed.
  */
object OtelLogs {

  private val Attrs =
    """ARRAY<STRUCT<key: STRING,
      |value: STRUCT<stringValue: STRING, intValue: STRING,
      |              doubleValue: DOUBLE, boolValue: BOOLEAN>>>""".stripMargin

  /** OTLP/JSON ExportLogsServiceRequest schema (proto3 JSON mapping:
    * int64/uint64 as strings, ids lowercase hex, defaults omitted). */
  val LogsSchemaDdl: String =
    s"""resourceLogs ARRAY<STRUCT<
       |  resource: STRUCT<attributes: $Attrs>,
       |  scopeLogs: ARRAY<STRUCT<
       |    scope: STRUCT<name: STRING, version: STRING>,
       |    logRecords: ARRAY<STRUCT<
       |      timeUnixNano: STRING, observedTimeUnixNano: STRING,
       |      severityNumber: INT, severityText: STRING,
       |      body: STRUCT<stringValue: STRING, intValue: STRING,
       |                   doubleValue: DOUBLE, boolValue: BOOLEAN>,
       |      attributes: $Attrs,
       |      droppedAttributesCount: INT, flags: INT,
       |      traceId: STRING, spanId: STRING>>>>>>
       |""".stripMargin.replaceAll("\n", " ")

  private def anyToString(v: Column): Column =
    coalesce(v("stringValue"), v("intValue"),
      v("doubleValue").cast("string"), v("boolValue").cast("string"))

  /** `<prefix>.<key with '.' → '@'>` map entries (the reference's
    * PREFIX_AND_*_ATTRIBUTES_REPLACE_DOT_WITH_AT convention). */
  private def prefixedEntries(attrs: Column, prefix: String): Column =
    transform(coalesce(attrs, array().cast(Attrs.replaceAll("\\s+", " "))),
      a => struct(
        concat(lit(prefix + "."), regexp_replace(a("key"), "\\.", "@")).as("key"),
        anyToString(a("value")).as("value")))

  /** Flatten an OTLP/JSON logs column into one row per log record. */
  def logs(df: DataFrame, jsonCol: String): DataFrame =
    flattenLogs(
      df.withColumn("_otlp",
        from_json(col(jsonCol), LogsSchemaDdl, Map.empty[String, String])),
      df.columns.filter(_ != jsonCol).map(col).toSeq)

  /** Flatten a BINARY protobuf wire-form logs column — same output as
    * [[logs]] byte-for-byte on equivalent payloads ([[OtlpProto]]). */
  def logsFromProto(df: DataFrame, binCol: String): DataFrame = {
    val decode = udf((b: Array[Byte]) => OtlpProto.decodeLogsRequest(b))
    flattenLogs(df.withColumn("_otlp", decode(col(binCol))),
      df.columns.filter(_ != binCol).map(col).toSeq)
  }

  private def flattenLogs(withTree: DataFrame,
      passthrough: Seq[Column]): DataFrame = {
    val rec = col("_lr")
    val parsed = withTree
      .select(passthrough :+ explode(col("_otlp.resourceLogs")).as("_rl"): _*)
      .withColumn("_resAttrs", col("_rl.resource.attributes"))
      .withColumn("serviceName",
        element_at(filter(coalesce(col("_resAttrs"),
          array().cast(Attrs.replaceAll("\\s+", " "))),
          a => a("key") === "service.name"), 1)("value")("stringValue"))
      .select(passthrough ++ Seq(col("_resAttrs"), col("serviceName"),
        explode(col("_rl.scopeLogs")).as("_sl")): _*)
      .select(passthrough ++ Seq(col("_resAttrs"), col("serviceName"),
        col("_sl.scope.name").as("_scopeName"),
        col("_sl.scope.version").as("_scopeVersion"),
        explode(col("_sl.logRecords")).as("_lr")): _*)
    val scopeEntries = filter(array(
      struct(lit("instrumentationScope.name").as("key"), col("_scopeName").as("value")),
      struct(lit("instrumentationScope.version").as("key"), col("_scopeVersion").as("value"))),
      e => e("value").isNotNull)
    parsed.select(passthrough ++ Seq(
      rec("timeUnixNano").cast("long").as("timeUnixNano"),
      OtelJson.isoFromNanosUdf(rec("timeUnixNano").cast("long")).as("time"),
      rec("observedTimeUnixNano").cast("long").as("observedTimeUnixNano"),
      OtelJson.isoFromNanosUdf(rec("observedTimeUnixNano").cast("long")).as("observedTime"),
      col("serviceName"),
      rec("severityNumber").as("severityNumber"),
      rec("severityText").as("severityText"),
      anyToString(rec("body")).as("body"),
      rec("traceId").as("traceId"),
      rec("spanId").as("spanId"),
      rec("flags").as("flags"),
      rec("droppedAttributesCount").as("droppedAttributesCount"),
      map_from_entries(concat(
        prefixedEntries(rec("attributes"), "log.attributes"),
        prefixedEntries(col("_resAttrs"), "resource.attributes"),
        scopeEntries)).as("attributes")): _*)
  }
}
