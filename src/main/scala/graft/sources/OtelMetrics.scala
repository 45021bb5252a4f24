package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OTLP/JSON metrics codec — the decode half of the reference's
  * `otel_metrics_source` + `otel_metrics_raw` processor
  * (OTelMetricsRawProcessor.java:76-101 driving
  * OTelProtoOpensearchCodec.parseExportMetricsServiceRequest): one output
  * row per datapoint, all five metric kinds.
  *
  * Reference semantics mirrored:
  *  - gauge/sum value = asDouble|asInt (getValueAsDouble); sum also
  *    carries isMonotonic + aggregationTemporality.
  *  - histogram: bucketCounts/explicitBounds kept raw, plus computed
  *    `buckets` [(min,max,count)] with min(first) = -Float.MAX_VALUE and
  *    max(last) = Float.MAX_VALUE (OTelMetricsProtoHelper.createBuckets,
  *    :169-199) when `calculateHistogramBuckets`.
  *  - exponential histogram: bounds[i] = scale>=0 ? 2^(i/2^scale)
  *    : 2^(2^i), bucket i covers bounds[offset+i]..bounds[offset+i+1]
  *    (calculateBoundaries/createExponentialBuckets, :219-251); both
  *    positive and negative bucket lists run through the same bounds, as
  *    the reference does; datapoints with |scale| > maxAllowedScale are
  *    dropped (OTelProtoOpensearchCodec.java:716).
  *  - summary: count/sum + quantile values.
  *  - attributes: datapoint keys prefixed `metric.attributes.`, resource
  *    keys `resource.attributes.`, dots in user keys replaced with `@`,
  *    plus instrumentationScope.name/version
  *    (OTelProtoOpensearchCodec.java:102-118).
  *
  * Shape: from_json + ordinal explodes + per-kind array mapping concat'd
  * and exploded ONCE — a narrow codegen-friendly projection chain with no
  * shuffle; at 100 TB this runs at scan speed.
  */
object OtelMetrics {

  private val Attrs =
    """ARRAY<STRUCT<key: STRING,
      |value: STRUCT<stringValue: STRING, intValue: STRING,
      |              doubleValue: DOUBLE, boolValue: BOOLEAN>>>""".stripMargin

  private val NumDp =
    s"""STRUCT<startTimeUnixNano: STRING, timeUnixNano: STRING,
       |asDouble: DOUBLE, asInt: STRING, flags: INT, attributes: $Attrs>""".stripMargin

  private val HistDp =
    s"""STRUCT<startTimeUnixNano: STRING, timeUnixNano: STRING,
       |count: STRING, sum: DOUBLE, bucketCounts: ARRAY<STRING>,
       |explicitBounds: ARRAY<DOUBLE>, flags: INT, attributes: $Attrs>""".stripMargin

  private val ExpDp =
    s"""STRUCT<startTimeUnixNano: STRING, timeUnixNano: STRING,
       |count: STRING, sum: DOUBLE, scale: INT, zeroCount: STRING,
       |positive: STRUCT<offset: INT, bucketCounts: ARRAY<STRING>>,
       |negative: STRUCT<offset: INT, bucketCounts: ARRAY<STRING>>,
       |flags: INT, attributes: $Attrs>""".stripMargin

  private val SummDp =
    s"""STRUCT<startTimeUnixNano: STRING, timeUnixNano: STRING,
       |count: STRING, sum: DOUBLE,
       |quantileValues: ARRAY<STRUCT<quantile: DOUBLE, value: DOUBLE>>,
       |flags: INT, attributes: $Attrs>""".stripMargin

  /** OTLP/JSON ExportMetricsServiceRequest schema (proto3 JSON mapping:
    * int64/uint64 arrive as strings; Spark's parser also accepts bare
    * numbers for STRING fields, covering lenient emitters). */
  val MetricsSchemaDdl: String =
    s"""resourceMetrics ARRAY<STRUCT<
       |  resource: STRUCT<attributes: $Attrs>,
       |  scopeMetrics: ARRAY<STRUCT<
       |    scope: STRUCT<name: STRING, version: STRING>,
       |    metrics: ARRAY<STRUCT<
       |      name: STRING, description: STRING, unit: STRING,
       |      gauge: STRUCT<dataPoints: ARRAY<$NumDp>>,
       |      sum: STRUCT<dataPoints: ARRAY<$NumDp>,
       |                  isMonotonic: BOOLEAN, aggregationTemporality: STRING>,
       |      histogram: STRUCT<dataPoints: ARRAY<$HistDp>,
       |                        aggregationTemporality: STRING>,
       |      exponentialHistogram: STRUCT<dataPoints: ARRAY<$ExpDp>,
       |                                   aggregationTemporality: STRING>,
       |      summary: STRUCT<dataPoints: ARRAY<$SummDp>>>>>>>>
       |""".stripMargin.replaceAll("\n", " ")

  private val FloatMax = java.lang.Float.MAX_VALUE.toDouble

  private def anyToString(v: Column): Column =
    coalesce(v("stringValue"), v("intValue"),
      v("doubleValue").cast("string"), v("boolValue").cast("string"))

  /** Rename an OTLP attribute list into the reference's flattened-key map
    * entries: `<prefix>.<key with '.' -> '@'>`. */
  private def prefixedEntries(attrs: Column, prefix: String): Column =
    transform(coalesce(attrs, array()), a => struct(
      concat(lit(prefix + "."), regexp_replace(a("key"), "\\.", "@")).as("key"),
      anyToString(a("value")).as("value")))

  private val emptyBuckets =
    array().cast("array<struct<min: double, max: double, count: bigint>>")
  private val emptyQuantiles =
    array().cast("array<struct<quantile: double, value: double>>")

  /** The common per-datapoint payload each kind maps into. */
  private def dpStruct(kind: String, dp: Column, value: Column,
      isMonotonic: Column, aggTemp: Column, count: Column, sum: Column,
      bucketCounts: Column, explicitBounds: Column, buckets: Column,
      quantiles: Column): Column = struct(
    lit(kind).as("kind"),
    dp("startTimeUnixNano").cast("long").as("startNanos"),
    dp("timeUnixNano").cast("long").as("timeNanos"),
    value.as("value"),
    isMonotonic.as("isMonotonic"),
    aggTemp.as("aggregationTemporality"),
    count.as("count"),
    sum.as("sum"),
    bucketCounts.as("bucketCounts"),
    explicitBounds.as("explicitBounds"),
    buckets.as("buckets"),
    quantiles.as("quantiles"),
    dp("flags").as("flags"),
    prefixedEntries(dp("attributes"), "metric.attributes").as("dpAttrs"))

  private def numValue(dp: Column): Column =
    coalesce(dp("asDouble"), dp("asInt").cast("double"))

  /** createBuckets: (-FloatMax, b0], (b0, b1], …, (bn, FloatMax). Emitted
    * only when counts = bounds + 1 (the proto invariant the reference
    * enforces by throwing; a malformed datapoint here degrades to no
    * computed buckets, keeping the raw lists). */
  private def explicitBucketStructs(counts: Column, bounds: Column): Column = {
    val n = size(counts)
    when(n > 0 && size(coalesce(bounds, array())) === n - 1,
      transform(counts, (c, i) => struct(
        when(i === 0, lit(-FloatMax))
          .otherwise(element_at(bounds, i)).as("min"),
        when(i === n - 1, lit(FloatMax))
          .otherwise(element_at(bounds, i + 1)).as("max"),
        c.cast("long").as("count"))))
      .otherwise(emptyBuckets)
  }

  /** calculateBoundaries(scale) as a column: index i in 0..2^|scale|. */
  private def expBound(scale: Column, i: Column): Column = {
    val len = pow(lit(2.0), abs(scale).cast("double")) // 2^|scale|, exact for |scale| <= 10
    when(scale >= 0, pow(lit(2.0), i.cast("double") / len))
      .otherwise(pow(lit(2.0), pow(lit(2.0), i.cast("double"))))
  }

  /** createExponentialBuckets over one signed bucket list. Out-of-range
    * offsets yield null bounds (element_at past the boundary array is the
    * reference's AIOOBE path — we degrade to null instead of failing).
    * `offset` is coalesced to 0: a spec-conformant JSON marshaller omits
    * proto3-default fields (→ null in from_json) while the binary-wire
    * decoder materializes 0 — both must bucket identically. */
  private def expBucketStructs(scale: Column, b: Column): Column = {
    val off = coalesce(b("offset"), lit(0))
    when(b.isNull || b("bucketCounts").isNull, emptyBuckets)
      .otherwise(transform(b("bucketCounts"), (c, i) => struct(
        expBound(scale, off + i).as("min"),
        expBound(scale, off + i + 1).as("max"),
        c.cast("long").as("count"))))
  }

  /** Flatten an OTLP/JSON metrics column into one row per datapoint.
    * Input columns other than `jsonCol` pass through. */
  def metrics(df: DataFrame, jsonCol: String,
      calculateHistogramBuckets: Boolean = true,
      calculateExponentialHistogramBuckets: Boolean = true,
      exponentialHistogramMaxAllowedScale: Int = 10): DataFrame =
    flattenMetrics(
      df.withColumn("_otlp",
        from_json(col(jsonCol), MetricsSchemaDdl, Map.empty[String, String])),
      df.columns.filter(_ != jsonCol).map(col).toSeq,
      calculateHistogramBuckets, calculateExponentialHistogramBuckets,
      exponentialHistogramMaxAllowedScale)

  /** Flatten an OTLP protobuf WIRE-FORM binary metrics column — same
    * output as [[metrics]] byte-for-byte on equivalent payloads (the
    * decode UDF materializes the `from_json` struct tree; [[OtlpProto]]).
    * JVM-kernel seam, like [[OtelJson.spansFromProto]]. */
  def metricsFromProto(df: DataFrame, binCol: String,
      calculateHistogramBuckets: Boolean = true,
      calculateExponentialHistogramBuckets: Boolean = true,
      exponentialHistogramMaxAllowedScale: Int = 10): DataFrame = {
    val decode = udf((b: Array[Byte]) => OtlpProto.decodeMetricsRequest(b))
    flattenMetrics(df.withColumn("_otlp", decode(col(binCol))),
      df.columns.filter(_ != binCol).map(col).toSeq,
      calculateHistogramBuckets, calculateExponentialHistogramBuckets,
      exponentialHistogramMaxAllowedScale)
  }

  /** Shared ResourceMetrics-tree → datapoint-rows projection. `_otlp` must
    * hold the [[MetricsSchemaDdl]] tree. */
  private def flattenMetrics(withTree: DataFrame, passthrough: Seq[Column],
      calculateHistogramBuckets: Boolean,
      calculateExponentialHistogramBuckets: Boolean,
      exponentialHistogramMaxAllowedScale: Int): DataFrame = {
    val m = col("_m")
    val parsed = withTree
      .select(passthrough :+ explode(col("_otlp.resourceMetrics")).as("_rm"): _*)
      .withColumn("_resAttrs", col("_rm.resource.attributes"))
      .withColumn("serviceName",
        element_at(filter(coalesce(col("_resAttrs"),
          array().cast(Attrs.replaceAll("\\s+", " "))),
          a => a("key") === "service.name"), 1)("value")("stringValue"))
      .select(passthrough ++ Seq(col("_resAttrs"), col("serviceName"),
        explode(col("_rm.scopeMetrics")).as("_sm")): _*)
      .select(passthrough ++ Seq(col("_resAttrs"), col("serviceName"),
        col("_sm.scope.name").as("scopeName"),
        col("_sm.scope.version").as("scopeVersion"),
        explode(col("_sm.metrics")).as("_m")): _*)

    val noB = lit(null).cast("boolean")
    val noS = lit(null).cast("string")
    val noD = lit(null).cast("double")
    val noL = lit(null).cast("long")
    val noCounts = lit(null).cast("array<long>")
    val noBounds = lit(null).cast("array<double>")

    val gauges = when(m("gauge").isNull, array()).otherwise(
      transform(m("gauge")("dataPoints"), dp =>
        dpStruct("gauge", dp, numValue(dp), noB, noS, noL, noD,
          noCounts, noBounds, emptyBuckets, emptyQuantiles)))

    val sums = when(m("sum").isNull, array()).otherwise(
      transform(m("sum")("dataPoints"), dp =>
        dpStruct("sum", dp, numValue(dp), m("sum")("isMonotonic"),
          m("sum")("aggregationTemporality"), noL, noD,
          noCounts, noBounds, emptyBuckets, emptyQuantiles)))

    val hists = when(m("histogram").isNull, array()).otherwise(
      transform(m("histogram")("dataPoints"), dp =>
        dpStruct("histogram", dp, noD, noB,
          m("histogram")("aggregationTemporality"),
          dp("count").cast("long"), dp("sum"),
          transform(coalesce(dp("bucketCounts"), array()), _.cast("long")),
          coalesce(dp("explicitBounds"), array()).cast("array<double>"),
          if (calculateHistogramBuckets)
            explicitBucketStructs(dp("bucketCounts"), dp("explicitBounds"))
          else emptyBuckets,
          emptyQuantiles)))

    // scale / quantile / value are proto3-default fields: a conformant
    // JSON marshaller omits them (null here) while the binary decoder
    // materializes 0 — coalesce so both wire forms score identically.
    val dpScale = (dp: Column) => coalesce(dp("scale"), lit(0))
    val expHists = when(m("exponentialHistogram").isNull, array()).otherwise(
      transform(filter(m("exponentialHistogram")("dataPoints"),
        dp => abs(dpScale(dp)) <= exponentialHistogramMaxAllowedScale), dp =>
        dpStruct("exponential_histogram", dp, noD, noB,
          m("exponentialHistogram")("aggregationTemporality"),
          dp("count").cast("long"), dp("sum"),
          noCounts, noBounds,
          if (calculateExponentialHistogramBuckets)
            concat(expBucketStructs(dpScale(dp), dp("positive")),
              expBucketStructs(dpScale(dp), dp("negative")))
          else emptyBuckets,
          emptyQuantiles)))

    val summaries = when(m("summary").isNull, array()).otherwise(
      transform(m("summary")("dataPoints"), dp =>
        dpStruct("summary", dp, noD, noB, noS,
          dp("count").cast("long"), dp("sum"),
          noCounts, noBounds, emptyBuckets,
          transform(coalesce(dp("quantileValues"), emptyQuantiles), q =>
            struct(coalesce(q("quantile"), lit(0.0)).as("quantile"),
              coalesce(q("value"), lit(0.0)).as("value"))))))

    val dp = col("_dp")
    parsed
      .withColumn("_dps", concat(gauges, sums, hists, expHists, summaries))
      .withColumn("metricName", m("name"))
      .withColumn("description", m("description"))
      .withColumn("unit", m("unit"))
      .select(passthrough ++ Seq(col("_resAttrs"), col("serviceName"),
        col("scopeName"), col("scopeVersion"), col("metricName"),
        col("description"), col("unit"), explode(col("_dps")).as("_dp")): _*)
      .select(passthrough ++ Seq(
        dp("kind").as("kind"),
        col("metricName").as("name"),
        col("description"),
        col("unit"),
        col("serviceName"),
        col("scopeName"),
        dp("startNanos").as("startTimeUnixNano"),
        dp("timeNanos").as("timeUnixNano"),
        OtelJson.isoFromNanosUdf(dp("startNanos")).as("startTime"),
        OtelJson.isoFromNanosUdf(dp("timeNanos")).as("time"),
        dp("value").as("value"),
        dp("isMonotonic").as("isMonotonic"),
        dp("aggregationTemporality").as("aggregationTemporality"),
        dp("count").as("count"),
        dp("sum").as("sum"),
        dp("bucketCounts").as("bucketCounts"),
        dp("explicitBounds").as("explicitBounds"),
        dp("buckets").as("buckets"),
        dp("quantiles").as("quantiles"),
        dp("flags").as("flags"),
        map_from_entries(concat(
          dp("dpAttrs"),
          prefixedEntries(col("_resAttrs"), "resource.attributes"),
          filter(array(
            struct(lit("instrumentationScope.name").as("key"),
              col("scopeName").as("value")),
            struct(lit("instrumentationScope.version").as("key"),
              col("scopeVersion").as("value"))),
            e => e("value").isNotNull))).as("attributes")): _*)
  }
}
