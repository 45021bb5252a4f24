package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.OtlpProto

/** Prometheus remote-write emitter — the conversion + wire half of the
  * reference's `prometheus-sink` (PrometheusTimeSeries.java:94-381,
  * PrometheusSinkService.java). Each decoded OTLP metric datapoint row
  * (the [[graft.sources.OtelMetrics]] output shape) fans out into
  * remote-write `TimeSeries`:
  *
  *  - gauge / sum → one series named by `sanitizeMetricName` (unit
  *    expanded via the OTel→Prometheus unit table, `_total` appended to
  *    monotonic cumulative sums, `_ratio` to unit-"1" gauges,
  *    `{…}`-annotated units dropped, `a/b` units expanded pairwise);
  *  - summary → `<name>_count`, `<name>_sum`, one series per quantile
  *    with a `quantile` label;
  *  - histogram → `<name>_count`, `<name>_sum`, one `<name>_bucket`
  *    series per bucket with `le` = upper bound (`+Inf` last);
  *  - exponential histogram → `_count`, `_sum`, one `_bucket` per decoded
  *    bucket with `le` = the bucket's computed upper bound (the decode
  *    already materialized 2^((offset+i)·2^-scale); zero_count /
  *    zero_threshold raw fields are not retained by the decode and are
  *    documented out).
  *
  * Labels are the datapoint attributes (reference processAttributes:
  * nested keys flattened with `_`), resource attributes under a
  * `resource_` prefix, all names through `sanitizeLabelName`, plus
  * `__name__` and the per-series `quantile`/`le` label, sorted by name —
  * the reference sorts before building the proto (PrometheusTimeSeries
  * .java:199). The output canonical form is one sorted `k=v` comma-join
  * per series so a SQL oracle can replay it byte-for-byte.
  *
  * The wire half encodes batches into remote-write `WriteRequest`
  * protobuf (prometheus/prompb/types.proto: TimeSeries{Label{name=1,
  * value=2}=1, Sample{value=1,timestamp=2}=2}=1) with the shared
  * own-kernel proto writer and snappy block compression (xerial snappy,
  * already on Spark's classpath) — exactly what a remote-write endpoint
  * accepts. Batches are greedy-packed per partition under a byte
  * threshold like the reference's buffered sender, so no driver funnel:
  * at 100 TB each executor emits its own bounded requests.
  *
  * Scale shape: the fan-out is pure Column algebra (one projection +
  * one explode, zero shuffles, whole-stage codegen); encoding is one
  * mapPartitions pass.
  */
object PromRemoteWrite {

  /** OTel unit → Prometheus unit suffix (PrometheusTimeSeries.java:60-85). */
  val UnitMap: Map[String, String] = Map(
    "d" -> "days", "h" -> "hours", "min" -> "minutes", "s" -> "seconds",
    "ms" -> "milliseconds", "us" -> "microseconds", "ns" -> "nanoseconds",
    "By" -> "bytes", "KiBy" -> "kibibytes", "MiBy" -> "mebibytes",
    "GiBy" -> "gibibytes", "TiBy" -> "tibibytes", "KBy" -> "kilobytes",
    "MBy" -> "megabytes", "GBy" -> "gigabytes", "TBy" -> "terabytes",
    "V" -> "volts", "A" -> "amperes", "J" -> "joules", "W" -> "watts",
    "g" -> "grams", "Cel" -> "celsius", "Hz" -> "hertz", "%" -> "percent",
    "m" -> "meters")

  // ------------------------------------------------------------ sanitize

  /** sanitizeName(name, allowColon=true, isLabel=false): invalid chars →
    * `_` (first char must be a letter or colon), runs of `_` collapsed,
    * edges stripped. `\p{L}\p{Nd}` mirrors Character.isLetterOrDigit. */
  private def sanitizeMetricBase(name: Column): Column = {
    val first = substring(name, 1, 1)
    val firstS = when(first.rlike("^[\\p{L}:]$"), first)
      .when(length(name) === 0, lit(""))
      .otherwise(lit("_"))
    val restS = regexp_replace(substring(name, 2, Int.MaxValue),
      "[^\\p{L}\\p{Nd}:]", "_")
    val collapsed = regexp_replace(concat(firstS, restS), "_{2,}", "_")
    regexp_replace(collapsed, "^_+|_+$", "")
  }

  /** sanitizeLabelName: no colon, runs kept, edges kept. */
  private def sanitizeLabel(name: Column): Column = {
    val first = substring(name, 1, 1)
    val firstS = when(first.rlike("^\\p{L}$"), first)
      .when(length(name) === 0, lit(""))
      .otherwise(lit("_"))
    concat(firstS,
      regexp_replace(substring(name, 2, Int.MaxValue), "[^\\p{L}\\p{Nd}]", "_"))
  }

  /** sanitizeMetricName (PrometheusTimeSeries.java:299-343): base name +
    * unit expansion + `_total` for monotonic cumulative sums / `_ratio`
    * for unit-"1" gauges. */
  private[sinks] def seriesName(name: Column, unit: Column, kind: Column,
      isMonotonic: Column, aggTemp: Column): Column = {
    val unitMapCol = typedLit(UnitMap)
    val base = sanitizeMetricBase(name)
    val isGauge = kind === "gauge"
    val isCounter = kind === "sum" && coalesce(isMonotonic, lit(false)) &&
      aggTemp === "AGGREGATION_TEMPORALITY_CUMULATIVE"
    val suffix = when(isCounter, lit("_total")).otherwise(lit(""))
    val mapped = element_at(unitMapCol, unit)
    val parts = split(unit, "/", 2)
    val m1 = element_at(unitMapCol, element_at(parts, 1))
    val m2 = element_at(unitMapCol, when(size(parts) === 2, element_at(parts, 2)))
    when(unit.isNull, concat(base, suffix))
      .when(unit.startsWith("{"), concat(base, suffix))
      .when(unit === "1" && isGauge, concat(base, lit("_ratio")))
      .when(mapped.isNotNull, concat(base, lit("_"), mapped, suffix))
      .when(m1.isNotNull && m2.isNotNull,
        concat(base, lit("_"), m1, lit("_"), m2, suffix))
      .when(unit =!= "1", concat(base, lit("_"), unit, suffix))
      .otherwise(concat(base, suffix))
  }

  // ------------------------------------------------------------- fan-out

  private val SeriesT =
    "array<struct<n: string, l2n: string, l2v: string, v: double>>"
  private def ser(n: Column, l2n: Column, l2v: Column, v: Column): Column =
    struct(n.as("n"), l2n.as("l2n"), l2v.as("l2v"), v.as("v"))
  private val noS = lit(null).cast("string")

  /** Decoded OTLP metric datapoint rows → one row per remote-write
    * TimeSeries: (metric_name, labels = sorted `k=v` comma-join, ts_ms,
    * value). Input is the [[graft.sources.OtelMetrics]] row shape. */
  def timeSeries(df: DataFrame): DataFrame = {
    val mName = seriesName(col("name"), col("unit"), col("kind"),
      col("isMonotonic"), col("aggregationTemporality"))

    // base labels from the decoded attribute map: dp attrs bare, resource
    // attrs under resource_, scope name/version are not scope *attributes*
    // in the reference and are excluded
    val ents = filter(map_entries(col("attributes")),
      e => !e("key").startsWith("instrumentationScope."))
    val kvT = "array<struct<k: string, v: string>>"
    val baseLabels = transform(ents, e => struct(
      sanitizeLabel(
        when(e("key").startsWith("resource.attributes."),
          concat(lit("resource_"),
            regexp_replace(e("key"), "^resource\\.attributes\\.", "")))
          .otherwise(regexp_replace(e("key"), "^metric\\.attributes\\.", "")))
        .as("k"),
      e("value").as("v"))).cast(kvT)

    val cnt = ser(concat(mName, lit("_count")), noS, noS,
      col("count").cast("double"))
    val sm = ser(concat(mName, lit("_sum")), noS, noS, col("sum"))

    val gaugeArr = array(ser(mName, noS, noS, col("value")))
    val sumArr = array(ser(mName, noS, noS, col("value")))
    val summArr = concat(array(cnt, sm),
      transform(col("quantiles"), q => ser(mName, lit("quantile"),
        q("quantile").cast("string"), q("value"))))
    val nB = size(col("bucketCounts"))
    val histBuckets = when(
      col("bucketCounts").isNotNull && col("explicitBounds").isNotNull &&
        nB === size(col("explicitBounds")) + 1,
      transform(col("bucketCounts"), (c, i) => ser(
        concat(mName, lit("_bucket")), lit("le"),
        when(i === nB - 1, lit("+Inf"))
          .otherwise(element_at(col("explicitBounds"), i + 1).cast("string")),
        c.cast("double")))).otherwise(array().cast(SeriesT))
    val histArr = concat(array(cnt, sm), histBuckets)
    val expArr = concat(array(cnt, sm),
      transform(col("buckets"), b => ser(
        concat(mName, lit("_bucket")), lit("le"),
        b("max").cast("string"), b("count").cast("double"))))

    val series = when(col("kind") === "gauge", gaugeArr)
      .when(col("kind") === "sum", sumArr)
      .when(col("kind") === "summary", summArr)
      .when(col("kind") === "histogram", histArr)
      .when(col("kind") === "exponential_histogram", expArr)
      .otherwise(array().cast(SeriesT))

    val tsMs = call_function("div",
      coalesce(col("timeUnixNano"), col("startTimeUnixNano")),
      lit(1000000L))

    df.select(baseLabels.as("_base"), tsMs.as("ts_ms"),
        explode(series).as("_s"))
      .select(
        col("_s")("n").as("metric_name"),
        array_join(array_sort(transform(
          concat(col("_base"),
            array(struct(lit("__name__").as("k"), col("_s")("n").as("v")))
              .cast("array<struct<k: string, v: string>>"),
            when(col("_s")("l2n").isNotNull,
              array(struct(col("_s")("l2n").as("k"), col("_s")("l2v").as("v"))))
              .otherwise(array())
              .cast("array<struct<k: string, v: string>>")),
          l => concat(l("k"), lit("="), l("v")))), ",").as("labels"),
        col("ts_ms"),
        col("_s")("v").as("value"))
  }

  // ------------------------------------------------------------ the wire

  /** One remote-write TimeSeries with a single sample, labels sorted. */
  final case class PromSeries(labels: Seq[(String, String)], tsMs: Long,
      value: Double)

  /** prompb WriteRequest{ repeated TimeSeries=1 } — uncompressed. */
  def encodeWriteRequest(series: Seq[PromSeries]): Array[Byte] = {
    val w = new OtlpProto.Writer
    series.foreach(s => w.msg(1, encodeSeries(s)))
    w.bytes
  }

  private def encodeSeries(s: PromSeries): OtlpProto.Writer = {
    val tw = new OtlpProto.Writer
    s.labels.foreach { case (n, v) =>
      tw.msg(1, new OtlpProto.Writer().str(1, n).str(2, v))
    }
    tw.msg(2, new OtlpProto.Writer()
      .fixed64(1, java.lang.Double.doubleToLongBits(s.value))
      .varintField(2, s.tsMs))
    tw
  }

  /** Wire decode for the differential gate (and for reading back what a
    * remote-write endpoint would have received). */
  def decodeWriteRequest(bytes: Array[Byte]): Seq[PromSeries] = {
    var pos = 0
    def varint(end: Int): Long = {
      var v = 0L; var sh = 0
      var b = 0xff
      while ((b & 0x80) != 0 && pos < end) {
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << sh; sh += 7
      }
      v
    }
    // NB: sub-message ends must be computed as len-then-pos — `pos +
    // varint(...)` would read pos BEFORE varint consumes the length byte.
    def lenEnd(end: Int): Int = { val l = varint(end).toInt; pos + l }
    val out = Seq.newBuilder[PromSeries]
    val end0 = bytes.length
    while (pos < end0) {
      val tag = varint(end0)
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        val tEnd = lenEnd(end0)
        var labels = Vector.empty[(String, String)]
        var ts = 0L; var value = 0.0
        while (pos < tEnd) {
          val t2 = varint(tEnd)
          (t2 >> 3, t2 & 7) match {
            case (1, 2) => // Label
              val lEnd = lenEnd(tEnd)
              var n = ""; var v = ""
              while (pos < lEnd) {
                val t3 = varint(lEnd)
                val sl = varint(lEnd).toInt
                val s = new String(bytes, pos, sl, "UTF-8"); pos += sl
                if ((t3 >> 3) == 1) n = s else v = s
              }
              labels :+= ((n, v))
            case (2, 2) => // Sample
              val sEnd = lenEnd(tEnd)
              while (pos < sEnd) {
                val t3 = varint(sEnd)
                (t3 >> 3, t3 & 7) match {
                  case (1, 1) =>
                    var bits = 0L; var i = 0
                    while (i < 8) {
                      bits |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1
                    }
                    pos += 8
                    value = java.lang.Double.longBitsToDouble(bits)
                  case (2, 0) => ts = varint(sEnd)
                  case (_, 2) => pos = lenEnd(sEnd)
                  case (_, 0) => varint(sEnd)
                  case (_, 1) => pos += 8
                  case (_, 5) => pos += 4
                  case _ => pos = sEnd
                }
              }
            case (_, 2) => pos = lenEnd(tEnd)
            case (_, 0) => varint(tEnd)
            case (_, 1) => pos += 8
            case (_, 5) => pos += 4
            case _ => pos = tEnd
          }
        }
        out += PromSeries(labels, ts, value)
      } else if ((tag & 7) == 2) { pos = lenEnd(end0) }
      else if ((tag & 7) == 0) { varint(end0) }
      else if ((tag & 7) == 1) { pos += 8 }
      else if ((tag & 7) == 5) { pos += 4 }
      else pos = end0
    }
    out.result()
  }

  /** Snappy block compression — what remote-write's Content-Encoding
    * demands; xerial snappy ships on Spark's classpath. */
  def snappy(b: Array[Byte]): Array[Byte] = org.xerial.snappy.Snappy.compress(b)
  def unsnappy(b: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.uncompress(b)

  /** [[timeSeries]] rows → snappy-compressed WriteRequest payloads,
    * greedy-packed per partition under `maxRequestBytes` (uncompressed;
    * the reference's threshold batching, PrometheusSinkThresholdConfig).
    * Output: (payload binary, series bigint) — hand each row's payload to
    * the HTTP sender of your deployment. */
  def requests(ts: DataFrame, maxRequestBytes: Int = 1 << 20): DataFrame = {
    val spark = ts.sparkSession
    import spark.implicits._
    ts.select("labels", "ts_ms", "value").as[(String, Long, Double)]
      .mapPartitions { it =>
        val batches = Iterator.continually {
          if (!it.hasNext) null
          else {
            var size = 0
            val buf = Seq.newBuilder[PromSeries]
            var n = 0L
            while (it.hasNext && size < maxRequestBytes) {
              val (labels, tsMs, v) = it.next()
              val s = PromSeries(
                labels.split(',').toSeq.map { kv =>
                  val i = kv.indexOf('=')
                  (kv.substring(0, i), kv.substring(i + 1))
                }, tsMs, v)
              size += encodeSeries(s).bytes.length + 6
              buf += s; n += 1
            }
            (snappy(encodeWriteRequest(buf.result())), n)
          }
        }.takeWhile(_ != null)
        batches
      }.toDF("payload", "series")
  }
}
