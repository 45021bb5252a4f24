package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-feed codecs: the parse half of the reference's poll-style sources
  * (`prometheus` scrape and `rss` feed). The network poll loop itself has
  * no batch analog and stays out of scope (COVERAGE.md §2.1); what the
  * poller *yields* — an exposition-format page, a feed XML document — is
  * parsed here, so a user can point the engine at archived scrapes/feeds
  * on the object store and get the same events the reference emits.
  *
  * Both are pure Column pipelines (split/explode/regexp/xpath): narrow,
  * shuffle-free, whole-stage-codegen'd — a 100 TB archive parses at scan
  * speed.
  */
object Feeds {

  // ------------------------------------------------------------------
  // Prometheus exposition format (text/plain version 0.0.4):
  //   metric_name{label="value",...} value [timestamp_ms]
  // Comment (#) and blank lines are dropped. Escaped quotes inside label
  // values are not supported (documented subset; the reference's scraper
  // delegates parsing to the same grammar).
  // ------------------------------------------------------------------

  private val NameRe = "^([a-zA-Z_:][a-zA-Z0-9_:]*)"
  private val LabelsRe = "^[a-zA-Z_:][a-zA-Z0-9_:]*\\{([^}]*)\\}"
  private val PairRe = "([a-zA-Z_][a-zA-Z0-9_]*)=\"([^\"]*)\""
  // everything before the sample value (name + optional label block);
  // label values may contain spaces, so the tail is parsed from the
  // REMAINDER after stripping this prefix, never from the raw line.
  // (Documented subset: no literal '}' or escaped '"' inside label values.)
  private val PrefixRe = "^[a-zA-Z_:][a-zA-Z0-9_:]*(\\{[^}]*\\})?"

  /** Parse a column holding one exposition PAGE (many lines) into one row
    * per sample: `metric_name`, `labels` map, `value` double, `ts_ms`
    * long (null when absent). Other input columns pass through. */
  def prometheusText(df: DataFrame, textCol: String): DataFrame = {
    val line = col("_line")
    val tail = regexp_replace(line, PrefixRe, "")
    val rawVal = regexp_extract(tail, "^\\s+(\\S+)", 1)
    df.select(df.columns.map(col).toSeq :+
        explode(split(col(textCol), "\n")).as("_line"): _*)
      .where(length(trim(line)) > 0 && !trim(line).startsWith("#"))
      .withColumn("metric_name", regexp_extract(line, NameRe, 1))
      .where(col("metric_name") =!= "")
      .withColumn("labels", map_from_entries(transform(
        regexp_extract_all(
          regexp_extract(line, LabelsRe, 1), lit(PairRe), lit(0)),
        p => struct(regexp_extract(p, PairRe, 1).as("key"),
          regexp_extract(p, PairRe, 2).as("value")))))
      .withColumn("value",
        // exposition spec allows NaN/+Inf/-Inf spellings Spark's cast
        // doesn't know
        when(rawVal === "+Inf", lit(Double.PositiveInfinity))
          .when(rawVal === "-Inf", lit(Double.NegativeInfinity))
          .when(rawVal === "NaN", lit(Double.NaN))
          .otherwise(rawVal.cast("double")))
      .withColumn("ts_ms",
        nullif(regexp_extract(tail, "^\\s+\\S+\\s+(-?\\d+)\\s*$", 1), lit(""))
          .cast("long"))
      .drop("_line")
  }

  // ------------------------------------------------------------------
  // RSS 2.0 feed: one XML document per row → one row per <item>, with
  // the channel title carried along. XPath keeps item fields aligned by
  // ordinal (arrays_zip), so missing optional tags would shift — the
  // standard feed fields (title/link/guid/pubDate) are required by the
  // RSS 2.0 spec for the reference's use.
  // ------------------------------------------------------------------

  private def xp(xml: Column, path: String): Column =
    call_function("xpath", xml, lit(path))

  /** Explode an RSS 2.0 XML column into one row per item:
    * `channel_title`, `item_title`, `item_link`, `item_guid`,
    * `item_pub_date`, `item_pos`. Other input columns pass through. */
  def rssItems(df: DataFrame, xmlCol: String): DataFrame = {
    val xml = col(xmlCol)
    val zipped = arrays_zip(
      xp(xml, "/rss/channel/item/title/text()").as("title"),
      xp(xml, "/rss/channel/item/link/text()").as("link"),
      xp(xml, "/rss/channel/item/guid/text()").as("guid"),
      xp(xml, "/rss/channel/item/pubDate/text()").as("pubDate"))
    df.withColumn("channel_title",
        call_function("xpath_string", xml, lit("/rss/channel/title")))
      .select(df.columns.map(col).toSeq ++ Seq(col("channel_title"),
        posexplode(zipped).as(Seq("item_pos", "_item"))): _*)
      .withColumn("item_title", col("_item")("title"))
      .withColumn("item_link", col("_item")("link"))
      .withColumn("item_guid", col("_item")("guid"))
      .withColumn("item_pub_date", col("_item")("pubDate"))
      .drop("_item", xmlCol)
  }

  // ------------------------------------------------------------------
  // CloudWatch Logs subscription-filter payload (the public AWS format a
  // Kinesis/Firehose subscription delivers: gzip-compressed JSON with
  // messageType/owner/logGroup/logStream/subscriptionFilters/logEvents).
  // The reference ingests these through its kinesis source
  // (kinesis-source/.../KinesisSource.java:44) and polls metrics via SDK
  // (cloudwatch-metrics-source/.../CloudwatchMetricsWorker.java:136) —
  // both network loops are out of batch scope, but the payload decode is
  // the part that carries semantics, same split as prometheus/rss above.
  // ------------------------------------------------------------------

  private val CwSchema =
    """messageType STRING, owner STRING, logGroup STRING, logStream STRING,
      |subscriptionFilters ARRAY<STRING>,
      |logEvents ARRAY<STRUCT<id: STRING, timestamp: LONG, message: STRING>>
      |""".stripMargin

  /** gunzip kernel (documented UDF seam — java.util.zip has no Column
    * form; same contract as pipeline Decompress: corrupt → null). */
  private val gunzip = udf { (bytes: Array[Byte]) =>
    if (bytes == null) null
    else try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var r = in.read(buf)
      while (r > 0) { out.write(buf, 0, r); r = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } catch { case _: Exception => null }
  }

  /** Decode a binary column of gzipped CloudWatch Logs subscription
    * payloads into one row per log event: `owner`, `log_group`,
    * `log_stream`, `event_id`, `ts_ms`, `message`, `event_pos`.
    * CONTROL_MESSAGE payloads (the subscription handshake) and corrupt
    * gzip/JSON rows are dropped — the quarantine contract is upstream's
    * (`from_json` null-channel), exactly like the reference's codec path.
    * One decode projection + one explode; no shuffle. */
  def cloudwatchSubscription(df: DataFrame, bytesCol: String): DataFrame = {
    val p = from_json(gunzip(col(bytesCol)), CwSchema, Map.empty[String, String])
    df.withColumn("_cw", p)
      .where(col("_cw").isNotNull &&
        col("_cw")("messageType") === "DATA_MESSAGE")
      .select(df.columns.filter(_ != bytesCol).map(col).toSeq ++ Seq(
        col("_cw")("owner").as("owner"),
        col("_cw")("logGroup").as("log_group"),
        col("_cw")("logStream").as("log_stream"),
        posexplode(col("_cw")("logEvents")).as(Seq("event_pos", "_ev"))): _*)
      .withColumn("event_id", col("_ev")("id"))
      .withColumn("ts_ms", col("_ev")("timestamp"))
      .withColumn("message", col("_ev")("message"))
      .drop("_ev")
  }
}
