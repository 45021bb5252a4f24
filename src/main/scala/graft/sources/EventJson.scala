package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own `event_json` persistence codec
  * (event-json-codecs/EventJsonInputCodec.java:61-106,
  * EventJsonOutputCodec.java:45-82): a file is ONE JSON document
  * `{"version": v, "events": [{"data": {...}, "metadata": {attributes,
  * tags, timeReceived, externalOriginationTime, eventType}}, ...]}`.
  *
  * Mapping to the engine's conventions: `data` fields become top-level
  * columns (caller supplies the schema — static schemas are the engine
  * contract), `metadata` becomes the `_meta` struct the expression
  * language's getMetadata/hasTags/getEventType read
  * (ExprCompiler metadata functions). `timeReceived` is serialized the
  * way the reference's Jackson JavaTimeModule writes an Instant —
  * decimal epoch seconds — and parsed back to a timestamp.
  *
  * Version gate: the input codec drops documents whose major version is
  * newer than the writer's (DataPrepperVersion.compatibleWith); we pin
  * major 2, matching the reference line this engine mirrors.
  *
  * Scale shape: decode is wholetext-per-file + from_json + one explode
  * (no shuffle; a 100 TB corpus of event_json objects decodes at scan
  * speed, one task per file like the reference's one-codec-per-object).
  * Encode wraps each PARTITION into one complete document via
  * mapPartitions — the distributed analog of the reference's
  * start/writeEvent/complete stream protocol, no driver funnel.
  */
object EventJson {

  val Version = "2.12"
  private val CompatibleMajor = 2

  private def metaSchema =
    """STRUCT<eventType: STRING, tags: ARRAY<STRING>,
      |attributes: MAP<STRING, STRING>, timeReceived: DOUBLE,
      |externalOriginationTime: DOUBLE>""".stripMargin.replaceAll("\n", " ")

  private def secondsToTs(c: org.apache.spark.sql.Column) =
    // round, don't truncate: micros -> decimal seconds -> micros must
    // round-trip (1µs encodes as the double nearest 1e-6, which is BELOW
    // it — truncation would lose the microsecond)
    timestamp_micros(round(c * lit(1e6)).cast("long"))

  /** Decode a column holding complete event_json documents. `dataSchemaDdl`
    * is the DDL of the `data` object (e.g. `"msg STRING, code INT"`).
    * Emits the data fields as top-level columns plus `_meta`. */
  def decode(df: DataFrame, jsonCol: String, dataSchemaDdl: String,
      overrideTimeReceived: Boolean = false): DataFrame = {
    val docSchema =
      s"""version STRING, events ARRAY<STRUCT<
         |data: STRUCT<$dataSchemaDdl>, metadata: $metaSchema>>"""
        .stripMargin.replaceAll("\n", " ")
    val major = regexp_extract(col("_doc")("version"), "^(\\d+)", 1).cast("int")
    val parsed = df
      .withColumn("_doc", from_json(col(jsonCol), docSchema, Map.empty[String, String]))
      .filter(col("_doc").isNotNull && major.isNotNull && major <= CompatibleMajor)
      .select(explode(col("_doc")("events")).as("_ev"))
      .filter(col("_ev")("data").isNotNull) // createRecord: data==null -> skip
    val md = col("_ev")("metadata")
    val timeReceived =
      if (overrideTimeReceived) secondsToTs(md("timeReceived"))
      else current_timestamp() // reference default: stamp arrival time
    parsed.select(
      col("_ev")("data").as("_data"),
      struct(
        coalesce(md("eventType"), lit("LOG")).as("event_type"),
        coalesce(md("tags"), array().cast("array<string>")).as("tags"),
        coalesce(md("attributes"),
          map().cast("map<string,string>")).as("attributes"),
        timeReceived.as("time_received"),
        secondsToTs(md("externalOriginationTime"))
          .as("external_origination_time")).as("_meta"))
      .select(col("_data.*"), col("_meta"))
  }

  /** Read a directory of event_json files (one document per file, the
    * reference's layout) — wholetext per file, then [[decode]]. */
  def readFiles(spark: SparkSession, path: String, dataSchemaDdl: String,
      overrideTimeReceived: Boolean = false): DataFrame =
    decode(spark.read.option("wholetext", "true").text(path)
      .withColumnRenamed("value", "_raw"), "_raw", dataSchemaDdl,
      overrideTimeReceived)

  /** Encode: per input row, the `{"data":…,"metadata":…}` event object
    * (dataCols -> data; `_meta` -> metadata keys, reference spelling). */
  def eventObjects(df: DataFrame, dataCols: Seq[String]): Dataset[String] = {
    val hasMeta = df.columns.contains("_meta")
    val md =
      if (hasMeta) {
        val m = col("_meta")
        struct(
          m.getField("event_type").as("eventType"),
          m.getField("tags").as("tags"),
          m.getField("attributes").as("attributes"),
          (unix_micros(m.getField("time_received")).cast("double") / 1e6)
            .as("timeReceived"))
      } else struct(lit("LOG").as("eventType"))
    val ev = to_json(struct(
      struct(dataCols.map(col): _*).as("data"), md.as("metadata")))
    df.select(ev.as("j")).as(org.apache.spark.sql.Encoders.STRING)
  }

  /** Wrap each partition's events into one complete document string —
    * write with `.write.text(...)` for one document per output file. */
  def documents(events: Dataset[String]): Dataset[String] = {
    implicit val enc = org.apache.spark.sql.Encoders.STRING
    events.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else Iterator(it.mkString(
        s"""{"version":"$Version","events":[""", ",", "]}"))
    }
  }
}
