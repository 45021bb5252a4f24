package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.{FormatString, PipelineYaml}

/** Terminal-sink dispatch for the pipelines.yaml compiler: map a
  * [[PipelineYaml.SinkOutput]]'s plugin onto the engine surface it
  * replaces, so a reference user's yaml drives the encode-family sinks end
  * to end. Encode sinks RETURN their payload DataFrame (the POST is the
  * documented egress seam — [[PromRemoteWrite]]/[[CloudWatchLogs]]/
  * [[SqsSink]]/[[OtlpExport]] conventions); `file` performs the write;
  * `stdout` returns the routed frame for the caller's action.
  *
  * Batch-analog contracts, documented per option:
  *  - the event payload is `to_json(struct(*))` of the event row — the
  *    reference serializes each Event the same way (`toJsonString`);
  *  - batching sinks need a data-borne order: options `order_by`
  *    (default `ts`) and `id_by` (default `event_id`) name the ordering
  *    and tiebreak columns, because a DataFrame carries no arrival order;
  *  - destination options (`log_group`, `log_stream`, `queue_url`)
  *    support the reference's `${key}` format strings via
  *    [[FormatString]] (the reference resolves the same expressions per
  *    event, e.g. CloudWatchLogsSinkConfig's templated log_stream).
  */
object SinkCompiler {

  private def str(o: Map[String, Any], k: String, default: => String): String =
    o.get(k).map(_.toString).getOrElse(default)
  private def req(o: Map[String, Any], k: String, plugin: String): String =
    o.getOrElse(k, throw new IllegalArgumentException(
      s"sink $plugin requires option '$k'")).toString
  private def num(o: Map[String, Any], k: String, default: Long): Long =
    o.get(k).map(_.toString.toLong).getOrElse(default)
  private def fmt(template: String): Column = FormatString.compile(template)

  /** Dispatch one terminal sink. Unknown plugins fail loudly with the
    * supported list — never a silent drop. */
  def compile(out: PipelineYaml.SinkOutput): DataFrame = {
    val o = out.plugin.options
    val df = out.df
    def withEnvelope: DataFrame = df
      .withColumn("_body", to_json(struct(df.columns.map(col): _*)))
      .withColumn("_order", col(str(o, "order_by", "ts")).cast("long"))
      .withColumn("_id", col(str(o, "id_by", "event_id")).cast("long"))

    out.plugin.name match {
      case "cloudwatch_logs" =>
        val th = CloudWatchLogs.Thresholds(
          batchSize = num(o, "batch_size", 25).toInt,
          maxEventBytes = num(o, "max_event_size", 1048576L),
          maxRequestBytes = num(o, "max_request_size", 1048576L))
        val e = withEnvelope
          .withColumn("_group", fmt(req(o, "log_group", "cloudwatch_logs")))
          .withColumn("_stream", fmt(req(o, "log_stream", "cloudwatch_logs")))
        CloudWatchLogs.putLogEventsPayloads(CloudWatchLogs.assignBatches(
          e, "_group", "_stream", "_order", "_id", "_body", th))

      case "sqs" =>
        val th = SqsSink.Thresholds(
          maxEventsPerMessage = num(o, "max_events_per_message", 25).toInt,
          maxMessageBytes = num(o, "max_message_size", 256L * 1024))
        val e = withEnvelope
          .withColumn("_queue", fmt(req(o, "queue_url", "sqs")))
        SqsSink.sendMessageBatchPayloads(SqsSink.assignBatches(
          e, "_queue", "_order", "_id", "_body", th))

      case "otlp" =>
        OtlpExport.traceRequests(df, OtlpExport.Thresholds(
          maxEvents = num(o, "max_events", 512).toInt,
          maxBatchBytes = num(o, "max_batch_size", 4L * 1024 * 1024)))

      case "sns" =>
        val conf = SnsSink.Conf(
          topicArn = req(o, "topic_arn", "sns"),
          batchSize = num(o, "batch_size", 10).toInt,
          messageGroupId = o.get("message_group_id").map(_.toString),
          messageDeduplicationId =
            o.get("message_deduplication_id").map(_.toString))
        SnsSink.publishBatchPayloads(SnsSink.assignBatches(
          withEnvelope, "_order", "_id", "_body", conf))

      case "http" =>
        val th = HttpSink.Thresholds(
          maxEvents = num(o, "event_count", 100).toInt,
          maxRequestBytes = num(o, "max_request_size", 50L * 1024 * 1024))
        HttpSink.requestPayloads(HttpSink.assignBatches(
          withEnvelope, "_order", "_id", "_body", th,
          shards = num(o, "workers", 32).toInt))

      case "kafka" =>
        // serialize the event row like the other encode sinks; the
        // reference's partition_key is the same ${} format string
        val d2 = df.withColumn("_body",
          to_json(struct(df.columns.map(col): _*)))
        graft.sources.Queues.produce(d2,
          topicName = req(o, "topic", "kafka"),
          keyTemplate = str(o, "partition_key", ""),
          valueCol = "_body",
          numPartitions = num(o, "partition_count", 12).toInt)

      case "file" =>
        df.write.mode("overwrite").json(req(o, "path", "file"))
        df

      case "stdout" => df

      case other => throw new IllegalArgumentException(
        s"unsupported terminal sink '$other' — supported here: " +
          "cloudwatch_logs, sqs, sns, http, kafka, otlp, file, stdout " +
          "(opensearch rides index.IndexBuilder, prometheus rides " +
          "sinks.PromRemoteWrite)")
    }
  }
}
