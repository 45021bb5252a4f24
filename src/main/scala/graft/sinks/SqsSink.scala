package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** SQS sink — the ENCODE side (reference
  * `sqs-sink/.../SqsSinkService.java` + `SqsSinkBatch.java`): TWO-LEVEL
  * greedy packaging — events pack into MESSAGES (≤ `max_events_per_message`
  * events, message bytes bounded by `max_message_size`), messages pack into
  * SendMessageBatch REQUESTS (≤ 10 messages, ≤ 256 KiB total — the public
  * SQS API limits, `SqsSinkBatch.MAX_MESSAGES_PER_BATCH` /
  * `MAX_BATCH_SIZE_BYTES`) — with the SendMessageBatch call itself as the
  * one documented egress seam, exactly like [[PromRemoteWrite]] and
  * [[CloudWatchLogs]].
  *
  * Reference semantics, reproduced exactly (per event, in queue order):
  *  1. request-level check FIRST (`SqsSinkService.willExceedMaxBatchSize` →
  *     `SqsSinkBatch.willExceedLimits`): the request flushes when
  *     `request_bytes + size > 256 KiB`, or — unless the event fits the
  *     CURRENT message (`events < max_events_per_message` and
  *     `message_bytes + size <= max_message_size`) — when the request
  *     already holds 10 messages;
  *  2. then `addEntry`: the event appends to the current message iff
  *     `events < max_events_per_message` AND `message_bytes + size <
  *     max_message_size` (STRICT `<` — one byte stricter than the
  *     request-level `<=` check; an event landing exactly on
  *     `max_message_size` therefore opens a new message without flushing
  *     the request; reference quirk, `SqsSinkBatch.java:97 vs :109`),
  *     otherwise it opens the next message.
  * There is no event-size DLQ in this sink: an event larger than
  * `max_message_size` becomes a single oversized message (the reference
  * behaves the same; the send would fail at the API and retry into the
  * sink's failure DLQ).
  * Event size = UTF-8 byte length of the body column (the reference uses
  * the codec's estimated serialized size).
  *
  * Scale shape: identical to [[CloudWatchLogs]] — sequential per QUEUE
  * (the reference holds one open batch per queue URL), parallel across
  * queues: one keyed shuffle, the two-level fold runs inside each queue's
  * task, no driver funnel.
  */
object SqsSink {

  /** Public SQS SendMessageBatch limits. */
  val MaxMessagesPerRequest: Int = 10
  val MaxRequestBytes: Long = 256L * 1024

  /** Reference SqsThresholdConfig: defaults max_events_per_message=25,
    * max_message_size=256kb. */
  final case class Thresholds(
      maxEventsPerMessage: Int = 25,
      maxMessageBytes: Long = 256L * 1024) {
    require(maxEventsPerMessage >= 1 && maxEventsPerMessage <= 10000,
      s"max_events_per_message in [1, 10000], got $maxEventsPerMessage")
    require(maxMessageBytes >= 1L && maxMessageBytes <= 256L * 1024,
      s"max_message_size in [1b, 256kb], got $maxMessageBytes")
  }

  /** Two-level greedy assignment. One row per input event:
    * `(queue_url, src_id, ts, body, event_bytes, request_idx, message_idx,
    * seq_in_message)` — request numbering 1-based per queue, message
    * numbering 1-based per request, all in (ts, src_id) order. One keyed
    * shuffle; the fold runs inside each queue's task. */
  def assignBatches(df: DataFrame, queueCol: String, tsCol: String,
      idCol: String, bodyCol: String,
      th: Thresholds = Thresholds()): DataFrame = {
    val sized = df.select(
      col(queueCol).cast("string").as("queue_url"),
      col(tsCol).cast("long").as("ts"),
      col(idCol).cast("long").as("src_id"),
      col(bodyCol).cast("string").as("body"),
      octet_length(col(bodyCol).cast("string")).cast("long").as("event_bytes"))

    val (me, mm) = (th.maxEventsPerMessage, th.maxMessageBytes)
    val packFold = udf { (evs: Seq[Row]) =>
      var req = 1L // request index (1-based)
      var m = 0 // messages in the open request
      var rBytes = 0L // request bytes
      var c = 0 // events in the open message
      var s = 0L // open message bytes
      evs.map { r =>
        val e = r.getLong(2)
        // 1. request-level flush check (willExceedLimits): bytes cap, or
        //    message-count cap when the event can't ride the open message.
        //    Guarded on m > 0: the reference never flushes an EMPTY batch
        //    (willExceedMaxBatchSize returns false before the queue's
        //    first addEntry, SqsSinkService.java:170-181), so an
        //    oversized first event rides alone in request 1 rather than
        //    leaving a phantom empty request index.
        val fitsOpenMsg = m > 0 && c < me && s + e <= mm
        if (m > 0 && (rBytes + e > MaxRequestBytes ||
            (!fitsOpenMsg && m == MaxMessagesPerRequest))) {
          req += 1; m = 0; rBytes = 0L; c = 0; s = 0L
        }
        // 2. addEntry: strict < on the message byte cap (reference quirk)
        if (m > 0 && c < me && s + e < mm) { c += 1; s += e }
        else { m += 1; c = 1; s = e }
        rBytes += e
        (r.getLong(1), r.getLong(0), e, r.getString(3), req, m.toLong, c.toLong)
      }
    }

    sized
      .groupBy(col("queue_url"))
      .agg(sort_array(collect_list(struct(
        col("ts"), col("src_id"), col("event_bytes"), col("body"))))
        .as("evs"))
      .select(col("queue_url"), explode(packFold(col("evs"))).as("e"))
      .select(col("queue_url"), col("e._1").as("src_id"), col("e._2").as("ts"),
        col("e._4").as("body"), col("e._3").as("event_bytes"),
        col("e._5").as("request_idx"), col("e._6").as("message_idx"),
        col("e._7").as("seq_in_message"))
  }

  /** One SendMessageBatch request per (queue, request_idx): entries carry
    * 1-based string ids (the reference uses UUIDs; batch mode derives the
    * deterministic id from the message's position) and newline-joined
    * event bodies (the ndjson codec analog of the reference's per-message
    * codec buffer). The POST is the egress seam. */
  def sendMessageBatchPayloads(assigned: DataFrame): DataFrame =
    assigned
      .groupBy(col("queue_url"), col("request_idx"), col("message_idx"))
      .agg(
        concat_ws("\n", sort_array(collect_list(struct(
          col("seq_in_message"), col("body")))).getField("body"))
          .as("message_body"),
        count(lit(1)).as("n_events"),
        sum(col("event_bytes")).as("message_bytes"))
      .groupBy(col("queue_url"), col("request_idx"))
      .agg(
        count(lit(1)).as("n_messages"),
        sum(col("message_bytes")).as("request_bytes"),
        to_json(transform(
          sort_array(collect_list(struct(
            col("message_idx"), col("message_body")))),
          m => struct(m.getField("message_idx").cast("string").as("Id"),
            m.getField("message_body").as("MessageBody")))).as("payload"))
}
