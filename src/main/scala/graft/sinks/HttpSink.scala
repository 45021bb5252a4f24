package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** HTTP sink — the ENCODE side (reference
  * `http-sink/.../service/HttpSinkService.java` riding
  * `common/.../sink/DefaultSinkOutputStrategy.java:65-110` +
  * `HttpSinkBufferWriter.java`): events buffer in arrival order and
  * flush as one HTTP request body under the reference's two thresholds
  * (`ThresholdOptions`: `event_count` default 100, `max_request_size`
  * default 50mb), with the POST itself as the one documented egress seam
  * — the sixth member of the encode family ([[PromRemoteWrite]],
  * [[CloudWatchLogs]], [[SqsSink]], [[SnsSink]], [[OtlpExport]]).
  *
  * Reference semantics, reproduced exactly (per event, in order):
  *  1. if `buffer_bytes + size > max_request_size`, the buffer flushes
  *     FIRST (`DefaultSinkOutputStrategy.java:89` → a flush of an empty
  *     buffer is a no-op, `HttpSinkBufferWriter.getBuffer` returns null —
  *     so an event larger than `max_request_size` alone still enters the
  *     empty buffer and becomes its own oversized request; there is no
  *     event-size DLQ, `HttpSinkBufferEntry.exceedsMaxEventSizeThreshold`
  *     is hardwired false);
  *  2. the event joins the buffer;
  *  3. if `buffer_count >= event_count`, the buffer flushes
  *     (`DefaultSinkOutputStrategy.java:99`).
  * Event size = the codec's serialized byte length
  * (`HttpSinkBufferEntry.calculateSize`); here the UTF-8 byte length of
  * the body column — the ndjson-codec analog the other sinks use.
  *
  * Scale shape: the reference runs ONE buffer per pipeline worker
  * thread, so batch composition is per-worker, not global. The batch
  * analog makes that worker assignment explicit and deterministic:
  * `shard = src_id % shards`, each shard folding its (ts, src_id)-sorted
  * events inside one task — one keyed shuffle, parallel across shards,
  * no driver funnel, exactly the CloudWatch/SQS shape (byte-dependent
  * folds are inherently sequential per buffer, unlike [[SnsSink]]'s
  * count-only closed form).
  */
object HttpSink {

  /** Reference ThresholdOptions: event_count default 100 (range
    * [1, 10^7]), max_request_size default 50mb. */
  final case class Thresholds(
      maxEvents: Int = 100,
      maxRequestBytes: Long = 50L * 1024 * 1024) {
    require(maxEvents >= 1 && maxEvents <= 10000000,
      s"event_count in [1, 10000000], got $maxEvents")
    require(maxRequestBytes >= 1L,
      s"max_request_size >= 1b, got $maxRequestBytes")
  }

  /** Greedy request assignment. One row per input event:
    * `(shard, src_id, ts, body, event_bytes, request_idx,
    * seq_in_request)` — request numbering 1-based per shard in
    * (ts, src_id) order. One keyed shuffle; the fold runs inside each
    * shard's task. */
  def assignBatches(df: DataFrame, tsCol: String, idCol: String,
      bodyCol: String, th: Thresholds = Thresholds(),
      shards: Int = 32): DataFrame = {
    require(shards >= 1, s"shards >= 1, got $shards")
    val sized = df.select(
      pmod(col(idCol).cast("long"), lit(shards.toLong)).as("shard"),
      col(tsCol).cast("long").as("ts"),
      col(idCol).cast("long").as("src_id"),
      col(bodyCol).cast("string").as("body"),
      octet_length(col(bodyCol).cast("string")).cast("long").as("event_bytes"))

    val (me, mr) = (th.maxEvents, th.maxRequestBytes)
    // per-shard greedy fold — the exact DefaultSinkOutputStrategy loop
    val packFold = udf { (evs: Seq[Row]) =>
      var req = 0L
      var cnt = 0
      var bytes = 0L
      evs.map { r =>
        val s = r.getLong(2)
        // flush-before-add on request bytes; a flush of an empty buffer
        // is a no-op (cnt == 0 joins the open request regardless of size)
        if (req == 0L || (cnt > 0 && bytes + s > mr)) {
          req += 1; cnt = 0; bytes = 0L
        }
        cnt += 1; bytes += s
        val out = (r.getLong(0), r.getLong(1), s, r.getString(3), req, cnt.toLong)
        // flush-after-add on the count cap
        if (cnt >= me) { req += 1; cnt = 0; bytes = 0L }
        out
      }
    }

    sized
      .groupBy(col("shard"))
      .agg(sort_array(collect_list(struct(
        col("ts"), col("src_id"), col("event_bytes"), col("body"))))
        .as("evs"))
      .select(col("shard"), explode(packFold(col("evs"))).as("e"))
      .select(col("shard"), col("e._2").as("src_id"), col("e._1").as("ts"),
        col("e._4").as("body"), col("e._3").as("event_bytes"),
        col("e._5").as("request_idx"), col("e._6").as("seq_in_request"))
  }

  /** One HTTP request per (shard, request_idx): newline-joined event
    * bodies (the ndjson codec analog), event count and byte accounting.
    * The POST is the egress seam. */
  def requestPayloads(assigned: DataFrame): DataFrame =
    assigned
      .groupBy(col("shard"), col("request_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("event_bytes")).as("request_bytes"),
        concat_ws("\n", sort_array(collect_list(struct(
          col("seq_in_request"), col("body")))).getField("body"))
          .as("payload"))
}
