package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** CloudWatch Logs sink — the ENCODE side (reference
  * `cloudwatch-logs/.../CloudWatchLogsService.java:79-115` +
  * `utils/CloudWatchLogsLimits.java`): greedy packaging of log events
  * into PutLogEvents batches under the reference's three limits, with the
  * HTTP PutLogEvents call itself as the one documented egress seam — the
  * same split [[PromRemoteWrite]] demonstrates for the Prometheus sink.
  *
  * Reference semantics, reproduced exactly (per event, in stream order):
  *  1. an event whose `size + 26 > max_event_size` goes to the DLQ
  *     (here: `dropped = true` quarantine rows, never an exception);
  *  2. if `(buffer_bytes + size) + (buffer_count + 1) * 26 >
  *     max_request_size`, the buffer flushes FIRST (the event opens a new
  *     batch — `CloudWatchLogsService.java:104`);
  *  3. the event joins the buffer;
  *  4. if `buffer_count >= batch_size`, the buffer flushes (a batch may be
  *     exactly `batch_size` — `CloudWatchLogsService.java:109`).
  * The 26-byte per-event overhead is the public PutLogEvents accounting
  * constant (`CloudWatchLogsLimits.APPROXIMATE_LOG_EVENT_OVERHEAD_SIZE`).
  * Event size = UTF-8 byte length of the message column (the reference
  * sizes the event's JSON string; the message IS the unit here).
  *
  * Scale shape: batching is inherently sequential PER STREAM (the
  * reference buffers one stream per worker; PutLogEvents is a per-stream
  * API), so the engine parallelizes ACROSS streams — one groupBy on
  * (group, stream), a sorted in-task fold per stream, no driver funnel.
  * Per-task memory is bounded by one stream's events per flush window —
  * the same bound the reference's in-memory buffer imposes. The time-based
  * flush (`flush_interval`) is the streaming trigger's job, not the batch
  * packer's.
  */
object CloudWatchLogs {

  /** PutLogEvents per-event byte overhead (public API accounting). */
  val EventOverheadBytes: Int = 26

  /** Reference ThresholdConfig (`config/ThresholdConfig.java`): defaults
    * batch_size=25, max_event_size=1mb, max_request_size=1mb, with the
    * same validation ranges. `maxEventBytes <= maxRequestBytes` keeps an
    * event-size-accepted event always admissible to an empty buffer. */
  final case class Thresholds(
      batchSize: Int = 25,
      maxEventBytes: Long = 1048576L,
      maxRequestBytes: Long = 1048576L) {
    require(batchSize >= 1 && batchSize <= 10000,
      s"batch_size in [1, 10000], got $batchSize")
    require(maxEventBytes >= 1L && maxEventBytes <= 1048576L,
      s"max_event_size in [1b, 1mb], got $maxEventBytes")
    require(maxRequestBytes >= 1L && maxRequestBytes <= 1048576L,
      s"max_request_size in [1b, 1mb], got $maxRequestBytes")
    require(maxEventBytes <= maxRequestBytes,
      "max_event_size must not exceed max_request_size")
  }

  /** Greedy batch assignment. One row per input event:
    * `(log_group, log_stream, src_id, ts, message, event_bytes, dropped,
    * batch_idx, seq_in_batch)` — `dropped = true` (null batch/seq) for
    * events failing the max_event_size gate, batch numbering 1-based per
    * (group, stream) in (ts, src_id) order. One keyed shuffle; the fold
    * runs inside each stream's task. */
  def assignBatches(df: DataFrame, groupCol: String, streamCol: String,
      tsCol: String, idCol: String, msgCol: String,
      th: Thresholds = Thresholds()): DataFrame = {
    val sized = df.select(
      col(groupCol).cast("string").as("log_group"),
      col(streamCol).cast("string").as("log_stream"),
      col(tsCol).cast("long").as("ts"),
      col(idCol).cast("long").as("src_id"),
      col(msgCol).cast("string").as("message"),
      octet_length(col(msgCol).cast("string")).cast("long").as("event_bytes"))
    val oversize =
      col("event_bytes") + lit(EventOverheadBytes.toLong) > lit(th.maxEventBytes)

    val (mb, mr) = (th.batchSize, th.maxRequestBytes)
    // per-stream greedy fold — the exact service loop, one pass over the
    // stream's (ts, src_id)-sorted events
    val packFold = udf { (evs: Seq[Row]) =>
      var batch = 0L
      var cnt = 0
      var bytes = 0L
      evs.map { r =>
        val s = r.getLong(2)
        // flush-before-add: request size with per-event overhead
        if (batch == 0L ||
            bytes + s + (cnt + 1).toLong * EventOverheadBytes > mr) {
          batch += 1; cnt = 0; bytes = 0L
        }
        cnt += 1; bytes += s
        val out = (r.getLong(0), r.getLong(1), s, r.getString(3), batch, cnt)
        // flush-after-add on the count cap
        if (cnt >= mb) { batch += 1; cnt = 0; bytes = 0L }
        out
      }
    }

    val packed = sized.filter(!oversize)
      .groupBy(col("log_group"), col("log_stream"))
      .agg(sort_array(collect_list(struct(
        col("ts"), col("src_id"), col("event_bytes"), col("message"))))
        .as("evs"))
      .select(col("log_group"), col("log_stream"),
        explode(packFold(col("evs"))).as("e"))
      .select(col("log_group"), col("log_stream"),
        col("e._2").as("src_id"), col("e._1").as("ts"),
        col("e._4").as("message"), col("e._3").as("event_bytes"),
        lit(false).as("dropped"),
        col("e._5").as("batch_idx"), col("e._6").cast("long").as("seq_in_batch"))

    val quarantined = sized.filter(oversize)
      .select(col("log_group"), col("log_stream"), col("src_id"), col("ts"),
        col("message"), col("event_bytes"), lit(true).as("dropped"),
        lit(null).cast("long").as("batch_idx"),
        lit(null).cast("long").as("seq_in_batch"))

    packed.unionByName(quarantined)
  }

  /** One PutLogEvents request per batch: the JSON body a dispatcher POSTs
    * (`client/CloudWatchLogsDispatcher.java` builds the same shape via the
    * SDK), plus the accounted request size. Events inside a payload are in
    * non-descending timestamp order — the PutLogEvents API contract. */
  def putLogEventsPayloads(assigned: DataFrame): DataFrame =
    assigned.filter(!col("dropped"))
      .groupBy(col("log_group"), col("log_stream"), col("batch_idx"))
      .agg(
        sort_array(collect_list(struct(
          col("seq_in_batch"), col("ts"), col("message")))).as("evs"),
        count(lit(1)).as("n_events"),
        (sum(col("event_bytes")) +
          count(lit(1)) * lit(EventOverheadBytes.toLong)).as("request_bytes"))
      .select(col("log_group"), col("log_stream"), col("batch_idx"),
        col("n_events"), col("request_bytes"),
        to_json(struct(
          col("log_group").as("logGroupName"),
          col("log_stream").as("logStreamName"),
          transform(col("evs"), e => struct(
            e.getField("ts").as("timestamp"),
            e.getField("message").as("message"))).as("logEvents")))
          .as("payload"))
}
