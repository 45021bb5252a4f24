package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SNS sink — the ENCODE side (reference
  * `sns-sink/.../SnsSinkService.java`): events buffer per topic in
  * arrival order and flush every `batch_size` events (default 10,
  * `SnsSinkConfig.DEFAULT_BATCH_SIZE`) as one `PublishBatch` request of
  * `PublishBatchRequestEntry(id, message = event JSON)`; topics ending
  * in `.fifo` additionally carry `message_group_id` /
  * `message_deduplication_id` resolved from configured event fields
  * (`SnsSinkService.createPublicRequestByTopic`). The `publishBatch`
  * call itself is the one documented egress seam, exactly like
  * [[SqsSink]] / [[CloudWatchLogs]] / [[PromRemoteWrite]].
  *
  * Unlike SQS/CloudWatch there is NO byte-threshold here — the reference
  * flushes purely on entry COUNT — so batch assignment is a pure
  * function of each event's global (ts, src_id) rank and needs no
  * sequential kernel. That makes it parallelizable where the byte folds
  * are not: the rank comes from a RANGE-partitioned two-phase count
  * (repartitionByRange on the order key → per-partition counts, ≤ P
  * driver scalars → prefix offsets + within-partition row_number), NOT
  * a single-partition `row_number() OVER (ORDER BY ts)` window that
  * would funnel 10^12 rows through one task. Range partitioning keeps
  * every group sampler-balanced even when billions of events share one
  * hot second (a per-ts-chunk fold — the packSequences recipe — would
  * collect a hot second into one task; ts is not unique the way
  * packSequences' doc ids are). The ranked input is localCheckpoint'd
  * so the partition ids the count job saw are the ones the assignment
  * job reads — range-sampler bounds are not re-drawn between jobs.
  *
  * Deliberate deviations, documented:
  *  - entry ids: the reference stamps `new Random().nextInt()` per entry
  *    and random UUIDs for missing FIFO group/dedup ids — meaningless
  *    under replay. We derive the deterministic positional id
  *    (`seq_in_request`) and, for absent FIFO fields, the reference's
  *    *shape*: one shared group id per flush (`g-<request_idx>`), one
  *    unique dedup id per entry (`d-<src_id>`).
  *  - `batch_size` clamps to 10: the public PublishBatch API rejects >10
  *    entries, which the reference would discover only at send time.
  */
object SnsSink {

  /** Public SNS PublishBatch limit. */
  val MaxEntriesPerRequest: Int = 10

  /** Reference SnsSinkConfig: `topic_arn`, `batch_size` (default 10),
    * optional FIFO `message_group_id` / `message_deduplication_id`
    * event-field names. */
  final case class Conf(
      topicArn: String,
      batchSize: Int = 10,
      messageGroupId: Option[String] = None,
      messageDeduplicationId: Option[String] = None) {
    def effectiveBatch: Int = math.min(math.max(batchSize, 1), MaxEntriesPerRequest)
    def isFifo: Boolean = topicArn.endsWith(".fifo")
  }

  /** Assign each event its PublishBatch coordinates. One row per input
    * event: `(topic_arn, src_id, ts, message, request_idx,
    * seq_in_request [, message_group_id, message_deduplication_id])` —
    * request numbering 1-based in (ts, src_id) order. Distributed: one
    * range exchange + one pid-keyed window over sampler-balanced
    * groups; driver state is ≤ P partition counts. */
  def assignBatches(df: DataFrame, tsCol: String, idCol: String,
      messageCol: String, conf: Conf): DataFrame = {
    val b = conf.effectiveBatch
    val spark = df.sparkSession
    val base = df.select(
      col(tsCol).cast("long").as("ts"),
      col(idCol).cast("long").as("src_id"),
      col(messageCol).cast("string").as("message"),
      conf.messageGroupId.map(f => df.col(f).cast("string"))
        .getOrElse(lit(null).cast("string")).as("mg"),
      conf.messageDeduplicationId.map(f => df.col(f).cast("string"))
        .getOrElse(lit(null).cast("string")).as("md"))

    // phase 1: range-partition on the order key (composite is unique →
    // sampler-balanced even under hot-second skew) and pin the layout;
    // per-partition counts → driver prefix (≤ P scalars).
    val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val pinned = base.repartitionByRange(p, col("ts"), col("src_id"))
      .localCheckpoint()
    val withPid = pinned.withColumn("_pid", spark_partition_id())
    val counts = withPid.groupBy("_pid").count()
      .collect().map(x => x.getInt(0) -> x.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val o = pid -> acc; acc += n; o
    }.toMap

    // phase 2: global rank = partition offset + within-partition
    // row_number; each window group IS one balanced range partition.
    val w = Window.partitionBy(col("_pid"))
      .orderBy(col("ts"), col("src_id"))
    val ranked = withPid
      .withColumn("rank",
        element_at(typedLit(offsets), col("_pid")) +
          row_number().over(w) - 1)
      .drop("_pid")

    val reqIdx = expr(s"rank DIV $b") + 1
    val out = ranked.select(
      lit(conf.topicArn).as("topic_arn"),
      col("src_id"), col("ts"), col("message"),
      reqIdx.as("request_idx"),
      (col("rank") % b + 1).as("seq_in_request"),
      col("mg"), col("md"))
    if (!conf.isFifo) out.drop("mg", "md")
    else out
      .withColumn("message_group_id",
        if (conf.messageGroupId.isDefined) col("mg")
        else concat(lit("g-"), col("request_idx").cast("string")))
      .withColumn("message_deduplication_id",
        if (conf.messageDeduplicationId.isDefined) col("md")
        else concat(lit("d-"), col("src_id").cast("string")))
      .drop("mg", "md")
  }

  /** One PublishBatch request per (topic, request_idx): the JSON body the
    * SDK would put on the wire, entries in sequence order. The POST is
    * the egress seam. */
  def publishBatchPayloads(assigned: DataFrame): DataFrame = {
    val fifo = assigned.columns.contains("message_group_id")
    val fields = Seq(col("seq_in_request"), col("message")) ++
      (if (fifo) Seq(col("message_group_id"), col("message_deduplication_id"))
       else Seq.empty)
    assigned
      .groupBy(col("topic_arn"), col("request_idx"))
      .agg(
        count(lit(1)).as("n_entries"),
        to_json(transform(
          sort_array(collect_list(struct(fields: _*))),
          m => {
            val core = Seq(
              m.getField("seq_in_request").cast("string").as("Id"),
              m.getField("message").as("Message"))
            val extra = if (fifo) Seq(
              m.getField("message_group_id").as("MessageGroupId"),
              m.getField("message_deduplication_id").as("MessageDeduplicationId"))
            else Seq.empty
            struct(core ++ extra: _*)
          })).as("payload"))
  }
}
