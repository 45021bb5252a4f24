package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-Prepper `aggregate` processor parity (SURVEY.md §2.6).
  *
  * The reference co-locates groups via its peer-forwarder hash ring
  * (data-prepper-core/.../peerforwarder/HashRing.java:34) and aggregates in
  * per-group processing-time windows
  * (aggregate-processor/.../AggregateProcessor.java:105-141). Here the
  * hash-route IS the Spark exchange of a groupBy, and windows are *event
  * time* (tumbling via `window()`, sessions via gaps-and-islands /
  * `session_window`) — strictly stronger semantics than the reference's
  * wall-clock windows, and the only meaningful definition for batch.
  */
object Aggregates {

  /** `count` action (CountAggregateAction.java:46,96-186): count +
    * min start / max end time per group per tumbling window. */
  def countAction(df: DataFrame, keys: Seq[String], ts: String,
      windowDur: String): DataFrame =
    df.groupBy((keys.map(col) :+ window(col(ts), windowDur).as("w")): _*)
      .agg(count(lit(1)).as("value"),
        min(col(ts)).as("start_time"),
        max(col(ts)).as("end_time"))

  /** `count` with `unique_keys` (exact distinct in the reference via an
    * in-memory set over the key TUPLE, CountAggregateAction.java:96 — here
    * scalable exact count_distinct over the same tuple, plus the
    * approx_count_distinct escape hatch for 10^12-row groups). */
  def countDistinctAction(df: DataFrame, keys: Seq[String], uniqueKey: String,
      approx: Boolean = false): DataFrame =
    countDistinctAction(df, keys, Seq(uniqueKey), approx)

  def countDistinctAction(df: DataFrame, keys: Seq[String],
      uniqueKeys: Seq[String], approx: Boolean): DataFrame = {
    val ucols = uniqueKeys.map(col)
    val agg0 = if (approx) approx_count_distinct(struct(ucols: _*)).as("value")
      else countDistinct(ucols.head, ucols.tail: _*).as("value")
    df.groupBy(keys.map(col): _*).agg(agg0)
  }

  /** `histogram` action (HistogramAggregateAction.java:137-209): explicit
    * bounds, ±∞ outer buckets, plus sum/min/max/count like the OTel shape.
    * Bucketing is a codegen'd when-chain (the reference binary-searches per
    * event); the groupBy computes all buckets of all groups in one pass. */
  def histogramAction(df: DataFrame, keys: Seq[String], valueCol: String,
      bounds: Seq[Double]): DataFrame = {
    val v = col(valueCol)
    val bucketIdx = bounds.zipWithIndex.foldRight(lit(bounds.size): Column) {
      case ((b, i), acc) => when(v < b, i).otherwise(acc)
    }
    df.groupBy((keys.map(col) :+ bucketIdx.as("bucket")): _*)
      .agg(count(lit(1)).as("count"), sum(v).as("sum"),
        min(v).as("min"), max(v).as("max"))
  }

  /** `put_all` action (PutAllAggregateAction.java:31): last-writer-wins
    * union of fields per group — deterministic via explicit event order
    * (the reference's "last" is arrival order; a distributed engine must
    * name the order). One shuffle; max_by is a codegen'd aggregate. */
  def putAllAction(df: DataFrame, keys: Seq[String], order: String,
      fields: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(max_by(col(fields.head), col(order)).as(fields.head),
        fields.tail.map(f => max_by(col(f), col(order)).as(f)): _*)

  /** `append` action (AppendAggregateAction.java:37): merge events per
    * group; scalar conflicts become arrays — ordered by event order so the
    * result is deterministic (sort_array over collected (order, value)). */
  def appendAction(df: DataFrame, keys: Seq[String], order: String,
      fields: Seq[String]): DataFrame = {
    def collected(f: String) =
      transform(sort_array(collect_list(struct(col(order).as("o"), col(f).as("v")))),
        e => e.getField("v")).as(f)
    df.groupBy(keys.map(col): _*)
      .agg(collected(fields.head), fields.tail.map(collected): _*)
  }

  /** `remove_duplicates` (RemoveDuplicatesAggregateAction.java:26,33-35):
    * first event per group. `dropDuplicates` is order-nondeterministic in a
    * distributed engine, so "first" is defined by an explicit order column
    * — row_number over (keys, order) == 1. */
  def removeDuplicates(df: DataFrame, keys: Seq[String], order: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(order))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** `percent_sampler` (PercentSamplerAggregateAction.java:25,48):
    * deterministic running-ratio admission — allow iff
    * (allowed+1)/(total+1) <= pct/100, evaluated in event order per group.
    *
    * The running ratio is inherently sequential per group; expressed as a
    * window count: an event at 1-based position `i` in its group is the
    * `ceil(i*pct)`-th admitted iff floor(i*pct) > floor((i-1)*pct) — the
    * closed form of the reference's counter loop for a fixed pct. */
  def percentSampler(df: DataFrame, keys: Seq[String], order: String,
      percent: Double): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(order))
    val p = percent / 100.0
    df.withColumn("_i", row_number().over(w))
      .filter(floor(col("_i") * p) > floor((col("_i") - 1) * p))
      .drop("_i")
  }

  /** `rate_limiter` DROP mode (RateLimiterAggregateAction.java:26-40): in
    * batch, a throughput ceiling = keep first `eventsPerSecond` events per
    * (group, second). */
  def rateLimiterDrop(df: DataFrame, keys: Seq[String], ts: String,
      eventsPerSecond: Int): DataFrame = {
    val sec = date_trunc("second", col(ts))
    val w = Window.partitionBy((keys.map(col) :+ sec): _*).orderBy(col(ts))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= eventsPerSecond).drop("_rn")
  }

  /** `rate_limiter` BLOCK mode (RateLimiterAggregateAction when_exceeds:
    * block — over-rate events WAIT instead of dropping). Batch semantics:
    * per key, arrival-ordered events get the effective emit time of a
    * token bucket draining at `ratePerSecond`:
    * `emit_i = max(ts_i, emit_{i-1} + 1/rate)`. That recurrence has the
    * closed form `emit_i = i·T + max_{j≤i}(ts_j − j·T)` (T = one slot),
    * so it is ONE running-max window — fully declarative, no sequential
    * per-key kernel, scales like any keyed window. Adds `emit_ts`. */
  def rateLimiterBlock(df: DataFrame, keys: Seq[String], ts: String,
      ratePerSecond: Double, tieBreak: Seq[String] = Nil): DataFrame = {
    val slotUs = (1e6 / ratePerSecond).toLong
    val order = (ts +: tieBreak).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val withRn = df.withColumn("_rn", row_number().over(w) - 1)
    val emitUs = col("_rn") * slotUs +
      max(unix_micros(col(ts)) - col("_rn") * slotUs)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
    withRn.withColumn("emit_ts", timestamp_micros(emitUs)).drop("_rn")
  }

  /** `tail_sampler` (TailSamplerAggregateAction.java:35-60): session-window
    * a group by inactivity gap; emit the whole session if any event matched
    * `condition`, else admit the session with probability `percent` —
    * deterministic via a seeded hash of the session key (never rand()). */
  def tailSampler(df: DataFrame, keys: Seq[String], ts: String,
      gap: String, condition: Column, percent: Double, seed: Long = 42L): DataFrame = {
    // gaps-and-islands session ids (batch form of session_window)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts))
    val prevTs = lag(col(ts), 1).over(w)
    val withSess = df
      .withColumn("_new", when(prevTs.isNull ||
        unix_timestamp(col(ts)) - unix_timestamp(prevTs) > lit(gapSeconds(gap)), 1).otherwise(0))
      .withColumn("_sess", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_new")
    val ws = Window.partitionBy((keys.map(col) :+ col("_sess")): _*)
    val admit = max(when(condition, 1).otherwise(0)).over(ws) === 1 ||
      (pmod(xxhash64(concat_ws("", (keys.map(col) :+ col("_sess") :+ lit(seed)): _*)),
        lit(10000L)) < lit((percent * 100).toLong))
    // window expressions can't live in a WHERE clause — materialize first
    withSess.withColumn("_admit", admit).filter(col("_admit"))
      .drop("_sess", "_admit")
  }

  /** Gap-based sessionization — the batch form of Structured Streaming's
    * `session_window` (the tail sampler reuses the same island
    * derivation internally): per key, ordered by event time, a new
    * session opens when the gap to the previous event exceeds `gap`.
    * One row per SESSION: `(keys…, session_idx 1-based per key,
    * session_start, session_end, n_events, duration_s)`, times in epoch
    * seconds. Events tied on the same second always share a session, so
    * the output is deterministic under any tie order.
    *
    * Scale shape: one keyed shuffle; the lag/cumsum windows and the
    * final aggregate all share the key partitioning (no second
    * exchange), groups are per key — the same bound every per-key
    * aggregate here carries. */
  def sessionize(df: DataFrame, keys: Seq[String], ts: String,
      gap: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(unix_timestamp(col(ts)))
    val t = unix_timestamp(col(ts))
    val prevTs = lag(t, 1).over(w)
    df
      .withColumn("_t", t)
      .withColumn("_new", when(prevTs.isNull ||
        col("_t") - prevTs > lit(gapSeconds(gap)), 1).otherwise(0))
      .withColumn("session_idx", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keys.map(col) :+ col("session_idx")): _*)
      .agg(
        min(col("_t")).as("session_start"),
        max(col("_t")).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col("_t")) - min(col("_t"))).as("duration_s"))
  }

  private def gapSeconds(gap: String): Long = {
    val t = gap.trim.toLowerCase(java.util.Locale.ROOT)
    val num = t.takeWhile(c => c.isDigit).toLong
    if (t.endsWith("m") || t.contains("min")) num * 60
    else if (t.endsWith("h") || t.contains("hour")) num * 3600
    else num
  }

  /** otel_traces trace-group fill (otel-trace-raw-processor/.../
    * OTelTraceRawProcessor: every span of a trace receives the ROOT span's
    * traceGroup + traceGroupFields). Root = parentId null/empty. One keyed
    * self-join on traceId: the roots side is one row per trace — broadcast
    * when traces fit an executor, shuffle join otherwise (Spark picks via
    * AQE/stats; at 10^12 spans the roots table is ~n_traces rows, so the
    * join stays a plain keyed equi-join either way, never a window over
    * all spans). Fields are emitted as `trace_group` + `tg_<field>`. */
  def traceGroupFill(df: DataFrame, traceId: String, parentId: String,
      nameCol: String, fields: Seq[String],
      orderCol: String = "trace_group_order"): DataFrame = {
    val isRoot = col(parentId).isNull || col(parentId) === ""
    val ord = if (df.columns.contains(orderCol)) col(orderCol) else col(nameCol)
    // exactly ONE root row per trace (real OTel data has orphan spans →
    // multiple parentless rows; a plain join would duplicate every span
    // of such traces): deterministic min_by over the order column
    val roots = df.filter(isRoot)
      .groupBy(col(traceId))
      .agg(min_by(col(nameCol), ord).as("trace_group"),
        fields.map(f => min_by(col(f), ord).as(s"tg_$f")): _*)
    df.join(roots, Seq(traceId), "left")
  }

  /** Service-map relationship builder (service-map-stateful /
    * otel_apm_service_map): for every CHILD span whose parent lives in a
    * DIFFERENT service, emit the reference's two relationship rows
    * (ServiceMapStatefulProcessor.java:236-259 +
    * ServiceMapRelationship.newDestination/TargetRelationship) — a
    * `destination` row from the parent's service pointing at
    * (domain = child service, resource = child span name) and a `target`
    * row anchoring the child service to that endpoint — both carrying the
    * trace's group name, DEDUPLICATED (the reference's relationshipState
    * hash set ≡ distinct).
    *
    * Input = the [[graft.sources.OtelJson]] span shape (traceId, spanId,
    * parentSpanId, serviceName, name, kind). Scale shape: ONE keyed
    * equi-join on parentSpanId=spanId (the reference needs a 3-window
    * stateful processor + peer forwarder only because it streams row by
    * row), one roots aggregate (min_by per traceId, like
    * [[traceGroupFill]]), distinct on the tiny relationship set. */
  def serviceMapRelationships(spans: DataFrame): DataFrame = {
    val parents = spans.select(col("spanId").as("_pid"),
      col("serviceName").as("_pservice"), col("kind").as("_pkind"))
    val roots = spans
      .filter(col("parentSpanId").isNull || col("parentSpanId") === "")
      .groupBy(col("traceId")).agg(min(col("name")).as("_tg"))
    val joined = spans
      .filter(col("parentSpanId").isNotNull && col("parentSpanId") =!= "")
      .join(parents, col("parentSpanId") === col("_pid"))
      .filter(col("_pservice") =!= col("serviceName"))
      .join(roots, Seq("traceId"), "left")
    val ns = lit(null).cast("string")
    val dest = joined.select(
      col("_pservice").as("serviceName"), col("_pkind").as("kind"),
      col("serviceName").as("destinationDomain"), col("name").as("destinationResource"),
      ns.as("targetDomain"), ns.as("targetResource"),
      col("_tg").as("traceGroupName"), lit("destination").as("relType"))
    val target = joined.select(
      col("serviceName"), col("kind"),
      ns.as("destinationDomain"), ns.as("destinationResource"),
      col("serviceName").as("targetDomain"), col("name").as("targetResource"),
      col("_tg").as("traceGroupName"), lit("target").as("relType"))
    dest.unionByName(target).distinct()
  }
}
