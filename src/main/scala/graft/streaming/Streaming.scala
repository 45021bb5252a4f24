package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.analyze.Analyzer

/** Structured-Streaming parity (SURVEY.md §1.3, §2.6).
  *
  * The reference is a streaming ETL server: bounded-blocking buffers feed
  * worker threads (BlockingBuffer.java:159-181), and its `aggregate`
  * processor windows on wall clock per group. The Spark-native form is
  * micro-batch Structured Streaming: `maxFilesPerTrigger` is the buffer
  * capacity, triggers are the worker cadence, watermarks give the event-
  * time semantics the reference lacks, and `flatMapGroupsWithState`
  * replaces its hand-rolled per-group state maps (AggregateGroupManager).
  */
object Streaming {

  /** Micro-batch ingest of corpus files → extracted + tokenized tf deltas.
    * `Trigger.AvailableNow` = bounded catch-up run (the reference's
    * iceberg-source "consume the snapshot then stop" mode); a continuous
    * deployment uses ProcessingTime + the same query. */
  def tfDeltaStream(spark: SparkSession, pagesDir: String, outDir: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 4): Unit = {
    val schema = "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"
    val pages = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(pagesDir)
    val extractUdf = udf((html: Array[Byte]) => graft.extract.HtmlText.extract(html))
    val tf = pages
      .withColumn("text", extractUdf(col("html")))
      .select(col("url"), explode(Analyzer.tokensCol(col("text"))).as("term"))
      .groupBy(col("url"), col("term")).agg(count(lit(1)).as("tf"))
    val q = tf.writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName("tf_delta") // sandbox sink; parquet in prod
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("tf_delta").write.mode("overwrite").parquet(outDir)
  }

  /** Continuous index maintenance: each micro-batch of pages becomes one
    * committed index generation ([[graft.index.IncrementalIndex.append]]),
    * queryable the moment its globals.json lands — the engine's analog of
    * the reference's opensearch-sink bulk indexing loop (docs stream in,
    * the index stays live). `Trigger.AvailableNow` here = bounded
    * catch-up; a continuous deployment uses ProcessingTime and the same
    * foreachBatch. Exactly-once across restarts: the checkpoint replays a
    * failed batch and append re-enters the half-built generation instead
    * of skipping or duplicating it (IncrementalSpec).
    *
    * Generation count is BOUNDED: after each appended batch, more than
    * `maxGenerations` visible generations auto-triggers the in-place LSM
    * compaction ([[graft.index.IncrementalIndex.maybeCompact]]) — each
    * generation adds one postings scan + one metadata row per query term,
    * so an unbounded stream would otherwise grow every query's plan
    * linearly forever. */
  def indexAppendStream(spark: SparkSession, pagesDir: String,
      indexDir: String, checkpointDir: String,
      params: graft.index.IndexParams,
      maxFilesPerTrigger: Int = 4,
      maxGenerations: Int = 8): Unit = {
    import spark.implicits._
    val schema = "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"
    val pages = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(pagesDir)
    val q = pages.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.index.IncrementalIndex.append(spark, indexDir,
          batch.as[graft.corpus.Page], params, s"microbatch-$id")
        graft.index.IncrementalIndex.maybeCompact(spark, indexDir, params,
          maxGenerations): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Reference iceberg-source parity ("consume the snapshot then stop",
    * data-prepper-plugins/iceberg-source): consume an Iceberg PAGES table
    * into index generations — each unconsumed snapshot's APPENDED files
    * become one generation, in snapshot order. The consumption cursor is
    * NOT a separate file: consumed snapshot ids are derived from
    * committed generations' docs manifests (`iceberg-snap-<id>` tokens),
    * so a kill between generation commit and any cursor write cannot
    * double-ingest, and in-place compaction carries the tokens forward.
    * Returns the snapshot ids ingested this call (empty = caught up). */
  def indexAppendFromIceberg(spark: SparkSession, tableDir: String,
      indexDir: String, params: graft.index.IndexParams,
      maxGenerations: Int = 8): Seq[Long] = {
    import spark.implicits._
    val SnapTok = "iceberg-snap-(\\d+)".r
    val consumed: Set[Long] = graft.index.IncrementalIndex
      .genDirs(spark, indexDir)
      .filter(_._2 != indexDir)
      .flatMap { case (_, d) =>
        graft.index.Manifest.read(d, "docs").toSeq.flatMap(_.inputs)
          .flatMap(in => SnapTok.findAllMatchIn(in).map(_.group(1).toLong))
      }.toSet
    val meta = graft.sources.Iceberg.readMeta(spark, tableDir)
    val todo = meta.snapshots.map(_.id).filterNot(consumed).sorted
    todo.foreach { sid =>
      val rows = graft.sources.Iceberg.readAdded(spark, tableDir, sid)
      graft.index.IncrementalIndex.append(spark, indexDir,
        rows.as[graft.corpus.Page], params, s"iceberg-snap-$sid")
      graft.index.IncrementalIndex.maybeCompact(spark, indexDir, params,
        maxGenerations)
    }
    todo
  }

  /** WARC crawl archives → [[graft.corpus.Page]] rows: response records
    * with an HTTP 200 html payload become pages (url = WARC-Target-URI,
    * warc_ts = WARC-Date, html = the HTTP body); `text` is the
    * deterministic extraction the index build re-verifies byte-identical,
    * `lang` the engine's lang-id heuristic. Everything is projections +
    * one explode — one task per archive file. */
  def pagesFromWarc(spark: SparkSession,
      pathGlob: String): Dataset[graft.corpus.Page] = {
    import spark.implicits._
    val extractUdf = udf((html: Array[Byte]) =>
      graft.extract.HtmlText.extract(html))
    val recs = graft.sources.Warc.read(spark, pathGlob)
      .where(col("warc_type") === "response" && col("http_status") === 200 &&
        col("err").isNull &&
        col("http_content_type").startsWith("text/html"))
      .select(col("target_uri").as("url"),
        to_timestamp(col("warc_date"), "yyyy-MM-dd'T'HH:mm:ssX")
          .as("warc_ts"),
        col("payload").as("html"))
      .withColumn("text", extractUdf(col("html")))
    graft.ops.TextAnalysis.langId(recs, "text", out = "lang")
      .select("url", "warc_ts", "html", "text", "lang")
      .as[graft.corpus.Page]
  }

  /** Consume-then-stop ingest from a DIRECTORY OF WARC ARCHIVES — the
    * raw-crawl analog of [[indexAppendFromIceberg]]: each unconsumed
    * archive file becomes one index generation, in file-name order. The
    * cursor is derived from committed generations' docs manifests
    * (`warc-file=<name>` tokens), so a kill between generation commit and
    * any cursor write cannot double-ingest, and in-place compaction
    * carries the tokens forward. Returns the file names ingested this
    * call (empty = caught up). */
  def indexAppendFromWarc(spark: SparkSession, warcDir: String,
      indexDir: String, params: graft.index.IndexParams,
      maxGenerations: Int = 8): Seq[String] = {
    val FileTok = "warc-file=([^;\\s]+)".r
    val consumed: Set[String] = graft.index.IncrementalIndex
      .genDirs(spark, indexDir)
      .filter(_._2 != indexDir)
      .flatMap { case (_, d) =>
        graft.index.Manifest.read(d, "docs").toSeq.flatMap(_.inputs)
          .flatMap(in => FileTok.findAllMatchIn(in).map(_.group(1)))
      }.toSet
    val root = new org.apache.hadoop.fs.Path(warcDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val todo = fs.listStatus(root).toSeq
      .filter(st => st.isFile && (st.getPath.getName.endsWith(".warc") ||
        st.getPath.getName.endsWith(".warc.gz")))
      .map(_.getPath.getName).filterNot(consumed).sorted
    todo.foreach { name =>
      graft.index.IncrementalIndex.append(spark, indexDir,
        pagesFromWarc(spark, s"$warcDir/$name"), params, s"warc-file=$name")
      graft.index.IncrementalIndex.maybeCompact(spark, indexDir, params,
        maxGenerations)
    }
    todo
  }

  /** `aggregate` count action, streaming form: event-time tumbling window
    * + watermark (strictly stronger than the reference's wall-clock
    * group_duration, AggregateProcessorConfig.java:59). */
  def windowedCounts(events: DataFrame, ts: String, keys: Seq[String],
      windowDur: String, watermark: String): DataFrame =
    events
      .withWatermark(ts, watermark)
      .groupBy((keys.map(col) :+ window(col(ts), windowDur)): _*)
      .agg(count(lit(1)).as("value"), sum(col("value")).as("sum_value"))

  /** Streaming exact dedup: drop events whose key was already seen within
    * the watermark horizon — `dropDuplicatesWithinWatermark`, so the seen-
    * set state is BOUNDED by event time (evicted once the watermark
    * passes), unlike a grow-forever `dropDuplicates`. The streaming form
    * of the aggregate `remove_duplicates` action
    * (/root/reference/data-prepper-plugins/aggregate-processor/src/main/
    * java/.../actions/RemoveDuplicatesAggregateAction.java:26,33-35, whose
    * group window plays the same state-bounding role). At 100 TB/day the
    * state is one hash per key within the horizon, shuffled once on the
    * dedup keys. */
  def dedupStream(events: DataFrame, tsCol: String, keyCols: Seq[String],
      delayThreshold: String): DataFrame =
    events.withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Session state for the tail-sampler/service-map family: custom
    * per-key state via flatMapGroupsWithState — the Spark-native
    * replacement for the reference's rotating in-memory window maps
    * (ServiceMapStatefulProcessor.java:150,199-212). Emits one row per
    * closed session: (key, nEvents, anyMatch). */
  final case class SessionAgg(key: Long, nEvents: Long, anyMatch: Boolean)
  final case class SessionState(nEvents: Long, anyMatch: Boolean, lastTsMs: Long)

  def sessionize(spark: SparkSession, events: DataFrame, keyCol: String,
      tsCol: String, matchCol: String, gapMs: Long): DataFrame = {
    import spark.implicits._
    val typed = events.select(col(keyCol).cast("long"),
      col(tsCol).cast("timestamp"), col(matchCol).cast("boolean"))
      .as[(Long, java.sql.Timestamp, Boolean)]
    val out = typed.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Boolean)],
       state: GroupState[SessionState]) => {
        // batch mode: rows arrive complete per key; emit per-gap sessions
        val sorted = rows.toSeq.sortBy(_._2.getTime)
        val sessions = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
        var cur: Option[SessionState] = None
        sorted.foreach { case (_, ts, m) =>
          cur match {
            case Some(s) if ts.getTime - s.lastTsMs <= gapMs =>
              cur = Some(SessionState(s.nEvents + 1, s.anyMatch || m, ts.getTime))
            case Some(s) =>
              sessions += SessionAgg(key, s.nEvents, s.anyMatch)
              cur = Some(SessionState(1, m, ts.getTime))
            case None =>
              cur = Some(SessionState(1, m, ts.getTime))
          }
        }
        cur.foreach(s => sessions += SessionAgg(key, s.nEvents, s.anyMatch))
        sessions.iterator
      })
    out.toDF()
  }
}
