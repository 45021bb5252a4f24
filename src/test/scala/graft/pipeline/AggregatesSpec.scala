package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AggregatesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  private lazy val events = Seq(
    (1L, 10L, "view", 1.0, ts(0)),
    (2L, 10L, "click", 2.0, ts(10)),
    (3L, 10L, "error", 3.0, ts(20)),
    (4L, 20L, "view", 4.0, ts(5)),
    (5L, 20L, "view", 5.0, ts(4000)), // separate session for user 20
    (6L, 30L, "view", 6.0, ts(8))
  ).toDF("event_id", "user_id", "event_type", "value", "ts")

  test("count action: per-key tumbling window counts") {
    val out = Aggregates.countAction(events, Seq("user_id"), "ts", "1 hour")
    val m = out.select("user_id", "value").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(m == Map(10L -> 3L, 20L -> 2L, 30L -> 1L))
  }

  test("count distinct action") {
    val out = Aggregates.countDistinctAction(events, Seq("event_type"), "user_id")
    val m = out.as[(String, Long)].collect().toMap
    assert(m("view") == 3 && m("click") == 1 && m("error") == 1)
  }

  test("count distinct action over a multi-key tuple") {
    // view: (10,1),(20,4),(20,5),(30,6) -> distinct (user_id,event_id) = 4
    val out = Aggregates.countDistinctAction(events, Seq("event_type"),
      Seq("user_id", "event_id"), approx = false)
    val m = out.as[(String, Long)].collect().toMap
    assert(m("view") == 4 && m("click") == 1 && m("error") == 1)
    // distinct user_id alone within view = 3 (dup rows for user 20 collapse)
    val one = Aggregates.countDistinctAction(events, Seq("event_type"),
      Seq("user_id"), approx = false)
    assert(one.as[(String, Long)].collect().toMap.apply("view") == 3)
  }

  test("histogram action buckets with open ends") {
    val out = Aggregates.histogramAction(events, Seq.empty, "value", Seq(2.0, 5.0))
    val m = out.select("bucket", "count").as[(Int, Long)].collect().toMap
    assert(m == Map(0 -> 1L, 1 -> 3L, 2 -> 2L)) // <2: {1}; [2,5): {2,3,4}; >=5: {5,6}
  }

  test("put_all keeps last writer by order") {
    val out = Aggregates.putAllAction(events, Seq("user_id"), "event_id",
      Seq("event_type", "value"))
    val m = out.select("user_id", "event_type").as[(Long, String)].collect().toMap
    assert(m(10L) == "error" && m(20L) == "view")
  }

  test("append collects in event order") {
    val out = Aggregates.appendAction(events, Seq("user_id"), "event_id", Seq("event_type"))
    val m = out.select($"user_id", concat_ws(",", $"event_type"))
      .as[(Long, String)].collect().toMap
    assert(m(10L) == "view,click,error")
  }

  test("remove_duplicates keeps first per key by order") {
    val out = Aggregates.removeDuplicates(events, Seq("user_id", "event_type"), "event_id")
    assert(out.count() == 5) // user 20 has two views → one dropped
    assert(out.where($"user_id" === 20).select("event_id").as[Long].collect().toSeq == Seq(4L))
  }

  test("percent sampler admits the closed-form running ratio") {
    val d = (1 to 100).map(i => (i.toLong, 1L)).toDF("event_id", "user_id")
    val out = Aggregates.percentSampler(d, Seq("user_id"), "event_id", 30.0)
    assert(out.count() == 30)
  }

  test("rate limiter caps events per key-second") {
    val burst = (1 to 10).map(i => (i.toLong, 1L, ts(0))).toDF("event_id", "user_id", "ts")
    val out = Aggregates.rateLimiterDrop(burst, Seq("user_id"), "ts", 2)
    assert(out.count() == 2)
  }

  test("tail sampler emits whole sessions containing a match") {
    val out = Aggregates.tailSampler(events, Seq("user_id"), "ts", "3600",
      $"event_type" === "error", percent = 0.0)
    val kept = out.select("event_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L)) // user 10's whole session; others have no error
  }
}

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("micro-batch corpus ingest produces the same tf as batch") {
    val work = graft.TestSpark.tmpDir("graft-stream")
    val pages = graft.corpus.SyntheticCorpus.generate(spark, 120, seed = 3L, partitions = 6)
    pages.write.parquet(s"$work/pages")
    graft.streaming.Streaming.tfDeltaStream(spark, s"$work/pages",
      s"$work/tf", s"$work/ckpt", maxFilesPerTrigger = 2)
    val streamed = spark.read.parquet(s"$work/tf")
      .select("url", "term", "tf").as[(String, String, Long)].collect().sorted
    val batch = graft.analyze.Analyzer
      .termFreqs(pages.toDF(), "url", "text")
      .select($"url", $"term", $"tf").as[(String, String, Long)].collect().sorted
    assert(streamed.sameElements(batch))
  }

  test("streaming micro-batches append index generations; queries match full rebuild") {
    val work = graft.TestSpark.tmpDir("graft-stream-idx")
    val params = graft.index.IndexParams(
      buckets = 4, shardSize = 64, blockSize = 16, buildPartitions = 2)
    val pages = graft.corpus.SyntheticCorpus.generate(spark, 90, seed = 5L, partitions = 3)
    pages.write.parquet(s"$work/pages")
    graft.streaming.Streaming.indexAppendStream(spark, s"$work/pages",
      s"$work/inc", s"$work/ckpt", params, maxFilesPerTrigger = 1)
    val gens = graft.index.IncrementalIndex.genDirs(spark, s"$work/inc")
    assert(gens.size > 1, s"expected multiple generations, got $gens")
    new graft.index.IndexBuilder(spark, s"$work/full", params)
      .build(pages, "full")
    val inc = new graft.query.IndexReader(spark, s"$work/inc")
    val full = new graft.query.IndexReader(spark, s"$work/full")
    assert(inc.globals == full.globals)
    val queries = graft.corpus.SyntheticCorpus.querySet().take(8)
    val ic = inc.loadCache(queries.flatten.distinct)
    val fc = full.loadCache(queries.flatten.distinct)
    queries.foreach { q =>
      val (a, b) = (inc.topKLocal(ic, q, 10), full.topKLocal(fc, q, 10))
      assert(a.map(_.score).sameElements(b.map(_.score)), s"scores differ for $q")
    }
  }

  test("streaming dedup collapses duplicate keys across micro-batches") {
    val work = graft.TestSpark.tmpDir("graft-sdedup")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(("k1", ts("2024-01-01 00:00:01")), ("k2", ts("2024-01-01 00:00:02")))
      .toDF("k", "ts").coalesce(1).write.mode("append").parquet(s"$work/in")
    Seq(("k1", ts("2024-01-01 00:00:03")), ("k3", ts("2024-01-01 00:00:04")))
      .toDF("k", "ts").coalesce(1).write.mode("append").parquet(s"$work/in")
    val stream = spark.readStream.schema("k STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).parquet(s"$work/in")
    val q = graft.streaming.Streaming.dedupStream(stream, "ts", Seq("k"), "10 minutes")
      .writeStream.format("memory").queryName("sdedup_out")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sdedup_out").select("k").as[String].collect().sorted
    assert(got.toSeq == Seq("k1", "k2", "k3"), s"got ${got.toSeq}")
  }

  test("streaming OTLP-binary log ingest decodes identically to batch") {
    // the push-source parity claim extended to the wire codecs: binary
    // ExportLogsServiceRequest payloads arriving in micro-batches decode
    // through the SAME projection as batch (logsFromProto is stateless, so
    // streaming support is free — this pins it)
    import graft.sources.OtlpProto._
    val work = graft.TestSpark.tmpDir("graft-sotlp")
    def payload(i: Long): Array[Byte] = encodeLogsRequest(LLogsRequest(Seq(
      LResourceLogs(Some(PResource(Seq(PKV("service.name",
        PAny(Some(s"svc-${i % 2}"), None, None, None))))),
        Seq(LScopeLogs(Some(PScope(Some("graft"), None)),
          Seq(LLogRecord(Some((1700000000000000000L + i).toString), None,
            Some(9), Some("INFO"),
            Some(PAny(Some(s"m$i"), None, None, None)),
            Nil, None, None, None, None))))))))
    Seq(Tuple1(payload(0)), Tuple1(payload(1))).toDF("otlp")
      .coalesce(1).write.mode("append").parquet(s"$work/in")
    Seq(Tuple1(payload(2)), Tuple1(payload(3))).toDF("otlp")
      .coalesce(1).write.mode("append").parquet(s"$work/in")
    val stream = spark.readStream.schema("otlp BINARY")
      .option("maxFilesPerTrigger", 1).parquet(s"$work/in")
    val q = graft.sources.OtelLogs.logsFromProto(stream, "otlp")
      .select("timeUnixNano", "serviceName", "severityText", "body")
      .writeStream.format("memory").queryName("sotlp_out")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sotlp_out").collect().map(_.toSeq).toSet
    val batch = graft.sources.OtelLogs.logsFromProto(
        (0L until 4L).map(i => Tuple1(payload(i))).toDF("otlp"), "otlp")
      .select("timeUnixNano", "serviceName", "severityText", "body")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.size == 4)
  }

  test("sessionize via flatMapGroupsWithState (batch-mode state fn)") {
    val ts0 = 1700000000000L
    val d = Seq(
      (1L, new java.sql.Timestamp(ts0), false),
      (1L, new java.sql.Timestamp(ts0 + 1000), true),
      (1L, new java.sql.Timestamp(ts0 + 100000), false), // new session
      (2L, new java.sql.Timestamp(ts0), false)
    ).toDF("user_id", "ts", "is_err")
    val out = graft.streaming.Streaming.sessionize(spark, d, "user_id", "ts",
      "is_err", gapMs = 10000)
    val rows = out.select("key", "nEvents", "anyMatch")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(rows == Set((1L, 2L, true), (1L, 1L, false), (2L, 1L, false)))
  }

  test("batch sessionize: gap splits, 1-based per-key indices, durations") {
    val ts0 = 1700000000L
    def t(s: Long) = new java.sql.Timestamp((ts0 + s) * 1000L)
    val d = Seq(
      (1L, t(0)), (1L, t(30)), (1L, t(50)),   // session 1: 3 events, 50 s
      (1L, t(200)),                           // gap 150 > 60 → session 2
      (2L, t(0)), (2L, t(400))                // two singleton sessions
    ).toDF("user_id", "ts")
    val out = Aggregates.sessionize(d, Seq("user_id"), "ts", "60s")
      .orderBy("user_id", "session_idx").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"),
        r.getAs[Long]("n_events"), r.getAs[Long]("duration_s"),
        r.getAs[Long]("session_start")))
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 50L, ts0), (1L, 2L, 1L, 0L, ts0 + 200),
      (2L, 1L, 1L, 0L, ts0), (2L, 2L, 1L, 0L, ts0 + 400)))
    // the windows and the aggregate share one exchange on the key
    val plan = Aggregates.sessionize(d, Seq("user_id"), "ts", "60s")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 2, plan)
  }
}
