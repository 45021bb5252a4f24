package graft.sinks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.PipelineYaml

/** pipelines.yaml → terminal encode-family sinks end to end: a reference
  * user's sink block drives the engine's payload builders with the
  * reference's own option names and ${} destination templates. */
class SinkCompilerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def input = Seq(
    (1L, 10L, "app", "m1"), (2L, 20L, "app", "m2"),
    (3L, 30L, "db", "m3"), (4L, 40L, "app", "m4"))
    .toDF("event_id", "ts", "svc", "msg")

  test("yaml cloudwatch_logs sink → PutLogEvents payloads, templated stream") {
    val yaml =
      """logs-pipeline:
        |  source:
        |    in_memory:
        |      testing_key: events
        |  sink:
        |    - cloudwatch_logs:
        |        log_group: "/graft/app"
        |        log_stream: "s-${svc}"
        |        batch_size: 2
        |""".stripMargin
    val outs = PipelineYaml.compile(spark, yaml, Map("events" -> input))
    assert(outs.map(_.plugin.name) == Seq("cloudwatch_logs"))
    val p = SinkCompiler.compile(outs.head)
      .orderBy("log_stream", "batch_idx").collect()
    // app stream: 3 events, batch_size 2 → batches of 2 and 1; db: 1
    assert(p.map(r => (r.getAs[String]("log_stream"),
      r.getAs[Long]("batch_idx"), r.getAs[Long]("n_events"))).toSeq ==
      Seq(("s-app", 1L, 2L), ("s-app", 2L, 1L), ("s-db", 1L, 1L)))
    // the event payload is the full row's JSON (reference toJsonString) —
    // escaped inside the PutLogEvents message string
    assert(p.head.getAs[String]("payload").contains("\\\"msg\\\":\\\"m1\\\""))
  }

  test("yaml sqs sink → SendMessageBatch payloads, templated queue_url") {
    val yaml =
      """q-pipeline:
        |  source:
        |    in_memory:
        |      testing_key: events
        |  sink:
        |    - sqs:
        |        queue_url: "https://sqs/q-${svc}"
        |        max_events_per_message: 2
        |""".stripMargin
    val outs = PipelineYaml.compile(spark, yaml, Map("events" -> input))
    val p = SinkCompiler.compile(outs.head)
      .orderBy("queue_url", "request_idx").collect()
    assert(p.map(r => (r.getAs[String]("queue_url"),
      r.getAs[Long]("n_messages"))).toSeq ==
      Seq(("https://sqs/q-app", 2L), ("https://sqs/q-db", 1L)))
  }

  test("stdout returns the routed frame; unknown sink fails loudly") {
    val yaml =
      """p:
        |  source:
        |    in_memory:
        |      testing_key: events
        |  sink:
        |    - stdout:
        |""".stripMargin
    val outs = PipelineYaml.compile(spark, yaml, Map("events" -> input))
    assert(SinkCompiler.compile(outs.head).count() == 4)
    val bad = outs.head.copy(plugin = outs.head.plugin.copy(name = "personalize"))
    val ex = intercept[IllegalArgumentException](SinkCompiler.compile(bad))
    assert(ex.getMessage.contains("unsupported terminal sink"))
  }

  test("yaml sns sink → PublishBatch payloads with FIFO field resolution") {
    val yaml =
      """p:
        |  source:
        |    in_memory:
        |      testing_key: events
        |  sink:
        |    - sns:
        |        topic_arn: "arn:aws:sns:us-east-1:1:t.fifo"
        |        batch_size: 3
        |        message_group_id: svc
        |""".stripMargin
    val outs = PipelineYaml.compile(spark, yaml, Map("events" -> input))
    val a = SinkCompiler.compile(outs.head)
      .orderBy("request_idx").collect()
    assert(a.map(r => (r.getAs[Long]("request_idx"),
      r.getAs[Long]("n_entries"))).toSeq == Seq((1L, 3L), (2L, 1L)))
    assert(a.head.getAs[String]("payload").contains("\"MessageGroupId\":\"app\""))
  }

  test("yaml http sink → sharded request payloads under event_count") {
    val yaml =
      """p:
        |  source:
        |    in_memory:
        |      testing_key: events
        |  sink:
        |    - http:
        |        url: "https://collector.example/ingest"
        |        event_count: 2
        |        workers: 1
        |""".stripMargin
    val outs = PipelineYaml.compile(spark, yaml, Map("events" -> input))
    val p = SinkCompiler.compile(outs.head)
      .orderBy("shard", "request_idx").collect()
    assert(p.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 2L))
    assert(p.head.getAs[String]("payload").split("\n").length == 2)
  }

  test("yaml kafka sink → produce write schema with templated partition key") {
    val yaml =
      """p:
        |  source:
        |    in_memory:
        |      testing_key: events
        |  sink:
        |    - kafka:
        |        topic: logs
        |        partition_key: "k-${svc}"
        |        partition_count: 4
        |""".stripMargin
    val outs = PipelineYaml.compile(spark, yaml, Map("events" -> input))
    val w = SinkCompiler.compile(outs.head).collect()
    assert(w.forall(_.getAs[String]("topic") == "logs"))
    val k = w.map(r => new String(r.getAs[Array[Byte]]("key"))).toSet
    assert(k == Set("k-app", "k-db"))
    w.foreach { r =>
      val key = new String(r.getAs[Array[Byte]]("key"))
      assert(r.getAs[Int]("partition") ==
        (graft.sources.Queues.murmur2(key.getBytes) & 0x7fffffff) % 4)
      assert(new String(r.getAs[Array[Byte]]("value")).contains("\"svc\""))
    }
  }

  test("missing required destination option fails with the option named") {
    val yaml =
      """p:
        |  source:
        |    in_memory:
        |      testing_key: events
        |  sink:
        |    - cloudwatch_logs:
        |        batch_size: 2
        |""".stripMargin
    val outs = PipelineYaml.compile(spark, yaml, Map("events" -> input))
    val ex = intercept[IllegalArgumentException](SinkCompiler.compile(outs.head))
    assert(ex.getMessage.contains("log_group"))
  }
}
