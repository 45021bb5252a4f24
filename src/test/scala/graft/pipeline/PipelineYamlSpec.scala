package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** YAML pipeline compiler vs the reference's pipeline model
  * (data-prepper-pipeline-parser; valid_multiple_sinks_with_routes.yml,
  * examples/config/example-pipelines.yaml shapes). */
class PipelineYamlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("routes fan out to connected pipelines (reference multi-sink shape)") {
    val yaml =
      """entry-pipeline:
        |  source:
        |    in_memory:
        |      testing_key: events
        |  route:
        |    - "raw" : '/value == "raw"'
        |    - "service" : '/value == "service"'
        |  sink:
        |    - pipeline:
        |        name: "raw-pipeline"
        |        routes:
        |          - raw
        |    - pipeline:
        |        name: "service-map-pipeline"
        |        routes:
        |          - service
        |raw-pipeline:
        |  source:
        |    pipeline:
        |      name: "entry-pipeline"
        |  processor:
        |    - string_converter:
        |        source: value
        |        upper_case: true
        |  sink:
        |    - stdout:
        |service-map-pipeline:
        |  source:
        |    pipeline:
        |      name: "entry-pipeline"
        |  sink:
        |    - stdout:
        |""".stripMargin
    val input = Seq("raw", "raw", "service", "other").toDF("value")
    val outs = PipelineYaml.compile(spark, yaml, Map("events" -> input))
    assert(outs.map(_.pipeline).sorted == Seq("raw-pipeline", "service-map-pipeline"))
    val raw = outs.find(_.pipeline == "raw-pipeline").get.df
      .as[String].collect().toSeq
    assert(raw == Seq("RAW", "RAW")) // routed + uppercased
    val svc = outs.find(_.pipeline == "service-map-pipeline").get.df
      .as[String].collect().toSeq
    assert(svc == Seq("service")) // routed, untouched; "other" matched no route
  }

  test("sink with no routes receives all events; sink routes filter") {
    val yaml =
      """p:
        |  source:
        |    in_memory:
        |  route:
        |    - errors: '/status >= 400'
        |  sink:
        |    - stdout:
        |    - file:
        |        path: /tmp/unused
        |        routes: [errors]
        |""".stripMargin
    val input = Seq(200, 404, 500).toDF("status")
    val outs = PipelineYaml.compile(spark, yaml, Map("p" -> input))
    assert(outs.find(_.plugin.name == "stdout").get.df.count() == 3)
    assert(outs.find(_.plugin.name == "file").get.df
      .as[Int].collect().toSeq == Seq(404, 500))
  }

  test("grok + date + convert_entry_type log pipeline end-to-end") {
    val yaml =
      """log-pipeline:
        |  source:
        |    log_generator:
        |      lines: 50
        |  processor:
        |    - grok:
        |        match:
        |          message: [ "%{COMMONAPACHELOG}" ]
        |    - date:
        |        match:
        |          - key: timestamp
        |            patterns: ["dd/MMM/yyyy:HH:mm:ss Z"]
        |        destination: "@timestamp"
        |    - convert_entry_type:
        |        key: response
        |        type: integer
        |    - drop_events:
        |        drop_when: '/response < 400'
        |  sink:
        |    - stdout:
        |""".stripMargin
    val out = PipelineYaml.compile(spark, yaml).head.df
    val rows = out.select("clientip", "verb", "response", "@timestamp").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(2) >= 400))
    assert(rows.forall(!_.isNullAt(3)))
    assert(rows.forall(_.getString(0).matches("\\d+\\.\\d+\\.\\d+\\.\\d+")))
  }

  test("parse_json + add_entries format/expression + mutate chain") {
    val yaml =
      """p:
        |  source:
        |    in_memory:
        |  processor:
        |    - parse_json:
        |        source: props
        |        schema: "k BIGINT"
        |    - add_entries:
        |        entries:
        |          - key: label
        |            format: "${kind}-${parsed/k}"
        |          - key: doubled
        |            value_expression: "/v * 2"
        |          - key: fixed
        |            value: 7
        |    - flatten:
        |        source: parsed
        |    - rename_keys:
        |        entries:
        |          - from_key: kind
        |            to_key: category
        |    - delete_entries:
        |        with_keys: [props]
        |  sink:
        |    - stdout:
        |""".stripMargin
    val input = Seq(("a", 1.5, """{"k": 10}"""), ("b", 2.0, """{"k": 20}"""))
      .toDF("kind", "v", "props")
    val out = PipelineYaml.compile(spark, yaml, Map("p" -> input)).head.df
    assert(out.columns.toSet ==
      Set("category", "v", "parsed/k", "label", "doubled", "fixed"))
    val r = out.orderBy("category").collect()
    assert(r.map(_.getAs[String]("label")).toSeq == Seq("a-10", "b-20"))
    assert(r.map(_.getAs[Double]("doubled")).toSeq == Seq(3.0, 4.0))
    assert(r.map(_.getAs[Int]("fixed")).toSeq == Seq(7, 7))
  }

  test("cycle and undefined-reference diagnostics") {
    val cyclic =
      """a:
        |  source:
        |    pipeline:
        |      name: b
        |  sink:
        |    - pipeline:
        |        name: b
        |b:
        |  source:
        |    pipeline:
        |      name: a
        |  sink:
        |    - pipeline:
        |        name: a
        |""".stripMargin
    val e1 = intercept[IllegalArgumentException](
      PipelineYaml.compile(spark, cyclic))
    assert(e1.getMessage.contains("cycle"))

    val badRoute =
      """p:
        |  source:
        |    in_memory:
        |  sink:
        |    - stdout:
        |        routes: [nope]
        |""".stripMargin
    val e2 = intercept[IllegalArgumentException](
      PipelineYaml.compile(spark, badRoute,
        Map("p" -> Seq(1).toDF("x"))))
    assert(e2.getMessage.contains("undefined route"))
  }

  test("aggregate actions through YAML: count window, remove_duplicates, rate_limiter") {
    val input = Seq(
      ("a", "2024-01-01 00:00:01", 1), ("a", "2024-01-01 00:00:02", 2),
      ("a", "2024-01-01 00:04:00", 3), ("b", "2024-01-01 00:00:05", 4))
      .toDF("svc", "ts0", "n").withColumn("ts", to_timestamp($"ts0")).drop("ts0")

    def oneOut(yaml: String) =
      PipelineYaml.compile(spark, yaml, Map("p" -> input)).head.df

    val counts = oneOut(
      """p:
        |  source:
        |    in_memory:
        |  processor:
        |    - aggregate:
        |        identification_keys: [svc]
        |        group_duration: 60s
        |        time_key: ts
        |        action:
        |          count:
        |  sink:
        |    - stdout:
        |""".stripMargin)
    // ("a" first minute: 2), ("a" fifth minute: 1), ("b": 1)
    assert(counts.select("svc", "value").orderBy("svc", "value")
      .as[(String, Long)].collect().toSeq == Seq(("a", 1L), ("a", 2L), ("b", 1L)))

    val dedup = oneOut(
      """p:
        |  source:
        |    in_memory:
        |  processor:
        |    - aggregate:
        |        identification_keys: [svc]
        |        order_key: ts
        |        action:
        |          remove_duplicates:
        |  sink:
        |    - stdout:
        |""".stripMargin)
    assert(dedup.select("svc", "n").orderBy("svc")
      .as[(String, Int)].collect().toSeq == Seq(("a", 1), ("b", 4)))

    val limited = oneOut(
      """p:
        |  source:
        |    in_memory:
        |  processor:
        |    - aggregate:
        |        identification_keys: [svc]
        |        time_key: ts
        |        action:
        |          rate_limiter:
        |            events_per_second: 1
        |            when_exceeds: drop
        |  sink:
        |    - stdout:
        |""".stripMargin)
    // a@00:01 and a@00:02 are distinct seconds — all four pass; tighten by
    // duplicating a timestamp
    assert(limited.count() == 4)
    val clash = input.union(input.filter($"n" === 1))
    assert(PipelineYaml.compile(spark,
      """p:
        |  source:
        |    in_memory:
        |  processor:
        |    - aggregate:
        |        identification_keys: [svc]
        |        time_key: ts
        |        action:
        |          rate_limiter:
        |            events_per_second: 1
        |            when_exceeds: drop
        |  sink:
        |    - stdout:
        |""".stripMargin, Map("p" -> clash)).head.df.count() == 4)

    // count with LIST-valued unique_keys (the reference config type,
    // CountAggregateActionConfig List<String>): distinct over the tuple
    val distinctTuple = oneOut(
      """p:
        |  source:
        |    in_memory:
        |  processor:
        |    - aggregate:
        |        identification_keys: [svc]
        |        action:
        |          count:
        |            unique_keys: [ts, n]
        |  sink:
        |    - stdout:
        |""".stripMargin)
    assert(distinctTuple.select("svc", "value").orderBy("svc")
      .as[(String, Long)].collect().toSeq == Seq(("a", 3L), ("b", 1L)))
    // scalar unique_keys still accepted
    val distinctScalar = oneOut(
      """p:
        |  source:
        |    in_memory:
        |  processor:
        |    - aggregate:
        |        identification_keys: [svc]
        |        action:
        |          count:
        |            unique_keys: svc
        |  sink:
        |    - stdout:
        |""".stripMargin)
    assert(distinctScalar.select("svc", "value").orderBy("svc")
      .as[(String, Long)].collect().toSeq == Seq(("a", 1L), ("b", 1L)))
  }

  test("geoip ranges + anomaly_detector z-score through YAML") {
    // enough normal points that |z| of the outlier clears the threshold
    // (population-std z is bounded by (n-1)/sqrt(n) — 3 points cap at 1.15)
    val input = Seq(
      ("10.1.2.3", 1.0), ("10.9.9.9", 1.2), ("10.3.3.3", 1.1),
      ("10.4.4.4", 0.9), ("10.5.5.5", 1.0), ("8.8.8.8", 1.1),
      ("10.1.2.4", 50.0))
      .toDF("ip", "latency")
    val yaml =
      """p:
        |  source:
        |    in_memory:
        |  processor:
        |    - geoip:
        |        entries:
        |          - source: ip
        |            target: geo
        |        ranges:
        |          "10.0.0.0/8": private-a
        |          "8.8.8.0/24": google-dns
        |    - anomaly_detector:
        |        keys: [latency]
        |        identification_keys: [geo]
        |        mode:
        |          z_score:
        |            threshold: 1.5
        |  sink:
        |    - stdout:
        |""".stripMargin
    val out = PipelineYaml.compile(spark, yaml, Map("p" -> input)).head.df
    val rows = out.select("ip", "geo", "grade").collect()
    assert(rows.find(_.getString(0) == "8.8.8.8").get.getString(1) == "google-dns")
    assert(rows.count(_.getString(1) == "private-a") == 6)
    // only the 50.0 latency within the private-a group is anomalous
    assert(rows.filter(_.getDouble(2) == 1.0).map(_.getString(0)).toSeq == Seq("10.1.2.4"))
  }

  test("run() writes file sinks and opensearch index parquet") {
    val dir = TestSpark.tmpDir("pyaml")
    val yaml =
      s"""p:
         |  source:
         |    in_memory:
         |  sink:
         |    - file:
         |        path: $dir/out
         |        format: parquet
         |    - opensearch:
         |        index: logs
         |""".stripMargin
    val input = Seq((1, "x"), (2, "y")).toDF("id", "s")
    PipelineYaml.run(spark, yaml, Map("p" -> input), outDir = Some(s"$dir/os"))
    assert(spark.read.parquet(s"$dir/out").count() == 2)
    assert(spark.read.parquet(s"$dir/os/logs").count() == 2)
  }

  test("opensearch sink resolves per-event bulk actions from YAML") {
    val dir = TestSpark.tmpDir("pyaml-act")
    val yaml =
      s"""p:
         |  source:
         |    in_memory:
         |  sink:
         |    - opensearch:
         |        index: logs
         |        action: index
         |        actions:
         |          - type: delete
         |            when: '/s == "drop"'
         |          - type: upsert
         |            when: '/s == "merge"'
         |""".stripMargin
    val input = Seq((1, "drop"), (2, "merge"), (3, "keep")).toDF("id", "s")
    PipelineYaml.run(spark, yaml, Map("p" -> input), outDir = Some(dir))
    val out = spark.read.parquet(s"$dir/logs")
      .select("id", "_action").as[(Int, String)].collect().toMap
    assert(out(1) == "delete")
    assert(out(2) == "upsert")
    // nothing matched and the last rule has a condition -> reference
    // semantics leave the LAST rule's type in eventAction
    assert(out(3) == "upsert")
  }

  test("dynamodb source compiles config to the CDC decode over the consumer seam") {
    val yaml =
      """cdc:
        |  source:
        |    dynamodb:
        |      tables:
        |        - table_arn: "arn:aws:dynamodb:us-east-1:1:table/orders"
        |          partition_key: pk
        |          sort_key: sk
        |          stream:
        |            view_on_remove: OLD_IMAGE
        |  sink:
        |    - stdout:
        |""".stripMargin
    val rec =
      """{"eventName":"REMOVE","dynamodb":{"ApproximateCreationDateTime":9,
        |"NewImage":{"a":{"S":"new"}},"OldImage":{"a":{"S":"old"}},
        |"Keys":{"pk":{"S":"p1"},"sk":{"N":"3"}},"SequenceNumber":"5"}}"""
        .stripMargin.replace("\n", "")
    val out = PipelineYaml.compile(spark, yaml, Map("cdc" -> Seq(rec).toDF("r")))
      .head.df.collect()(0)
    assert(out.getAs[String]("table_name") == "orders")
    assert(out.getAs[String]("data") == """{"a":"old"}""") // view_on_remove honored
    assert(out.getAs[String]("primary_key") == "p1|3")
    assert(out.getAs[String]("opensearch_action") == "delete")
    // missing seam input is loud
    val e = intercept[IllegalArgumentException](
      PipelineYaml.compile(spark, yaml))
    assert(e.getMessage.contains("consumer seam"))
  }

  test("documentdb source compiles config to the change-stream decode") {
    val yaml =
      """cdc:
        |  source:
        |    documentdb:
        |      collections:
        |        - collection: "app.users"
        |  sink:
        |    - stdout:
        |""".stripMargin
    val ev =
      """{"operationType":"insert","clusterTime":{"$timestamp":{"t":7,"i":1}},
        |"ns":{"db":"d","coll":"c"},"documentKey":{"_id":{"$numberInt":"4"}},
        |"fullDocument":{"_id":{"$numberInt":"4"},"v":"x"}}"""
        .stripMargin.replace("\n", "")
    val out = PipelineYaml.compile(spark, yaml, Map("cdc" -> Seq(ev).toDF("r")))
      .head.df.collect()(0)
    assert(out.getAs[String]("documentdb_collection") == "app.users")
    assert(out.getAs[String]("data") == """{"_id":4,"v":"x"}""")
    assert(out.getAs[String]("opensearch_action") == "index")
  }
}
