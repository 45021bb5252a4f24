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
}
