package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.PipelineYaml.PluginDef

/** Logstash `.conf` front-end vs the reference converter
  * (data-prepper-logstash-configuration; fixture shapes mirror its
  * log-ingest-to-opensearch*.conf test resources). */
class LogstashConfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val referenceShapedConf =
    """input {
      |    http {
      |        port => 3000
      |        ssl => true
      |    }
      |}
      |filter {
      |    grok {
      |        match => ["[data][log1]", "%{NUMBER} %{GREEDYDATA:[nested][field][data1]}"]
      |        match => {"[data][log2]" => "%{NUMBER:num:int} %{GREEDYDATA:[nested][field][data2]}"}
      |        overwrite => ["[nested][field][data1]"]
      |        break_on_match => false
      |    }
      |    date {
      |        match => ["[data][timestamp]", "yyyy-MM-dd"]
      |        target => "[data][@timestamp]"
      |    }
      |    kv {
      |        source => "[data][message]"
      |        target => "[data][test]"
      |    }
      |    mutate {
      |        add_field => { "[messages][message1]" => 3 "m2" => 4.2 "m3" => "test3" }
      |        rename => { "[messages][messagea]" => "[newMessage]" }
      |        remove_field => ["[messages][test]", "[test2]"]
      |        remove_field => ["test3"]
      |        uppercase => ["[message][uppercaseField]"]
      |        gsub => ["source", "from", "to", "source2", "from2", "to2"]
      |        split => { "splitMessage" => "," }
      |    }
      |}
      |output {
      |    elasticsearch {
      |        hosts => ["https://localhost:19000"]
      |        user => myuser
      |        password => mypassword
      |        index => "simple-pipeline"
      |        ssl_certificate_verification => false
      |    }
      |}
      |""".stripMargin

  test("reference-shaped conf converts: grok merge, nested syntax, mutate split, sink mapping") {
    val d = LogstashConf.convert(referenceShapedConf)
    assert(d.name == "logstash-converted-pipeline")
    assert(d.source.name == "http")

    val grok = d.processors.find(_.name == "grok").get
    val m = grok.options("match").asInstanceOf[Map[String, Seq[String]]]
    // repeated match attrs merged; fields AND pattern semantics converted
    assert(m("/data/log1") == Seq("%{NUMBER} %{GREEDYDATA:/nested/field/data1}"))
    assert(m("/data/log2") == Seq("%{NUMBER:num:int} %{GREEDYDATA:/nested/field/data2}"))
    assert(grok.options("keys_to_overwrite") == Seq("/nested/field/data1"))
    assert(grok.options("break_on_match") == false)

    val date = d.processors.find(_.name == "date").get
    val entry = date.options("match").asInstanceOf[Seq[Map[String, Any]]].head
    assert(entry("key") == "/data/timestamp")
    assert(entry("patterns") == Seq("yyyy-MM-dd"))
    assert(date.options("destination") == "/data/@timestamp")
    assert(date.options("from_time_received") == false)
    assert(date.options("destination_timezone") == "UTC")

    val kv = d.processors.find(_.name == "key_value").get
    assert(kv.options("source") == "/data/message")
    assert(kv.options("destination") == "/data/test")

    // mutate sub-actions in first-appearance order, repeats accumulated
    val mutateNames = d.processors.map(_.name).filter(Set("add_entries",
      "rename_keys", "delete_entries", "uppercase_string",
      "substitute_string", "split_string"))
    assert(mutateNames == Seq("add_entries", "rename_keys", "delete_entries",
      "uppercase_string", "substitute_string", "split_string"))
    val del = d.processors.find(_.name == "delete_entries").get
    assert(del.options("with_keys") == Seq("/messages/test", "/test2", "test3"))
    val add = d.processors.find(_.name == "add_entries").get
    val entries = add.options("entries").asInstanceOf[Seq[Map[String, Any]]]
    assert(entries.toSet == Set(
      Map("key" -> "/messages/message1", "value" -> 3L),
      Map("key" -> "m2", "value" -> 4.2),
      Map("key" -> "m3", "value" -> "test3")))
    val gsub = d.processors.find(_.name == "substitute_string").get
    assert(gsub.options("entries") == Seq(
      Map("source" -> "source", "from" -> "from", "to" -> "to"),
      Map("source" -> "source2", "from" -> "from2", "to" -> "to2")))

    val sink = d.sinks.head.plugin
    assert(sink.name == "opensearch")
    assert(sink.options("username") == "myuser")
    assert(sink.options("index") == "simple-pipeline")
    assert(sink.options("insecure") == true) // negated ssl_certificate_verification
  }

  test("default index applies when the output names none") {
    val d = LogstashConf.convert(
      "input { http {} } output { opensearch { hosts => [\"h\"] } }")
    assert(d.sinks.head.plugin.options("index") == "logstash-%{uuuu.MM.dd}")
  }

  test("grok pattern conversion preserves literal text between captures") {
    // deliberate deviation from GrokMatchUtil's group-only rebuild (which
    // drops the " - ") — documented in LogstashConf's scaladoc
    assert(LogstashConf.convertGrokPattern("%{IP:a} - %{USER:[u][id]}") ==
      "%{IP:a} - %{USER:/u/id}")
    assert(LogstashConf.convertGrokPattern("%{NUMBER:num:int}x") ==
      "%{NUMBER:num:int}x")
    assert(LogstashConf.convertGrokPattern("no captures") == "no captures")
  }

  test("regex backslashes survive string parsing; only quote/backslash unescape") {
    // grok match "\d+" must stay \d+ (the reference visitor strips only
    // the surrounding quotes, ModelConvertingLogstashVisitor.java:145)
    val d = LogstashConf.convert(
      """input { stdin {} }
        |filter {
        |    grok { match => { "message" => "(?<num>\d+)\s+%{WORD:w}" } }
        |    mutate { gsub => ["message", "\s+", " "] }
        |}
        |output { stdout {} }
        |""".stripMargin)
    val grok = d.processors.find(_.name == "grok").get
    val m = grok.options("match").asInstanceOf[Map[String, Seq[String]]]
    assert(m("message") == Seq("""(?<num>\d+)\s+%{WORD:w}"""))
    val gsub = d.processors.find(_.name == "substitute_string").get
    assert(gsub.options("entries") == Seq(
      Map("source" -> "message", "from" -> """\s+""", "to" -> " ")))
    // escaped quote and escaped backslash still unescape
    val d2 = LogstashConf.convert(
      "input { stdin {} } filter { mutate { add_field => " +
        "{ \"a\" => \"say \\\"hi\\\"\" \"b\" => \"c:\\\\dir\" } } } " +
        "output { stdout {} }")
    val entries = d2.processors.find(_.name == "add_entries").get
      .options("entries").asInstanceOf[Seq[Map[String, Any]]]
      .map(e => e("key") -> e("value")).toMap
    assert(entries("a") == "say \"hi\"")
    assert(entries("b") == "c:\\dir")
  }

  test("mutate strip (real Logstash name) and trim (reference name) both map") {
    for (opt <- Seq("strip", "trim")) {
      val d = LogstashConf.convert(
        s"input { stdin {} } filter { mutate { $opt => [\"f\"] } } " +
          "output { stdout {} }")
      val t = d.processors.find(_.name == "trim_string").get
      assert(t.options("with_keys") == Seq("f"))
    }
  }

  test("unknown filters and out-of-subset conditionals are rejected, not dropped") {
    intercept[IllegalArgumentException] {
      LogstashConf.convert(
        "input { stdin {} } filter { throttle {} } output { stdout {} }")
    }
    // conditionals in the INPUT section stay out of subset
    intercept[IllegalArgumentException] {
      LogstashConf.convert(
        "input { if [x] { stdin {} } } filter {} output { stdout {} }")
    }
    // nand/xor operators stay out of subset
    intercept[IllegalArgumentException] {
      LogstashConf.convert(
        "input { stdin {} } filter { if [a] nand [b] { drop {} } } " +
          "output { stdout {} }")
    }
  }

  test("condition conversion: refs, literals, operators, regex, in, truthiness") {
    import LogstashConf.convertCondition
    assert(convertCondition("""[type] == "apache"""") == """/type == "apache"""")
    assert(convertCondition("[a][b] != 404") == "/a/b != 404")
    assert(convertCondition("[status] >= 500 and [env] != \"dev\"") ==
      """/status >= 500 and /env != "dev"""")
    assert(convertCondition("""[msg] =~ /\d{3}/""") ==
      """/msg =~ ".*(?:\\d{3}).*"""")
    assert(convertCondition("""[lvl] in ["warn", "error"]""") ==
      """/lvl in {"warn", "error"}""")
    assert(convertCondition("""[lvl] not in ["debug"]""") ==
      """/lvl not in {"debug"}""")
    assert(convertCondition("[f]") == "not (/f == null)")
    assert(convertCondition("!([f]) or ([x] < 2 and [y] =~ \"ab+\")") ==
      """not (not (/f == null)) or (/x < 2 and /y =~ ".*(?:ab+).*")""")
  }

  test("filter conditionals compile to gates and run end-to-end") {
    // a real-world shape: type-dispatched grok / else-if mutate / else
    // drop, plus a second numeric-threshold conditional over grok output
    val conf =
      """input { stdin {} }
        |filter {
        |    if [type] == "apache" {
        |        grok { match => { "message" => "%{WORD:verb} %{NUMBER:code}" } }
        |        if [type] =~ /apa/ {
        |            mutate { add_field => { "nested" => "yes" } }
        |        }
        |    } else if [type] == "syslog" {
        |        mutate { add_field => { "src" => "sys" } uppercase => ["message"] }
        |    } else {
        |        drop {}
        |    }
        |}
        |output { stdout {} }
        |""".stripMargin
    val input = Seq(
      ("apache", "get 200"),
      ("syslog", "kernel oops"),
      ("noise", "drop me")).toDF("type", "message")
    val outs = LogstashConf.compile(spark, conf,
      Map("logstash-converted-pipeline" -> input))
    val rows = outs.head.df
      .select("type", "message", "verb", "code", "nested", "src")
      .collect().map(r => (0 until 6).map(i =>
        Option(r.get(i)).map(String.valueOf).orNull).toList).toSet
    assert(rows == Set(
      // apache row: grok extracted + nested conditional added, src null
      List("apache", "get 200", "get", "200", "yes", null),
      // syslog row: uppercased message + src, grok fields null
      List("syslog", "KERNEL OOPS", null, null, null, "sys")))
    // noise row dropped by the else branch
  }

  test("branch bodies cannot flip sibling gates (guards pre-materialized)") {
    // the if-branch rewrites the very field the condition reads; the else
    // drop must still see the ORIGINAL value (Logstash evaluates the
    // condition once, before any branch runs)
    val conf = "input { stdin {} } filter { " +
      "if [t] == \"a\" { mutate { uppercase => [\"t\"] } } else { drop {} } " +
      "} output { stdout {} }"
    val input = Seq("a", "b").toDF("t")
    val outs = LogstashConf.compile(spark, conf,
      Map("logstash-converted-pipeline" -> input))
    assert(outs.head.df.as[String].collect().toSeq == Seq("A"))
    assert(outs.head.df.columns.toSeq == Seq("t")) // guard columns cleaned up
  }

  test("output conditionals route events to the matching sinks") {
    // the classic type-dispatched output: errors to one sink, everything
    // hot to another, the rest to a third; a plain sink sees all events
    val conf =
      """input { stdin {} }
        |output {
        |    if [level] == "error" {
        |        file { path => "errors" }
        |    } else if [value] >= 10 {
        |        file { path => "hot" }
        |    } else {
        |        file { path => "rest" }
        |    }
        |    stdout {}
        |}
        |""".stripMargin
    val d = LogstashConf.convert(conf)
    assert(d.routes.size == 3) // one synthesized route per conditional sink
    val input = Seq(("error", 3), ("info", 25), ("info", 1), ("error", 50))
      .toDF("level", "value")
    val outs = LogstashConf.compile(spark, conf,
      Map("logstash-converted-pipeline" -> input))
    def rowsOf(path: String) = outs
      .find(_.plugin.options.get("path").contains(path)).get.df
      .as[(String, Int)].collect().toSet
    assert(rowsOf("errors") == Set(("error", 3), ("error", 50)))
    assert(rowsOf("hot") == Set(("info", 25)))
    assert(rowsOf("rest") == Set(("info", 1)))
    // the unconditional stdout sink receives every event
    val all = outs.find(_.plugin.name == "stdout").get.df.count()
    assert(all == 4)
  }

  test("converted pipeline runs end-to-end through the shared compiler") {
    val conf =
      """input { stdin {} }
        |filter {
        |    grok {
        |        match => { "message" => "%{WORD:verb} %{NUMBER:code}" }
        |    }
        |    mutate {
        |        uppercase => ["verb"]
        |        add_field => { "tag" => "ls" }
        |    }
        |}
        |output { stdout {} }
        |""".stripMargin
    val input = Seq("get 200", "post 503").toDF("message")
    val outs = LogstashConf.compile(spark, conf,
      Map("logstash-converted-pipeline" -> input))
    assert(outs.size == 1)
    val rows = outs.head.df
      .select("verb", "code", "tag")
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(("GET", "200", "ls"), ("POST", "503", "ls")))
  }
}
