package graft.pipeline

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GrokSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("COMMONAPACHELOG parses the canonical apache line") {
    val line = """127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326"""
    val df = Seq(line).toDF("message")
    val out = Grok("message", Seq("%{COMMONAPACHELOG}"))(df)
      .select("clientip", "ident", "auth", "timestamp", "verb", "request",
        "httpversion", "response", "bytes")
      .collect().head
    assert(out == Row("127.0.0.1", "-", "frank", "10/Oct/2000:13:55:36 -0700",
      "GET", "/apache_pb.gif", "1.0", "200", "2326"))
  }

  test("first-match-wins across multiple patterns + tags_on_match_failure") {
    val df = Seq(
      ("a", "level=ERROR code=7"),
      ("b", "took 250 ms"),
      ("c", "unparseable !!")).toDF("id", "message")
    val out = Grok("message",
      Seq("level=%{LOGLEVEL:level} code=%{INT:code:int}",
        "took %{INT:ms:int} ms"),
      tagsOnMatchFailure = Seq("_grokparsefailure"))(df)
      .select("id", "level", "code", "ms", "tags")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getString(1) == "ERROR" && out("a").getLong(2) == 7L)
    assert(out("a").isNullAt(3) && out("a").getSeq[String](4).isEmpty)
    assert(out("b").isNullAt(1) && out("b").getLong(3) == 250L)
    assert(out("c").isNullAt(1) && out("c").isNullAt(2) && out("c").isNullAt(3))
    assert(out("c").getSeq[String](4) == Seq("_grokparsefailure"))
  }

  test("custom pattern_definitions and target_key nesting") {
    val df = Seq("order ABC-123 state=shipped").toDF("message")
    val out = Grok("message", Seq("order %{ORDERID:oid} state=%{WORD:state}"),
      extraDefs = Map("ORDERID" -> "[A-Z]{3}-[0-9]+"),
      targetKey = Some("parsed"))(df)
    val r = out.select("parsed.oid", "parsed.state").collect().head
    assert(r == Row("ABC-123", "shipped"))
  }

  test("empty captures become null unless keep_empty_captures") {
    val df = Seq("k=|v=x").toDF("message")
    val p = Seq("k=%{DATA:k}\\|v=%{WORD:v}")
    val drop = Grok("message", p)(df).select("k", "v").collect().head
    assert(drop.isNullAt(0) && drop.getString(1) == "x")
    val keep = Grok("message", p, keepEmptyCaptures = true)(df)
      .select("k", "v").collect().head
    assert(keep.getString(0) == "" && keep.getString(1) == "x")
  }

  test("library pattern internals with literal capturing groups keep indices straight") {
    // HOSTNAME contains a literal capturing group; IPORHOST nests IP|HOSTNAME.
    val df = Seq("from db-01.internal.example.com port 5432").toDF("message")
    val out = Grok("message",
      Seq("from %{IPORHOST:host} port %{POSINT:port:int}"))(df)
      .select("host", "port").collect().head
    assert(out == Row("db-01.internal.example.com", 5432L))
  }

  test("grok over the log_generator source round-trips") {
    val logs = graft.sources.Sources.logGenerator(spark, 500).toDF("message")
    val parsed = Grok("message", Seq("%{COMMONAPACHELOG}"))(logs)
    assert(parsed.filter($"clientip".isNull).count() == 0)
    assert(parsed.filter($"response".isNull).count() == 0)
    val verbs = parsed.select("verb").distinct().as[String].collect().toSet
    assert(verbs.subsetOf(Set("GET", "POST", "PUT", "DELETE")))
  }
}
