package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AvroCodecSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema =
    """{"type":"record","name":"Ev","fields":[
      |{"name":"id","type":"long"},
      |{"name":"msg","type":"string"},
      |{"name":"score","type":"double"}]}""".stripMargin

  test("container write → read round-trips records as JSON") {
    val dir = graft.TestSpark.tmpDir("avro")
    val rows = Seq(
      """{"id":1,"msg":"alpha","score":0.5}""",
      """{"id":2,"msg":"beta","score":1.25}""",
      """{"id":3,"msg":"gamma","score":-2.0}""")
    graft.sources.AvroCodec.writeContainer(
      rows.toDF("json").repartition(2), s"$dir/out", schema)
    val back = graft.sources.AvroCodec.readContainer(spark, s"$dir/out")
    assert(back.count() == 3)
    val ids = back.select(
      org.apache.spark.sql.functions.get_json_object($"json", "$.id").cast("long"))
      .as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
    val msg2 = back.filter(
      org.apache.spark.sql.functions.get_json_object($"json", "$.id") === "2")
      .select(org.apache.spark.sql.functions.get_json_object($"json", "$.msg"))
      .as[String].collect().head
    assert(msg2 == "beta")
  }

  test("binary datum decode (event_json payload shape)") {
    // encode one datum with avro directly, decode via the column udf
    val s = new org.apache.avro.Schema.Parser().parse(schema)
    val rec = new org.apache.avro.generic.GenericData.Record(s)
    rec.put("id", 7L); rec.put("msg", "x"); rec.put("score", 3.5)
    val bos = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(bos, null)
    new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](s)
      .write(rec, enc)
    enc.flush()
    val df = Seq(bos.toByteArray).toDF("payload")
    val out = df.select(
      graft.sources.AvroCodec.parseDatum(schema)($"payload").as("json"))
      .as[String].collect().head
    assert(out.contains("\"id\": 7") || out.contains("\"id\":7"))
    assert(out.contains("\"msg\": \"x\"") || out.contains("\"msg\":\"x\""))
  }
}

class UserAgentSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parse(ua: String) = {
    val df = Seq(ua).toDF("ua")
    UserAgent("ua")(df).select(
      $"user_agent.name", $"user_agent.version",
      $"user_agent.os.name".as("os"), $"user_agent.os.version".as("osv"),
      $"user_agent.os.full".as("osfull"),
      $"user_agent.device.name".as("device")).collect().head
  }

  test("major browser/OS/device families parse") {
    val chrome = parse("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36")
    assert(chrome.getString(0) == "Chrome" && chrome.getString(1).startsWith("120"))
    assert(chrome.getString(2) == "Windows" && chrome.getString(3) == "10")
    assert(chrome.getString(4) == "Windows 10")

    val safariIphone = parse("Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Mobile/15E148 Safari/604.1")
    assert(safariIphone.getString(0) == "Safari" && safariIphone.getString(2) == "iOS")
    assert(safariIphone.getString(3) == "17.2" && safariIphone.getString(5) == "iPhone")

    val ffMac = parse("Mozilla/5.0 (Macintosh; Intel Mac OS X 10.15; rv:109.0) Gecko/20100101 Firefox/115.0")
    assert(ffMac.getString(0) == "Firefox" && ffMac.getString(2) == "Mac OS X")
    assert(ffMac.getString(5) == "Mac")

    val edge = parse("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91")
    assert(edge.getString(0) == "Edge")

    val bot = parse("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)")
    assert(bot.getString(0) == "Googlebot" && bot.getString(5) == "Spider")

    val androidChrome = parse("Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.43 Mobile Safari/537.36")
    assert(androidChrome.getString(2) == "Android" && androidChrome.getString(3) == "14")
    assert(androidChrome.getString(5) == "Generic Smartphone")

    val other = parse("weird-client/0.1")
    assert(other.getString(0) == "Other" && other.getString(2) == "Other")
  }
}
