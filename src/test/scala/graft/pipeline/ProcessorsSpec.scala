package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProcessorsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "hello world", "en", 11L),
    (2L, "  padded  ", "de", 10L),
    (3L, "a,b,c", "fr", 5L)).toDF("id", "text", "lang", "n")

  test("add/copy/rename/delete/select entries") {
    val out = Pipeline(
      Processors.AddEntry("tag", concat($"lang", lit("-x"))),
      Processors.CopyValue("lang", "lang2"),
      Processors.RenameKeys("n" -> "len"),
      Processors.DeleteEntries("text"),
      Processors.SelectEntries("id", "tag", "lang2", "len"))(df)
    assert(out.columns.toSeq == Seq("id", "tag", "lang2", "len"))
    assert(out.where($"id" === 1).head().getString(1) == "en-x")
  }

  test("add_entries gated by when-condition leaves other rows unchanged") {
    val out = Processors.AddEntry("lang", lit("xx"),
      addWhen = Some($"id" === 1))(df)
    val langs = out.orderBy("id").select("lang").as[String].collect()
    assert(langs.sameElements(Array("xx", "de", "fr")))
  }

  test("convert_type casts with null on failure") {
    val d = Seq(("1", 1), ("x", 2)).toDF("v", "id")
    val out = Processors.ConvertType("v", "int")(d)
    assert(out.orderBy("id").select("v").collect().map(r => r.isNullAt(0)).toSeq
      == Seq(false, true))
  }

  test("drop_events and split_event") {
    val kept = Processors.DropEvents($"n" < 6)(df)
    assert(kept.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val split = Processors.SplitEvent("text", ",")(df.where($"id" === 3))
    assert(split.select("text").as[String].collect().toSeq == Seq("a", "b", "c"))
  }

  test("truncate / trim / case / substitute string ops") {
    assert(Processors.Truncate("text", 0, Some(5))(df.where($"id" === 1))
      .select("text").as[String].head() == "hello")
    assert(Processors.TrimString("text")(df.where($"id" === 2))
      .select("text").as[String].head() == "padded")
    assert(Processors.UppercaseString("lang")(df.where($"id" === 1))
      .select("lang").as[String].head() == "EN")
    assert(Processors.SubstituteString("text", "l+", "L")(df.where($"id" === 1))
      .select("text").as[String].head() == "heLo worLd")
  }

  test("obfuscate mask and hash") {
    val d = Seq(("card 1234 and 567", 1)).toDF("t", "id")
    assert(Processors.ObfuscateMask("t", "[0-9]+", "*", 3)(d)
      .select("t").as[String].head() == "card *** and ***")
    val h = Processors.ObfuscateHash("t", "salt")(d).select("t").as[String].head()
    assert(h.length == 128 && h.matches("[0-9a-f]+")) // SHA-512 hex
  }

  test("obfuscate predefined %{NAME} pattern library") {
    val d = Seq(("mail a.b-1@test.mail.org from 10.1.2.3 ssn 123-45-6789", 1))
      .toDF("t", "id")
    assert(Processors.ObfuscateMask("t", "%{EMAIL_ADDRESS}", "*", 3)(d)
      .select("t").as[String].head() == "mail *** from 10.1.2.3 ssn 123-45-6789")
    assert(Processors.ObfuscateMask("t", "%{IP_ADDRESS_V4}", "#", 3)(d)
      .select("t").as[String].head() == "mail a.b-1@test.mail.org from ### ssn 123-45-6789")
    assert(Processors.ObfuscateMask("t", "%{US_SSN_NUMBER}", "*", 3)(d)
      .select("t").as[String].head() == "mail a.b-1@test.mail.org from 10.1.2.3 ssn ***")
    intercept[IllegalArgumentException] {
      Processors.ObfuscateMask("t", "%{NOT_A_PATTERN}")(d)
    }
  }

  test("dissect positional extraction") {
    val d = Seq(("alice GET /index.html 200", 1)).toDF("line", "id")
    val out = Processors.Dissect("line", "%{user} %{method} %{path} %{code}")(d)
    val r = out.select("user", "method", "path", "code").head()
    assert(r.toSeq == Seq("alice", "GET", "/index.html", "200"))
  }

  test("regex (grok-style) extraction") {
    val d = Seq(("dur=123ms code=500", 1)).toDF("msg", "id")
    val out = Processors.RegexExtract("msg", "dur=([0-9]+)ms code=([0-9]+)",
      Seq("dur" -> 1, "code" -> 2))(d)
    assert(out.select("dur", "code").head().toSeq == Seq("123", "500"))
  }

  test("date parse first-match-wins") {
    val d = Seq(("2026/01/02 03:04:05", 1), ("2026-01-02T03:04:05", 2)).toDF("t", "id")
    val out = Processors.DateParse("t",
      Seq("yyyy/MM/dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss"), "ts")(d)
    val ts = out.orderBy("id").select("ts").as[String].collect()
    assert(ts.forall(_.startsWith("2026-01-02T03:04:05")))
  }

  test("csv parse and key_value") {
    val d = Seq(("a,b", 1)).toDF("line", "id")
    val out = Processors.CsvParse("line", Seq("x", "y"))(d)
    assert(out.select("x", "y").head().toSeq == Seq("a", "b"))
    val kv = Seq(("k1=v1&k2=v2", 1)).toDF("s", "id")
    val kvOut = Processors.KeyValue("s", "kv", "&", "=")(kv)
    assert(kvOut.select(col("kv")("k2")).as[String].head() == "v2")
  }

  test("parse_json / write_json round trip") {
    val d = Seq(("""{"a": 5, "b": "x"}""", 1)).toDF("j", "id")
    val parsed = Processors.ParseJson("j", "a INT, b STRING", "p")(d)
    assert(parsed.select(col("p")("a")).as[Int].head() == 5)
    val written = Processors.WriteJson("p", "j2")(parsed)
    assert(written.select("j2").as[String].head() == """{"a":5,"b":"x"}""")
  }

  test("translate via broadcast join with default") {
    val out = Processors.Translate("lang", "name",
      Seq("en" -> "english", "de" -> "german"), Some("other"))(df)
    val got = out.orderBy("id").select("name").as[String].collect()
    assert(got.sameElements(Array("english", "german", "other")))
  }

  test("translate numeric ranges") {
    val d = Seq((5.0, 1), (15.0, 2), (99.0, 3)).toDF("v", "id")
    val out = Processors.TranslateRange("v", "tier",
      Seq((0.0, 10.0, "low"), (10.5, 20.0, "mid")), Some("high"))(d)
    assert(out.orderBy("id").select("tier").as[String].collect().toSeq
      == Seq("low", "mid", "high"))
  }

  test("flatten hoists struct leaves") {
    val d = Seq((1, ("x", (2, "y")))).toDF("id", "s")
    val out = Processors.Flatten("s")(d)
    assert(out.columns.toSet == Set("id", "s/_1", "s/_2/_1", "s/_2/_2"))
    assert(out.select(col("`s/_2/_1`")).as[Int].head() == 2)
  }

  test("list_to_map and filter_list") {
    val d = Seq((1, Seq(("a", 1), ("b", 2)))).toDF("id", "l")
    val entries = d.select(col("id"),
      transform(col("l"), e => struct(e.getField("_1").as("k"), e.getField("_2").as("v"))).as("l"))
    val out = Processors.ListToMap("l", "k", "v", "m")(entries)
    assert(out.select(col("m")("b")).as[Int].head() == 2)
    val filtered = Processors.FilterList("l", "l2",
      e => e.getField("v") > 1)(entries)
    assert(filtered.select(size(col("l2"))).as[Int].head() == 1)
  }

  test("decompress gunzips binary columns") {
    val payload = "hello compression"
    val baos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(baos)
    gz.write(payload.getBytes("UTF-8")); gz.close()
    val d = Seq((baos.toByteArray, 1)).toDF("b", "id")
    assert(Processors.Decompress("b", "t")(d).select("t").as[String].head() == payload)
  }

  test("router fan-out routes rows and counts them; default catches rest") {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    val routed = Router.fanOut(df, Seq(
      Route("english", $"lang" === "en"),
      Route("short", $"n" < 6)),
      (name, branch) => counts(name) = branch.count())
    assert(routed("english") == 1 && routed("short") == 1)
    assert(routed(Router.DefaultRoute) == 1) // id=2 matches neither
  }

  test("router tag annotates matching routes") {
    val out = Router.tag(df, Seq(Route("english", $"lang" === "en"),
      Route("long", $"n" >= 10)))
    val tags = out.orderBy("id").select(concat_ws(",", $"routes")).as[String].collect()
    assert(tags.sameElements(Array("english,long", "long", "")))
  }
}
