package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-2 processor surface: full date semantics, `${}` templating,
  * advanced key_value (VERDICT r1 "Next round" items 5-7). */
class DateParseSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val instant = java.time.Instant.parse("2026-03-01T12:34:56Z")

  test("multi-pattern first-match-wins with source timezone and epoch patterns") {
    // same instant in three source formats (NY wall clock is EST = UTC-5
    // on March 1): the pattern list must route each to the right parser
    val df = Seq(
      (1L, "2026-03-01 07:34:56"),                  // NY local, no zone
      (2L, instant.toEpochMilli.toString),          // epoch_milli
      (3L, "01/Mar/2026:12:34:56 +0000")            // zoned — tz field wins
    ).toDF("id", "raw")
    val out = Processors.DateParse("raw",
      patterns = Seq("yyyy-MM-dd HH:mm:ss", "epoch_milli", "dd/MMM/yyyy:HH:mm:ss Z"),
      destination = "d", sourceTimezone = "America/New_York",
      outputFormat = "epoch_milli")(df)
      .select("id", "d").as[(Long, String)].collect().toMap
    assert(out(1L) == instant.toEpochMilli.toString)
    assert(out(2L) == instant.toEpochMilli.toString)
    assert(out(3L) == instant.toEpochMilli.toString)
  }

  test("locale path parses French month names (JVM formatter seam)") {
    val df = Seq((1L, "01 mars 2026 12:34:56")).toDF("id", "raw")
    val out = Processors.DateParse("raw",
      patterns = Seq("dd MMMM yyyy HH:mm:ss"), destination = "d",
      locale = "fr", outputFormat = "epoch_second")(df)
      .select("d").as[String].collect().head
    assert(out == instant.getEpochSecond.toString)
  }

  test("destination timezone formats the zone's own offset") {
    val df = Seq((1L, instant.getEpochSecond.toString)).toDF("id", "raw")
    val out = Processors.DateParse("raw", patterns = Seq("epoch_second"),
      destination = "d", destinationTimezone = "America/New_York",
      outputFormat = "yyyy-MM-dd HH:mm:ssXXX")(df)
      .select("d").as[String].collect().head
    assert(out == "2026-03-01 07:34:56-05:00")
  }

  test("from_time_received formats _meta.time_received; date_when gates rows") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "raw")
      .withColumn("_meta", struct(
        lit(java.sql.Timestamp.from(instant)).as("time_received")))
    val out = Processors.DateParse("raw", patterns = Seq("unused-pattern 'p'"),
      destination = "d", fromTimeReceived = true,
      outputFormat = "yyyy-MM-dd'T'HH:mm:ss",
      dateWhen = Some(col("id") === 1L))(df)
      .select("id", "d").as[(Long, String)].collect().toMap
    assert(out(1L) == "2026-03-01T12:34:56")
    assert(out(2L) == null) // gated off; no prior column → null passthrough
  }

  test("epoch_nano parses with integral division (no double rounding)") {
    // 1.75e18 ns > 2^53: double division would round the microsecond
    val nanos = "1755443696123456789"
    val df = Seq((1L, nanos)).toDF("id", "raw")
    val out = Processors.DateParse("raw", patterns = Seq("epoch_nano"),
      destination = "d", outputFormat = "epoch_micro")(df)
      .select("d").as[String].collect().head
    assert(out == "1755443696123456")
  }

  test("trace_group fill picks ONE root for multi-root traces") {
    val df = Seq(
      (1L, "t1", null.asInstanceOf[String], "root-a"),
      (2L, "t1", null.asInstanceOf[String], "root-b"), // orphan second root
      (3L, "t1", "1", "child"),
      (4L, "t2", null.asInstanceOf[String], "solo"))
      .toDF("span_id", "trace_id", "parent_id", "name")
    val out = Aggregates.traceGroupFill(df, "trace_id", "parent_id",
      "name", Seq("span_id"), orderCol = "span_id")
    assert(out.count() == 4) // no row duplication
    val groups = out.select("span_id", "trace_group")
      .as[(Long, String)].collect().toMap
    assert(groups(3L) == "root-a") // min span_id root wins
    assert(groups(4L) == "solo")
  }

  test("unparseable rows yield null, later patterns still tried") {
    val df = Seq((1L, "not a date")).toDF("id", "raw")
    val out = Processors.DateParse("raw",
      patterns = Seq("yyyy-MM-dd", "epoch_milli"), destination = "d")(df)
      .select("d").as[String].collect().head
    assert(out == null)
  }
}

class FormatStringSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq((7L, "en", "src3")).toDF("id", "lang", "source")

  private def eval(t: String): String =
    df.select(FormatString.compile(t).cast("string").as("o")).as[String].collect().head

  test("bare keys, pointers, and expressions interpolate") {
    assert(eval("${lang}") == "en")
    assert(eval("${/source}") == "src3")
    assert(eval("k-${lang}/${/id}") == "k-en/7")
    assert(eval("${/id * 2 + 1}") == "15")
    assert(eval("${length(/source)}") == "4")
    assert(eval("no refs at all") == "no refs at all")
  }

  test("null reference nulls the whole result (concat propagation)") {
    val d = Seq((1L, Option.empty[String])).toDF("id", "v")
    val out = d.select(FormatString.compile("x-${v}").as("o"))
      .as[String].collect().head
    assert(out == null)
  }
}

class KeyValueAdvancedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parse(line: String, p: Processors.KeyValueAdvanced)
      : Map[String, Seq[String]] = {
    val df = Seq(line).toDF(p.source)
    p(df).select(p.destination).collect().head
      .getAs[Map[String, scala.collection.Seq[String]]](0)
      .map { case (k, v) => k -> v.toList }
  }

  test("value_grouping keeps quoted, bracketed and url runs unsplit") {
    val kv = parse(
      """a=1 msg="hello world" range=[2 4] link=https://x.io/p?q=2 b=3""",
      Processors.KeyValueAdvanced("line", "kv",
        fieldSplitCharacters = " ", valueGrouping = true))
    assert(kv("a") == Seq("1") && kv("b") == Seq("3"))
    assert(kv("msg") == Seq("\"hello world\""))
    assert(kv("range") == Seq("[2 4]"))
    assert(kv("link") == Seq("https://x.io/p?q=2"))
  }

  test("include/exclude/default/transform/remove_brackets/prefix pipeline") {
    val kv = parse("Lang=EN&SRC=[s1]&drop=x&Keep=ok",
      Processors.KeyValueAdvanced("line", "kv",
        excludeKeys = Seq("drop"), includeKeys = Seq("Lang", "SRC", "Keep"),
        defaultValues = Map("tier" -> "std"), transformKey = "lowercase",
        removeBrackets = true, keyPrefix = "p_"))
    assert(kv("p_lang") == Seq("EN"))
    assert(kv("p_src") == Seq("s1"))
    assert(kv("p_keep") == Seq("ok"))
    assert(kv("tier") == Seq("std"))
    assert(!kv.keys.exists(_.contains("drop")))
  }

  test("duplicate keys accumulate; skip_duplicate_values dedups") {
    val p0 = Processors.KeyValueAdvanced("line", "kv")
    assert(parse("k=1&k=2&k=1", p0)("k") == Seq("1", "2", "1"))
    assert(parse("k=1&k=2&k=1",
      p0.copy(skipDuplicateValues = true))("k") == Seq("1", "2"))
  }

  test("whitespace strict trims key-tail and value-head") {
    val kv = parse("a =  1&b= 2",
      Processors.KeyValueAdvanced("line", "kv", whitespace = "strict"))
    assert(kv("a") == Seq("1") && kv("b") == Seq("2"))
  }

  test("non-match pairs get null value; drop_keys_with_no_value removes them") {
    val p0 = Processors.KeyValueAdvanced("line", "kv")
    assert(parse("a=1&novalue", p0)("novalue") == Seq(null))
    assert(!parse("a=1&novalue",
      p0.copy(dropKeysWithNoValue = true)).contains("novalue"))
  }

  test("recursive parses nested bracket groups to JSON") {
    val df = Seq("a=1&n=[x=2&m=[y=3]]&q=end").toDF("line")
    val out = Processors.KeyValueRecursive("line", "j")(df)
      .select("j").as[String].collect().head
    assert(out == """{"a":"1","n":{"x":"2","m":{"y":"3"}},"q":"end"}""")
  }
}

class IonTextSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Ion text subset converts to parseable JSON (canonical compact)") {
    assert(IonText.toJson("""{a:1, b:"x", c:my_symbol}""") ==
      """{"a":1,"b":"x","c":"my_symbol"}""")
    assert(IonText.toJson("{ts:event::2026-01-01T00:00:00Z, n:ann::42}") ==
      """{"ts":"2026-01-01T00:00:00Z","n":42}""")
    assert(IonText.toJson("{x:null.int, y:nan, z:[1, 2.5e1, 0x1F]}") ==
      """{"x":null,"y":null,"z":[1,2.5e1,31]}""")
    assert(IonText.toJson("{s:(a + b)}") == """{"s":["a","+","b"]}""")
    assert(IonText.toJson("{'weird key':'val'}") == """{"weird key":"val"}""")
    assert(IonText.toJson("{d:1d-3}") == """{"d":1e-3}""")
    assert(IonText.toJson("{data:{{aGVsbG8=}}}") == """{"data":"aGVsbG8="}""")
    assert(IonText.toJson("{// comment\n a:+inf, b:-inf}") ==
      """{"a":null,"b":null}""")
  }

  test("ParseIon end-to-end through from_json") {
    val df = Seq("""evt::{lang:en, src:"s1", n:count::42}""").toDF("raw")
    val out = Processors.ParseIon("raw", "lang STRING, src STRING, n BIGINT")(df)
      .select("parsed.lang", "parsed.src", "parsed.n").collect().head
    assert(out == org.apache.spark.sql.Row("en", "s1", 42L))
  }
}

class RcfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("random cut forest isolates outliers above the inlier score band") {
    val rng = new graft.util.SplitMix64(3L)
    val inliers = (0 until 300).map { i =>
      (i.toLong, rng.nextDouble() * 2 - 1, rng.nextDouble() * 2 - 1)
    }
    val outliers = Seq((9001L, 50.0, 50.0), (9002L, -40.0, 35.0))
    val df = (inliers ++ outliers).toDF("id", "x", "y")
    val scored = graft.ops.Rcf.anomalies(df, Seq("x", "y"), threshold = 0.2,
      numTrees = 20, sampleSize = 128, seed = 7L)
      .select($"id", $"rcf_score", $"rcf_grade").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val inScores = inliers.map(i => scored(i._1)._1)
    val outScores = outliers.map(o => scored(o._1)._1)
    assert(outScores.min > inScores.max * 2,
      s"outliers ${outScores.min} not separated from inliers ${inScores.max}")
    assert(outliers.forall(o => scored(o._1)._2 == 1.0))
    // determinism: same seed → same scores
    val again = graft.ops.Rcf.anomalies(df, Seq("x", "y"), 0.2, 20, 128, 7L)
      .select($"id", $"rcf_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.forall { case (k, (s, _)) => again(k) == s })
  }
}

class GatedMetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AddEntry format + expression flavors") {
    val df = Seq((3L, "en")).toDF("id", "lang")
    val out = Pipeline(
      Processors.AddEntry.format("key", "${lang}-${/id}"),
      Processors.AddEntry.expression("twice", "/id * 2"))(df)
      .select("key", "twice").collect().head
    assert(out == Row("en-3", 6L))
  }

  test("dissect append, indirect, target_types modifiers") {
    val df = Seq("alpha beta rc=7 extra").toDF("line")
    val out = Processors.Dissect("line",
      "%{+name} %{+name} %{?k}=%{&k} %{rest}",
      appendSeparator = "_", targetTypes = Map("rest" -> "string"))(df)
    val r = out.select(col("name"), col("rest"),
      element_at(col("dissect_indirect"), "rc")).collect().head
    assert(r == Row("alpha_beta", "extra", "7"))
  }

  test("dissect target_types casts") {
    val df = Seq("code=42 ratio=0.5").toDF("line")
    val out = Processors.Dissect("line", "code=%{code} ratio=%{ratio}",
      targetTypes = Map("code" -> "long", "ratio" -> "double"))(df)
      .select("code", "ratio").collect().head
    assert(out == Row(42L, 0.5))
  }

  test("rate_limiter BLOCK mode: token-bucket reflow via running-max window") {
    val t0 = java.time.Instant.parse("2026-01-01T00:00:00Z")
    def ts(off: Double) = java.sql.Timestamp.from(t0.plusMillis((off * 1000).toLong))
    val df = Seq(
      (1L, "a", ts(0.0)), (2L, "a", ts(0.1)), (3L, "a", ts(0.2)),
      (4L, "a", ts(5.0)), (5L, "b", ts(0.0))).toDF("id", "k", "ts")
    val out = Aggregates.rateLimiterBlock(df, Seq("k"), "ts", 2.0, Seq("id"))
      .select($"id", unix_micros($"emit_ts")).as[(Long, Long)].collect().toMap
    val base = t0.toEpochMilli * 1000
    // emit_i = max(ts_i, emit_{i-1} + 500ms)
    assert(out(1L) == base)
    assert(out(2L) == base + 500000L)
    assert(out(3L) == base + 1000000L)
    assert(out(4L) == base + 5000000L) // bucket drained; no wait
    assert(out(5L) == base)            // independent key
  }

  test("flatten handles arrays of structs and exclude_keys") {
    val df = Seq((1L, (("a", 2), Seq((10, "x"), (20, "y")), ("keepme", 9))))
      .toDF("id", "s")
      .selectExpr("id", "named_struct(" +
        "'m', named_struct('p', s._1._1, 'q', s._1._2), " +
        "'items', transform(s._2, e -> named_struct('n', e._1, 't', e._2)), " +
        "'excl', named_struct('a', s._3._1, 'b', s._3._2)) AS s")
    val out = Processors.Flatten("s", excludeKeys = Seq("excl"))(df)
    assert(out.columns.toSet ==
      Set("id", "s/m/p", "s/m/q", "s/items/n", "s/items/t", "s/excl"))
    val r = out.select(col("`s/items/n`"), col("`s/excl`.a")).collect().head
    assert(r.getSeq[Int](0) == Seq(10, 20) && r.getString(1) == "keepme")
  }

  test("translate regex: exact anchors the whole value, find does not; first match wins") {
    val df = Seq("error", "error-page", "view", "preview").toDF("t")
    def run(exact: Boolean) = Processors.TranslateRegex("t", "cat", Seq(
      "error" -> "problem", "view" -> "engagement"),
      exact = exact, default = Some("other"))(df)
      .select("t", "cat").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val find = run(exact = false)
    assert(find == Map("error" -> "problem", "error-page" -> "problem",
      "view" -> "engagement", "preview" -> "engagement"))
    val exact = run(exact = true)
    assert(exact == Map("error" -> "problem", "error-page" -> "other",
      "view" -> "engagement", "preview" -> "other"))
  }
}
