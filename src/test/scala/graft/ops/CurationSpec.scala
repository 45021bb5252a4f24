package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------- decontamination

  test("decontaminate flags docs sharing an n-gram with the eval set") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "prefix words alpha beta gamma delta more tail content here"), // shares a 4-gram
      (2L, "totally unrelated text with no overlap at all whatsoever"),
      (3L, "short")) // shorter than n -> zero grams, still present
      .toDF("doc_id", "text")
    val out = Curation.decontaminate(docs, "doc_id", "text", eval, "text", n = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("overlap_ngrams"), r.getAs[Boolean]("contaminated"))).toMap
    assert(out(1L)._2 && out(1L)._1 == 1L) // alpha beta gamma delta
    assert(out(2L) == ((0L, false)))
    assert(out(3L) == ((0L, false)))
    assert(out.size == 3)
  }

  test("decontaminate counts distinct overlapping grams, honors minOverlap") {
    val eval = Seq((9L, "one two three four five six seven")).toDF("doc_id", "text")
    // doc repeats the shared trigram — distinct overlap must still be
    // counted once per distinct gram, not once per occurrence
    val docs = Seq(
      (1L, "one two three one two three two three four"),
      (2L, "four five six and also five six seven")).toDF("doc_id", "text")
    val out = Curation.decontaminate(docs, "doc_id", "text", eval, "text",
      n = 3, minOverlap = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("overlap_ngrams"), r.getAs[Boolean]("contaminated"))).toMap
    assert(out(1L) == ((2L, true)))  // "one two three", "two three four"
    assert(out(2L) == ((2L, true)))  // "four five six", "five six seven"
  }

  // ------------------------------------------------- gopher filter

  private val goodText = (
    "the quick brown fox jumps over a lazy dog and then the small cat " +
      "walks through green fields while birds sing songs about warm " +
      "summer days in the quiet village near old stone bridges today").trim

  test("gopher filter keeps clean prose, flags failures by rule name") {
    val docs = Seq(
      (1L, goodText),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam " * 4),
      (3L, "tiny"),
      (4L, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 22 23 " +
        "24 25 26 27 28 29 30 31 32")).toDF("doc_id", "text")
    val out = Curation.gopherFilter(docs, "doc_id", "text",
      Curation.GopherRules(minWords = 10))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[String]("reasons"))).toMap
    assert(out(1L)._1, s"clean prose rejected: ${out(1L)._2}")
    assert(!out(2L)._1 && out(2L)._2.contains("top_ngram"))
    assert(!out(3L)._1 && out(3L)._2.contains("word_count"))
    assert(!out(4L)._1 && out(4L)._2.contains("alpha_words"))
  }

  test("gopher reasons list is ordered and comma-joined") {
    val docs = Seq((1L, "zz 11")).toDF("doc_id", "text")
    val out = Curation.gopherFilter(docs, "doc_id", "text").collect().head
    val reasons = out.getAs[String]("reasons").split(",").toSeq
    // failing rules appear in the fixed declaration order
    assert(reasons.head == "word_count")
    assert(reasons.contains("stopwords"))
    assert(reasons == reasons.distinct)
  }

  // ------------------------------------------------- sequence packing

  test("packSequences lays docs back-to-back and is chunk-invariant") {
    val docs = Seq(
      (0L, "a b c"),            // 3 tokens, start 0
      (1L, "d e f g"),          // 4 tokens, start 3
      (2L, ""),                 // 0 tokens, start 7
      (3L, "h i j k l m n o"),  // 8 tokens, start 7 -> straddles budget 10
      (4L, "p q")).toDF("doc_id", "text")
    def run(chunk: Long) =
      Curation.packSequences(docs, "doc_id", "text", budgetTokens = 10L, chunk)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("start_offset"),
            r.getAs[Long]("bin_first"), r.getAs[Long]("bin_last"))).toMap
    val out = run(chunk = 2)
    assert(out(0L) == ((3L, 0L, 0L, 0L)))
    assert(out(1L) == ((4L, 3L, 0L, 0L)))
    assert(out(2L) == ((0L, 7L, 0L, 0L)))   // empty doc occupies no tokens
    assert(out(3L) == ((8L, 7L, 0L, 1L)))   // straddles the bin boundary
    assert(out(4L) == ((2L, 15L, 1L, 1L)))
    // chunking is an execution detail, not a layout input
    assert(run(chunk = 1) == out)
    assert(run(chunk = 1000) == out)
    // auto sizing (chunk = 0, the driver-memory-bounded default) included
    assert(run(chunk = 0) == out)
  }

  test("packSequences is deterministic under repartitioning") {
    val docs = (0 until 200).map(i => (i.toLong, ("w " * (i % 17 + 1)).trim))
      .toDF("doc_id", "text")
    val a = Curation.packSequences(docs, "doc_id", "text", 64L, chunk = 32)
      .collect().map(_.toSeq).toSet
    val b = Curation.packSequences(docs.repartition(7), "doc_id", "text", 64L, chunk = 32)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // offsets are a dense token layout: sorted starts tile exactly
    val rows = a.toSeq.map(s => (s(0).asInstanceOf[Long], s(1).asInstanceOf[Long],
      s(2).asInstanceOf[Long])).sortBy(_._3)
    rows.sliding(2).foreach {
      case Seq((_, n1, s1), (_, _, s2)) => assert(s1 + n1 == s2)
      case _ => ()
    }
  }

  // ------------------------------------------------- PII redaction

  test("pii redact replaces all four types and counts on the original") {
    val docs = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "ssn 123-45-6789 phone 555-867-5309 ip 10.0.0.1"),
      (3L, "two mails a@b.co c@d.io and ips 1.2.3.4 5.6.7.8"),
      (4L, "nothing to redact here")).toDF("doc_id", "text")
    val out = Curation.piiRedact(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("redacted") == "mail [EMAIL] now")
    assert(out(1L).getAs[Long]("n_email") == 1L)
    assert(out(2L).getAs[String]("redacted") == "ssn [SSN] phone [PHONE] ip [IP]")
    assert(out(2L).getAs[Long]("n_ssn") == 1L)
    assert(out(2L).getAs[Long]("n_phone") == 1L)
    assert(out(2L).getAs[Long]("n_ip") == 1L)
    assert(out(3L).getAs[String]("redacted") == "two mails [EMAIL] [EMAIL] and ips [IP] [IP]")
    assert(out(3L).getAs[Long]("n_email") == 2L && out(3L).getAs[Long]("n_ip") == 2L)
    assert(out(4L).getAs[String]("redacted") == "nothing to redact here")
    assert(out(4L).getAs[Long]("n_email") == 0L)
  }

  test("pii patterns do not cross-match each other") {
    // an SSN is not a phone (3-2-4 vs 3-3-4) and an IP is not a phone
    val docs = Seq((1L, "123-45-6789 and 10.20.138.7")).toDF("doc_id", "text")
    val r = Curation.piiRedact(docs, "doc_id", "text").collect().head
    assert(r.getAs[String]("redacted") == "[SSN] and [IP]")
    assert(r.getAs[Long]("n_phone") == 0L)
  }

  test("urlNormalize: every canonicalization rule, hand-checked") {
    import spark.implicits._
    val cases = Seq(
      // case fold + www strip + default https port + fragment
      ("HTTPS://WWW.Ex.COM:443/A/B/#x", "https://ex.com/A/B"),
      // http default port; root path slash preserved
      ("http://ex.com:80/", "http://ex.com/"),
      // empty path becomes /
      ("https://ex.com", "https://ex.com/"),
      // non-default port kept
      ("https://ex.com:8443/p", "https://ex.com:8443/p"),
      // tracking params dropped, survivors sorted by key=value text
      ("https://ex.com/p?utm_source=a&z=1&a=2&gclid=g&fbclid=f&msclkid=m",
        "https://ex.com/p?a=2&z=1"),
      // all params tracking → no query at all
      ("https://ex.com/p?utm_medium=x", "https://ex.com/p"),
      // path case preserved, trailing slash stripped off non-root
      ("https://ex.com/CaseSensitive/", "https://ex.com/CaseSensitive"),
      // click ids are EXACT keys: gclid_src / fbclid2 are NOT tracking
      // params and must survive (utm_ stays a prefix family) — ADVICE r5
      ("https://ex.com/p?gclid_src=1&fbclid2=x&gclid=g&utm_x=1&msclkid",
        "https://ex.com/p?fbclid2=x&gclid_src=1"))
    val got = Curation.urlNormalize($"u")
    val out = cases.map(_._1).toDF("u").select(got).as[String].collect()
    cases.map(_._2).zip(out).foreach { case (want, g) =>
      assert(g == want, s"want $want got $g")
    }
    // schemeless input → null (quarantine upstream)
    val bad = Seq("ex.com/p", "//ex.com").toDF("u").select(got).collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("domainFilter drops blocklisted hosts via broadcast anti-join") {
    import spark.implicits._
    val d = Seq((1L, "https://a.com/x"), (2L, "https://www.B.com/y"),
      (3L, "https://c.com/z")).toDF("id", "url")
    val block = Seq("b.com").toDF("host")
    val kept = Curation.domainFilter(d, "url", block, "host")
      .select("id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 3L)))
    val plan = Curation.domainFilter(d, "url", block, "host")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("chunkPassages: boundaries, tail coverage, degenerate docs") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // n=10
      (2L, "one two"),                                // n <= window → 1 chunk
      (3L, "...")).toDF("doc_id", "text")             // 0 tokens → none
    val out = Curation.chunkPassages(df, "doc_id", "text",
        window = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // n=10, w=4, s=3 → ceil(6/3)+1 = 3 chunks at 0,3,6 — tail [6,10) len 4
    assert(d1.map(r => (r.getAs[Long]("start_tok"),
      r.getAs[Long]("n_tokens"), r.getAs[String]("chunk"))).toSeq == Seq(
      (0L, 4L, "t1 t2 t3 t4"), (3L, 4L, "t4 t5 t6 t7"),
      (6L, 4L, "t7 t8 t9 t10")))
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getAs[String]("chunk") == "one two"
      && d2(0).getAs[Long]("n_tokens") == 2L)
    assert(!out.exists(_.getLong(0) == 3L))
    // a short tail: n=11 → chunks at 0,3,6,9? ceil(7/3)+1 = 4; start 9 len 2
    val tail = Curation.chunkPassages(
      Seq((9L, (1 to 11).map("w" + _).mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", 4, 3).orderBy("chunk_idx").collect()
    assert(tail.map(r => (r.getAs[Long]("start_tok"),
      r.getAs[Long]("n_tokens"))).toSeq ==
      Seq((0L, 4L), (3L, 4L), (6L, 4L), (9L, 2L)))
    // zero shuffles: explode-in-place plan
    val plan = Curation.chunkPassages(df, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
