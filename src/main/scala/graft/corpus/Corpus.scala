package graft.corpus

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.extract.HtmlText
import graft.util.SplitMix64

/** North-rule corpus row (BASELINE.json input_hint):
  * Common-Crawl-style web page. `text` is the reference-extracted text,
  * stored at synthesis time; the engine re-extracts from `html` and must
  * match byte-for-byte per url (SURVEY.md §1.4).
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).
  *
  * Every row is a pure function of (seed, rowId) via [[SplitMix64.stream]],
  * so generation is identical under any partitioning/parallelism — the
  * property the cross-parallelism index-equivalence tests rely on.
  *
  * Vocabulary: 20,000 synthetic terms `w00000…w19999` under a Zipf(s=1.07)
  * rank distribution, mixed with ~50 high-frequency English stopwords that
  * create the hot-term skew the index build must defuse (SURVEY.md §7.5).
  */
object SyntheticCorpus {

  val VocabSize = 20000
  val ZipfS = 1.07

  /** Derive a first-`nTokens`-token "title" FIELD corpus from
    * (url, text, lang)-shaped rows: the multi_match fixtures' second
    * field as its own [[Page]] set — title text space-joined (analyzer
    * tokens are [a-z0-9]+ so re-tokenization is the identity) and html
    * re-wrapped so the build's html↔text byte-identity gate holds.
    * ONE definition shared by the gate query, the plan dump and the
    * spec, so the three can never drift. */
  def titleField(df: org.apache.spark.sql.DataFrame,
      nTokens: Int = 8): Dataset[Page] = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    import spark.implicits._
    val title = array_join(
      slice(graft.analyze.Analyzer.tokensCol(col("text")), 1, nTokens), " ")
    df.select(col("url"),
        lit(Timestamp.valueOf("2026-01-01 00:00:00")).as("warc_ts"),
        encode(concat(lit("<html><body><p>"), title,
          lit("</p></body></html>")), "UTF-8").as("html"),
        title.as("text"), col("lang"))
      .as[Page]
  }

  val Stopwords: Array[String] = Array(
    "the", "of", "and", "a", "to", "in", "is", "you", "that", "it",
    "he", "was", "for", "on", "are", "as", "with", "his", "they", "i",
    "at", "be", "this", "have", "from", "or", "one", "had", "by", "word",
    "but", "not", "what", "all", "were", "we", "when", "your", "can", "said",
    "there", "use", "an", "each", "which", "she", "do", "how", "their", "if")

  /** P(stopword) per emitted token — stopwords are ~40% of all tokens,
    * mirroring real web text and guaranteeing skewed document frequency. */
  val StopwordProb = 0.40

  // Zipf CDF over vocabulary ranks; pure double math, identical on every JVM.
  private lazy val zipfCdf: Array[Double] = {
    val w = new Array[Double](VocabSize)
    var sum = 0.0
    var k = 0
    while (k < VocabSize) {
      w(k) = 1.0 / math.pow(k + 1.0, ZipfS)
      sum += w(k)
      k += 1
    }
    var acc = 0.0
    k = 0
    while (k < VocabSize) {
      acc += w(k) / sum
      w(k) = acc
      k += 1
    }
    w(VocabSize - 1) = 1.0
    w
  }

  def term(rank: Int): String = f"w$rank%05d"

  private def sampleTerm(rng: SplitMix64): String = {
    if (rng.nextDouble() < StopwordProb) Stopwords(rng.nextInt(Stopwords.length))
    else {
      val u = rng.nextDouble()
      var lo = 0
      var hi = VocabSize - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (zipfCdf(mid) < u) lo = mid + 1 else hi = mid
      }
      term(lo)
    }
  }

  private val Tlds = Array("com", "org", "net")
  private val Langs = Array("de", "fr", "und")
  private val Entities = Array("&amp;", "&lt;", "&gt;", "&quot;")
  private val EpochUtc = 1767225600000L // 2026-01-01T00:00:00Z
  private val ThirtyDaysSec = 30L * 24 * 3600

  /** Generate one page; pure in (seed, rowId). */
  def page(seed: Long, rowId: Long): Page = {
    val rng = SplitMix64.stream(seed, rowId)
    val host = rng.nextInt(1000)
    val tld = Tlds(rng.nextInt(3))
    val url = s"https://host$host.example.$tld/p/$rowId"
    val ts = new Timestamp(EpochUtc + (rowId % ThirtyDaysSec) * 1000L)
    val lang =
      if (rng.nextDouble() < 0.90) "en" else Langs(rng.nextInt(3))

    val sb = new java.lang.StringBuilder(2048)
    sb.append("<html><head><title>")
    appendWords(sb, rng, 2 + rng.nextInt(4), rng)
    sb.append("</title>\n<style type=\"text/css\">body { margin: 0; color: #")
    sb.append(f"${rng.nextInt(0xffffff)}%06x")
    sb.append("; }</style>\n<script src=\"/app.js\">var skip_me = ")
    sb.append(rng.nextInt(100000))
    sb.append("; function f() { return \"never indexed\"; }</script></head>\n<body>\n")
    val blocks = 1 + rng.nextInt(40)
    var b = 0
    while (b < blocks) {
      val words = 5 + rng.nextInt(56)
      rng.nextInt(6) match {
        case 0 =>
          sb.append("<h1 class=\"c").append(rng.nextInt(9)).append("\">")
          appendWords(sb, rng, words, rng); sb.append("</h1>\n")
        case 1 =>
          sb.append("<h2>"); appendWords(sb, rng, words, rng); sb.append("</h2>\n")
        case 2 =>
          sb.append("<ul><li>"); appendWords(sb, rng, words, rng); sb.append("</li></ul>\n")
        case 3 =>
          sb.append("<a href=\"/p/").append(rng.nextInt(100000)).append("\">")
          appendWords(sb, rng, words, rng); sb.append("</a>\n")
        case _ =>
          sb.append("<p>"); appendWords(sb, rng, words, rng); sb.append("</p>\n")
      }
      b += 1
    }
    sb.append("</body></html>\n")
    val html = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Page(url, ts, html, HtmlText.extract(html), lang)
  }

  /** Append `n` vocabulary words; occasionally an entity token or an
    * `&nbsp;` joiner — all within the extractor's exactly-specified subset. */
  private def appendWords(
      sb: java.lang.StringBuilder, rng: SplitMix64, n: Int, wordRng: SplitMix64): Unit = {
    var i = 0
    while (i < n) {
      if (i > 0) {
        // joiner: mostly a space, sometimes &nbsp; (preserved as U+00A0),
        // sometimes a newline (collapses to space)
        val j = rng.nextInt(20)
        if (j == 0) sb.append("&nbsp;")
        else if (j == 1) sb.append('\n')
        else sb.append(' ')
      }
      val r = rng.nextInt(30)
      if (r == 0) sb.append(Entities(rng.nextInt(Entities.length)))
      else {
        var w = sampleTerm(wordRng)
        if (r == 1) w = w.toUpperCase(java.util.Locale.ROOT)
        sb.append(w)
      }
      i += 1
    }
  }

  /** Distributed generation: `n` pages, one row per id in [0, n). */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).map(id => page(seed, id))
  }

  /** Fixture query set (FIXTURES.md §2): 50 deterministic queries —
    * 20 single-term (10 hot head / 10 tail), 20 two-term, 10 longer
    * stopword-heavy ones that stress WAND skipping. */
  def querySet(seed: Long = 42L): Seq[Seq[String]] = {
    val rng = SplitMix64.stream(seed, -1L)
    val head = (0 until 10).map(i => Seq(term(i)))
    val tail = (0 until 10).map(_ => Seq(term(10000 + rng.nextInt(10000))))
    val two = (0 until 20).map { _ =>
      Seq(term(rng.nextInt(200)), term(200 + rng.nextInt(19800)))
    }
    val long = (0 until 10).map { i =>
      val len = 3 + rng.nextInt(3)
      (0 until len).map { j =>
        if (j % 2 == 0) Stopwords(rng.nextInt(Stopwords.length))
        else term(rng.nextInt(5000))
      }.distinct
    }
    head ++ tail ++ two ++ long
  }
}
