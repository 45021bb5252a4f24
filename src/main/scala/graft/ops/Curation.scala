package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.analyze.Analyzer

/** Corpus-curation operators for a training-data pipeline: benchmark
  * decontamination, Gopher/C4-style quality filtering, and PII redaction.
  *
  * All three are standard large-corpus preparation steps (Brown et al.
  * 2020 §C eval decontamination; Rae et al. 2021 table A1 quality rules;
  * Raffel et al. 2020 §2.2 C4 heuristics — public papers). Everything is
  * Column-algebra + one keyed aggregation where unavoidable; nothing
  * collects to the driver.
  */
object Curation {

  // ------------------------------------------------- decontamination

  /** Flag documents sharing ≥ `minOverlap` distinct word `n`-grams with an
    * eval/benchmark set (the GPT-3-style 13-gram collision rule; `n` is a
    * parameter because tiny fixtures need shorter grams).
    *
    * Scale shape: the eval side (benchmark suites — at most ~10^6 grams)
    * reduces to DISTINCT 8-byte xxhash64 gram hashes and broadcasts; the
    * corpus side streams `(docId, gramHash)` pairs through a broadcast
    * semi-join — no shuffle of text, no shuffle of the corpus at all until
    * the per-doc `groupBy(docId).count`, whose input is only the MATCHING
    * pairs (contamination is rare, so that shuffle is tiny). Joining on
    * the 64-bit hash instead of the gram string cuts shuffle bytes ~10×;
    * the collision risk at 10^6 eval grams is ~2^-44 per corpus gram.
    *
    * Output: one row per input doc — `overlap_ngrams` (distinct grams of
    * this doc also present in the eval set) and `contaminated`.
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      eval: DataFrame, evalTextCol: String, n: Int = 13,
      minOverlap: Int = 1): DataFrame = {
    def gramHashes(t: Column): Column =
      array_distinct(transform(
        TextAnalysis.ngramsCol(Analyzer.tokensCol(t), n), g => xxhash64(g)))
    val docGrams = docs.select(col(idCol),
      explode(gramHashes(col(textCol))).as("gh"))
    val evalGrams = eval.select(explode(gramHashes(col(evalTextCol))).as("gh"))
      .distinct()
    val hits = docGrams.join(broadcast(evalGrams), "gh")
      .groupBy(idCol).agg(count(lit(1)).as("overlap_ngrams"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .na.fill(0L, Seq("overlap_ngrams"))
      .withColumn("contaminated", col("overlap_ngrams") >= minOverlap)
  }

  // ------------------------------------------------- quality filtering

  /** Thresholds for [[gopherFilter]]; defaults follow Rae et al. 2021
    * table A1 (word count, mean word length, symbol ratio, bullet/ellipsis
    * lines, alpha-word fraction, stopword presence) and the published
    * repetition cutoffs. */
  final case class GopherRules(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minAlphaWordFrac: Double = 0.80, minDistinctStopwords: Int = 2,
      maxSymbolWordRatio: Double = 0.10, maxBulletLineFrac: Double = 0.90,
      maxEllipsisLineFrac: Double = 0.30,
      maxTop2GramFrac: Double = 0.20, maxTop3GramFrac: Double = 0.18,
      maxTop4GramFrac: Double = 0.16, maxDup5GramFrac: Double = 0.15,
      maxDup10GramFrac: Double = 0.10, maxDupLineFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20)

  /** Gopher-style document quality filter: evaluates every rule, emits
    * `keep` plus a deterministic comma-joined `reasons` list of the failed
    * rules (empty = keep). One narrow projection over the corpus — the
    * repetition signals are per-row array folds ([[TextAnalysis]]), so a
    * 100 TB filtering pass has zero shuffles and prunes to (id, text).
    *
    * Thresholds compare against the SAME round(6) values the signal
    * operators report, so filter decisions are reproducible from the
    * signal dumps (and engine-independent: the DuckDB oracle applies the
    * identical rounded comparisons). */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      rules: GopherRules = GopherRules()): DataFrame = {
    val t = col(textCol)
    val toks = Analyzer.tokensCol(t)
    val nToks = size(toks).cast("long")
    val safeToks = greatest(size(toks), lit(1)).cast("double")
    val meanTokLen = round(
      aggregate(toks, lit(0L), (a, x) => a + length(x)).cast("double") / safeToks, 6)
    val alphaWordFrac = round(
      size(filter(toks, x => x.rlike("[a-z]"))).cast("double") / safeToks, 6)
    val stop = graft.corpus.SyntheticCorpus.Stopwords.toSeq
    val distinctStops = size(array_distinct(filter(toks, x => x.isin(stop: _*))))

    val sig = TextAnalysis.repetitionSignalCols(t).toMap
    val r = rules
    // (rule name, PASS condition) in fixed order — `reasons` lists fails
    val checks: Seq[(String, Column)] = Seq(
      "word_count" -> nToks.between(r.minWords, r.maxWords),
      "mean_word_length" -> meanTokLen.between(r.minMeanWordLen, r.maxMeanWordLen),
      "alpha_words" -> (alphaWordFrac >= r.minAlphaWordFrac),
      "stopwords" -> (distinctStops >= r.minDistinctStopwords),
      "symbol_ratio" -> (sig("symbol_word_ratio") <= r.maxSymbolWordRatio),
      "bullet_lines" -> (sig("bullet_line_frac") <= r.maxBulletLineFrac),
      "ellipsis_lines" -> (sig("ellipsis_line_frac") <= r.maxEllipsisLineFrac),
      "top_ngram" -> (sig("top_2gram_char_frac") <= r.maxTop2GramFrac &&
        sig("top_3gram_char_frac") <= r.maxTop3GramFrac &&
        sig("top_4gram_char_frac") <= r.maxTop4GramFrac),
      "dup_ngram" -> (sig("dup_5gram_char_frac") <= r.maxDup5GramFrac &&
        sig("dup_10gram_char_frac") <= r.maxDup10GramFrac),
      "dup_lines" -> (sig("dup_line_frac") <= r.maxDupLineFrac &&
        sig("dup_line_char_frac") <= r.maxDupLineCharFrac))
    val reasons = concat_ws(",",
      checks.map { case (name, pass) => when(!pass, lit(name)) }: _*)
    df.select(col(idCol), nToks.as("n_tokens"),
      (reasons === "").as("keep"), reasons.as("reasons"))
  }

  // ------------------------------------------------- sequence packing

  /** GPT-style sequence packing layout: documents in doc-id order are
    * laid out back-to-back in token space and cut every `budgetTokens`
    * (the concat-and-chunk regime LLM training pipelines use — a doc may
    * straddle a boundary). Emits each doc's global `start_offset` plus
    * the first/last training bin it touches.
    *
    * Scale shape: the global prefix sum is two-phase, like the index's
    * docId assignment — per-id-chunk token sums (one keyed aggregate)
    * prefix-summed on the driver (n/chunk scalars), then a per-chunk
    * sorted fold assigns within-chunk offsets; no single-partition
    * window anywhere (the naive `sum() OVER (ORDER BY id)` plan funnels
    * 10^12 rows through ONE task). Deterministic for any partitioning.
    *
    * Driver-memory bound: the phase-1 collect holds one (chunkId, sum)
    * pair per id-chunk. With `chunk = 0` (default: auto) the chunk width
    * is derived from the id RANGE so at most ~2^20 chunks exist — ≤ ~32 MB
    * on the driver at ANY corpus size (at 10^12 docs the fixed 8192
    * default would collect 1.2×10^8 entries, gigabytes). The sizing pass
    * is one min/max aggregate over the id column. Offsets are
    * chunk-size-invariant (CurationSpec pins two widths byte-identical).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long, chunk: Long = 0L): DataFrame = {
    require(budgetTokens > 0 && chunk >= 0)
    val counted = df.select(col(idCol).cast("long").as("id"),
      size(Analyzer.tokensCol(col(textCol))).cast("long").as("n"))
    val chunkW =
      if (chunk > 0) chunk
      else {
        val r = counted.agg(min("id"), max("id")).head()
        if (r.isNullAt(0)) 8192L
        else {
          val span = r.getLong(1) - r.getLong(0) + 1
          math.max(8192L, (span + (1L << 20) - 1) / (1L << 20))
        }
      }

    // phase 1: per-chunk totals -> driver prefix (tiny) -> broadcast
    val chunkOf = expr(s"id DIV $chunkW")
    val sums = counted.groupBy(chunkOf.as("c"))
      .agg(sum("n").as("cn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = scala.collection.mutable.LongMap.empty[Long]
    var acc = 0L
    sums.foreach { case (c, cn) => offsets(c) = acc; acc += cn }
    val bc = df.sparkSession.sparkContext.broadcast(offsets)

    // phase 2: within-chunk fold over the id-sorted docs of each chunk
    // (bounded: <= `chunk` rows per group)
    val packFold = udf { (c: Long, docs: Seq[Row]) =>
      var off = bc.value(c)
      docs.map { r =>
        val start = off
        off += r.getLong(1)
        (r.getLong(0), r.getLong(1), start)
      }
    }
    counted
      .groupBy(chunkOf.as("c"))
      .agg(sort_array(collect_list(struct(col("id"), col("n")))).as("docs"))
      .select(explode(packFold(col("c"), col("docs"))).as("p"))
      .select(col("p._1").as(idCol), col("p._2").as("n_tokens"),
        col("p._3").as("start_offset"))
      .withColumn("bin_first", expr(s"start_offset DIV $budgetTokens"))
      .withColumn("bin_last", when(col("n_tokens") > 0,
          expr(s"(start_offset + n_tokens - 1) DIV $budgetTokens"))
        .otherwise(expr(s"start_offset DIV $budgetTokens")))
  }

  /** Overlapping token-window chunking (RAG passages / training context
    * windows, the HF `return_overflowing_tokens` convention): chunk i
    * covers tokens `[i*stride, i*stride + window)`; chunk count is
    * `ceil((n - window) / stride) + 1` (one chunk when `n <= window`),
    * so the tail is covered exactly once and no start index exceeds the
    * document. Zero-token docs produce no chunks. One row per chunk:
    * `(doc_id, chunk_idx 0-based, start_tok, n_tokens, chunk)` with the
    * chunk re-joined by single spaces (analyzer tokens carry no
    * whitespace of their own).
    *
    * Scale shape: pure Column algebra — tokenize, one `sequence` +
    * `transform`, one explode; zero shuffles, rows fan out in place. */
  def chunkPassages(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride in [1, window], got $stride")
    val toks = Analyzer.tokensCol(col(textCol))
    val n = size(toks)
    val nChunks = when(n <= window, lit(1)).otherwise(
      ceil((n - window).cast("double") / stride).cast("int") + 1)
    df.select(col(idCol).as("doc_id"), toks.as("_toks"), n.as("_n"),
        nChunks.as("_k"))
      .where(col("_n") > 0)
      .select(col("doc_id"), col("_n"),
        explode(transform(sequence(lit(0), col("_k") - 1), i => struct(
          i.as("chunk_idx"),
          (i * stride).as("start_tok"),
          slice(col("_toks"), i * stride + 1, lit(window)).as("toks")))).as("c"))
      .select(col("doc_id"),
        col("c.chunk_idx").cast("long").as("chunk_idx"),
        col("c.start_tok").cast("long").as("start_tok"),
        size(col("c.toks")).cast("long").as("n_tokens"),
        concat_ws(" ", col("c.toks")).as("chunk"))
  }

  // ------------------------------------------------- PII redaction

  /** (type, regex, replacement) in APPLICATION ORDER. The regexes are
    * RE2-compatible (no lookaround/backreferences) so the same pattern
    * runs identically under java.util.regex and RE2-family engines;
    * digits are `[0-9]` explicitly to pin ASCII semantics. Email is
    * replaced first (addresses contain digits that later patterns could
    * shred); SSN (3-2-4) before phone (3-3-4); IP last. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[SSN]"),
    ("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "[PHONE]"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"))

  /** Redact PII (reference: the obfuscate processor's predefined-pattern
    * mode, ObfuscationProcessor + patterns config): per-type match counts
    * on the ORIGINAL text plus the redacted text after applying every
    * pattern in [[PiiPatterns]] order. Pure codegen'd regexp projection —
    * no UDF, no shuffle. */
  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val redacted = PiiPatterns.foldLeft(t) { case (acc, (_, re, repl)) =>
      regexp_replace(acc, re, repl)
    }
    val counts = PiiPatterns.map { case (name, re, _) =>
      size(regexp_extract_all(t, lit(re), lit(0))).cast("long").as(s"n_$name")
    }
    df.select(col(idCol) +: redacted.as("redacted") +: counts: _*)
  }

  // ------------------------------------------------- URL curation

  /** Tracking query parameters dropped by [[urlNormalize]] (public
    * convention: C4/crawl-dedup pipelines strip click-tracking params
    * before URL-level dedup). `utm_` is a KEY-PREFIX family (utm_source,
    * utm_medium, …); the click ids match as EXACT keys — `gclid=x` drops
    * but `gclid_src=1`/`fbclid2=x` survive (ADVICE r5: a bare startsWith
    * on the full `key=value` string silently stripped those). */
  val TrackingKeyPrefixes: Seq[String] = Seq("utm_")
  val TrackingExactKeys: Seq[String] = Seq("gclid", "fbclid", "msclkid")

  /** Canonicalize an absolute `scheme://host...` URL for URL-level dedup
    * — the step crawl pipelines run BEFORE content dedup so trivially
    * aliased pages collapse (Raffel et al. 2020 §2.2 dedupes at the URL
    * level; Common Crawl publishes canonical-URL guidance). Rules, in
    * order:
    *
    *  1. scheme and host lowercase; leading `www.` dropped
    *  2. default ports dropped (`:80` for http, `:443` for https)
    *  3. fragment dropped
    *  4. tracking params dropped ([[TrackingKeyPrefixes]] by key prefix,
    *     [[TrackingExactKeys]] by exact key); surviving query
    *     params sorted by full `key=value` text (stable, engine-neutral)
    *  5. trailing `/` dropped from non-root paths; empty path → `/`
    *
    * Pure codegen'd Column algebra (regexp extracts + one array
    * filter/sort fold) — a 10^12-row canonicalization pass is one
    * projection, and the DuckDB oracle replays every rule with the same
    * regexes (q_url_normalize). Input must carry an explicit scheme —
    * schemeless rows come back null (quarantine them upstream). */
  def urlNormalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val rest = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val hostPort = regexp_extract(noFrag, "^([^/?]*)", 1)
    val pathQuery = regexp_replace(noFrag, "^[^/?]*", "")
    val host = regexp_replace(
      lower(regexp_extract(hostPort, "^([^:]*)", 1)), "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_extract(pathQuery, "^([^?]*)", 1)
    val path = when(length(path0) > 1, regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val query0 = regexp_extract(pathQuery, "\\?(.*)$", 1)
    val live = filter(split(query0, "&"), p => {
      val tracked =
        TrackingKeyPrefixes.map(t => p.startsWith(t)) ++
          // exact key: `key=…` or a valueless bare `key`
          TrackingExactKeys.flatMap(t => Seq(p.startsWith(t + "="), p === t))
      p =!= "" && !tracked.reduce(_ || _)
    })
    val q = array_join(array_sort(live), "&")
    when(scheme === "", lit(null).cast("string")).otherwise(concat(
      scheme, lit("://"), host, keepPort,
      when(path === "", lit("/")).otherwise(path),
      when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** Registrable host of a normalized URL (the per-domain grouping key for
    * [[domainStats]]/[[domainFilter]]). */
  def hostOf(url: Column): Column =
    regexp_extract(urlNormalize(url), "^[a-z][a-z0-9+.-]*://([^/:?]*)", 1)

  /** Per-domain corpus profile: doc count + mean doc size — the table a
    * curator eyeballs (or thresholds) to build a blocklist. One keyed
    * aggregation with map-side partial combine. */
  def domainStats(df: DataFrame, urlCol: String, sizeCol: String): DataFrame =
    df.select(hostOf(col(urlCol)).as("host"), col(sizeCol).cast("double").as("sz"))
      .groupBy("host")
      .agg(count(lit(1)).as("docs"), round(avg("sz"), 4).as("mean_size"))

  /** Drop documents whose host appears in a blocklist (C4's badlist step).
    * The blocklist is small by nature → broadcast LEFT ANTI join; the
    * corpus side never shuffles. */
  def domainFilter(df: DataFrame, urlCol: String,
      blocklist: DataFrame, blockHostCol: String): DataFrame = {
    // collision-proof temp name (ADVICE r5): a caller column named "_host"
    // must survive the join untouched
    var h = "_host"
    while (df.columns.contains(h)) h += "_"
    df.withColumn(h, hostOf(col(urlCol)))
      .join(broadcast(blocklist.select(col(blockHostCol).as(h)).distinct()),
        Seq(h), "left_anti")
      .drop(h)
  }
}
