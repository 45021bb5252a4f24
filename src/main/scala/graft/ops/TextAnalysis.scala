package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analyze.Analyzer

/** Text analysis operators for a training-data pipeline: language id,
  * quality scoring, token counting, document fingerprinting. All pure
  * Column expressions (codegen'd, pushdown-friendly) — no UDF anywhere.
  */
object TextAnalysis {

  /** Marker stopwords per language for the n-gram/stopword language-id
    * heuristic. Deliberately tiny and deterministic. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pas", "pour", "que", "dans"))

  /** Language-id heuristic: argmax over marker-hit counts, `und` when no
    * language reaches `minRatio` of tokens. Adds `lang_pred`. */
  def langId(df: DataFrame, textCol: String, minRatio: Double = 0.05,
      out: String = "lang_pred"): DataFrame = {
    val toks = Analyzer.tokensCol(col(textCol))
    val withToks = df.withColumn("_toks", toks)
    val hitCols = LangMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      lang -> size(filter(col("_toks"), t => t.isin(ms: _*)))
    }
    val total = greatest(size(col("_toks")), lit(1)).cast("double")
    // argmax with deterministic tie-break on language name order
    val best = hitCols.foldLeft((lit("und"), lit(-1L))) {
      case ((bl, bh), (lang, hits)) =>
        val h = hits.cast("long")
        (when(h > bh, lit(lang)).otherwise(bl), when(h > bh, h).otherwise(bh))
    }
    withToks
      .withColumn(out,
        when(best._2.cast("double") / total >= minRatio, best._1).otherwise(lit("und")))
      .drop("_toks")
  }

  /** Quality metrics + combined score in [0,1]:
    * length, alpha ratio, stopword ratio, mean token length, digit ratio.
    * The score is a fixed linear blend — deterministic, explainable, and
    * fully codegen'd (a 100 TB corpus pass is one projection). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = Analyzer.tokensCol(t)
    val nToks = size(toks).cast("double")
    val nChars = length(t).cast("double")
    val stop = graft.corpus.SyntheticCorpus.Stopwords.toSeq
    val stopHits = size(filter(toks, x => x.isin(stop: _*))).cast("double")
    val alphaChars = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
    val digitChars = length(regexp_replace(t, "[^0-9]", "")).cast("double")

    val safeToks = greatest(nToks, lit(1.0))
    val safeChars = greatest(nChars, lit(1.0))
    val meanTokLen = (aggregate(toks, lit(0L), (a, x) => a + length(x)).cast("double") / safeToks)

    val stopRatio = stopHits / safeToks
    val alphaRatio = alphaChars / safeChars
    val digitRatio = digitChars / safeChars
    // in-range components → blended score
    val lenScore = least(nToks / lit(100.0), lit(1.0))
    val stopScore = least(stopRatio / lit(0.3), lit(1.0))
    val alphaScore = alphaRatio
    val wordLenScore = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    val score =
      lenScore * 0.25 + stopScore * 0.25 + alphaScore * 0.25 +
        wordLenScore * 0.15 + (lit(1.0) - digitRatio) * 0.10

    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_chars", length(t).cast("long"))
      .withColumn("stopword_ratio", round(stopRatio, 6))
      .withColumn("alpha_ratio", round(alphaRatio, 6))
      .withColumn("digit_ratio", round(digitRatio, 6))
      .withColumn("mean_token_len", round(meanTokLen, 6))
      .withColumn("quality_score", round(score, 6))
  }

  /** Token counting, two ways: whitespace tokens and a BPE-ish regex
    * (`\p{L}+|\p{N}+|punct`) that approximates subword pre-tokenization. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("ws_tokens",
        size(filter(split(t, "\\s+"), x => x =!= "")).cast("long"))
      .withColumn("bpe_tokens",
        size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
  }

  /** Token-diversity signals (Gopher-adjacent quality features): distinct
    * token count, type-token ratio, and unigram Shannon entropy (nats)
    * over the analyzer's token stream. Docs with zero tokens drop (no
    * distribution to measure).
    *
    * Determinism contract: the entropy sum runs as a LEFT FOLD over the
    * doc's (term, count) pairs sorted by term — `aggregate` over a
    * `sort_array`'d list — so the IEEE accumulation order is a pure
    * function of the document, never of partitioning; the DuckDB oracle
    * mirrors the same fold over `list(... ORDER BY term)`. Both round at
    * 1e-6, far above fold-order noise.
    *
    * Scale shape: two shuffles, both keyed by (doc, term) / doc — no hot
    * key beyond one document's vocabulary, which is bounded by doc length
    * (same bound qualityScore's token array already implies). */
  def tokenDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = df.select(col(idCol).as("doc_id"),
      explode(Analyzer.tokensCol(col(textCol))).as("term"))
    val counts = t.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    val byDoc = counts.groupBy("doc_id").agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sort_array(collect_list(struct(col("term"), col("c")))).as("tc"))
    val n = col("n_tokens").cast("double")
    byDoc.select(
      col("doc_id"), col("n_tokens"), col("n_types"),
      round(col("n_types").cast("double") / n, 6).as("type_token_ratio"),
      round(aggregate(col("tc"), lit(0.0), (acc, x) => {
        val p = x.getField("c").cast("double") / n
        acc - p * log(p)
      }), 6).as("unigram_entropy"))
  }

  // ------------------------------------------------- repetition signals

  /** Word n-grams as space-joined strings; empty array when the document
    * is shorter than n (guarded — `sequence(1, 0)` would DESCEND).
    * `private[ops]`: [[Dedup.duplicateSpans]] reuses it so span windows
    * and repetition n-grams share one definition. */
  private[ops] def ngramsCol(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Chars covered by the MOST FREQUENT element of a sorted array
    * (count × element length; selection by count desc, chars desc,
    * element asc — deterministic). One run-length pass over the sorted
    * array via `aggregate`: per-row, no shuffle, constant state. */
  private def topRunChars(sorted: Column): Column = {
    val zero = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("bestRun"), lit(0L).as("bestChars"))
    aggregate(sorted, zero,
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        val chars = run * length(x).cast("long")
        val better = run > acc.getField("bestRun") ||
          (run === acc.getField("bestRun") && chars > acc.getField("bestChars"))
        struct(x.as("prev"), run.as("run"),
          when(better, run).otherwise(acc.getField("bestRun")).as("bestRun"),
          when(better, chars).otherwise(acc.getField("bestChars")).as("bestChars"))
      },
      acc => acc.getField("bestChars"))
  }

  /** Chars covered by elements occurring ≥ 2 times in a sorted array
    * (Σ count × length over duplicated elements). Incremental: a run's
    * 2nd occurrence retro-adds the 1st (`2×len`), later ones add 1×len —
    * no lookahead, constant state. */
  private def dupRunChars(sorted: Column): Column = {
    val zero = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("chars"))
    aggregate(sorted, zero,
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        val add = when(run === 2L, length(x).cast("long") * 2L)
          .when(run > 2L, length(x).cast("long"))
          .otherwise(lit(0L))
        struct(x.as("prev"), run.as("run"),
          (acc.getField("chars") + add).as("chars"))
      },
      acc => acc.getField("chars"))
  }

  /** Count of instances occurring ≥ 2 times in a sorted array. */
  private def dupRunCount(sorted: Column): Column = {
    val zero = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("cnt"))
    aggregate(sorted, zero,
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        val add = when(run === 2L, lit(2L)).when(run > 2L, lit(1L)).otherwise(lit(0L))
        struct(x.as("prev"), run.as("run"), (acc.getField("cnt") + add).as("cnt"))
      },
      acc => acc.getField("cnt"))
  }

  private def occurrences(t: Column, lit0: String): Column =
    ((length(t) - length(replace(t, lit(lit0), lit("")))) / lit0.length).cast("long")

  /** Gopher-style repetition / boilerplate signals (Rae et al. 2021,
    * "Scaling Language Models: Methods, Analysis & Insights from Training
    * Gopher", table A1 — public knowledge; thresholds are left to the
    * caller, this emits the raw fractions):
    *
    *  - `top_{2,3,4}gram_char_frac` — chars covered by the most frequent
    *    word n-gram / chars of the space-joined token stream
    *  - `dup_{5,10}gram_char_frac` — chars covered by all n-grams
    *    occurring ≥ 2 times / same denominator (overlaps double-count, so
    *    capped at 1.0 — the convention of open implementations)
    *  - `dup_line_frac`, `dup_line_char_frac` — duplicate non-blank line
    *    instances (count / chars) over all non-blank lines
    *  - `ellipsis_line_frac`, `bullet_line_frac` — boilerplate shape
    *  - `symbol_word_ratio` — (`#` + ellipsis occurrences) / words
    *
    * Everything is a per-row array fold over sorted n-gram/line arrays —
    * narrow (zero shuffles, a 100 TB pass is one projection), constant
    * per-row state. HOF lambdas sit outside whole-stage codegen but on
    * the same no-shuffle footing as the minhash kernel. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol) +: repetitionSignalCols(col(textCol))
      .map { case (n, c) => c.as(n) }: _*)

  /** The named, round(6) repetition-signal columns for a text column —
    * shared between [[repetitionSignals]] and [[Curation.gopherFilter]]
    * so thresholds apply to exactly the reported values. */
  private[ops] def repetitionSignalCols(t: Column): Seq[(String, Column)] = {
    val toks = Analyzer.tokensCol(t)
    val totChars = greatest(length(concat_ws(" ", toks)), lit(1)).cast("double")

    def topFrac(n: Int): Column =
      least(topRunChars(sort_array(ngramsCol(toks, n))).cast("double") / totChars, lit(1.0))
    def dupFrac(n: Int): Column =
      least(dupRunChars(sort_array(ngramsCol(toks, n))).cast("double") / totChars, lit(1.0))

    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => l =!= "")
    val sortedLines = sort_array(lines)
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val lineChars = greatest(aggregate(lines, lit(0L), (a, x) => a + length(x)), lit(1L)).cast("double")
    val nWords = greatest(size(toks), lit(1)).cast("double")

    Seq(
      "top_2gram_char_frac" -> round(topFrac(2), 6),
      "top_3gram_char_frac" -> round(topFrac(3), 6),
      "top_4gram_char_frac" -> round(topFrac(4), 6),
      "dup_5gram_char_frac" -> round(dupFrac(5), 6),
      "dup_10gram_char_frac" -> round(dupFrac(10), 6),
      "dup_line_frac" -> round(dupRunCount(sortedLines).cast("double") / nLines, 6),
      "dup_line_char_frac" -> round(dupRunChars(sortedLines).cast("double") / lineChars, 6),
      "ellipsis_line_frac" -> round(size(filter(lines, l => l.endsWith("...") || l.endsWith("…")))
        .cast("double") / nLines, 6),
      "bullet_line_frac" -> round(size(filter(lines, l => l.startsWith("- ") || l.startsWith("* ") ||
        l.startsWith("• "))).cast("double") / nLines, 6),
      "symbol_word_ratio" -> round((occurrences(t, "#") + occurrences(t, "...") + occurrences(t, "…"))
        .cast("double") / nWords, 6))
  }

  /** 64-bit document fingerprint: FNV-1a-style fold of the token hash
    * stream — order-sensitive (a rolling hash over the token sequence),
    * expressed with `aggregate` over the token array (codegen'd). */
  def fingerprint(text: Column): Column =
    aggregate(Analyzer.tokensCol(text), lit(-3750763034362895579L), // FNV offset basis
      (acc, tok) => (acc.bitwiseXOR(xxhash64(tok))) * lit(1099511628211L)) // FNV prime

  /** Same fold with per-token hash = first 8 bytes of md5 (the
    * cross-engine-verifiable mode, [[Dedup.md5Hash64]]) — a SQL engine
    * reproduces it exactly via `list_reduce` over
    * `('0x'||substr(md5(t),1,16))::UBIGINT` with wrapping 64-bit
    * multiplication, which is how the q_fingerprint oracle checks it. */
  def fingerprintMd5(text: Column): Column = {
    val f = udf { (toks: Seq[String]) =>
      var acc = -3750763034362895579L
      if (toks != null) toks.foreach(t => acc = (acc ^ Dedup.md5Hash64(t)) * 1099511628211L)
      acc
    }
    f(Analyzer.tokensCol(text))
  }

  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      tokenHash: String = "xxh64"): DataFrame = {
    require(tokenHash == "xxh64" || tokenHash == "md5", s"unknown tokenHash $tokenHash")
    val fp = if (tokenHash == "md5") fingerprintMd5(col(textCol)) else fingerprint(col(textCol))
    df.select(col(idCol), fp.as("fingerprint"))
  }
}
