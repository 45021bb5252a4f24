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

  /** 64-bit document fingerprint: FNV-1a-style fold of the token hash
    * stream — order-sensitive (a rolling hash over the token sequence),
    * expressed with `aggregate` over the token array (codegen'd). */
  def fingerprint(text: Column): Column =
    aggregate(Analyzer.tokensCol(text), lit(-3750763034362895579L), // FNV offset basis
      (acc, tok) => (acc.bitwiseXOR(xxhash64(tok))) * lit(1099511628211L)) // FNV prime

  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fingerprint"))
}
