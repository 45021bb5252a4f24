package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Analysis-chain options — OpenSearch's `stop` and `porter_stem` token
  * filters (the reference hands per-index analysis chains to OpenSearch;
  * `opensearch/.../OpenSearchSink.java` ships the mapping, OpenSearch
  * runs the chain). The engine applies an analysis chain as a CORPUS
  * TRANSFORM: rewrite the text column to the filtered/stemmed token
  * stream (space-joined — tokens are [a-z0-9]+ so re-tokenization is the
  * identity on them), index the transformed corpus with the UNCHANGED
  * normative tokenizer, and push query terms through the same chain.
  * That keeps the four-way tokenizer agreement (index build / brute
  * oracle / query parse / DuckDB SQL) a single invariant instead of one
  * per analyzer, and an analyzer change is what it really is at 100 TB:
  * a reindex of the corpus, not a runtime flag.
  *
  * Both transforms are zero-shuffle projections; `porterStem` runs the
  * [[Porter]] kernel per token inside one UDF seam (the stemmer is
  * recursive-conditional — not Column algebra).
  */
object Analysis {

  /** Lucene's `_english_` stop set (public list — the default of
    * OpenSearch's `stop` filter). */
  val EnglishStopWords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /** `stop` filter as a corpus transform: text → its token stream minus
    * the stop set, space-joined. Pure Column algebra, zero shuffles. */
  def stopFilter(df: DataFrame, textCol: String,
      stopWords: Seq[String] = EnglishStopWords): DataFrame = {
    val stops = stopWords.map(Analyzer.lowerLikeCatalyst)
    df.withColumn(textCol,
      array_join(
        filter(Analyzer.tokensCol(col(textCol)),
          t => !t.isin(stops: _*)),
        " "))
  }

  private val stemUdf = udf { (toks: Seq[String]) =>
    if (toks == null) null else toks.map(Porter.stem)
  }

  /** `porter_stem` filter as a corpus transform: text → its token stream
    * with each token Porter-stemmed, space-joined. One projection. */
  def porterStem(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol,
      array_join(stemUdf(Analyzer.tokensCol(col(textCol))), " "))

  /** Query-side chain: the SAME normalization a transformed corpus got —
    * stop terms drop (they are not in the index), remaining terms stem. */
  def analyzeQueryTerms(terms: Seq[String], stopWords: Seq[String] = Nil,
      stem: Boolean = false): Seq[String] = {
    val stops = stopWords.map(Analyzer.lowerLikeCatalyst).toSet
    terms.map(Analyzer.lowerLikeCatalyst)
      .filterNot(stops.contains)
      .map(t => if (stem) Porter.stem(t) else t)
  }
}
