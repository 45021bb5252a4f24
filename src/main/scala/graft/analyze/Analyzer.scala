package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenization — the engine's analog of the reference's `split_event`
  * processor (/root/reference/data-prepper-plugins/split-event-processor/
  * .../SplitEventProcessor.java:31,35-51: explode one event into N by
  * splitting a string field on a delimiter/regex).
  *
  * Normative tokenizer spec (used by index build, brute-force oracle, WAND
  * query parsing, and the DuckDB oracle SQL — all four must agree):
  * lowercase, split on runs of anything outside [a-z0-9], drop empties.
  * U+00A0 (decoded `&nbsp;`) is a separator like any other non-alnum char.
  *
  * Everything stays inside Catalyst built-ins (`split`/`explode` are
  * codegen'd; no UDF in the hot path).
  */
object Analyzer {

  val TokenSplitRegex = "[^a-z0-9]+"

  /** Array-of-tokens column for a text column. */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), TokenSplitRegex), t => t =!= "")

  /** Explode a corpus `(idCol, textCol)` into one row per token. */
  def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(tokensCol(col(textCol))).as("term"))

  /** Tokens with positions (posexplode) — positions are not stored in the
    * index (BM25 needs tf only) but exposed for phrase-capable callers. */
  def tokensWithPos(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(tokensCol(col(textCol))))
      .withColumnRenamed("pos", "position").withColumnRenamed("col", "term")

  /** Per-(doc, term) frequencies: the SPIMI input. One shuffle on idCol+term
    * with map-side partial aggregation (Catalyst HashAggregate). */
  def termFreqs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(df, idCol, textCol)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Query-side tokenization, driver-local; identical spec. */
  def analyzeQuery(q: String): Seq[String] =
    q.toLowerCase(java.util.Locale.ROOT)
      .split(TokenSplitRegex).iterator.filter(_.nonEmpty).toSeq.distinct
}
