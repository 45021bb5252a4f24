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

  /** The EXACT lowercase Catalyst's `lower()` applies (Lower evaluates
    * UTF8String.toLowerCase) — every JVM-side tokenizer path routes
    * through this so index build, query parsing and the Column form can
    * never diverge on non-ASCII input (U+212A Kelvin → 'k', U+0130 →
    * "i̇"…; r1 lowercased only ASCII in the JVM kernel — ADVICE r1). */
  def lowerLikeCatalyst(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s).toLowerCase.toString

  /** Query-side tokenization, driver-local; identical spec. */
  def analyzeQuery(q: String): Seq[String] =
    lowerLikeCatalyst(q)
      .split(TokenSplitRegex).iterator.filter(_.nonEmpty).toSeq.distinct

  /** JVM-side per-document term-frequency kernel — the SPIMI map phase.
    *
    * Exactly the [[tokensCol]] spec: Catalyst-identical lowercasing (see
    * [[lowerLikeCatalyst]]), then [a-z0-9] runs are tokens, everything
    * else (incl. U+00A0) separates. Used by the index build so per-doc
    * tf+dl need NO (docId, term) shuffle: tokenize → local HashMap →
    * emit, a narrow map over the docs scan. (The DataFrame gate queries
    * keep the Column form; the e2e differential test pins the two paths
    * equal on the corpus.)
    *
    * Returns (counts, dl).
    */
  def termFreqsLocal(text: String): (java.util.HashMap[String, Long], Long) = {
    val counts = new java.util.HashMap[String, Long]()
    if (text == null) return (counts, 0L)
    val toks = tokenizeLocal(text)
    var i = 0
    while (i < toks.size()) {
      counts.merge(toks.get(i), 1L, (a, b) => a + b)
      i += 1
    }
    (counts, toks.size().toLong)
  }

  /** Per-doc term → ascending token positions (0-based), plus dl — the
    * positional variant of [[termFreqsLocal]] for `positions = true`
    * index builds (tf = positions.size, so one map serves both). */
  def termPositionsLocal(text: String): (java.util.HashMap[String, java.util.ArrayList[Integer]], Long) = {
    val posMap = new java.util.HashMap[String, java.util.ArrayList[Integer]]()
    if (text == null) return (posMap, 0L)
    val toks = tokenizeLocal(text)
    var i = 0
    while (i < toks.size()) {
      posMap.computeIfAbsent(toks.get(i), _ => new java.util.ArrayList[Integer]())
        .add(Integer.valueOf(i))
      i += 1
    }
    (posMap, toks.size().toLong)
  }

  /** THE one JVM-side tokenizer scanner — every local kernel
    * (termFreqsLocal, Dedup.shingles) builds on this so the tokenizer
    * spec can never drift between them (it's the invariant the four-way
    * index/oracle/query agreement rests on). */
  def tokenizeLocal(text: String): java.util.ArrayList[String] = {
    val toks = new java.util.ArrayList[String]()
    if (text == null) return toks
    val lowered = lowerLikeCatalyst(text)
    val n = lowered.length
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i <= n) {
      val c = if (i < n) lowered.charAt(i) else ' '
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) {
        toks.add(sb.toString)
        sb.setLength(0)
      }
      i += 1
    }
    toks
  }
}
