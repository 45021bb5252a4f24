package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.analyze.Analyzer

/** Snippet / highlight generation over the analyzer's token stream — the
  * `highlight` half of the search API a reference deployment gets from
  * OpenSearch (the reference itself stops at the sink hand-off,
  * `opensearch/.../OpenSearchSink.java:63`).
  *
  * Definition (deterministic, engine-neutral): candidate windows are the
  * `w` consecutive tokens starting at each QUERY-TERM match position (an
  * optimal fixed-width window always starts at a match); a window's score
  * is its count of DISTINCT matched query terms; best window = highest
  * score, earliest start on ties. The snippet is the window's tokens
  * space-joined with every query-term occurrence wrapped in `<em>…</em>`.
  * Documents with no match yield a null snippet.
  *
  * Pure Column algebra (no UDF, no shuffle): one projection per document,
  * so highlighting rides the result page's plan for free. The
  * higher-order functions evaluate interpreted and re-derive the token
  * array per reference (the Dedup.shingles caveat), so for serving-path
  * use hand the function a MATERIALIZED tokens column
  * ([[snippetFromTokens]]) — top-k pages are ≤ k rows, making even the
  * interpreted form sub-millisecond. */
object Snippets {

  /** Best-window snippet of `text` for `terms` (see object doc). */
  def snippet(text: Column, terms: Seq[String], w: Int): Column =
    snippetFromTokens(Analyzer.tokensCol(text), terms, w)

  /** Count of distinct query terms in the chosen best window. */
  def snippetTermCount(text: Column, terms: Seq[String], w: Int): Column =
    bestWindow(Analyzer.tokensCol(text), terms, w)._2

  private def termsLit(terms: Seq[String]): Column =
    array(terms.distinct.sorted.map(t =>
      lit(Analyzer.lowerLikeCatalyst(t))): _*)

  /** (bestStart0Based, bestCount) for the token array; (null, 0) when no
    * term matches. */
  private def bestWindow(toks: Column, terms: Seq[String],
      w: Int = 0): (Column, Column) = {
    val ts = termsLit(terms)
    val n = size(toks)
    // guard: sequence(0, -1) would generate a DESCENDING sequence (and
    // element_at(toks, 0) errors), so empty/null token arrays short-circuit
    // to an empty candidate list → null snippet
    val idxs = when(n > 0, sequence(lit(0), n - 1))
      .otherwise(array().cast("array<int>"))
    val starts = filter(idxs,
      i => array_contains(ts, element_at(toks, i + 1)))
    val width = if (w > 0) lit(w) else lit(Int.MaxValue)
    val cnts = transform(starts, s =>
      size(array_distinct(filter(slice(toks, s + 1, width),
        t => array_contains(ts, t)))))
    val best = when(size(starts) > 0,
      element_at(starts, array_position(cnts, array_max(cnts)).cast("int")))
    (best, coalesce(array_max(cnts), lit(0)))
  }

  /** Phrase-aware snippet (the `match_phrase` highlight): the window of
    * `w` tokens around the FIRST exact phrase occurrence (consecutive
    * analyzer tokens), roughly centered — start = max(match − (w−m)/2, 0)
    * — with exactly the matched positions wrapped in `<em>` (position-
    * based, so a phrase token repeated elsewhere in the window is NOT
    * highlighted). Null when the phrase does not occur. Same pure-Column
    * contract as [[snippet]]. */
  def phraseSnippet(text: Column, phrase: Seq[String], w: Int): Column = {
    val p = phrase.map(Analyzer.lowerLikeCatalyst)
    val m = p.length
    require(m >= 1 && w >= m, s"window $w shorter than phrase ($m)")
    val toks = Analyzer.tokensCol(text)
    val n = size(toks)
    val idxs = when(n >= m, sequence(lit(0), n - m))
      .otherwise(array().cast("array<int>"))
    val starts = filter(idxs, i =>
      p.zipWithIndex.map { case (t, j) =>
        element_at(toks, i + j + 1) === lit(t)
      }.reduce(_ && _))
    val s = element_at(starts, 1)
    val lead = (w - m) / 2
    val w0 = greatest(s - lead, lit(0))
    val winIdx = filter(sequence(w0, w0 + w - 1), j => j < n)
    when(size(starts) > 0,
      array_join(transform(winIdx, j =>
        when(j >= s && j < s + m,
          concat(lit("<em>"), element_at(toks, j + 1), lit("</em>")))
          .otherwise(element_at(toks, j + 1))), " "))
  }

  /** [[snippet]] over an already-materialized token-array column. */
  def snippetFromTokens(toks: Column, terms: Seq[String], w: Int): Column = {
    val ts = termsLit(terms)
    val (best, _) = bestWindow(toks, terms, w)
    when(best.isNotNull,
      array_join(
        transform(slice(toks, best + 1, lit(w)), t =>
          when(array_contains(ts, t), concat(lit("<em>"), t, lit("</em>")))
            .otherwise(t)),
        " "))
  }
}
