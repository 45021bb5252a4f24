package graft.query

/** BM25 scoring — single source of truth for BOTH the brute-force oracle
  * and the Block-Max WAND executor, with a fixed operand order so the two
  * engines produce bit-identical doubles (SURVEY.md §7.5 rank-identity).
  *
  * Formula (Lucene/OpenSearch defaults — what the reference's `opensearch`
  * sink delegates scoring to): k1 = 1.2, b = 0.75,
  *   idf  = ln(1 + ((N - df) + 0.5) / (df + 0.5))
  *   tfn  = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
  *   s    = idf * tfn
  * All arithmetic in IEEE double with exactly this association; the Spark
  * SQL `Column` form in [[BruteForce]] mirrors it term for term.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  def idf(n: Long, df: Long): Double =
    // StrictMath, not Math: Catalyst's Log expression evaluates via
    // StrictMath.log, and the oracle/WAND scores must be bit-identical.
    StrictMath.log(1.0 + ((n.toDouble - df.toDouble) + 0.5) / (df.toDouble + 0.5))

  def score(idf: Double, tf: Double, dl: Double, avgdl: Double): Double =
    idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))

  /** SQL text of the identical expression, over columns tf, dl, df and
    * scalar n/avgdl — used to build both the Spark oracle Column and the
    * DuckDB oracle SQL so every engine runs the same operand order. */
  def scoreSql(tfCol: String, dlCol: String, dfCol: String, n: Long, avgdl: Double): String =
    s"ln(1.0 + ((CAST($n AS DOUBLE) - CAST($dfCol AS DOUBLE)) + 0.5) / (CAST($dfCol AS DOUBLE) + 0.5))" +
      s" * ((CAST($tfCol AS DOUBLE) * 2.2) / (CAST($tfCol AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST($dlCol AS DOUBLE) / $avgdl))))"
}
