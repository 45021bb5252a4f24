package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analyze.Analyzer

/** Brute-force DataFrame BM25 scorer — the oracle the WAND executor must
  * match rank-identically (FIXTURES.md §2).
  *
  * Whole-corpus scan, no index: tokenize → tf → per-term score columns →
  * fixed-order sum → orderBy(score desc, docId asc).limit(k). Trustworthy
  * because it is ~30 lines of declarative Catalyst plan; also serves as the
  * scale path for one-off analytical scoring (it is a single pass with one
  * shuffle on (docId, term) and one on docId).
  *
  * Determinism contract (SURVEY.md §7.5): scores per (term, doc) use the
  * exact [[Bm25]] operand order, and per-doc totals are accumulated over
  * query terms in ascending term order via a *pivoted* fixed expression —
  * never a groupBy-sum over doubles whose accumulation order floats.
  */
object BruteForce {

  /** BM25 score column with operand order identical to [[Bm25.score]]. */
  def scoreCol(tf: Column, dl: Column, df: Column, n: Long, avgdl: Double): Column = {
    val nd = lit(n.toDouble)
    val idf = log(lit(1.0) + ((nd - df.cast("double")) + lit(0.5)) / (df.cast("double") + lit(0.5)))
    idf * ((tf.cast("double") * lit(2.2)) /
      (tf.cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) * (dl.cast("double") / lit(avgdl)))))
  }

  /** Score EVERY matching doc — (docId, score), unordered. The top-k entry
    * wraps this with TakeOrdered; callers that re-rank on rounded scores
    * (the oracle gates) consume it directly instead of asking topK for
    * n rows (which would heap-sort the whole corpus per partition and
    * needs a count() job just to learn n — VERDICT r1 plan audit). */
  def scoreAll(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String]): DataFrame = {
    val terms = query.distinct.sorted
    val spark = docs.sparkSession

    val withDl = docs.select(col(idCol).as("docId"),
      Analyzer.tokensCol(col(textCol)).as("toks"))
      .select(col("docId"), col("toks"), size(col("toks")).cast("long").as("dl"))

    // exact global stats from integer aggregates (deterministic doubles)
    val (n, sumDl) = {
      import spark.implicits._
      withDl.agg(count(lit(1)), sum(col("dl"))).as[(Long, Long)].head()
    }
    val avgdl = sumDl.toDouble / n.toDouble

    val tf = withDl.select(col("docId"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("docId"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df_, "term")
      .select(col("docId"),
        col("term"),
        scoreCol(col("tf"), col("dl"), col("df"), n, avgdl).as("s"))

    // pivot to one column per query term → fixed-order sum
    val pivoted = scored.groupBy(col("docId")).pivot("term", terms).agg(first(col("s")))
    val total = terms.map(t => coalesce(col(s"`$t`"), lit(0.0))).reduceLeft(_ + _)
    pivoted.select(col("docId"), total.as("score"))
  }

  /** Top-k over a docs table `(idCol, textCol)` for an OR-semantics query.
    * Returns (docId, score), k rows, ordered (score desc, docId asc). */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int): DataFrame =
    scoreAll(docs, idCol, textCol, query)
      .orderBy(desc("score"), asc("docId"))
      .limit(k)

  /** Brute-force EXACT PHRASE scorer — the oracle [[graft.query.Phrase]]
    * must match rank-identically, and itself the DuckDB-replayable gate
    * surface (q_phrase_topk). Semantics documented on [[Phrase]]: a match
    * is a strictly consecutive token run; `phrase_tf` = match starts;
    * score = BM25(tf = phrase_tf, idf = Σ slot idfs — duplicate slot terms
    * count per slot).
    *
    * Per-doc matching is one narrow Column fold (`filter` over candidate
    * start positions with `element_at` equality per slot); the only
    * aggregates are the corpus stats and the per-distinct-term dfs —
    * a 100 TB phrase scan never shuffles match rows. */
  def phraseScoreAll(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val m = phrase.length
    val spark = docs.sparkSession
    import spark.implicits._

    val withDl = docs.select(col(idCol).as("docId"),
      Analyzer.tokensCol(col(textCol)).as("toks"))
      .select(col("docId"), col("toks"), size(col("toks")).cast("long").as("dl"))

    val (n, sumDl) =
      withDl.agg(count(lit(1)), sum(col("dl"))).as[(Long, Long)].head()
    val avgdl = sumDl.toDouble / n.toDouble

    val distinctTerms = phrase.distinct
    val dfMap = withDl
      .select(explode(array_distinct(col("toks"))).as("term"))
      .where(col("term").isin(distinctTerms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    // slot order fold — identical to IndexReader.phraseTopK's
    val idfSum = phrase.map(t => Bm25.idf(n, dfMap.getOrElse(t, 0L))).sum

    val starts = when(size(col("toks")) >= m,
      sequence(lit(1), size(col("toks")) - (m - 1)))
      .otherwise(array().cast("array<int>"))
    val matched = filter(starts, i =>
      phrase.zipWithIndex.map { case (t, j) =>
        element_at(col("toks"), i + lit(j)) === lit(t)
      }.reduceLeft(_ && _))
    val ptf = size(matched).cast("long")

    withDl.select(col("docId"), ptf.as("phrase_tf"), col("dl"))
      .where(col("phrase_tf") > 0)
      .select(col("docId"), col("phrase_tf"),
        (lit(idfSum) * ((col("phrase_tf").cast("double") * lit(2.2)) /
          (col("phrase_tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) * (col("dl").cast("double") / lit(avgdl))))))
          .as("score"))
  }

  /** Phrase top-k: (docId, phrase_tf, score), ordered (score desc,
    * docId asc), k rows. */
  def phraseTopK(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String], k: Int): DataFrame =
    phraseScoreAll(docs, idCol, textCol, phrase)
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
}
