package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analyze.Analyzer

/** Percolation — reverse search: STORED queries are matched against
  * incoming documents (OpenSearch's percolator; in the reference's world
  * this is the alerting/routing direction — Data Prepper routes events to
  * sinks by expression, OpenSearch percolates documents against saved
  * searches). Stored queries are bool term queries
  * `(query_id, must, should, must_not, min_should)` with the engine's
  * bool semantics ([[Search.boolTopK]]): every must term present, no
  * must_not term present, and at least `max(min_should, 1 if no must)`
  * should terms when should is non-empty.
  *
  * Scale shape: the corpus tokenizes ONCE into a per-doc distinct term
  * set and NEVER shuffles; the stored-query table is a dimension —
  * broadcast — and matching is pure set algebra
  * (`array_except`/`array_intersect` sizes) inside one join condition.
  * 10⁹ docs × 10⁴ stored queries is a map-side evaluation per doc, not a
  * shuffle. Matching is a boolean (percolation selects, it does not
  * rank); feed matched doc sets to BM25 if scores are wanted.
  */
object Percolate {

  /** One stored query. Terms are analyzer-normalized on entry. */
  final case class StoredQuery(
      queryId: String,
      must: Seq[String] = Nil,
      should: Seq[String] = Nil,
      mustNot: Seq[String] = Nil,
      minShould: Int = 0)

  /** (docId, query_id) pairs for every document × stored-query match.
    * One tokenize projection over docs + one broadcast join. */
  def percolate(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[StoredQuery]): DataFrame = {
    require(queries.nonEmpty, "percolate needs at least one stored query")
    require(queries.forall(q => q.must.nonEmpty || q.should.nonEmpty),
      "a stored query needs must or should terms")
    require(idCol != "_pc_terms" && idCol != "query_id",
      s"idCol '$idCol' collides with a percolate output column")
    require(queries.map(_.queryId).distinct.size == queries.size,
      "stored query ids must be unique")
    val spark = docs.sparkSession
    import spark.implicits._
    val norm = queries.map { q =>
      val eff = if (q.should.isEmpty) 0
        else math.max(q.minShould, if (q.must.isEmpty) 1 else 0)
      (q.queryId,
        q.must.map(Analyzer.lowerLikeCatalyst).distinct,
        q.should.map(Analyzer.lowerLikeCatalyst).distinct,
        q.mustNot.map(Analyzer.lowerLikeCatalyst).distinct,
        eff)
    }
    val qdf = norm.toDF("query_id", "q_must", "q_should", "q_not", "q_min")
    val toks = docs.select(col(idCol),
      array_distinct(Analyzer.tokensCol(col(textCol))).as("_pc_terms"))
    val matchCond =
      size(array_except(col("q_must"), col("_pc_terms"))) === 0 &&
        size(array_intersect(col("q_not"), col("_pc_terms"))) === 0 &&
        size(array_intersect(col("q_should"), col("_pc_terms"))) >= col("q_min")
    toks.join(broadcast(qdf), matchCond)
      .select(col(idCol), col("query_id"))
  }
}
