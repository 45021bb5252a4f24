package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion of ranked lists (public
  * algorithm: Cormack, Clarke & Büttcher, SIGIR 2009): each list
  * contributes `1 / (k0 + rank)` for every document it ranks, fused
  * score is the sum, missing-from-a-list contributes nothing. The
  * modern lexical+vector pattern the reference hands to OpenSearch's
  * hybrid query (`opensearch/.../OpenSearchSink.java:63` delegates all
  * query-side work): here the BM25 list comes from [[IndexSearch]] /
  * [[Wand]] and the vector list from [[graft.ops.Similarity]] ANN — RRF
  * composes any of them without score calibration.
  *
  * Scale shape: inputs are top-N lists (N = tens..thousands — bounded
  * by construction, NOT corpus-sized), so the per-list rank window runs
  * on one partition of N rows and the fuse is one tiny groupBy — the
  * corpus-scale work already happened inside the retrieval that
  * produced each list. Rank ties break by ascending id on both engines,
  * so fusion is bit-deterministic.
  */
object Hybrid {

  /** Fuse ranked lists, each a DataFrame with (`idCol`, `scoreCol`);
    * rank within a list = position under (score DESC, id ASC). Returns
    * (`idCol`, `rrf_score`, `n_lists`) — the fused top `k`. */
  def rrf(lists: Seq[DataFrame], idCol: String, scoreCol: String,
      k: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one list")
    val rankCol = "_rrf_rank"
    lists.foreach(df => require(!df.columns.contains(rankCol),
      s"input already has a $rankCol column"))
    val contribs = lists.map { df =>
      df.select(col(idCol), col(scoreCol))
        .withColumn(rankCol, row_number().over(
          Window.orderBy(desc(scoreCol), col(idCol))))
        .select(col(idCol),
          (lit(1.0) / (lit(k0.toDouble) + col(rankCol))).as("_rrf_contrib"))
    }
    contribs.reduce(_ unionAll _)
      .groupBy(idCol)
      .agg(round(sum("_rrf_contrib"), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(desc("rrf_score"), col(idCol))
      .limit(k)
  }
}
