package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.corpus.Page

/** `_reindex` — rebuild an index from another index's STORED FIELDS under
  * new founding params (OpenSearch's reindex API: founding decisions like
  * shard count or an analysis change can only be changed by writing a new
  * index from `_source`; the reference's deployments call it for exactly
  * that). Here `_source` is the docs/ artifact (url, text, lang — every
  * generation's, unioned), deletes MATERIALIZE (tombstoned docIds are
  * anti-joined out before the build, like reindex skipping deleted docs),
  * and the destination assigns fresh docIds under ITS params — scores
  * attach to urls, so rank results agree with a from-scratch build over
  * the live documents (ReindexSpec pins both top-k and phrase ranking).
  *
  * Scale shape: one distributed read of the docs artifacts + one
  * broadcast-able anti-join on docId, then the standard 4-stage
  * checkpointed build — no driver materialization anywhere.
  */
object Reindex {

  def reindex(spark: SparkSession, srcDir: String, dstDir: String,
      params: IndexParams, buildId: String = "reindex"): Unit = {
    import spark.implicits._
    val gens = IncrementalIndex.genDirs(spark, srcDir)
    require(gens.nonEmpty, s"no committed generations under $srcDir")
    val docs = gens.map { case (_, d) => spark.read.parquet(s"$d/docs") }
      .reduce(_ unionByName _)
    val live = IncrementalIndex.deletedIds(spark, srcDir) match {
      case Some(del) =>
        docs.join(del.toDF("docId"), Seq("docId"), "left_anti")
      case None => docs
    }
    // stored text re-wrapped the way every stored-field fixture is, so
    // the build's html↔text byte-identity gate holds by construction
    val pages = live.select(col("url"),
        lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("warc_ts"),
        encode(concat(lit("<html><body><p>"), col("text"),
          lit("</p></body></html>")), "UTF-8").as("html"),
        col("text"), col("lang"))
      .as[Page]
    new IndexBuilder(spark, dstDir, params)
      .build(pages, s"$buildId(src=$srcDir)")
  }
}
