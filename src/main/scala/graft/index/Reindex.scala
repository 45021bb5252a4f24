package graft.index

import org.apache.spark.sql.SparkSession

/** `_reindex` — rebuild an index from another index's STORED FIELDS under
  * new founding params (OpenSearch's reindex API: founding decisions like
  * shard count, block size or positions can only be changed by writing a
  * new index from `_source`). Here `_source` is the docs/ artifact (every
  * generation's, unioned) and deletes MATERIALIZE — tombstoned docIds are
  * anti-joined out, like reindex skipping deleted docs.
  *
  * Delegates to [[IncrementalIndex.compact]], which is exactly this
  * operation: the docs artifact is reused AS the destination's docs stage
  * (no re-extraction — stored text from a real crawl contains decoded
  * entities and stripped markup that a fake-HTML round trip would
  * corrupt, and the build's byte-identity gate would loudly refuse), then
  * tf/stats/postings rebuild under the destination's params. docIds are
  * PRESERVED (the engine's stability contract, same as compaction — so
  * external docId references survive a reindex; shard ranges re-derive
  * from the new shardSize).
  *
  * Scale shape: one distributed read of the docs artifacts + one
  * broadcast anti-join on docId, then the standard checkpointed build —
  * no driver materialization anywhere.
  */
object Reindex {

  def reindex(spark: SparkSession, srcDir: String, dstDir: String,
      params: IndexParams): Unit = {
    val gens = IncrementalIndex.genDirs(spark, srcDir)
    // genDirs falls back to (0 -> srcDir) for a generation-less layout,
    // so "is this an index at all" must check the committed docs stage
    gens.foreach { case (_, d) =>
      require(Manifest.read(d, "docs").isDefined,
        s"no committed docs stage under $d — '$srcDir' is not a graft index")
    }
    IncrementalIndex.compact(spark, srcDir, dstDir, params)
  }
}
