package graft.query

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.Globals

/** Segment row as read back from the posting store (bucket is the
  * directory-partition column). */
final case class SegmentRead(
    term: String, df: Long, shard: Long, blockId: Int,
    firstDocId: Long, lastDocId: Long, n: Int, maxScore: Double,
    gaps: Array[Byte], tfs: Array[Byte], dls: Array[Byte], bucket: Int)

/** Query-side executor over a built index.
  *
  * Distributed top-k (the 1000-executor path): the index is document-
  * sharded (shard = docId range), so WAND runs *per shard* with full
  * independence — `groupByKey(shard).flatMapGroups` fans the query out to
  * every shard's postings, each task returns its local top-k, and the
  * global answer is the (score desc, docId asc) head of shards × k
  * candidate rows — a few KB regardless of corpus size. Reads prune to the
  * query terms' hash buckets (directory partition pruning) and push the
  * term predicate into Parquet.
  *
  * This replaces the reference's delegation of querying to OpenSearch
  * (/root/reference/data-prepper-plugins/opensearch/... sink +
  * source/opensearch/OpenSearchSource.java) with an in-engine executor.
  */
final class IndexReader(spark: SparkSession, indexDir: String) {
  import spark.implicits._

  val globals: Globals = Globals.read(indexDir)
  private val postingsPath = s"$indexDir/postings"

  /** pmod(xxhash64(term), buckets) — same hash Spark computes at build
    * time (XxHash64 with seed 42 over UTF8 bytes). */
  def bucketOf(term: String, buckets: Int): Int = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(term)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    (((h % buckets) + buckets) % buckets).toInt
  }

  /** Bucket modulus from the committed postings manifest — the value the
    * BUILD used (r1 counted bucket= directories on the local filesystem,
    * which breaks on object stores and undercounts when a bucket holds no
    * terms → wrong modulus → silently empty postings; ADVICE r1). */
  private val numBuckets: Int = {
    val b = graft.index.Manifest.read(indexDir, "postings")
      .flatMap(_.params.get("buckets")).map(_.toInt)
      .getOrElse(throw new IllegalStateException(
        s"no committed postings manifest (with buckets param) under $indexDir"))
    require(b > 0, s"postings manifest has invalid buckets=$b")
    b
  }

  /** Segment rows for the query terms, bucket-pruned. */
  def segmentsFor(terms: Seq[String]): Dataset[SegmentRead] = {
    val buckets = terms.map(bucketOf(_, numBuckets)).distinct
    spark.read.parquet(postingsPath)
      .where(col("bucket").isin(buckets.map(Integer.valueOf): _*) &&
        col("term").isin(terms: _*))
      .as[SegmentRead]
  }

  /** Distributed Block-Max WAND top-k. Result is a tiny DataFrame
    * (docId, score) ordered by (score desc, docId asc), k rows. */
  def topK(query: Seq[String], k: Int): DataFrame = {
    val terms = query.distinct.sorted
    val seg = segmentsFor(terms)
    // hoist to locals: eta-expansion must capture primitives, not `this`
    val (n, avgdl, kk) = (globals.n, globals.avgdl, k)
    val perShard = seg.groupByKey(_.shard)
      .flatMapGroups((shard: Long, rows: Iterator[SegmentRead]) =>
        IndexReader.shardTopK(n, avgdl, kk)(shard, rows))
    perShard.toDF("docId", "score")
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
  }

  /** Distributed top-k with the typed [[TopKAggregator]] merge: per-shard
    * candidates partially aggregate map-side, the driver receives one
    * Array[Scored] — no row-level sort/limit stage. Rank-identical to
    * [[topK]]. */
  def topKAgg(query: Seq[String], k: Int): Array[Scored] = {
    val terms = query.distinct.sorted
    val seg = segmentsFor(terms)
    val (n, avgdl, kk) = (globals.n, globals.avgdl, k)
    val perShard = seg.groupByKey(_.shard)
      .flatMapGroups((shard: Long, rows: Iterator[SegmentRead]) =>
        IndexReader.shardTopK(n, avgdl, kk)(shard, rows))
    perShard.select(new TopKAggregator(k).toColumn).head()
  }

  /** Driver-local serving cache: term -> (df, globally docId-sorted
    * blocks). Because shard = docId range, concatenating a term's blocks
    * across shards in (shard, firstDocId) order IS the external multi-way
    * merge into the term's global posting list (no re-sort — SURVEY.md
    * §7.5). Used for the p95 latency hot path (no job scheduling per
    * query). */
  def loadCache(terms: Seq[String]): Map[String, (Long, Array[SegBlock])] = {
    segmentsFor(terms.distinct).collect()
      .groupBy(_.term)
      .map { case (t, rows) =>
        t -> (rows.head.df, rows.sortBy(r => (r.shard, r.firstDocId))
          .map(r => SegBlock(r.firstDocId, r.lastDocId, r.n, r.maxScore, r.gaps, r.tfs, r.dls)))
      }
  }

  /** Single global Block-Max WAND over merged posting lists — the
    * serving-node hot path; threshold pruning spans the whole corpus. */
  def topKLocal(cache: Map[String, (Long, Array[SegBlock])],
      query: Seq[String], k: Int): Array[Scored] = {
    val terms = query.distinct.sorted
    val cursors = terms.flatMap { t =>
      cache.get(t).map { case (df, blocks) =>
        new TermCursor(t, Bm25.idf(globals.n, df), blocks, globals.avgdl)
      }
    }.toArray
    Wand.topK(cursors, k)
  }

}

object IndexReader {
  /** Executor-side per-shard WAND — a top-level function so the Spark
    * closure captures only (n, avgdl, k), never the reader instance. */
  def shardTopK(n: Long, avgdl: Double, k: Int)(
      shard: Long, rows: Iterator[SegmentRead]): Iterator[Scored] =
    Wand.topK(buildCursors(rows, n, avgdl), k).iterator

  private def buildCursors(rows: Iterator[SegmentRead], n: Long,
      avgdl: Double): Array[TermCursor] = {
    val byTerm = rows.toArray.groupBy(_.term)
    byTerm.map { case (t, rs) =>
      val blocks = rs.sortBy(_.firstDocId)
        .map(r => SegBlock(r.firstDocId, r.lastDocId, r.n, r.maxScore, r.gaps, r.tfs, r.dls))
      new TermCursor(t, Bm25.idf(n, rs.head.df), blocks, avgdl)
    }.toArray
  }
}
