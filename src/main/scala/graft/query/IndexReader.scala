package graft.query

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{Globals, IncrementalIndex}

/** Segment row as read back from the posting store (bucket is the
  * directory-partition column; `gen` tags which generation wrote it —
  * 0 for a standalone index). `df` is the generation-local document
  * frequency; the reader sums distinct generations for the merged idf. */
final case class SegmentRead(
    term: String, df: Long, shard: Long, blockId: Int,
    firstDocId: Long, lastDocId: Long, n: Int, maxTf: Long, minDl: Long,
    gaps: Array[Byte], tfs: Array[Byte], dls: Array[Byte],
    pos: Array[Byte], bucket: Int, gen: Int)

/** Query-side executor over a built index — standalone or generational
  * ([[IncrementalIndex]]: `gen-k` subdirectories, disjoint docId ranges).
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
  * Block-Max bounds are computed HERE, not at build time: each block
  * stores (maxTf, minDl) and the bound is
  * `Bm25.score(idf, maxTf, minDl, avgdl)` with the CURRENT merged stats —
  * BM25 is increasing in tf and decreasing in dl, so this dominates every
  * member score, and it stays correct as generations shift N/avgdl/df.
  *
  * This replaces the reference's delegation of querying to OpenSearch
  * (/root/reference/data-prepper-plugins/opensearch/... sink +
  * source/opensearch/OpenSearchSource.java) with an in-engine executor.
  */
final class IndexReader(spark: SparkSession, val indexDir: String) {
  import spark.implicits._

  /** (gen, dir) pairs — (0, indexDir) for a standalone index. Visible to
    * the [[IndexSearch]] layer, which reads the same generations' stats/
    * docs/tf artifacts. */
  private[query] val gens: Seq[(Int, String)] = IncrementalIndex.genDirs(spark, indexDir)

  /** Merged corpus stats: exact integer sums across generations. */
  val globals: Globals = gens.map { case (_, d) => Globals.read(d) }
    .reduce((a, b) => Globals(a.n + b.n, a.sumDl + b.sumDl))

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
    * terms → wrong modulus → silently empty postings; ADVICE r1). All
    * generations must agree (append pins the founding params). */
  private val numBuckets: Int = {
    val bs = gens.map { case (_, d) =>
      graft.index.Manifest.read(d, "postings")
        .flatMap(_.params.get("buckets")).map(_.toInt)
        .getOrElse(throw new IllegalStateException(
          s"no committed postings manifest (with buckets param) under $d"))
    }.distinct
    require(bs.size == 1 && bs.head > 0,
      s"generations disagree on bucket count: $bs")
    bs.head
  }

  /** Tombstoned docIds ([[IncrementalIndex.deleteDocs]]), sorted for
    * binary search in the shard kernels; null when none. Loaded once per
    * reader (a reader opened before a delete keeps its snapshot — same
    * point-in-time visibility a Lucene IndexReader has). Tombstones are
    * churn between compactions, bounded like Lucene's .liv bitmaps — the
    * cap fails loudly with the fix (compact) rather than letting an
    * unbounded delete backlog grow into a driver/broadcast hazard. */
  private[query] val deletedSorted: Array[Long] = {
    IncrementalIndex.deletedIds(spark, indexDir) match {
      case None => null
      case Some(df) =>
        val arr = df.as[Long].collect()
        require(arr.length <= IndexReader.MaxResidentDeletes,
          s"${arr.length} tombstoned docIds exceed the resident cap " +
            s"(${IndexReader.MaxResidentDeletes}) — run " +
            "IncrementalIndex.maybeCompact/compactGenerations to apply " +
            "deletions physically before opening a reader")
        if (arr.isEmpty) null
        else { java.util.Arrays.sort(arr); arr }
    }
  }
  private[query] val deletedBc =
    spark.sparkContext.broadcast(deletedSorted)

  /** Segment rows for the query terms, bucket-pruned, across all
    * generations. */
  def segmentsFor(terms: Seq[String]): Dataset[SegmentRead] = {
    val buckets = terms.map(bucketOf(_, numBuckets)).distinct
    gens.map { case (g, d) =>
      spark.read.parquet(s"$d/postings")
        .where(col("bucket").isin(buckets.map(Integer.valueOf): _*) &&
          col("term").isin(terms: _*))
        .withColumn("gen", lit(g))
    }.reduce(_.unionByName(_)).as[SegmentRead]
  }

  /** Per-term GLOBAL df for the query terms: a shard sees only the
    * generations that overlap it, so df cannot be resolved inside the
    * shard fan-out — it is summed here over (term, gen) metadata (a few
    * rows; bucket-pruned, column-pruned scan) and broadcast into the
    * per-shard closures. Single-generation indexes pay one cheap extra
    * metadata job per query; correctness over generations demands it. */
  private[query] def mergedDfMap(seg: Dataset[SegmentRead]): Map[String, Long] =
    seg.select(col("term"), col("gen"), col("df")).distinct()
      .as[(String, Int, Long)].collect()
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._3).sum }

  /** Distributed Block-Max WAND top-k. Result is a tiny DataFrame
    * (docId, score) ordered by (score desc, docId asc), k rows. */
  def topK(query: Seq[String], k: Int): DataFrame = {
    val terms = query.distinct.sorted
    val seg = segmentsFor(terms)
    // hoist to locals: eta-expansion must capture primitives, not `this`
    val (n, avgdl, kk) = (globals.n, globals.avgdl, k)
    val dfByTerm = spark.sparkContext.broadcast(mergedDfMap(seg))
    val del = deletedBc
    val perShard = seg.groupByKey(_.shard)
      .flatMapGroups((shard: Long, rows: Iterator[SegmentRead]) =>
        IndexReader.shardTopK(n, avgdl, kk, dfByTerm.value,
          del.value)(shard, rows))
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
    val dfByTerm = spark.sparkContext.broadcast(mergedDfMap(seg))
    val del = deletedBc
    val perShard = seg.groupByKey(_.shard)
      .flatMapGroups((shard: Long, rows: Iterator[SegmentRead]) =>
        IndexReader.shardTopK(n, avgdl, kk, dfByTerm.value,
          del.value)(shard, rows))
    perShard.select(new TopKAggregator(k).toColumn).head()
  }

  /** Phrase top-k over positional postings (see [[Phrase]]): `slop = 0`
    * (default) is the exact consecutive-position match; `slop > 0` the
    * ordered-proximity match (`match_phrase` + `slop` — greedy
    * minimal-stretch chains, semantics on
    * [[BruteForce.phraseSlopScoreAll]]). Requires an index built with
    * `IndexParams(positions = true)` — every generation's manifest is
    * checked and a positions-less index refuses loudly rather than
    * returning silently-empty matches. Result is (docId, score), k rows,
    * ordered (score desc, docId asc). */
  def phraseTopK(phrase: Seq[String], k: Int, slop: Int = 0): DataFrame = {
    val (seg, idfSum) = phrasePrep(phrase, slop)
    val (avgdl, kk, ph, sl) = (globals.avgdl, k, phrase, slop)
    val del = deletedBc
    val perShard = seg.groupByKey(_.shard)
      .flatMapGroups((shard: Long, rows: Iterator[SegmentRead]) =>
        Phrase.shardTopK(avgdl, kk, ph, idfSum, del.value, sl)(shard, rows))
    perShard.toDF("docId", "score")
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
  }

  /** EVERY phrase-matching doc's score, untruncated — (docId, score),
    * unordered. The composition primitive for the query-string engine's
    * phrase clauses (their scores sum with term clauses, so per-shard
    * pre-truncation would drop contributors). Same pruned postings read
    * as [[phraseTopK]]; output is match-set-sized, not corpus-sized. */
  def phraseScores(phrase: Seq[String], slop: Int = 0): DataFrame = {
    val (seg, idfSum) = phrasePrep(phrase, slop)
    val (avgdl, ph, sl) = (globals.avgdl, phrase, slop)
    val del = deletedBc
    seg.groupByKey(_.shard)
      .flatMapGroups((shard: Long, rows: Iterator[SegmentRead]) =>
        Phrase.shardScores(avgdl, ph, idfSum, del.value, sl)(shard, rows))
      .toDF("docId", "score")
  }

  /** Refuse loudly on a positions-less index (every generation's manifest
    * must record positions = true) — silent empty phrase matches would be
    * a wrong answer, not a degraded one. */
  private[query] def requirePositions(): Unit =
    gens.foreach { case (g, d) =>
      val p = graft.index.Manifest.read(d, "postings")
        .flatMap(_.params.get("positions"))
      require(p.contains("true"),
        s"gen-$g at $d was built without positions — rebuild/append with " +
          "IndexParams(positions = true) to serve phrase queries")
    }

  private def phrasePrep(phrase: Seq[String], slop: Int)
      : (Dataset[SegmentRead], Double) = {
    require(slop >= 0, "slop must be >= 0")
    require(phrase.nonEmpty, "empty phrase")
    requirePositions()
    val seg = segmentsFor(phrase.distinct)
    val dfByTerm = mergedDfMap(seg)
    // slot-summed idf from GLOBAL dfs (duplicated slot terms count per
    // slot) — same fold order as BruteForce.phraseScoreAll
    val idfSum = phrase
      .map(t => Bm25.idf(globals.n, dfByTerm.getOrElse(t, 0L))).sum
    (seg, idfSum)
  }

  /** Driver-local serving cache: term -> (merged df, globally docId-sorted
    * BOUNDED blocks). Because shard = docId range and generations own
    * disjoint docId ranges, concatenating a term's blocks across
    * (shard, firstDocId) order IS the external multi-way merge into the
    * term's global posting list (no re-sort — SURVEY.md §7.5). Bounds are
    * precomputed here with the merged stats, once per cache load. Used for
    * the p95 latency hot path (no job scheduling per query).
    *
    * SCALE BOUND: at 10^12 docs a stopword's posting list is terabytes —
    * collecting it to the driver is the one thing this serving path must
    * never do. A metadata-only aggregation (term → Σ posting bytes, column-
    * pruned so Parquet never reads the block payloads) sizes every term
    * FIRST; only terms within `maxBytesPerTerm` have their blocks
    * collected. Over-budget terms are recorded in
    * [[ServingCache.overBudget]] and any query touching one routes through
    * the exact distributed [[topKAgg]] inside [[topKLocal]] — same ranking,
    * executor-resident memory. */
  def loadCache(terms: Seq[String],
      maxBytesPerTerm: Long = IndexReader.DefaultMaxBytesPerTerm): ServingCache = {
    val distinctTerms = terms.distinct
    val seg = segmentsFor(distinctTerms)
    // job 1: per-term posting-byte totals — metadata columns only, the
    // Parquet scan prunes the gaps/tfs/dls pages for rows it can skip and
    // reads no other payload
    val sizes = seg.toDF()
      .select(col("term"),
        (length(col("gaps")) + length(col("tfs")) + length(col("dls")))
          .cast("long").as("bytes"))
      .groupBy("term").agg(sum("bytes").as("bytes"))
      .as[(String, Long)].collect().toMap
    val over = sizes.filter(_._2 > maxBytesPerTerm).keySet
    val residentTerms = distinctTerms.filterNot(over)
    // job 2: collect blocks for resident terms ONLY (term predicate pushed
    // into the Parquet scan; over-budget blocks never reach the driver)
    val resident =
      if (residentTerms.isEmpty) Map.empty[String, (Long, Array[SegBlock])]
      else segmentsFor(residentTerms).collect()
        .groupBy(_.term)
        .map { case (t, rows) =>
          val df = IndexReader.mergedDf(rows)
          val idf = Bm25.idf(globals.n, df)
          t -> (df, rows.sortBy(r => (r.shard, r.firstDocId))
            .map(r => IndexReader.boundedBlock(r, idf, globals.avgdl)))
        }
    ServingCache(resident, over, maxBytesPerTerm)
  }

  /** Single global Block-Max WAND over merged posting lists — the
    * serving-node hot path; threshold pruning spans the whole corpus.
    * Queries touching an over-budget term transparently fall back to the
    * exact distributed [[topKAgg]] (rank-identical; the driver never holds
    * the hot term's postings). */
  def topKLocal(cache: ServingCache, query: Seq[String], k: Int): Array[Scored] = {
    val terms = query.distinct.sorted
    if (terms.exists(cache.overBudget)) return topKAgg(query, k)
    val cursors = terms.flatMap { t =>
      cache.resident.get(t).map { case (df, blocks) =>
        new TermCursor(t, Bm25.idf(globals.n, df), blocks, globals.avgdl)
      }
    }.toArray
    Wand.topK(cursors, k, deletedSorted)
  }

}

/** Driver-resident serving cache with a per-term byte bound. `resident`
  * holds terms whose full merged posting lists fit `maxBytesPerTerm`;
  * `overBudget` names terms whose lists stayed on the executors — queries
  * touching them are served by the distributed top-k instead. */
final case class ServingCache(
    resident: Map[String, (Long, Array[SegBlock])],
    overBudget: Set[String],
    maxBytesPerTerm: Long) {
  /** Total bytes actually held on the driver (compressed block payloads). */
  def residentBytes: Long = resident.valuesIterator
    .flatMap(_._2.iterator)
    .map(b => b.gaps.length.toLong + b.tfs.length + b.dls.length).sum
}

object IndexReader {
  /** Default per-term driver budget for [[IndexReader.loadCache]]: 64 MiB.
    * Generous for every real query term (a 64 MiB PForDelta posting list
    * is ~tens of millions of docs) while guaranteeing a stopword at
    * 10^12-doc scale cannot take down the serving driver. */
  val DefaultMaxBytesPerTerm: Long = 64L << 20

  /** Resident-tombstone cap: 4M docIds (32 MB sorted longs) — far above
    * any sane between-compaction delete churn, far below broadcast
    * hazard territory. */
  val MaxResidentDeletes: Int = 1 << 22

  /** Membership test against the sorted tombstone array (null = none). */
  @inline def isDeleted(del: Array[Long], id: Long): Boolean =
    del != null && java.util.Arrays.binarySearch(del, id) >= 0

  /** Merged document frequency: each generation baked its own df into its
    * rows, generations are disjoint doc sets, so the true df is the sum of
    * one df per generation present. */
  def mergedDf(rows: Array[SegmentRead]): Long =
    rows.groupBy(_.gen).map(_._2.head.df).sum

  /** Query-time Block-Max bound: BM25 is monotone ↑ in tf and ↓ in dl, so
    * scoring the block's (maxTf, minDl) corner with the current stats
    * dominates every member score. */
  def boundedBlock(r: SegmentRead, idf: Double, avgdl: Double): SegBlock =
    SegBlock(r.firstDocId, r.lastDocId, r.n,
      Bm25.score(idf, r.maxTf.toDouble, r.minDl.toDouble, avgdl),
      r.gaps, r.tfs, r.dls)

  /** Executor-side per-shard WAND — a top-level function so the Spark
    * closure captures only (n, avgdl, k, dfByTerm), never the reader
    * instance. `dfByTerm` carries the GLOBAL per-term df (a shard only
    * sees its own generations' rows). */
  def shardTopK(n: Long, avgdl: Double, k: Int, dfByTerm: Map[String, Long],
      deleted: Array[Long] = null)(
      shard: Long, rows: Iterator[SegmentRead]): Iterator[Scored] =
    Wand.topK(buildCursors(rows, n, avgdl, dfByTerm), k, deleted).iterator

  private def buildCursors(rows: Iterator[SegmentRead], n: Long,
      avgdl: Double, dfByTerm: Map[String, Long]): Array[TermCursor] = {
    val byTerm = rows.toArray.groupBy(_.term)
    byTerm.map { case (t, rs) =>
      val df = dfByTerm.getOrElse(t, mergedDf(rs))
      val idf = Bm25.idf(n, df)
      val blocks = rs.sortBy(_.firstDocId)
        .map(r => boundedBlock(r, idf, avgdl))
      new TermCursor(t, idf, blocks, avgdl)
    }.toArray
  }
}
