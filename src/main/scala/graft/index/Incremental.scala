package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

import graft.corpus.Page

/** Incremental (generational) index maintenance — the engine's analog of
  * the reference's continuous ingest into OpenSearch (`opensearch` sink
  * bulk indexing; OpenSearch itself keeps the index queryable while docs
  * stream in). A generational index is a directory of self-contained
  * builds:
  *
  *   indexDir/gen-0/{docs,tf,termstats,postings,globals.json,_manifests}
  *   indexDir/gen-1/...
  *
  * Each generation is a full [[IndexBuilder]] run over one batch of pages
  * with `idOffset` = total docs of all earlier generations, so every
  * generation owns a DISJOINT docId (hence shard) range — a term's posting
  * list across generations concatenates in (shard, firstDocId) order with
  * no re-sort, exactly like the base build's positional multi-way merge.
  * Because blocks store score-monotone extrema instead of baked scores and
  * the reader sums per-generation df and globals
  * ([[graft.query.IndexReader]]), queries over a generational index are
  * SCORE-IDENTICAL to a from-scratch rebuild over the union of the
  * batches — not just rank-identical (IncrementalSpec proves equality).
  *
  * Resumability is inherited: a killed append rerun skips the batch's
  * committed stages via the per-generation manifests; a generation is
  * visible to readers only once its FINAL stage's manifest commits
  * (postings — an atomic rename), and [[append]] numbers generations by
  * scanning committed ones, so a half-built `gen-k` is re-entered, never
  * skipped or double-counted — even when the kill lands between the
  * stats commit (which writes globals.json) and the postings commit.
  *
  * At 100 TB: appends touch only the new batch (the base corpus is never
  * re-read); each append costs the batch's own 3 shuffles. Generations
  * add per-query file-listing overhead, so [[compact]] folds them back
  * into one (the LSM-style merge) — run it when generation count hurts
  * scan planning, e.g. nightly.
  */
object IncrementalIndex {

  private val GenRe = "^gen-(\\d+)$".r

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A generation is committed iff its FINAL stage (postings) has a
    * committed manifest. globals.json alone is NOT enough: stats writes it
    * one stage before postings, so a crash in that window would leave a
    * generation that readers count (double-counting its docs in
    * totalDocs/idOffset on the re-run) but whose postings manifest —
    * which [[graft.query.IndexReader]] needs for the bucket modulus —
    * never exists, bricking the whole index. Keying visibility on the
    * last stage's atomic manifest rename closes that window: the re-run
    * resumes the half-built generation in place (same gen number, same
    * idOffset) instead of orphaning it. */
  private def isGenCommitted(genDir: String): Boolean =
    Manifest.read(genDir, "postings").exists(_.status == "committed")

  /** Committed (gen, dir) pairs sorted by generation; `(0, indexDir)` when
    * the index is standalone (no gen-* children). */
  def genDirs(spark: SparkSession, indexDir: String): Seq[(Int, String)] = {
    val root = new Path(indexDir)
    val f = fs(spark, indexDir)
    val found =
      if (!f.exists(root)) Seq.empty
      else f.listStatus(root).toSeq.collect {
        case st if st.isDirectory =>
          st.getPath.getName match {
            case GenRe(k) if isGenCommitted(st.getPath.toString) =>
              Some(k.toInt -> st.getPath.toString)
            case _ => None
          }
      }.flatten
    if (found.isEmpty) Seq(0 -> indexDir) else found.sortBy(_._1)
  }

  /** Total docs across committed generations = the next idOffset. */
  def totalDocs(spark: SparkSession, indexDir: String): Long = {
    val root = new Path(indexDir)
    if (!fs(spark, indexDir).exists(root)) 0L
    else genDirs(spark, indexDir) match {
      case Seq((0, d)) if d == indexDir &&
        IndexIO.readString(s"$indexDir/globals.json").isEmpty => 0L
      case gens => gens.map { case (_, d) => Globals.read(d).n }.sum
    }
  }

  /** Append one batch of pages as the next generation. Returns the
    * generation number. Founding `params` (buckets/shardSize/blockSize/
    * idBuckets) are VERIFIED against the committed generations' manifests
    * before any work runs: a mismatched shardSize or blockSize would
    * silently break the disjoint-shard / docId-sorted posting-
    * concatenation invariant (wrong WAND rankings, no error), so it must
    * fail fast instead. Re-running a killed append resumes the half-built
    * generation — including the stats→postings window, where globals.json
    * exists but the generation is still uncommitted. */
  def append(spark: SparkSession, indexDir: String, pages: Dataset[Page],
      params: IndexParams, inputDesc: String): Int = {
    require(IndexIO.readString(s"$indexDir/globals.json").isEmpty,
      s"$indexDir holds a standalone index; a generational index starts " +
        "from an empty dir (compact the standalone build into gen-0 first)")
    // founding-param agreement with every already-committed generation
    val Founding = Seq("buckets", "shardSize", "blockSize", "idBuckets")
    genDirs(spark, indexDir).foreach { case (k, d) =>
      if (d != indexDir) Manifest.read(d, "postings").foreach { m =>
        val want = params.asMap.view.filterKeys(Founding.contains).toMap
        val have = m.params.view.filterKeys(Founding.contains).toMap
        require(have == want,
          s"append params $want disagree with committed gen-$k's founding " +
            s"params $have — a mismatch would corrupt posting-list " +
            "concatenation order across generations")
      }
    }
    val f = fs(spark, indexDir)
    // resume a half-built generation (dir exists, globals not committed)
    val existing =
      if (!f.exists(new Path(indexDir))) Seq.empty
      else f.listStatus(new Path(indexDir)).toSeq.collect {
        case st if st.isDirectory =>
          st.getPath.getName match {
            case GenRe(k) => Some(k.toInt)
            case _ => None
          }
      }.flatten
    val committed = genDirs(spark, indexDir).collect {
      case (k, d) if d != indexDir => k
    }.toSet
    val gen = existing.filterNot(committed).sorted.headOption
      .getOrElse(if (existing.isEmpty) 0 else existing.max + 1)
    val offset = genDirs(spark, indexDir)
      .collect { case (k, d) if d != indexDir => Globals.read(d).n }.sum
    new IndexBuilder(spark, s"$indexDir/gen-$gen",
      params.copy(idOffset = offset))
      .build(pages, inputDesc)
    gen
  }

  /** Fold all generations into one standalone index at `outDir` (the
    * LSM-style major compaction): docIds are already dense and globally
    * ordered across generations, so the merged docs table re-runs only the
    * tf/stats/postings stages — extraction and id assignment never repeat. */
  def compact(spark: SparkSession, indexDir: String, outDir: String,
      params: IndexParams): Unit = {
    val gens = genDirs(spark, indexDir)
    val docs = gens.map { case (_, d) => spark.read.parquet(s"$d/docs") }
      .reduce(_.unionByName(_))
    val b = new IndexBuilder(spark, outDir, params)
    docs.write.mode(SaveMode.Overwrite).parquet(b.docsPath)
    val n = gens.map { case (_, d) => Globals.read(d).n }.sum
    b.commitDocs(n, s"compact(${gens.size} gens of $indexDir)")
    b.stageTf()
    b.stageStats()
    b.stagePostings()
  }
}
