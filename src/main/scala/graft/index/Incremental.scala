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
  * add per-query cost LINEARLY — every query unions one bucket-pruned
  * postings scan per generation and the reader sums per-generation
  * metadata — so generation count must be BOUNDED, not just compactable:
  * [[maybeCompact]] enforces a threshold (`maxGenerations`; the streaming
  * appender triggers it automatically) by folding all visible generations
  * into one new generation IN PLACE. The compacted generation records the
  * ones it folded in a `supersedes.json` tombstone; [[genDirs]] hides
  * superseded generations once the compacted one commits, so readers see
  * either the old set or the new single generation — never both, never
  * neither — and the folded dirs are garbage-collected best-effort after
  * the commit. A killed compaction resumes through the same stage
  * manifests; appends landing while a compaction is pending stay visible
  * (they are not in the tombstone).
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

  /** Generations folded into `genDir` by a compaction ([[maybeCompact]]);
    * present from the moment the compaction target is allocated, binding
    * only once the target commits. */
  private def supersededBy(genDir: String): Seq[Int] =
    IndexIO.readString(s"$genDir/supersedes.json") match {
      case Some(s) => s.trim.stripPrefix("[").stripSuffix("]").split(",")
        .toSeq.map(_.trim).filter(_.nonEmpty).map(_.toInt)
      case None => Seq.empty
    }

  /** Committed (gen, dir) pairs sorted by generation, with generations
    * superseded by a COMMITTED compaction hidden; `(0, indexDir)` when
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
    val superseded = found.flatMap { case (_, d) => supersededBy(d) }.toSet
    val visible = found.filterNot { case (k, _) => superseded(k) }
    if (visible.isEmpty) Seq(0 -> indexDir) else visible.sortBy(_._1)
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
    * idBuckets/codec) are VERIFIED against the committed generations'
    * manifests
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
    val Founding =
      Seq("buckets", "shardSize", "blockSize", "idBuckets", "codec", "positions")
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
    // resume-eligible = uncommitted ON DISK (not via genDirs, which hides
    // superseded gens — a GC-surviving superseded dir must never be
    // "resumed") and not a pending compaction target (supersedes.json)
    val committedOnDisk = existing.filter(k =>
      isGenCommitted(s"$indexDir/gen-$k")).toSet
    val gen = existing.filterNot(committedOnDisk)
      .filterNot(k => supersededBy(s"$indexDir/gen-$k").nonEmpty)
      .sorted.headOption
      .getOrElse(if (existing.isEmpty) 0 else existing.max + 1)
    val offset = genDirs(spark, indexDir)
      .collect { case (k, d) if d != indexDir => Globals.read(d).n }.sum
    new IndexBuilder(spark, s"$indexDir/gen-$gen",
      params.copy(idOffset = offset))
      .build(pages, inputDesc)
    gen
  }

  /** Enforce the generation bound: when more than `maxGenerations`
    * generations are visible, fold them all into one new generation via
    * [[compactGenerations]]. The threshold trades append amortization
    * against per-query cost — each visible generation adds one
    * bucket-pruned postings scan and one metadata row per query term, so
    * cost grows linearly in generation count and the bound keeps query
    * plans FLAT no matter how many batches ever streamed in. Returns the
    * compacted generation number when a compaction ran. */
  def maybeCompact(spark: SparkSession, indexDir: String,
      params: IndexParams, maxGenerations: Int): Option[Int] = {
    val gens = genDirs(spark, indexDir).filter(_._2 != indexDir)
    if (gens.size > maxGenerations) compactGenerations(spark, indexDir, params)
    else None
  }

  /** In-place LSM compaction: fold every visible generation into the next
    * generation number. The target records its inputs in a
    * `supersedes.json` tombstone BEFORE building; visibility flips
    * atomically with the target's postings-manifest commit ([[genDirs]]
    * hides superseded gens only once the target is committed), and the
    * folded dirs are deleted best-effort afterwards. Resumable: a rerun
    * re-enters the pending target, reuses its tombstone (never re-listing
    * gens — an append that landed meanwhile must stay visible), and skips
    * committed stages. docIds are already dense and globally ordered
    * across generations, so only tf/stats/postings re-run over the merged
    * docs table — extraction and id assignment never repeat. */
  def compactGenerations(spark: SparkSession, indexDir: String,
      params: IndexParams): Option[Int] = {
    val f = fs(spark, indexDir)
    val onDisk =
      if (!f.exists(new Path(indexDir))) Seq.empty[Int]
      else f.listStatus(new Path(indexDir)).toSeq.collect {
        case st if st.isDirectory => st.getPath.getName match {
          case GenRe(k) => Some(k.toInt)
          case _ => None
        }
      }.flatten
    // resume a pending target first: uncommitted dir carrying a tombstone
    val pending = onDisk
      .filterNot(k => isGenCommitted(s"$indexDir/gen-$k"))
      .filter(k => supersededBy(s"$indexDir/gen-$k").nonEmpty)
      .sorted.headOption
    val target = pending match {
      case Some(t) => t
      case None =>
        val gens = genDirs(spark, indexDir)
        if (gens.size <= 1 || gens.exists(_._2 == indexDir)) return None
        val t = onDisk.max + 1
        IndexIO.writeString(s"$indexDir/gen-$t/supersedes.json",
          gens.map(_._1).mkString("[", ",", "]"))
        t
    }
    val genDir = s"$indexDir/gen-$target"
    val superseded = supersededBy(genDir)
    val srcDirs = superseded.map(k => s"$indexDir/gen-$k")
    val b = new IndexBuilder(spark, genDir, params)
    def committed(stage: String): Boolean =
      Manifest.read(genDir, stage).exists(_.status == "committed")
    if (!committed("docs")) {
      val docs = srcDirs.map(d => spark.read.parquet(s"$d/docs"))
        .reduce(_.unionByName(_))
      docs.write.mode(SaveMode.Overwrite).parquet(b.docsPath)
      val n = srcDirs.map(d => Globals.read(d).n).sum
      // carry the folded generations' SOURCE descriptors forward: source
      // cursors (e.g. consumed Iceberg snapshot ids) are derived from
      // committed generations' docs manifests and must survive compaction
      val srcInputs = srcDirs.flatMap(d =>
        Manifest.read(d, "docs").toSeq.flatMap(_.inputs))
      b.commitDocs(n, s"compact(gens ${superseded.mkString(",")}); " +
        s"sources: ${srcInputs.mkString("; ")}")
    }
    if (!committed("tf")) b.stageTf()
    if (!committed("stats")) b.stageStats()
    if (!committed("postings")) b.stagePostings()
    // the commit flipped visibility; superseded dirs are dead weight now
    srcDirs.foreach { d =>
      try { f.delete(new Path(d), true); () } catch { case _: Exception => () }
    }
    Some(target)
  }

  /** Fold all generations into one standalone index at `outDir` (the
    * LSM-style major compaction to a NEW location): docIds are already
    * dense and globally ordered across generations, so the merged docs
    * table re-runs only the tf/stats/postings stages — extraction and id
    * assignment never repeat. */
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
