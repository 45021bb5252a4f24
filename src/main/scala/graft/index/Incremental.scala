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

  /** First docId the NEXT generation may assign. Equal to [[totalDocs]]
    * until a deletion-applying compaction leaves holes in the docId
    * space — from then on a sum of live counts UNDERCOUNTS and re-using
    * it as an offset would collide new docIds with surviving ones. Each
    * generation's ceiling is `idOffset + n` from its committed postings
    * manifest (atomic with the generation itself — no crash window), or
    * the `idceiling.json` a compaction target records before building
    * (its manifest idOffset is meaningless: compaction preserves the
    * folded generations' docIds instead of assigning). */
  def idCeiling(spark: SparkSession, indexDir: String): Long = {
    val root = new Path(indexDir)
    if (!fs(spark, indexDir).exists(root)) return 0L
    genDirs(spark, indexDir).map { case (_, d) =>
      IndexIO.readString(s"$d/idceiling.json").map(_.trim.toLong)
        .getOrElse {
          if (d == indexDir &&
            IndexIO.readString(s"$indexDir/globals.json").isEmpty) 0L
          else Manifest.read(d, "postings")
            .flatMap(_.params.get("idOffset")).map(_.toLong).getOrElse(0L) +
            Globals.read(d).n
        }
    }.foldLeft(0L)(math.max)
  }

  // ------------------------------------------------------------------
  // Deletions — Lucene-style tombstones. A delete batch is a parquet
  // directory of docIds under indexDir/deletes/; readers exclude
  // tombstoned docs from RESULTS while corpus stats (N, avgdl, df) keep
  // counting them — exactly OpenSearch/Lucene visibility semantics, where
  // deleted docs affect scores until segments merge. A compaction applies
  // deletions PHYSICALLY (rows leave the docs table, stats shrink) and
  // drops the consumed tombstones.

  private val DelRe = "^del-(\\d+)$".r

  /** Tombstone a batch of docIds: committed atomically by directory
    * rename, numbered after the existing batches. `ids` must be a single
    * BIGINT `docId` column (or castable). */
  def deleteDocs(spark: SparkSession, indexDir: String,
      ids: org.apache.spark.sql.DataFrame): Unit = {
    val f = fs(spark, indexDir)
    val delRoot = new Path(s"$indexDir/deletes")
    f.mkdirs(delRoot)
    val next = f.listStatus(delRoot).toSeq.collect {
      case st if st.isDirectory => st.getPath.getName match {
        case DelRe(k) => Some(k.toInt)
        case _ => None
      }
    }.flatten.foldLeft(-1)(math.max) + 1
    val tmp = new Path(delRoot, s"_tmp-del-$next")
    ids.select(ids.columns.head).toDF("docId")
      .select(org.apache.spark.sql.functions.col("docId").cast("long"))
      .distinct()
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (!f.rename(tmp, new Path(delRoot, s"del-$next")))
      throw new java.io.IOException(
        s"tombstone commit rename failed under $delRoot")
  }

  /** Names of committed tombstone batches, sorted. */
  def deleteBatches(spark: SparkSession, indexDir: String): Seq[String] = {
    val delRoot = new Path(s"$indexDir/deletes")
    val f = fs(spark, indexDir)
    if (!f.exists(delRoot)) Seq.empty
    else f.listStatus(delRoot).toSeq.collect {
      case st if st.isDirectory => st.getPath.getName match {
        case DelRe(_) => Some(st.getPath.getName)
        case _ => None
      }
    }.flatten.sortBy { case DelRe(k) => k.toInt }
  }

  /** Union of tombstoned docIds across the given batches (default: all
    * committed batches); None when there are none. */
  def deletedIds(spark: SparkSession, indexDir: String,
      batches: Seq[String] = null): Option[org.apache.spark.sql.DataFrame] = {
    val bs = Option(batches)
      .getOrElse(deleteBatches(spark, indexDir))
    if (bs.isEmpty) None
    else Some(bs.map(b => spark.read.parquet(s"$indexDir/deletes/$b"))
      .reduce(_.unionByName(_)).distinct())
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
    // ceiling, not sum-of-live-counts: a deletion-applying compaction
    // leaves docId holes, and an offset below the surviving max id would
    // collide ([[idCeiling]])
    val offset = idCeiling(spark, indexDir)
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
        // the target's manifest idOffset is meaningless (docIds are
        // preserved, not assigned) — record the folded ceiling FIRST so
        // post-compaction appends can never collide into docId holes
        IndexIO.writeString(s"$indexDir/gen-$t/idceiling.json",
          idCeiling(spark, indexDir).toString)
        // snapshot the tombstone batches this compaction will CONSUME —
        // resume must apply the same set, and deletes landing after this
        // instant must survive the compaction (they stay read-side until
        // the next one)
        IndexIO.writeString(s"$indexDir/gen-$t/consumed_deletes.json",
          deleteBatches(spark, indexDir).mkString("[", ",", "]"))
        IndexIO.writeString(s"$indexDir/gen-$t/supersedes.json",
          gens.map(_._1).mkString("[", ",", "]"))
        t
    }
    val genDir = s"$indexDir/gen-$target"
    val superseded = supersededBy(genDir)
    val srcDirs = superseded.map(k => s"$indexDir/gen-$k")
    val consumed = IndexIO.readString(s"$genDir/consumed_deletes.json")
      .map(_.trim.stripPrefix("[").stripSuffix("]").split(",")
        .toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)
    val b = new IndexBuilder(spark, genDir, params)
    def committed(stage: String): Boolean =
      Manifest.read(genDir, stage).exists(_.status == "committed")
    if (!committed("docs")) {
      val merged = srcDirs.map(d => spark.read.parquet(s"$d/docs"))
        .reduce(_.unionByName(_))
      // apply consumed tombstones PHYSICALLY (docIds keep their values —
      // holes are fine, shards are ranges); stats shrink to survivors,
      // matching Lucene merge semantics
      val docs = deletedIds(spark, indexDir, consumed) match {
        case Some(del) => merged.join(
          org.apache.spark.sql.functions.broadcast(del),
          Seq("docId"), "left_anti")
        case None => merged
      }
      docs.write.mode(SaveMode.Overwrite).parquet(b.docsPath)
      val n =
        if (consumed.isEmpty) srcDirs.map(d => Globals.read(d).n).sum
        else spark.read.parquet(b.docsPath).count()
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
    // the commit flipped visibility; superseded dirs and consumed
    // tombstones are dead weight now
    srcDirs.foreach { d =>
      try { f.delete(new Path(d), true); () } catch { case _: Exception => () }
    }
    consumed.foreach { batch =>
      try { f.delete(new Path(s"$indexDir/deletes/$batch"), true); () }
      catch { case _: Exception => () }
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
    val merged = gens.map { case (_, d) => spark.read.parquet(s"$d/docs") }
      .reduce(_.unionByName(_))
    // major compaction to a new location applies ALL tombstones; outDir
    // starts clean (no deletes/ carried over)
    val del = deletedIds(spark, indexDir)
    val docs = del match {
      case Some(ids) => merged.join(
        org.apache.spark.sql.functions.broadcast(ids), Seq("docId"),
        "left_anti")
      case None => merged
    }
    val b = new IndexBuilder(spark, outDir, params)
    docs.write.mode(SaveMode.Overwrite).parquet(b.docsPath)
    val n =
      if (del.isEmpty) gens.map { case (_, d) => Globals.read(d).n }.sum
      else spark.read.parquet(b.docsPath).count()
    b.commitDocs(n, s"compact(${gens.size} gens of $indexDir)")
    b.stageTf()
    b.stageStats()
    b.stagePostings()
  }
}
