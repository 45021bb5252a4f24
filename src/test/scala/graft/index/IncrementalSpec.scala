package graft.index

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.corpus.{Page, SyntheticCorpus}
import graft.query.{IndexReader, Scored}

/** Generational (incremental) index maintenance: appends must be
  * SCORE-identical to a from-scratch rebuild over the union — the
  * strongest possible equivalence (df/N/avgdl merging, query-time block
  * bounds, cross-generation shard merging all have to be exact for the
  * doubles to match bit for bit). Batch sizes are deliberately not
  * multiples of shardSize so generation boundaries fall mid-shard and the
  * per-shard WAND merges blocks from two generations. */
class IncrementalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val params =
    IndexParams(buckets = 4, shardSize = 64, blockSize = 16, buildPartitions = 4)

  private lazy val work = Files.createTempDirectory("graft-inc").toString
  private val Total = 240
  private val Cuts = Seq(0L, 150L, 210L, 240L) // batch sizes 150/60/30

  private def batch(i: Int) = {
    // locals only in the closure — a method ref would capture the suite
    val lo = Cuts(i)
    val hi = Cuts(i + 1)
    SyntheticCorpus.generate(spark, Total, seed = 11L)
      .filter { (p: Page) =>
        val rid = p.url.substring(p.url.lastIndexOf('/') + 1).toLong
        rid >= lo && rid < hi
      }
  }

  private lazy val incDir = {
    val d = s"$work/inc"
    (0 until 3).foreach { i =>
      val g = IncrementalIndex.append(spark, d, batch(i), params, s"batch$i")
      assert(g == i)
    }
    d
  }

  private lazy val fullDir = {
    val d = s"$work/full"
    new IndexBuilder(spark, d, params)
      .build(SyntheticCorpus.generate(spark, Total, seed = 11L), "full")
    d
  }

  private def urlOf(indexDir: String): Map[Long, String] = {
    import spark.implicits._
    IncrementalIndex.genDirs(spark, indexDir).flatMap { case (_, d) =>
      spark.read.parquet(s"$d/docs").select($"docId", $"url")
        .as[(Long, String)].collect()
    }.toMap
  }

  /** Equality up to docId relabeling: bitwise-equal score sequences, and
    * within every tied-score run the same url set. */
  private def assertSameRanking(a: Array[Scored], aUrl: Map[Long, String],
      b: Array[Scored], bUrl: Map[Long, String], ctx: String): Unit = {
    assert(a.map(_.score).sameElements(b.map(_.score)), s"score seq differs: $ctx")
    val ga = a.groupBy(_.score).map { case (s, xs) => s -> xs.map(x => aUrl(x.docId)).toSet }
    val gb = b.groupBy(_.score).map { case (s, xs) => s -> xs.map(x => bUrl(x.docId)).toSet }
    assert(ga == gb, s"url sets differ within score groups: $ctx")
  }

  test("three appends are score-identical to the full rebuild") {
    val inc = new IndexReader(spark, incDir)
    val full = new IndexReader(spark, fullDir)
    assert(inc.globals == full.globals) // exact merged N and sumDl
    val (iu, fu) = (urlOf(incDir), urlOf(fullDir))
    val queries = SyntheticCorpus.querySet().take(25)
    val ic = inc.loadCache(queries.flatten.distinct)
    val fc = full.loadCache(queries.flatten.distinct)
    queries.foreach { q =>
      assertSameRanking(inc.topKLocal(ic, q, 10), iu,
        full.topKLocal(fc, q, 10), fu, s"q=$q")
    }
  }

  test("distributed topK over a mid-shard generation boundary equals local") {
    import spark.implicits._
    val inc = new IndexReader(spark, incDir)
    val cache = inc.loadCache(SyntheticCorpus.querySet().take(6).flatten.distinct)
    SyntheticCorpus.querySet().take(6).foreach { q =>
      val dist = inc.topK(q, 10).as[(Long, Double)].collect()
      val local = inc.topKLocal(cache, q, 10)
      assert(dist.map(_._1).sameElements(local.map(_.docId)), s"dist != local for $q")
      assert(dist.map(_._2).sameElements(local.map(_.score)))
    }
  }

  test("compaction folds generations with identical results") {
    val outDir = s"$work/compacted"
    IncrementalIndex.compact(spark, incDir, outDir, params)
    val inc = new IndexReader(spark, incDir)
    val comp = new IndexReader(spark, outDir)
    assert(comp.globals == inc.globals)
    val (iu, cu) = (urlOf(incDir), urlOf(outDir))
    val queries = SyntheticCorpus.querySet().take(12)
    val ic = inc.loadCache(queries.flatten.distinct)
    val cc = comp.loadCache(queries.flatten.distinct)
    queries.foreach { q =>
      assertSameRanking(inc.topKLocal(ic, q, 10), iu,
        comp.topKLocal(cc, q, 10), cu, s"q=$q")
    }
  }

  test("a half-built generation is re-entered, not skipped") {
    incDir // ensure 3 committed generations
    // simulate a killed append: gen dir exists, globals.json never written
    val half = new java.io.File(s"$incDir/gen-3")
    half.mkdirs()
    val g = IncrementalIndex.append(spark, incDir, batch(2), params, "retry")
    assert(g == 3, "append must resume the half-built generation number")
    assert(new java.io.File(s"$incDir/gen-3/globals.json").exists())
    // idOffset of the resumed gen = docs of gens 0..2, not of the stray dir
    assert(Globals.read(s"$incDir/gen-3").n == Cuts(3) - Cuts(2))
  }

  test("a kill between the stats and postings commits resumes in place") {
    import org.apache.spark.sql.functions.{min => sqlMin}
    import spark.implicits._
    incDir // ensure committed generations exist
    val offset = IncrementalIndex.totalDocs(spark, incDir)
    val gen = IncrementalIndex.genDirs(spark, incDir).map(_._1).max + 1
    // half-build the next generation: docs+tf+stats committed — so
    // globals.json EXISTS — but postings never commits. This is the
    // window where commit-on-globals would double-count the batch and
    // permanently brick the reader (no postings manifest → no bucket
    // modulus).
    intercept[InjectedFailure] {
      new IndexBuilder(spark, s"$incDir/gen-$gen", params.copy(idOffset = offset))
        .build(batch(1), "kill-test", failAfterStage = Some("stats"))
    }
    assert(new java.io.File(s"$incDir/gen-$gen/globals.json").exists())
    // the half-committed generation must be invisible to readers/appends
    assert(!IncrementalIndex.genDirs(spark, incDir).exists(_._1 == gen))
    assert(IncrementalIndex.totalDocs(spark, incDir) == offset)
    // re-running the same append resumes the SAME generation at the SAME
    // idOffset (docs/tf/stats stages skip via their manifests)
    val g = IncrementalIndex.append(spark, incDir, batch(1), params, "retry")
    assert(g == gen, "append must resume the stats-committed generation")
    assert(IncrementalIndex.genDirs(spark, incDir).exists(_._1 == gen))
    assert(IncrementalIndex.totalDocs(spark, incDir) ==
      offset + (Cuts(2) - Cuts(1)))
    val minId = spark.read.parquet(s"$incDir/gen-$gen/docs")
      .agg(sqlMin($"docId")).as[Long].collect()(0)
    assert(minId == offset, "resumed generation must not shift its docIds")
  }

  test("auto-compaction bounds generations; plans stay flat; results identical") {
    val d = s"$work/auto"
    val slices = Seq((0L, 60L), (60L, 120L), (120L, 160L), (160L, 200L), (200L, 240L))
    def slice(lo: Long, hi: Long) =
      SyntheticCorpus.generate(spark, Total, seed = 11L).filter { (p: Page) =>
        val rid = p.url.substring(p.url.lastIndexOf('/') + 1).toLong
        rid >= lo && rid < hi
      }
    val maxGens = 2
    slices.foreach { case (lo, hi) =>
      IncrementalIndex.append(spark, d, slice(lo, hi), params, s"b$lo")
      IncrementalIndex.maybeCompact(spark, d, params, maxGens)
      // the bound holds after EVERY batch — five batches never mean five
      // postings scans per query
      assert(IncrementalIndex.genDirs(spark, d).size <= maxGens)
    }
    val inc = new IndexReader(spark, d)
    val full = new IndexReader(spark, fullDir)
    assert(inc.globals == full.globals) // no batch lost or double-counted
    // plans flat: one bucket-pruned scan per VISIBLE generation
    val q0 = SyntheticCorpus.querySet().head
    val leaves = inc.segmentsFor(q0).queryExecution.optimizedPlan
      .collectLeaves().size
    assert(leaves == IncrementalIndex.genDirs(spark, d).size && leaves <= maxGens)
    val (iu, fu) = (urlOf(d), urlOf(fullDir))
    val queries = SyntheticCorpus.querySet().take(12)
    val ic = inc.loadCache(queries.flatten.distinct)
    val fc = full.loadCache(queries.flatten.distinct)
    queries.foreach { q =>
      assertSameRanking(inc.topKLocal(ic, q, 10), iu,
        full.topKLocal(fc, q, 10), fu, s"q=$q")
    }
  }

  test("a killed compaction resumes; appends landing meanwhile stay visible") {
    val d = s"$work/resume"
    assert(IncrementalIndex.append(spark, d, batch(0), params, "b0") == 0)
    assert(IncrementalIndex.append(spark, d, batch(1), params, "b1") == 1)
    // simulate a kill right after compaction-target allocation: the
    // tombstone exists, nothing is built
    IndexIO.writeString(s"$d/gen-2/supersedes.json", "[0,1]")
    // gens 0 and 1 stay visible (tombstone binds only on commit)...
    assert(IncrementalIndex.genDirs(spark, d).map(_._1) == Seq(0, 1))
    // ...and a new append skips the pending target rather than resuming it
    assert(IncrementalIndex.append(spark, d, batch(2), params, "b2") == 3)
    // resume completes the fold of EXACTLY gens 0 and 1 (not the new 3)
    assert(IncrementalIndex.compactGenerations(spark, d, params).contains(2))
    assert(IncrementalIndex.genDirs(spark, d).map(_._1) == Seq(2, 3))
    // superseded dirs garbage-collected
    assert(!new java.io.File(s"$d/gen-0").exists())
    assert(!new java.io.File(s"$d/gen-1").exists())
    // nothing lost: totals and rankings match the full rebuild
    val inc = new IndexReader(spark, d)
    val full = new IndexReader(spark, fullDir)
    assert(inc.globals == full.globals)
    val (iu, fu) = (urlOf(d), urlOf(fullDir))
    val queries = SyntheticCorpus.querySet().take(10)
    val ic = inc.loadCache(queries.flatten.distinct)
    val fc = full.loadCache(queries.flatten.distinct)
    queries.foreach { q =>
      assertSameRanking(inc.topKLocal(ic, q, 10), iu,
        full.topKLocal(fc, q, 10), fu, s"q=$q")
    }
  }

  test("append with mismatched founding params fails fast") {
    incDir
    intercept[IllegalArgumentException] {
      IncrementalIndex.append(spark, incDir, batch(0),
        params.copy(shardSize = 128), "bad-params")
    }
  }

  test("appending into a standalone index dir is refused") {
    fullDir
    intercept[IllegalArgumentException] {
      IncrementalIndex.append(spark, fullDir, batch(0), params, "bad")
    }
  }
}
