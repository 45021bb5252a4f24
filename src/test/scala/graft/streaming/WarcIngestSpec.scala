package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.corpus.SyntheticCorpus
import graft.index.{IncrementalIndex, IndexParams}
import graft.query.{IndexReader, Search}
import graft.sources.Warc

/** Raw-crawl ingest: WARC archive files → index generations, with a
  * manifest-derived per-file cursor that survives re-runs and in-place
  * compaction, and extraction byte-identity guaranteed by construction
  * (the build re-extracts and verifies). */
class WarcIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params =
    IndexParams(buckets = 4, shardSize = 64, blockSize = 16,
      buildPartitions = 4)
  private val iso = "2026-02-03T04:05:06Z"

  private def writeArchive(dir: String, name: String,
      pages: Seq[graft.corpus.Page], gz: Boolean): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
      Warc.encodeFile(
        pages.map(p => Warc.responseRecord(p.url, iso, p.html)), gz))

  test("pagesFromWarc: response records become extraction-true pages") {
    val dir = TestSpark.tmpDir("graft-warc-pages")
    val pages = SyntheticCorpus.generate(spark, 30, seed = 51L).collect()
    writeArchive(dir, "c-0.warc.gz", pages.toSeq, gz = true)
    val got = Streaming.pagesFromWarc(spark, dir).collect()
      .map(p => p.url -> p).toMap
    assert(got.size == pages.length)
    pages.foreach { p =>
      val g = got(p.url)
      assert(java.util.Arrays.equals(g.html, p.html))
      // extraction is the engine's own (byte-identical to the corpus
      // generator's stored text by the shared extractor contract)
      assert(g.text == p.text)
      assert(g.warc_ts.toInstant.toString == iso)
    }
  }

  test("archive files ingest once each, cursor survives compaction") {
    val warcDir = TestSpark.tmpDir("graft-warc-ingest")
    val indexDir = TestSpark.tmpDir("graft-warc-ingest-idx")
    val all = SyntheticCorpus.generate(spark, 120, seed = 53L).collect()
    writeArchive(warcDir, "crawl-00000.warc.gz", all.take(40).toSeq, gz = true)
    writeArchive(warcDir, "crawl-00001.warc", all.slice(40, 80).toSeq,
      gz = false)

    val first = Streaming.indexAppendFromWarc(spark, warcDir, indexDir,
      params, maxGenerations = 1) // force a compaction after the 2nd file
    assert(first == Seq("crawl-00000.warc.gz", "crawl-00001.warc"))
    assert(IncrementalIndex.totalDocs(spark, indexDir) == 80)
    // caught up — and the compaction did not lose the cursor
    assert(Streaming.indexAppendFromWarc(spark, warcDir, indexDir,
      params, maxGenerations = 1).isEmpty)

    // a late archive ingests alone
    writeArchive(warcDir, "crawl-00002.warc.gz", all.drop(80).toSeq, gz = true)
    assert(Streaming.indexAppendFromWarc(spark, warcDir, indexDir,
      params, maxGenerations = 8) == Seq("crawl-00002.warc.gz"))
    assert(IncrementalIndex.totalDocs(spark, indexDir) == 120)

    // queries over the ingested index ≡ brute over its own docs tables
    val docs = IncrementalIndex.genDirs(spark, indexDir)
      .map { case (_, d) => spark.read.parquet(s"$d/docs") }
      .reduce(_.unionByName(_)).select("docId", "text", "lang")
    val brute = Search.boolTopK(docs, "docId", "text",
      Nil, Seq("the", "w00002"), Nil, 10)
      .as[(Long, Double)].collect().toSeq
    val served = new graft.query.IndexSearch(spark,
      new IndexReader(spark, indexDir))
      .boolTopK(Nil, Seq("the", "w00002"), Nil, 10)
      .select(col("docId").cast("long"), col("score"))
      .as[(Long, Double)].collect().toSeq
    assert(served == brute)
  }
}
