package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.corpus.{Page, SyntheticCorpus}
import graft.index.{IncrementalIndex, IndexBuilder, IndexParams}
import graft.query.{IndexReader, Scored}
import graft.sources.Iceberg

/** Iceberg snapshot consumption into index generations (reference
  * iceberg-source "consume then stop" mode): delta-only ingest, a
  * manifest-derived cursor that survives kills AND in-place compaction,
  * and score-identity to the full rebuild. */
class IcebergIngestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val params =
    IndexParams(buckets = 4, shardSize = 64, blockSize = 16, buildPartitions = 4)
  private val Total = 200

  private def slice(lo: Long, hi: Long) =
    SyntheticCorpus.generate(spark, Total, seed = 23L).filter { (p: Page) =>
      val rid = p.url.substring(p.url.lastIndexOf('/') + 1).toLong
      rid >= lo && rid < hi
    }

  private def urlOf(indexDir: String): Map[Long, String] = {
    import spark.implicits._
    IncrementalIndex.genDirs(spark, indexDir).flatMap { case (_, d) =>
      spark.read.parquet(s"$d/docs").select($"docId", $"url")
        .as[(Long, String)].collect()
    }.toMap
  }

  test("snapshots ingest once each, as deltas, surviving compaction") {
    val tableDir = TestSpark.tmpDir("graft-ice-ingest-table")
    val indexDir = TestSpark.tmpDir("graft-ice-ingest-index")

    Iceberg.write(spark, slice(0, 120).toDF(), tableDir)
    val first = Streaming.indexAppendFromIceberg(spark, tableDir, indexDir,
      params, maxGenerations = 2)
    assert(first == Seq(1L))
    assert(IncrementalIndex.totalDocs(spark, indexDir) == 120)

    // caught up: a re-run ingests nothing (manifest-derived cursor)
    assert(Streaming.indexAppendFromIceberg(spark, tableDir, indexDir,
      params, maxGenerations = 2).isEmpty)
    assert(IncrementalIndex.totalDocs(spark, indexDir) == 120)

    // two more snapshots: each consumed as its own DELTA generation; the
    // third append pushes past maxGenerations=2 and triggers compaction
    Iceberg.append(spark, slice(120, 170).toDF(), tableDir)
    Iceberg.append(spark, slice(170, 200).toDF(), tableDir)
    val next = Streaming.indexAppendFromIceberg(spark, tableDir, indexDir,
      params, maxGenerations = 2)
    assert(next == Seq(2L, 3L))
    assert(IncrementalIndex.totalDocs(spark, indexDir) == 200)
    assert(IncrementalIndex.genDirs(spark, indexDir).size <= 2)

    // the cursor SURVIVED the compaction: nothing re-ingests
    assert(Streaming.indexAppendFromIceberg(spark, tableDir, indexDir,
      params, maxGenerations = 2).isEmpty)
    assert(IncrementalIndex.totalDocs(spark, indexDir) == 200)

    // score-identity to a from-scratch rebuild over the union
    val fullDir = TestSpark.tmpDir("graft-ice-ingest-full")
    new IndexBuilder(spark, fullDir, params)
      .build(SyntheticCorpus.generate(spark, Total, seed = 23L), "full")
    val inc = new IndexReader(spark, indexDir)
    val full = new IndexReader(spark, fullDir)
    assert(inc.globals == full.globals)
    val (iu, fu) = (urlOf(indexDir), urlOf(fullDir))
    val queries = SyntheticCorpus.querySet().take(10)
    val ic = inc.loadCache(queries.flatten.distinct)
    val fc = full.loadCache(queries.flatten.distinct)
    def same(a: Array[Scored], b: Array[Scored], q: Seq[String]): Unit = {
      assert(a.map(_.score).sameElements(b.map(_.score)), s"scores differ: $q")
      val ga = a.groupBy(_.score).map { case (s, xs) => s -> xs.map(x => iu(x.docId)).toSet }
      val gb = b.groupBy(_.score).map { case (s, xs) => s -> xs.map(x => fu(x.docId)).toSet }
      assert(ga == gb, s"url sets differ: $q")
    }
    queries.foreach(q => same(inc.topKLocal(ic, q, 10), full.topKLocal(fc, q, 10), q))
  }
}
