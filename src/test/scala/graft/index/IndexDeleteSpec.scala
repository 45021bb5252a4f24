package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.corpus.SyntheticCorpus
import graft.query.{IndexReader, IndexSearch, Search}

/** Delete support: Lucene-style tombstones (results exclude deleted docs
  * immediately; N/avgdl/df keep counting them) applied PHYSICALLY by
  * compaction (stats shrink, tombstones consumed, docIds keep their
  * values so shard ranges stay valid). */
class IndexDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = IndexParams(buckets = 8, shardSize = 128,
    blockSize = 32, buildPartitions = 4, positions = true)

  private def freshGenIndex(n: Int, seed: Long): String = {
    val dir = TestSpark.tmpDir("graft-idx-del")
    val all = SyntheticCorpus.generate(spark, n, seed, partitions = 4)
    IncrementalIndex.append(spark, dir,
      all.filter(length(col("url")) % 2 === 0), params, "gen0")
    IncrementalIndex.append(spark, dir,
      all.filter(length(col("url")) % 2 === 1), params, "gen1")
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select(col("docId").cast("long"), col("score"))
      .as[(Long, Double)].collect().toSeq

  test("tombstones: results exclude deleted docs, survivors keep scores") {
    val dir = freshGenIndex(400, seed = 31L)
    val before = new IndexReader(spark, dir)
    val preTop = rows(before.topK(Seq("w00002", "w00005"), 30))
    val preBool = rows(new IndexSearch(spark, before)
      .boolTopK(Seq("the"), Seq("w00002"), Nil, 20))
    val prePhrase = rows(before.phraseTopK(Seq("the", "of"), 20))

    // a moderately rare term: present in some docs, absent from most, so
    // the top lists keep plenty of survivors to compare against
    val nDel = new IndexSearch(spark, before).deleteByQuery(Seq("w00300"))
    assert(nDel > 0)
    val delIds = IncrementalIndex.deletedIds(spark, dir).get
      .as[Long].collect().toSet

    // the pre-delete reader keeps its snapshot
    assert(rows(before.topK(Seq("w00002", "w00005"), 30)) == preTop)

    val after = new IndexReader(spark, dir)
    val se = new IndexSearch(spark, after)
    // Lucene visibility: the post-delete ranking IS the pre-delete one
    // with tombstoned docs removed — same scores, no re-rank
    val expTop = preTop.filterNot(r => delIds(r._1)).take(10)
    assert(expTop.nonEmpty)
    assert(rows(after.topK(Seq("w00002", "w00005"), 30))
      .take(expTop.length) == expTop)
    val expBool = preBool.filterNot(r => delIds(r._1)).take(8)
    assert(expBool.nonEmpty)
    assert(rows(se.boolTopK(Seq("the"), Seq("w00002"), Nil, 20))
      .take(expBool.length) == expBool)
    val expPhrase = prePhrase.filterNot(r => delIds(r._1)).take(8)
    assert(expPhrase.nonEmpty)
    assert(rows(after.phraseTopK(Seq("the", "of"), 20))
      .take(expPhrase.length) == expPhrase)
    // match sets and facet sums exclude tombstones
    assert(se.matchingDocIds(Seq("w00300")).count() == 0)
    val facetSum = se.facets(Seq("w00300"), "lang")
      .agg(coalesce(sum("doc_count"), lit(0L))).head().getLong(0)
    assert(facetSum == 0)
    // serving cache path gates too
    val cache = after.loadCache(Seq("w00300", "w00002"))
    val local = after.topKLocal(cache, Seq("w00300", "w00002"), 10)
    assert(local.nonEmpty && local.forall(s => !delIds(s.docId)))
  }

  test("compaction applies tombstones physically and consumes them") {
    val dir = freshGenIndex(300, seed = 37L)
    val pre = new IndexReader(spark, dir)
    val nBefore = pre.globals.n
    val nDel = new IndexSearch(spark, pre).deleteByQuery(Seq("w00007"))
    assert(nDel > 0)

    val target = IncrementalIndex.compactGenerations(spark, dir, params)
    assert(target.isDefined)
    assert(IncrementalIndex.deleteBatches(spark, dir).isEmpty,
      "consumed tombstones must be dropped")

    val post = new IndexReader(spark, dir)
    assert(post.globals.n == nBefore - nDel)
    // post-compaction ranking ≡ brute over the compacted docs table
    // (docIds preserved; stats now exclude the deleted docs)
    val docs = IncrementalIndex.genDirs(spark, dir)
      .map { case (_, d) => spark.read.parquet(s"$d/docs") }
      .reduce(_.unionByName(_)).select("docId", "text", "lang")
    assert(docs.count() == nBefore - nDel)
    val brute = rows(Search.boolTopK(docs, "docId", "text",
      Nil, Seq("w00002", "w00005"), Nil, 15))
    val served = rows(new IndexSearch(spark, post)
      .boolTopK(Nil, Seq("w00002", "w00005"), Nil, 15))
    assert(served == brute)
  }

  test("append after deleting compaction: docIds never collide") {
    val dir = freshGenIndex(200, seed = 41L)
    val pre = new IndexReader(spark, dir)
    new IndexSearch(spark, pre).deleteByQuery(Seq("w00003"))
    IncrementalIndex.compactGenerations(spark, dir, params)
    val ceiling = IncrementalIndex.idCeiling(spark, dir)
    assert(ceiling == 200L,
      "ceiling keeps the pre-compaction id space despite holes")
    IncrementalIndex.append(spark, dir,
      SyntheticCorpus.generate(spark, 50, seed = 43L, partitions = 2),
      params, "late-batch")
    val ids = IncrementalIndex.genDirs(spark, dir)
      .map { case (_, d) =>
        spark.read.parquet(s"$d/docs").select("docId") }
      .reduce(_.unionByName(_)).as[Long].collect()
    assert(ids.length == ids.distinct.length, "docId collision")
    assert(IncrementalIndex.idCeiling(spark, dir) == 250L)
  }

  test("tombstones landing after a compaction snapshot survive it") {
    val dir = freshGenIndex(200, seed = 47L)
    val r1 = new IndexReader(spark, dir)
    new IndexSearch(spark, r1).deleteByQuery(Seq("w00013"))
    IncrementalIndex.compactGenerations(spark, dir, params)
    // a delete against the compacted index stays read-side until the
    // NEXT compaction
    val r2 = new IndexReader(spark, dir)
    val n2 = new IndexSearch(spark, r2).deleteByQuery(Seq("w00002"))
    assert(n2 > 0)
    assert(IncrementalIndex.deleteBatches(spark, dir).size == 1)
    val r3 = new IndexReader(spark, dir)
    assert(new IndexSearch(spark, r3).matchingDocIds(Seq("w00002"))
      .count() == 0)
    assert(r3.globals.n == r2.globals.n, "stats unchanged until compaction")
  }
}
