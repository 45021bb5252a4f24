package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.corpus.SyntheticCorpus
import graft.query.{IndexReader, IndexSearch}

/** _reindex: a destination built from the source's stored fields under
  * DIFFERENT founding params matches a from-scratch build over the live
  * pages score-for-score (matched by url — docIds are assignment-local),
  * and deletes materialize. The tombstoned source itself keeps Lucene
  * visibility (deleted docs still count in N/avgdl/df), so its absolute
  * scores differ while the ranking agrees. */
class ReindexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def urlScores(indexDir: String, res: DataFrame): Seq[(String, Double)] = {
    val m = spark.read.parquet(s"$indexDir/docs").select("docId", "url")
    res.join(m, "docId").select("url", "score")
      .orderBy(desc("score"), col("url")).as[(String, Double)].collect().toSeq
  }

  test("reindex under new params ≡ from-scratch build over live docs; deletes materialize") {
    val src = TestSpark.tmpDir("graft-reindex-src")
    val dst = TestSpark.tmpDir("graft-reindex-dst")
    val srcParams = IndexParams(buckets = 8, shardSize = 64,
      blockSize = 32, buildPartitions = 4, positions = true)
    val pages = SyntheticCorpus.generate(spark, 400, seed = 31L, partitions = 4)
    new IndexBuilder(spark, src, srcParams).build(pages, "reindex-src")
    // tombstone a slice
    val victims = spark.read.parquet(s"$src/docs")
      .filter(pmod(col("docId"), lit(7)) === 3).select("docId")
    val nVictims = victims.count()
    assert(nVictims > 0)
    IncrementalIndex.deleteDocs(spark, src, victims)
    val totalN = spark.read.parquet(s"$src/docs").count()

    // rebuild under different founding params: fewer buckets, bigger
    // shards, smaller blocks, different id decomposition
    Reindex.reindex(spark, src, dst, IndexParams(buckets = 4,
      shardSize = 128, blockSize = 16, buildPartitions = 4,
      idBuckets = 32, positions = true))

    // destination holds exactly the live docs
    assert(spark.read.parquet(s"$dst/docs").count() == totalN - nVictims)

    // ground truth: a from-scratch build over exactly the live pages
    // under the SOURCE params — reindex must match it score-for-score
    // (matched by url; docIds are assignment-local)
    val ref = TestSpark.tmpDir("graft-reindex-ref")
    val victimUrls = spark.read.parquet(s"$src/docs")
      .filter(pmod(col("docId"), lit(7)) === 3).select("url")
    val livePages = pages.toDF().join(victimUrls, Seq("url"), "left_anti")
      .as[graft.corpus.Page]
    new IndexBuilder(spark, ref, srcParams).build(livePages, "reindex-ref")

    val refReader = new IndexReader(spark, ref)
    val dstReader = new IndexReader(spark, dst)
    val terms = Seq("the", "w00002")
    val refTop = urlScores(ref, refReader.topK(terms, 20).toDF())
    val dstTop = urlScores(dst, dstReader.topK(terms, 20).toDF())
    assert(refTop == dstTop && refTop.nonEmpty)
    // phrase ranking survives the params change too
    val phrase = Seq("the", "w00001")
    assert(urlScores(ref, refReader.phraseTopK(phrase, 10).toDF()) ==
      urlScores(dst, dstReader.phraseTopK(phrase, 10).toDF()))
    // served search API over the rebuilt postings agrees as well
    val a = new IndexSearch(spark, ref).boolTopK(Seq("the"), Nil, Nil, 15)
    val b = new IndexSearch(spark, dst).boolTopK(Seq("the"), Nil, Nil, 15)
    assert(urlScores(ref, a) == urlScores(dst, b))
    // the tombstoned-but-uncompacted SOURCE still EXCLUDES the victims
    // (Lucene visibility); its stats legitimately differ, so no score or
    // exact-order claim is made against it — only deletion visibility
    val srcTopUrls = urlScores(src,
      new IndexReader(spark, src).topK(terms, 20).toDF()).map(_._1).toSet
    val victimUrlSet = victimUrls.as[String].collect().toSet
    assert(srcTopUrls.intersect(victimUrlSet).isEmpty)
  }
}
