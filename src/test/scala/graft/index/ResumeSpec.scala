package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.corpus.SyntheticCorpus

/** Kill-after-stage-N resume (BASELINE.md correctness gates): a build that
  * dies after `stats` must, on rerun, skip the committed stages and produce
  * an index identical to an uninterrupted build. */
class ResumeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val params = IndexParams(buckets = 4, shardSize = 64, blockSize = 16,
    buildPartitions = 4)

  private def pages = SyntheticCorpus.generate(spark, 300, seed = 7L, partitions = 4)

  test("killed build resumes from last committed manifest; index identical to clean run") {
    import spark.implicits._
    val interrupted = TestSpark.tmpDir("graft-resume")
    val clean = TestSpark.tmpDir("graft-clean")

    intercept[InjectedFailure] {
      new IndexBuilder(spark, interrupted, params)
        .build(pages, "synthetic(seed=7,n=300)", failAfterStage = Some("stats"))
    }
    assert(Manifest.isCommitted(interrupted, "stats", params.asMap))
    assert(!Manifest.isCommitted(interrupted, "postings", params.asMap))

    // resume — completed stages must NOT re-run (attempt stays 1)
    new IndexBuilder(spark, interrupted, params).build(pages, "synthetic(seed=7,n=300)")
    Seq("docs", "tf", "stats").foreach { s =>
      assert(Manifest.read(interrupted, s).get.attempt == 1, s"stage $s re-ran on resume")
    }
    assert(Manifest.isCommitted(interrupted, "postings", params.asMap))

    new IndexBuilder(spark, clean, params).build(pages, "synthetic(seed=7,n=300)")
    def rows(dir: String) = spark.read.parquet(s"$dir/postings").as[SegmentRowRead]
      .collect().sortBy(r => (r.term, r.shard, r.blockId))
      .map(r => (r.term, r.df, r.shard, r.blockId, r.firstDocId, r.lastDocId, r.n,
        r.maxTf, r.minDl, r.gaps.toSeq, r.tfs.toSeq, r.dls.toSeq))
    assert(rows(interrupted).sameElements(rows(clean)))
  }

  test("changed params invalidate committed manifests") {
    val dir = TestSpark.tmpDir("graft-params")
    new IndexBuilder(spark, dir, params).build(pages, "synthetic(seed=7,n=300)")
    val other = params.copy(blockSize = 8)
    assert(!Manifest.isCommitted(dir, "postings", other.asMap))
    new IndexBuilder(spark, dir, other).build(pages, "synthetic(seed=7,n=300)")
    assert(Manifest.read(dir, "postings").get.attempt == 2)
  }
}
