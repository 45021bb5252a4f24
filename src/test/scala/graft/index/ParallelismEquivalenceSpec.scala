package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.corpus.SyntheticCorpus

/** North-rule posting-list equivalence: the index built at parallelism 1
  * must be bit-identical (same segment rows, same compressed bytes, same
  * block max scores) to the one built at parallelism 7 — the sandbox
  * stand-in for "N vs 4N executors produce the same index". */
class ParallelismEquivalenceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def buildAt(parts: Int): String = {
    val dir = TestSpark.tmpDir(s"graft-eq-$parts")
    val pages = SyntheticCorpus.generate(spark, 400, seed = 42L, partitions = parts)
    new IndexBuilder(spark, dir,
      IndexParams(buckets = 4, shardSize = 64, blockSize = 16, buildPartitions = parts))
      .build(pages, s"synthetic(seed=42,n=400,p=$parts)")
    dir
  }

  test("segment rows identical when built at parallelism 1 vs 7") {
    import spark.implicits._
    val d1 = buildAt(1)
    val d7 = buildAt(7)
    def rows(dir: String) = spark.read.parquet(s"$dir/postings").as[SegmentRowRead]
      .collect().sortBy(r => (r.term, r.shard, r.blockId))
      .map(r => (r.term, r.df, r.shard, r.blockId, r.firstDocId, r.lastDocId, r.n,
        r.maxTf, r.minDl, r.gaps.toSeq, r.tfs.toSeq, r.dls.toSeq, r.bucket))
    val a = rows(d1)
    val b = rows(d7)
    assert(a.length == b.length, s"${a.length} vs ${b.length} segment rows")
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    assert(Globals.read(d1) == Globals.read(d7))
  }
}
