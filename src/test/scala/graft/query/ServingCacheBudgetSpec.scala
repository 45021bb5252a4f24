package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.corpus.SyntheticCorpus
import graft.index.{IndexBuilder, IndexParams}

/** Scale bound on the driver-resident serving cache (VERDICT r3 item 1):
  * a hot term whose merged posting list exceeds `maxBytesPerTerm` must
  * (a) never have its blocks collected to the driver, and (b) still
  * answer rank- and score-identically via the transparent fallback to the
  * distributed top-k. At 10^12 docs a stopword's posting list is
  * terabytes; this is the invariant that keeps the serving driver alive.
  */
class ServingCacheBudgetSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val indexDir = TestSpark.tmpDir("graft-cache-budget")

  private lazy val reader: IndexReader = {
    val pages = SyntheticCorpus.generate(spark, 600, seed = 7L, partitions = 4)
    new IndexBuilder(spark, indexDir,
      IndexParams(buckets = 8, shardSize = 128, blockSize = 32, buildPartitions = 4))
      .build(pages, "synthetic(seed=7,n=600)")
    new IndexReader(spark, indexDir)
  }

  private def bytesOf(cache: ServingCache, t: String): Long =
    cache.resident(t)._2
      .map(b => b.gaps.length.toLong + b.tfs.length + b.dls.length).sum

  /** The synthetic hot term: whichever query term carries the most posting
    * bytes (stopwords and common terms compete; pick the measured max). */
  private def pickHot(cache: ServingCache, terms: Seq[String]): String =
    terms.filter(cache.resident.contains).maxBy(bytesOf(cache, _))

  test("hot term over the byte budget is never materialized on the driver") {
    val queries = SyntheticCorpus.querySet().take(8)
    val terms = (queries.flatten ++ SyntheticCorpus.Stopwords.take(3)).distinct
    // size the cap between the hot term's bytes and everything else's
    val uncapped = reader.loadCache(terms, maxBytesPerTerm = Long.MaxValue)
    assert(uncapped.overBudget.isEmpty)
    def bytesOf(t: String): Long = this.bytesOf(uncapped, t)
    val hotTerm = pickHot(uncapped, terms)
    val hotBytes = bytesOf(hotTerm)
    val restMax = terms.filter(t => t != hotTerm && uncapped.resident.contains(t))
      .map(bytesOf).max
    assert(hotBytes > restMax, s"fixture broken: hot=$hotBytes restMax=$restMax")
    val cap = (hotBytes + restMax) / 2

    val capped = reader.loadCache(terms, maxBytesPerTerm = cap)
    // (a) the hot term's blocks stayed on the executors
    assert(capped.overBudget.contains(hotTerm))
    assert(!capped.resident.contains(hotTerm))
    // every resident term individually respects the cap
    capped.resident.keys.foreach { t =>
      assert(bytesOf(t) <= cap, s"resident term $t over cap")
    }
    assert(capped.residentBytes ==
      uncapped.residentBytes - hotBytes)
  }

  test("capped cache answers rank- and score-identical to the uncapped path") {
    val base = SyntheticCorpus.querySet().take(6)
    val probeTerms = base.flatten.distinct
    val probe = reader.loadCache(probeTerms, maxBytesPerTerm = Long.MaxValue)
    val hotTerm = pickHot(probe, probeTerms)
    // force hot-term queries: fallback path must engage and agree exactly
    val queries = base ++ base.take(3).map(q => (hotTerm +: q).distinct)
    val terms = queries.flatten.distinct
    val uncapped = reader.loadCache(terms, maxBytesPerTerm = Long.MaxValue)
    def bytesOf(t: String): Long = this.bytesOf(uncapped, t)
    val cap = (bytesOf(hotTerm) +
      terms.filter(_ != hotTerm).map(bytesOf).max) / 2
    val capped = reader.loadCache(terms, maxBytesPerTerm = cap)
    assert(capped.overBudget.nonEmpty)
    for (q <- queries) {
      val full = reader.topKLocal(uncapped, q, 10)
      val bounded = reader.topKLocal(capped, q, 10)
      assert(bounded.map(_.docId).sameElements(full.map(_.docId)),
        s"rank differs under cap for q=$q")
      assert(bounded.map(_.score).sameElements(full.map(_.score)),
        s"score differs under cap for q=$q")
    }
  }
}
