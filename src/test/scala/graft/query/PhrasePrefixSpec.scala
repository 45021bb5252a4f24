package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.corpus.SyntheticCorpus
import graft.index.{IndexBuilder, IndexParams}

/** match_phrase_prefix: brute ≡ index rank/score identity, reduction to the
  * exact phrase when the expansion is a single full term, hand-computed
  * union-slot semantics, and the expansion cap. */
class PhrasePrefixSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val indexDir = TestSpark.tmpDir("graft-phpre-idx")
  private lazy val search: IndexSearch = {
    val pages = SyntheticCorpus.generate(spark, 350, seed = 31L, partitions = 4)
    new IndexBuilder(spark, indexDir,
      IndexParams(buckets = 4, shardSize = 64, blockSize = 8,
        buildPartitions = 4, positions = true))
      .build(pages, "synthetic(seed=31,n=350)")
    new IndexSearch(spark, indexDir)
  }
  private lazy val docs: DataFrame = {
    search
    spark.read.parquet(s"$indexDir/docs").select("docId", "text")
  }

  private lazy val bigram: Seq[String] = {
    val toks = docs.select(graft.analyze.Analyzer.tokensCol($"text").as("l"))
    toks.select(explode(expr(
        "transform(sequence(1, greatest(size(l) - 1, 0)), " +
          "i -> concat_ws(' ', slice(l, i, 2)))")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("g")).head().getString(0).split(' ').toSeq
  }

  private def bruteRows(phrase: Seq[String], slop: Int, k: Int,
      maxExp: Int = 50): Seq[(Long, Double)] =
    BruteForce.phrasePrefixTopK(docs, "docId", "text", phrase, slop, k, maxExp)
      .select(col("docId"), col("score"))
      .as[(Long, Double)].collect().toSeq

  private def servedRows(phrase: Seq[String], slop: Int, k: Int,
      maxExp: Int = 50): Seq[(Long, Double)] =
    search.phrasePrefixTopK(phrase, k, slop, maxExp)
      .as[(Long, Double)].collect().toSeq

  test("prefix phrase: index ≡ brute across slop levels") {
    val phrase = Seq(bigram.head, bigram(1).take(2))
    for (slop <- Seq(0, 1, 3)) {
      val b = bruteRows(phrase, slop, 15)
      val i = servedRows(phrase, slop, 15)
      assert(b.nonEmpty, s"prefix phrase $phrase matched nothing at slop=$slop")
      assert(i == b, s"slop=$slop phrase=$phrase\n index=$i\n brute=$b")
    }
  }

  test("single-term expansion reduces to the exact phrase") {
    // the full last term as 'prefix': if it expands to exactly itself,
    // df_union = df(term) and the scores ARE the exact phrase's
    val expansion = search.termStats
      .filter(col("term").startsWith(bigram(1)))
      .select("term").as[String].collect()
    assume(expansion.toSeq == Seq(bigram(1)),
      s"corpus has longer terms extending ${bigram(1)}")
    val pre = servedRows(bigram, 0, 12)
    val exact = new IndexReader(spark, indexDir).phraseTopK(bigram, 12)
      .as[(Long, Double)].collect().toSeq
    assert(pre == exact)
  }

  test("hand-computed union-slot semantics") {
    val df = Seq(
      (1L, "a xb"),       // consecutive via xb
      (2L, "a xc z"),     // consecutive via xc
      (3L, "a z xb"),     // stretch 1 -> slop >= 1
      (4L, "xb a"),       // wrong order: never
      (5L, "a a xb"))     // starts at 1 (stretch 1) and 2 (stretch 0)
      .toDF("id", "text")
    def tfs(slop: Int): Map[Long, Long] =
      BruteForce.phrasePrefixScoreAll(df, "id", "text", Seq("a", "x"), slop)
        .select("docId", "phrase_tf")
        .as[(Long, Long)].collect().toMap
    assert(tfs(0) == Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
    assert(tfs(1) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 2L))
  }

  test("expansion cap binds identically on both engines") {
    val phrase = Seq("the", "w0000")
    for (cap <- Seq(2, 5)) {
      val b = bruteRows(phrase, 1, 10, maxExp = cap)
      val i = servedRows(phrase, 1, 10, maxExp = cap)
      assert(i == b, s"cap=$cap diverged")
    }
  }

  test("empty expansion matches nothing, schema intact") {
    val b = BruteForce.phrasePrefixTopK(docs, "docId", "text",
      Seq("the", "zzzz"), 0, 10)
    val i = search.phrasePrefixTopK(Seq("the", "zzzz"), 10)
    assert(b.columns.toSeq == Seq("docId", "phrase_tf", "score"))
    assert(i.columns.toSeq == Seq("docId", "score"))
    assert(b.count() == 0 && i.count() == 0)
  }
}
