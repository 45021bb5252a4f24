package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.{IndexBuilder, IndexParams}

/** Phrase executor vs brute-force differential: rank AND score identity
  * over a positional index with deliberately tiny blocks/shards so phrases
  * cross block and shard boundaries. */
class PhraseSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // tiny blocks + shards force multi-block posting lists and cross-shard
  // fan-out; positions = true is the feature under test
  private val params = IndexParams(buckets = 4, shardSize = 64,
    blockSize = 4, positions = true)

  private lazy val indexDir: String = {
    val dir = graft.TestSpark.tmpDir("phrase-idx")
    val pages = graft.corpus.SyntheticCorpus.generate(spark, 300, seed = 11L)
    new IndexBuilder(spark, s"$dir/idx", params).build(pages, "spec corpus")
    s"$dir/idx"
  }

  private lazy val corpus =
    graft.corpus.SyntheticCorpus.generate(spark, 300, seed = 11L)
      .toDF().select($"url", $"text")

  /** Brute result keyed the same way the index result comes back: the
    * index speaks docId, brute speaks url — join docs mapping. */
  private def bruteTopK(phrase: Seq[String], k: Int): Seq[(Long, Double)] = {
    val docIds = spark.read.parquet(s"$indexDir/docs").select($"docId", $"url")
    BruteForce.phraseScoreAll(corpus, "url", "text", phrase)
      .withColumnRenamed("docId", "url")
      .join(docIds, "url")
      .select($"docId", $"phrase_tf", $"score")
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
  }

  private def indexTopK(phrase: Seq[String], k: Int): Seq[(Long, Double)] = {
    new IndexReader(spark, indexDir).phraseTopK(phrase, k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  private def firstPhrase(len: Int, minDf: Int): Seq[String] = {
    // pick a phrase that actually occurs in >= minDf docs, from the corpus
    val toks = corpus.select(graft.analyze.Analyzer.tokensCol($"text").as("l"))
    val counts = toks
      .select(explode(expr(
        s"transform(sequence(1, greatest(size(l) - ${len - 1}, 0)), " +
          s"i -> concat_ws(' ', slice(l, i, $len)))")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("g")).head()
    assert(counts.getLong(1) >= minDf, s"corpus lacks a common $len-gram")
    counts.getString(0).split(' ').toSeq
  }

  test("bigram phrase: index ≡ brute force, rank and bit-identical scores") {
    val phrase = firstPhrase(2, 5)
    val b = bruteTopK(phrase, 15)
    val i = indexTopK(phrase, 15)
    assert(b.nonEmpty, s"phrase $phrase matched nothing")
    assert(i == b, s"phrase=$phrase\nindex=$i\nbrute=$b")
  }

  test("trigram phrase crossing blocks: index ≡ brute force") {
    val phrase = firstPhrase(3, 2)
    val b = bruteTopK(phrase, 10)
    val i = indexTopK(phrase, 10)
    assert(b.nonEmpty)
    assert(i == b, s"phrase=$phrase\nindex=$i\nbrute=$b")
  }

  test("single-term phrase degenerates to single-term BM25") {
    val phrase = Seq(firstPhrase(1, 10).head)
    val b = bruteTopK(phrase, 10)
    val i = indexTopK(phrase, 10)
    assert(i == b)
    // and equals the WAND executor's single-term result
    val wand = new IndexReader(spark, indexDir).topK(phrase, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(i == wand, "phrase(t) must equal BM25 top-k for a single term")
  }

  test("duplicate-term phrase ('a a') matches only consecutive duplicates") {
    val df = Seq(
      (1L, "a b a b a"), (2L, "b b b"), (3L, "a a b b a a"), (4L, "c a c"))
      .toDF("id", "text")
    val got = BruteForce.phraseScoreAll(df, "id", "text", Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // tokens of doc 3: a a b b a a → starts at 0 and 4; nowhere else
    assert(got == Map(3L -> 2L), s"got $got")
  }

  test("phrase with an absent term returns empty") {
    assert(indexTopK(Seq("zzznotaterm", "the"), 5).isEmpty)
    assert(bruteTopK(Seq("zzznotaterm", "the"), 5).isEmpty)
  }

  test("a positions-less index refuses phrase queries loudly") {
    val dir = graft.TestSpark.tmpDir("phrase-nopos")
    val pages = graft.corpus.SyntheticCorpus.generate(spark, 40, seed = 3L)
    new IndexBuilder(spark, s"$dir/idx",
      IndexParams(buckets = 2, shardSize = 64, blockSize = 8)).build(pages, "np")
    val e = intercept[IllegalArgumentException] {
      new IndexReader(spark, s"$dir/idx").phraseTopK(Seq("the"), 5)
    }
    assert(e.getMessage.contains("positions"))
  }
}
