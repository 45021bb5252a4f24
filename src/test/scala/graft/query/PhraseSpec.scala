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

  private def bruteSlopTopK(phrase: Seq[String], slop: Int, k: Int)
      : Seq[(Long, Double)] = {
    val docIds = spark.read.parquet(s"$indexDir/docs").select($"docId", $"url")
    BruteForce.phraseSlopScoreAll(corpus, "url", "text", phrase, slop)
      .withColumnRenamed("docId", "url")
      .join(docIds, "url")
      .select($"docId", $"phrase_tf", $"score")
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
  }

  test("slop=0 ≡ exact phrase: brute AND index paths, corpus-wide") {
    val phrase = firstPhrase(2, 5)
    // brute: slop-0 scorer matches the exact scorer on every doc
    val exact = BruteForce.phraseScoreAll(corpus, "url", "text", phrase)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val slop0 = BruteForce.phraseSlopScoreAll(corpus, "url", "text", phrase, 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(slop0 == exact)
    // index: slop-0 kernel ≡ exact kernel
    val r = new IndexReader(spark, indexDir)
    val i0 = r.phraseTopK(phrase, 15, slop = 0)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(i0 == indexTopK(phrase, 15))
  }

  test("slop phrase: index ≡ brute force, rank and bit-identical scores") {
    val phrase = firstPhrase(2, 5)
    for (slop <- Seq(1, 2, 4)) {
      val b = bruteSlopTopK(phrase, slop, 15)
      val i = new IndexReader(spark, indexDir).phraseTopK(phrase, 15, slop)
        .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
      assert(b.nonEmpty, s"slop=$slop phrase $phrase matched nothing")
      assert(i == b, s"slop=$slop phrase=$phrase\nindex=$i\nbrute=$b")
    }
  }

  test("slop trigram: index ≡ brute across blocks and shards") {
    val phrase = firstPhrase(3, 2)
    val b = bruteSlopTopK(phrase, 2, 10)
    val i = new IndexReader(spark, indexDir).phraseTopK(phrase, 10, slop = 2)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(b.nonEmpty)
    assert(i == b)
  }

  test("slop semantics: hand-computed greedy minimal-stretch matches") {
    // tokens: a x b | a b | a x x b | b a  → phrase (a, b)
    val df = Seq(
      (1L, "a x b"),        // stretch 1 → slop>=1
      (2L, "a b"),          // stretch 0 → any slop
      (3L, "a x x b"),      // stretch 2 → slop>=2
      (4L, "b a"),          // wrong order → never (ordered semantics)
      (5L, "a x b a b"))    // starts: pos1 greedy→b@3 stretch 1; pos4→b@5 stretch 0
      .toDF("id", "text")
    def tfs(slop: Int): Map[Long, Long] =
      BruteForce.phraseSlopScoreAll(df, "id", "text", Seq("a", "b"), slop)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tfs(0) == Map(2L -> 1L, 5L -> 1L))
    assert(tfs(1) == Map(1L -> 1L, 2L -> 1L, 5L -> 2L))
    assert(tfs(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 2L))
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
