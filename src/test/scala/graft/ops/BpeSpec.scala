package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("train reproduces the hand-computed merge sequence") {
    // corpus: low low low low low  lower lower  newest newest newest
    //         newest newest newest  widest widest widest
    // (the Sennrich et al. worked example, word-internal pairs only)
    val corpus = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val merges = Bpe.train(corpus, "text", numMerges = 4)
    // hand-derived pair counts:
    // round 1: es=9 st=9 (newest 6 + widest 3), we=8, lo=7, ow=7,
    //   ne=6, ew=6, wi=3, id=3, de=3, er=2 → tie es/st breaks
    //   lexicographic → (e,s)
    // round 2: (es,t)=9 is now the max → (es,t)
    // round 3: lo=7, ow=7 beat w·est=6 → lexicographic → (l,o)
    // round 4: (lo,w)=7 (low 5 + lower 2) → (lo,w)
    assert(merges(0) == ("e", "s"))
    assert(merges(1) == ("es", "t"))
    assert(merges(2) == ("l", "o"))
    assert(merges(3) == ("lo", "w"))
  }

  test("encodeCol ≡ encodeUdf on the full corpus vocabulary (trained merges)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.train(docs.limit(200), "text", numMerges = 24)
    assert(merges.size == 24)
    val vocab = docs.limit(200)
      .select(explode(graft.analyze.Analyzer.tokensCol(col("text"))).as("w"))
      .distinct()
    val both = vocab.select(col("w"),
      Bpe.encodeCol(col("w"), merges).as("viaReplace"),
      Bpe.encodeUdf(merges)(col("w")).as("viaKernel"))
    val diff = both.filter(not(col("viaReplace") === col("viaKernel"))).count()
    assert(diff == 0L)
    // merges actually compress: some word must encode to < its length
    val compressed = both
      .filter(size(col("viaKernel")) < length(col("w"))).count()
    assert(compressed > 0L)
  }

  test("encode round-trips: concatenated subwords rebuild the word") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.train(docs.limit(100), "text", numMerges = 12)
    val vocab = docs.limit(100)
      .select(explode(graft.analyze.Analyzer.tokensCol(col("text"))).as("w"))
      .distinct()
    val bad = vocab
      .select(col("w"), array_join(Bpe.encodeCol(col("w"), merges), "").as("rt"))
      .filter(col("w") =!= col("rt")).count()
    assert(bad == 0L)
  }

  test("tokenCount sums subword counts over the document") {
    val merges = Seq(("t", "h"), ("th", "e"))
    val n = Seq("the the cat").toDF("text")
      .select(Bpe.tokenCount(col("text"), merges)).as[Int].collect()(0)
    // "the" → [the] = 1 token ×2, "cat" → c a t = 3
    assert(n == 5)
  }
}
