package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.corpus.SyntheticCorpus
import graft.index.{IndexBuilder, IndexParams}

/** rescore (window re-ranking with a phrase query) and function_score
  * (field_value_factor): brute ≡ index rank/score identity, score modes,
  * modifier table, and window semantics. */
class RescoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val indexDir = TestSpark.tmpDir("graft-rescore-idx")
  private lazy val search: IndexSearch = {
    val pages = SyntheticCorpus.generate(spark, 350, seed = 37L, partitions = 4)
    new IndexBuilder(spark, indexDir,
      IndexParams(buckets = 4, shardSize = 64, blockSize = 8,
        buildPartitions = 4, positions = true))
      .build(pages, "synthetic(seed=37,n=350)")
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

  private def rows(df: DataFrame): Seq[(Long, Double)] =
    df.select(col("docId").cast("long"), col("score"))
      .as[(Long, Double)].collect().toSeq

  test("rescore: brute ≡ index across score modes and weights") {
    val terms = Seq("the", bigram.head)
    for ((mode, qw, rw) <- Seq(("total", 1.0, 2.0), ("multiply", 1.0, 1.0),
        ("max", 0.5, 1.5), ("avg", 1.0, 1.0))) {
      val b = rows(Search.rescoreTopK(docs, "docId", "text", terms, bigram,
        slop = 1, windowSize = 40, k = 15, qw, rw, mode))
      val i = rows(search.rescoreTopK(terms, bigram, slop = 1,
        windowSize = 40, k = 15, qw, rw, mode))
      assert(b.nonEmpty)
      assert(i == b, s"rescore($mode) diverged:\n brute=$b\n index=$i")
    }
  }

  test("rescore: phrase matches actually move the ranking") {
    val terms = Seq("the")
    val primary = rows(search.boolTopK(Nil, terms, Nil, 40))
    val rescored = rows(search.rescoreTopK(terms, bigram, slop = 0,
      windowSize = 40, k = 40, 1.0, 10.0, "total"))
    assert(rescored.map(_._1).toSet.subsetOf(primary.map(_._1).toSet))
    assert(rescored.map(_._1) != primary.map(_._1),
      "a 10x phrase weight should reorder the window")
  }

  test("rescore: window caps the page and k > window refuses") {
    assertThrows[IllegalArgumentException] {
      Search.rescoreTopK(docs, "docId", "text", Seq("the"), bigram, 0,
        windowSize = 5, k = 10)
    }
    val page = rows(search.rescoreTopK(Seq("the"), bigram, 0,
      windowSize = 10, k = 10))
    assert(page.size == 10)
  }

  test("field_value_factor: brute ≡ index across modifiers") {
    val meta = docs.select(col("docId"),
      (col("docId") % 50 + 1).cast("double").as("v"))
    val bruteDocs = docs.join(meta, "docId")
    for (mod <- Seq("none", "log1p", "ln1p", "sqrt", "square", "reciprocal")) {
      val b = rows(Search.fieldValueFactorTopK(bruteDocs, "docId", "text",
        Seq("the", "w00002"), "v", factor = 0.5, mod, k = 15))
      val i = rows(search.fieldValueFactorTopK(Seq("the", "w00002"), meta,
        "v", factor = 0.5, mod, k = 15))
      assert(b.nonEmpty)
      assert(i == b, s"fvf($mod) diverged:\n brute=$b\n index=$i")
    }
    assertThrows[IllegalArgumentException] {
      Search.fvfModifier(lit(1.0), "nope")
    }
  }

  test("field_value_factor: a missing field value scores as factor 0") {
    val meta = docs.select(col("docId"),
        (col("docId") % 50 + 1).cast("double").as("v"))
      .filter(col("docId") % 2 === 0)
    val i = search.fieldValueFactorTopK(Seq("the"), meta, "v", 1.0,
      "none", 1000)
    // odd docIds: score * (1.0 * 0) = 0
    val odd = i.filter(col("docId") % 2 === 1).select("score")
      .as[Double].collect()
    assert(odd.nonEmpty && odd.forall(_ == 0.0))
  }
}
