package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SearchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark engine spark engine spark", "a.com"),
    (2L, "spark engine once", "a.com"),
    (3L, "spark spark spark spark", "b.com"),
    (4L, "engine only here", "b.com"),
    (5L, "nothing relevant", "c.com")).toDF("doc_id", "text", "host")

  test("collapseTopK: best perKey rows per key, then global top-k") {
    val scored = Seq(
      (1L, "a.com", 9.0), (2L, "a.com", 8.0), (3L, "a.com", 7.0),
      (4L, "b.com", 8.5), (5L, "b.com", 3.0),
      (6L, "c.com", 1.0)).toDF("doc_id", "host", "score")
    val top = Search.collapseTopK(scored, "host", "score", "doc_id",
      k = 3, perKey = 1).select("doc_id").as[Long].collect()
    assert(top.toSeq == Seq(1L, 4L, 6L)) // one per host, score order
    val top2 = Search.collapseTopK(scored, "host", "score", "doc_id",
      k = 4, perKey = 2).select("doc_id").as[Long].collect()
    assert(top2.toSeq == Seq(1L, 4L, 2L, 5L))
  }

  test("collapseTopK ties break on ascending id") {
    val scored = Seq((7L, "x", 5.0), (2L, "x", 5.0), (9L, "y", 5.0))
      .toDF("doc_id", "host", "score")
    val top = Search.collapseTopK(scored, "host", "score", "doc_id",
      k = 2, perKey = 1).select("doc_id").as[Long].collect()
    assert(top.toSeq == Seq(2L, 9L))
  }

  test("fuzzyExpand finds terms within edit distance, none beyond") {
    val dict = Seq("spark", "spork", "sparks", "shark", "park",
      "engine", "spa").toDF("term")
    val got = Search.fuzzyExpand(dict, "term", "spark", maxDist = 1)
      .orderBy("term").select("term", "dist")
      .as[(String, Int)].collect().toSeq
    assert(got == Seq(("park", 1), ("shark", 1), ("spark", 0),
      ("sparks", 1), ("spork", 1)))
  }

  test("fuzzyTopK scores the union of expansions; misspelled query still hits") {
    val top = Search.fuzzyTopK(docs, "doc_id", "text",
      Seq("sprak"), k = 3, maxDist = 2) // within 2 of "spark"
    val ids = top.select("doc_id").as[Long].collect()
    assert(ids.contains(3L) && ids.contains(1L))
  }

  test("fuzzyTopK with no expansion keeps the (idCol, score) schema") {
    val top = Search.fuzzyTopK(docs, "doc_id", "text",
      Seq("zzzzzzzzzz"), k = 3, maxDist = 1)
    assert(top.columns.toSeq == Seq("doc_id", "score"))
    assert(top.count() == 0)
    // the documented contract: downstream select/union must not throw
    assert(top.select("doc_id").count() == 0)
  }

  test("collapseTopK leaves a caller column named _rnk untouched") {
    val scored = Seq((1L, "x", 9.0, "keep1"), (2L, "x", 8.0, "keep2"))
      .toDF("doc_id", "host", "score", "_rnk")
    val top = Search.collapseTopK(scored, "host", "score", "doc_id",
      k = 2, perKey = 2)
    assert(top.columns.toSeq == Seq("doc_id", "host", "score", "_rnk"))
    assert(top.select("_rnk").as[String].collect().sorted.toSeq ==
      Seq("keep1", "keep2"))
  }

  test("suggest ranks by distance, then corpus frequency, then term") {
    val dict = Seq(("spark", 100L), ("spars", 3L), ("sparks", 40L),
      ("shark", 7L), ("spork", 7L), ("unrelated", 9L))
      .toDF("term", "freq")
    val got = Search.suggest(dict, "term", "freq", "spark", maxDist = 1, n = 4)
      .select("term").as[String].collect().toSeq
    // dist 0 first; then dist-1 by freq desc; freq tie (shark/spork 7)
    // breaks on term
    assert(got == Seq("spark", "sparks", "shark", "spork"))
  }

  test("facets count the full match set per bucket") {
    val f = Search.facets(docs, "doc_id", "text", Seq("spark"), "host")
      .as[(String, Long)].collect().toMap
    // spark appears in docs 1,2 (a.com) and 3 (b.com)
    assert(f == Map("a.com" -> 2L, "b.com" -> 1L))
  }

  test("searchAfter pages without overlap and in order") {
    val scored = Seq((1L, 9.0), (2L, 8.0), (3L, 8.0), (4L, 7.0), (5L, 6.0))
      .toDF("doc_id", "score")
    val page2 = Search.searchAfter(scored, "doc_id", "score",
      afterScore = 8.0, afterId = 2L, k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(page2 == Seq(3L, 4L)) // tie with cursor → id > afterId first
    val page3 = Search.searchAfter(scored, "doc_id", "score",
      afterScore = 7.0, afterId = 4L, k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(page3 == Seq(5L))
  }

  test("boolTopK: must required, mustNot excludes, should only scores") {
    val top = Search.boolTopK(docs, "doc_id", "text",
      must = Seq("spark"), should = Seq("engine"), mustNot = Seq("once"),
      k = 10).select("doc_id").as[Long].collect().toSeq
    // docs with spark: 1,2,3; doc 2 has "once" → excluded; doc 4 has
    // engine but no spark → excluded
    assert(top.toSet == Set(1L, 3L))
    // doc 1 (spark + engine) must outscore doc 3 (spark-only, but more
    // spark): both orders are legitimate BM25 outcomes — just pin the
    // exclusions and the determinism
    val again = Search.boolTopK(docs, "doc_id", "text",
      must = Seq("spark"), should = Seq("engine"), mustNot = Seq("once"),
      k = 10).select("doc_id").as[Long].collect().toSeq
    assert(top == again)
  }

  test("boolTopK: multi-must requires ALL terms; empty must scores should") {
    val both = Search.boolTopK(docs, "doc_id", "text",
      must = Seq("spark", "engine"), should = Nil, mustNot = Nil, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(both == Set(1L, 2L))
    val shouldOnly = Search.boolTopK(docs, "doc_id", "text",
      must = Nil, should = Seq("engine"), mustNot = Nil, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(shouldOnly == Set(1L, 2L, 4L))
  }

  test("moreLikeThisTerms ranks by tf desc, df asc, term asc") {
    val terms = Search.moreLikeThisTerms(docs, "doc_id", "text", 1L, m = 2)
      .select("term").as[String].collect().toSeq
    // doc 1: spark tf=3, engine tf=2
    assert(terms == Seq("spark", "engine"))
  }

  test("moreLikeThisTopK excludes the source doc and ranks similars first") {
    val top = Search.moreLikeThisTopK(docs, "doc_id", "text", 1L, m = 2, k = 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(!top.contains(1L))
    assert(top.head == 3L || top.head == 2L)
    assert(!top.contains(5L))
  }
}
