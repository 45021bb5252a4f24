package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnippetsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snip(text: String, terms: Seq[String], w: Int): String = {
    val r = Seq(text).toDF("t")
      .select(Snippets.snippet(col("t"), terms, w)).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("picks the window with the most distinct query terms") {
    // windows of 3 at match positions: quick→{quick,fox}=2,
    // fox→{fox,dog}=2, dog→{dog}=1; tie → earliest (quick)
    val t = "the quick brown fox and dog ran far away"
    assert(snip(t, Seq("quick", "fox", "dog"), 3) ==
      "<em>quick</em> brown <em>fox</em>")
    // narrower terms: the fox window is the unique 2-distinct one
    assert(snip(t, Seq("fox", "dog"), 3) == "<em>fox</em> and <em>dog</em>")
  }

  test("earliest window wins ties; repeated term counts once") {
    val t = "alpha beta alpha gamma alpha"
    // every window of 2 starting at an alpha has 1 distinct match →
    // earliest (position 0)
    assert(snip(t, Seq("alpha"), 2) == "<em>alpha</em> beta")
  }

  test("highlights every query-term occurrence inside the window") {
    val t = "x spark spark engine y"
    assert(snip(t, Seq("spark", "engine"), 4) ==
      "<em>spark</em> <em>spark</em> <em>engine</em> y")
  }

  test("no match → null; window clipped at document end") {
    assert(snip("nothing here", Seq("absent"), 3) == null)
    assert(snip("tail word match", Seq("match"), 5) == "<em>match</em>")
  }

  test("phraseSnippet: first occurrence, centered window, position-based markup") {
    def ps(text: String, phrase: Seq[String], w: Int): String = {
      val r = Seq(text).toDF("t")
        .select(Snippets.phraseSnippet(col("t"), phrase, w)).collect()(0)
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // centered: match at pos 3, w=4, m=2 → lead=1 → window 2..5
    assert(ps("a b c quick fox d e", Seq("quick", "fox"), 4) ==
      "c <em>quick</em> <em>fox</em> d")
    // clipped at document start
    assert(ps("quick fox tail x", Seq("quick", "fox"), 4) ==
      "<em>quick</em> <em>fox</em> tail x")
    // FIRST occurrence wins; the later one stays unhighlighted even
    // inside another window
    assert(ps("quick fox then quick fox", Seq("quick", "fox"), 5) ==
      "<em>quick</em> <em>fox</em> then quick fox")
    // adjacency required; no match → null
    assert(ps("quick brown fox", Seq("quick", "fox"), 4) == null)
    assert(ps("", Seq("quick", "fox"), 4) == null)
    // repeated token inside the window is not highlighted by equality
    assert(ps("fox quick fox z", Seq("quick", "fox"), 4) ==
      "fox <em>quick</em> <em>fox</em> z")
  }

  test("empty and null text → null snippet, zero count") {
    assert(snip("", Seq("x"), 3) == null)
    assert(snip("...!!!", Seq("x"), 3) == null) // tokens empty after split
    val r = Seq[Option[String]](None).toDF("t")
      .select(Snippets.snippet(col("t"), Seq("x"), 3),
        Snippets.snippetTermCount(col("t"), Seq("x"), 3)).collect()(0)
    assert(r.isNullAt(0) && r.getInt(1) == 0)
  }

  test("query terms are analyzer-normalized (case)") {
    assert(snip("big spark here", Seq("SPARK"), 1) == "<em>spark</em>")
  }
}
