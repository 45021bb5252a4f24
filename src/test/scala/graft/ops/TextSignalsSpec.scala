package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextSignalsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repetition signals: hand-computed n-gram and line fractions") {
    // tokens: a b a b a b x y x y z (newlines split tokens too)
    val df = Seq((1L, "a b a b a b\nx y\nx y\nz")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df, "doc_id", "text").collect()(0)
    def f(c: String) = r.getAs[Double](c)
    // joined token stream "a b a b a b x y x y z" = 21 chars
    assert(f("top_2gram_char_frac") == math.rint(3 * 3 / 21.0 * 1e6) / 1e6) // "a b" x3
    assert(f("top_3gram_char_frac") == math.rint(2 * 5 / 21.0 * 1e6) / 1e6) // "a b a" x2
    assert(f("top_4gram_char_frac") == math.rint(2 * 7 / 21.0 * 1e6) / 1e6) // "a b a b" x2
    assert(f("dup_5gram_char_frac") == 0.0)
    assert(f("dup_10gram_char_frac") == 0.0)
    assert(f("dup_line_frac") == 0.5) // "x y" twice out of 4 lines
    assert(f("dup_line_char_frac") == math.rint(6 / 18.0 * 1e6) / 1e6)
    assert(f("symbol_word_ratio") == 0.0)
  }

  test("repetition signals: boilerplate line shapes and symbols") {
    val df = Seq((1L, "- item one\n* item two\nmore text...\n# tag ## other"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df, "doc_id", "text").collect()(0)
    def f(c: String) = r.getAs[Double](c)
    assert(f("bullet_line_frac") == 0.5)
    assert(f("ellipsis_line_frac") == 0.25)
    assert(f("dup_line_frac") == 0.0)
    // (3 '#' + 1 "...") / 8 words
    assert(f("symbol_word_ratio") == 0.5)
  }

  test("repetition signals: degenerate inputs don't divide by zero") {
    val df = Seq((1L, ""), (2L, "word"), (3L, "x x x x x x x x"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionSignals(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Double]("top_2gram_char_frac") == 0.0)
    assert(rows(1).getAs[Double]("top_2gram_char_frac") == 0.0) // one token, no bigram
    // "x x" appears 7 times, chars 7*3=21, total 15 -> capped at 1.0
    assert(rows(2).getAs[Double]("top_2gram_char_frac") == 1.0)
    assert(rows(2).getAs[Double]("dup_5gram_char_frac") == 1.0)
  }

  test("native vec math matches the HOF formulation bit-for-bit") {
    val rng = new scala.util.Random(7)
    val vecs = Seq.tabulate(50)(i =>
      (i.toLong, Array.fill(64)(rng.nextFloat()), Array.fill(64)(rng.nextFloat())))
    val df = vecs.toDF("id", "a", "b")
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (s, v) => s + v))
      .as[Double].collect()
    val native = df.select(Similarity.dot(col("a"), col("b"))).as[Double].collect()
    assert(hof.zip(native).forall { case (h, n) => h == n }, "dot mismatch")

    val cos = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    vecs.zip(cos).foreach { case ((_, a, b), c) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (0 until 64).foreach { i =>
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      assert(c == dot / (math.sqrt(na) * math.sqrt(nb)))
    }
  }

  test("native cosine: orthogonal, identical, and zero vectors") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (3L, Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("id", "a", "b")
    val got = df.orderBy("id")
      .select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 0.0 && math.abs(got(1) - 1.0) < 1e-12 && got(2) == 0.0)
  }

  test("token diversity: hand-computed entropy, TTR, zero-token docs drop") {
    val df = Seq(
      (1L, "a a b"),          // p = (2/3, 1/3)
      (2L, "x x x x"),        // single type → entropy 0
      (3L, "!!! ...")).toDF("doc_id", "text") // zero tokens → dropped
    val out = TextAnalysis.tokenDiversity(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    val r1 = out(0)
    assert(r1.getAs[Long]("n_tokens") == 3L && r1.getAs[Long]("n_types") == 2L)
    assert(r1.getAs[Double]("type_token_ratio") == 0.666667)
    val want = -(2.0 / 3) * math.log(2.0 / 3) - (1.0 / 3) * math.log(1.0 / 3)
    assert(math.abs(r1.getAs[Double]("unigram_entropy") - want) < 1e-6)
    assert(out(1).getAs[Double]("unigram_entropy") == 0.0)
    assert(out(1).getAs[Double]("type_token_ratio") == 0.25)
  }

  test("token diversity is partition-invariant (sorted fold, not map-order)") {
    val docs = (1L to 50L).map(i =>
      (i, (1L to 40L).map(j => s"w${(i * j) % 13}").mkString(" ")))
    val a = TextAnalysis.tokenDiversity(
      docs.toDF("doc_id", "text").repartition(1), "doc_id", "text")
    val b = TextAnalysis.tokenDiversity(
      docs.toDF("doc_id", "text").repartition(17), "doc_id", "text")
    val key = (d: org.apache.spark.sql.DataFrame) => d.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4))).toSeq
    assert(key(a) == key(b))
  }
}
