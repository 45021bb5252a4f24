package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.analyze.Analyzer

class AnalyzerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("JVM tf kernel == Column tokenizer on non-ASCII input") {
    // r1's kernel lowercased only ASCII; these exercise the divergence
    // cases: Kelvin sign → 'k', dotted İ → "i̇", ß, final sigma, NBSP.
    val texts = Seq(
      "Hello WORLD hello",
      "Kelvin K sign 100K",
      "İstanbul ISTANBUL istanbul",
      "straße STRASSE",
      "ΣIGMA σigma ς",
      "café RÉSUMÉ",
      "nbsp separated words",
      "mixed 42abc DEF-ghi")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val fromCol = Analyzer.termFreqs(df, "id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val fromKernel = texts.zipWithIndex.flatMap { case (t, i) =>
      val (counts, dl) = Analyzer.termFreqsLocal(t)
      val pairs = scala.jdk.CollectionConverters.MapHasAsScala(counts).asScala
      assert(dl == pairs.values.sum, s"dl mismatch for: $t")
      pairs.map { case (term, tf) => (i.toLong, term) -> tf }
    }.toMap
    assert(fromCol == fromKernel)
  }

  test("analyzeQuery matches the same lowercase spec") {
    assert(Analyzer.analyzeQuery("Kelvin K 42") == Seq("kelvin", "k", "42"))
    assert(Analyzer.analyzeQuery("The THE the") == Seq("the"))
  }
}
