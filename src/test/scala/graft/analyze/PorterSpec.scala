package graft.analyze

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Porter stemmer vs the 1980 paper's own worked examples, step by step,
  * plus full-pipeline classics and the analysis-chain transforms. */
class PorterSpec extends AnyFunSuite {

  test("step 1a (plurals): the paper's five examples") {
    assert(Porter.step1a("caresses") == "caress")
    assert(Porter.step1a("ponies") == "poni")
    assert(Porter.step1a("ties") == "ti")
    assert(Porter.step1a("caress") == "caress")
    assert(Porter.step1a("cats") == "cat")
  }

  test("step 1b (ed/ing): strip, then the at/bl/iz, double-consonant and cvc repairs") {
    assert(Porter.step1b("feed") == "feed")
    assert(Porter.step1b("agreed") == "agree")
    assert(Porter.step1b("plastered") == "plaster")
    assert(Porter.step1b("bled") == "bled")
    assert(Porter.step1b("motoring") == "motor")
    assert(Porter.step1b("sing") == "sing")
    assert(Porter.step1b("conflated") == "conflate")
    assert(Porter.step1b("troubled") == "trouble")
    assert(Porter.step1b("sized") == "size")
    assert(Porter.step1b("hopping") == "hop")
    assert(Porter.step1b("tanned") == "tan")
    assert(Porter.step1b("falling") == "fall")
    assert(Porter.step1b("hissing") == "hiss")
    assert(Porter.step1b("fizzed") == "fizz")
    assert(Porter.step1b("failing") == "fail")
    assert(Porter.step1b("filing") == "file")
  }

  test("step 1c (y→i with a vowel in the stem)") {
    assert(Porter.step1c("happy") == "happi")
    assert(Porter.step1c("sky") == "sky")
  }

  test("step 2 (m>0 long-suffix map): every paper example") {
    val cases = Seq(
      "relational" -> "relate", "conditional" -> "condition",
      "rational" -> "rational", "valenci" -> "valence",
      "hesitanci" -> "hesitance", "digitizer" -> "digitize",
      "conformabli" -> "conformable", "radicalli" -> "radical",
      "differentli" -> "different", "vileli" -> "vile",
      "analogousli" -> "analogous", "vietnamization" -> "vietnamize",
      "predication" -> "predicate", "operator" -> "operate",
      "feudalism" -> "feudal", "decisiveness" -> "decisive",
      "hopefulness" -> "hopeful", "callousness" -> "callous",
      "formaliti" -> "formal", "sensitiviti" -> "sensitive",
      "sensibiliti" -> "sensible")
    cases.foreach { case (in, out) =>
      assert(Porter.step2(in) == out, s"step2($in)")
    }
  }

  test("step 3: every paper example") {
    val cases = Seq(
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electric",
      "electrical" -> "electric", "hopeful" -> "hope",
      "goodness" -> "good")
    cases.foreach { case (in, out) =>
      assert(Porter.step3(in) == out, s"step3($in)")
    }
  }

  test("step 4 (m>1 suffix drop, ION after s/t, longest match): paper examples") {
    val cases = Seq(
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "homologou" -> "homolog",
      "communism" -> "commun", "activate" -> "activ",
      "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler")
    cases.foreach { case (in, out) =>
      assert(Porter.step4(in) == out, s"step4($in)")
    }
  }

  test("step 5 (e-drop and ll→l): paper examples") {
    assert(Porter.step5("probate") == "probat")
    assert(Porter.step5("rate") == "rate")
    assert(Porter.step5("cease") == "ceas")
    assert(Porter.step5("controll") == "control")
    assert(Porter.step5("roll") == "roll")
  }

  test("full pipeline: the paper's flagship reductions and invariants") {
    assert(Porter.stem("generalizations") == "gener") // the paper's intro example
    assert(Porter.stem("oscillators") == "oscil")     // ditto
    assert(Porter.stem("relational") == "relat")
    assert(Porter.stem("conditional") == "condit")
    // guards: short words, digits, already-stemmed forms pass through
    assert(Porter.stem("as") == "as" && Porter.stem("is") == "is")
    assert(Porter.stem("x86") == "x86")
    // idempotence on a mixed vocabulary slice (stem ∘ stem = stem is the
    // property an index rebuild over already-stemmed text depends on)
    val vocab = Seq("generalizations", "running", "flies", "happiness",
      "engineering", "query", "queries", "distributed", "connection",
      "connections", "relativity", "probate", "controlled")
    vocab.foreach { w =>
      val once = Porter.stem(w)
      assert(Porter.stem(once) == once, s"not idempotent on $w → $once")
    }
  }

  test("analysis transforms: stop filter + stemming as corpus rewrites; query chain agrees") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, "The engines are running the queries"),
      (2L, "a generalization of the oscillators")).toDF("id", "text")
    val stopped = Analysis.stopFilter(df, "text")
      .orderBy("id").select("text").as[String].collect()
    assert(stopped(0) == "engines running queries")
    assert(stopped(1) == "generalization oscillators")
    val stemmed = Analysis.porterStem(Analysis.stopFilter(df, "text"), "text")
      .orderBy("id").select("text").as[String].collect()
    assert(stemmed(0) == "engin run queri")
    assert(stemmed(1) == "gener oscil")
    // the same chain applied to query terms hits the transformed corpus
    assert(Analysis.analyzeQueryTerms(Seq("The", "Queries"),
      Analysis.EnglishStopWords, stem = true) == Seq("queri"))
    // re-tokenizing a transformed text is the identity on its tokens
    val tok = Analyzer.tokenizeLocal(stemmed(0))
    assert(tok.toArray.toSeq == Seq("engin", "run", "queri"))
  }

  test("analyzed index e2e: stop+stem corpus indexes and serves ≡ brute") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pages = graft.corpus.SyntheticCorpus.generate(spark, 300, seed = 23L,
      partitions = 4).toDF()
    val analyzed = Analysis.porterStem(
      Analysis.stopFilter(pages, "text"), "text")
      // an analyzer change is a REINDEX: the stored page is the analyzed
      // text, so the build's html↔text byte-identity gate still holds
      .withColumn("html", encode(concat(lit("<html><body><p>"), col("text"),
        lit("</p></body></html>")), "UTF-8"))
    val dir = TestSpark.tmpDir("graft-idx-analyzed")
    new graft.index.IndexBuilder(spark, dir, graft.index.IndexParams(
      buckets = 4, shardSize = 128, blockSize = 32, buildPartitions = 4))
      .build(analyzed.as[graft.corpus.Page], "analyzed(seed=23,n=300)")
    // corpus vocabulary: "the" is in the Lucene stop set (dropped),
    // "use" survives it and Porter-stems to "us", wNNNNN passes through
    val qTerms = Analysis.analyzeQueryTerms(Seq("the", "use", "w00002"),
      Analysis.EnglishStopWords, stem = true)
    assert(qTerms == Seq("us", "w00002"))
    val served = new graft.query.IndexSearch(spark, dir)
      .boolTopK(Nil, qTerms, Nil, 15)
      .select(col("docId").cast("long"), col("score"))
      .as[(Long, Double)].collect().toSeq
    val brute = graft.query.Search.boolTopK(
      spark.read.parquet(s"$dir/docs"), "docId", "text", Nil, qTerms, Nil, 15)
      .select(col("docId").cast("long"), col("score"))
      .as[(Long, Double)].collect().toSeq
    assert(served == brute && served.nonEmpty)
  }
}
