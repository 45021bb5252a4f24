package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ids = spark.range(0, 20000).toDF("id")

  test("deterministic sample: rate accuracy and partition-layout independence") {
    val kept = Sampling.deterministic(ids, "id", 0.3).as[Long].collect().toSet
    // binomial(20000, 0.3): ±4σ ≈ ±260
    assert(math.abs(kept.size - 6000) < 300, s"kept ${kept.size}")
    val kept2 = Sampling.deterministic(ids.repartition(17), "id", 0.3)
      .as[Long].collect().toSet
    assert(kept == kept2, "sample depends on partitioning")
    // monotone: raising the rate only adds rows (nested samples)
    val kept50 = Sampling.deterministic(ids, "id", 0.5).as[Long].collect().toSet
    assert(kept.subsetOf(kept50))
  }

  test("stratified rates apply per stratum; rate 0 and 1 are exact") {
    val df = ids.withColumn("stratum",
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b").otherwise("c"))
    val kept = Sampling.stratified(df, "id", "stratum",
      Map("a" -> 1.0, "b" -> 0.0), defaultRate = 0.5)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(kept("a") == 6667L) // every multiple of 3 kept
    assert(!kept.contains("b"))
    assert(math.abs(kept("c") - 3333L) < 250)
  }

  test("split: exhaustive, exclusive, consistent, and insensitive to other rows") {
    val s = Sampling.split(ids, "id", Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 20000L)
    assert(math.abs(counts("train") - 16000L) < 350)
    assert(math.abs(counts("val") - 2000L) < 250)
    // a document's split does not change when the corpus shrinks
    val sub = Sampling.split(ids.where(col("id") < 500), "id",
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
      .as[(Long, String)].collect().toMap
    val full = s.where(col("id") < 500).as[(Long, String)].collect().toMap
    assert(sub == full)
  }

  test("sampling and splitting decisions are independent (different salts)") {
    val sampled = Sampling.deterministic(ids, "id", 0.5).as[Long].collect().toSet
    val train = Sampling.split(ids, "id", Seq("train" -> 1.0, "rest" -> 1.0))
      .where(col("split") === "train").select("id").as[Long].collect().toSet
    // if decisions were correlated, the intersection would be ~0% or ~100%
    val inter = sampled.intersect(train).size.toDouble / 20000
    assert(inter > 0.2 && inter < 0.3, s"joint rate $inter not ≈ 0.25")
  }

  test("temperatureRates: T=1 keeps natural shares; T→∞ flattens; caps at 1") {
    import spark.implicits._
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1 to 100).map(i => (i + 1000L, "small"))).toDF("id", "domain")
    // T=1: q_d = p_d → accept rate identical for every domain (= f)
    val t1 = Sampling.temperatureRates(df, "domain", 1.0, 0.4).toMap
    assert(math.abs(t1("big") - 0.4) < 1e-9 && math.abs(t1("small") - 0.4) < 1e-9)
    // high T: shares flatten toward 50/50 → small domain upsampled,
    // big downsampled
    val t9 = Sampling.temperatureRates(df, "domain", 100.0, 0.4).toMap
    assert(t9("small") > t9("big"))
    assert(t9("small") <= 1.0)
    // tiny domain with aggressive target: rate caps at 1.0
    val cap = Sampling.temperatureRates(df, "domain", 100.0, 0.9).toMap
    assert(cap("small") == 1.0)
  }

  test("temperatureSample realizes the expected per-domain counts") {
    import spark.implicits._
    val df = ((1 to 4000).map(i => (i.toLong, "en")) ++
      (1 to 1000).map(i => (i + 10000L, "de"))).toDF("id", "domain")
    val rates = Sampling.temperatureRates(df, "domain", 2.0, 0.3).toMap
    val got = Sampling.temperatureSample(df, "id", "domain", 2.0, 0.3)
      .groupBy("domain").count().as[(String, Long)].collect().toMap
    // md5 thresholding is exact in expectation; 4σ tolerance
    Seq("en" -> 4000, "de" -> 1000).foreach { case (d, n) =>
      val exp = rates(d) * n
      val tol = 4 * math.sqrt(exp)
      assert(math.abs(got(d) - exp) < tol, s"$d: got ${got(d)} want ~$exp")
    }
    // temperature flattening: de's accept rate must exceed en's
    assert(rates("de") > rates("en"))
  }

  test("temperatureRates: non-string domain column casts; null domains get no rate") {
    import spark.implicits._
    // int domain keys (ADVICE r5: previously threw ClassCastException)
    val ints = ((1 to 90).map(i => (i.toLong, 7)) ++
      (1 to 10).map(i => (i + 100L, 9))).toDF("id", "domain")
    val r = Sampling.temperatureRates(ints, "domain", 1.0, 0.5).toMap
    assert(r.keySet == Set("7", "9"))
    assert(math.abs(r("7") - 0.5) < 1e-9)
    // null domains: documented as excluded (defaultRate 0 drops the rows)
    val withNull = Seq((1L, "a"), (2L, "a"), (3L, null)).toDF("id", "domain")
    val rn = Sampling.temperatureRates(withNull, "domain", 1.0, 1.0).toMap
    assert(rn.keySet == Set("a"))
  }
}
