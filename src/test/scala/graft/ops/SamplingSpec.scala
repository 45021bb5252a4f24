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
}
