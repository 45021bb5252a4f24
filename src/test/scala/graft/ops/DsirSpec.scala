package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DSIR importance resampling: model normalization, weight direction,
  * partition invariance, and deterministic Gumbel selection. */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val B = 32

  private lazy val raw = Seq(
    (1L, "spark shuffle join broadcast join"),
    (2L, "spark shuffle partition executor"),
    (3L, "cat dog mouse bird cat dog"),
    (4L, "fish bird cat tree river"),
    (5L, "spark executor broadcast shuffle join"),
    (6L, "mouse tree river stone cloud"))
    .toDF("id", "text")

  private lazy val target = Seq(
    (101L, "spark join shuffle executor broadcast"),
    (102L, "spark broadcast partition shuffle join"))
    .toDF("id", "text")

  test("bucketLogProbs: exactly B rows, probabilities sum to 1") {
    val lp = Dsir.bucketLogProbs(target, "id", "text", B)
    val rows = lp.collect()
    assert(rows.length == B)
    val total = rows.map(r => math.exp(r.getDouble(1))).sum
    assert(math.abs(total - 1.0) < 1e-9, s"sum=$total")
  }

  test("weights separate on-target docs from off-target docs") {
    val tp = Dsir.bucketLogProbs(target, "id", "text", B)
    val rp = Dsir.bucketLogProbs(raw, "id", "text", B)
    val w = Dsir.importanceWeights(raw, "id", "text", tp, rp, B)
      .as[(Long, Double)].collect().toMap
    val sparkDocs = Seq(1L, 2L, 5L).map(w)
    val animalDocs = Seq(3L, 4L, 6L).map(w)
    assert(sparkDocs.min > animalDocs.max,
      s"spark-like docs $sparkDocs should outweigh animal docs $animalDocs")
  }

  test("weights are partition-invariant") {
    def weigh(parts: Int): Map[Long, Double] = {
      val r = raw.repartition(parts)
      val tp = Dsir.bucketLogProbs(target, "id", "text", B)
      val rp = Dsir.bucketLogProbs(r, "id", "text", B)
      Dsir.importanceWeights(r, "id", "text", tp, rp, B)
        .as[(Long, Double)].collect().toMap
    }
    assert(weigh(1) == weigh(7))
  }

  test("resample: n distinct rows, deterministic, seed changes the draw key") {
    val sel1 = Dsir.select(raw, target, "id", "text", B, n = 4, seed = 7)
      .as[(Long, Double, Double)].collect().toSeq
    val sel2 = Dsir.select(raw, target, "id", "text", B, n = 4, seed = 7)
      .as[(Long, Double, Double)].collect().toSeq
    assert(sel1 == sel2)
    assert(sel1.size == 4 && sel1.map(_._1).distinct.size == 4)
    // keys strictly ordered desc
    assert(sel1.map(_._3) == sel1.map(_._3).sortBy(-_))
    val other = Dsir.select(raw, target, "id", "text", B, n = 4, seed = 8)
      .as[(Long, Double, Double)].collect().toSeq
    assert(other.map(_._3) != sel1.map(_._3), "seed must perturb the keys")
  }
}
