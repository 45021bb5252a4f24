package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class InferenceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w = Seq(0.5, -0.25, 1.0)
  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f)),
    (3L, Array(-1.0f, 4.0f, 0.5f))).toDF("vec_id", "embedding")

  test("linearScore computes logit and sigmoid prob in-plan") {
    val out = Inference.linearScore(vecs, "vec_id", "embedding", w, bias = 0.1)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("logit"), r.getAs[Double]("prob"))).toMap
    assert(math.abs(out(1L)._1 - (0.5 - 0.5 + 3.0 + 0.1)) < 1e-12)
    assert(math.abs(out(2L)._1 - 0.1) < 1e-12)
    val expProb = 1.0 / (1.0 + math.exp(-out(1L)._1))
    assert(math.abs(out(1L)._2 - expProb) < 1e-12)
  }

  test("batchInfer through LinearModel agrees with linearScore") {
    val model = Inference.LinearModel(Array(0.5f, -0.25f, 1.0f), 0.1)
    val batched = Inference.batchInfer(vecs, "vec_id", "embedding", model,
      batchSize = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Float]("prob")).toMap
    val colPath = Inference.linearScore(vecs, "vec_id", "embedding",
      w.map(_.toFloat.toDouble), 0.1)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("prob")).toMap
    for (id <- Seq(1L, 2L, 3L))
      assert(math.abs(batched(id) - colPath(id)) < 1e-6,
        s"id $id: ${batched(id)} vs ${colPath(id)}")
  }

  test("batchInfer batches do not change results (batch-size invariance)") {
    val model = Inference.LinearModel(Array(0.5f, -0.25f, 1.0f), 0.1)
    val a = Inference.batchInfer(vecs, "vec_id", "embedding", model, batchSize = 1)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSet
    val b = Inference.batchInfer(vecs, "vec_id", "embedding", model, batchSize = 100)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSet
    assert(a == b)
  }
}
