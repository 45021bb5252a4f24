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

  test("pooled endpoint client: batched, pooled, never more clients than poolSize") {
    Inference.PooledEndpointModel.resetForTest()
    val ws = Array(0.5f, -0.25f, 1.0f)
    val big = (0 until 500).map(i =>
      (i.toLong, Array(i * 0.01f, -i * 0.02f, 1.0f))).toDF("vec_id", "embedding")
      .repartition(8) // many tasks, many batches — ONE bounded client pool
    val pooled = Inference.batchInfer(big, "vec_id", "embedding",
      new Inference.PooledEndpointModel(ws, 0.1, poolSize = 2), batchSize = 16)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toMap
    // scores identical to the in-plan reference head
    val reference = Inference.batchInfer(big, "vec_id", "embedding",
      Inference.LinearModel(ws, 0.1), batchSize = 16)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toMap
    assert(pooled == reference)
    // pool bound held across 8 partitions / ~32 batches (local[*]: driver
    // and executor share a JVM, so the counter is observable here)
    assert(Inference.PooledEndpointModel.createdCount <= 2,
      s"created ${Inference.PooledEndpointModel.createdCount} clients")
    assert(Inference.PooledEndpointModel.createdCount >= 1)
  }

  test("two pooled models with different weights never share clients") {
    Inference.PooledEndpointModel.resetForTest()
    val wsA = Array(0.5f, -0.25f, 1.0f)
    val wsB = Array(-1.0f, 2.0f, 0.0f)
    val df = (0 until 100).map(i =>
      (i.toLong, Array(i * 0.01f, -i * 0.02f, 1.0f))).toDF("vec_id", "embedding")
      .repartition(4)
    def run(ws: Array[Float], poolSize: Int) =
      Inference.batchInfer(df, "vec_id", "embedding",
        new Inference.PooledEndpointModel(ws, 0.1, poolSize), batchSize = 8)
        .collect().map(r => (r.getLong(0), r.getFloat(1))).toMap
    def ref(ws: Array[Float]) =
      Inference.batchInfer(df, "vec_id", "embedding",
        Inference.LinearModel(ws, 0.1), batchSize = 8)
        .collect().map(r => (r.getLong(0), r.getFloat(1))).toMap
    // model A populates its pool first; a later model B with DIFFERENT
    // weights (and a larger pool) must get its own clients, not A's —
    // otherwise B silently scores with A's weights
    val a = run(wsA, poolSize = 2)
    val b = run(wsB, poolSize = 4) // larger pool: must not dead-block either
    assert(a == ref(wsA))
    assert(b == ref(wsB))
    // and re-running A reuses A's pool (no unbounded client growth)
    val created = Inference.PooledEndpointModel.createdCount
    assert(run(wsA, poolSize = 2) == ref(wsA))
    assert(Inference.PooledEndpointModel.createdCount == created)
  }
}
