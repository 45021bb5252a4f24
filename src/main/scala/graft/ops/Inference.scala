package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.VecMath

/** Output row of [[Inference.batchInfer]] — top-level and public because
  * Catalyst's Janino-generated serializer must reach the accessors. */
final case class ScoredRow(id: Long, prob: Float)

/** Model-inference operators — the batch analog of the reference's
  * `ml_inference` processor (data-prepper-plugins/ml-inference-processor:
  * batches events to an external model endpoint). Two paths:
  *
  *  - [[linearScore]]: models whose math is expressible as columns (linear
  *    / logistic heads over an embedding) run INSIDE codegen via the
  *    [[VecMath]] expressions — weights broadcast as a literal, zero
  *    shuffles, no serving fleet at all.
  *  - [[batchInfer]]: opaque models plug into a partition-local batched
  *    seam ([[BatchModel]]) — the same batch shape the reference sends to
  *    its endpoint, so an ONNX/JNI/HTTP-backed scorer drops in without
  *    touching the plan. Batches bound peak memory; rows stream through.
  */
object Inference {

  /** Batched scorer SPI. Implementations MUST be deterministic and
    * thread-safe (one instance is shared by all partitions of a task). */
  trait BatchModel extends Serializable {
    def predict(batch: Array[Array[Float]]): Array[Float]
  }

  /** Reference linear/logistic head — also the differential oracle for
    * [[batchInfer]] (must agree with [[linearScore]] exactly). */
  final case class LinearModel(weights: Array[Float], bias: Double)
      extends BatchModel {
    def predict(batch: Array[Array[Float]]): Array[Float] =
      batch.map { v =>
        var dot = 0.0
        val n = math.min(v.length, weights.length)
        var i = 0
        while (i < n) { dot += v(i).toDouble * weights(i).toDouble; i += 1 }
        (1.0 / (1.0 + math.exp(-(dot + bias)))).toFloat
      }
  }

  /** Column-native scoring: `logit = w·v + b`, `prob = sigmoid(logit)`.
    * The weight vector rides along as an array literal (Catalyst folds
    * it), the dot product is the codegen'd [[VecMath.dot]] — a 100 TB
    * scoring pass is one whole-stage-codegen projection. */
  def linearScore(df: DataFrame, idCol: String, vecCol: String,
      weights: Seq[Double], bias: Double): DataFrame = {
    val w = array(weights.map(lit): _*)
    val logit = VecMath.dot(col(vecCol), w) + lit(bias)
    df.select(col(idCol), logit.as("logit"),
      (lit(1.0) / (lit(1.0) + exp(-logit))).as("prob"))
  }

  /** Opaque-model path: partition-local batches through [[BatchModel]].
    * Mirrors `extractFeatures`' batch seam — `batchSize` is the model's
    * preferred batch shape (GPU/endpoint payload), not a Spark knob. */
  def batchInfer(df: DataFrame, idCol: String, vecCol: String,
      model: BatchModel, batchSize: Int = 64): DataFrame = {
    implicit val enc: Encoder[ScoredRow] = Encoders.product[ScoredRow]
    val in = df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
    val scored: Dataset[ScoredRow] = in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { chunk =>
        val ids = chunk.map(_.getLong(0))
        val vecs = chunk.map(_.getSeq[Float](1).toArray).toArray
        ids.zip(model.predict(vecs)).map { case (i, p) => ScoredRow(i, p) }
      }
    }
    scored.toDF("id", "prob").withColumnRenamed("id", idCol)
  }
}
