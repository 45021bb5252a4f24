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

  /** fastText-style hashed bag-of-words linear head over RAW TEXT (Joulin
    * et al. 2016, "Bag of Tricks for Efficient Text Classification"):
    * tokens hash into `dim` feature buckets, the document representation
    * is the MEAN of the bucket weights, plus bias, through a sigmoid.
    * This is the cheap quality-classifier shape big corpus filters use
    * (e.g. a wiki-vs-crawl classifier gating a pretraining corpus).
    *
    * Entirely one codegen'd projection — the hash, the `aggregate` fold
    * over the token array, and the sigmoid are all Column algebra with the
    * weight table as a folded array literal. Zero shuffles: a 100 TB
    * scoring pass never leaves the scan task.
    *
    * `tokenHash = "xxh64"` (default) is the fast path; `"md5"` uses the
    * first 15 hex chars of md5 (60 bits) so a SQL engine can replay
    * bucket assignment exactly — same dual-mode convention as
    * [[Dedup.simHashNearDups]] / [[TextAnalysis.fingerprints]]. */
  def hashedTextScore(df: DataFrame, idCol: String, textCol: String,
      dim: Int, weights: Seq[Double], bias: Double,
      tokenHash: String = "xxh64"): DataFrame = {
    require(weights.length == dim, s"weights.length ${weights.length} != dim $dim")
    require(tokenHash == "xxh64" || tokenHash == "md5",
      s"unknown tokenHash $tokenHash")
    val toks = graft.analyze.Analyzer.tokensCol(col(textCol))
    val w = array(weights.map(lit): _*)
    def bucket(t: Column): Column = tokenHash match {
      case "xxh64" => pmod(xxhash64(t), lit(dim.toLong)).cast("int")
      case "md5" => pmod(conv(substring(md5(t), 1, 15), 16, 10).cast("bigint"),
        lit(dim.toLong)).cast("int")
    }
    val dot = aggregate(toks, lit(0.0),
      (acc, t) => acc + element_at(w, bucket(t) + 1))
    val n = greatest(size(toks), lit(1)).cast("double")
    val logit = dot / n + lit(bias)
    // canonicalize IEEE negative zero: a logit that rounds to -0.0 on one
    // engine and +0.0 on another (tiny negative accumulation) must not
    // depend on accumulation sign — -0.0 == 0.0 is true, so the `when`
    // rewrites both to +0.0
    val r = round(logit, 6)
    df.select(col(idCol),
      when(r === 0.0, lit(0.0)).otherwise(r).as("logit"),
      round(lit(1.0) / (lit(1.0) + exp(-logit)), 6).as("prob"))
  }

  /** Demo endpoint-backed scorer — the wiring the reference's `aws_lambda`
    * / `s3_enrich` / external-`ml_inference` clients need, with running
    * code at the seam (the sandbox has no egress, so the "endpoint" is an
    * in-process deterministic stub; swap [[StubEndpoint]] for an HTTP/SDK
    * client and nothing else changes). What the demo demonstrates is the
    * plumbing that matters at 100 TB:
    *
    *  - a JVM-SHARED lazy client pool: clients are created on first use on
    *    each executor and reused across every task/batch/row that executor
    *    ever runs — never one client per row (the classic `mapPartitions`
    *    anti-pattern this seam exists to prevent);
    *  - bounded concurrency: at most `poolSize` in-flight requests per
    *    executor regardless of task slots (endpoint rate-limit hygiene);
    *  - batched payloads: rows reach the endpoint in [[batchInfer]]'s
    *    `batchSize` groups, not singly.
    *
    * InferenceSpec pins: scores ≡ [[LinearModel]] exactly, clients created
    * ≤ poolSize across many partitions, and > 1 batch per client. */
  final class PooledEndpointModel(weights: Array[Float], bias: Double,
      poolSize: Int = 2) extends BatchModel {
    // Pool identity = the full client config. Two models with different
    // weights (or pool sizes) must NEVER share clients — a shared
    // singleton would hand model A's clients (which captured A's weights)
    // to model B and silently return wrong scores.
    private val key = PooledEndpointModel.PoolKey(
      weights.toVector, bias, poolSize)
    def predict(batch: Array[Array[Float]]): Array[Float] = {
      val client = PooledEndpointModel.acquire(key)
      try client.call(batch)
      finally PooledEndpointModel.release(key, client)
    }
  }

  object PooledEndpointModel {
    /** The "remote" scorer: deterministic so the spec can differential it
      * against the in-plan path. A real deployment replaces only this. */
    final class StubEndpoint(weights: Array[Float], bias: Double) {
      private[Inference] val served = new java.util.concurrent.atomic.AtomicInteger()
      def call(batch: Array[Array[Float]]): Array[Float] = {
        served.incrementAndGet()
        LinearModel(weights, bias).predict(batch)
      }
    }

    private[Inference] final case class PoolKey(weights: Vector[Float],
        bias: Double, poolSize: Int)

    private final class Pool(val size: Int) {
      val created = new java.util.concurrent.atomic.AtomicInteger()
      val idle = new java.util.concurrent.ArrayBlockingQueue[StubEndpoint](size)
    }

    // JVM-wide (per-executor) state, KEYED BY MODEL CONFIG: each executor
    // JVM builds one pool per distinct (weights, bias, poolSize) lazily
    // and keeps it for the executor's lifetime, exactly like a pooled
    // HTTP/SDK client cache keyed by endpoint+credentials.
    private val pools =
      new java.util.concurrent.ConcurrentHashMap[PoolKey, Pool]()

    private def acquire(key: PoolKey): StubEndpoint = {
      val p = pools.computeIfAbsent(key, k => new Pool(k.poolSize))
      p.idle.poll() match {
        case null =>
          // no idle client: claim a creation slot or wait for a release —
          // never create past this pool's size (blocking take, NOT lock-held)
          if (p.created.getAndIncrement() < p.size)
            new StubEndpoint(key.weights.toArray, key.bias)
          else { p.created.decrementAndGet(); p.idle.take() }
        case c => c
      }
    }

    private def release(key: PoolKey, c: StubEndpoint): Unit =
      pools.get(key).idle.put(c)

    /** Test hooks (driver-side observability of the executor pools — valid
      * under local[*] where driver and executor share the JVM). */
    def createdCount: Int = {
      var n = 0
      pools.values().forEach(p => n += p.created.get())
      n
    }
    def resetForTest(): Unit = pools.clear()
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
