package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analyze.Analyzer

/** DSIR-style data selection — importance resampling of a raw web corpus
  * toward a trusted target distribution (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"; the reference pipeline
  * has no equivalent — this is the training-data curation role its users
  * hand to downstream jobs).
  *
  * Model: hashed n-gram (unigram + bigram) bucket counts; target and raw
  * corpora each fit an add-α-smoothed categorical over B buckets; a raw
  * doc's importance log-weight is Σ_b c_b · (ln p_target(b) − ln p_raw(b));
  * selection is Gumbel top-n resampling — key = log-weight + Gumbel noise
  * — which draws WITHOUT replacement from the importance-weighted
  * distribution (Vieira 2014). Everything is deterministic: the bucket
  * hash is the engine-portable md5-prefix (the [[Sketches]] convention —
  * xxhash64 is faster but not replayable in the oracle), the per-doc sum
  * is a LEFT FOLD over buckets ascending (the [[TextAnalysis
  * .tokenDiversity]] determinism contract), and the Gumbel noise derives
  * from md5(docId:seed) — partition-count-invariant, reproducible across
  * engines.
  *
  * Scale shape: bucket counting is explode → one (docId, bucket) keyed
  * aggregation; the two fitted models are B-row tables (B ≤ 10⁵) that
  * BROADCAST into the weighting join; resampling is a projection +
  * TakeOrdered. No all-pairs anything; the raw corpus is read once.
  */
object Dsir {

  /** Engine-portable bucket of one gram: first 15 md5 hex digits (60
    * bits) mod B. */
  private def bucketOf(gram: Column, buckets: Int): Column =
    conv(substring(md5(gram), 1, 15), 16, 10).cast("long") % buckets

  /** Per-doc hashed n-gram bucket counts — (docId, bucket, c); unigrams
    * plus space-joined bigrams, the DSIR featurization. */
  def bucketCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets > 0")
    val toks = Analyzer.tokensCol(col(textCol))
    val grams = concat(toks, TextAnalysis.ngramsCol(toks, 2))
    df.select(col(idCol).as("docId"), explode(grams).as("g"))
      .select(col("docId"), bucketOf(col("g"), buckets).as("bucket"))
      .groupBy("docId", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Add-α-smoothed bucket log-probabilities of a corpus — exactly B
    * rows (absent buckets get the smoothing floor):
    * ln((c_b + α) / (N + α·B)). */
  def bucketLogProbs(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "alpha > 0 (an unsmoothed zero bucket is -inf)")
    val spark = df.sparkSession
    import spark.implicits._
    val bc = bucketCounts(df, idCol, textCol, buckets)
      .groupBy("bucket").agg(sum(col("c")).as("c"))
    val n = bc.agg(sum(col("c"))).as[Long].head()
    spark.range(buckets).select(col("id").as("bucket"))
      .join(bc, Seq("bucket"), "left_outer")
      .select(col("bucket"),
        log((coalesce(col("c"), lit(0L)).cast("double") + lit(alpha)) /
          lit(n.toDouble + alpha * buckets)).as("logp"))
  }

  /** Per-raw-doc DSIR importance log-weight against fitted target/raw
    * models: left fold over buckets ascending of c_b·(lp_t − lp_r),
    * rounded to 6 (far above fold-order noise). Output (docId,
    * log_weight). */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
      targetLogp: DataFrame, rawLogp: DataFrame, buckets: Int): DataFrame = {
    val diff = targetLogp.select(col("bucket"), col("logp").as("lt"))
      .join(rawLogp.select(col("bucket"), col("logp").as("lr")), "bucket")
      .select(col("bucket"), (col("lt") - col("lr")).as("d"))
    bucketCounts(raw, idCol, textCol, buckets)
      .join(broadcast(diff), "bucket")
      .groupBy("docId")
      .agg(sort_array(collect_list(struct(col("bucket"), col("c"),
        col("d")))).as("bd"))
      .select(col("docId"),
        round(aggregate(col("bd"), lit(0.0), (acc, x) =>
          acc + x.getField("c").cast("double") * x.getField("d")), 6)
          .as("log_weight"))
  }

  /** Gumbel top-n importance resample: key = log_weight − ln(−ln(u))
    * with u = (md5₆₀(docId:seed) + 0.5) / 2⁶⁰ — deterministic in
    * (docId, seed), partition-invariant. Returns the n selected docs,
    * (docId, log_weight, key), key rounded to 6, ordered (key desc,
    * docId asc). */
  def resample(weights: DataFrame, n: Int, seed: Int): DataFrame = {
    val u = (conv(substring(md5(concat(col("docId").cast("string"),
        lit(s":$seed"))), 1, 15), 16, 10).cast("double") + lit(0.5)) /
      lit(math.pow(2.0, 60))
    weights
      .select(col("docId"), col("log_weight"),
        round(col("log_weight") - log(-log(u)), 6).as("key"))
      .orderBy(desc("key"), col("docId"))
      .limit(n)
  }

  /** The whole selection in one call: fit both models, weight the raw
    * corpus, Gumbel-resample n docs. */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int, n: Int, alpha: Double = 0.5,
      seed: Int = 7): DataFrame = {
    val tp = bucketLogProbs(target, idCol, textCol, buckets, alpha)
    val rp = bucketLogProbs(raw, idCol, textCol, buckets, alpha)
    resample(importanceWeights(raw, idCol, textCol, tp, rp, buckets),
      n, seed)
  }
}
