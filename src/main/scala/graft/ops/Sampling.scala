package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data assembly.
  *
  * A 100 TB corpus is mixed from strata (language × source × quality
  * band) at per-stratum rates, and split into train/val/test — and both
  * decisions must be REPRODUCIBLE (same doc → same decision on every
  * run, any cluster size, any partitioning) and CONSISTENT (a doc's
  * split never changes when the corpus around it grows). Seeded
  * `df.sample` gives neither: its outcome depends on partition layout.
  * Content-hash thresholding gives both, and is a pure projection —
  * zero shuffles, trivially parallel.
  *
  * Mechanism: `md5(key)` is uniform over [0, 2¹²⁸); the decision
  * compares a fixed-width hex prefix against a threshold string, so
  * `keep ⇔ md5_prefix < hex(rate · 16⁸)`. Lexicographic compare on the
  * 8-hex-digit prefix equals numeric compare — and `md5` exists with
  * identical semantics in every engine (the DuckDB oracle runs the
  * byte-same predicate; q_sample_stratified is hash-exact).
  *
  * The reference's closest operator is `percent_sampler`
  * (/root/reference/data-prepper-plugins/aggregate-processor/src/main/
  * java/.../actions/PercentSamplerAggregateAction.java:25,48), a
  * running-ratio admission — order-dependent, single-node. These are its
  * scale-correct batch analogs.
  */
object Sampling {

  private val Width = 8 // hex digits compared = 32 bits of md5

  /** `md5(key || salt)` prefix as the decision variable. `salt` decouples
    * decisions: sampling with salt "mix" and splitting with salt "split"
    * are independent coin flips for the same document. */
  private def prefix(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, Width)

  /** Threshold hex string for a rate in [0, 1]: keep ⇔ prefix < threshold.
    * `private[graft]` so the oracle SQL is built from the same constant. */
  private[graft] def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    val t = math.round(rate * (1L << (4 * Width))).min(1L << (4 * Width))
    // 1.0 → "g" sorts after every hex digit ⇒ keep-all without overflow
    if (t == (1L << (4 * Width))) "g"
    else f"$t%08x"
  }

  /** Deterministic Bernoulli sample: keep each row iff
    * `md5(key, salt) < rate`. Reproducible under any partitioning. */
  def deterministic(df: DataFrame, keyCol: String, rate: Double,
      salt: String = "sample"): DataFrame =
    df.where(prefix(col(keyCol), salt) < lit(thresholdHex(rate)))

  /** Stratified mixing: per-stratum keep rates keyed by the value of
    * `strataCol` (e.g. language or source), `defaultRate` otherwise.
    * One codegen'd CASE over a projection — no shuffle, no per-stratum
    * passes; rates are exact in expectation and deterministic per doc. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "mix"): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(thresholdHex(defaultRate))) { case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(thresholdHex(rate))).otherwise(acc)
      }
    df.where(prefix(col(keyCol), salt) < threshold)
  }

  /** Consistent train/val/test split: `fractions` (name → weight,
    * normalized) partition the hash space into contiguous bands, so a
    * document's assignment never changes when other documents appear or
    * rates of OTHER splits are re-balanced only at band boundaries.
    * Adds `split`. */
  def split(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0))
    val total = fractions.map(_._2).sum
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
    val p = prefix(col(keyCol), salt)
    // last band is an `otherwise` so rounding can never drop a row
    val assign = fractions.init.zipWithIndex
      .foldRight(lit(fractions.last._1): Column) { case (((name, _), i), acc) =>
        when(p < lit(thresholdHex(cuts(i + 1))),
          // bands are [cut_i, cut_{i+1}) and the when-chain runs in
          // order, so the first matching upper bound wins
          lit(name)).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** Per-domain accept rates for temperature-flattened mixing (mT5 §3.1 /
    * GPT-3-style corpus weighting): sampling share q_d ∝ p_d^(1/T) where
    * p_d = c_d/N, expected output = `targetFraction`·N rows distributed
    * as q, per-row accept rate a_d = min(1, f·N·q_d/c_d). T=1 keeps
    * natural proportions; T→∞ flattens domains to equal shares. Rates are
    * rounded to 9 decimals so the DuckDB oracle's pow() (≤ 1 ulp apart
    * from the JVM's) quantizes to the identical threshold. Domain counts
    * are a bounded driver collect (one row per domain).
    *
    * The domain column is cast to string first (an int/long domain key
    * would otherwise throw on getString — ADVICE r5). Rows with a NULL
    * domain get NO rate entry, i.e. [[temperatureSample]] drops them via
    * its defaultRate = 0 — route nulls to a sentinel domain upstream if
    * they must be kept. */
  def temperatureRates(df: DataFrame, domainCol: String,
      temperature: Double, targetFraction: Double): Seq[(String, Double)] = {
    require(temperature > 0 && targetFraction >= 0 && targetFraction <= 1)
    val counts = df.groupBy(col(domainCol).cast("string").as("_domain")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._1 != null).sortBy(_._1).toSeq
    val n = counts.map(_._2).sum.toDouble
    val pows = counts.map { case (d, c) => (d, math.pow(c / n, 1.0 / temperature)) }
    val z = pows.map(_._2).sum
    counts.zip(pows).map { case ((d, c), (_, w)) =>
      val a = math.min(1.0, targetFraction * n * (w / z) / c)
      (d, BigDecimal(a).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  /** Temperature-flattened domain mixing: deterministic md5-threshold
    * acceptance at [[temperatureRates]] — same projection-only shape as
    * [[stratified]], so the sampling pass is shuffle-free no matter the
    * corpus size (the one tiny aggregate is the domain-count collect). */
  def temperatureSample(df: DataFrame, keyCol: String, domainCol: String,
      temperature: Double, targetFraction: Double,
      salt: String = "temp"): DataFrame =
    stratified(df, keyCol, domainCol,
      temperatureRates(df, domainCol, temperature, targetFraction).toMap,
      defaultRate = 0.0, salt = salt)
}
