package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.SplitMix64

/** Random Cut Forest anomaly scoring — the reference's RCF mode of the
  * anomaly_detector processor (anomaly-detector-processor/.../modes/
  * RandomCutForestMode.java:36-58, which wraps the AWS RCF library).
  *
  * Batch-first re-expression of the published algorithm (S. Guha,
  * N. Mishra, G. Roy, O. Schrijvers, "Robust Random Cut Forest Based
  * Anomaly Detection on Streams", ICML 2016):
  *
  *  - FIT (driver): a deterministic hash-ordered sample of the data (one
  *    TakeOrdered pass — at 10^12 rows the sample is still `sampleSize`
  *    rows) seeds `numTrees` random-cut trees; each tree bootstraps its
  *    subset with a seeded SplitMix64, and cut dimensions are chosen with
  *    probability proportional to bounding-box side length (the RRCF
  *    construction, §2 of the paper).
  *  - SCORE (executors): the fitted forest is tiny and ships inside the
  *    UDF closure (broadcast by the task serializer); each row gets the
  *    expected DISPLACEMENT of a virtual insertion — at every node the
  *    probability that a fresh random cut would isolate the point there
  *    is `extension / (box + extension)` perimeter ratio, weighted by the
  *    displaced subtree size (paper §3, Disp(x,S)); duplicates terminate
  *    at their leaf with the leaf's multiplicity. Scores are averaged
  *    over trees and normalized by sample size → (0, 1], higher = more
  *    anomalous. CoDisp's colluder maximization is simplified to Disp
  *    (documented; exact CoDisp needs per-ancestor subtree maxima that
  *    add nothing on point anomalies).
  */
object Rcf {

  private sealed trait RNode extends Serializable { def size: Int }
  private final case class RLeaf(point: Array[Double], size: Int) extends RNode
  private final case class RBranch(dim: Int, cut: Double,
      left: RNode, right: RNode, size: Int,
      lo: Array[Double], hi: Array[Double]) extends RNode

  final class Model private[Rcf] (
      private[Rcf] val trees: Array[RNode],
      private[Rcf] val sampleSize: Int) extends Serializable

  /** Deterministic sample + driver-side forest build. Rows with a null
    * feature are excluded from the sample (and score to null — the same
    * null propagation the z-score mode gets from Column arithmetic). */
  def fit(df: DataFrame, cols: Seq[String], numTrees: Int = 30,
      sampleSize: Int = 256, seed: Long = 42L): Model = {
    val vecCol = array(cols.map(c => col(c).cast("double")): _*)
    // hash-ordered deterministic sample: one TakeOrdered pass, no rand()
    val sample = df
      .where(cols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(vecCol.as("v"), xxhash64(vecCol).as("h"))
      .orderBy(col("h")).limit(sampleSize)
      .select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "rcf: empty input")
    val trees = Array.tabulate(numTrees) { t =>
      val rng = SplitMix64.stream(seed, t.toLong)
      // bootstrap: sample with replacement from the master sample
      val pts = Array.fill(sample.length)(sample(rng.nextInt(sample.length)))
      build(pts, rng)
    }
    new Model(trees, sample.length)
  }

  private def build(pts: Array[Array[Double]], rng: SplitMix64): RNode = {
    val dims = pts(0).length
    val lo = Array.fill(dims)(Double.MaxValue)
    val hi = Array.fill(dims)(Double.MinValue)
    pts.foreach { p =>
      var d = 0
      while (d < dims) {
        if (p(d) < lo(d)) lo(d) = p(d)
        if (p(d) > hi(d)) hi(d) = p(d)
        d += 1
      }
    }
    val span = (0 until dims).map(d => hi(d) - lo(d))
    val total = span.sum
    if (total <= 0) return RLeaf(pts(0), pts.length) // all identical
    // cut dimension ∝ side length (the RRCF choice), cut uniform in range
    var pick = rng.nextDouble() * total
    var dim = 0
    while (dim < dims - 1 && pick > span(dim)) { pick -= span(dim); dim += 1 }
    val cut = lo(dim) + rng.nextDouble() * (hi(dim) - lo(dim))
    val (l, r) = pts.partition(_(dim) <= cut)
    if (l.isEmpty || r.isEmpty) return build(pts, rng) // degenerate cut; redraw
    RBranch(dim, cut, build(l, rng), build(r, rng), pts.length, lo, hi)
  }

  /** Expected displacement of a virtual insert of `x` into `node`. */
  private def disp(node: RNode, x: Array[Double], pThrough: Double): Double =
    node match {
      case RLeaf(p, count) =>
        // distinct point at a leaf displaces the leaf; duplicate → count
        val same = java.util.Arrays.equals(p, x)
        pThrough * (if (same) count.toDouble else 1.0)
      case b: RBranch =>
        var ext = 0.0
        var box = 0.0
        var d = 0
        while (d < x.length) {
          box += b.hi(d) - b.lo(d)
          if (x(d) < b.lo(d)) ext += b.lo(d) - x(d)
          else if (x(d) > b.hi(d)) ext += x(d) - b.hi(d)
          d += 1
        }
        val pSep = if (box + ext <= 0) 0.0 else ext / (box + ext)
        // separated at this node → the new leaf's sibling is this subtree
        val here = pThrough * pSep * b.size
        val child = if (x(b.dim) <= b.cut) b.left else b.right
        here + disp(child, x, pThrough * (1.0 - pSep))
    }

  /** Score column in (0, 1]: avg expected displacement / sample size;
    * null when any feature is null (the when-guard keeps the kernel from
    * ever seeing a null element). */
  def scoreCol(model: Model, cols: Seq[String]): Column = {
    val m = model
    val f = udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      var s = 0.0
      var t = 0
      while (t < m.trees.length) { s += disp(m.trees(t), x, 1.0); t += 1 }
      (s / m.trees.length) / m.sampleSize
    }
    val valid = cols.map(c => col(c).isNotNull).reduce(_ && _)
    when(valid, f(array(cols.map(c => col(c).cast("double")): _*)))
      .otherwise(lit(null).cast("double"))
  }

  /** anomaly_detector RCF-mode shape: fit on the input, add `rcf_score`
    * and a threshold `rcf_grade` (reference emits score + grade). */
  def anomalies(df: DataFrame, cols: Seq[String], threshold: Double,
      numTrees: Int = 30, sampleSize: Int = 256, seed: Long = 42L): DataFrame = {
    val model = fit(df, cols, numTrees, sampleSize, seed)
    df.withColumn("rcf_score", scoreCol(model, cols))
      .withColumn("rcf_grade",
        when(col("rcf_score") > threshold, 1.0).otherwise(0.0))
  }
}
