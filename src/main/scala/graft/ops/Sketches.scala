package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for corpus profiling at 10¹²-row scale —
  * the role `approx_count_distinct` (HLL++) plays in Spark, re-built as a
  * KMV (k-minimum-values) bottom-k sketch (Bar-Yossef et al. 2002,
  * "Counting distinct elements in a data stream") because KMV under a
  * FIXED hash is fully deterministic and cross-engine replayable: the
  * sketch of a column is the k smallest md5 hashes of its values, and
  * DuckDB reproduces hash, order, AND estimate bit-for-bit (the oracle is
  * the whole point — HLL's register layout is engine-private).
  *
  * Hash domain: the first 16 hex chars of md5(value). Fixed-width hex
  * compares lexicographically exactly as the unsigned 64-bit value, so
  * the bottom-k is computed on STRINGS with no numeric conversion; the
  * estimator converts only the kth value: distinct ≈ (k−1) / (u_k / 2⁶⁴).
  * Below k observed hashes the sketch IS the distinct set (exact count).
  *
  * Scale shape: one keyed shuffle with map-side partial aggregation — the
  * [[BoundedMinK]] Aggregator's buffer is ≤ k strings per group per task,
  * and merge(a, b) = bottom-k of the union, which also makes sketches
  * unionable ACROSS dataframes/days ([[mergeSketches]]) without touching
  * raw data again. */
object Sketches {

  /** 16-hex-char (64-bit) md5 prefix — [[Dedup.md5Hash64]]'s Column twin;
    * DuckDB replay: `substr(md5(v), 1, 16)`. */
  def hash16(v: Column): Column = substring(md5(v.cast("string")), 1, 16)

  /** Typed bottom-k-distinct aggregator over 16-hex hash strings. The
    * buffer stays sorted, deduplicated and ≤ k — bounded state regardless
    * of group size. */
  final class BoundedMinK(k: Int)
      extends Aggregator[String, Array[String], Array[String]] {
    require(k >= 2, s"kmv needs k >= 2, got $k")

    def zero: Array[String] = Array.empty

    def reduce(buf: Array[String], v: String): Array[String] = {
      if (v == null) return buf
      val i = java.util.Arrays.binarySearch(buf.asInstanceOf[Array[AnyRef]],
        v, null)
      if (i >= 0) buf // already present
      else {
        val at = -i - 1
        if (at >= k) buf // larger than the current kth minimum
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[String](n)
          System.arraycopy(buf, 0, out, 0, at)
          out(at) = v
          System.arraycopy(buf, at, out, at + 1, math.min(buf.length, n - 1) - at)
          out
        }
      }
    }

    def merge(a: Array[String], b: Array[String]): Array[String] = {
      // sorted-unique merge, truncated at k
      val out = new scala.collection.mutable.ArrayBuffer[String](k)
      var i = 0
      var j = 0
      while (out.length < k && (i < a.length || j < b.length)) {
        val next =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
          else { j += 1; b(j - 1) }
        if (out.isEmpty || out.last != next) out += next
      }
      out.toArray
    }

    def finish(buf: Array[String]): Array[String] = buf
    def bufferEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
    def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** Per-group KMV sketch: one row per key with `kmv` = the sorted ≤ k
    * minimum hashes of `valueCol`'s distinct values. */
  def kmvSketch(df: DataFrame, keyCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    val agg = udaf(new BoundedMinK(k))
    df.groupBy(keyCols.map(col): _*)
      .agg(agg(hash16(col(valueCol))).as("kmv"))
  }

  /** Union sketches that share a key schema (e.g. daily sketches → a
    * monthly one): bottom-k of the concatenation, no raw data touched. */
  def mergeSketches(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      k: Int): DataFrame = {
    val agg = udaf(new BoundedMinK(k))
    a.unionByName(b)
      .select(keyCols.map(col) :+ explode(col("kmv")).as("h"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(agg(col("h")).as("kmv"))
  }

  /** Attach the cardinality estimate: exact when the sketch holds fewer
    * than k hashes (it IS the distinct hash set), else (k−1)/(u_k/2⁶⁴).
    * Rounded to 4 for cross-engine rank stability. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame = {
    val kth = element_at(col("kmv"), k)
    // power-of-two scaling is exact in doubles, so DuckDB's
    // `::UBIGINT::DOUBLE / 2^64` and this multiply agree bit-for-bit
    val ukNorm = conv(kth, 16, 10).cast("double") * lit(math.pow(2.0, -64))
    sketch
      .withColumn("sketch_size", size(col("kmv")))
      .withColumn("est_distinct",
        when(col("sketch_size") < k, col("sketch_size").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) / ukNorm, 4)))
  }
}
