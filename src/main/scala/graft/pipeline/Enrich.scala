package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment processors: geoip-style range lookup and per-key anomaly
  * detection (SURVEY.md §2.5 `geoip`, §2.6 `anomaly_detector`).
  */
object Enrich {

  /** `geoip` parity (geoip-processor/.../GeoIPProcessor.java:43): the
    * reference looks each IP up in a MaxMind mmdb. The Spark-native form
    * of any range database is a broadcast RANGE JOIN on the integer form
    * of the IP: ranges (startIp, endIp, attrs…) are broadcast and the scan
    * probes with `ipLong BETWEEN start AND end`. No mmdb ships offline, so
    * callers supply the range table — the operator is the join shape.
    *
    * `ranges`: (cidr, value) pairs, e.g. ("10.0.0.0/8", "private-a").
    */
  def geoLookup(df: DataFrame, ipCol: String, target: String,
      ranges: Seq[(String, String)], default: String = "unknown"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = ranges.map { case (cidr, v) =>
      val Array(base, bitsS) = cidr.split("/")
      val bits = bitsS.toInt
      val ip = base.split("\\.").map(_.toLong)
      val ipL = ip(0) * 16777216L + ip(1) * 65536L + ip(2) * 256L + ip(3)
      val mask = if (bits == 0) 0L else (0xffffffffL << (32 - bits)) & 0xffffffffL
      val lo = ipL & mask
      val hi = lo | (~mask & 0xffffffffL)
      (lo, hi, v)
    }
    val dim = rows.toDF("_lo", "_hi", target)
    val parts = split(col(ipCol), "\\.")
    val ipLong = parts.getItem(0).cast("long") * 16777216L +
      parts.getItem(1).cast("long") * 65536L +
      parts.getItem(2).cast("long") * 256L +
      parts.getItem(3).cast("long")
    df.withColumn("_ip", ipLong)
      .join(broadcast(dim), col("_ip").between(col("_lo"), col("_hi")), "left")
      .withColumn(target, coalesce(col(target), lit(default)))
      .drop("_ip", "_lo", "_hi")
  }

  /** `geoip` over a real MaxMind database file: decode the mmdb binary
    * (own-kernel [[Mmdb]] reader — public MaxMind-DB spec) into the same
    * (cidr → value) dimension table the inline path uses, then serve via
    * the identical broadcast range join. The database decodes ONCE on the
    * driver (dimension file, MBs); the fact side never touches the binary.
    * `path` walks the record map to the enrichment field, e.g.
    * Seq("country", "iso_code"). */
  def geoLookupMmdb(df: DataFrame, ipCol: String, target: String,
      mmdb: Array[Byte], path: Seq[String],
      default: String = "unknown"): DataFrame = {
    val db = Mmdb.read(mmdb)
    val ranges = db.entries().flatMap { case (cidr, rec) =>
      val v = path.foldLeft(rec: Any) {
        case (m: Map[_, _], k) => m.asInstanceOf[Map[String, Any]].getOrElse(k, null)
        case _ => null
      }
      Option(v).map(x => cidr -> String.valueOf(x))
    }
    geoLookup(df, ipCol, target, ranges, default)
  }

  /** `anomaly_detector` parity (anomaly-detector-processor/.../
    * AnomalyDetectorProcessor.java:37): the reference trains a Random Cut
    * Forest per `identification_keys` group. The engine ships the
    * distribution-native form — per-key robust z-score: one groupBy
    * computes each key's mean/stddev, broadcast back via join, and rows
    * with |z| > threshold get `grade`/`score` columns. Deterministic,
    * one shuffle, no per-row model state; RCF's value over z-scores is
    * multidimensional drift, out of north-rule scope (SURVEY §2.6).
    */
  def zScoreAnomalies(df: DataFrame, keys: Seq[String], valueCol: String,
      threshold: Double = 3.0): DataFrame = {
    val stats = df.groupBy(keys.map(col): _*).agg(
      avg(col(valueCol)).as("_mean"),
      stddev_pop(col(valueCol)).as("_std"))
    df.join(broadcast(stats), keys)
      .withColumn("score",
        when(col("_std") > 0, abs(col(valueCol) - col("_mean")) / col("_std"))
          .otherwise(lit(0.0)))
      .withColumn("grade", when(col("score") > threshold, 1.0).otherwise(0.0))
      .drop("_mean", "_std")
  }
}
