package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.pipeline.{Route, Router}

/** Sink parity (SURVEY.md §2.2).
  *
  * The reference's `s3` sink accumulates events into objects under
  * size/count/timeout thresholds with `${}`-templated keys and per-group
  * codecs (s3-sink/.../S3SinkService.java, ThresholdCheck.java,
  * KeyGenerator.java); its `opensearch` sink is replaced wholesale by the
  * engine's index build (graft.index.IndexBuilder). What remains to map is
  * the object-writer behavior:
  *
  *  - dynamic grouping by key expression  → `partitionBy(cols…)`
  *  - event-count threshold per object    → `maxRecordsPerFile`
  *  - codecs (json/ndjson/csv/parquet)    → `format(...)`
  *  - compression                         → `option("compression", …)`
  *
  * Timeout thresholds are a streaming concern → trigger intervals
  * (graft.streaming). Byte-size thresholds have no exact Spark knob;
  * `maxRecordsPerFile` with a measured rows/byte estimate is the
  * practical equivalent and is what this wrapper exposes.
  */
object Sinks {

  /** `keyTemplate`: the reference's `${}`-templated object-key prefix
    * (KeyGenerator.java + ObjectKeyOptions `path_prefix`) — the template
    * is split on `/` and each SEGMENT compiles (via
    * [[graft.pipeline.FormatString]]) to its own partition column, so a
    * template like `logs/${lang}/part` yields the nested directory
    * hierarchy `_key0=logs/_key1=en/_key2=part/…` (one `_key` column
    * would percent-escape the slashes into a single flat directory). */
  def writeGrouped(df: DataFrame, path: String, format: String = "parquet",
      groupBy: Seq[String] = Nil, maxRecordsPerFile: Long = 0,
      compression: Option[String] = None,
      keyTemplate: Option[String] = None): Unit = {
    val (data, parts) = keyTemplate match {
      case Some(t) =>
        val segs = t.split('/').filter(_.nonEmpty).toSeq
        val cols = segs.indices.map(i => s"_key$i")
        val d = segs.zip(cols).foldLeft(df) { case (acc, (seg, name)) =>
          acc.withColumn(name, graft.pipeline.FormatString.compile(seg))
        }
        (d, cols ++ groupBy)
      case None => (df, groupBy)
    }
    var w = data.write.mode(SaveMode.Overwrite).format(format)
    if (parts.nonEmpty) w = w.partitionBy(parts: _*)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    compression.foreach(c => w = w.option("compression", c))
    w.save(path)
  }

  /** Routed multi-sink write (router/Router.java:39-86 + per-sink
    * `include_tags`): one cached upstream, one filtered write per route,
    * `_default` catches unrouted rows. Returns per-route row counts (the
    * reference's sink metrics). */
  def writeRouted(df: DataFrame, routes: Seq[Route], basePath: String,
      format: String = "parquet"): Map[String, Long] =
    Router.fanOut(df, routes, (name, branch) =>
      branch.write.mode(SaveMode.Overwrite).format(format)
        .save(s"$basePath/$name"))

  /** DLQ pattern (opensearch sink BulkRetryStrategy → dlq/
    * FailedBulkOperationConverter.java): rows that failed a stage predicate
    * go to a quarantine path with a reason column; good rows continue. */
  def writeWithDlq(df: DataFrame, isGood: org.apache.spark.sql.Column,
      goodPath: String, dlqPath: String): (Long, Long) = {
    val cached = df.persist()
    try {
      val good = cached.filter(isGood)
      val bad = cached.filter(!org.apache.spark.sql.functions.coalesce(
        isGood, org.apache.spark.sql.functions.lit(false)))
      good.write.mode(SaveMode.Overwrite).parquet(goodPath)
      bad.write.mode(SaveMode.Overwrite).parquet(dlqPath)
      (good.count(), bad.count())
    } finally { cached.unpersist() }
  }
}
