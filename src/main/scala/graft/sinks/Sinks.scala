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
    import org.apache.spark.sql.functions.{coalesce, count, lit}
    val cached = df.persist()
    try {
      // counts ride each branch's write action via `observe` (the
      // Router.fanOut pattern) — a follow-up count job would re-scan the
      // input twice whenever the cache has been evicted, which at scale
      // means two extra full passes over the corpus
      def writeCounted(branch: DataFrame, path: String, tag: String): Long = {
        val obs = org.apache.spark.sql.Observation(s"dlq_$tag")
        branch.observe(obs, count(lit(1)).as("n"))
          .write.mode(SaveMode.Overwrite).parquet(path)
        org.apache.spark.sql.graft.ColumnLift.observedOrEmpty(obs).get("n") match {
          case Some(v: Long) => v
          case _ => branch.count()
        }
      }
      val good = writeCounted(cached.filter(isGood), goodPath, "good")
      val bad = writeCounted(
        cached.filter(!coalesce(isGood, lit(false))), dlqPath, "bad")
      (good, bad)
    } finally { cached.unpersist() }
  }

  // --------------------------------------------- bulk action semantics

  /** Per-event bulk-action resolution (opensearch sink
    * EventActionResolver.java:44-57): the FIRST rule whose `when`
    * condition holds wins; a rule with no condition never breaks the
    * loop, so when nothing matches the LAST rule's action sticks (the
    * reference's exact quirk), and an empty rule list yields `default`.
    * Conditions go through the expression-language compiler. */
  def resolveActions(df: DataFrame, default: String,
      rules: Seq[(Option[String], String)],
      out: String = "_action"): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = if (rules.isEmpty) lit(default) else lit(rules.last._2)
    val chain = rules.foldRight(base) {
      case ((Some(cond), act), acc) =>
        when(graft.pipeline.ExprCompiler.compile(cond), lit(act)).otherwise(acc)
      case ((None, _), acc) => acc
    }
    df.withColumn(out, chain)
  }

  /** Apply a batch of per-event bulk actions to a keyed table snapshot —
    * OpenSearch document semantics (OpenSearchBulkActions.java:20-24 +
    * BulkOperationFactory): `index` inserts-or-overwrites, `create`
    * inserts only if absent, `update` merges non-null payload fields into
    * an EXISTING doc (no-op when absent), `upsert` merges-or-inserts,
    * `delete` removes. Within the batch the LAST action per key wins
    * (`seqCol` = arrival order), exactly like replaying the bulk request.
    *
    * Shape: one `max_by` collapse of the batch + ONE keyed full-outer
    * join against the snapshot (the MERGE INTO plan) — both shuffles key
    * on the doc id, so at 10^12 docs this is two bounded exchanges and
    * no driver involvement. */
  def mergeActions(existing: DataFrame, batch: DataFrame, keyCol: String,
      actionCol: String = "_action", seqCol: String = "_seq"): DataFrame = {
    import org.apache.spark.sql.functions._
    val payload = existing.columns.filterNot(_ == keyCol).toSeq
    require(payload.forall(batch.columns.contains),
      s"batch is missing payload columns: ${payload.filterNot(batch.columns.contains)}")
    // last action per key, with its payload
    val last = batch.groupBy(col(keyCol))
      .agg(max_by(struct((actionCol +: payload).map(col): _*), col(seqCol)).as("b"))
      .select(col(keyCol) +: (col(s"b.$actionCol").as(actionCol) +:
        payload.map(p => col(s"b.$p").as(s"_b_$p"))): _*)
    val joined = existing.withColumn("_e", lit(true))
      .join(last, Seq(keyCol), "full_outer")
    val existed = col("_e").isNotNull
    val act = col(actionCol)
    val keep =
      when(act.isNull, lit(true))                       // untouched existing row
        .when(act === "delete", lit(false))
        .when(act === "update", existed)                // update needs a doc
        .otherwise(lit(true))                           // index/create/upsert
    val merged = payload.map { p =>
      val b = col(s"_b_$p")
      val e = col(p)
      when(act.isNull, e)                               // untouched
        .when(act === "index", b)                       // full overwrite
        .when(act === "create", when(existed, e).otherwise(b))
        .otherwise(coalesce(b, e))                      // update/upsert merge
        .as(p)
    }
    joined.filter(keep).select(col(keyCol) +: merged: _*)
  }
}
