package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conditional routing (SURVEY.md §2.8) — parity with the reference's
  * per-sink route fan-out (data-prepper-api/.../configuration/
  * ConditionalRoute.java:41, data-prepper-core/.../router/
  * RouteEventEvaluator.java:38-68).
  *
  * The reference evaluates every route expression once per event and
  * distributes the event to each matching sink, with `_default` catching
  * unrouted events. Spark-first: persist the upstream plan once, then each
  * route is a filtered branch — Catalyst pushes the route predicate into
  * each branch; the shared lineage is computed once thanks to the persist.
  */
final case class Route(name: String, condition: Column)

object Router {

  val DefaultRoute = "_default"

  /** Materialize each route's branch. `onBranch` is the sink action (e.g.
    * `_.write.parquet(...)`). Returns per-route row counts (the reference's
    * router metrics). The input is persisted around the fan-out so N sinks
    * don't recompute the upstream pipeline N times.
    *
    * Counts ride on each branch's own write action via `observe` (an
    * `AggregatingAccumulator` filled during the sink job) — no second
    * count job per route. If `onBranch` runs no action (dry-run callers),
    * the observation is empty and one explicit count fills in. */
  def fanOut(df: DataFrame, routes: Seq[Route],
      onBranch: (String, DataFrame) => Unit,
      includeDefault: Boolean = true): Map[String, Long] = {
    val cached = df.persist()
    def run(name: String, branch0: DataFrame): (String, Long) = {
      val obs = org.apache.spark.sql.Observation(s"route_$name")
      val branch = branch0.observe(obs, count(lit(1)).as("n"))
      onBranch(name, branch)
      val n = org.apache.spark.sql.graft.ColumnLift.observedOrEmpty(obs).get("n") match {
        case Some(v: Long) => v
        case _ => branch0.count()
      }
      name -> n
    }
    try {
      val counts = routes.map(r => run(r.name, cached.filter(r.condition))).toMap
      val defCount = if (includeDefault) {
        val unrouted = routes.map(r => coalesce(r.condition, lit(false)))
          .reduceLeft(_ || _).unary_!
        Map(run(DefaultRoute, cached.filter(unrouted)))
      } else Map.empty[String, Long]
      counts ++ defCount
    } finally { cached.unpersist() }
  }

  /** Single-pass route tagging: adds `routes: array<string>` listing every
    * matching route — the shape used when downstream stages (not sinks)
    * need the routing decision. One projection, no fan-out. */
  def tag(df: DataFrame, routes: Seq[Route]): DataFrame = {
    val arr = array(routes.map(r =>
      when(coalesce(r.condition, lit(false)), lit(r.name)).otherwise(lit(null))): _*)
    df.withColumn("routes", filter(arr, c => c.isNotNull))
  }

  /** Tag-on-failure quarantine (the reference's DLQ/failure-pipeline
    * pattern, OpenSearchSink BulkRetryStrategy → dlq): split rows whose
    * `tags` array intersects `failTags` into a quarantine branch. */
  def quarantine(df: DataFrame, tagsCol: String, failTags: Seq[String])
      : (DataFrame, DataFrame) = {
    val bad = arrays_overlap(col(tagsCol), array(failTags.map(lit): _*))
    (df.filter(!coalesce(bad, lit(false))), df.filter(coalesce(bad, lit(false))))
  }
}
