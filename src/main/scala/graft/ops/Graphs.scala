package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph connectivity for near-duplicate clustering.
  *
  * Pair generators ([[Dedup.minHashNearDups]], [[Dedup.ngramJaccardPairs]],
  * [[Similarity.cosineNearDups]]) emit edges; a dedup pipeline then needs
  * the transitive closure — if A~B and B~C, one survivor for {A,B,C}, not
  * two independent pair decisions. The reference pipeline stops at
  * OpenSearch upserts (last-writer-wins per doc id,
  * /root/reference/data-prepper-plugins/opensearch/.../OpenSearchSink.java)
  * and has no cross-document closure; this operator is part of the
  * LLM-training-data tier the engine adds on top.
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
  * and Beyond", ACM SoCC 2014; public knowledge). Each round is two
  * keyed aggregations + two equi-joins (no all-pairs anywhere); the edge
  * set converges to disjoint stars centered at each component's minimum
  * node in O(log²) rounds (in practice < 10 on web-dup graphs, which are
  * mostly tiny cliques plus a few chains).
  *
  * At 100 TB: edge cardinality never grows across rounds (both operators
  * emit ≤ one edge per input edge, then distinct), every stage is a
  * keyed shuffle with map-side partial aggregation, and `localCheckpoint`
  * truncates the per-round lineage so round k's plan does not replay
  * rounds 0..k-1. Hub skew (the component minimum accumulates degree as
  * stars form) sits in `groupBy(u).agg(min)` — partial aggregation
  * collapses it map-side — and in the `join` on `u`, where AQE's skew
  * split applies; no group ever materializes a neighbor list.
  */
object Graphs {

  /** Min-label connected components over an undirected pair list.
    * Returns one row per node appearing in `pairs`:
    * (`id` long, `component` long) with `component` = the smallest node
    * id reachable from `id`. Deterministic; ids are compared as longs.
    * Throws if `maxIter` rounds do not converge (never silently wrong).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame = {
    var edges = pairs
      .select(col(aCol).cast("long").as("n1"), col(bCol).cast("long").as("n2"))
      .where(col("n1") =!= col("n2") && col("n1").isNotNull && col("n2").isNotNull)
      .select(greatest(col("n1"), col("n2")).as("u"),
        least(col("n1"), col("n2")).as("v"))
      .distinct()
      .localCheckpoint()

    var sig = edgeSig(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val nextSig = edgeSig(next)
      converged = nextSig == sig
      sig = nextSig
      edges = next
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds")
    // fixed point = disjoint stars (u -> componentMin): members from u,
    // roots appear only on the v side
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** Every document with its near-dup cluster id (= min doc id of its
    * component over `pairs`); documents in no pair are their own cluster.
    * Survivor selection is then `component = id`. */
  def nearDupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", "_cc_id")
    docs.select(col(idCol))
      .join(cc, col(idCol).cast("long") === col("_cc_id"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol).cast("long")).as("component"))
  }

  /** large-star: every neighbor v > u links to m = min(Γ(u) ∪ {u}).
    * Output edges are already (big, small)-oriented since m ≤ u < v. */
  private[graft] def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    nbrs.join(mins, "u")
      .where(col("v") > col("u") && col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** small-star on (big, small)-oriented edges: u and all its smaller
    * neighbors link to m = min neighbor. Orientation is preserved. */
  private[graft] def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("u").agg(min("v").as("m"))
    edges.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Cheap fixed-point signature: (count, Σ xxhash64(u,v), Σ v) — a
    * changed edge set matching all three is a ~2⁻¹²⁸ event, and a
    * collision only costs declaring convergence one round early on a set
    * with identical aggregate fingerprints. */
  private def edgeSig(e: DataFrame): (Long, Long, Long) = {
    val r = e.agg(count(lit(1)), sum(xxhash64(col("u"), col("v"))),
      sum(col("v"))).head()
    (r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2))
  }
}
