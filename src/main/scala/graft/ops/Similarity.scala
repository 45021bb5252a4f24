package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor similarity search over an embedding column
  * (`array<float>`).
  *
  * Three tiers:
  *   brute-force — exact cosine top-k, pure higher-order-function math
  *                 (zip_with + aggregate, codegen'd; no UDF): the oracle,
  *                 and still the right plan below ~10^7 rows because it is
  *                 one scan with no shuffle.
  *   LSH         — random-hyperplane signatures; query probes its own
  *                 bucket (and optional multi-probe neighbors). Scale path:
  *                 the scan reduces to one bucket ≈ n/2^bits rows.
  *   IVF         — k-means coarse quantizer (Spark ML), query probes the
  *                 `nprobe` nearest centroids. The 10^12-row layout:
  *                 partitionBy(cluster) at write time → partition pruning
  *                 turns a full scan into nprobe directory reads.
  */
object Similarity {

  /** dot(a, b) over array<float|double> columns in double precision —
    * native codegen'd expression ([[graft.functions.VecDot]]); arithmetic
    * identical to the HOF `aggregate(zip_with(...))` form it replaced. */
  def dot(a: Column, b: Column): Column = graft.functions.VecMath.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b); 0 for zero-norm vectors. One fused codegen'd pass
    * ([[graft.functions.VecCosine]]) — the pair-verify hot path. */
  def cosine(a: Column, b: Column): Column = graft.functions.VecMath.cosine(a, b)

  /** Exact cosine top-k against one query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes: `bits` vectors of dimension `dim`,
    * components in {-1, +1} from the seeded PRNG (sign-random-projection —
    * Charikar '02 SimHash for angles). */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(bits) { b =>
      val rng = graft.util.SplitMix64.stream(seed, 1000L + b)
      Array.fill(dim)(if (rng.nextLong() < 0) -1.0 else 1.0)
    }

  /** LSH bucket id column: sign bit per hyperplane, packed into a long. */
  def lshBucket(vecCol: Column, planes: Array[Array[Double]]): Column = {
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      val pc = array(p.map(lit): _*)
      when(dot(vecCol, pc) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduceLeft(_ + _)
  }

  /** ANN top-k via LSH: probe the query's bucket plus all buckets within
    * `probeHamming` bit flips (multi-probe improves recall without touching
    * more than a sliver of the table). Exact cosine within the probed rows. */
  /** @param roundCosineTo when set, ranks by the cosine ROUNDED to that
    *                       many decimals (with id tie-break) — cross-engine
    *                       oracle gates use it so sub-1e-n float noise can
    *                       never flip ranks between engines. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, bits: Int = 8, probeHamming: Int = 1,
      seed: Long = 42L, roundCosineTo: Option[Int] = None): DataFrame = {
    val dim = query.length
    val planes = hyperplanes(dim, bits, seed)
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d >= 0.0) 1L << i else 0L
    }.sum
    // all buckets within `probeHamming` bit flips of the query bucket
    // (bits is small — ≤ ~20 — so enumerating 2^bits masks is cheap)
    val probes: Seq[Long] =
      (0L until (1L << bits))
        .filter(mask => java.lang.Long.bitCount(mask) <= probeHamming)
        .map(mask => qBucket ^ mask)
    val bucketed = df.withColumn("_bucket", lshBucket(col(vecCol), planes))
    val raw = cosine(col(vecCol), array(query.map(lit): _*))
    val scored = roundCosineTo.fold(raw)(d => round(raw, d))
    bucketed.filter(col("_bucket").isin(probes: _*))
      .select(col(idCol), scored.as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** IVF index: k-means coarse assignment. Returns (df + `_cluster`,
    * centroids). Deterministic via fixed seed.
    *
    * Scale shape: the k-means FIT runs on a deterministic hash-ordered
    * sample of at most `fitSample` vectors (centroid quality converges
    * long before corpus size — FAISS trains IVF on 30-256 points per
    * centroid); ASSIGNMENT stays a full-data map-side transform. Training
    * on 10^12 vectors would iterate whole-corpus Spark jobs per k-means
    * round for no quality gain. `fitSample = 0` forces full-data fit
    * (used by the spec to pin sampled ≡ full on under-sample-size data).
    */
  def ivfAssign(df: DataFrame, vecCol: String, nClusters: Int,
      seed: Long = 42L, fitSample: Int = 262144): (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featurized = df.withColumn("_features", array_to_vector(col(vecCol).cast("array<double>")))
    // deterministic, partitioning-invariant sample: best `fitSample` rows
    // by xxhash64 of the vector bytes (the Rcf.fit pattern) — TakeOrdered,
    // no global sort
    val trainSet =
      if (fitSample <= 0) featurized
      else featurized.select(col("_features"),
          xxhash64(to_json(struct(col(vecCol)))).as("_h"))
        .orderBy("_h").limit(fitSample).drop("_h")
    val model = new KMeans().setK(nClusters).setSeed(seed)
      .setFeaturesCol("_features").setPredictionCol("_cluster")
      .fit(trainSet)
    val assigned = model.transform(featurized).drop("_features")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** Assign every vector to the nearest of FIXED centroids by rounded
    * cosine (ties → lowest index) — the 100-TB assignment path once a
    * quantizer exists (sampled k-means fit, or any external codebook): a
    * pure codegen'd projection, no ML runtime, no shuffle; at write time
    * `partitionBy("_cluster")` makes [[ivfTopK]]'s probe filter partition
    * pruning. Rounding to 6 decimals pins the argmax across engines (the
    * DuckDB oracle for q_ann_ivf_fixed replays this assignment exactly).
    *
    * Codebook-size boundary: the argmax is one expression per centroid, so
    * this path suits coarse quantizers up to a few hundred centroids
    * (beyond that the generated code outgrows codegen limits); a
    * thousands-wide codebook belongs behind the [[graft.ops.Inference]]
    * `BatchModel`-style partition kernel with the codebook broadcast. */
  def ivfAssignTo(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty && centroids.length <= 512,
      s"expression-path codebook must be 1..512 centroids, got ${centroids.length}")
    val scored = centroids.indices.map { i =>
      struct(
        round(cosine(col(vecCol), array(centroids(i).map(lit): _*)), 6).as("s"),
        lit(-i).as("ni")) // struct max = lexicographic: best s, LOWEST index
    }
    df.withColumn("_cluster", (-array_max(array(scored: _*))("ni")).cast("int"))
  }

  /** IVF query: exact cosine within the `nprobe` centroids nearest to the
    * query. With cluster-partitioned storage this is partition pruning. */
  def ivfTopK(assigned: DataFrame, centroids: Array[Array[Double]],
      idCol: String, vecCol: String, query: Seq[Double], k: Int,
      nprobe: Int = 4, roundCosineTo: Option[Int] = None): DataFrame = {
    def cos(a: Array[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val probed = centroids.zipWithIndex
      .sortBy { case (c, i) => (-cos(c, query), i) }
      .take(nprobe).map(_._2.toLong)
    val raw = cosine(col(vecCol), array(query.map(lit): _*))
    // rank on the ROUNDED score when requested (cross-engine rank
    // stability — sub-1e-k noise can't flip the oracle's ordering)
    val scored = roundCosineTo.fold(raw)(d => round(raw, d))
    assigned.filter(col("_cluster").isin(probed: _*))
      .select(col(idCol), scored.as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs (the embedding tier of dedup):
    * bucket by random-hyperplane LSH, pair only within buckets, verify
    * exact cosine ≥ threshold.
    *
    * Contract — APPROXIMATE RECALL, exact precision: the cosine filter is
    * computed on the true vectors, so every returned pair is real; but a
    * qualifying pair is only FOUND if its buckets collide. Each hyperplane
    * separates a pair with p = arccos(cos)/π, so
    * `P(found) = Σ_{d ≤ probeHamming} C(bits,d) p^d (1-p)^(bits-d)`
    * (= `(1-p)^bits` at probeHamming 0) — recall → 1 as cosine → 1, and is
    * LOW near weak thresholds: measured 38% at threshold 0.3 / bits 2 /
    * probe 0 on the sf0.01 random-embedding fixture, ~84% with probe 1.
    * Raise recall with `probeHamming` (each +1 multiplies one join side by
    * C(bits,·) and relaxes the bucket match by one bit) or fewer bits
    * (bigger buckets); probeHamming = bits is exact-but-brute-force. For
    * REAL near-dup corpora (cosine ≥ 0.9, p ≤ 0.14) the defaults find
    * ≥ (1-p)^8 ≈ 0.3… use probe 2-3 there. Genuinely-exact thresholded
    * pair joins have no sub-quadratic algorithm for dense vectors; this
    * trade is the scale path, [[bruteTopK]] the small-scale truth. */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 8, probeHamming: Int = 0,
      seed: Long = 42L): DataFrame = {
    require(bits <= 20, s"2^$bits probe masks — keep bits <= 20")
    val first = df.select(size(col(vecCol))).head().getInt(0)
    val planes = hyperplanes(first, bits, seed)
    val bucketed = df.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), planes).as("_bucket"))
    // one side probes every bucket within hamming <= probeHamming: a pair
    // with bucket distance d joins for exactly ONE mask (m = bA xor bB),
    // so no distinct is needed
    val masks = (0 until (1 << bits))
      .filter(m => Integer.bitCount(m) <= probeHamming)
    val a = bucketed.select(col(idCol), col(vecCol),
      explode(array(masks.map(m =>
        col("_bucket").bitwiseXOR(lit(m.toLong))): _*)).as("_probe")).as("a")
    val b = bucketed.as("b")
    a.join(b, col("a._probe") === col("b._bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("idA"), col(s"b.$idCol").as("idB"),
        cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ------------------------------------------- product quantization (PQ)

  /** PQ encode (Jégou, Douze & Schmid 2011, "Product quantization for
    * nearest neighbor search" — the FAISS IVF-PQ standard): the vector
    * splits into M contiguous subspaces; each sub-vector is replaced by
    * the index of its nearest sub-codeword (squared L2, computed as
    * x·x − 2·x·c + |c|² so every term is a codegen'd [[dot]] and the
    * DuckDB oracle can replay the identical arithmetic). A 64-float
    * embedding becomes M small ints — 64× smaller at M=4/k=8 — and the
    * whole encode is ONE projection over the scan: at 10¹² vectors the
    * PQ-coded corpus fits where raw floats never would, and re-ranking
    * reads raw vectors only for the ADC top candidates.
    *
    * Argmin ties (same rounded distance) break to the LOWEST codeword
    * index, pinned cross-engine by rounding distances to 6 before
    * comparing (ivfAssignTo's convention).
    *
    * `codebooks(m)(j)` = codeword j of subspace m; all subspaces must
    * share the vector's dim / M as their width. Codebooks come from a
    * sampled k-means fit at scale (q_ann_ivf's trainer pattern); the
    * fixed-codebook form here is the assignment path, a pure map. */
  def pqEncode(df: DataFrame, vecCol: String,
      codebooks: Array[Array[Array[Double]]],
      codeCol: String = "pq_code"): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty))
    val dsub = codebooks(0)(0).length
    require(codebooks.forall(_.forall(_.length == dsub)),
      "ragged sub-codebooks")
    val codes = codebooks.zipWithIndex.map { case (cb, m) =>
      val sub = slice(col(vecCol), m * dsub + 1, dsub)
      val xx = dot(sub, sub)
      val scored = cb.zipWithIndex.map { case (c, j) =>
        val d = xx - lit(2.0) * dot(sub, array(c.map(lit): _*)) +
          lit(c.map(x => x * x).sum)
        struct(round(d, 6).as("d"), lit(j).as("ci"))
      }
      array_min(array(scored: _*))("ci")
    }
    df.withColumn(codeCol, array(codes: _*))
  }

  /** ADC (asymmetric distance computation) top-k over PQ codes: the query
    * builds one M×k lookup table of rounded sub-distances driver-side;
    * per row the distance estimate is M array lookups and a sum — no
    * vector arithmetic touches the corpus at query time. Returns
    * (idCol, est_dist) ranked ascending (rounded to 4; ties → id). */
  def pqTopK(encoded: DataFrame, idCol: String, codeCol: String,
      query: Seq[Double], codebooks: Array[Array[Array[Double]]],
      k: Int): DataFrame = {
    val dsub = codebooks(0)(0).length
    val luts = codebooks.zipWithIndex.map { case (cb, m) =>
      val qs = query.slice(m * dsub, (m + 1) * dsub)
      val qq = qs.map(x => x * x).sum
      cb.map { c =>
        val qc = qs.zip(c).map(p => p._1 * p._2).sum
        val c2 = c.map(x => x * x).sum
        // HALF_UP round-6, matching round() in Spark and DuckDB
        BigDecimal(qq - 2.0 * qc + c2)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    val est = luts.zipWithIndex.map { case (lut, m) =>
      element_at(array(lut.map(lit).toSeq: _*),
        element_at(col(codeCol), m + 1) + 1)
    }.reduce(_ + _)
    encoded
      .withColumn("est_dist", round(est, 4))
      .select(col(idCol), col("est_dist"))
      .orderBy(col("est_dist"), col(idCol))
      .limit(k)
  }

  // --------------------------------------------------------------- IVF-PQ

  /** IVF-PQ encode — the full FAISS-standard composition: coarse
    * assignment over the IVF centroids ([[ivfAssignTo]], so storage can
    * `partitionBy(_cluster)` and probing prunes partitions) + PQ codes of
    * the RESIDUAL (x − coarse centroid), which quantizes the small
    * within-cluster displacement instead of the whole vector — the
    * standard precision win. Output adds `_cluster` and `codeCol`.
    *
    * The residual is a zip_with projection (interpreted HOF, one pass) —
    * still a map over the scan, no shuffle anywhere in encode. */
  def ivfPqEncode(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      codeCol: String = "pq_code"): DataFrame = {
    val centArr = array(centroids.map(c => array(c.map(lit): _*)): _*)
    val resid = zip_with(col(vecCol),
      element_at(centArr, col("_cluster") + 1), (a, b) => a - b)
    pqEncode(
      ivfAssignTo(df, vecCol, centroids).withColumn("_resid", resid),
      "_resid", codebooks, codeCol)
      .drop("_resid")
  }

  /** IVF-PQ ADC top-k: probe the `nprobe` coarse clusters nearest the
    * query (ivfTopK's rounded-cosine order), and within each probed
    * cluster score rows against that cluster's OWN lookup table built on
    * the query residual (q − centroid) — per row still M lookups + a sum,
    * selected by a when-chain on `_cluster`. With cluster-partitioned
    * storage the filter is partition pruning; result traffic is k rows. */
  def ivfPqTopK(encoded: DataFrame, idCol: String, codeCol: String,
      query: Seq[Double], centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      k: Int, nprobe: Int = 2): DataFrame = {
    def cos(a: Array[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val probed = centroids.zipWithIndex
      .sortBy { case (c, i) => (-cos(c, query), i) }
      .take(nprobe).map(_._2)
    val dsub = codebooks(0)(0).length
    def lutsFor(ci: Int): Array[Array[Double]] = {
      val qr = query.zip(centroids(ci)).map { case (q, c) => q - c }
      codebooks.zipWithIndex.map { case (cb, m) =>
        val qs = qr.slice(m * dsub, (m + 1) * dsub)
        val qq = qs.map(x => x * x).sum
        cb.map { c =>
          val qc = qs.zip(c).map(p => p._1 * p._2).sum
          val c2 = c.map(x => x * x).sum
          BigDecimal(qq - 2.0 * qc + c2)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
    }
    def estFor(ci: Int): Column = lutsFor(ci).zipWithIndex.map {
      case (lut, m) => element_at(array(lut.map(lit).toSeq: _*),
        element_at(col(codeCol), m + 1) + 1)
    }.reduce(_ + _)
    val est = probed.tail.foldLeft(
      when(col("_cluster") === probed.head, estFor(probed.head))) {
      (acc, ci) => acc.when(col("_cluster") === ci, estFor(ci))
    }
    encoded.filter(col("_cluster").isin(probed.map(_.toLong): _*))
      .withColumn("est_dist", round(est, 4))
      .select(col(idCol), col("est_dist"))
      .orderBy(col("est_dist"), col(idCol))
      .limit(k)
  }
}
