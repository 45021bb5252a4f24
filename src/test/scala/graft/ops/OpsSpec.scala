package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again today"), // near dup of 1
    (4L, "completely different content about spark query engines at scale"),
    (5L, "unrelated short text")).toDF("doc_id", "text")

  test("exact dedup keeps min id per hash, counts dups") {
    val g = Dedup.exact(docs, "doc_id", "text").collect()
    assert(g.length == 4)
    val dupGroup = g.find(_.getAs[Long]("dup_count") == 2).get
    assert(dupGroup.getAs[Long]("doc_id") == 1L)
    val survivors = Dedup.exactSurvivors(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(survivors.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    // banding tuned for the J≈0.57 near-dup pair: 32 bands × 2 rows gives
    // collision probability 1-(1-0.57²)³² ≈ 1-10⁻⁶ (16×4 would miss ~17%
    // of the time — LSH recall is a banding choice, not a coin flip)
    val pairs = Dedup.minHashNearDups(docs, "doc_id", "text", threshold = 0.5,
      shingleW = 3, bands = 32, rowsPerBand = 2)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "exact dup pair missed")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), "near dup pair missed")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "false positive")
  }

  test("duplicate spans: cross-doc windows flagged with positions") {
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "x y a b c d q"),
      (3L, "a b c d e f"), // exact dup of 1
      (4L, "nothing shared here at all")).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(d, "doc_id", "text", w = 4)
      .select("doc_id", "pos", "n_docs").as[(Long, Int, Long)].collect().toSet
    // "a b c d" in docs 1,2,3; every window of 1 and 3 is shared pairwise
    assert(got.contains((1L, 0, 3L)) && got.contains((2L, 2, 3L)) &&
      got.contains((3L, 0, 3L)))
    assert(got.contains((1L, 1, 2L)) && got.contains((1L, 2, 2L)))
    assert(!got.exists(_._1 == 4L))
    // doc shorter than w emits nothing
    val short = Dedup.duplicateSpans(
      Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text"), "doc_id", "text", w = 4)
    assert(short.count() == 0)
  }

  test("span removal drops exactly the flagged token ranges") {
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "x y a b c d q")).toDF("doc_id", "text")
    // default (Lee et al.): the min-id doc keeps the canonical occurrence
    val got = Dedup.removeDuplicateSpans(d, "doc_id", "text", w = 4)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a b c d e f", 2L -> "x y q"))
    // keepFirst = false: boilerplate scrubbing, no copy survives
    val all = Dedup.removeDuplicateSpans(d, "doc_id", "text", w = 4,
      keepFirst = false)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(all == Map(1L -> "e f", 2L -> "x y q"))
    // no duplicates -> text survives token-normalized
    val clean = Dedup.removeDuplicateSpans(
      Seq((1L, "Only, one. DOC here!")).toDF("doc_id", "text"),
      "doc_id", "text", w = 2)
      .select("clean_text").as[String].collect()(0)
    assert(clean == "only one doc here")
  }

  test("minhash signature approximates jaccard") {
    // identical texts → identical signatures
    val sigs = docs.select($"doc_id",
      Dedup.minHashSignature(Dedup.shingleHashes($"text", 3), 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val sim13 = sigs(1L).zip(sigs(3L)).count(p => p._1 == p._2) / 64.0
    val sim14 = sigs(1L).zip(sigs(4L)).count(p => p._1 == p._2) / 64.0
    assert(sim13 > 0.4, s"near-dup minhash sim too low: $sim13")
    assert(sim14 < 0.2, s"unrelated minhash sim too high: $sim14")
  }

  test("simhash near-dups by hamming distance") {
    val pairs = Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 16)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 5L))
  }

  test("exact n-gram jaccard values") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, threshold = 0.1)
      .collect().map(r => ((r.getAs[Long]("idA"), r.getAs[Long]("idB")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs(((1L, 2L))) == 1.0)
    assert(pairs.get((1L, 3L)).exists(j => j > 0.3 && j < 1.0))
  }

  test("hot shingles above the df cap leave the jaccard universe") {
    // four docs share exactly one boilerplate shingle; with the cap below
    // its df the quadratic pair group disappears (VERDICT r1 #3)
    val d = Seq(
      (1L, "common boiler plate alpha beta"),
      (2L, "common boiler plate gamma delta"),
      (3L, "common boiler plate epsilon zeta"),
      (4L, "common boiler plate eta theta")).toDF("doc_id", "text")
    val loose = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.0,
      maxShingleDf = 10).collect()
    assert(loose.length == 6) // all pairs share the one hot shingle
    assert(loose.forall(_.getAs[Double]("jaccard") == 0.2)) // 1/(3+3-1)
    val capped = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.0,
      maxShingleDf = 3)
    assert(capped.count() == 0)
  }

  test("simhash candidate generation: EXACT recall vs brute force at radius 6") {
    // r1's 4×16-bit banks only guaranteed radius 3; the gate asks for 6.
    // 100 base docs × 3 mutated variants → many pairs in the 1-10 hamming
    // band; the banked join must equal the brute-force hamming join.
    val rng = new graft.util.SplitMix64(11L)
    val base = (0 until 100).map(_ =>
      Array.fill(30)(s"w${rng.nextInt(60)}"))
    val texts = base.zipWithIndex.flatMap { case (words, i) =>
      (0 until 3).map { v =>
        val w = words.clone()
        if (v > 0) w(rng.nextInt(w.length)) = s"m${rng.nextInt(60)}"
        ((i * 3 + v).toLong, w.mkString(" "))
      }
    }
    val df = texts.toDF("doc_id", "text")
    val sigs = df.select($"doc_id", Dedup.simHash($"text").as("sim"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 6
    } yield (a, b)).toSet
    assert(brute.nonEmpty, "fixture produced no close pairs — weak test")
    val banked = Dedup.simHashNearDups(df, "doc_id", "text", maxHamming = 6)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(banked == brute,
      s"banked missed ${(brute -- banked).size}, extra ${(banked -- brute).size}")
  }

  test("simhash md5 token-hash mode: DuckDB-identical hash bits, same recall") {
    // the md5 mode's per-token hash must equal
    // ('0x' || substr(md5(t), 1, 16))::UBIGINT — pin one known value
    // (md5('hello') = 5d41402abc4b2a76..., first 8 bytes BE below)
    val one = Seq((1L, "hello")).toDF("doc_id", "text")
      .select(Dedup.simHash($"text", tokenHash = "md5")).as[Long].head()
    // single token => signature bits == hash bits
    assert(one == 6719722671305337462L)
    // the banked join under md5 mode finds a near pair at its exact radius
    val docs2 = Seq(
      (1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i k"),
      (3L, "q r s t u v w x y z")).toDF("doc_id", "text")
    val sigs = docs2.select($"doc_id", Dedup.simHash($"text", "md5").as("s"))
      .as[(Long, Long)].collect().toMap
    val ham12 = java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    assert(ham12 <= 31, s"fixture unexpectedly far apart ($ham12)")
    val pairs = Dedup.simHashNearDups(docs2, "doc_id", "text",
        maxHamming = ham12, tokenHash = "md5")
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    intercept[IllegalArgumentException](Dedup.simHash($"text", "sha9000"))
  }

  test("dedupLines removes corpus-frequent lines, keeps order, survives full-ban") {
    import spark.implicits._
    // footer in all 6 docs, header in 3, body unique per doc
    val d = (1 to 6).map { i =>
      val header = if (i <= 3) "shared header" else s"rare header $i"
      (i.toLong, s"$header\nbody line $i\n\ncommon footer")
    }.toDF("doc_id", "text")
    val out = Dedup.dedupLines(d, "doc_id", "text", maxDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 6)
    // doc 1: shared header (3 docs > 2) and footer (6 > 2) banned;
    // blank line survives (exempt)
    assert(out(0).getAs[String]("text_dedup") == "body line 1\n")
    assert(out(0).getAs[Long]("n_lines_removed") == 2L)
    // doc 4: rare header survives
    assert(out(3).getAs[String]("text_dedup") == "rare header 4\nbody line 4\n")
    assert(out(3).getAs[Long]("n_lines_kept") == 3L)
  }

  test("dedupLines: document whose every line is banned survives as empty") {
    import spark.implicits._
    val d = ((1 to 5).map(i => (i.toLong, "only line")) :+ (9L, "keep me"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLines(d, "doc_id", "text", maxDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 6)
    assert(out(0).getAs[String]("text_dedup") == "")
    assert(out(0).getAs[Long]("n_lines_kept") == 0L)
    assert(out(5).getAs[String]("text_dedup") == "keep me")
  }

  test("dedupLines counts DISTINCT docs: in-doc repetition does not ban") {
    import spark.implicits._
    val d = Seq((1L, "x\nx\nx\nx"), (2L, "y")).toDF("doc_id", "text")
    val out = Dedup.dedupLines(d, "doc_id", "text", maxDocs = 1)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_dedup") == "x\nx\nx\nx")
  }
}

class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vecs = {
    val rng = new graft.util.SplitMix64(5L)
    (0 until 200).map { i =>
      (i.toLong, Array.fill(8)((rng.nextDouble() * 2 - 1).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }
  private val query = Seq(0.5, -0.25, 0.8, 0.1, -0.6, 0.3, 0.0, 0.9)

  test("cosine column matches scala computation") {
    val got = vecs.where($"vec_id" === 0)
      .select(Similarity.cosine($"embedding", array(query.map(lit): _*)))
      .as[Double].head()
    val v = vecs.where($"vec_id" === 0).select($"embedding").as[Seq[Float]].head()
    val dot = v.map(_.toDouble).zip(query).map { case (a, b) => a * b }.sum
    val exp = dot / (math.sqrt(v.map(x => x.toDouble * x).sum) *
      math.sqrt(query.map(x => x * x).sum))
    assert(math.abs(got - exp) < 1e-12)
  }

  test("brute-force top-k is exact and ordered") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", query, 10)
      .as[(Long, Double)].collect()
    assert(top.length == 10)
    assert(top.map(_._2).sameElements(top.map(_._2).sorted(Ordering[Double].reverse)))
  }

  test("LSH top-k with full multi-probe recall covers brute-force head") {
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", query, 5)
      .as[(Long, Double)].collect().map(_._1).toSet
    val lsh = Similarity.lshTopK(vecs, "vec_id", "embedding", query, 20,
      bits = 4, probeHamming = 4) // probe all buckets → exact
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(brute.subsetOf(lsh), s"LSH missed ${brute -- lsh}")
  }

  test("IVF top-k recall with generous nprobe") {
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", query, 5)
      .as[(Long, Double)].collect().map(_._1).toSet
    val (assigned, centroids) = Similarity.ivfAssign(vecs, "embedding", 4)
    val ivf = Similarity.ivfTopK(assigned, centroids, "vec_id", "embedding",
      query, 5, nprobe = 4) // probe all → exact
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(brute == ivf)
  }

  test("IVF sampled fit: tiny deterministic train sample still partitions the space") {
    // the 100-TB path: fit on a hash-ordered sample, assign full data.
    // With nprobe = k the query is exact regardless of centroid quality;
    // the sample-fit must (a) assign EVERY row, (b) keep assignment
    // deterministic across invocations.
    val (a1, c1) = Similarity.ivfAssign(vecs, "embedding", 4, fitSample = 8)
    val (a2, c2) = Similarity.ivfAssign(vecs, "embedding", 4, fitSample = 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(a1.filter($"_cluster".isNull || $"_cluster" < 0 || $"_cluster" >= 4).count() == 0)
    assert(a1.count() == vecs.count())
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", query, 5)
      .as[(Long, Double)].collect().map(_._1).toSet
    val ivf = Similarity.ivfTopK(a1, c1, "vec_id", "embedding", query, 5, nprobe = 4)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(brute == ivf)
  }

  test("cosine near-dup pairs find planted duplicates") {
    val planted = vecs.union(
      vecs.where($"vec_id" < 3).withColumn("vec_id", $"vec_id" + 1000))
    val dups = Similarity.cosineNearDups(planted, "vec_id", "embedding",
      threshold = 0.999, bits = 3)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    (0 until 3).foreach { i =>
      assert(dups.contains((i.toLong, i + 1000L)), s"missed planted dup $i")
    }
  }

  test("cosine near-dups: probe=bits is exactly the brute-force pair set") {
    val a = vecs.as("a")
    val b = vecs.as("b")
    val brute = a.join(b, $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("idA"), $"b.vec_id".as("idB"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("cosine"))
      .where($"cosine" >= 0.2)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    // exhaustive probing ≡ brute force: proves mask probing + the
    // one-mask-per-pair join produce neither misses nor duplicates
    val bits = 3
    val probed = Similarity.cosineNearDups(vecs, "vec_id", "embedding",
      threshold = 0.2, bits = bits, probeHamming = bits)
    val pairs = probed.select("idA", "idB").as[(Long, Long)].collect()
    assert(pairs.length == pairs.toSet.size, "duplicate pairs from probing")
    assert(pairs.toSet == brute)
    // monotone recall in probeHamming
    val p0 = Similarity.cosineNearDups(vecs, "vec_id", "embedding",
      threshold = 0.2, bits = bits, probeHamming = 0)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val p1 = Similarity.cosineNearDups(vecs, "vec_id", "embedding",
      threshold = 0.2, bits = bits, probeHamming = 1)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(p0.subsetOf(p1) && p1.subsetOf(brute))
  }

  test("semDedup: one cluster ≡ brute keep-lowest-id; clusters bound the pair space") {
    val bruteDups = vecs.as("a").join(vecs.as("b"), $"a.vec_id" < $"b.vec_id")
      .where(Similarity.cosine($"a.embedding", $"b.embedding") >= 0.2)
      .select($"b.vec_id").as[Long].collect().toSet
    // one cluster = every pair examined → exactly the brute rule
    val one = Dedup.semDedup(vecs, "vec_id", "embedding",
      Array(Array.fill(8)(0.1)), threshold = 0.2)
    assert(one.where($"is_dup").select("vec_id").as[Long].collect().toSet
      == bruteDups)
    assert(one.count() == 200 && one.select("cluster").distinct().count() == 1)
    // four clusters: flagged set ⊆ brute (cross-cluster pairs skipped by
    // design), and every flagged row has a lower-id partner ≥ t IN ITS
    // OWN cluster
    val rng = new graft.util.SplitMix64(9L)
    val cents = Array.fill(4)(Array.fill(8)(rng.nextDouble() * 2 - 1))
    val four = Dedup.semDedup(vecs, "vec_id", "embedding", cents, 0.2)
    val flagged = four.where($"is_dup").select("vec_id").as[Long].collect().toSet
    assert(flagged.nonEmpty && flagged.subsetOf(bruteDups))
    val byCluster = four.select("vec_id", "cluster").as[(Long, Int)]
      .collect().toMap
    val vecsLocal = vecs.as[(Long, Seq[Float])].collect().toMap
    def cosL(x: Seq[Float], y: Seq[Float]): Double = {
      val d = x.zip(y).map { case (a, b) => a.toDouble * b }.sum
      d / (math.sqrt(x.map(a => a.toDouble * a).sum) *
        math.sqrt(y.map(a => a.toDouble * a).sum))
    }
    flagged.foreach { b =>
      val ok = byCluster.exists { case (a, c) =>
        a < b && c == byCluster(b) && cosL(vecsLocal(a), vecsLocal(b)) >= 0.2 - 1e-9
      }
      assert(ok, s"flagged $b has no same-cluster lower-id partner")
    }
  }

  test("pqEncode/pqTopK: codeword-built vectors recover their codes; ADC = exact") {
    import spark.implicits._
    val cbs = Array.tabulate(2) { m =>
      Array.tabulate(4) { j =>
        Array.tabulate(3)(i => (m + 1) * (j + 1) * (i + 1) * 0.25)
      }
    } // 2 subspaces x 4 codewords x 3 dims
    val rows = (for (j0 <- 0 until 4; j1 <- 0 until 4) yield {
      val v = (cbs(0)(j0) ++ cbs(1)(j1)).map(_.toFloat)
      ((j0 * 4 + j1).toLong, v, j0, j1)
    }).toSeq
    val df = rows.map(r => (r._1, r._2)).toDF("vec_id", "embedding")
    val coded = graft.ops.Similarity.pqEncode(df, "embedding", cbs)
      .select($"vec_id", $"pq_code").as[(Long, Seq[Int])].collect()
      .toMap
    rows.foreach { case (id, _, j0, j1) =>
      assert(coded(id) == Seq(j0, j1), s"vec $id: got ${coded(id)}")
    }
    // ADC distance to a query equals the exact squared distance to the
    // reconstruction (which IS the vector here, up to float rounding)
    val q = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6)
    val encoded = graft.ops.Similarity.pqEncode(df, "embedding", cbs)
    val top = graft.ops.Similarity.pqTopK(encoded, "vec_id", "pq_code",
      q, cbs, k = 16).as[(Long, Double)].collect().toMap
    rows.foreach { case (id, v, _, _) =>
      val exact = v.map(_.toDouble).zip(q).map { case (x, y) =>
        (x - y) * (x - y) }.sum
      assert(math.abs(top(id) - exact) < 1e-2, s"vec $id: ${top(id)} vs $exact")
    }
  }

  test("ivfPq: constructed vectors recover (cluster, codes); ADC = exact") {
    import spark.implicits._
    // 2 far-apart coarse centroids; vectors = centroid + small codeword
    // concat, so coarse cosine assignment and residual PQ are both exact
    val cents = Array(
      Array(10.0, 10.0, 10.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 10.0, 10.0, 10.0))
    val cbs = Array.tabulate(2) { m =>
      Array.tabulate(3) { j =>
        Array.tabulate(3)(i => (m + 1) * (j + 1) * (i + 1) * 0.05)
      }
    }
    val rows = for (c <- 0 until 2; j0 <- 0 until 3; j1 <- 0 until 3) yield {
      val v = cents(c).zip(cbs(0)(j0) ++ cbs(1)(j1)).map { case (a, b) => a + b }
      ((c * 9 + j0 * 3 + j1).toLong, v.map(_.toFloat), c, j0, j1)
    }
    val df = rows.map(r => (r._1, r._2)).toDF("vec_id", "embedding")
    val coded = graft.ops.Similarity.ivfPqEncode(df, "embedding", cents, cbs)
    val got = coded.select($"vec_id", $"_cluster", $"pq_code")
      .as[(Long, Int, Seq[Int])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    rows.foreach { case (id, _, c, j0, j1) =>
      assert(got(id) == ((c, Seq(j0, j1))), s"vec $id: ${got(id)}")
    }
    // ADC within the probed cluster equals the exact squared distance to
    // the vector (reconstruction is exact here, up to float rounding)
    val q = Seq(9.0, 10.0, 11.0, 0.5, -0.5, 0.0)
    val top = graft.ops.Similarity.ivfPqTopK(coded, "vec_id", "pq_code",
      q, cents, cbs, k = 18, nprobe = 2).as[(Long, Double)].collect().toMap
    rows.foreach { case (id, v, _, _, _) =>
      val exact = v.map(_.toDouble).zip(q).map { case (x, y) =>
        (x - y) * (x - y) }.sum
      assert(math.abs(top(id) - exact) < 1e-2, s"vec $id: ${top(id)} vs $exact")
    }
  }

  test("pq codes are deterministic under repartitioning and in range") {
    import spark.implicits._
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cbs = Array.tabulate(4) { m =>
      Array.tabulate(8) { j =>
        Array.tabulate(16)(i => ((m * 31 + j * 7 + i) % 11 - 5) / 5.0)
      }
    }
    def codes(n: Int) = graft.ops.Similarity.pqEncode(
      emb.repartition(n), "embedding", cbs)
      .orderBy("vec_id").select("pq_code").as[Seq[Int]].collect().toSeq
    val c1 = codes(1)
    assert(c1 == codes(8))
    assert(c1.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
  }

}

class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("language id picks marker-dominant language") {
    val d = Seq(
      (1L, "the cat and the dog of the house is in the garden"),
      (2L, "der hund und die katze ist nicht ein problem mit der sache"),
      (3L, "le chat est dans la maison et la porte pour le jardin"),
      (4L, "zzz qqq xxx yyy www vvv")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(d, "text").orderBy("doc_id")
      .select("lang_pred").as[String].collect()
    assert(got.sameElements(Array("en", "de", "fr", "und")))
  }

  test("quality score components are deterministic and bounded") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "1234 5678 90 12 34 56"),
      (3L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityScore(d, "text").orderBy("doc_id").collect()
    val q1 = rows(0).getAs[Double]("quality_score")
    val q2 = rows(1).getAs[Double]("quality_score")
    assert(q1 > q2, "clean prose must outscore digit noise")
    rows.foreach { r =>
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("token counts: whitespace and bpe-ish") {
    val d = Seq((1L, "Hello, world! x2")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(d, "text").head()
    assert(r.getAs[Long]("ws_tokens") == 3)
    // Hello , world ! x2 → [Hello][,][world][!][x][2]
    assert(r.getAs[Long]("bpe_tokens") == 6)
  }

  test("fingerprint is order-sensitive and stable") {
    val d = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(d, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("fingerprint md5 mode matches the SQL-reproducible fold exactly") {
    val d = Seq((1L, "hello world abc"), (2L, "")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(d, "doc_id", "text", tokenHash = "md5")
      .as[(Long, Long)].collect().toMap
    // pinned against the DuckDB list_reduce form over
    // ('0x'||substr(md5(t),1,16))::UBIGINT with wrapping 64-bit multiply
    assert(fp(1L) == 5920778325586184407L)
    assert(fp(2L) == -3750763034362895579L) // empty doc = FNV offset basis
  }
}

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("feature extraction schema, determinism across partitionings") {
    val m1 = Multimodal.synthesize(spark, 100).repartition(1)
    val m8 = Multimodal.synthesize(spark, 100).repartition(8)
    def feats(ds: org.apache.spark.sql.Dataset[Multimodal.MediaRow]) =
      Multimodal.extractFeatures(ds, featDim = 8).collect()
        .map(f => f.media_id -> f.features.toSeq).toMap
    val a = feats(m1)
    val b = feats(m8)
    assert(a == b, "features must not depend on partitioning")
    assert(a.values.forall(_.length == 8))
  }

  test("frame sampling is a deterministic stride") {
    val frames = Multimodal.sampleFrames(Multimodal.synthesize(spark, 50).toDF(), 30)
    val byId = frames.select("media_id", "n_frames", "frame_idx")
      .as[(Long, Int, Int)].collect().groupBy(_._1)
    byId.values.foreach { rows =>
      val n = rows.head._2
      val idxs = rows.map(_._3).sorted.toSeq
      assert(idxs == (0 until n by 30).toSeq)
    }
  }

}
