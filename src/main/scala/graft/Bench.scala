package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.corpus.{Page, SyntheticCorpus}
import graft.index.{IndexBuilder, IndexParams}
import graft.query.IndexReader

/** Benchmark main (driver contract): one JSON line on stdout.
  *
  * Measures, in order:
  *  1. north-rule indexing throughput (docs/s) for the full pipeline
  *     (read → extract+verify → tokenize → stats → SPIMI postings) at
  *     local[8] and local[32] over the SAME generated corpus — the
  *     sandbox stand-in for the N-vs-4N-executor scaling rule; reports
  *     both throughputs and efficiency = (T8/T32)/4.
  *  2. top-k query p95 latency (ms) over the 50-query fixture set against
  *     the built index (warm serving path, Block-Max WAND).
  *  3. headline operator queries from SparkEntry on SPARK_GRAFT_SF_DIR.
  *
  * Also rewrites BENCH.md with the human-readable scaling table.
  */
object Bench {

  private val HeadlineQueries = Seq(
    "q_tokenize", "q_term_stats", "q_bm25_topk", "q_bm25_topk_stopheavy",
    "q_dedup_exact", "q_minhash_neardups", "q_simhash_neardups",
    "q_ngram_jaccard", "q_ann_brute", "q_ann_lsh", "q_agg_count",
    "q_quality_score", "q_token_counts", "q_lang_id")

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "60000").toLong
    val work = Files.createTempDirectory("graft-bench").toString

    // --- corpus generation (untimed; one-off fixture) ---
    var spark = newSession(32)
    val corpusPath = s"$work/corpus"
    SyntheticCorpus.generate(spark, benchDocs, seed = 42L, partitions = 64)
      .write.parquet(corpusPath)
    spark.stop()

    // --- indexing throughput at two parallelism levels ---
    def buildAt(cores: Int): Double = {
      val s = newSession(cores)
      import s.implicits._
      val pages = s.read.parquet(corpusPath).as[Page]
      val t0 = System.nanoTime()
      new IndexBuilder(s, s"$work/index-$cores",
        IndexParams(buckets = 16, shardSize = 8192, blockSize = 128,
          buildPartitions = cores * 2))
        .build(pages, s"bench(n=$benchDocs)")
      val sec = (System.nanoTime() - t0) / 1e9
      s.stop()
      sec
    }
    val t8 = buildAt(8)
    val t32 = buildAt(32)
    val thr8 = benchDocs / t8
    val thr32 = benchDocs / t32
    val efficiency = (t8 / t32) / 4.0

    // --- query p95 latency over the fixture query set (warm, k=10) ---
    spark = newSession(32)
    val reader = new IndexReader(spark, s"$work/index-32")
    val queries = SyntheticCorpus.querySet()
    val cache = reader.loadCache(queries.flatten.distinct)
    // warmup
    queries.foreach(q => reader.topKLocal(cache, q, 10))
    val lat = new Array[Double](queries.size * 4)
    var li = 0
    (0 until 4).foreach { _ =>
      queries.foreach { q =>
        val t0 = System.nanoTime()
        reader.topKLocal(cache, q, 10)
        lat(li) = (System.nanoTime() - t0) / 1e6
        li += 1
      }
    }
    java.util.Arrays.sort(lat)
    val p50 = lat((lat.length * 0.50).toInt)
    val p95 = lat((lat.length * 0.95).toInt)

    // --- headline operator queries on the driver testdata ---
    val results = HeadlineQueries.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }
    spark.stop()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum

    writeBenchMd(benchDocs, t8, t32, thr8, thr32, efficiency, p50, p95)

    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","index_docs":$benchDocs,"index_sec_local8":${f"$t8%.2f"},"index_sec_local32":${f"$t32%.2f"},"index_docs_per_sec_local8":${f"$thr8%.1f"},"index_docs_per_sec_local32":${f"$thr32%.1f"},"scaling_efficiency_8_to_32":${f"$efficiency%.3f"},"query_p50_ms":${f"$p50%.2f"},"query_p95_ms":${f"$p95%.2f"}}""")
  }

  private def writeBenchMd(n: Long, t8: Double, t32: Double, thr8: Double,
      thr32: Double, eff: Double, p50: Double, p95: Double): Unit = {
    val md =
      s"""# BENCH — measured (sandbox, this round)
         |
         |North-rule scaling evidence (no real cluster in sandbox): the SAME
         |index build (read → extract+byte-identity verify → tokenize →
         |stats → SPIMI postings, $n docs) run at two parallelism levels in
         |one machine, per BASELINE.md's stand-in definition.
         |
         || parallelism | wall (s) | docs/s |
         ||---|---|---|
         || local[8]  (N)  | ${f"$t8%.2f"} | ${f"$thr8%.1f"} |
         || local[32] (4N) | ${f"$t32%.2f"} | ${f"$thr32%.1f"} |
         |
         |Scaling efficiency (T8/T32)/4 = **${f"$eff%.3f"}** (target >= 0.8).
         |
         |Query latency over the 50-query fixture set (Block-Max WAND,
         |k=10, warm serving path): p50 = ${f"$p50%.2f"} ms, p95 = ${f"$p95%.2f"} ms.
         |
         |Reference baseline for context: Data Prepper 1.3 ingest pipeline
         |sustains ~19.7k events/s on 4 vCPUs (~4.9k events/s/vCPU) —
         |BASELINE.md. Our per-core indexing throughput is
         |${f"${thr32 / 32}%.1f"} docs/s/core (full extract+index, larger
         |per-doc work than the reference's 11 mutate processors).
         |""".stripMargin
    Files.writeString(Paths.get("/root/repo/BENCH.md"), md)
  }
}
