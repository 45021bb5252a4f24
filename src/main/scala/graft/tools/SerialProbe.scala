package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.corpus.SyntheticCorpus
import graft.index.{IndexBuilder, IndexParams}

/** Measures the index build's driver-side SERIAL fraction: per-Spark-job
  * wall times and the gaps between consecutive jobs (manifest commits,
  * footer lineage reads, committer renames, scheduling). The gaps are the
  * fixed cost that dilutes the N→4N scaling ratio — on a real cluster the
  * driver serializes them exactly the same way.
  *
  * Usage: `sbt "runMain graft.tools.SerialProbe [cores] [docs]"`.
  */
object SerialProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 4
    val docs = if (args.length > 1) args(1).toLong else 60000L
    val parts = if (args.length > 2) args(2).toInt else 8

    val gen = SparkSession.builder().master("local[32]")
      .appName("probe-gen").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    val work = java.nio.file.Files.createTempDirectory("graft-serial").toString
    SyntheticCorpus.generate(gen, docs, seed = 42L, partitions = 64)
      .write.parquet(s"$work/corpus")
    gen.stop()

    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("probe-build").config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_AQE", "false"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    final case class J(id: Int, start: Long, var end: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, J(e.jobId, System.nanoTime()))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = System.nanoTime()
      }
    })

    // warm codegen/JIT like the bench does
    new IndexBuilder(spark, s"$work/warm",
      IndexParams(buckets = 16, shardSize = 8192, blockSize = 128, buildPartitions = parts))
      .build(SyntheticCorpus.generate(spark, 2000, seed = 7L), "warmup")
    jobs.clear()

    val pages = spark.read.parquet(s"$work/corpus").as[graft.corpus.Page]
    val t0 = System.nanoTime()
    new IndexBuilder(spark, s"$work/idx",
      IndexParams(buckets = 16, shardSize = 8192, blockSize = 128, buildPartitions = parts))
      .build(pages, "probe")
    val total = (System.nanoTime() - t0) / 1e9

    import scala.jdk.CollectionConverters._
    val js = jobs.values().asScala.toSeq.sortBy(_.start)
    var prevEnd = t0
    var gapSum = 0.0
    var jobSum = 0.0
    js.foreach { j =>
      val gap = (j.start - prevEnd) / 1e9
      val dur = (j.end - j.start) / 1e9
      gapSum += math.max(0, gap); jobSum += dur
      System.err.println(f"[serial] job ${j.id}%3d gapBefore ${gap}%7.3fs dur ${dur}%8.3fs")
      prevEnd = math.max(prevEnd, j.end)
    }
    val tail = (t0 + (total * 1e9).toLong - prevEnd) / 1e9
    System.err.println(f"[serial] cores=$cores docs=$docs parts=$parts total ${total}%.2fs = jobs ${jobSum}%.2fs + gaps ${gapSum}%.2fs + tail ${tail}%.2fs (serial frac ${(gapSum + tail) / total * 100}%.1f%%)")
    spark.stop()
  }
}
