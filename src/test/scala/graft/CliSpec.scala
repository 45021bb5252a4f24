package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end check of the spark-submit surface: build from a pages
  * parquet, query it, exact-phrase it — all through `Cli.main` exactly as
  * a cluster run would invoke it (the shared test session stands in for
  * the one spark-submit provides; Cli must NOT stop a session it joined).
  */
class CliSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("build → query → phrase through the CLI surface") {
    import spark.implicits._
    val work = TestSpark.tmpDir("cli")
    graft.corpus.SyntheticCorpus.generate(spark, 400, seed = 7L, partitions = 4)
      .write.parquet(s"$work/pages")

    Cli.main(Array("build", "--input", s"$work/pages",
      "--index", s"$work/idx", "--buckets", "4", "--shard-size", "128",
      "--positions"))
    assert(spark.sparkContext.isStopped == false) // joined, not torn down

    // query through the built index directly (CLI's query subcommand
    // .show()s; rank identity is pinned by the reader specs)
    val reader = new graft.query.IndexReader(spark, s"$work/idx")
    val top = reader.topK(Seq("w00001", "the"), 5).collect()
    assert(top.length == 5)

    Cli.main(Array("query", "--index", s"$work/idx", "--k", "3", "w00001"))
    Cli.main(Array("phrase", "--index", s"$work/idx", "--k", "3",
      "w00001", "the"))

    // compact on a standalone (generation-less) index: nothing to do
    Cli.main(Array("compact", "--index", s"$work/idx",
      "--buckets", "4", "--shard-size", "128", "--positions"))
    assert(!spark.sparkContext.isStopped)

    // reindex under different founding params; rank identity by url is
    // pinned in ReindexSpec — here the CLI plumbing end to end
    Cli.main(Array("reindex", "--index", s"$work/idx",
      "--dest", s"$work/idx2", "--buckets", "8", "--shard-size", "64",
      "--positions"))
    val re = new graft.query.IndexReader(spark, s"$work/idx2")
    assert(re.topK(Seq("w00001", "the"), 5).collect().length == 5)

    // search: every index-served query shape through the CLI surface;
    // semantics are pinned rank-identical to brute in IndexSearchSpec —
    // this drives the flag plumbing end to end
    Cli.main(Array("search", "--index", s"$work/idx", "--k", "3",
      "--must", "the", "--must-not", "w00009", "w00001"))
    Cli.main(Array("search", "--index", s"$work/idx", "--k", "3",
      "--fuzzy", "w00001,the"))
    Cli.main(Array("search", "--index", s"$work/idx", "--k", "3",
      "--mlt", "5", "--mlt-terms", "6"))
    Cli.main(Array("search", "--index", s"$work/idx",
      "--facets", "lang", "w00002"))
    Cli.main(Array("search", "--index", s"$work/idx", "--k", "3",
      "--suggest", "w00001"))
    Cli.main(Array("search", "--index", s"$work/idx", "--k", "3",
      "--after-score", top(2).getAs[Double]("score").toString,
      "--after-id", top(2).getAs[Long]("docId").toString, "w00001", "the"))
    Cli.main(Array("search", "--index", s"$work/idx", "--k", "3",
      "--prefix", "w0000", "--max-expansions", "10"))
    Cli.main(Array("search", "--index", s"$work/idx", "--k", "3",
      "--wildcard", "w0*1", "--max-expansions", "10"))
    assert(!spark.sparkContext.isStopped)
  }

  test("ingest-warc → delete → compact through the CLI surface") {
    val work = TestSpark.tmpDir("cli-warc")
    val pages = graft.corpus.SyntheticCorpus
      .generate(spark, 60, seed = 17L).collect()
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$work/crawl"))
    pages.grouped(30).zipWithIndex.foreach { case (grp, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$work/crawl", f"seg-$i%05d.warc.gz"),
        graft.sources.Warc.encodeFile(grp.map(p =>
          graft.sources.Warc.responseRecord(p.url,
            "2026-01-01T00:00:00Z", p.html)).toSeq, gzipMembers = true))
    }
    Cli.main(Array("ingest-warc", "--warc-dir", s"$work/crawl",
      "--index", s"$work/idx", "--buckets", "4", "--shard-size", "64"))
    assert(graft.index.IncrementalIndex
      .totalDocs(spark, s"$work/idx") == 60)
    // tombstone + query + physical apply
    Cli.main(Array("delete", "--index", s"$work/idx", "w00300"))
    Cli.main(Array("search", "--index", s"$work/idx", "--k", "3", "the"))
    Cli.main(Array("compact", "--index", s"$work/idx",
      "--buckets", "4", "--shard-size", "64"))
    assert(graft.index.IncrementalIndex
      .deleteBatches(spark, s"$work/idx").isEmpty)
    assert(!spark.sparkContext.isStopped)
  }

  test("pipeline subcommand runs a pipelines.yaml with parquet-fed inputs") {
    import spark.implicits._
    val work = TestSpark.tmpDir("cli-pipe")
    Seq((1L, 10L, "GET /api 200"), (2L, 20L, "GET /api 500"))
      .toDF("event_id", "ts", "message")
      .write.parquet(s"$work/in")
    val yaml =
      s"""p:
         |  source:
         |    in_memory:
         |      testing_key: events
         |  processor:
         |    - grok:
         |        match:
         |          message: ['%{WORD:verb} %{URIPATH:path} %{NUMBER:status}']
         |  sink:
         |    - file:
         |        path: $work/out
         |        format: parquet
         |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$work/pipe.yaml"), yaml)
    Cli.main(Array("pipeline", "--yaml", s"$work/pipe.yaml",
      "--input", s"events=$work/in", "--out", s"$work/os"))
    val out = spark.read.parquet(s"$work/out")
    assert(out.count() == 2)
    assert(out.where(col("status") === "500").count() == 1)
    assert(!spark.sparkContext.isStopped)
  }

  test("pipeline --transforms rewrites a marker pipeline before compiling") {
    import spark.implicits._
    val work = TestSpark.tmpDir("cli-transform")
    Seq(("e1", "2024-03-01T10:15:00", "2024-03-01T10:15:05", "10.0.0.1",
        "192.168.1.9", "tcp", 100L, 10L, "r1"))
      .toDF("src_id", "Start_Time", "Receive_Time", "Source_Address",
        "Destination_Address", "Protocol", "Bytes_Sent", "Bytes_Received",
        "Rule_Name")
      .write.parquet(s"$work/in")
    val yaml =
      s"""panw:
         |  source:
         |    in_memory:
         |      testing_key: panw
         |  processor:
         |    - ocsf:
         |        type: palo_alto_networks_traffic_logs
         |        version: '1.1'
         |  sink:
         |    - file:
         |        path: $work/out
         |        format: parquet
         |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$work/pipe.yaml"), yaml)
    Cli.main(Array("pipeline", "--yaml", s"$work/pipe.yaml",
      "--transforms", "ocsf", "--input", s"panw=$work/in"))
    val out = spark.read.parquet(s"$work/out")
    assert(out.count() == 1)
    assert(out.columns.contains("class_uid") && out.columns.contains("src_ip"))
    assert(out.select("class_name").head().getString(0) == "Network Activity")
  }
}
