package graft

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.corpus.Page
import graft.index.{IncrementalIndex, IndexBuilder, IndexParams}
import graft.query.IndexReader

/** The spark-submit deployment surface (north rule: "run via spark-submit
  * on a multi-executor cluster"):
  *
  * {{{
  * spark-submit --class graft.Cli <jar> build \
  *   --input  /data/pages          # parquet dir of (url, warc_ts, html, text, lang)
  *   --iceberg /data/pages_table   # …or an Iceberg table of the same shape
  *   --index  /data/index [--buckets 16 --shard-size 4096 --block-size 128 \
  *   --partitions 0 --positions]
  * spark-submit --class graft.Cli <jar> query  --index /data/index --k 10 web search terms
  * spark-submit --class graft.Cli <jar> phrase --index /data/index --k 10 [--slop 2] exact phrase words
  * spark-submit --class graft.Cli <jar> search --index /data/index --k 10 \
  *   [--must a,b --must-not c] [--fuzzy serch --max-dist 1] \
  *   [--mlt <docId> --mlt-terms 8] [--facets lang] [--suggest serch] \
  *   [--prefix w00 | --wildcard w0*1 --max-expansions 50] \
  *   [--after-score 7.1234 --after-id 42]  # keyset page N+1 \
  *   free terms
  * spark-submit --class graft.Cli <jar> ingest-iceberg --iceberg /data/tbl --index /data/index
  * spark-submit --class graft.Cli <jar> ingest-warc --warc-dir /data/crawl --index /data/index
  * spark-submit --class graft.Cli <jar> delete  --index /data/index stale terms
  * spark-submit --class graft.Cli <jar> compact --index /data/index
  * spark-submit --class graft.Cli <jar> reindex --index /data/index \
  *   --dest /data/index2 [--buckets 8 --shard-size 8192 … --positions]
  * }}}
  *
  * `search` is the index-served OpenSearch-query-shape surface
  * ([[graft.query.IndexSearch]]): bool (must/should/must_not), fuzzy,
  * more-like-this, facet counts, prefix/wildcard expansion, and "did you
  * mean" suggestions — all answered from postings/termstats, never a
  * corpus scan. `delete` is `_delete_by_query` (tombstones; `compact`
  * applies them physically), `ingest-warc` consumes raw crawl archives
  * file-by-file into generations.
  *
  * Cluster sizing lives entirely in spark-submit flags (`--num-executors`
  * etc.); nothing here depends on parallelism — docId assignment, build
  * partitioning and query fan-out are all invariant to it
  * (ParallelismEquivalenceSpec). `ingest-iceberg` consumes unconsumed
  * snapshots into index generations (the reference's consume-then-stop
  * iceberg source mode) and auto-compacts past the generation threshold.
  */
object Cli {

  private def fail(msg: String): Nothing = {
    System.err.println(s"[graft] $msg")
    sys.exit(2)
  }

  /** (flags, positional) — flags are `--key value` pairs except boolean
    * `--positions`. */
  private def parse(args: Seq[String]): (Map[String, String], Seq[String]) = {
    val flags = Map.newBuilder[String, String]
    val pos = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--positions" => flags += ("positions" -> "true"); i += 1
        case f if f.startsWith("--") =>
          if (i + 1 >= args.length) fail(s"flag $f needs a value")
          flags += (f.drop(2) -> args(i + 1)); i += 2
        case p => pos += p; i += 1
      }
    }
    (flags.result(), pos.result())
  }

  private def session(app: String): (SparkSession, Boolean) = {
    val preexisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
    val b = SparkSession.builder().appName(app)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    // local default for ad-hoc runs; spark-submit's --master wins
    sys.env.get("SPARK_GRAFT_LOCAL").foreach { _ =>
      b.master("local[*]").config("spark.sql.shuffle.partitions", "32")
    }
    (b.getOrCreate(), preexisting.isEmpty)
  }

  private def params(f: Map[String, String]): IndexParams = IndexParams(
    buckets = f.getOrElse("buckets", "16").toInt,
    shardSize = f.getOrElse("shard-size", "4096").toLong,
    blockSize = f.getOrElse("block-size", "128").toInt,
    buildPartitions = f.getOrElse("partitions", "0").toInt,
    positions = f.get("positions").exists(_.toBoolean))

  private def pages(spark: SparkSession, f: Map[String, String]): Dataset[Page] = {
    import spark.implicits._
    val df = (f.get("input"), f.get("iceberg")) match {
      case (Some(p), None) => spark.read.parquet(p)
      case (None, Some(t)) => graft.sources.Iceberg.read(spark, t)
      case _ => fail("exactly one of --input <parquet> / --iceberg <table> required")
    }
    df.selectExpr("url", "warc_ts", "html", "text", "lang").as[Page]
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) fail("subcommand required: build | query | phrase | qs | search | ingest-iceberg | compact | reindex | pipeline")
    val (flags, positional) = parse(args.toSeq.tail)
    def index = flags.getOrElse("index", fail("--index required"))
    lazy val (spark, ownSession) = session(s"graft-${args.head}")

    args.head match {
      case "build" =>
        new IndexBuilder(spark, index, params(flags))
          .build(pages(spark, flags), flags.getOrElse("input",
            flags.getOrElse("iceberg", "?")))

      case "query" =>
        val k = flags.getOrElse("k", "10").toInt
        if (positional.isEmpty) fail("query terms required")
        new IndexReader(spark, index)
          .topK(graft.analyze.Analyzer.analyzeQuery(positional.mkString(" ")), k)
          .show(k, truncate = false)

      case "phrase" =>
        val k = flags.getOrElse("k", "10").toInt
        val slop = flags.getOrElse("slop", "0").toInt
        if (positional.size < 2) fail("phrase needs >= 2 words")
        new IndexReader(spark, index)
          .phraseTopK(positional.map(graft.analyze.Analyzer.lowerLikeCatalyst),
            k, slop)
          .show(k, truncate = false)

      case "qs" =>
        // Lucene query_string: graft.Cli qs --index DIR --k 10 \
        //   '+spark merge^2 "window sort"~1 -slow st*m sprk~1'
        val k = flags.getOrElse("k", "10").toInt
        if (positional.isEmpty) fail("qs needs a query string")
        new graft.query.IndexSearch(spark, index)
          .queryStringTopK(positional.mkString(" "), k,
            flags.getOrElse("max-expansions", "50").toInt)
          .show(k, truncate = false)

      case "search" =>
        val k = flags.getOrElse("k", "10").toInt
        val srch = new graft.query.IndexSearch(spark, index)
        def terms(key: String): Seq[String] = flags.get(key).toSeq
          .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
        val out =
          if (flags.contains("suggest"))
            srch.suggest(flags("suggest"),
              flags.getOrElse("max-dist", "2").toInt, k)
          else if (flags.contains("mlt"))
            srch.moreLikeThisTopK(flags("mlt").toLong,
              flags.getOrElse("mlt-terms", "8").toInt, k)
          else if (flags.contains("fuzzy"))
            srch.fuzzyTopK(terms("fuzzy"),
              k, flags.getOrElse("max-dist", "1").toInt)
          else if (flags.contains("facets")) {
            val qs = if (positional.nonEmpty) positional
              else terms("must") ++ terms("should")
            if (qs.isEmpty) fail("--facets needs query terms")
            srch.facets(qs, flags("facets"))
          }
          else if (flags.contains("prefix"))
            srch.prefixTopK(flags("prefix"), k,
              flags.getOrElse("max-expansions", "50").toInt)
          else if (flags.contains("wildcard"))
            srch.wildcardTopK(flags("wildcard"), k,
              flags.getOrElse("max-expansions", "50").toInt)
          else if (flags.contains("after-score")) {
            val qs = if (positional.nonEmpty) positional else terms("should")
            if (qs.isEmpty) fail("search --after-score needs query terms")
            srch.searchAfter(qs, flags("after-score").toDouble,
              flags.getOrElse("after-id", fail("--after-id required with " +
                "--after-score")).toLong, k)
          }
          else {
            val should =
              if (positional.nonEmpty) positional else terms("should")
            if (terms("must").isEmpty && should.isEmpty)
              fail("search needs --must/--should/positional terms " +
                "(or --fuzzy/--mlt/--facets/--suggest/--after-score)")
            srch.boolTopK(terms("must"), should, terms("must-not"), k)
          }
        out.show(math.max(k, 20), truncate = false)

      case "ingest-iceberg" =>
        val table = flags.getOrElse("iceberg", fail("--iceberg <table> required"))
        val ingested = graft.streaming.Streaming.indexAppendFromIceberg(
          spark, table, index, params(flags),
          maxGenerations = flags.getOrElse("max-generations", "8").toInt)
        println(s"[graft] ingested snapshots: ${
          if (ingested.isEmpty) "none (caught up)" else ingested.mkString(", ")}")

      case "ingest-warc" =>
        // consume-then-stop from a directory of crawl archives: each
        // unconsumed .warc/.warc.gz file becomes one index generation
        val dir = flags.getOrElse("warc-dir", fail("--warc-dir <dir> required"))
        val ingested = graft.streaming.Streaming.indexAppendFromWarc(
          spark, dir, index, params(flags),
          maxGenerations = flags.getOrElse("max-generations", "8").toInt)
        println(s"[graft] ingested archives: ${
          if (ingested.isEmpty) "none (caught up)" else ingested.mkString(", ")}")

      case "delete" =>
        // _delete_by_query: tombstone every doc matching the terms;
        // `compact` applies tombstones physically
        if (positional.isEmpty) fail("delete needs query terms")
        val n = new graft.query.IndexSearch(spark, index)
          .deleteByQuery(positional.map(graft.analyze.Analyzer.lowerLikeCatalyst))
        println(s"[graft] tombstoned $n docs (run `compact` to apply physically)")

      case "compact" =>
        val gen = IncrementalIndex.compactGenerations(spark, index, params(flags))
        println(gen match {
          case Some(g) => s"[graft] compacted into generation $g"
          case None => "[graft] nothing to compact"
        })

      case "reindex" =>
        // _reindex: rebuild from the index's stored fields under NEW
        // founding params (tombstones materialize):
        //   reindex --index <src> --dest <dir> [--buckets N …]
        val dest = flags.getOrElse("dest", fail("--dest <dir> required"))
        graft.index.Reindex.reindex(spark, index, dest, params(flags))
        println(s"[graft] reindexed $index -> $dest")

      case "pipeline" =>
        // run a reference-shaped pipelines.yaml from spark-submit:
        //   pipeline --yaml <file> [--input name=parquet,name=parquet]
        //            [--out <dir>]
        // --input feeds the in_memory / consumer-seam sources; --out is
        // where opensearch-sink index parquet lands (PipelineYaml.run).
        val yamlPath = flags.getOrElse("yaml", fail("--yaml <file> required"))
        val yamlText = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(yamlPath)),
          java.nio.charset.StandardCharsets.UTF_8)
        val inputs = flags.get("input").map { spec =>
          spec.split(',').map(_.trim).filter(_.nonEmpty).map { kv =>
            kv.split("=", 2) match {
              case Array(n, p) => n -> spark.read.parquet(p)
              case _ => fail(s"--input entries are name=path, got '$kv'")
            }
          }.toMap
        }.getOrElse(Map.empty[String, org.apache.spark.sql.DataFrame])
        // --transforms: rule-driven template rewriting before compilation
        // (the reference's ocsf/rds/documentdb plugin machinery). A
        // directory of <name>-rule.yaml + <name>-template.yaml pairs, or
        // the literal 'ocsf' for the bundled OCSF example. First matching
        // rule rewrites the config; no match = identity.
        val outs = flags.get("transforms") match {
          case Some(spec) =>
            val bundles =
              if (spec == "ocsf") Seq(graft.pipeline.Transforms.ocsfBundle)
              else {
                val d = new java.io.File(spec)
                if (!d.isDirectory)
                  fail(s"transforms: '$spec' is not a directory (or the literal 'ocsf')")
                val rules = d.listFiles()
                  .filter(_.getName.endsWith("-rule.yaml")).sortBy(_.getName)
                // an explicitly requested transform step with nothing to
                // apply is a config error, not a silent no-op
                if (rules.isEmpty)
                  fail(s"transforms: no *-rule.yaml files in '$spec'")
                rules.toSeq.map { rf =>
                  val tf = new java.io.File(d,
                    rf.getName.stripSuffix("-rule.yaml") + "-template.yaml")
                  if (!tf.exists())
                    fail(s"transforms: ${rf.getName} has no matching ${tf.getName}")
                  def slurp(f: java.io.File) = new String(
                    java.nio.file.Files.readAllBytes(f.toPath),
                    java.nio.charset.StandardCharsets.UTF_8)
                  graft.pipeline.Transforms.RuleTemplate(slurp(rf), slurp(tf))
                }
              }
            val (result, compiled) = graft.pipeline.Transforms
              .compileWithResult(spark, yamlText, bundles, inputs)
            result.appliedPlugin
              .foreach(p => println(s"[graft] transform applied: $p"))
            graft.pipeline.PipelineYaml.runSinks(compiled, flags.get("out"))
            compiled
          case None => graft.pipeline.PipelineYaml.run(
            spark, yamlText, inputs, outDir = flags.get("out"))
        }
        outs.foreach { so =>
          println(s"[graft] sink ${so.plugin.name}: ${so.df.count()} rows")
        }

      case other => fail(s"unknown subcommand '$other'")
    }
    // don't tear down a session we joined (tests share one JVM-wide)
    if (ownSession) spark.stop()
  }
}
