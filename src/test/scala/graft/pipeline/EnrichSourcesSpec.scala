package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EnrichSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("geoLookup resolves CIDR ranges via broadcast range join") {
    val d = Seq(("10.1.2.3", 1), ("10.200.0.9", 2), ("192.168.1.1", 3))
      .toDF("ip", "id")
    val out = Enrich.geoLookup(d, "ip", "net", Seq(
      "10.0.0.0/9" -> "low", "10.128.0.0/9" -> "high"))
    val m = out.select("id", "net").as[(Int, String)].collect().toMap
    assert(m == Map(1 -> "low", 2 -> "high", 3 -> "unknown"))
  }

  test("zScoreAnomalies flags outliers per key") {
    val d = (Seq.fill(50)(10.0) :+ 1000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "k", v) }.toDF("id", "k", "v")
    val out = Enrich.zScoreAnomalies(d, Seq("k"), "v", threshold = 3.0)
    val flagged = out.filter($"grade" === 1.0).select("id").as[Long].collect()
    assert(flagged.toSeq == Seq(50L))
  }
}

class SourcesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("log generator is deterministic and grok-parsable") {
    val a = graft.sources.Sources.logGenerator(spark, 100).collect()
    val b = graft.sources.Sources.logGenerator(spark, 100).collect()
    assert(a.sameElements(b))
    val re = "^(\\S+) - - \\[[^\\]]+\\] \"(\\S+) (\\S+) HTTP/1\\.1\" ([0-9]+) ([0-9]+)$".r
    assert(a.forall(l => re.findFirstIn(l).isDefined), a.take(2).mkString("\n"))
  }

  test("multiline codec groups stack-trace-style blocks") {
    val dir = graft.TestSpark.tmpDir("graft-src")
    val lines = Seq(
      "2026-01-01 ERROR boom", "  at a.b.c", "  at d.e.f",
      "2026-01-01 INFO ok", "2026-01-01 ERROR again", "  at x.y")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/log.txt"),
      lines.mkString("\n").getBytes("UTF-8"))
    val out = graft.sources.Sources.multiline(spark, dir, "^\\d{4}-")
      .as[String].collect().sorted
    assert(out.length == 3)
    assert(out.exists(m => m.startsWith("2026-01-01 ERROR boom") && m.contains("at d.e.f")))
  }

  test("ndjson codec captures corrupt records instead of failing") {
    val dir = graft.TestSpark.tmpDir("graft-ndjson")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/d.json"),
      Seq("""{"a": 1}""", """not json""", """{"a": 3}""").mkString("\n").getBytes("UTF-8"))
    // Spark refuses corrupt-column-only queries over raw JSON — cache the
    // parsed result first (the documented pattern)
    val out = graft.sources.Sources.ndjson(spark, dir, "a BIGINT").cache()
    try {
      assert(out.filter($"_corrupt".isNotNull).count() == 1)
      assert(out.filter($"a".isNotNull).count() == 2)
    } finally out.unpersist()
  }
}

class SinksSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("grouped write partitions by key and caps records per file") {
    val dir = graft.TestSpark.tmpDir("graft-sink")
    val d = (1 to 100).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("n", "par")
    graft.sinks.Sinks.writeGrouped(d, s"$dir/out", groupBy = Seq("par"),
      maxRecordsPerFile = 10)
    val files = new java.io.File(s"$dir/out/par=even").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 5) // 50 rows / 10 per file
    assert(spark.read.parquet(s"$dir/out").count() == 100)
  }

  test("routed write fans out with default route and counts") {
    val dir = graft.TestSpark.tmpDir("graft-routed")
    val d = Seq((1, "en"), (2, "de"), (3, "fr")).toDF("id", "lang")
    val counts = graft.sinks.Sinks.writeRouted(d, Seq(
      Route("english", $"lang" === "en"), Route("german", $"lang" === "de")), dir)
    assert(counts == Map("english" -> 1L, "german" -> 1L, Router.DefaultRoute -> 1L))
    assert(spark.read.parquet(s"$dir/_default").select("lang").as[String].head() == "fr")
  }

  test("DLQ write splits good and quarantined rows") {
    val dir = graft.TestSpark.tmpDir("graft-dlq")
    val d = Seq((1, "ok"), (2, null), (3, "ok")).toDF("id", "status")
    val (good, bad) = graft.sinks.Sinks.writeWithDlq(d,
      $"status".isNotNull, s"$dir/good", s"$dir/dlq")
    assert(good == 2 && bad == 1)
    assert(spark.read.parquet(s"$dir/dlq").select("id").as[Int].head() == 2)
  }

  test("bulk-action merge: index/create/update/upsert/delete semantics") {
    import graft.sinks.Sinks
    val existing = Seq(
      (1L, "one", 10), (2L, "two", 20), (3L, "three", 30), (4L, "four", 40),
      (5L, "five", 50)).toDF("id", "name", "v")
    val batch = Seq(
      // (id, name, v, action, seq)
      (1L, "ONE", 11, "index", 1L),            // overwrite
      (2L, null.asInstanceOf[String], 22, "update", 1L), // merge: keeps name
      (3L, "THREE", 33, "create", 1L),         // exists -> no-op
      (4L, null.asInstanceOf[String], 44, "delete", 1L),
      (6L, "six", 60, "create", 1L),           // absent -> insert
      (7L, "seven", 70, "update", 1L),         // absent -> no-op
      (8L, "eight", 80, "upsert", 1L),         // absent -> insert
      (5L, "FIVE-a", 51, "index", 1L),         // superseded by seq 2
      (5L, "FIVE-b", 52, "upsert", 2L))        // last wins: merge
      .toDF("id", "name", "v", "_action", "_seq")
    val out = Sinks.mergeActions(existing, batch, "id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L) == (("ONE", 11)))
    assert(out(2L) == (("two", 22)))   // update merged v, kept name
    assert(out(3L) == (("three", 30))) // create on existing = no-op
    assert(!out.contains(4L))          // deleted
    assert(out(5L) == (("FIVE-b", 52)))
    assert(out(6L) == (("six", 60)))
    assert(!out.contains(7L))          // update without a doc
    assert(out(8L) == (("eight", 80)))
    assert(out.size == 6)
  }

  test("action resolution: first matching when wins, last rule sticks otherwise") {
    import graft.sinks.Sinks
    val d = Seq((1, "err"), (2, "ok"), (3, "warn")).toDF("id", "status")
    val out = Sinks.resolveActions(d, "index", Seq(
      (Some("/status == \"err\""), "delete"),
      (Some("/status == \"ok\""), "upsert"),
      (None, "create")))
      .select("id", "_action").as[(Int, String)].collect().toMap
    assert(out(1) == "delete")
    assert(out(2) == "upsert")
    assert(out(3) == "create") // nothing matched -> LAST rule's action
    val empty = Sinks.resolveActions(d, "index", Seq.empty)
      .select("_action").as[String].collect().toSet
    assert(empty == Set("index"))
  }
}
