package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-5 response to the r4 driver artifact's one red row: q_iceberg_scan
  * produced a hash mismatch in ONE driver run that no rerun reproduced.
  * This spec pins the write → read → aggregate round trip as bit-stable
  * across repeats, input partitionings, and decode placements, and pins
  * the record-count integrity gate that now runs inside the gate query
  * (any extra/missing/truncated data file between write and read fails
  * loudly instead of skewing the aggregate).
  */
class IcebergDeterminismSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A corpus-shaped input: (id, source, lang, n) with skewed langs. */
  private def input(parts: Int) = {
    val rows = (0L until 600L).map { i =>
      (i, s"src${i % 7}", if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr",
        (i * 37) % 991)
    }
    rows.toDF("id", "source", "lang", "n").repartition(parts, col("id"))
  }

  private def roundTrip(parts: Int): Seq[(String, Long, Long)] = {
    val dir = TestSpark.tmpDir("graft-ice-det")
    Iceberg.write(spark, input(parts), dir, partitionCol = Some("lang"))
    Iceberg.read(spark, dir,
      partitionPredicate = p => p("lang") == "en",
      verifyRecordCounts = true)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("cnt"), sum(col("n")).as("s"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("write → read → aggregate is identical across 8 repeats and partitionings") {
    val expected = roundTrip(1)
    // fresh table dir every iteration, input partitioning varied the way a
    // different session core count would vary it
    for ((parts, i) <- Seq(1, 2, 3, 5, 8, 13, 8, 2).zipWithIndex) {
      val got = roundTrip(parts)
      assert(got == expected, s"iteration $i (parts=$parts) diverged")
    }
  }

  test("record-count integrity gate fails loudly on a stray data file") {
    val dir = TestSpark.tmpDir("graft-ice-stray")
    Iceberg.write(spark, input(2), dir, partitionCol = Some("lang"))
    // simulate the failure family the r4 flake pointed at: a data file in
    // a committed partition directory that does not match its manifest
    // record_count (here: overwrite one file with a different row count)
    val en = Iceberg.liveFiles(spark, dir).filter(_.partition("lang") == "en")
    val victim = en.map(_.path).minBy(identity)
    input(1).filter(col("lang") === "en").limit(3)
      .coalesce(1).write.mode("overwrite")
      .parquet(TestSpark.tmpDir("graft-ice-repl") + "/f")
    val repl = new java.io.File(TestSpark.tmpDir("graft-ice-repl2"))
    // write a tiny parquet file and copy it over the victim path
    val tinyDir = TestSpark.tmpDir("graft-ice-tiny")
    Seq((1L, "srcX", "en", 5L)).toDF("id", "source", "lang", "n")
      .coalesce(1).write.mode("overwrite").parquet(tinyDir)
    val tiny = new java.io.File(tinyDir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    val victimLocal = java.nio.file.Paths.get(victim.stripPrefix("file:"))
    java.nio.file.Files.copy(tiny.toPath, victimLocal,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the RawLocalFileSystem checksum sidecar so the corruption is
    // seen by OUR integrity gate, not masked by Hadoop's crc layer
    java.nio.file.Files.deleteIfExists(
      victimLocal.getParent.resolve("." + victimLocal.getFileName + ".crc"))
    val e = intercept[Throwable] {
      Iceberg.read(spark, dir, partitionPredicate = p => p("lang") == "en",
        verifyRecordCounts = true)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("record-count integrity")),
      s"unexpected failure chain: ${messages(e).mkString(" <- ")}")
    assert(repl != null) // silence unused
  }

  test("distributed manifest decode returns the same pruned file set as the driver pool") {
    val dir = TestSpark.tmpDir("graft-ice-dist")
    // three appends → three manifests in the current snapshot's list
    Iceberg.write(spark, input(2).filter(col("id") < 200), dir,
      partitionCol = Some("lang"))
    Iceberg.append(spark, input(3).filter(col("id") >= 200 && col("id") < 400),
      dir, partitionCol = Some("lang"))
    Iceberg.append(spark, input(2).filter(col("id") >= 400), dir,
      partitionCol = Some("lang"))

    def key(f: Iceberg.DataFileRef) = (f.path, f.recordCount, f.partition)
    // force each placement regardless of manifest count
    val viaDriver = Iceberg.liveFiles(spark, dir, distributeOver = Int.MaxValue)
    val viaJob = Iceberg.liveFiles(spark, dir, distributeOver = 0)
    assert(viaDriver.map(key).toSet == viaJob.map(key).toSet)
    assert(viaDriver.nonEmpty)

    // predicate pushdown prunes on executors too
    val prunedDriver = Iceberg.liveFiles(spark, dir,
      pruneOn = p => p("lang") == "de", distributeOver = Int.MaxValue)
    val prunedJob = Iceberg.liveFiles(spark, dir,
      pruneOn = p => p("lang") == "de", distributeOver = 0)
    assert(prunedDriver.map(key).toSet == prunedJob.map(key).toSet)
    assert(prunedDriver.forall(_.partition("lang") == "de"))
    assert(prunedDriver.size < viaDriver.size)

    // full read over the multi-append table matches the logical union
    val total = Iceberg.read(spark, dir, verifyRecordCounts = true).count()
    assert(total == 600L)
  }
}
