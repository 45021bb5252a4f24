package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val iso = "2026-01-01T00:00:00Z"

  test("response roundtrip over the synthetic corpus is byte-identical") {
    val pages = graft.corpus.SyntheticCorpus
      .generate(spark, 40, seed = 7L).collect()
    val recs = pages.map(p => Warc.responseRecord(p.url, iso, p.html))
    val file = Warc.encodeFile(recs.toSeq)
    val out = Warc.recordsLocal(file)
    assert(out.length == pages.length)
    out.zip(pages).foreach { case (r, p) =>
      assert(r.err == null)
      assert(r.warc_type == "response")
      assert(r.target_uri == p.url)
      assert(r.warc_date == iso)
      assert(r.http_status == 200)
      assert(r.http_content_type == "text/html")
      assert(java.util.Arrays.equals(r.payload, p.html),
        s"payload mismatch for ${p.url}")
    }
  }

  test("gzip member-per-record file decodes identically to plain") {
    val pages = graft.corpus.SyntheticCorpus
      .generate(spark, 12, seed = 9L).collect()
    val recs = pages.map(p => Warc.responseRecord(p.url, iso, p.html)).toSeq
    val plain = Warc.recordsLocal(Warc.encodeFile(recs))
    val gz = Warc.recordsLocal(Warc.encodeFile(recs, gzipMembers = true))
    assert(plain.length == gz.length)
    plain.zip(gz).foreach { case (a, b) =>
      assert(a.target_uri == b.target_uri)
      assert(java.util.Arrays.equals(a.payload, b.payload))
    }
  }

  test("warcinfo + request + response mixed file keeps order and types") {
    val url = "https://host1.example.com/p/1"
    val file = Warc.encodeFile(Seq(
      Warc.warcinfoRecord(iso, "software: graft\r\nformat: WARC/1.0\r\n"),
      Warc.requestRecord(url, iso),
      Warc.responseRecord(url, iso, "<html>x</html>".getBytes("UTF-8"))))
    val out = Warc.recordsLocal(file)
    assert(out.map(_.warc_type) == Seq("warcinfo", "request", "response"))
    val info = out(0)
    assert(info.target_uri == null)
    assert(new String(info.payload, "UTF-8").contains("software: graft"))
    val req = out(1)
    assert(req.target_uri == url)
    assert(req.http_status == null) // request line, not a status line
    assert(req.err == null)
    val resp = out(2)
    assert(resp.http_status == 200)
    // record ids are deterministic and distinct per (type, uri)
    assert(out.map(_.record_id).distinct.length == 3)
    assert(req.record_id == Warc.recordId(s"request:$url"))
  }

  test("truncation quarantines, earlier records survive") {
    val r1 = Warc.responseRecord("https://a.example/1", iso,
      "aaaa".getBytes("UTF-8"))
    val r2 = Warc.responseRecord("https://a.example/2", iso,
      "bbbb".getBytes("UTF-8"))
    val file = Warc.encodeFile(Seq(r1, r2))
    val cut = java.util.Arrays.copyOfRange(file, 0, file.length - 30)
    val out = Warc.recordsLocal(cut)
    assert(out.length == 2)
    assert(out(0).err == null && out(0).target_uri == "https://a.example/1")
    assert(out(1).err == "bad_content_length")
    // garbage prefix → bad version line, no exception
    val junk = Warc.recordsLocal("not a warc at all".getBytes("UTF-8"))
    assert(junk.length == 1 && junk.head.err == "bad_version_line")
    // corrupt gzip → quarantined
    val gzBad = Warc.recordsLocal(Array(0x1f.toByte, 0x8b.toByte, 1, 2, 3))
    assert(gzBad.length == 1 && gzBad.head.err == "bad_gzip")
    assert(Warc.recordsLocal(Array.emptyByteArray).isEmpty)
  }

  test("DataFrame explode keeps passthrough columns and file order") {
    val pages = graft.corpus.SyntheticCorpus
      .generate(spark, 9, seed = 3L).collect()
    val files = pages.grouped(3).zipWithIndex.map { case (grp, i) =>
      (i.toLong, Warc.encodeFile(
        grp.map(p => Warc.responseRecord(p.url, iso, p.html)).toSeq,
        gzipMembers = i % 2 == 1))
    }.toSeq.toDF("file_id", "content")
    val out = Warc.records(files, "content")
      .orderBy("file_id", "record_pos").collect()
    assert(out.length == 9)
    assert(out.map(_.getAs[String]("target_uri")).toSeq ==
      pages.map(_.url).toSeq)
    assert(out.map(_.getAs[Int]("record_pos")).toSeq ==
      Seq(0, 1, 2, 0, 1, 2, 0, 1, 2))
    assert(out.forall(_.getAs[String]("err") == null))
  }

  test("binaryFile read path decodes a directory of .warc.gz files") {
    val dir = TestSpark.tmpDir("warc")
    val pages = graft.corpus.SyntheticCorpus
      .generate(spark, 6, seed = 11L).collect()
    pages.grouped(3).zipWithIndex.foreach { case (grp, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"crawl-$i%05d.warc.gz"),
        Warc.encodeFile(
          grp.map(p => Warc.responseRecord(p.url, iso, p.html)).toSeq,
          gzipMembers = true))
    }
    val out = Warc.read(spark, dir)
    assert(out.count() == 6)
    assert(out.where(col("http_status") === 200).count() == 6)
    val texts = out.select(col("target_uri"), col("payload")).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    pages.foreach(p => assert(java.util.Arrays.equals(texts(p.url), p.html)))
  }
}
