package graft.sources

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (Web ARChive) reader/writer — the wire format Common-Crawl-style
  * corpora actually arrive in, and the natural ingest front of the
  * north-rule pipeline (BASELINE.json: "Iceberg table of Common-Crawl-style
  * web pages"; a crawler's raw output is WARC, the Iceberg table is what
  * this decode feeds). Own kernel from the PUBLIC ISO 28500 / WARC 1.0–1.1
  * format specification; no library.
  *
  * Format essentials implemented here:
  *  - a WARC file is a plain concatenation of records; each record is
  *    `WARC/1.x CRLF` + named-field header block (case-insensitive names,
  *    `Content-Length` mandatory) + CRLF + `Content-Length` payload bytes
  *    + CRLF CRLF;
  *  - Common Crawl convention: each record may be an independent gzip
  *    MEMBER, the file being the concatenation of members (detected by
  *    the 0x1f 0x8b magic; multi-member streams are decoded fully);
  *  - `response`/`request` records with `Content-Type: application/http`
  *    carry an HTTP/1.1 message as payload — the reader splits status
  *    line / headers / body so `payload` is the HTTP BODY (the html), and
  *    surfaces `http_status` + the HTTP `Content-Type`.
  *
  * Quarantine contract (same as [[KinesisAgg]]/[[graft.sources.Cdc]]): a
  * malformed record (bad version line, unparsable/missing Content-Length,
  * payload running past end-of-buffer) yields ONE row with `err` set and
  * parsing stops at the corruption point — never an exception out of the
  * scan. Reference counterpart being replaced: the reference has no WARC
  * plugin at all — its saas/http sources deliver pages one JSON event at a
  * time (`saas-crawler/.../CrawlerSourcePlugin.java`); this decode is what
  * lets the same pipeline start from raw crawl archives.
  *
  * Scale shape: `records(df, col)` is one decode projection + one
  * posexplode — no shuffle; WARC files are self-contained, so a 100 TB
  * crawl parallelizes as one task per file (or per file-split at the
  * member boundaries) exactly like the binaryFile source delivers them.
  */
object Warc {

  /** One decoded record. `payload` is the HTTP body for
    * application/http records, the raw record block otherwise. */
  final case class Rec(
      warc_type: String,
      target_uri: String,
      warc_date: String,
      record_id: String,
      content_type: String,
      content_length: Long,
      http_status: Integer,
      http_content_type: String,
      payload: Array[Byte],
      err: String)

  private def badRec(err: String): Rec =
    Rec(null, null, null, null, null, -1L, null, null, null, err)

  private val GzipMagic0 = 0x1f.toByte
  private val GzipMagic1 = 0x8b.toByte

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    // GZIPInputStream consumes concatenated members transparently —
    // exactly the Common Crawl member-per-record layout.
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 65536)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Header block parse: lines of `Name: value` until a blank line.
    * Returns (lowercased-name → value, offset just past the blank line),
    * or null on a malformed block. Header bytes are ISO-8859-1 per the
    * spec's treatment of named fields as octets. */
  private def parseHeaders(b: Array[Byte], from: Int)
      : (Map[String, String], Int) = {
    var i = from
    val m = Map.newBuilder[String, String]
    while (true) {
      var eol = i
      while (eol < b.length && b(eol) != '\n') eol += 1
      if (eol >= b.length) return null // no terminating blank line
      val lineEnd = if (eol > i && b(eol - 1) == '\r') eol - 1 else eol
      if (lineEnd == i) return (m.result(), eol + 1) // blank line
      val line = new String(b, i, lineEnd - i, ISO_8859_1)
      val colon = line.indexOf(':')
      if (colon > 0)
        m += (line.substring(0, colon).trim.toLowerCase ->
          line.substring(colon + 1).trim)
      // header line without a colon: tolerated (continuation lines are
      // rare in practice; treating them as noise keeps the parse total)
      i = eol + 1
    }
    null
  }

  /** JVM kernel: one WARC file's bytes → its records, in file order. */
  def recordsLocal(bytes: Array[Byte]): Seq[Rec] = {
    if (bytes == null || bytes.length == 0) return Seq.empty
    val b =
      if (bytes.length >= 2 && bytes(0) == GzipMagic0 && bytes(1) == GzipMagic1)
        try gunzipAll(bytes)
        catch { case scala.util.control.NonFatal(_) =>
          return Seq(badRec("bad_gzip")) }
      else bytes
    val out = Seq.newBuilder[Rec]
    var i = 0
    while (i < b.length) {
      // skip inter-record CRLFs
      while (i < b.length && (b(i) == '\r' || b(i) == '\n')) i += 1
      if (i >= b.length) return out.result()
      // version line
      var eol = i
      while (eol < b.length && b(eol) != '\n') eol += 1
      val verEnd = if (eol > i && eol <= b.length && b(eol - 1) == '\r') eol - 1 else eol
      val ver = new String(b, i, math.min(verEnd, b.length) - i, ISO_8859_1)
      if (!ver.startsWith("WARC/")) {
        out += badRec("bad_version_line"); return out.result()
      }
      val hdr = parseHeaders(b, eol + 1)
      if (hdr == null) { out += badRec("bad_headers"); return out.result() }
      val (h, bodyStart) = hdr
      val len = h.get("content-length").flatMap(s =>
        scala.util.Try(s.toLong).toOption).getOrElse(-1L)
      if (len < 0 || bodyStart + len > b.length) {
        out += badRec("bad_content_length"); return out.result()
      }
      val block = java.util.Arrays.copyOfRange(b, bodyStart,
        bodyStart + len.toInt)
      val ctype = h.getOrElse("content-type", null)
      val isHttp = ctype != null &&
        ctype.toLowerCase.startsWith("application/http")
      val (status, httpCt, payload) =
        if (isHttp) parseHttp(block) else (null, null, block)
      out += Rec(
        warc_type = h.getOrElse("warc-type", null),
        target_uri = h.getOrElse("warc-target-uri", null),
        warc_date = h.getOrElse("warc-date", null),
        record_id = h.getOrElse("warc-record-id", null),
        content_type = ctype,
        content_length = len,
        http_status = status,
        http_content_type = httpCt,
        payload = payload,
        err = null)
      i = bodyStart + len.toInt
    }
    out.result()
  }

  /** HTTP/1.1 message split: (status-or-null for requests, Content-Type,
    * body). A block that does not parse as HTTP is returned whole. */
  private def parseHttp(block: Array[Byte])
      : (Integer, String, Array[Byte]) = {
    var eol = 0
    while (eol < block.length && block(eol) != '\n') eol += 1
    if (eol >= block.length) return (null, null, block)
    val lineEnd = if (eol > 0 && block(eol - 1) == '\r') eol - 1 else eol
    val start = new String(block, 0, lineEnd, ISO_8859_1)
    val hdr = parseHeaders(block, eol + 1)
    if (hdr == null) return (null, null, block)
    val (h, bodyStart) = hdr
    val body = java.util.Arrays.copyOfRange(block, bodyStart, block.length)
    val status: Integer =
      if (start.startsWith("HTTP/")) {
        val parts = start.split(" ")
        if (parts.length >= 2)
          scala.util.Try(parts(1).toInt).toOption
            .map(Integer.valueOf).orNull
        else null
      } else null // request line (e.g. "GET /p HTTP/1.1")
    (status, h.getOrElse("content-type", null), body)
  }

  private val decodeUdf = udf { (bytes: Array[Byte]) => recordsLocal(bytes) }

  /** Explode a binary column of WARC file contents into one row per
    * record: `record_pos` (file order), the WARC named fields, the HTTP
    * split, `payload`, `err`. Other columns pass through. One decode
    * projection + one posexplode; no shuffle. */
  def records(df: DataFrame, bytesCol: String): DataFrame =
    df.select(df.columns.filter(_ != bytesCol).map(col).toSeq :+
        posexplode(decodeUdf(col(bytesCol))).as(Seq("record_pos", "_w")): _*)
      .select((df.columns.filter(_ != bytesCol).map(col).toSeq :+
        col("record_pos")) ++ Seq(
        col("_w")("warc_type").as("warc_type"),
        col("_w")("target_uri").as("target_uri"),
        col("_w")("warc_date").as("warc_date"),
        col("_w")("record_id").as("record_id"),
        col("_w")("content_type").as("content_type"),
        col("_w")("content_length").as("content_length"),
        col("_w")("http_status").as("http_status"),
        col("_w")("http_content_type").as("http_content_type"),
        col("_w")("payload").as("payload"),
        col("_w")("err").as("err")): _*)

  /** Read WARC files from a path (Spark binaryFile source) and explode to
    * records. `pathGlob` may be a directory or glob; each file is one
    * task — the crawl-archive parallelism unit. */
  def read(spark: org.apache.spark.sql.SparkSession,
      pathGlob: String): DataFrame =
    records(
      spark.read.format("binaryFile").load(pathGlob)
        .select(col("path"), col("content")),
      "content")

  // ------------------------------------------------------------------
  // Writer (fixture/export side — the decode path is what's under test)

  private val CRLF = "\r\n"

  private def headerBlock(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"$k: $v$CRLF" }.mkString

  /** Deterministic record id from the target URI (RFC 4122 shape via
    * md5 — stable across JVMs, so fixtures are reproducible). */
  def recordId(uri: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(uri.getBytes(UTF_8))
    val hex = d.map(x => f"$x%02x").mkString
    s"<urn:uuid:${hex.substring(0, 8)}-${hex.substring(8, 12)}-" +
      s"${hex.substring(12, 16)}-${hex.substring(16, 20)}-" +
      s"${hex.substring(20, 32)}>"
  }

  private def record(warcType: String, uri: String, dateIso: String,
      contentType: String, block: Array[Byte]): Array[Byte] = {
    val hdr = s"WARC/1.0$CRLF" + headerBlock(Seq(
      "WARC-Type" -> warcType,
      "WARC-Record-ID" -> recordId(s"$warcType:$uri"),
      "WARC-Date" -> dateIso) ++
      (if (uri != null) Seq("WARC-Target-URI" -> uri) else Nil) ++ Seq(
      "Content-Type" -> contentType,
      "Content-Length" -> block.length.toString)) + CRLF
    val hb = hdr.getBytes(ISO_8859_1)
    val out = new Array[Byte](hb.length + block.length + 4)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(block, 0, out, hb.length, block.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** A `response` record wrapping an HTTP 200 with an html/text body. */
  def responseRecord(uri: String, dateIso: String,
      body: Array[Byte], httpContentType: String = "text/html"): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK$CRLF" + headerBlock(Seq(
      "Content-Type" -> httpContentType,
      "Content-Length" -> body.length.toString)) + CRLF).getBytes(ISO_8859_1)
    val block = new Array[Byte](http.length + body.length)
    System.arraycopy(http, 0, block, 0, http.length)
    System.arraycopy(body, 0, block, http.length, body.length)
    record("response", uri, dateIso, "application/http; msgtype=response",
      block)
  }

  /** A `request` record (GET, empty body). */
  def requestRecord(uri: String, dateIso: String): Array[Byte] = {
    val path = {
      val i = uri.indexOf('/', uri.indexOf("//") + 2)
      if (i >= 0) uri.substring(i) else "/"
    }
    val http = (s"GET $path HTTP/1.1$CRLF" + headerBlock(Seq(
      "Host" -> uri.replaceFirst("^https?://", "").takeWhile(_ != '/'),
      "Accept" -> "*/*")) + CRLF).getBytes(ISO_8859_1)
    record("request", uri, dateIso, "application/http; msgtype=request",
      http)
  }

  /** A `warcinfo` file-header record. */
  def warcinfoRecord(dateIso: String, info: String): Array[Byte] =
    record("warcinfo", null, dateIso, "application/warc-fields",
      info.getBytes(UTF_8))

  private def gzipMember(rec: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(rec.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(rec); gz.close()
    bo.toByteArray
  }

  /** Concatenate records into one file; `gzipMembers=true` produces the
    * Common Crawl member-per-record layout. */
  def encodeFile(records: Seq[Array[Byte]],
      gzipMembers: Boolean = false): Array[Byte] = {
    val parts = if (gzipMembers) records.map(gzipMember) else records
    val out = new java.io.ByteArrayOutputStream(
      parts.map(_.length).sum + 16)
    parts.foreach(out.write)
    out.toByteArray
  }
}
