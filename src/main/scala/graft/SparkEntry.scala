package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analyze.Analyzer
import graft.ops.{Dedup, Graphs, Multimodal, Similarity, TextAnalysis}
import graft.pipeline.{Aggregates, Processors, Router, Route}
import graft.query.BruteForce

/** Driver contract — one entry per implemented operator (SURVEY.md §2),
  * each paired (where ANSI-SQL-expressible) with a DuckDB oracle over the
  * same parquet tables. Non-SQL-expressible operators (minhash, simhash,
  * xxhash fingerprints, LSH/IVF ANN, the corpus/index pipeline) register
  * rows-only here and carry their real verification in the scalatest
  * differential suites (brute-force vs WAND, cross-parallelism identity).
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def events(s: SparkSession, dir: String): DataFrame =
    // driver parquet carries TIMESTAMP_NTZ; engine semantics are UTC
    // instants (session tz pinned UTC) → cast once at the scan
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  private def lineitem(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")

  /** Flagship: the full north-rule slice with zero external input —
    * synthesize Common-Crawl-style pages, extract text (byte-identity
    * enforced by the corpus contract), tokenize, score BM25, top-10. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // the north-rule input shape, literally: synthesized pages land in an
    // ICEBERG table (own-kernel fixture writer) and the pipeline reads
    // them back through the own-kernel table-format reader before
    // extract → BM25
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft-entry-iceberg").toString
    graft.sources.Iceberg.write(spark,
      graft.corpus.SyntheticCorpus.generate(spark, 300, seed = 42L).toDF(),
      tableDir)
    val pages = graft.sources.Iceberg.read(spark, tableDir)
    val extractUdf = udf((h: Array[Byte]) => graft.extract.HtmlText.extract(h))
    val extracted = pages.withColumn("etext", extractUdf($"html"))
    BruteForce.topK(extracted.select($"url", $"etext"), "url", "etext",
      Seq("the", "w00001"), 10)
  }

  // ------------------------------------------------------------------
  // Registry: name -> (query fn, Option(oracle sql)).
  // Column names/types in the Spark result and the SQL MUST match.
  // ------------------------------------------------------------------

  private val tokSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

  /** OTLP/JSON span fixture from events: event_id → spanId, user_id →
    * traceId, every 4th event a root span, duration from `value` (µs);
    * decoded through the JSON wire path. Shared by q_otel_spans and
    * q_otel_service_map. */
  private def otelSpanFixture(e: DataFrame): DataFrame = {
    val startNs = (unix_micros(col("ts")) * 1000L).cast("string")
    val durNs = floor(abs(coalesce(col("value"), lit(0.0))) * 1000000.0) * 1000L
    val endNs = (unix_micros(col("ts")) * 1000L + durNs).cast("string")
    val spanId = lpad(lower(hex(col("event_id"))), 16, "0")
    val parentId = when(col("event_id") % 4 === 0, lit(""))
      .otherwise(lpad(lower(hex(
        call_function("div", col("event_id"), lit(4L)))), 16, "0"))
    val json = concat(
      lit("""{"resourceSpans":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"svc-"""),
      col("event_type"),
      lit(""""}}]},"scopeSpans":[{"scope":{"name":"graft"},"spans":[{"traceId":""""),
      lpad(lower(hex(col("user_id"))), 32, "0"),
      lit("""","spanId":""""), spanId,
      lit("""","parentSpanId":""""), parentId,
      lit("""","name":""""), col("event_type"),
      lit("""","kind":"SPAN_KIND_SERVER","startTimeUnixNano":""""), startNs,
      lit("""","endTimeUnixNano":""""), endNs,
      lit("""","attributes":[{"key":"uid","value":{"intValue":""""),
      col("user_id").cast("string"),
      lit(""""}}],"status":{"code":"STATUS_CODE_OK"}}]}]}]}"""))
    graft.sources.OtelJson.spans(e.withColumn("otlp", json).select("otlp"), "otlp")
  }

  /** Shared by q_otel_logs (JSON wire) and q_otel_logs_proto (protobuf
    * wire) — one oracle pins both decode paths equal. */
  private val otelLogsOracleSql: String =
    """SELECT epoch_us(ts) * 1000 AS timeUnixNano,
      | epoch_us(ts) * 1000 + 500000 AS observedTimeUnixNano,
      | 'svc-' || event_type AS serviceName,
      | CAST(9 + event_id % 5 AS INT) AS severityNumber,
      | CASE WHEN event_id % 2 = 0 THEN 'INFO' ELSE 'WARN' END AS severityText,
      | 'evt ' || event_type AS body,
      | printf('%032x', user_id) AS traceId,
      | printf('%016x', event_id) AS spanId,
      | CAST(user_id AS VARCHAR) AS uid_attr,
      | 'graft' AS scope_name
      | FROM events""".stripMargin

  /** Shared by q_otel_spans (JSON wire) and q_otel_spans_proto (protobuf
    * wire): both decode the same logical fixture, so one oracle pins both
    * paths — and pins them EQUAL to each other. */
  private val otelSpansOracleSql: String =
    """SELECT printf('%016x', event_id) AS spanId,
      | printf('%032x', user_id) AS traceId,
      | CASE WHEN event_id % 4 = 0 THEN ''
      |      ELSE printf('%016x', event_id // 4) END AS parentSpanId,
      | event_type AS name,
      | 'SPAN_KIND_SERVER' AS kind,
      | 'svc-' || event_type AS serviceName,
      | epoch_us(ts) * 1000 AS startTimeUnixNano,
      | epoch_us(ts) * 1000
      |   + CAST(floor(abs(coalesce(value, 0.0)) * 1000000.0) AS BIGINT) * 1000
      |   AS endTimeUnixNano,
      | CAST(floor(abs(coalesce(value, 0.0)) * 1000000.0) AS BIGINT) * 1000
      |   AS durationInNanos,
      | CASE WHEN event_id % 4 = 0 THEN event_type ELSE NULL END AS traceGroup,
      | CAST(user_id AS VARCHAR) AS uid_attr
      | FROM events""".stripMargin

  private val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // ---------- analyzer / index statistics family ----------
    ("q_tokenize", (s: SparkSession, dir: String) => {
      Analyzer.tokens(docs(s, dir), "doc_id", "text")
    }, Some(s"""SELECT doc_id, unnest($tokSql) AS term
               | FROM documents""".stripMargin)),

    ("q_doclen", (s: SparkSession, dir: String) => {
      Analyzer.tokens(docs(s, dir), "doc_id", "text")
        .groupBy("doc_id").agg(count(lit(1)).as("dl"))
    }, Some(s"""SELECT doc_id, len($tokSql) AS dl FROM documents""")),

    ("q_term_stats", (s: SparkSession, dir: String) => {
      Analyzer.termFreqs(docs(s, dir), "doc_id", "text")
        .groupBy("term").agg(count(lit(1)).as("df"), sum("tf").as("total_tf"))
    }, Some(s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents)
               | SELECT term, count(DISTINCT doc_id) AS df, count(*) AS total_tf
               | FROM toks GROUP BY term""".stripMargin)),

    ("q_bm25_topk", (s: SparkSession, dir: String) => {
      bm25TopK(docs(s, dir), Seq("spark", "hash", "join"), 20)
    }, Some(bm25Sql(Seq("spark", "hash", "join"), 20))),

    ("q_bm25_topk_stopheavy", (s: SparkSession, dir: String) => {
      bm25TopK(docs(s, dir), Seq("the", "data", "query"), 20)
    }, Some(bm25Sql(Seq("the", "data", "query"), 20))),

    ("q_phrase_topk", (s: SparkSession, dir: String) => {
      phraseTopKRounded(docs(s, dir), Seq("table", "hash"), 20)
    }, Some(phraseSql(Seq("table", "hash"), 20))),

    ("q_phrase_topk_trigram", (s: SparkSession, dir: String) => {
      phraseTopKRounded(docs(s, dir), Seq("row", "column", "sort"), 10)
    }, Some(phraseSql(Seq("row", "column", "sort"), 10))),

    ("q_phrase_slop", (s: SparkSession, dir: String) => {
      phraseSlopTopKRounded(docs(s, dir), Seq("table", "hash"), 2, 20)
    }, Some(phraseSlopSql(Seq("table", "hash"), 2, 20))),

    ("q_phrase_slop_trigram", (s: SparkSession, dir: String) => {
      phraseSlopTopKRounded(docs(s, dir), Seq("row", "column", "sort"), 3, 15)
    }, Some(phraseSlopSql(Seq("row", "column", "sort"), 3, 15))),

    // ---------- mutate algebra (SURVEY §2.4) ----------
    ("q_add_entries", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.AddEntry("doc_ref", concat(col("source"), lit(":"), col("doc_id"))),
        Processors.AddEntry("is_long", (col("n_chars") > 300).cast("int")),
        Processors.SelectEntries("doc_id", "doc_ref", "is_long"))(docs(s, dir))
    }, Some("""SELECT doc_id, source || ':' || CAST(doc_id AS VARCHAR) AS doc_ref,
              | CAST(n_chars > 300 AS INT) AS is_long FROM documents""".stripMargin)),

    ("q_rename_copy_delete", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.CopyValue("lang", "lang_copy"),
        Processors.RenameKeys("text" -> "body"),
        Processors.DeleteEntries("source", "n_chars"))(docs(s, dir))
    }, Some("SELECT doc_id, text AS body, lang, lang AS lang_copy FROM documents")),

    ("q_select_entries", (s: SparkSession, dir: String) => {
      Processors.SelectEntries("doc_id", "lang")(docs(s, dir))
    }, Some("SELECT doc_id, lang FROM documents")),

    ("q_convert_type", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.ConvertType("value", "bigint"),
        Processors.SelectEntries("event_id", "value"))(events(s, dir))
    }, Some("SELECT event_id, CAST(trunc(value) AS BIGINT) AS value FROM events")),

    ("q_drop_events", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.DropEvents(col("value") < 10.0),
        Processors.SelectEntries("event_id", "event_type", "value"))(events(s, dir))
    }, Some("SELECT event_id, event_type, value FROM events WHERE NOT (value < 10.0)")),

    ("q_split_event", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.SelectEntries("doc_id", "text"),
        Processors.SplitEvent("text", " "))(docs(s, dir))
        .withColumnRenamed("text", "part")
    }, Some("SELECT doc_id, unnest(string_split(text, ' ')) AS part FROM documents")),

    ("q_truncate", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.Truncate("text", startAt = 5, len = Some(40)),
        Processors.SelectEntries("doc_id", "text"))(docs(s, dir))
        .withColumnRenamed("text", "snippet")
    }, Some("SELECT doc_id, substr(text, 6, 40) AS snippet FROM documents")),

    ("q_obfuscate_mask", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.ObfuscateMask("text", "[0-9]+", "#", 3),
        Processors.SelectEntries("doc_id", "text"))(docs(s, dir))
        .withColumnRenamed("text", "masked")
    }, Some("SELECT doc_id, regexp_replace(text, '[0-9]+', '###', 'g') AS masked FROM documents")),

    ("q_obfuscate_hash", (s: SparkSession, dir: String) => {
      docs(s, dir).select(col("doc_id"),
        sha2(concat(col("text"), lit("pepper")), 256).as("hashed"))
    }, Some("SELECT doc_id, sha256(text || 'pepper') AS hashed FROM documents")),

    ("q_string_ops", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.UppercaseString("lang"),
        Processors.LowercaseString("source"),
        Processors.TrimString("text"),
        Processors.SelectEntries("doc_id", "lang", "source"))(docs(s, dir))
    }, Some("SELECT doc_id, upper(lang) AS lang, lower(source) AS source FROM documents")),

    ("q_substitute_string", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.SubstituteString("text", "[aeiou]", "_"),
        Processors.SelectEntries("doc_id", "text"))(docs(s, dir))
        .withColumnRenamed("text", "subbed")
    }, Some("SELECT doc_id, regexp_replace(text, '[aeiou]', '_', 'g') AS subbed FROM documents")),

    ("q_split_string", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.SplitString("source", "c"),
        Processors.SelectEntries("doc_id", "source"))(docs(s, dir))
        .select(col("doc_id"), size(col("source")).as("n_parts"))
    }, Some("SELECT doc_id, len(string_split(source, 'c')) AS n_parts FROM documents")),

    // ---------- parsers / extractors (SURVEY §2.5) ----------
    ("q_grok_extract", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.RegexExtract("props", "\\{\"k\": ([0-9]+)\\}", Seq("k" -> 1)),
        Processors.SelectEntries("event_id", "k"))(events(s, dir))
    }, Some("SELECT event_id, regexp_extract(props, '\\{\"k\": ([0-9]+)\\}', 1) AS k FROM events")),

    ("q_dissect", (s: SparkSession, dir: String) => {
      val withLine = docs(s, dir).withColumn("line",
        concat(lit("lang="), col("lang"), lit(" src="), col("source")))
      graft.pipeline.Pipeline(
        Processors.Dissect("line", "lang=%{dlang} src=%{dsrc}"),
        Processors.SelectEntries("doc_id", "dlang", "dsrc"))(withLine)
    }, Some("SELECT doc_id, lang AS dlang, source AS dsrc FROM documents")),

    ("q_date_parse", (s: SparkSession, dir: String) => {
      // DateParse end-to-end over a MIXED fixture: three source formats in
      // one column (NY-wall-clock local, epoch millis, zoned http-date) —
      // first-match-wins multi-pattern + source_timezone + epoch patterns
      // + epoch output format (DateProcessorConfig.java:46-53 surface).
      val raw = when(col("event_id") % 3 === 0,
          date_format(from_utc_timestamp(col("ts"), "America/New_York"),
            "yyyy-MM-dd HH:mm:ss"))
        .when(col("event_id") % 3 === 1, unix_millis(col("ts")).cast("string"))
        .otherwise(date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss Z"))
      graft.pipeline.Pipeline(
        Processors.DateParse("raw",
          patterns = Seq("yyyy-MM-dd HH:mm:ss", "epoch_milli", "dd/MMM/yyyy:HH:mm:ss Z"),
          destination = "parsed_us",
          sourceTimezone = "America/New_York",
          outputFormat = "epoch_micro"))(
        events(s, dir).withColumn("raw", raw))
        .select(col("event_id"), col("parsed_us").cast("long").as("ts_us"))
    }, Some("""SELECT event_id,
              | CASE WHEN event_id % 3 = 1 THEN epoch_ms(ts) * 1000
              |      ELSE epoch_us(date_trunc('second', ts)) END AS ts_us
              | FROM events""".stripMargin)),

    ("q_grok_patterns", (s: SparkSession, dir: String) => {
      // %{COMMONAPACHELOG} from the embedded pattern library over a line
      // BUILT from event columns — self-validating against the oracle's
      // direct column reconstruction (GrokProcessor.java:63 parity).
      val line = concat(
        lit("10."), pmod(col("user_id"), lit(200)), lit(".0.1 - user"),
        col("user_id"), lit(" ["),
        date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss Z"), lit("] \"GET /api/"),
        col("event_type"), lit("/"), col("event_id"), lit(" HTTP/1.1\" 200 "),
        (col("value") * 100).cast("long"))
      graft.pipeline.Grok("line", Seq("%{COMMONAPACHELOG}"))(
        events(s, dir).withColumn("line", line))
        .select(col("event_id"), col("clientip"), col("auth"),
          col("timestamp"), col("verb"), col("request"), col("response"),
          col("bytes"))
    }, Some("""SELECT event_id,
              | '10.' || CAST(user_id % 200 AS VARCHAR) || '.0.1' AS clientip,
              | 'user' || CAST(user_id AS VARCHAR) AS auth,
              | strftime(ts, '%d/%b/%Y:%H:%M:%S') || ' +0000' AS timestamp,
              | 'GET' AS verb,
              | '/api/' || event_type || '/' || CAST(event_id AS VARCHAR) AS request,
              | '200' AS response,
              | CAST(CAST(trunc(value * 100) AS BIGINT) AS VARCHAR) AS bytes
              | FROM events""".stripMargin)),

    ("q_add_entries_format", (s: SparkSession, dir: String) => {
      // ${key}/${expr} format-string templating (JacksonEvent.java:544-586)
      graft.pipeline.Pipeline(
        Processors.AddEntry.format("doc_key",
          "${source}/${lang}-${/doc_id}.part${/doc_id % 4}"),
        Processors.SelectEntries("doc_id", "doc_key"))(docs(s, dir))
    }, Some("""SELECT doc_id, source || '/' || lang || '-' ||
              | CAST(doc_id AS VARCHAR) || '.part' ||
              | CAST(doc_id % 4 AS VARCHAR) AS doc_key
              | FROM documents""".stripMargin)),

    ("q_key_value_grouped", (s: SparkSession, dir: String) => {
      // value_grouping + transform_key + defaults + include/exclude
      // (KeyValueProcessorConfig.java:49-273)
      val kvline = docs(s, dir).withColumn("kvline",
        concat(lit("Lang="), col("lang"), lit(" note=\"from "), col("source"),
          lit(" x\" SRC=["), col("source"), lit("] drop=me")))
      Processors.KeyValueAdvanced("kvline", "kv",
        fieldSplitCharacters = " ", keyValueDelimiterCharacters = "=",
        valueGrouping = true, excludeKeys = Seq("drop"),
        defaultValues = Map("tier" -> "std"),
        transformKey = "lowercase", removeBrackets = true)(kvline)
        .select(col("doc_id"),
          element_at(col("kv")("lang"), 1).as("kv_lang"),
          element_at(col("kv")("note"), 1).as("kv_note"),
          element_at(col("kv")("src"), 1).as("kv_src"),
          element_at(col("kv")("tier"), 1).as("kv_tier"),
          map_contains_key(col("kv"), "drop").cast("int").as("has_drop"))
    }, Some("""SELECT doc_id, lang AS kv_lang,
              | '"from ' || source || ' x"' AS kv_note,
              | source AS kv_src, 'std' AS kv_tier, 0 AS has_drop
              | FROM documents""".stripMargin)),

    ("q_key_value_recursive", (s: SparkSession, dir: String) => {
      // recursive bracket-group parsing → JSON (createRecursedMap analog)
      val kvline = docs(s, dir).withColumn("kvline",
        concat(lit("outer="), col("lang"), lit("&nest=[a="), col("source"),
          lit("&b=2]")))
      Processors.KeyValueRecursive("kvline", "kvj")(kvline)
        .select(col("doc_id"),
          get_json_object(col("kvj"), "$.outer").as("outer_v"),
          get_json_object(col("kvj"), "$.nest.a").as("nest_a"),
          get_json_object(col("kvj"), "$.nest.b").as("nest_b"))
    }, Some("""SELECT doc_id, lang AS outer_v, source AS nest_a, '2' AS nest_b
              | FROM documents""".stripMargin)),

    ("q_csv_roundtrip", (s: SparkSession, dir: String) => {
      val withCsv = docs(s, dir).withColumn("line",
        concat(col("source"), lit(","), col("lang")))
      graft.pipeline.Pipeline(
        Processors.CsvParse("line", Seq("csrc", "clang")),
        Processors.SelectEntries("doc_id", "csrc", "clang"))(withCsv)
    }, Some("SELECT doc_id, source AS csrc, lang AS clang FROM documents")),

    ("q_key_value", (s: SparkSession, dir: String) => {
      val kvline = docs(s, dir).withColumn("kvline",
        concat(lit("lang="), col("lang"), lit("&src="), col("source")))
      Processors.KeyValue("kvline", "kv", "&", "=")(kvline)
        .select(col("doc_id"), col("kv")("lang").as("kv_lang"), col("kv")("src").as("kv_src"))
    }, Some("SELECT doc_id, lang AS kv_lang, source AS kv_src FROM documents")),

    ("q_parse_json", (s: SparkSession, dir: String) => {
      events(s, dir).select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
    }, Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events")),

    ("q_parse_ion", (s: SparkSession, dir: String) => {
      // Ion text event (annotations, symbol values, typed int) → struct
      val ion = docs(s, dir).withColumn("ion",
        concat(lit("doc::{lang:"), col("lang"), lit(", src:\""),
          col("source"), lit("\", n:count::"), col("n_chars"), lit("}")))
      graft.pipeline.Pipeline(
        Processors.ParseIon("ion", "lang STRING, src STRING, n BIGINT", "p"))(ion)
        .select(col("doc_id"), col("p")("lang").as("ilang"),
          col("p")("src").as("isrc"), col("p")("n").as("in_chars"))
    }, Some("""SELECT doc_id, lang AS ilang, source AS isrc,
              | CAST(n_chars AS BIGINT) AS in_chars FROM documents""".stripMargin)),

    ("q_parse_ion_binary", (s: SparkSession, dir: String) => {
      // the SAME logical event as q_parse_ion, on the BINARY Ion wire form
      // (local symbol table, doc::-annotated struct, count::-annotated int
      // field) — assembled per row from the public Ion 1.0 encoding, then
      // decoded by the IonBinary own kernel; same oracle as the text path
      val enc = udf { (lang: String, src: String, n: Long) =>
        import java.nio.charset.StandardCharsets.UTF_8
        def varU(v: Long): Seq[Byte] = {
          val groups = Iterator.iterate(v)(_ >>> 7).takeWhile(_ != 0)
            .map(x => (x & 0x7f).toByte).toSeq.reverse
          val gs = if (groups.isEmpty) Seq(0.toByte) else groups
          gs.init ++ Seq((gs.last | 0x80).toByte)
        }
        def tl(t: Int, len: Int): Seq[Byte] =
          if (len < 14 && !(t == 13 && len == 1)) Seq(((t << 4) | len).toByte)
          else Seq(((t << 4) | 14).toByte) ++ varU(len.toLong)
        def str(x: String): Seq[Byte] = {
          val b = x.getBytes(UTF_8).toSeq; tl(8, b.size) ++ b
        }
        def posInt(v: Long): Seq[Byte] = {
          val mag = BigInt(v).toByteArray.dropWhile(_ == 0).toSeq
          tl(2, mag.size) ++ mag
        }
        def annot(sid: Int, value: Seq[Byte]): Seq[Byte] = {
          val annots = varU(sid.toLong)
          val body = varU(annots.size.toLong) ++ annots ++ value
          tl(14, body.size) ++ body
        }
        // local symbol table: sids 10..14
        val names = Seq("lang", "src", "n", "doc", "count")
        val items = names.flatMap(str)
        val symList = tl(11, items.size) ++ items
        val stBody = varU(7L) ++ symList
        val symtab = annot(3, tl(13, stBody.size) ++ stBody)
        // {lang: "<lang>", src: "<src>", n: count::<n>}
        val fields = varU(10L) ++ str(lang) ++ varU(11L) ++ str(src) ++
          varU(12L) ++ annot(14, posInt(n))
        val doc = annot(13, tl(13, fields.size) ++ fields)
        (Seq(0xE0, 0x01, 0x00, 0xEA).map(_.toByte) ++ symtab ++ doc).toArray
      }
      val ion = docs(s, dir).withColumn("ion",
        enc(col("lang"), col("source"), col("n_chars").cast("long")))
      graft.pipeline.Pipeline(
        Processors.ParseIonBinary("ion", "lang STRING, src STRING, n BIGINT", "p"))(ion)
        .select(col("doc_id"), col("p")("lang").as("ilang"),
          col("p")("src").as("isrc"), col("p")("n").as("in_chars"))
    }, Some("""SELECT doc_id, lang AS ilang, source AS isrc,
              | CAST(n_chars AS BIGINT) AS in_chars FROM documents""".stripMargin)),

    ("q_parse_xml", (s: SparkSession, dir: String) => {
      val withXml = docs(s, dir).withColumn("xml",
        concat(lit("<r><lang>"), col("lang"), lit("</lang><src>"),
          col("source"), lit("</src></r>")))
      graft.pipeline.Pipeline(
        Processors.ParseXml("xml", "lang STRING, src STRING", "p"))(withXml)
        .select(col("doc_id"), col("p")("lang").as("xlang"), col("p")("src").as("xsrc"))
    }, Some("SELECT doc_id, lang AS xlang, source AS xsrc FROM documents")),

    ("q_otel_spans", (s: SparkSession, dir: String) => {
      otelSpanFixture(events(s, dir))
        .select(col("spanId"), col("traceId"), col("parentSpanId"),
          col("name"), col("kind"), col("serviceName"),
          col("startTimeUnixNano"), col("endTimeUnixNano"),
          col("durationInNanos"), col("traceGroup"),
          element_at(col("attributes"), "uid").as("uid_attr"))
    }, Some(otelSpansOracleSql)),

    ("q_otel_spans_proto", (s: SparkSession, dir: String) => {
      // the SAME logical span fixture as q_otel_spans, but on the binary
      // protobuf wire form (reference otlp-source's native encoding) —
      // encode per row with the own-kernel writer, decode with
      // spansFromProto, and the shared oracle must match byte-for-byte
      val e = events(s, dir)
      val enc = udf { (traceId: String, spanId: String, parent: String,
          name: String, svc: String, startNs: Long, endNs: Long, uid: Long) =>
        import graft.sources.OtlpProto._
        encodeTraceRequest(PTraceRequest(Seq(PResourceSpans(
          Some(PResource(Seq(PKV("service.name",
            PAny(Some(svc), None, None, None))))),
          Seq(PScopeSpans(Some(PScope(Some("graft"), None)),
            Seq(PSpan(Some(traceId), Some(spanId),
              if (parent.isEmpty) None else Some(parent), None,
              Some(name), Some("SPAN_KIND_SERVER"),
              Some(startNs.toString), Some(endNs.toString),
              Seq(PKV("uid", PAny(None, Some(uid.toString), None, None))),
              Some(PStatus(Some("STATUS_CODE_OK"), None))))))))))
      }
      val startNs = unix_micros(col("ts")) * 1000L
      val durNs = floor(abs(coalesce(col("value"), lit(0.0))) * 1000000.0).cast("long") * 1000L
      val bin = enc(
        lpad(lower(hex(col("user_id"))), 32, "0"),
        lpad(lower(hex(col("event_id"))), 16, "0"),
        when(col("event_id") % 4 === 0, lit("")).otherwise(
          lpad(lower(hex(call_function("div", col("event_id"), lit(4L)))), 16, "0")),
        col("event_type"),
        concat(lit("svc-"), col("event_type")),
        startNs, startNs + durNs, col("user_id"))
      graft.sources.OtelJson.spansFromProto(
          e.withColumn("otlp", bin).select("otlp"), "otlp")
        .select(col("spanId"), col("traceId"), col("parentSpanId"),
          col("name"), col("kind"), col("serviceName"),
          col("startTimeUnixNano"), col("endTimeUnixNano"),
          col("durationInNanos"), col("traceGroup"),
          element_at(col("attributes"), "uid").as("uid_attr"))
    }, Some(otelSpansOracleSql)),

    ("q_otlp_export", (s: SparkSession, dir: String) => {
      // the EXPORT direction (reference otlp-sink): the flattened span
      // rows re-encode as batched ExportTraceServiceRequests through the
      // own-kernel proto writer (one ResourceSpans per event, batches =
      // field-1 concatenation), then the engine's OWN wire decoder reads
      // the payloads back — and the result must satisfy q_otel_spans'
      // oracle, pinning decode∘export ≡ identity end to end on 10k spans.
      val rows = otelSpanFixture(events(s, dir))
      val payloads = graft.sinks.OtlpExport.traceRequests(rows,
        graft.sinks.OtlpExport.Thresholds(maxEvents = 512))
      graft.sources.OtelJson.spansFromProto(
          payloads.select("payload"), "payload")
        .select(col("spanId"), col("traceId"), col("parentSpanId"),
          col("name"), col("kind"), col("serviceName"),
          col("startTimeUnixNano"), col("endTimeUnixNano"),
          col("durationInNanos"), col("traceGroup"),
          element_at(col("attributes"), "uid").as("uid_attr"))
    }, Some(otelSpansOracleSql)),

    ("q_otel_service_map", (s: SparkSession, dir: String) => {
      // otel_apm_service_map / service-map-stateful: cross-service
      // parent→child span pairs become destination+target relationship
      // rows — one keyed self-join replaces the reference's 3-window
      // stateful processor + peer forwarder
      graft.pipeline.Aggregates.serviceMapRelationships(
        otelSpanFixture(events(s, dir)))
    }, Some("""WITH sp AS (SELECT event_id, user_id, event_type FROM events),
              | pairs AS (
              |   SELECT p.event_type AS ptype, c.event_type AS ctype,
              |          c.user_id AS cuid
              |   FROM sp c JOIN sp p ON p.event_id = c.event_id // 4
              |   WHERE c.event_id % 4 <> 0 AND p.event_type <> c.event_type),
              | roots AS (SELECT user_id, min(event_type) AS tg FROM events
              |   WHERE event_id % 4 = 0 GROUP BY 1),
              | j AS (SELECT pairs.*, roots.tg FROM pairs
              |   LEFT JOIN roots ON roots.user_id = pairs.cuid),
              | rels AS (
              |   SELECT 'svc-' || ptype AS serviceName,
              |     'SPAN_KIND_SERVER' AS kind,
              |     'svc-' || ctype AS destinationDomain,
              |     ctype AS destinationResource,
              |     CAST(NULL AS VARCHAR) AS targetDomain,
              |     CAST(NULL AS VARCHAR) AS targetResource,
              |     tg AS traceGroupName, 'destination' AS relType FROM j
              |   UNION ALL
              |   SELECT 'svc-' || ctype, 'SPAN_KIND_SERVER',
              |     CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
              |     'svc-' || ctype, ctype, tg, 'target' FROM j)
              | SELECT DISTINCT * FROM rels""".stripMargin)),

    ("q_otel_logs", (s: SparkSession, dir: String) => {
      // otel_logs_source decode path, JSON wire form: events → OTLP/JSON
      // ExportLogsServiceRequest → reference-shaped log rows
      val e = events(s, dir)
      val timeNs = (unix_micros(col("ts")) * 1000L).cast("string")
      val obsNs = (unix_micros(col("ts")) * 1000L + 500000L).cast("string")
      val json = concat(
        lit("""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"svc-"""),
        col("event_type"),
        lit(""""}}]},"scopeLogs":[{"scope":{"name":"graft"},"logRecords":[{"timeUnixNano":""""),
        timeNs,
        lit("""","observedTimeUnixNano":""""), obsNs,
        lit("""","severityNumber":"""), (col("event_id") % 5 + 9).cast("int"),
        lit(""","severityText":""""),
        when(col("event_id") % 2 === 0, lit("INFO")).otherwise(lit("WARN")),
        lit("""","body":{"stringValue":"evt """), col("event_type"),
        lit(""""},"attributes":[{"key":"uid","value":{"intValue":""""),
        col("user_id").cast("string"),
        lit(""""}}],"traceId":""""), lpad(lower(hex(col("user_id"))), 32, "0"),
        lit("""","spanId":""""), lpad(lower(hex(col("event_id"))), 16, "0"),
        lit(""""}]}]}]}"""))
      graft.sources.OtelLogs.logs(e.withColumn("otlp", json).select("otlp"), "otlp")
        .select(col("timeUnixNano"), col("observedTimeUnixNano"),
          col("serviceName"), col("severityNumber"), col("severityText"),
          col("body"), col("traceId"), col("spanId"),
          element_at(col("attributes"), "log.attributes.uid").as("uid_attr"),
          element_at(col("attributes"), "instrumentationScope.name").as("scope_name"))
    }, Some(otelLogsOracleSql)),

    ("q_otel_logs_proto", (s: SparkSession, dir: String) => {
      // the SAME logical log fixture on the binary protobuf wire form
      val e = events(s, dir)
      val enc = udf { (svc: String, timeNs: Long, obsNs: Long, sevNum: Int,
          sevText: String, body: String, uid: Long, traceId: String,
          spanId: String) =>
        import graft.sources.OtlpProto._
        encodeLogsRequest(LLogsRequest(Seq(LResourceLogs(
          Some(PResource(Seq(PKV("service.name",
            PAny(Some(svc), None, None, None))))),
          Seq(LScopeLogs(Some(PScope(Some("graft"), None)),
            Seq(LLogRecord(Some(timeNs.toString), Some(obsNs.toString),
              Some(sevNum), Some(sevText),
              Some(PAny(Some(body), None, None, None)),
              Seq(PKV("uid", PAny(None, Some(uid.toString), None, None))),
              None, None, Some(traceId), Some(spanId)))))))))
      }
      val timeNs = unix_micros(col("ts")) * 1000L
      val bin = enc(
        concat(lit("svc-"), col("event_type")),
        timeNs, timeNs + 500000L,
        (col("event_id") % 5 + 9).cast("int"),
        when(col("event_id") % 2 === 0, lit("INFO")).otherwise(lit("WARN")),
        concat(lit("evt "), col("event_type")),
        col("user_id"),
        lpad(lower(hex(col("user_id"))), 32, "0"),
        lpad(lower(hex(col("event_id"))), 16, "0"))
      graft.sources.OtelLogs.logsFromProto(
          e.withColumn("otlp", bin).select("otlp"), "otlp")
        .select(col("timeUnixNano"), col("observedTimeUnixNano"),
          col("serviceName"), col("severityNumber"), col("severityText"),
          col("body"), col("traceId"), col("spanId"),
          element_at(col("attributes"), "log.attributes.uid").as("uid_attr"),
          element_at(col("attributes"), "instrumentationScope.name").as("scope_name"))
    }, Some(otelLogsOracleSql)),

    ("q_otlp_logs_export", (s: SparkSession, dir: String) => {
      // the logs EXPORT direction: flattened log rows (the OtelLogs
      // decode shape, built closed-form) re-encode as batched
      // ExportLogsServiceRequests through the own-kernel proto writer,
      // the engine's OWN wire decoder reads the payloads back, and the
      // result must satisfy q_otel_logs' oracle — decode∘export ≡
      // identity, the logs analog of q_otlp_export.
      val e = events(s, dir)
      val timeNs = unix_micros(col("ts")) * 1000L
      val rows = e.select(
        timeNs.as("timeUnixNano"),
        (timeNs + 500000L).as("observedTimeUnixNano"),
        concat(lit("svc-"), col("event_type")).as("serviceName"),
        (col("event_id") % 5 + 9).cast("int").as("severityNumber"),
        when(col("event_id") % 2 === 0, "INFO").otherwise("WARN")
          .as("severityText"),
        concat(lit("evt "), col("event_type")).as("body"),
        lpad(lower(hex(col("user_id"))), 32, "0").as("traceId"),
        lpad(lower(hex(col("event_id"))), 16, "0").as("spanId"),
        map(
          lit("log.attributes.uid"), col("user_id").cast("string"),
          lit("instrumentationScope.name"), lit("graft"),
          lit("resource.attributes.service@name"),
          concat(lit("svc-"), col("event_type"))).as("attributes"))
      val payloads = graft.sinks.OtlpExport.logRequests(rows,
        graft.sinks.OtlpExport.Thresholds(maxEvents = 256))
      graft.sources.OtelLogs.logsFromProto(
          payloads.select("payload"), "payload")
        .select(col("timeUnixNano"), col("observedTimeUnixNano"),
          col("serviceName"), col("severityNumber"), col("severityText"),
          col("body"), col("traceId"), col("spanId"),
          element_at(col("attributes"), "log.attributes.uid").as("uid_attr"),
          element_at(col("attributes"), "instrumentationScope.name")
            .as("scope_name"))
    }, Some(otelLogsOracleSql)),

    ("q_event_json", (s: SparkSession, dir: String) => {
      // reference event_json round-trip: events rows -> per-partition
      // wrapped documents -> decode back (data columns + _meta)
      val in = events(s, dir)
        .withColumn("_meta", struct(
          lit("LOG").as("event_type"),
          array(col("event_type")).as("tags"),
          map(lit("uid"), col("user_id").cast("string")).as("attributes"),
          col("ts").as("time_received")))
      val docs = graft.sources.EventJson.documents(
        graft.sources.EventJson.eventObjects(in, Seq("event_id", "event_type", "value")))
      graft.sources.EventJson.decode(
          docs.toDF().withColumnRenamed("value", "j"), "j",
          "event_id BIGINT, event_type STRING, value DOUBLE",
          overrideTimeReceived = true)
        .select(col("event_id"), col("event_type"), col("value"),
          col("_meta.event_type").as("meta_type"),
          element_at(col("_meta.tags"), 1).as("tag0"),
          element_at(col("_meta.attributes"), "uid").as("uid"),
          unix_micros(col("_meta.time_received")).as("received_us"))
    }, Some("""SELECT event_id, event_type, value,
              | 'LOG' AS meta_type, event_type AS tag0,
              | CAST(user_id AS VARCHAR) AS uid,
              | epoch_us(ts) AS received_us
              | FROM events""".stripMargin)),

    ("q_otel_metrics", (s: SparkSession, dir: String) => {
      // OTLP/JSON metrics fixture from events: per event one gauge
      // datapoint (value, metric attr e.id) and one histogram datapoint
      // (3 buckets derived from event_id, bounds [10, 20])
      val e = events(s, dir)
      val tNs = (unix_micros(col("ts")) * 1000L).cast("string")
      val c1 = (col("event_id") % 5).cast("string")
      val c2 = (col("event_id") % 7).cast("string")
      val c3 = (col("event_id") % 3).cast("string")
      val json = concat(
        lit("""{"resourceMetrics":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"svc-"""),
        col("event_type"),
        lit(""""}},{"key":"host.name","value":{"stringValue":"h"""),
        (col("event_id") % 4).cast("string"),
        lit(""""}}]},"scopeMetrics":[{"scope":{"name":"graft","version":"1"},"metrics":[""" +
          """{"name":"lat","unit":"ms","gauge":{"dataPoints":[{"timeUnixNano":""""),
        tNs,
        lit("""","asDouble":"""), coalesce(col("value"), lit(0.0)).cast("string"),
        lit(""","attributes":[{"key":"e.id","value":{"intValue":""""),
        col("event_id").cast("string"),
        lit(""""}}]}]}},{"name":"lat_hist","histogram":{"aggregationTemporality":"AGGREGATION_TEMPORALITY_DELTA","dataPoints":[{"timeUnixNano":""""),
        tNs,
        lit("""","count":""""), (col("event_id") % 5 + col("event_id") % 7 + col("event_id") % 3).cast("string"),
        lit("""","sum":"""), (col("event_id") % 100).cast("string"),
        lit(""".0,"bucketCounts":[""""), c1, lit("""",""""), c2, lit("""",""""), c3,
        lit(""""],"explicitBounds":[10.0,20.0]}]}}]}]}]}"""))
      graft.sources.OtelMetrics.metrics(
          e.withColumn("otlp", json).select("otlp"), "otlp")
        .select(col("kind"), col("name"), col("unit"), col("serviceName"),
          col("timeUnixNano"), col("value"), col("count"), col("sum"),
          element_at(col("buckets"), 1)("min").as("b1_min"),
          element_at(col("buckets"), 1)("count").as("b1_cnt"),
          element_at(col("buckets"), 2)("count").as("b2_cnt"),
          element_at(col("buckets"), 3)("max").as("b3_max"),
          element_at(col("buckets"), 3)("count").as("b3_cnt"),
          element_at(col("attributes"), "metric.attributes.e@id").as("eid"),
          element_at(col("attributes"), "resource.attributes.host@name").as("host"))
    }, Some("""SELECT 'gauge' AS kind, 'lat' AS name, 'ms' AS unit,
              | 'svc-' || event_type AS serviceName,
              | epoch_us(ts) * 1000 AS timeUnixNano,
              | coalesce(value, 0.0) AS value,
              | CAST(NULL AS BIGINT) AS count, CAST(NULL AS DOUBLE) AS sum,
              | CAST(NULL AS DOUBLE) AS b1_min, CAST(NULL AS BIGINT) AS b1_cnt,
              | CAST(NULL AS BIGINT) AS b2_cnt, CAST(NULL AS DOUBLE) AS b3_max,
              | CAST(NULL AS BIGINT) AS b3_cnt,
              | CAST(event_id AS VARCHAR) AS eid,
              | 'h' || (event_id % 4) AS host
              | FROM events
              | UNION ALL
              | SELECT 'histogram', 'lat_hist', CAST(NULL AS VARCHAR),
              | 'svc-' || event_type,
              | epoch_us(ts) * 1000,
              | CAST(NULL AS DOUBLE),
              | CAST(event_id % 5 + event_id % 7 + event_id % 3 AS BIGINT),
              | CAST(event_id % 100 AS DOUBLE),
              | -3.4028234663852886e38, CAST(event_id % 5 AS BIGINT),
              | CAST(event_id % 7 AS BIGINT), 3.4028234663852886e38,
              | CAST(event_id % 3 AS BIGINT),
              | CAST(NULL AS VARCHAR),
              | 'h' || (event_id % 4)
              | FROM events""".stripMargin)),

    ("q_prom_remote_write", (s: SparkSession, dir: String) => {
      // prometheus-sink fan-out over the q_otel_metrics fixture: each
      // event yields one gauge (unit ms -> _milliseconds, dp attr e.id)
      // and one delta histogram (3 buckets, bounds [10, 20]); the oracle
      // replays name expansion, label sanitize + sort, and the
      // count/sum/bucket fan-out row-for-row
      val e = events(s, dir)
      val tNs = (unix_micros(col("ts")) * 1000L).cast("string")
      val c1 = (col("event_id") % 5).cast("string")
      val c2 = (col("event_id") % 7).cast("string")
      val c3 = (col("event_id") % 3).cast("string")
      val json = concat(
        lit("""{"resourceMetrics":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"svc-"""),
        col("event_type"),
        lit(""""}},{"key":"host.name","value":{"stringValue":"h"""),
        (col("event_id") % 4).cast("string"),
        lit(""""}}]},"scopeMetrics":[{"scope":{"name":"graft","version":"1"},"metrics":[""" +
          """{"name":"lat","unit":"ms","gauge":{"dataPoints":[{"timeUnixNano":""""),
        tNs,
        lit("""","asDouble":"""), coalesce(col("value"), lit(0.0)).cast("string"),
        lit(""","attributes":[{"key":"e.id","value":{"intValue":""""),
        col("event_id").cast("string"),
        lit(""""}}]}]}},{"name":"lat_hist","histogram":{"aggregationTemporality":"AGGREGATION_TEMPORALITY_DELTA","dataPoints":[{"timeUnixNano":""""),
        tNs,
        lit("""","count":""""), (col("event_id") % 5 + col("event_id") % 7 + col("event_id") % 3).cast("string"),
        lit("""","sum":"""), (col("event_id") % 100).cast("string"),
        lit(""".0,"bucketCounts":[""""), c1, lit("""",""""), c2, lit("""",""""), c3,
        lit(""""],"explicitBounds":[10.0,20.0]}]}}]}]}]}"""))
      graft.sinks.PromRemoteWrite.timeSeries(
          graft.sources.OtelMetrics.metrics(
            e.withColumn("otlp", json).select("otlp"), "otlp"))
        .select(col("metric_name"), col("labels"), col("ts_ms"), col("value"))
    }, Some("""WITH base AS (
              |  SELECT CAST(event_id AS VARCHAR) AS eid,
              |         'h' || (event_id % 4) AS host,
              |         'svc-' || event_type AS svc,
              |         epoch_us(ts) // 1000 AS ts_ms,
              |         coalesce(value, 0.0) AS gval,
              |         CAST(event_id % 5 AS DOUBLE) AS c1,
              |         CAST(event_id % 7 AS DOUBLE) AS c2,
              |         CAST(event_id % 3 AS DOUBLE) AS c3,
              |         CAST(event_id % 100 AS DOUBLE) AS hsum
              |  FROM events),
              |rsuf AS (SELECT *, ',resource_host_name=' || host ||
              |         ',resource_service_name=' || svc AS res FROM base)
              |SELECT 'lat_milliseconds' AS metric_name,
              |  '__name__=lat_milliseconds,e_id=' || eid || res AS labels,
              |  ts_ms, gval AS value FROM rsuf
              |UNION ALL SELECT 'lat_hist_count',
              |  '__name__=lat_hist_count' || res, ts_ms, c1 + c2 + c3 FROM rsuf
              |UNION ALL SELECT 'lat_hist_sum',
              |  '__name__=lat_hist_sum' || res, ts_ms, hsum FROM rsuf
              |UNION ALL SELECT 'lat_hist_bucket',
              |  '__name__=lat_hist_bucket,le=10.0' || res, ts_ms, c1 FROM rsuf
              |UNION ALL SELECT 'lat_hist_bucket',
              |  '__name__=lat_hist_bucket,le=20.0' || res, ts_ms, c2 FROM rsuf
              |UNION ALL SELECT 'lat_hist_bucket',
              |  '__name__=lat_hist_bucket,le=+Inf' || res, ts_ms, c3 FROM rsuf""".stripMargin)),

    ("q_prometheus_text", (s: SparkSession, dir: String) => {
      // one exposition page per event (comment + sample + trailing blank)
      val page = concat(
        lit("# TYPE app_value gauge\napp_value{eid=\""),
        col("event_id").cast("string"),
        lit("\",etype=\""), col("event_type"), lit("\"} "),
        col("value").cast("string"), lit(" "),
        call_function("div", unix_micros(col("ts")), lit(1000L)).cast("string"),
        lit("\n"))
      graft.sources.Feeds.prometheusText(
          events(s, dir).withColumn("page", page).select("page"), "page")
        .select(col("metric_name"),
          element_at(col("labels"), "eid").as("eid"),
          element_at(col("labels"), "etype").as("etype"),
          col("value"), col("ts_ms"))
    }, Some("""SELECT 'app_value' AS metric_name,
              | CAST(event_id AS VARCHAR) AS eid,
              | event_type AS etype, value,
              | epoch_us(ts) // 1000 AS ts_ms
              | FROM events""".stripMargin)),

    ("q_rss_items", (s: SparkSession, dir: String) => {
      val xml = concat(
        lit("<rss version=\"2.0\"><channel><title>"), col("source"),
        lit("</title><item><title>doc "), col("doc_id"),
        lit(" a</title><link>https://ex/"), col("doc_id"),
        lit("/a</link><guid>g"), col("doc_id"),
        lit("a</guid><pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>" +
          "<item><title>doc "), col("doc_id"),
        lit(" b</title><link>https://ex/"), col("doc_id"),
        lit("/b</link><guid>g"), col("doc_id"),
        lit("b</guid><pubDate>Tue, 02 Jan 2024 00:00:00 GMT</pubDate></item>" +
          "</channel></rss>"))
      graft.sources.Feeds.rssItems(
          docs(s, dir).withColumn("xml", xml).select("doc_id", "xml"), "xml")
        .select(col("doc_id"), col("channel_title"), col("item_pos"),
          col("item_title"), col("item_link"), col("item_guid"))
    }, Some("""SELECT doc_id, source AS channel_title, 0 AS item_pos,
              | 'doc ' || doc_id || ' a' AS item_title,
              | 'https://ex/' || doc_id || '/a' AS item_link,
              | 'g' || doc_id || 'a' AS item_guid FROM documents
              | UNION ALL
              | SELECT doc_id, source, 1,
              | 'doc ' || doc_id || ' b',
              | 'https://ex/' || doc_id || '/b',
              | 'g' || doc_id || 'b' FROM documents""".stripMargin)),

    ("q_detect_format", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.DetectFormat("props", "fmt"),
        Processors.SelectEntries("event_id", "fmt"))(events(s, dir))
    }, Some("SELECT event_id, 'json' AS fmt FROM events")),

    ("q_translate_regex", (s: SparkSession, dir: String) => {
      // regex-pattern flavor: first matching pattern wins in config order
      // (exact=false → unanchored find, like the reference's find mode)
      graft.pipeline.Pipeline(
        Processors.TranslateRegex("event_type", "category", Seq(
          "^(error|warn)" -> "problem",
          "(click|view)$" -> "engagement",
          "^(sign|purch)" -> "conversion"),
          exact = false, default = Some("other")),
        Processors.SelectEntries("event_id", "event_type", "category"))(events(s, dir))
    }, Some("""SELECT event_id, event_type,
              | CASE WHEN regexp_matches(event_type, '^(error|warn)') THEN 'problem'
              |      WHEN regexp_matches(event_type, '(click|view)$') THEN 'engagement'
              |      WHEN regexp_matches(event_type, '^(sign|purch)') THEN 'conversion'
              |      ELSE 'other' END AS category
              | FROM events""".stripMargin)),

    ("q_translate", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.Translate("lang", "lang_name", Seq(
          "en" -> "english", "de" -> "german", "fr" -> "french",
          "es" -> "spanish", "zh" -> "chinese"), default = Some("other")),
        Processors.SelectEntries("doc_id", "lang", "lang_name"))(docs(s, dir))
    }, Some("""SELECT d.doc_id, d.lang,
              | coalesce(m.v, 'other') AS lang_name
              | FROM documents d LEFT JOIN (VALUES ('en','english'),('de','german'),
              |  ('fr','french'),('es','spanish'),('zh','chinese')) m(k, v)
              | ON d.lang = m.k""".stripMargin)),

    ("q_translate_range", (s: SparkSession, dir: String) => {
      graft.pipeline.Pipeline(
        Processors.TranslateRange("value", "tier", Seq(
          (0.0, 9.999999, "low"), (10.0, 49.999999, "mid"), (50.0, 1e18, "high"))),
        Processors.SelectEntries("event_id", "value", "tier"))(events(s, dir))
    }, Some("""SELECT event_id, value,
              | CASE WHEN value >= 0 AND value < 10 THEN 'low'
              |      WHEN value >= 10 AND value < 50 THEN 'mid'
              |      WHEN value >= 50 THEN 'high' END AS tier FROM events""".stripMargin)),

    // ---------- aggregate actions (SURVEY §2.6) ----------
    ("q_agg_count", (s: SparkSession, dir: String) => {
      events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("value"),
          unix_micros(min(col("ts"))).as("start_us"),
          unix_micros(max(col("ts"))).as("end_us"))
        .withColumn("h", unix_micros(col("h")))
    }, Some("""SELECT event_type, epoch_us(date_trunc('hour', ts)) AS h,
              | count(*) AS value, epoch_us(min(ts)) AS start_us,
              | epoch_us(max(ts)) AS end_us
              | FROM events GROUP BY 1, 2""".stripMargin)),

    ("q_agg_count_distinct", (s: SparkSession, dir: String) => {
      Aggregates.countDistinctAction(events(s, dir), Seq("event_type"), "user_id")
    }, Some("SELECT event_type, count(DISTINCT user_id) AS value FROM events GROUP BY 1")),

    ("q_agg_histogram", (s: SparkSession, dir: String) => {
      Aggregates.histogramAction(events(s, dir), Seq("event_type"), "value",
        Seq(5.0, 10.0, 25.0, 50.0))
        .withColumn("sum", round(col("sum"), 4))
    }, Some("""SELECT event_type,
              | CASE WHEN value < 5 THEN 0 WHEN value < 10 THEN 1 WHEN value < 25 THEN 2
              |      WHEN value < 50 THEN 3 ELSE 4 END AS bucket,
              | count(*) AS count, round(sum(value), 4) AS sum,
              | min(value) AS min, max(value) AS max
              | FROM events GROUP BY 1, 2""".stripMargin)),

    ("q_agg_put_all", (s: SparkSession, dir: String) => {
      Aggregates.putAllAction(events(s, dir), Seq("user_id"), "event_id",
        Seq("event_type", "value"))
    }, Some("""SELECT user_id, arg_max(event_type, event_id) AS event_type,
              | arg_max(value, event_id) AS value FROM events GROUP BY 1""".stripMargin)),

    ("q_agg_append", (s: SparkSession, dir: String) => {
      Aggregates.appendAction(events(s, dir), Seq("user_id"), "event_id",
        Seq("event_type"))
        .select(col("user_id"), concat_ws("|", col("event_type")).as("types"))
    }, Some("""SELECT user_id, string_agg(event_type, '|' ORDER BY event_id) AS types
              | FROM events GROUP BY 1""".stripMargin)),

    ("q_remove_duplicates", (s: SparkSession, dir: String) => {
      Aggregates.removeDuplicates(events(s, dir), Seq("user_id", "event_type"), "event_id")
        .select("event_id", "user_id", "event_type")
    }, Some("""SELECT event_id, user_id, event_type FROM (
              |  SELECT event_id, user_id, event_type,
              |   row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
              |  FROM events) WHERE rn = 1""".stripMargin)),

    ("q_percent_sampler", (s: SparkSession, dir: String) => {
      Aggregates.percentSampler(events(s, dir), Seq("user_id"), "event_id", 30.0)
        .select("event_id", "user_id")
    }, Some("""SELECT event_id, user_id FROM (
              |  SELECT event_id, user_id,
              |   row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS i
              |  FROM events) WHERE floor(i * 0.3) > floor((i - 1) * 0.3)""".stripMargin)),

    ("q_rate_limiter", (s: SparkSession, dir: String) => {
      Aggregates.rateLimiterDrop(events(s, dir), Seq("user_id"), "ts", 2)
        .select("event_id", "user_id")
    }, Some("""SELECT event_id, user_id FROM (
              |  SELECT event_id, user_id,
              |   row_number() OVER (PARTITION BY user_id, date_trunc('second', ts)
              |                      ORDER BY ts, event_id) AS rn
              |  FROM events) WHERE rn <= 2""".stripMargin)),

    ("q_rate_limiter_block", (s: SparkSession, dir: String) => {
      // BLOCK mode: over-rate events wait for the next token-bucket slot
      // (closed-form running-max window; rate 2/s → 500ms slots)
      Aggregates.rateLimiterBlock(events(s, dir), Seq("user_id"), "ts",
        ratePerSecond = 2.0, tieBreak = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("emit_ts")).as("emit_us"))
    }, Some("""WITH b AS (
              |  SELECT event_id, user_id, ts,
              |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
              |  FROM events),
              | m AS (
              |  SELECT event_id, user_id, rn,
              |   max(epoch_us(ts) - rn * 500000) OVER (
              |     PARTITION BY user_id ORDER BY ts, event_id
              |     ROWS UNBOUNDED PRECEDING) AS mb
              |  FROM b)
              | SELECT event_id, user_id, rn * 500000 + mb AS emit_us FROM m""".stripMargin)),

    ("q_tail_sampler", (s: SparkSession, dir: String) => {
      Aggregates.tailSampler(events(s, dir), Seq("user_id"), "ts", "3600",
        col("event_type") === "error", percent = 0.0)
        .select("event_id", "user_id", "event_type")
    }, Some("""WITH sess AS (
              |  SELECT event_id, user_id, event_type, ts,
              |   sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 3600
              |       THEN 1 ELSE 0 END)
              |    OVER (PARTITION BY user_id ORDER BY ts, event_id
              |          ROWS UNBOUNDED PRECEDING) AS sid
              |  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              |        AS prev_ts FROM events))
              | SELECT event_id, user_id, event_type FROM (
              |  SELECT *, max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              |   OVER (PARTITION BY user_id, sid) AS has_err FROM sess)
              | WHERE has_err = 1""".stripMargin)),

    ("q_service_map", (s: SparkSession, dir: String) => {
      // service-map edge building (§2.6): prev event_type → event_type per
      // user session stream, edge counts
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type")).agg(count(lit(1)).as("edges"))
    }, Some("""SELECT prev_type, event_type, count(*) AS edges FROM (
              |  SELECT event_type, lag(event_type) OVER (
              |   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events)
              | WHERE prev_type IS NOT NULL GROUP BY 1, 2""".stripMargin)),

    ("q_trace_group", (s: SparkSession, dir: String) => {
      // otel trace-group fill: root span's fields onto every span of the
      // trace (trace = user_id; root = first event per user)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("event_id"))
      val spans = events(s, dir).withColumn("parent_id",
        lag(col("event_id"), 1).over(w).cast("string"))
      Aggregates.traceGroupFill(spans, "user_id", "parent_id",
        "event_type", Seq("ts"), orderCol = "event_id")
        .select(col("event_id"), col("trace_group"),
          unix_micros(col("tg_ts")).as("root_ts_us"))
    }, Some("""WITH roots AS (
              |  SELECT user_id, arg_min(event_type, event_id) AS trace_group,
              |         epoch_us(arg_min(ts, event_id)) AS root_ts_us
              |  FROM events GROUP BY 1)
              | SELECT e.event_id, r.trace_group, r.root_ts_us
              | FROM events e JOIN roots r USING (user_id)""".stripMargin)),

    ("q_user_agent", (s: SparkSession, dir: String) => {
      val ua = concat(
        lit("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 " +
          "(KHTML, like Gecko) Chrome/"), col("n_chars"),
        lit(".0.0.0 Safari/537.36"))
      graft.pipeline.UserAgent("ua")(docs(s, dir).withColumn("ua", ua))
        .select(col("doc_id"),
          col("user_agent.name").as("browser"),
          col("user_agent.version").as("bver"),
          col("user_agent.os.full").as("os_full"),
          col("user_agent.device.name").as("device"))
    }, Some("""SELECT doc_id, 'Chrome' AS browser,
              | CAST(n_chars AS VARCHAR) || '.0.0.0' AS bver,
              | 'Windows 10' AS os_full, 'Other' AS device
              | FROM documents""".stripMargin)),

    ("q_user_agent_uap", (s: SparkSession, dir: String) => {
      // long-tail agents (Chromium fork, HTTP library, Windows Phone,
      // Chrome OS) through the uap-core-format expanded chain — each one
      // an agent the fast subset mis-parses (UapCoreSpec differential)
      val uas = Seq(
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 " +
          "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Vivaldi/6.5.3206",
        "python-requests/2.28.1",
        "Mozilla/5.0 (Windows Phone 8.1; ARM; Trident/7.0; Touch; rv:11.0; " +
          "IEMobile/11.0; NOKIA; Lumia 635) like Gecko",
        "Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 " +
          "(KHTML, like Gecko) Chrome/120.0.6099.62 Safari/537.36")
      val withUa = docs(s, dir).withColumn("ua", element_at(
        array(uas.map(lit): _*), (pmod(col("doc_id"), lit(4)) + 1).cast("int")))
      graft.pipeline.UserAgent("ua", db = Some(graft.pipeline.UapCore.lite))(withUa)
        .select(col("doc_id"),
          col("user_agent.name").as("browser"),
          col("user_agent.version").as("bver"),
          col("user_agent.os.full").as("os_full"),
          col("user_agent.device.name").as("device"))
    }, Some("""SELECT doc_id,
              | CASE doc_id % 4 WHEN 0 THEN 'Vivaldi' WHEN 1 THEN 'python-requests'
              |   WHEN 2 THEN 'IE' ELSE 'Chrome' END AS browser,
              | CASE doc_id % 4 WHEN 0 THEN '6.5.3206' WHEN 1 THEN '2.28.1'
              |   WHEN 2 THEN '11.0' ELSE '120.0.6099' END AS bver,
              | CASE doc_id % 4 WHEN 0 THEN 'Windows 10' WHEN 1 THEN 'Other'
              |   WHEN 2 THEN 'Windows Phone 8.1' ELSE 'Chrome OS 14541.0.0' END AS os_full,
              | CASE doc_id % 4 WHEN 0 THEN 'Other' WHEN 1 THEN 'Other'
              |   WHEN 2 THEN 'Generic Smartphone' ELSE 'Chromebook' END AS device
              | FROM documents""".stripMargin)),

    ("q_avro_roundtrip", (s: SparkSession, dir: String) => {
      // avro container write → read (avro-core codec seam) round-trips
      // the documents slice byte-exactly vs the direct-table oracle
      val schema =
        """{"type":"record","name":"D","fields":[
          |{"name":"doc_id","type":"long"},{"name":"lang","type":"string"}]}""".stripMargin
      val tmp = java.nio.file.Files.createTempDirectory("graft-avro").toString
      val json = docs(s, dir)
        .select(to_json(struct(col("doc_id"), col("lang"))).as("json"))
      graft.sources.AvroCodec.writeContainer(json, s"$tmp/c", schema)
      graft.sources.AvroCodec.readContainer(s, s"$tmp/c")
        .select(
          get_json_object(col("json"), "$.doc_id").cast("bigint").as("doc_id"),
          get_json_object(col("json"), "$.lang").as("lang"))
    }, Some("SELECT doc_id, lang FROM documents")),

    // ---------- expression language (SURVEY §2.7) ----------
    ("q_expr_language", (s: SparkSession, dir: String) => {
      // Data-Prepper expression syntax compiled once on the driver to a
      // Catalyst Column (ExprCompiler) — filter + routing predicate parity
      val cond = graft.pipeline.ExprCompiler.compile(
        "(/lang == 'en' or /lang == 'fr') and /n_chars > 200 and " +
          "not (/source in {'src0', 'src1'}) and startsWith(/source, 'src')")
      docs(s, dir).filter(cond).select("doc_id", "lang", "source")
    }, Some("""SELECT doc_id, lang, source FROM documents
              | WHERE (lang = 'en' OR lang = 'fr') AND n_chars > 200
              |   AND NOT (source IN ('src0', 'src1'))
              |   AND source LIKE 'src%'""".stripMargin)),

    ("q_expr_arithmetic", (s: SparkSession, dir: String) => {
      val projected = graft.pipeline.ExprCompiler.compile("/value * 2 + 1")
      val cond = graft.pipeline.ExprCompiler.compile("/value % 10 >= 5")
      events(s, dir).filter(cond)
        .select(col("event_id"), round(projected, 4).as("derived"))
    }, Some("""SELECT event_id, round(value * 2 + 1, 4) AS derived
              | FROM events WHERE fmod(value, 10) >= 5""".stripMargin)),

    ("q_expr_functions", (s: SparkSession, dir: String) => {
      // the r1-broken argument paths: every separator here is non-default
      val c = (e: String) => graft.pipeline.ExprCompiler.compile(e)
      docs(s, dir).withColumn("parts", split(col("source"), "r"))
        .select(col("doc_id"),
          c("substringBefore(/text, ' ')").as("first_word"),
          c("substringAfter(/source, 'c')").as("after_c"),
          c("substringBeforeLast(/text, 'e')").as("before_last_e"),
          c("substringAfterLast(/text, 'e')").as("after_last_e"),
          c("join('-', /parts)").as("joined"),
          c("length(/text) > 100 and /doc_id typeof integer")
            .cast("int").as("long_and_int"))
    }, Some("""SELECT doc_id,
              | split_part(text, ' ', 1) AS first_word,
              | CASE WHEN strpos(source, 'c') > 0
              |      THEN substr(source, strpos(source, 'c') + 1) ELSE source END AS after_c,
              | CASE WHEN contains(text, 'e')
              |      THEN substr(text, 1, len(text) - strpos(reverse(text), 'e'))
              |      ELSE text END AS before_last_e,
              | CASE WHEN contains(text, 'e')
              |      THEN substr(text, len(text) - strpos(reverse(text), 'e') + 2)
              |      ELSE text END AS after_last_e,
              | replace(source, 'r', '-') AS joined,
              | CAST(len(text) > 100 AS INT) AS long_and_int
              | FROM documents""".stripMargin)),

    ("q_expr_metadata", (s: SparkSession, dir: String) => {
      // getMetadata/hasTags/getEventType over the engine's _meta struct
      val c = (e: String) => graft.pipeline.ExprCompiler.compile(e)
      docs(s, dir).withColumn("_meta", struct(
          lit("DOCUMENT").as("event_type"),
          array(lit("web"), col("lang")).as("tags"),
          map(lit("origin"), col("source")).as("attributes")))
        .select(col("doc_id"),
          c("getMetadata('/origin')").as("meta_origin"),
          c("getEventType()").as("etype"),
          c("hasTags('web', 'en')").cast("int").as("has_en"))
    }, Some("""SELECT doc_id, source AS meta_origin, 'DOCUMENT' AS etype,
              | CAST(lang = 'en' AS INT) AS has_en FROM documents""".stripMargin)),

    // ---------- routing (SURVEY §2.8) ----------
    ("q_routes", (s: SparkSession, dir: String) => {
      Router.tag(docs(s, dir), Seq(
        Route("english", col("lang") === "en"),
        Route("longdoc", col("n_chars") > 300)))
        .select(col("doc_id"), concat_ws(",", col("routes")).as("routes"))
    }, Some("""SELECT doc_id, concat_ws(',',
              |  CASE WHEN lang = 'en' THEN 'english' END,
              |  CASE WHEN n_chars > 300 THEN 'longdoc' END) AS routes
              | FROM documents""".stripMargin)),

    ("q_iceberg_scan", (s: SparkSession, dir: String) => {
      // the north rule's corpus input shape: an Iceberg table — written
      // here by the fixture writer, read back through the own-kernel
      // table-format reader (metadata.json → manifest-list avro →
      // manifest avro → live parquet files), with the partition predicate
      // pruning manifest entries BEFORE any parquet footer opens
      val tableDir = java.nio.file.Files
        .createTempDirectory("graft-iceberg-gate").toString
      graft.sources.Iceberg.write(s, docs(s, dir), tableDir,
        partitionCol = Some("lang"))
      // verifyRecordCounts: the r4 driver artifact had ONE nondeterministic
      // hash mismatch on this gate that no rerun reproduced — the integrity
      // gate turns any repeat (extra/missing/truncated data file between
      // write and read) into a loud named failure instead of a silently
      // wrong aggregate
      graft.sources.Iceberg.read(s, tableDir,
        partitionPredicate = p => p("lang") == "en",
        verifyRecordCounts = true)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
    }, Some("""SELECT source, count(*) AS n, sum(n_chars) AS chars
              | FROM documents WHERE lang = 'en' GROUP BY source""".stripMargin)),

    ("q_logstash_conditional", (s: SparkSession, dir: String) => {
      // Logstash-conf front end WITH filter conditionals: if/else-if/else
      // branches compile to per-processor gates (native *_when where the
      // plugin has one, the generic row-local GateWhen otherwise)
      val conf =
        """input { stdin {} }
          |filter {
          |    if [event_type] == "error" {
          |        mutate { add_field => { "sev" => "high" } uppercase => ["event_type"] }
          |    } else if [value] >= 0.5 {
          |        mutate { add_field => { "sev" => "mid" } }
          |    } else {
          |        drop {}
          |    }
          |}
          |output { stdout {} }
          |""".stripMargin
      graft.pipeline.LogstashConf.compile(s, conf,
        Map("logstash-converted-pipeline" ->
          events(s, dir).select("event_id", "event_type", "value")))
        .head.df.select("event_id", "event_type", "sev")
    }, Some("""SELECT event_id,
              | CASE WHEN event_type = 'error' THEN upper(event_type)
              |      ELSE event_type END AS event_type,
              | CASE WHEN event_type = 'error' THEN 'high' ELSE 'mid' END AS sev
              | FROM events
              | WHERE event_type = 'error' OR value >= 0.5""".stripMargin)),

    ("q_pipeline_yaml", (s: SparkSession, dir: String) => {
      // The reference's actual user surface: a pipelines.yaml definition
      // (data-prepper-pipeline-parser), compiled to a lazy DataFrame DAG —
      // routes + connected pipelines + parse/mutate processors end-to-end.
      val yaml =
        s"""event-pipeline:
           |  source:
           |    parquet:
           |      path: $dir/events.parquet
           |  processor:
           |    - parse_json:
           |        source: props
           |        schema: "k BIGINT"
           |    - add_entries:
           |        entries:
           |          - key: bucket
           |            value_expression: "/value * 2"
           |          - key: label
           |            format: "$${event_type}-$${parsed/k}"
           |    - convert_entry_type:
           |        key: user_id
           |        type: string
           |  route:
           |    - errors: '/event_type == "error"'
           |  sink:
           |    - pipeline:
           |        name: error-pipeline
           |        routes: [errors]
           |    - stdout:
           |error-pipeline:
           |  source:
           |    pipeline:
           |      name: event-pipeline
           |  processor:
           |    - uppercase_string:
           |        with_keys: [event_type]
           |  sink:
           |    - stdout:
           |""".stripMargin
      graft.pipeline.PipelineYaml.compile(s, yaml)
        .find(_.pipeline == "error-pipeline").get.df
        .select("event_id", "event_type", "user_id", "bucket", "label")
    }, Some("""SELECT event_id, upper(event_type) AS event_type,
              | CAST(user_id AS VARCHAR) AS user_id,
              | value * 2 AS bucket,
              | event_type || '-' || json_extract_string(props, '$.k') AS label
              | FROM events WHERE event_type = 'error'""".stripMargin)),

    ("q_transform_ocsf", (s: SparkSession, dir: String) => {
      // Rule-driven pipeline TRANSFORMS (the reference's `ocsf` plugin +
      // DynamicConfigTransformer): the user writes only a marker
      // processor; a JSONPath rule matches it and a template expands the
      // pipeline into the full OCSF v1.1 Network Activity mapping BEFORE
      // compilation (pipeline/Transforms.scala). The fixture synthesizes
      // PAN-OS-traffic-shaped rows from events deterministically so the
      // oracle re-derives every mapped OCSF column closed-form.
      val panw = events(s, dir).select(
        concat(lit("e"), col("event_id")).as("src_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("Start_Time"),
        date_format(expr("ts + INTERVAL 5 SECOND"),
          "yyyy-MM-dd'T'HH:mm:ss").as("Receive_Time"),
        concat(lit("10.0."), pmod(col("user_id"), lit(250)), lit("."),
          pmod(col("event_id"), lit(250))).as("Source_Address"),
        concat(lit("192.168."), pmod(col("event_id"), lit(250)), lit(".9"))
          .as("Destination_Address"),
        when(pmod(col("event_id"), lit(3)) === 0, "tcp")
          .when(pmod(col("event_id"), lit(3)) === 1, "udp")
          .otherwise("icmp").as("Protocol"),
        (pmod(col("event_id"), lit(5000)) * 3).as("Bytes_Sent"),
        pmod(col("user_id"), lit(900)).as("Bytes_Received"),
        concat(lit("rule-"), pmod(col("user_id"), lit(7))).as("Rule_Name"))
      val yaml =
        """panw:
          |  source:
          |    in_memory:
          |      testing_key: panw
          |  processor:
          |    - ocsf:
          |        type: palo_alto_networks_traffic_logs
          |        version: '1.1'
          |  sink:
          |    - stdout:
          |""".stripMargin
      graft.pipeline.Transforms.compile(s, yaml,
        Seq(graft.pipeline.Transforms.ocsfBundle),
        inputs = Map("panw" -> panw)).head.df
    }, Some("""SELECT 'e' || event_id AS src_id,
              | CAST(epoch(date_trunc('second', ts)) AS INT) AS "time",
              | CAST(epoch(date_trunc('second', ts)) + 5 AS INT) AS logged_time,
              | 4 AS category_uid, 4001 AS class_uid,
              | 'Network Activity' AS class_name,
              | 1 AS severity_id, 6 AS activity_id, 'Traffic' AS activity_name,
              | '10.0.' || (user_id % 250) || '.' || (event_id % 250) AS src_ip,
              | '192.168.' || (event_id % 250) || '.9' AS dst_ip,
              | CASE event_id % 3 WHEN 0 THEN 'tcp' WHEN 1 THEN 'udp'
              |   ELSE 'icmp' END AS proto_name,
              | (event_id % 5000) * 3 + (user_id % 900) AS traffic_bytes,
              | 'rule-' || (user_id % 7) AS firewall_rule
              | FROM events""".stripMargin)),

    ("q_encrypt_roundtrip", (s: SparkSession, dir: String) => {
      // Envelope encryption (the reference encryption-plugin): documents
      // encrypted under TWO rotated data keys (envelope carries each
      // row's key), then decrypted — decrypt∘encrypt ≡ identity, so the
      // oracle re-derives the output from the plaintext table. AES kernel
      // itself is pinned to the FIPS-197 vector in EncryptionSpec.
      import graft.pipeline.Encryption
      val k1 = java.util.Base64.getEncoder.encodeToString(
        "0123456789abcdef".getBytes("UTF-8"))
      val k2 = java.util.Base64.getEncoder.encodeToString(
        "fedcba9876543210".getBytes("UTF-8"))
      val keyed = docs(s, dir).select(col("doc_id"), col("text"))
        .withColumn("key_ix", pmod(col("doc_id"), lit(2)))
      val enc = Encryption.encryptColumn(
          keyed.filter(col("key_ix") === 0), "text", "enc", k1).drop("text")
        .unionByName(Encryption.encryptColumn(
          keyed.filter(col("key_ix") === 1), "text", "enc", k2).drop("text"))
      Encryption.decryptColumn(enc, "enc", "enc_key", "plain")
        .select(col("doc_id"), col("key_ix"),
          col("plain").cast("string").as("text"),
          coalesce(col("plain_err"), lit("ok")).as("status"))
    }, Some("""SELECT doc_id, doc_id % 2 AS key_ix, text, 'ok' AS status
              | FROM documents""".stripMargin)),

    // ---------- enrichment ----------
    ("q_geoip_lookup", (s: SparkSession, dir: String) => {
      // synthesize an IP per event (events table has none), then the
      // broadcast range-join lookup — the geoip operator shape
      val withIp = events(s, dir).withColumn("ip",
        concat(lit("10."), pmod(col("user_id"), lit(200)), lit(".0.1")))
      graft.pipeline.Enrich.geoLookup(withIp, "ip", "net",
        Seq("10.0.0.0/9" -> "net-low", "10.128.0.0/9" -> "net-high"))
        .select("event_id", "ip", "net")
    }, Some("""SELECT event_id, '10.' || CAST(user_id % 200 AS VARCHAR) || '.0.1' AS ip,
              | CASE WHEN user_id % 200 < 128 THEN 'net-low' ELSE 'net-high' END AS net
              | FROM events""".stripMargin)),

    ("q_geoip_mmdb", (s: SparkSession, dir: String) => {
      // same lookup served from a REAL MaxMind-format database file:
      // synthesize the mmdb with the own-kernel writer, decode it with the
      // own-kernel reader to the (cidr → record) dimension, same broadcast
      // range join, same oracle as q_geoip_lookup
      val mmdb = graft.pipeline.Mmdb.write(Seq(
        "10.0.0.0/9" -> Map("net" -> Map("name" -> "net-low")),
        "10.128.0.0/9" -> Map("net" -> Map("name" -> "net-high"))))
      val withIp = events(s, dir).withColumn("ip",
        concat(lit("10."), pmod(col("user_id"), lit(200)), lit(".0.1")))
      graft.pipeline.Enrich.geoLookupMmdb(withIp, "ip", "net", mmdb,
        Seq("net", "name"))
        .select("event_id", "ip", "net")
    }, Some("""SELECT event_id, '10.' || CAST(user_id % 200 AS VARCHAR) || '.0.1' AS ip,
              | CASE WHEN user_id % 200 < 128 THEN 'net-low' ELSE 'net-high' END AS net
              | FROM events""".stripMargin)),

    ("q_anomaly_zscore", (s: SparkSession, dir: String) => {
      graft.pipeline.Enrich.zScoreAnomalies(events(s, dir),
        Seq("event_type"), "value", threshold = 2.5)
        .select(col("event_id"), round(col("score"), 6).as("score"), col("grade"))
    }, Some("""SELECT event_id,
              | round(CASE WHEN s > 0 THEN abs(value - m) / s ELSE 0.0 END, 6) AS score,
              | CASE WHEN (CASE WHEN s > 0 THEN abs(value - m) / s ELSE 0.0 END) > 2.5
              |      THEN 1.0 ELSE 0.0 END AS grade
              | FROM (SELECT event_id, value,
              |        avg(value) OVER (PARTITION BY event_type) AS m,
              |        stddev_pop(value) OVER (PARTITION BY event_type) AS s
              |       FROM events)""".stripMargin)),

    ("q_anomaly_rcf", (s: SparkSession, dir: String) => {
      // Random Cut Forest scoring (reference RCF mode) — algorithmic
      // output, no SQL oracle; RcfSpec pins outlier separation +
      // determinism. Bound to rows with extreme values for a stable count.
      graft.ops.Rcf.anomalies(events(s, dir), Seq("value"),
        threshold = 0.15, numTrees = 20, sampleSize = 128)
        .filter(col("rcf_grade") === 1.0)
        .select(col("event_id"), round(col("rcf_score"), 4).as("rcf_score"))
    }, None),

    ("q_log_generator_grok", (s: SparkSession, dir: String) => {
      // source parity + grok-style extraction end to end: synthetic Apache
      // logs → regex captures → status histogram
      val logs = graft.sources.Sources.logGenerator(s, 2000).toDF("message")
      val parsed = Processors.RegexExtract("message",
        "^(\\S+) - - \\[[^\\]]+\\] \"(\\S+) (\\S+) HTTP/1\\.1\" ([0-9]+) ([0-9]+)$",
        Seq("ip" -> 1, "method" -> 2, "path" -> 3, "code" -> 4, "bytes" -> 5))(logs)
      parsed.groupBy(col("method"), col("code"))
        .agg(count(lit(1)).as("n"), sum(col("bytes").cast("long")).as("total_bytes"))
    }, Some(logGenGrokSql(2000))),

    // ---------- dedup family ----------
    ("q_dedup_exact", (s: SparkSession, dir: String) => {
      Dedup.exact(docs(s, dir), "doc_id", "text")
    }, Some("""SELECT sha256(text) AS content_hash, min(doc_id) AS doc_id,
              | count(*) AS dup_count FROM documents GROUP BY 1""".stripMargin)),

    ("q_dedup_survivors", (s: SparkSession, dir: String) => {
      Dedup.exactSurvivors(docs(s, dir), "doc_id", "text").select("doc_id", "lang")
    }, Some("""SELECT doc_id, lang FROM documents WHERE doc_id IN (
              |  SELECT min(doc_id) FROM documents GROUP BY sha256(text))""".stripMargin)),

    ("q_ngram_jaccard", (s: SparkSession, dir: String) => {
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", shingleW = 3,
        threshold = 0.2, maxShingleDf = 50)
        .withColumn("jaccard", round(col("jaccard"), 4))
    }, Some(ngramJaccardSql(0.2, Some(50)))),

    ("q_duplicate_spans", (s: SparkSession, dir: String) => {
      Dedup.duplicateSpans(docs(s, dir), "doc_id", "text", w = 20)
    }, Some(
      s"""WITH toks AS (SELECT doc_id, $tokSql AS l FROM documents),
         | g AS (SELECT doc_id, i - 1 AS pos, array_to_string(l[i:i+19], ' ') AS g
         |       FROM (SELECT doc_id, l, unnest(range(1, len(l)-18)) AS i
         |             FROM toks WHERE len(l) >= 20)),
         | c AS (SELECT g, count(DISTINCT doc_id) AS n_docs FROM g
         |       GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2)
         | SELECT doc_id, pos, n_docs FROM g JOIN c USING (g)""".stripMargin)),

    ("q_span_removal", (s: SparkSession, dir: String) => {
      Dedup.removeDuplicateSpans(docs(s, dir), "doc_id", "text", w = 20)
        .select("doc_id", "clean_text")
    }, Some(
      s"""WITH toks AS (SELECT doc_id, $tokSql AS l FROM documents),
         | g AS (SELECT doc_id, i - 1 AS pos, array_to_string(l[i:i+19], ' ') AS g
         |       FROM (SELECT doc_id, l, unnest(range(1, len(l)-18)) AS i
         |             FROM toks WHERE len(l) >= 20)),
         | c AS (SELECT g, count(DISTINCT doc_id) AS n_docs,
         |              min(doc_id) AS keeper FROM g
         |       GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
         | f AS (SELECT g.doc_id, list(DISTINCT pos) AS spans FROM g
         |       JOIN c USING (g) WHERE g.doc_id <> c.keeper GROUP BY 1)
         | SELECT t.doc_id, coalesce(array_to_string(list_transform(
         |   list_filter(range(0, len(t.l)), i -> len(list_filter(
         |     coalesce(f.spans, []), p -> i >= p AND i < p + 20)) = 0),
         |   i -> t.l[i+1]), ' '), '') AS clean_text
         | FROM toks t LEFT JOIN f USING (doc_id)""".stripMargin)),

    ("q_minhash_neardups", (s: SparkSession, dir: String) => {
      Dedup.minHashNearDups(docs(s, dir), "doc_id", "text", threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 4))
    }, Some(ngramJaccardSql(0.5, None))),

    ("q_simhash_neardups", (s: SparkSession, dir: String) => {
      // md5 token-hash mode: bit-identical signatures are computable in
      // DuckDB, so the full pair list (exact recall at radius 6 via the
      // maxHamming+1-bank pigeonhole) is oracle-checked; the xxh64 fast
      // path is pinned by the brute-force differential in OpsSpec
      Dedup.simHashNearDups(docs(s, dir), "doc_id", "text", maxHamming = 6,
        tokenHash = "md5")
    }, Some(simHashSql(6))),

    ("q_neardup_clusters", (s: SparkSession, dir: String) => {
      // pair generation -> transitive closure -> per-doc cluster id: the
      // full dedup pipeline (survivors = component = doc_id)
      val d = docs(s, dir)
      val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", shingleW = 3,
        threshold = 0.2, maxShingleDf = 50)
      Graphs.nearDupClusters(d, "doc_id", pairs, "idA", "idB")
    }, Some(nearDupClustersSql())),

    // ---------- text analysis ----------
    ("q_lang_id", (s: SparkSession, dir: String) => {
      TextAnalysis.langId(docs(s, dir), "text").select("doc_id", "lang_pred")
    }, Some(langIdSql())),

    ("q_quality_score", (s: SparkSession, dir: String) => {
      TextAnalysis.qualityScore(docs(s, dir), "text")
        .select("doc_id", "n_tokens", "stopword_ratio", "alpha_ratio", "quality_score")
    }, Some(qualityScoreSql())),

    ("q_token_counts", (s: SparkSession, dir: String) => {
      TextAnalysis.tokenCounts(docs(s, dir), "text").select("doc_id", "ws_tokens", "bpe_tokens")
    }, Some("""SELECT doc_id,
              | len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS ws_tokens,
              | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
              | FROM documents""".stripMargin)),

    ("q_token_diversity", (s: SparkSession, dir: String) => {
      // type-token ratio + unigram entropy; both sides fold -p*ln(p) in
      // term-sorted order (Spark aggregate over sort_array ≡ DuckDB
      // list_sum over list(... ORDER BY term)) before the shared
      // round(,6), so IEEE accumulation order matches bit-for-bit.
      TextAnalysis.tokenDiversity(docs(s, dir), "doc_id", "text")
    }, Some(
      s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         | c AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY 1, 2),
         | d AS (SELECT doc_id, sum(c) AS n_tokens,
         |        count(*) AS n_types,
         |        list(CAST(c AS DOUBLE) ORDER BY term) AS cs
         |   FROM c GROUP BY doc_id)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         | CAST(n_types AS BIGINT) AS n_types,
         | round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS type_token_ratio,
         | round(list_sum(list_transform(cs,
         |   x -> -(x / n_tokens) * ln(x / n_tokens))), 6) AS unigram_entropy
         |FROM d""".stripMargin)),

    ("q_chunk_passages", (s: SparkSession, dir: String) => {
      // overlapping token-window chunking (window 32, stride 24): chunk
      // boundaries, tail coverage, and the re-joined chunk text all
      // re-derived by the oracle from the same token stream.
      graft.ops.Curation.chunkPassages(docs(s, dir), "doc_id", "text",
        window = 32, stride = 24)
    }, Some(
      s"""WITH t AS (SELECT doc_id, $tokSql AS l FROM documents),
         | d AS (SELECT doc_id, l, len(l) AS n FROM t WHERE len(l) > 0),
         | k AS (SELECT *, CASE WHEN n <= 32 THEN 1
         |        ELSE CAST(ceil(CAST(n - 32 AS DOUBLE)/24) AS INT) + 1
         |        END AS nc FROM d),
         | e AS (SELECT doc_id, l, n,
         |        unnest(generate_series(0, nc - 1)) AS i FROM k)
         |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         | CAST(i*24 AS BIGINT) AS start_tok,
         | CAST(least(32, n - i*24) AS BIGINT) AS n_tokens,
         | array_to_string(l[i*24 + 1 : least(i*24 + 32, CAST(n AS INT))],
         |   ' ') AS chunk
         |FROM e""".stripMargin)),

    ("q_sessionize", (s: SparkSession, dir: String) => {
      // gap-based sessionization (batch session_window): per-user
      // sessions split on >8h inactivity; the oracle is the classic
      // gaps-and-islands derivation. Tie seconds can never straddle a
      // session boundary, so aggregates are order-deterministic.
      graft.pipeline.Aggregates.sessionize(
        events(s, dir), Seq("user_id"), "ts", "8h")
    }, Some(
      """WITH b AS (SELECT user_id,
        |   CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
        | l AS (SELECT user_id, t,
        |   CASE WHEN lag(t) OVER w IS NULL
        |     OR t - lag(t) OVER w > 28800 THEN 1 ELSE 0 END AS nw
        |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        | s AS (SELECT user_id, t, sum(nw) OVER (PARTITION BY user_id
        |   ORDER BY t ROWS UNBOUNDED PRECEDING) AS session_idx FROM l)
        |SELECT user_id, session_idx, min(t) AS session_start,
        | max(t) AS session_end, count(*) AS n_events,
        | max(t) - min(t) AS duration_s
        |FROM s GROUP BY 1, 2""".stripMargin)),

    ("q_fingerprint", (s: SparkSession, dir: String) => {
      // md5 token-hash mode → the rolling FNV fold is reproducible in SQL
      // (list_reduce with wrapping HUGEINT multiplication); xxh64 default
      // stays the 100 TB fast path (TextSignalsSpec)
      TextAnalysis.fingerprints(docs(s, dir), "doc_id", "text", tokenHash = "md5")
    }, Some(
      s"""WITH toks AS (SELECT doc_id, $tokSql AS l FROM documents),
         | h AS (SELECT doc_id, list_transform(l,
         |     t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT) AS hs FROM toks),
         | f AS (SELECT doc_id, list_reduce(
         |     list_prepend(14695981039346656037::UBIGINT, hs),
         |     (a, x) -> ((xor(a, x)::HUGEINT * 1099511628211)
         |       % (1::HUGEINT << 64))::UBIGINT) AS v FROM h)
         |SELECT doc_id, CASE WHEN v >= (1::HUGEINT << 63)
         |  THEN (v::HUGEINT - (1::HUGEINT << 64))::BIGINT
         |  ELSE v::BIGINT END AS fingerprint
         |FROM f""".stripMargin)),

    ("q_repetition_signals", (s: SparkSession, dir: String) => {
      TextAnalysis.repetitionSignals(docs(s, dir), "doc_id", "text")
    }, Some(repetitionSignalsSql())),

    ("q_lm_perplexity", (s: SparkSession, dir: String) => {
      // CCNet-style curation: train a bigram LM on a trusted slice (every
      // 10th doc stands in for the curated reference), score the whole
      // corpus's perplexity under it, band into head/middle/tail
      val d = docs(s, dir)
      val lm = graft.ops.LangModel.trainBigrams(
        d.filter(col("doc_id") % 10 === 0), "doc_id", "text")
      graft.ops.LangModel.perplexityBuckets(
        graft.ops.LangModel.perplexity(d, "doc_id", "text", lm),
        headMax = 30.0, middleMax = 50.0)
    }, Some(
      s"""WITH toks AS (SELECT doc_id, $tokSql AS l FROM documents),
         | big AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2
         |         FROM toks, unnest(generate_series(1, len(l)-1)) t(i)),
         | bc AS (SELECT w1, w2, count(*) AS c FROM big
         |        WHERE doc_id % 10 = 0 GROUP BY 1, 2),
         | ctx AS (SELECT w1, sum(c) AS cw1 FROM bc GROUP BY 1),
         | v AS (SELECT count(DISTINCT w2) AS v FROM bc),
         | scored AS (SELECT big.doc_id,
         |    ln((coalesce(bc.c, 0) + 0.1) / (coalesce(ctx.cw1, 0) + 0.1 * (v.v + 1))) AS logp
         |  FROM big LEFT JOIN bc USING (w1, w2)
         |  LEFT JOIN ctx USING (w1) CROSS JOIN v),
         | agg AS (SELECT doc_id, count(*) AS n_bigrams,
         |         round(-avg(logp), 6) AS nll,
         |         round(exp(-avg(logp)), 3) AS ppl FROM scored GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams, a.nll, a.ppl,
         | CASE WHEN a.ppl IS NULL THEN 'tail' WHEN a.ppl <= 30.0 THEN 'head'
         |      WHEN a.ppl <= 50.0 THEN 'middle' ELSE 'tail' END AS ppl_bucket
         |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin)),

    ("q_hashed_classifier", (s: SparkSession, dir: String) => {
      // fastText-style hashed linear quality head, md5 bucket mode so the
      // oracle replays bucket assignment; weights from an integer formula
      // both engines evaluate exactly: w[b] = ((b*37) % 21 - 10) / 10
      val dim = 64
      val w = (0 until dim).map(i => ((i * 37) % 21 - 10) / 10.0)
      graft.ops.Inference.hashedTextScore(docs(s, dir), "doc_id", "text",
        dim, w, bias = -0.1, tokenHash = "md5")
    }, Some(
      s"""WITH toks AS (SELECT doc_id, $tokSql AS l FROM documents),
         | t AS (SELECT doc_id, unnest(l) AS tok FROM toks),
         | h AS (SELECT doc_id,
         |   (('0x' || substr(md5(tok), 1, 15))::UBIGINT % 64)::BIGINT AS b FROM t),
         | a AS (SELECT doc_id, sum(((b * 37) % 21 - 10) / 10.0) AS dot,
         |       count(*) AS nt FROM h GROUP BY 1),
         | l AS (SELECT d.doc_id,
         |   coalesce(a.dot, 0) / greatest(coalesce(a.nt, 0), 1) - 0.1 AS logit
         |  FROM documents d LEFT JOIN a USING (doc_id))
         |SELECT doc_id,
         | CASE WHEN round(logit, 6) = 0 THEN 0.0
         |      ELSE round(logit, 6) END AS logit,
         | round(1.0 / (1.0 + exp(-logit)), 6) AS prob FROM l""".stripMargin)),

    ("q_sample_stratified", (s: SparkSession, dir: String) => {
      graft.ops.Sampling.stratified(docs(s, dir), "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.0), defaultRate = 0.1)
        .select("doc_id", "lang")
    }, Some {
      val th = graft.ops.Sampling.thresholdHex _
      s"""SELECT doc_id, lang FROM documents
         | WHERE substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 8) <
         |  CASE lang WHEN 'de' THEN '${th(0.25)}' WHEN 'en' THEN '${th(0.5)}'
         |   WHEN 'zh' THEN '${th(0.0)}' ELSE '${th(0.1)}' END""".stripMargin
    }),

    ("q_split_consistent", (s: SparkSession, dir: String) => {
      graft.ops.Sampling.split(docs(s, dir), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")
    }, Some {
      val th = graft.ops.Sampling.thresholdHex _
      s"""SELECT doc_id,
         | CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)
         |        < '${th(0.8)}' THEN 'train'
         |      WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)
         |        < '${th(0.9)}' THEN 'val'
         |      ELSE 'test' END AS split
         | FROM documents""".stripMargin
    }),

    // ---------- corpus curation ----------
    ("q_decontaminate", (s: SparkSession, dir: String) => {
      // eval set = every 20th doc standing in for a benchmark suite;
      // candidates = the rest, flagged on any shared 8-gram
      val d = docs(s, dir)
      graft.ops.Curation.decontaminate(
        d.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
        d.filter(col("doc_id") % 20 === 0), "text", n = 8)
    }, Some(decontaminateSql(n = 8, evalMod = 20))),

    ("q_url_normalize", (s: SparkSession, dir: String) => {
      // messy-but-well-formed URLs synthesized from doc_id (the corpus
      // carries no url column); the oracle computes the CANONICAL form
      // closed-form from doc_id — an independent derivation, not a regex
      // replay. Exercises: case folding, www-strip, default-port drop,
      // odd-port keep, trailing-slash strip, fragment drop, tracking-param
      // drop, query-param sort, path case preservation.
      val id = col("doc_id")
      val url = concat(lit("HTTPS://WWW.Host"), (id % 40).cast("string"),
        lit(".Example.COM"),
        when(id % 3 === 0, lit(":443"))
          .when(id % 3 === 1, lit(":8443")).otherwise(lit("")),
        lit("/Path/"), id.cast("string"),
        when(id % 2 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=x&b=2&a=1"),
        when(id % 5 === 0, lit("#frag")).otherwise(lit("")))
      val d = docs(s, dir).withColumn("url", url)
      d.select(col("doc_id"),
        graft.ops.Curation.urlNormalize(col("url")).as("url_norm"),
        graft.ops.Curation.hostOf(col("url")).as("host"))
    }, Some("""SELECT doc_id,
              | 'https://host' || (doc_id % 40) || '.example.com' ||
              |  CASE WHEN doc_id % 3 = 1 THEN ':8443' ELSE '' END ||
              |  '/Path/' || doc_id || '?a=1&b=2' AS url_norm,
              | 'host' || (doc_id % 40) || '.example.com' AS host
              |FROM documents""".stripMargin)),

    ("q_domain_filter", (s: SparkSession, dir: String) => {
      import s.implicits._
      val id = col("doc_id")
      val url = concat(lit("https://host"), (id % 40).cast("string"),
        lit(".example.com/p/"), id.cast("string"))
      val d = docs(s, dir).withColumn("url", url)
      val blocklist = (0 until 40 by 4)
        .map(n => s"host$n.example.com").toDF("host")
      graft.ops.Curation.domainFilter(d, "url", blocklist, "host")
        .select("doc_id", "lang")
    }, Some("""SELECT doc_id, lang FROM documents
              | WHERE (doc_id % 40) % 4 <> 0""".stripMargin)),

    ("q_domain_stats", (s: SparkSession, dir: String) => {
      val id = col("doc_id")
      val url = concat(lit("https://host"), (id % 40).cast("string"),
        lit(".example.com/p/"), id.cast("string"))
      graft.ops.Curation.domainStats(
        docs(s, dir).withColumn("url", url), "url", "n_chars")
    }, Some("""SELECT 'host' || (doc_id % 40) || '.example.com' AS host,
              | count(*) AS docs,
              | round(avg(CAST(n_chars AS DOUBLE)), 4) AS mean_size
              |FROM documents GROUP BY 1""".stripMargin)),

    ("q_dedup_lines", (s: SparkSession, dir: String) => {
      // multi-line pages synthesized from the corpus (documents carry no
      // newlines): a shared footer in every page, a header shared by
      // doc_id % 7, the document body between them. maxDocs=40 bans the
      // footer (500 docs) and each header (~71) but not unique bodies.
      val id = col("doc_id")
      val page = concat(lit("header "), (id % 7).cast("string"), lit("\n"),
        col("text"), lit("\n"), lit("shared footer line"))
      graft.ops.Dedup.dedupLines(
        docs(s, dir).select(id, page.as("page")), "doc_id", "page",
        maxDocs = 40)
    }, Some(dedupLinesSql(maxDocs = 40))),

    ("q_cloudwatch_logs", (s: SparkSession, dir: String) => {
      // analytic fixture: each event row becomes one gzipped CloudWatch
      // Logs subscription payload with two log events derived closed-form
      // from event_id, plus one CONTROL_MESSAGE row the decoder must drop;
      // the oracle recomputes the decoded rows from events directly.
      val e = events(s, dir)
      val payload = to_json(struct(
        lit("DATA_MESSAGE").as("messageType"),
        lit("123456789012").as("owner"),
        concat(lit("/g/"), col("event_type")).as("logGroup"),
        concat(lit("s-"), (col("event_id") % 8).cast("string")).as("logStream"),
        array(lit("f")).as("subscriptionFilters"),
        array(
          struct(concat(lit("a-"), col("event_id").cast("string")).as("id"),
            (col("event_id") * 1000 + 1).as("timestamp"),
            concat(lit("msg "), col("event_type")).as("message")),
          struct(concat(lit("b-"), col("event_id").cast("string")).as("id"),
            (col("event_id") * 1000 + 2).as("timestamp"),
            lit("second").as("message"))).as("logEvents")))
      val ctrl = lit("""{"messageType":"CONTROL_MESSAGE","owner":"o","logGroup":"g","logStream":"s","subscriptionFilters":[],"logEvents":[]}""")
      val fixture = e.select(col("event_id").as("src_id"),
          gzipUdf(when(col("event_id") % 97 === 0, ctrl).otherwise(payload))
            .as("payload"))
      graft.sources.Feeds.cloudwatchSubscription(fixture, "payload")
    }, Some(
      """SELECT event_id AS src_id, '123456789012' AS owner,
        | '/g/' || event_type AS log_group,
        | 's-' || (event_id % 8) AS log_stream,
        | u.pos AS event_pos,
        | CASE WHEN u.pos = 0 THEN 'a-' || event_id ELSE 'b-' || event_id END AS event_id,
        | CAST(event_id * 1000 + u.pos + 1 AS BIGINT) AS ts_ms,
        | CASE WHEN u.pos = 0 THEN 'msg ' || event_type ELSE 'second' END AS message
        |FROM events, LATERAL (SELECT CAST(unnest([0, 1]) AS INT) AS pos) u
        |WHERE event_id % 97 <> 0""".stripMargin)),

    ("q_cloudwatch_sink", (s: SparkSession, dir: String) => {
      // the ENCODE side of the cloudwatch_logs sink: greedy PutLogEvents
      // batching (flush-before-add on request bytes incl. the public
      // 26 B/event overhead, flush-after-add on count, event-size DLQ)
      // over a per-(group, stream) fold. The oracle replays the exact
      // sequential fold as a DuckDB RECURSIVE CTE — per-event batch_idx /
      // seq_in_batch must match bit-for-bit.
      val e = events(s, dir)
      val fixture = e.select(
        col("event_type").as("g"),
        concat(lit("s-"), (col("event_id") % 7).cast("string")).as("s"),
        expr("event_id DIV 5").as("ts"),
        col("event_id").as("id"),
        expr("repeat('a', CAST(20 + (event_id * 7) % 180 AS INT))").as("msg"))
      graft.sinks.CloudWatchLogs.assignBatches(fixture, "g", "s", "ts",
          "id", "msg", graft.sinks.CloudWatchLogs.Thresholds(
            batchSize = 6, maxEventBytes = 200, maxRequestBytes = 600))
        .select(col("log_group"), col("log_stream"), col("src_id"),
          col("ts"), col("event_bytes"),
          col("dropped").cast("int").as("dropped_i"),
          col("batch_idx"), col("seq_in_batch"))
    }, Some(
      """WITH RECURSIVE base AS (
        |  SELECT event_type AS log_group,
        |         's-' || (event_id % 7) AS log_stream,
        |         event_id // 5 AS ts,
        |         event_id AS src_id,
        |         CAST(20 + (event_id * 7) % 180 AS BIGINT) AS event_bytes
        |  FROM events
        |), ok AS (
        |  SELECT *, row_number() OVER (PARTITION BY log_group, log_stream
        |                               ORDER BY ts, src_id) AS rn
        |  FROM base WHERE event_bytes + 26 <= 200
        |), st AS (
        |  SELECT log_group, log_stream, rn, src_id, ts, event_bytes,
        |         CAST(1 AS BIGINT) AS batch_idx,
        |         CAST(1 AS BIGINT) AS seq_in_batch,
        |         event_bytes AS buf_bytes
        |  FROM ok WHERE rn = 1
        |  UNION ALL
        |  SELECT o.log_group, o.log_stream, o.rn, o.src_id, o.ts,
        |         o.event_bytes,
        |    CASE WHEN (CASE WHEN s.seq_in_batch >= 6 THEN 0 ELSE s.buf_bytes END)
        |              + o.event_bytes
        |              + ((CASE WHEN s.seq_in_batch >= 6 THEN 0 ELSE s.seq_in_batch END) + 1) * 26 > 600
        |      THEN (CASE WHEN s.seq_in_batch >= 6 THEN s.batch_idx + 1 ELSE s.batch_idx END) + 1
        |      ELSE (CASE WHEN s.seq_in_batch >= 6 THEN s.batch_idx + 1 ELSE s.batch_idx END)
        |    END AS batch_idx,
        |    CASE WHEN (CASE WHEN s.seq_in_batch >= 6 THEN 0 ELSE s.buf_bytes END)
        |              + o.event_bytes
        |              + ((CASE WHEN s.seq_in_batch >= 6 THEN 0 ELSE s.seq_in_batch END) + 1) * 26 > 600
        |      THEN CAST(1 AS BIGINT)
        |      ELSE (CASE WHEN s.seq_in_batch >= 6 THEN 0 ELSE s.seq_in_batch END) + 1
        |    END AS seq_in_batch,
        |    CASE WHEN (CASE WHEN s.seq_in_batch >= 6 THEN 0 ELSE s.buf_bytes END)
        |              + o.event_bytes
        |              + ((CASE WHEN s.seq_in_batch >= 6 THEN 0 ELSE s.seq_in_batch END) + 1) * 26 > 600
        |      THEN o.event_bytes
        |      ELSE (CASE WHEN s.seq_in_batch >= 6 THEN 0 ELSE s.buf_bytes END) + o.event_bytes
        |    END AS buf_bytes
        |  FROM ok o JOIN st s ON o.log_group = s.log_group
        |    AND o.log_stream = s.log_stream AND o.rn = s.rn + 1
        |)
        |SELECT log_group, log_stream, src_id, ts, event_bytes,
        |       0 AS dropped_i, batch_idx, seq_in_batch
        |FROM st
        |UNION ALL
        |SELECT log_group, log_stream, src_id, ts, event_bytes,
        |       1 AS dropped_i, CAST(NULL AS BIGINT) AS batch_idx,
        |       CAST(NULL AS BIGINT) AS seq_in_batch
        |FROM base WHERE event_bytes + 26 > 200""".stripMargin)),

    ("q_sqs_sink", (s: SparkSession, dir: String) => {
      // the ENCODE side of the sqs sink: TWO-LEVEL greedy packaging —
      // events into messages (count + byte caps, strict-< append quirk),
      // messages into SendMessageBatch requests (10-message / 256 KiB API
      // caps) — per queue. The oracle replays the nested sequential fold
      // as a DuckDB RECURSIVE CTE (lateral aliases carry the flush/append
      // decisions); per-event request/message/seq must match bit-for-bit.
      val e = events(s, dir)
      val fixture = e.select(
        concat(lit("https://sqs/q-"), (col("event_id") % 6).cast("string"))
          .as("q"),
        expr("event_id DIV 5").as("ts"),
        col("event_id").as("id"),
        expr("repeat('a', CAST(CASE WHEN event_id % 13 = 0 THEN 150 " +
          "ELSE 10 + event_id % 7 END AS INT))").as("body"))
      graft.sinks.SqsSink.assignBatches(fixture, "q", "ts", "id", "body",
          graft.sinks.SqsSink.Thresholds(
            maxEventsPerMessage = 4, maxMessageBytes = 120))
        .select(col("queue_url"), col("src_id"), col("ts"),
          col("event_bytes"), col("request_idx"), col("message_idx"),
          col("seq_in_message"))
    }, Some(
      """WITH RECURSIVE base AS (
        |  SELECT 'https://sqs/q-' || (event_id % 6) AS queue_url,
        |         event_id // 5 AS ts,
        |         event_id AS src_id,
        |         CAST(CASE WHEN event_id % 13 = 0 THEN 150
        |                   ELSE 10 + event_id % 7 END AS BIGINT) AS event_bytes
        |  FROM events
        |), ok AS (
        |  SELECT *, row_number() OVER (PARTITION BY queue_url
        |                               ORDER BY ts, src_id) AS rn
        |  FROM base
        |), st AS (
        |  SELECT queue_url, rn, src_id, ts, event_bytes,
        |         CAST(1 AS BIGINT) AS request_idx,
        |         CAST(1 AS BIGINT) AS message_idx,
        |         CAST(1 AS BIGINT) AS seq_in_message,
        |         event_bytes AS msg_bytes,
        |         event_bytes AS req_bytes
        |  FROM ok WHERE rn = 1
        |  UNION ALL
        |  SELECT o.queue_url, o.rn, o.src_id, o.ts, o.event_bytes,
        |    CASE WHEN l1.fl THEN s.request_idx + 1 ELSE s.request_idx END,
        |    CASE WHEN l3.ap THEN l2.fm ELSE l2.fm + 1 END,
        |    CASE WHEN l3.ap THEN l2.fc + 1 ELSE CAST(1 AS BIGINT) END,
        |    CASE WHEN l3.ap THEN l2.fs + o.event_bytes ELSE o.event_bytes END,
        |    (CASE WHEN l1.fl THEN 0 ELSE s.req_bytes END) + o.event_bytes
        |  FROM st s
        |  JOIN ok o ON o.queue_url = s.queue_url AND o.rn = s.rn + 1,
        |  LATERAL (SELECT
        |    (s.req_bytes + o.event_bytes > 262144 OR
        |     ((NOT (s.seq_in_message < 4 AND s.msg_bytes + o.event_bytes <= 120))
        |      AND s.message_idx = 10)) AS fl) l1,
        |  LATERAL (SELECT
        |    CASE WHEN l1.fl THEN 0 ELSE s.message_idx END AS fm,
        |    CASE WHEN l1.fl THEN 0 ELSE s.seq_in_message END AS fc,
        |    CASE WHEN l1.fl THEN 0 ELSE s.msg_bytes END AS fs) l2,
        |  LATERAL (SELECT
        |    (l2.fm > 0 AND l2.fc < 4 AND l2.fs + o.event_bytes < 120) AS ap) l3
        |)
        |SELECT queue_url, src_id, ts, event_bytes, request_idx, message_idx,
        |       seq_in_message
        |FROM st""".stripMargin)),

    ("q_sqs_receive", (s: SparkSession, dir: String) => {
      // analytic fixture: each event becomes one SQS ReceiveMessage
      // response payload (public wire shape) with body/attributes derived
      // closed-form from event_id; every 83rd payload carries a corrupted
      // MD5OfBody the decoder must flag (md5_ok=false), never throw on.
      val e = events(s, dir)
      val body = concat(lit("evt "), col("event_type"))
      val digest = when(col("event_id") % 83 === 0,
        lit("00000000000000000000000000000000"))
        .otherwise(md5(body.cast("binary")))
      val payload = to_json(struct(array(struct(
        concat(lit("m-"), col("event_id").cast("string")).as("MessageId"),
        concat(lit("rh-"), col("event_id").cast("string")).as("ReceiptHandle"),
        digest.as("MD5OfBody"),
        body.as("Body"),
        map(lit("SentTimestamp"), (col("event_id") * 1000).cast("string"))
          .as("Attributes"),
        map(lit("TraceId"), struct(
          concat(lit("t-"), (col("event_id") % 17).cast("string"))
            .as("StringValue"),
          lit("String").as("DataType"))).as("MessageAttributes")))
        .as("Messages")))
      graft.sources.Queues.sqsReceive(
        e.select(col("event_id").as("src_id"), payload.as("resp")),
        "resp", "https://sqs.us-east-1.example/q1")
        .select(col("src_id"), col("message_id"), col("receipt_handle"),
          col("body"), col("md5_ok").cast("int").as("md5_ok_i"),
          element_at(col("attributes"), "sentTimestamp").as("sent_ts"),
          element_at(col("message_attributes"), "traceId").as("trace_id"))
    }, Some(
      """SELECT event_id AS src_id, 'm-' || event_id AS message_id,
        | 'rh-' || event_id AS receipt_handle,
        | 'evt ' || event_type AS body,
        | CAST(event_id % 83 <> 0 AS INT) AS md5_ok_i,
        | CAST(event_id * 1000 AS VARCHAR) AS sent_ts,
        | 't-' || (event_id % 17) AS trace_id
        |FROM events""".stripMargin)),

    ("q_kafka_decode", (s: SparkSession, dir: String) => {
      // analytic fixture: each event becomes one record in the
      // spark-sql-kafka wire schema (topic/partition/offset/timestamp/
      // key/value binary) with a JSON value derived closed-form from
      // event_id; the decoder flattens it per serde_format=json. The
      // oracle re-derives the same rows from events directly — pinning
      // the option-map adapter's decode end-to-end without the jar.
      val e = events(s, dir)
      val valueJson = to_json(struct(
        col("event_id").as("id"),
        col("event_type").as("etype"),
        (col("event_id") % 5).as("sev")))
      val wire = e.select(
        lit("logs").as("topic"),
        (col("event_id") % 12).cast("int").as("partition"),
        col("event_id").as("offset"),
        to_timestamp(from_unixtime(col("event_id") % 100000)).as("timestamp"),
        concat(lit("k-"), (col("event_id") % 31).cast("string"))
          .cast("binary").as("key"),
        valueJson.cast("binary").as("value"))
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("etype",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("sev",
          org.apache.spark.sql.types.LongType)))
      graft.sources.Queues.decode(wire,
          graft.sources.Queues.KafkaTopic("logs", "g1", serdeFormat = "json"),
          Some(sch))
        .select(col("id"), col("etype"), col("sev"), col("kafka_topic"),
          col("kafka_partition"), col("kafka_offset"), col("kafka_key"),
          unix_timestamp(col("kafka_timestamp")).as("kafka_ts"))
    }, Some(
      """SELECT event_id AS id, event_type AS etype,
        | event_id % 5 AS sev, 'logs' AS kafka_topic,
        | CAST(event_id % 12 AS INT) AS kafka_partition,
        | event_id AS kafka_offset, 'k-' || (event_id % 31) AS kafka_key,
        | event_id % 100000 AS kafka_ts
        |FROM events""".stripMargin)),

    ("q_ddb_cdc", (s: SparkSession, dir: String) => {
      // analytic fixture: each event becomes one DynamoDB Streams record
      // (public GetRecords wire shape) built closed-form from event_id —
      // a recursively-typed AttributeValue NewImage, S/N keys, a TTL
      // service principal on every even REMOVE, and sequence numbers of
      // mixed digit lengths so the per-second version counter must order
      // numerically (length-first). The oracle re-derives every column —
      // including the unmarshalled `data` JSON text — from events.
      val e = events(s, dir)
      val ev = when(col("event_id") % 3 === 0, "INSERT")
        .when(col("event_id") % 3 === 1, "MODIFY").otherwise("REMOVE")
      val sec = (col("event_id") % 50).cast("string")
      val ttl = col("event_id") % 3 === 2 && col("event_id") % 2 === 0
      val img = concat(
        lit("""{"name":{"S":""""), col("event_type"),
        lit(""""},"qty":{"N":""""), (col("event_id") % 7).cast("string"),
        lit(""".5"},"ok":{"BOOL":"""), (col("event_id") % 2 === 0).cast("string"),
        lit("""},"tags":{"L":[{"S":"t"""), (col("event_id") % 4).cast("string"),
        lit(""""}]},"meta":{"M":{"src":{"S":"gw"}}}}"""))
      val rec = concat(
        lit("""{"eventID":"e"""), col("event_id").cast("string"),
        lit("""","eventName":""""), ev,
        lit("""","dynamodb":{"ApproximateCreationDateTime":"""), sec,
        lit(""","Keys":{"pk":{"S":"u"""), (col("event_id") % 11).cast("string"),
        lit(""""},"sk":{"N":""""), col("event_id").cast("string"),
        lit(""""}},"NewImage":"""), img,
        lit(""","SequenceNumber":""""), col("event_id").cast("string"),
        lit(""""}"""),
        when(ttl, lit(""","userIdentity":{"PrincipalId":"dynamodb.amazonaws.com","Type":"Service"}"""))
          .otherwise(lit("")),
        lit("}"))
      graft.sources.Cdc.ddbStream(e.select(rec.as("rec")), "rec",
          graft.sources.Cdc.DdbConf("tbl", "pk", Some("sk")))
        .select(col("table_name"), col("dynamodb_event_name"),
          col("opensearch_action"), col("dynamodb_timestamp"),
          col("sequence_number"), col("partition_key"), col("sort_key"),
          col("primary_key"), col("ttl_delete").cast("int").as("ttl_i"),
          col("data"), col("document_version"))
    }, Some(
      """WITH b AS (SELECT event_id, event_type,
        |  CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'INSERT'
        |    WHEN 1 THEN 'MODIFY' ELSE 'REMOVE' END AS ev,
        |  event_id % 50 AS sec, CAST(event_id AS VARCHAR) AS seq
        | FROM events)
        |SELECT 'tbl' AS table_name, ev AS dynamodb_event_name,
        | CASE WHEN ev = 'REMOVE' THEN 'delete' ELSE 'index' END
        |   AS opensearch_action,
        | sec * 1000 AS dynamodb_timestamp, seq AS sequence_number,
        | 'u' || (event_id % 11) AS partition_key, seq AS sort_key,
        | 'u' || (event_id % 11) || '|' || seq AS primary_key,
        | CAST(ev = 'REMOVE' AND event_id % 2 = 0 AS INT) AS ttl_i,
        | '{"name":"' || event_type || '","qty":' || (event_id % 7)
        |   || '.5,"ok":'
        |   || CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END
        |   || ',"tags":["t' || (event_id % 4)
        |   || '"],"meta":{"src":"gw"}}' AS data,
        | sec * 1000000 + row_number() OVER
        |   (PARTITION BY sec ORDER BY length(seq), seq) - 1
        |   AS document_version
        |FROM b""".stripMargin)),

    ("q_mongo_cdc", (s: SparkSession, dir: String) => {
      // analytic fixture: each event becomes one MongoDB change-stream
      // event in canonical Extended JSON (public wire shape) — insert/
      // update/replace carry a fullDocument with $numberLong/$numberDouble/
      // $date wrappers; delete carries only the documentKey. The decoder
      // must apply the BsonHelper relaxed-with-converters rendering and
      // the per-second (clusterTime t, ordered by i) version counter; the
      // oracle re-derives the relaxed JSON text closed-form from events.
      val e = events(s, dir)
      val op = when(col("event_id") % 4 === 0, "insert")
        .when(col("event_id") % 4 === 1, "update")
        .when(col("event_id") % 4 === 2, "replace").otherwise("delete")
      val idS = col("event_id").cast("string")
      val fullDoc = concat(
        lit("""{"_id":{"$numberLong":""""), idS,
        lit(""""},"name":""""), col("event_type"),
        lit("""","score":{"$numberDouble":""""), (col("event_id") % 9).cast("string"),
        lit(""".25"},"when":{"$date":{"$numberLong":""""), idS,
        lit("""000"}},"tags":[{"$numberInt":"1"},"x"]}"""))
      val wire = concat(
        lit("""{"_id":{"_data":"rt"""), idS,
        lit(""""},"operationType":""""), op,
        lit("""","clusterTime":{"$timestamp":{"t":"""),
        (col("event_id") % 40).cast("string"),
        lit(""","i":"""), idS,
        lit("""}},"ns":{"db":"appdb","coll":"users"},"documentKey":{"_id":{"$numberLong":""""),
        idS, lit(""""}}"""),
        when(op === "delete", lit(""))
          .otherwise(concat(lit(""","fullDocument":"""), fullDoc)),
        lit("}"))
      graft.sources.Cdc.mongoChange(e.select(wire.as("ev")), "ev")
        .select(col("documentdb_collection"), col("documentdb_event_name"),
          col("opensearch_action"), col("documentdb_timestamp"),
          col("partition_key"), col("primary_key"),
          col("documentdb_id_bson_type"), col("data"),
          col("document_version"))
    }, Some(
      """WITH b AS (SELECT event_id, event_type,
        |  CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'insert'
        |    WHEN 1 THEN 'update' WHEN 2 THEN 'replace'
        |    ELSE 'delete' END AS op,
        |  event_id % 40 AS t FROM events)
        |SELECT 'appdb.users' AS documentdb_collection,
        | op AS documentdb_event_name,
        | CASE WHEN op = 'delete' THEN 'delete' ELSE 'index' END
        |   AS opensearch_action,
        | t * 1000 AS documentdb_timestamp,
        | CAST(event_id AS VARCHAR) AS partition_key,
        | CAST(event_id AS VARCHAR) AS primary_key,
        | 'Int64' AS documentdb_id_bson_type,
        | CASE WHEN op = 'delete' THEN '{"_id":' || event_id || '}'
        |   ELSE '{"_id":' || event_id || ',"name":"' || event_type
        |     || '","score":' || (event_id % 9) || '.25,"when":'
        |     || event_id || '000,"tags":[1,"x"]}' END AS data,
        | t * 1000000 + row_number() OVER
        |   (PARTITION BY t ORDER BY event_id) - 1 AS document_version
        |FROM b""".stripMargin)),

    ("q_sns_sink", (s: SparkSession, dir: String) => {
      // SNS PublishBatch assignment: FIFO topic, batch_size 7, group id
      // resolved from the event_type field, dedup id defaulted. ts is
      // event_id % 1000 so thousands of rank ties exercise the
      // (ts, src_id) total order through the two-phase distributed rank.
      val e = events(s, dir)
      val msg = concat(lit("evt "), col("event_type"), lit(" "),
        col("event_id").cast("string"))
      graft.sinks.SnsSink.assignBatches(
        e.select(col("event_id"), (col("event_id") % 1000).as("tsec"),
          msg.as("msg"), col("event_type")),
        "tsec", "event_id", "msg",
        graft.sinks.SnsSink.Conf("arn:aws:sns:us-east-1:1:logs.fifo",
          batchSize = 7, messageGroupId = Some("event_type")))
    }, Some(
      """WITH b AS (SELECT event_id, event_type, event_id % 1000 AS ts,
        |  row_number() OVER (ORDER BY event_id % 1000, event_id) - 1
        |    AS rnk FROM events)
        |SELECT 'arn:aws:sns:us-east-1:1:logs.fifo' AS topic_arn,
        | event_id AS src_id, ts,
        | 'evt ' || event_type || ' ' || event_id AS message,
        | rnk // 7 + 1 AS request_idx, rnk % 7 + 1 AS seq_in_request,
        | event_type AS message_group_id,
        | 'd-' || event_id AS message_deduplication_id
        |FROM b""".stripMargin)),

    ("q_sns_payloads", (s: SparkSession, dir: String) => {
      // the wire side of the same assignment: one PublishBatch JSON body
      // per request, entries in sequence order — the oracle re-renders
      // the exact JSON text with string_agg.
      val e = events(s, dir)
      val msg = concat(lit("evt "), col("event_type"), lit(" "),
        col("event_id").cast("string"))
      graft.sinks.SnsSink.publishBatchPayloads(
        graft.sinks.SnsSink.assignBatches(
          e.select(col("event_id"), (col("event_id") % 1000).as("tsec"),
            msg.as("msg"), col("event_type")),
          "tsec", "event_id", "msg",
          graft.sinks.SnsSink.Conf("arn:aws:sns:us-east-1:1:logs.fifo",
            batchSize = 7, messageGroupId = Some("event_type"))))
    }, Some(
      """WITH b AS (SELECT event_id, event_type,
        |  row_number() OVER (ORDER BY event_id % 1000, event_id) - 1
        |    AS rnk FROM events)
        |SELECT 'arn:aws:sns:us-east-1:1:logs.fifo' AS topic_arn,
        | rnk // 7 + 1 AS request_idx,
        | count(*) AS n_entries,
        | '[' || string_agg(
        |   '{"Id":"' || (rnk % 7 + 1) || '","Message":"evt '
        |     || event_type || ' ' || event_id
        |     || '","MessageGroupId":"' || event_type
        |     || '","MessageDeduplicationId":"d-' || event_id || '"}',
        |   ',' ORDER BY rnk % 7 + 1) || ']' AS payload
        |FROM b GROUP BY rnk // 7 + 1""".stripMargin)),

    ("q_kafka_encode", (s: SparkSession, dir: String) => {
      // produce-side encode: events → spark-sql-kafka write schema with
      // the client's murmur2 default-partitioner placement. Keys are
      // exactly 4 ASCII bytes so the oracle UNROLLS MurmurHash2's 32-bit
      // modular arithmetic in SQL — the partitioner kernel is pinned
      // bit-for-bit, not just shape-checked.
      val e = events(s, dir)
      val value = concat(lit("""{"id":"""), col("event_id").cast("string"),
        lit(""","etype":""""), col("event_type"), lit(""""}"""))
      val keyed = e.select(col("event_id").as("id"), value.as("body"))
        .withColumn("k3", lpad((col("id") % 1000).cast("string"), 3, "0"))
      graft.sources.Queues.produce(keyed, "logs", "k${k3}", "body",
          numPartitions = 12)
        .select(col("topic"), col("partition").as("part_id"),
          col("key").cast("string").as("key_s"),
          col("value").cast("string").as("value_s"))
    }, Some(
      """WITH b AS (SELECT event_id, event_type,
        |  'k' || lpad(CAST(event_id % 1000 AS VARCHAR), 3, '0') AS key_s
        | FROM events),
        | m AS (SELECT *,
        |  CAST(ascii(substr(key_s,1,1)) + ascii(substr(key_s,2,1))*256
        |   + ascii(substr(key_s,3,1))*65536
        |   + ascii(substr(key_s,4,1))*16777216 AS BIGINT) AS k0 FROM b),
        | s1 AS (SELECT *, (k0 * 1540483477) % 4294967296 AS k1 FROM m),
        | s2 AS (SELECT *, xor(k1, k1 // 16777216) AS k2 FROM s1),
        | s3 AS (SELECT *, (k2 * 1540483477) % 4294967296 AS kf,
        |   CAST(2538058376 AS BIGINT) * 1540483477 % 4294967296 AS h1
        |  FROM s2),
        | s4 AS (SELECT *, xor(h1, kf) AS h2 FROM s3),
        | s5 AS (SELECT *, xor(h2, h2 // 8192) AS h3 FROM s4),
        | s6 AS (SELECT *, (h3 * 1540483477) % 4294967296 AS h4 FROM s5),
        | s7 AS (SELECT *, xor(h4, h4 // 32768) AS h5 FROM s6)
        |SELECT 'logs' AS topic,
        | CAST((h5 % 2147483648) % 12 AS INT) AS part_id, key_s,
        | '{"id":' || event_id || ',"etype":"' || event_type || '"}'
        |   AS value_s
        |FROM s7""".stripMargin)),

    ("q_http_sink", (s: SparkSession, dir: String) => {
      // the ENCODE side of the http sink: single-buffer greedy fold —
      // flush-before-add on request bytes (empty-buffer flush is a
      // no-op, so oversized events ride alone; no DLQ in this sink),
      // flush-after-add on event count — sharded per worker. The oracle
      // replays the exact sequential fold as a RECURSIVE CTE per shard.
      val e = events(s, dir)
      val fixture = e.select(
        expr("event_id DIV 3").as("ts"),
        col("event_id").as("id"),
        expr("repeat('b', CAST(10 + (event_id * 13) % 90 AS INT))").as("msg"))
      graft.sinks.HttpSink.assignBatches(fixture, "ts", "id", "msg",
          graft.sinks.HttpSink.Thresholds(
            maxEvents = 5, maxRequestBytes = 250), shards = 6)
        .select(col("shard"), col("src_id"), col("ts"),
          col("event_bytes"), col("request_idx"), col("seq_in_request"))
    }, Some(
      """WITH RECURSIVE base AS (
        |  SELECT event_id % 6 AS shard, event_id // 3 AS ts,
        |         event_id AS src_id,
        |         CAST(10 + (event_id * 13) % 90 AS BIGINT) AS event_bytes
        |  FROM events
        |), ok AS (
        |  SELECT *, row_number() OVER (PARTITION BY shard
        |                               ORDER BY ts, src_id) AS rn
        |  FROM base
        |), st AS (
        |  SELECT shard, rn, src_id, ts, event_bytes,
        |         CAST(1 AS BIGINT) AS request_idx,
        |         CAST(1 AS BIGINT) AS seq_in_request,
        |         event_bytes AS buf_bytes
        |  FROM ok WHERE rn = 1
        |  UNION ALL
        |  SELECT o.shard, o.rn, o.src_id, o.ts, o.event_bytes,
        |    s.request_idx + CASE WHEN l.fl OR l.bf THEN 1 ELSE 0 END,
        |    CASE WHEN l.fl OR l.bf THEN 1 ELSE s.seq_in_request + 1 END,
        |    CASE WHEN l.fl OR l.bf THEN o.event_bytes
        |         ELSE s.buf_bytes + o.event_bytes END
        |  FROM ok o JOIN st s ON o.shard = s.shard AND o.rn = s.rn + 1,
        |  LATERAL (SELECT s.seq_in_request >= 5 AS fl,
        |    (NOT (s.seq_in_request >= 5))
        |      AND s.buf_bytes + o.event_bytes > 250 AS bf) l
        |)
        |SELECT shard, src_id, ts, event_bytes, request_idx,
        |       seq_in_request
        |FROM st""".stripMargin)),

    ("q_collapse_topk", (s: SparkSession, dir: String) => {
      val scored = docs(s, dir).select(col("doc_id"),
        concat(lit("host"), (col("doc_id") % 13).cast("string")).as("host"),
        round(col("n_chars").cast("double") / 7.0, 4).as("score"))
      graft.query.Search.collapseTopK(scored, "host", "score", "doc_id",
        k = 20, perKey = 2)
    }, Some(
      """WITH scored AS (SELECT doc_id, 'host' || (doc_id % 13) AS host,
        |  round(CAST(n_chars AS DOUBLE) / 7.0, 4) AS score FROM documents),
        | r AS (SELECT *, row_number() OVER
        |   (PARTITION BY host ORDER BY score DESC, doc_id) AS rnk FROM scored)
        |SELECT doc_id, host, score FROM r WHERE rnk <= 2
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    ("q_fuzzy_expand", (s: SparkSession, dir: String) => {
      // the synthetic corpus vocabulary has no natural distance-1
      // neighbors, so the dictionary fixture adds deterministic variants
      // (first char dropped, plural) — the expansion must hit exactly the
      // distance ≤ 1 slice of that enlarged dictionary
      val base = Analyzer.tokens(docs(s, dir), "doc_id", "text")
        .select("term").distinct()
      val dict = base
        .union(base.select(expr("substring(term, 2)").as("term")))
        .union(base.select(concat(col("term"), lit("s")).as("term")))
        .distinct().filter(col("term") =!= "")
      graft.query.Search.fuzzyExpand(dict, "term", "scan", maxDist = 1)
    }, Some(
      s"""WITH toks AS (SELECT DISTINCT unnest($tokSql) AS term FROM documents),
         | dict AS (SELECT DISTINCT term FROM (
         |   SELECT term FROM toks
         |   UNION ALL SELECT substr(term, 2) AS term FROM toks
         |   UNION ALL SELECT term || 's' AS term FROM toks)
         |  WHERE term <> '')
         |SELECT term, CAST(levenshtein(term, 'scan') AS INT) AS dist
         |FROM dict WHERE abs(length(term) - 4) <= 1
         |  AND levenshtein(term, 'scan') <= 1""".stripMargin)),

    ("q_mlt_terms", (s: SparkSession, dir: String) => {
      graft.query.Search.moreLikeThisTerms(docs(s, dir), "doc_id", "text",
        docId = 42L, m = 10)
    }, Some(
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         | tf AS (SELECT term, count(*) AS tf FROM toks WHERE doc_id = 42 GROUP BY 1),
         | df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1)
         |SELECT term, tf, df FROM tf JOIN df USING (term)
         |ORDER BY tf DESC, df, term LIMIT 10""".stripMargin)),

    ("q_mlt_topk", (s: SparkSession, dir: String) => {
      graft.query.Search.moreLikeThisTopK(docs(s, dir), "doc_id", "text",
        docId = 42L, m = 8, k = 10)
    }, Some(mltTopKSql(docId = 42L, m = 8, k = 10))),

    ("q_snippets", (s: SparkSession, dir: String) => {
      val terms = Seq("spark", "window", "merge")
      docs(s, dir).select(col("doc_id"),
        graft.query.Snippets.snippet(col("text"), terms, 8).as("snippet"),
        graft.query.Snippets.snippetTermCount(col("text"), terms, 8)
          .as("n_terms"))
    }, Some(snippetSql(Seq("spark", "window", "merge"), w = 8))),

    ("q_bpe_encode", (s: SparkSession, dir: String) => {
      val enc = graft.ops.Bpe.encodeCol(col("term"), BpeFixedMerges)
      Analyzer.tokens(docs(s, dir), "doc_id", "text")
        .select("term").distinct()
        .select(col("term"), concat_ws(" ", enc).as("bpe"),
          size(enc).as("n_subwords"))
    }, Some(bpeEncodeSql(BpeFixedMerges))),

    ("q_bpe_train", (s: SparkSession, dir: String) => {
      import s.implicits._
      val merges = graft.ops.Bpe.train(docs(s, dir), "text", numMerges = 8)
      merges.zipWithIndex
        .map { case ((l, r), i) => (i, l, r) }
        .toDF("rank", "merge_left", "merge_right")
    }, Some(bpeTrainSql(numMerges = 8))),

    ("q_kinesis_deagg", (s: SparkSession, dir: String) => {
      // analytic fixture: each event becomes one KPL aggregated container
      // with two sub-records derived closed-form from event_id; every
      // 89th event is a NON-aggregated raw payload the decoder must pass
      // through untouched. Oracle recomputes the decoded rows from events.
      val enc = udf { (id: Long, typ: String) =>
        if (id % 89 == 0) s"raw-$id".getBytes("UTF-8")
        else graft.sources.KinesisAgg.aggregateLocal(Seq(
          (s"pk-${id % 5}", s"a-$typ-$id".getBytes("UTF-8")),
          (s"pk-${id % 7}", s"b-$id".getBytes("UTF-8"))))
      }
      val fixture = events(s, dir).select(col("event_id").as("src_id"),
        enc(col("event_id"), col("event_type")).as("payload"))
      graft.sources.KinesisAgg.deaggregate(fixture, "payload")
        .select(col("src_id"), col("record_pos"), col("partition_key"),
          col("data").cast("string").as("data_str"))
    }, Some(
      """SELECT event_id AS src_id, u.pos AS record_pos,
        | CASE WHEN event_id % 89 = 0 THEN NULL
        |      WHEN u.pos = 0 THEN 'pk-' || (event_id % 5)
        |      ELSE 'pk-' || (event_id % 7) END AS partition_key,
        | CASE WHEN event_id % 89 = 0 THEN 'raw-' || event_id
        |      WHEN u.pos = 0 THEN 'a-' || event_type || '-' || event_id
        |      ELSE 'b-' || event_id END AS data_str
        |FROM events, LATERAL (SELECT CAST(unnest([0, 1]) AS INT) AS pos) u
        |WHERE u.pos = 0 OR event_id % 89 <> 0""".stripMargin)),

    ("q_ann_ivfpq", (s: SparkSession, dir: String) => {
      val cents = annCentroids(k = 6, dim = 64)
      val cbs = pqCodebooks(m = 4, k = 8, dsub = 16)
      val q = annQueryVec(64)
      val coded = graft.ops.Similarity.ivfPqEncode(embeddings(s, dir),
        "embedding", cents, cbs)
      graft.ops.Similarity.ivfPqTopK(coded, "vec_id", "pq_code", q,
        cents, cbs, k = 10, nprobe = 2)
    }, Some(ivfPqSql(annQueryVec(64), annCentroids(k = 6, dim = 64),
      pqCodebooks(m = 4, k = 8, dsub = 16), k = 10, nprobe = 2))),

    ("q_phrase_snippet", (s: SparkSession, dir: String) => {
      docs(s, dir).select(col("doc_id"),
        graft.query.Snippets.phraseSnippet(col("text"),
          Seq("table", "hash"), 8).as("snippet"))
    }, Some(
      s"""WITH t AS (SELECT doc_id, $tokSql AS l FROM documents),
         | c AS (SELECT doc_id, l,
         |   list_filter(generate_series(0, len(l) - 2),
         |     i -> l[i + 1] = 'table' AND l[i + 2] = 'hash') AS starts FROM t),
         | e AS (SELECT doc_id, l,
         |   CASE WHEN len(starts) > 0 THEN starts[1] END AS s FROM c),
         | f AS (SELECT doc_id, l, s, greatest(s - 3, 0) AS w0 FROM e)
         |SELECT doc_id,
         | CASE WHEN s IS NOT NULL THEN array_to_string(
         |   list_transform(
         |     list_filter(generate_series(w0, w0 + 7), j -> j < len(l)),
         |     j -> CASE WHEN j >= s AND j < s + 2
         |          THEN '<em>' || l[j + 1] || '</em>' ELSE l[j + 1] END), ' ')
         | END AS snippet
         |FROM f""".stripMargin)),

    ("q_suggest", (s: SparkSession, dir: String) => {
      // same variant-enriched dictionary as q_fuzzy_expand, now with
      // corpus frequencies driving the rank
      val base = Analyzer.tokens(docs(s, dir), "doc_id", "text")
      val dict = base.select(col("term"))
        .union(base.select(expr("substring(term, 2)").as("term")))
        .union(base.select(concat(col("term"), lit("s")).as("term")))
        .filter(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).as("freq"))
      graft.query.Search.suggest(dict, "term", "freq", "scna",
        maxDist = 2, n = 5)
    }, Some(
      s"""WITH toks AS (SELECT unnest($tokSql) AS term FROM documents),
         | allv AS (SELECT term FROM toks
         |   UNION ALL SELECT substr(term, 2) AS term FROM toks
         |   UNION ALL SELECT term || 's' AS term FROM toks),
         | dict AS (SELECT term, count(*) AS freq FROM allv
         |   WHERE term <> '' GROUP BY 1)
         |SELECT term, freq, CAST(levenshtein(term, 'scna') AS INT) AS dist
         |FROM dict WHERE abs(length(term) - 4) <= 2
         |  AND levenshtein(term, 'scna') <= 2
         |ORDER BY dist, freq DESC, term LIMIT 5""".stripMargin)),

    ("q_search_facets", (s: SparkSession, dir: String) => {
      graft.query.Search.facets(docs(s, dir), "doc_id", "text",
        Seq("spark", "window"), "lang")
    }, Some(
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         | m AS (SELECT DISTINCT doc_id FROM toks
         |   WHERE term IN ('spark', 'window'))
         |SELECT lang, count(*) AS doc_count FROM documents
         |JOIN m USING (doc_id) GROUP BY 1""".stripMargin)),

    ("q_search_after", (s: SparkSession, dir: String) => {
      // page 2 of the q_bm25_topk ranking: cursor = page 1's last row
      val page1 = bm25TopK(docs(s, dir), Seq("spark", "window"), 10)
        .collect()
      val cursor = page1.last
      graft.query.Search.searchAfter(
        BruteForce.scoreAll(docs(s, dir), "doc_id", "text",
          Seq("spark", "window"))
          .withColumn("score", round(col("score"), 4)),
        "docId", "score",
        cursor.getAs[Double]("score"), cursor.getAs[Long]("doc_id"), k = 10)
        .withColumnRenamed("docId", "doc_id")
    }, Some {
      // rows 11-20 of the same ranking — an independent derivation of
      // the page-2 contract (cursor semantics ≡ rank offset)
      val base = bm25Sql(Seq("spark", "window"), k = 20)
      s"""WITH page AS ($base)
         |SELECT doc_id, score FROM (
         |  SELECT doc_id, score, row_number() OVER
         |    (ORDER BY score DESC, doc_id) AS rn FROM page)
         |WHERE rn > 10""".stripMargin
    }),

    ("q_ann_pq", (s: SparkSession, dir: String) => {
      val cbs = pqCodebooks(m = 4, k = 8, dsub = 16)
      val q = annQueryVec(64)
      val coded = graft.ops.Similarity.pqEncode(embeddings(s, dir),
        "embedding", cbs)
      graft.ops.Similarity.pqTopK(coded, "vec_id", "pq_code", q, cbs, k = 10)
    }, Some(pqSql(annQueryVec(64), pqCodebooks(m = 4, k = 8, dsub = 16),
      k = 10))),

    ("q_bool_topk", (s: SparkSession, dir: String) => {
      graft.query.Search.boolTopK(docs(s, dir), "doc_id", "text",
        must = Seq("spark"), should = Seq("window"), mustNot = Seq("slow"),
        k = 15)
    }, Some(boolSql(must = Seq("spark"), should = Seq("window"),
      mustNot = Seq("slow"), k = 15))),

    // ---------- INDEX-SERVED search API (round 5) ----------
    // Same query shapes as q_bool_topk / q_mlt_topk / q_search_facets /
    // q_suggest, but answered from the BUILT index (bucket-pruned postings
    // + termstats/tf artifacts) instead of a per-query corpus scan — the
    // serving path the r4 verdict demanded. Each shares (or mirrors) the
    // brute form's DuckDB oracle, so the oracle pins index-served ≡ brute
    // ≡ DuckDB on the same corpus.
    ("q_bool_topk_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir).boolTopK(
        must = Seq("spark"), should = Seq("window"), mustNot = Seq("slow"),
        k = 15).transform(indexIdsToDocIds(s, dir))
    }, Some(boolSql(must = Seq("spark"), should = Seq("window"),
      mustNot = Seq("slow"), k = 15))),

    ("q_mlt_topk_indexed", (s: SparkSession, dir: String) => {
      val se = docIndexSearch(s, dir)
      se.moreLikeThisTopK(indexIdOf(s, dir, 42L), m = 8, k = 10)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(mltTopKSql(docId = 42L, m = 8, k = 10))),

    ("q_fuzzy_topk_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir).fuzzyTopK(Seq("scna"), k = 12, maxDist = 2)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(fuzzyTopKSql("scna", maxDist = 2, k = 12))),

    ("q_multi_match", (s: SparkSession, dir: String) => {
      // OpenSearch multi_match, brute form: two fields (title = first 8
      // analyzer tokens ^2, text ^1), each scored with FIELD-LOCAL BM25
      // stats (Lucene: every field is its own index), best_fields with a
      // tie breaker. The oracle re-derives both field chains closed-form.
      val title = array_join(
        slice(graft.analyze.Analyzer.tokensCol(col("text")), 1, 8), " ")
      val d = docs(s, dir).select(col("doc_id"), col("text"))
        .withColumn("title", title)
      graft.query.Search.multiMatchTopK(d, "doc_id",
        Seq("title" -> 2.0, "text" -> 1.0), Seq("spark", "hash"), 15,
        "best_fields", tieBreaker = 0.3)
        .withColumnRenamed("docId", "doc_id")
    }, Some(multiMatchSql(Seq("spark", "hash"), 15, "best_fields",
      tie = 0.3, titleBoost = 2.0, textBoost = 1.0))),

    ("q_multi_match_indexed", (s: SparkSession, dir: String) => {
      // the SERVED twin: per-field indexes (title index + text index over
      // the same url set — docIds align by construction), postings-decoded
      // field scores, same combination; shares q_multi_match's oracle
      graft.query.IndexSearch.multiMatchTopK(
        Seq(new graft.query.IndexSearch(s, titleIndexDir(s, dir)) -> 2.0,
          docIndexSearch(s, dir) -> 1.0),
        Seq("spark", "hash"), 15, "best_fields", tieBreaker = 0.3)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(multiMatchSql(Seq("spark", "hash"), 15, "best_fields",
      tie = 0.3, titleBoost = 2.0, textBoost = 1.0))),

    ("q_multi_match_most", (s: SparkSession, dir: String) => {
      // most_fields variant: boosted field scores SUM
      val title = array_join(
        slice(graft.analyze.Analyzer.tokensCol(col("text")), 1, 8), " ")
      val d = docs(s, dir).select(col("doc_id"), col("text"))
        .withColumn("title", title)
      graft.query.Search.multiMatchTopK(d, "doc_id",
        Seq("title" -> 2.0, "text" -> 1.0), Seq("the", "data"), 12,
        "most_fields")
        .withColumnRenamed("docId", "doc_id")
    }, Some(multiMatchSql(Seq("the", "data"), 12, "most_fields",
      tie = 0.0, titleBoost = 2.0, textBoost = 1.0))),

    ("q_composite_agg", (s: SparkSession, dir: String) => {
      // OpenSearch `composite` aggregation (the bucket-EXPORT agg): two
      // sources (lang terms + n_chars histogram), key-ordered buckets,
      // page 2 via the stateless strict-greater `after` cursor
      graft.query.Search.compositeAgg(docs(s, dir), "doc_id", "text",
        Seq("spark", "window"),
        Seq("lang" -> col("lang"),
          "bucket" -> (floor(col("n_chars").cast("double") / 100.0) * 100.0)),
        size = 6, after = Some(Seq(lit("en"), lit(200.0))))
    }, Some(compositeSql(Seq("spark", "window"), 6, "('en', 200.0)"))),

    ("q_composite_indexed", (s: SparkSession, dir: String) => {
      // the SERVED twin: match set from postings, buckets over the docs
      // artifact joined to the documents dimensions; same oracle
      val meta = s.read.parquet(s"${docIndexDir(s, dir)}/docs")
        .select(col("docId"),
          expr("CAST(substring(url, 2) AS BIGINT)").as("doc_id"))
        .join(docs(s, dir).select("doc_id", "lang", "n_chars"), "doc_id")
      docIndexSearch(s, dir).compositeAgg(Seq("spark", "window"), meta,
        Seq("lang" -> col("lang"),
          "bucket" -> (floor(col("n_chars").cast("double") / 100.0) * 100.0)),
        size = 6, after = Some(Seq(lit("en"), lit(200.0))))
    }, Some(compositeSql(Seq("spark", "window"), 6, "('en', 200.0)"))),

    ("q_search_facets_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir).facets(Seq("spark", "window"), "lang")
    }, Some(
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         | m AS (SELECT DISTINCT doc_id FROM toks
         |   WHERE term IN ('spark', 'window'))
         |SELECT lang, count(*) AS doc_count FROM documents
         |JOIN m USING (doc_id) GROUP BY 1""".stripMargin)),

    ("q_suggest_indexed", (s: SparkSession, dir: String) => {
      // plain corpus dictionary (no fixture variants): termstats/ carries
      // (term, total_tf) — total_tf IS the corpus frequency the brute
      // suggester aggregates
      docIndexSearch(s, dir).suggest("scna", maxDist = 2, n = 5)
    }, Some(
      s"""WITH toks AS (SELECT unnest($tokSql) AS term FROM documents),
         | dict AS (SELECT term, count(*) AS freq FROM toks GROUP BY 1)
         |SELECT term, freq, CAST(levenshtein(term, 'scna') AS INT) AS dist
         |FROM dict WHERE abs(length(term) - 4) <= 2
         |  AND levenshtein(term, 'scna') <= 2
         |ORDER BY dist, freq DESC, term LIMIT 5""".stripMargin)),

    ("q_search_after_indexed", (s: SparkSession, dir: String) => {
      // keyset page 2 served from the index: cursor = page 1's last
      // (rounded score, index docId), applied inside the shard kernel —
      // no deep-offset materialization. Shares q_search_after's oracle
      // (rows 11-20 of the same ranking) via the monotone id mapping.
      val se = docIndexSearch(s, dir)
      val page1 = se.boolTopK(Nil, Seq("spark", "window"), Nil, 10).collect()
      val cur = page1.last
      se.searchAfter(Seq("spark", "window"),
          cur.getAs[Double]("score"), cur.getAs[Long]("docId"), k = 10)
        .transform(indexIdsToDocIds(s, dir))
    }, Some {
      val base = bm25Sql(Seq("spark", "window"), k = 20)
      s"""WITH page AS ($base)
         |SELECT doc_id, score FROM (
         |  SELECT doc_id, score, row_number() OVER
         |    (ORDER BY score DESC, doc_id) AS rn FROM page)
         |WHERE rn > 10""".stripMargin
    }),

    // dis_max / boosted / regexp / synonym / stats / significant_terms —
    // round-5 search-API widening. Brute and index-served forms share one
    // DuckDB oracle each, so the gate pins brute ≡ index ≡ DuckDB.
    ("q_dis_max", (s: SparkSession, dir: String) => {
      graft.query.Search.disMaxTopK(docs(s, dir), "doc_id", "text",
        Seq("spark", "window", "merge"), tieBreaker = 0.3, k = 15)
    }, Some(disMaxSql(Seq("spark", "window", "merge"), 0.3, 15))),

    ("q_dis_max_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir)
        .disMaxTopK(Seq("spark", "window", "merge"), tieBreaker = 0.3, k = 15)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(disMaxSql(Seq("spark", "window", "merge"), 0.3, 15))),

    ("q_boosted_topk", (s: SparkSession, dir: String) => {
      graft.query.Search.boostedTopK(docs(s, dir), "doc_id", "text",
        Seq(("spark", 2.0), ("window", 0.5), ("merge", 1.0)), k = 15)
    }, Some(boostedSql(
      Seq(("spark", 2.0), ("window", 0.5), ("merge", 1.0)), 15))),

    ("q_boosted_topk_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir)
        .boostedTopK(Seq(("spark", 2.0), ("window", 0.5), ("merge", 1.0)),
          k = 15)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(boostedSql(
      Seq(("spark", 2.0), ("window", 0.5), ("merge", 1.0)), 15))),

    ("q_regexp_topk", (s: SparkSession, dir: String) => {
      // "s[a-z]+" matches > 4 corpus terms, so maxExpansions = 4 also
      // exercises the sorted-ascending expansion cap on both engines
      graft.query.Search.regexpTopK(docs(s, dir), "doc_id", "text",
        "s[a-z]+", k = 12, maxExpansions = 4)
    }, Some(regexpSql("s[a-z]+", maxExpansions = 4, k = 12))),

    ("q_regexp_topk_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir)
        .regexpTopK("s[a-z]+", k = 12, maxExpansions = 4)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(regexpSql("s[a-z]+", maxExpansions = 4, k = 12))),

    ("q_synonym_topk", (s: SparkSession, dir: String) => {
      graft.query.Search.synonymTopK(docs(s, dir), "doc_id", "text",
        Seq("spark"), Map("spark" -> Seq("window", "merge")), k = 12)
    }, Some(bm25Sql(Seq("merge", "spark", "window"), k = 12))),

    ("q_synonym_topk_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir)
        .synonymTopK(Seq("spark"), Map("spark" -> Seq("window", "merge")),
          k = 12)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(bm25Sql(Seq("merge", "spark", "window"), k = 12))),

    ("q_match_stats", (s: SparkSession, dir: String) => {
      graft.query.Search.matchStats(docs(s, dir), "doc_id", "text",
        Seq("spark", "window"), "n_chars")
    }, Some(matchStatsSql(Seq("spark", "window")))),

    ("q_match_stats_indexed", (s: SparkSession, dir: String) => {
      // meta keyed by INDEX docId: the docs/ artifact's url (zero-padded
      // doc_id) joins the documents table's value column across — one
      // dimension join, the corpus text is never re-read
      val meta = s.read.parquet(s"${docIndexDir(s, dir)}/docs")
        .select(col("docId"),
          expr("CAST(substring(url, 2) AS BIGINT)").as("doc_id"))
        .join(docs(s, dir).select("doc_id", "n_chars"), "doc_id")
        .select("docId", "n_chars")
      docIndexSearch(s, dir).matchStats(Seq("spark", "window"), meta,
        "n_chars")
    }, Some(matchStatsSql(Seq("spark", "window")))),

    ("q_significant_terms", (s: SparkSession, dir: String) => {
      graft.query.Search.significantTerms(docs(s, dir), "doc_id", "text",
        Seq("spark", "window"), n = 10, minDocCount = 3)
    }, Some(sigTermsSql(Seq("spark", "window"), n = 10, minDocCount = 3))),

    ("q_significant_terms_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir).significantTerms(Seq("spark", "window"),
        n = 10, minDocCount = 3)
    }, Some(sigTermsSql(Seq("spark", "window"), n = 10, minDocCount = 3))),

    // Lucene-style query_string: one string exercising every clause shape
    // at once — must term, boosted should, slop phrase, must_not, wildcard
    // expansion (st*m → stream), fuzzy expansion (sprk~1 → spark; the
    // oracle re-derives both expansions from the data with LIKE /
    // levenshtein). Brute and index-served share the SQL, so the gate
    // pins parse ≡ brute ≡ postings-composition ≡ DuckDB.
    // match_phrase_prefix (search-as-you-type): "window s" — last term a
    // prefix expanding to 4 corpus terms (scan/slow/small/sort), slop 1.
    // The oracle derives the expansion with LIKE + the ascending cap, the
    // union-slot positions with list_contains, and the df_union idf.
    ("q_phrase_prefix", (s: SparkSession, dir: String) => {
      graft.query.BruteForce.phrasePrefixScoreAll(docs(s, dir), "doc_id",
          "text", Seq("window", "s"), slop = 1, maxExpansions = 4)
        .withColumn("score", round(col("score"), 4))
        .orderBy(desc("score"), col("docId"))
        .limit(15)
        .withColumnRenamed("docId", "doc_id")
    }, Some(phrasePrefixSql("window", "s", slop = 1, cap = 4, k = 15,
      withTf = true))),

    ("q_phrase_prefix_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir)
        .phrasePrefixScores(Seq("window", "s"), slop = 1, maxExpansions = 4)
        .withColumn("score", round(col("score"), 4))
        .orderBy(desc("score"), col("docId"))
        .limit(15)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(phrasePrefixSql("window", "s", slop = 1, cap = 4, k = 15,
      withTf = false))),

    // DSIR importance resampling: select raw docs toward the lang='en'
    // slice's hashed-bigram distribution — the oracle re-derives the
    // featurization, both smoothed models, the ordered per-doc weight
    // fold, and the deterministic Gumbel top-n
    ("q_dsir_select", (s: SparkSession, dir: String) => {
      val d = docs(s, dir)
      graft.ops.Dsir.select(d, d.filter(col("lang") === "en"),
          "doc_id", "text", buckets = 64, n = 40)
        .withColumnRenamed("docId", "doc_id")
    }, Some(dsirSql(buckets = 64, n = 40))),

    // search page served end-to-end from the index: postings-ranked
    // top-k, text fetched for the k hits only, best-window snippets
    ("q_snippets_indexed", (s: SparkSession, dir: String) => {
      val m = s.read.parquet(s"${docIndexDir(s, dir)}/docs")
        .select(col("docId"),
          expr("CAST(substring(url, 2) AS BIGINT)").as("doc_id"))
      docIndexSearch(s, dir)
        .topKWithSnippets(Seq("spark", "window", "merge"), k = 12, w = 8)
        .join(m, "docId")
        .select("doc_id", "score", "snippet", "n_terms")
    }, Some(snippetsTopKSql(Seq("spark", "window", "merge"), 12, 8))),

    // filters + adjacency_matrix aggregations: named term-filter buckets
    // (empty kept at 0) and the pairwise co-occurrence matrix (zero
    // buckets omitted, keys in declaration order)
    ("q_filters_agg", (s: SparkSession, dir: String) => {
      graft.query.Search.filtersAgg(docs(s, dir), "doc_id", "text",
        filtersGate)
    }, Some(filtersAggSql)),

    ("q_filters_agg_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir).filtersAgg(filtersGate)
    }, Some(filtersAggSql)),

    ("q_adjacency_matrix", (s: SparkSession, dir: String) => {
      graft.query.Search.adjacencyMatrix(docs(s, dir), "doc_id", "text",
        filtersGate)
    }, Some(adjacencySql)),

    ("q_adjacency_matrix_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir).adjacencyMatrix(filtersGate)
    }, Some(adjacencySql)),

    // pipeline aggs over the served date histogram: cumulative_sum,
    // derivative (null first bucket), trailing 3-bucket moving average
    ("q_histogram_pipeline", (s: SparkSession, dir: String) => {
      val meta = s.read.parquet(s"${docIndexDir(s, dir)}/docs")
        .select(col("docId"), expr(
          "timestampadd(DAY, CAST(CAST(substring(url, 2) AS BIGINT) % 90" +
            " AS INT), TIMESTAMP '2026-01-01 00:00:00')").as("ts"))
      val hist = docIndexSearch(s, dir)
        .dateHistogram(Seq("spark", "merge"), meta, "ts", "week")
      graft.query.Search.movingAvg(
        graft.query.Search.derivative(
          graft.query.Search.cumulativeSum(hist, "bucket", "doc_count"),
          "bucket", "doc_count"),
        "bucket", "doc_count", window = 3)
    }, Some(
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         | m AS (SELECT DISTINCT doc_id FROM toks
         |       WHERE term IN ('merge', 'spark')),
         | h AS (SELECT date_trunc('week', TIMESTAMP '2026-01-01 00:00:00'
         |         + (doc_id % 90) * INTERVAL 1 DAY) AS bucket,
         |       count(*) AS doc_count
         |   FROM m GROUP BY 1)
         |SELECT bucket, doc_count,
         | CAST(sum(doc_count) OVER (ORDER BY bucket
         |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative,
         | doc_count - lag(doc_count) OVER (ORDER BY bucket) AS derivative,
         | round(avg(doc_count) OVER (ORDER BY bucket
         |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg
         |FROM h ORDER BY bucket""".stripMargin)),

    // terms + top_hits: biggest lang buckets of the match set, top docs
    // per bucket by (rounded score, doc_id) — the oracle replays bucket
    // selection and the per-bucket window
    ("q_top_hits", (s: SparkSession, dir: String) => {
      graft.query.Search.topHits(docs(s, dir), "doc_id", "text",
        Seq("spark", "window"), "lang", nBuckets = 3, perBucket = 5)
    }, Some(topHitsSql(Seq("spark", "window"), 3, 5))),

    ("q_top_hits_indexed", (s: SparkSession, dir: String) => {
      val m = s.read.parquet(s"${docIndexDir(s, dir)}/docs")
        .select(col("docId"),
          expr("CAST(substring(url, 2) AS BIGINT)").as("doc_id"))
      docIndexSearch(s, dir)
        .topHits(Seq("spark", "window"), "lang", nBuckets = 3,
          perBucket = 5)
        .join(m, "docId")
        .select("facet", "doc_count", "rnk", "doc_id", "score")
    }, Some(topHitsSql(Seq("spark", "window"), 3, 5))),

    // percentiles / histogram / cardinality aggregations beside a query —
    // exact interpolated quantiles, fixed-interval buckets, and the KMV
    // bottom-k estimator (replayed hash-for-hash) over the match set
    ("q_match_percentiles", (s: SparkSession, dir: String) => {
      graft.query.Search.matchPercentiles(docs(s, dir), "doc_id", "text",
        Seq("spark", "window"), "n_chars", Seq(0.25, 0.5, 0.9, 0.99))
    }, Some(matchPercentilesSql(Seq("spark", "window"),
      Seq(0.25, 0.5, 0.9, 0.99)))),

    ("q_match_percentiles_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir).matchPercentiles(Seq("spark", "window"),
        indexMeta(s, dir, "n_chars"), "n_chars", Seq(0.25, 0.5, 0.9, 0.99))
    }, Some(matchPercentilesSql(Seq("spark", "window"),
      Seq(0.25, 0.5, 0.9, 0.99)))),

    ("q_match_histogram", (s: SparkSession, dir: String) => {
      graft.query.Search.matchHistogram(docs(s, dir), "doc_id", "text",
        Seq("spark", "window"), "n_chars", interval = 100.0)
    }, Some(matchHistogramSql(Seq("spark", "window"), 100.0))),

    ("q_match_histogram_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir).matchHistogram(Seq("spark", "window"),
        indexMeta(s, dir, "n_chars"), "n_chars", interval = 100.0)
    }, Some(matchHistogramSql(Seq("spark", "window"), 100.0))),

    ("q_match_cardinality", (s: SparkSession, dir: String) => {
      graft.query.Search.matchCardinality(docs(s, dir), "doc_id", "text",
        Seq("spark", "window"), "n_chars", k = 16)
    }, Some(matchCardinalitySql(Seq("spark", "window"), 16))),

    ("q_match_cardinality_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir).matchCardinality(Seq("spark", "window"),
        indexMeta(s, dir, "n_chars"), "n_chars", k = 16)
    }, Some(matchCardinalitySql(Seq("spark", "window"), 16))),

    // rescore: primary BM25 window of 30, phrase re-rank at 2x weight —
    // the oracle replays window selection on rounded primary scores, the
    // slop-phrase chain, and the total-mode combination
    ("q_rescore", (s: SparkSession, dir: String) => {
      graft.query.Search.rescoreTopK(docs(s, dir), "doc_id", "text",
        Seq("spark", "merge"), Seq("window", "sort"), slop = 1,
        windowSize = 30, k = 15, queryWeight = 1.0, rescoreWeight = 2.0)
    }, Some(rescoreSql(Seq("merge", "spark"), 30, 15, 2.0))),

    ("q_rescore_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir)
        .rescoreTopK(Seq("spark", "merge"), Seq("window", "sort"), slop = 1,
          windowSize = 30, k = 15, queryWeight = 1.0, rescoreWeight = 2.0)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(rescoreSql(Seq("merge", "spark"), 30, 15, 2.0))),

    // function_score / field_value_factor: BM25 × ln(1 + 0.001·n_chars)
    ("q_function_score", (s: SparkSession, dir: String) => {
      graft.query.Search.fieldValueFactorTopK(docs(s, dir), "doc_id",
        "text", Seq("spark", "merge"), "n_chars", factor = 0.001,
        modifier = "ln1p", k = 15)
    }, Some(fvfSql(Seq("merge", "spark"), 0.001, 15))),

    ("q_function_score_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir).fieldValueFactorTopK(Seq("spark", "merge"),
          indexMeta(s, dir, "n_chars"), "n_chars", factor = 0.001,
          modifier = "ln1p", k = 15)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(fvfSql(Seq("merge", "spark"), 0.001, 15))),

    ("q_query_string", (s: SparkSession, dir: String) => {
      graft.query.QueryString.topK(docs(s, dir), "doc_id", "text",
        queryStringGate, k = 15)
    }, Some(queryStringSql(15))),

    ("q_query_string_indexed", (s: SparkSession, dir: String) => {
      docIndexSearch(s, dir).queryStringTopK(queryStringGate, k = 15)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(queryStringSql(15))),

    ("q_temperature_sample", (s: SparkSession, dir: String) => {
      graft.ops.Sampling.temperatureSample(docs(s, dir), "doc_id", "lang",
        temperature = 2.0, targetFraction = 0.3)
        .select("doc_id", "lang")
    }, Some(
      """WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
        | g AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM c),
        | w AS (SELECT lang, c, pow(c / g.n, 0.5) AS wq FROM c, g),
        | z AS (SELECT sum(wq) AS z FROM w),
        | r AS (SELECT w.lang,
        |   round(least(1.0, 0.3 * g.n * (w.wq / z.z) / w.c), 9) AS a
        |   FROM w, z, g),
        | th AS (SELECT lang,
        |   CASE WHEN CAST(round(a * 4294967296) AS BIGINT) >= 4294967296
        |        THEN 'g'
        |        ELSE printf('%08x', CAST(round(a * 4294967296) AS BIGINT))
        |   END AS thr FROM r)
        |SELECT d.doc_id, d.lang FROM documents d JOIN th USING (lang)
        |WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || 'temp'), 1, 8) < th.thr""".stripMargin)),

    ("q_kmv_distinct", (s: SparkSession, dir: String) => {
      val sk = graft.ops.Sketches.kmvSketch(docs(s, dir), Seq("lang"),
        "text", k = 16)
      val exact = docs(s, dir).groupBy("lang")
        .agg(countDistinct(col("text")).as("exact_distinct"))
      graft.ops.Sketches.kmvEstimate(sk, k = 16)
        .select("lang", "sketch_size", "est_distinct")
        .join(exact, "lang")
    }, Some(
      """WITH h AS (SELECT DISTINCT lang, substr(md5(text), 1, 16) AS hv
        |   FROM documents),
        | r AS (SELECT lang, hv, row_number() OVER
        |   (PARTITION BY lang ORDER BY hv) AS rn FROM h),
        | kth AS (SELECT lang,
        |   max(CASE WHEN rn = 16 THEN hv END) AS u16,
        |   CAST(count(*) AS INT) AS sketch_size
        |   FROM r WHERE rn <= 16 GROUP BY lang),
        | ex AS (SELECT lang, count(DISTINCT text) AS exact_distinct
        |   FROM documents GROUP BY 1)
        |SELECT k.lang, k.sketch_size,
        | CASE WHEN k.sketch_size < 16 THEN CAST(k.sketch_size AS DOUBLE)
        |      ELSE round(15.0 / (('0x' || k.u16)::UBIGINT::DOUBLE
        |                         / 18446744073709551616.0), 4) END
        |   AS est_distinct,
        | ex.exact_distinct
        |FROM kth k JOIN ex USING (lang)""".stripMargin)),

    ("q_gopher_filter", (s: SparkSession, dir: String) => {
      graft.ops.Curation.gopherFilter(docs(s, dir), "doc_id", "text",
        graft.ops.Curation.GopherRules(minWords = 30))
    }, Some(gopherFilterSql(minWords = 30))),

    ("q_pii_redact", (s: SparkSession, dir: String) => {
      // corpus text carries no PII — append a deterministic synthetic
      // tail (email/ip/ssn/phone) built identically in the oracle SQL
      val aug = docs(s, dir).withColumn("text",
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 10.20."),
          pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".7 ssn 123-45-6789 call 555-867-5309")))
      graft.ops.Curation.piiRedact(aug, "doc_id", "text")
    }, Some(piiRedactSql())),

    ("q_bulk_merge", (s: SparkSession, dir: String) => {
      // opensearch-sink bulk actions replayed against a table snapshot:
      // a deterministic batch (built identically in the oracle) mixes all
      // five actions over existing and new keys, incl. null-field merges
      val ex = docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
      val act = when(pmod(col("doc_id"), lit(5)) === 0, "delete")
        .when(pmod(col("doc_id"), lit(5)) === 1, "index")
        .when(pmod(col("doc_id"), lit(5)) === 2, "update")
        .when(pmod(col("doc_id"), lit(5)) === 3, "upsert")
        .otherwise("create")
      val batch = ex.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit(null).cast("string"))
            .otherwise(lit("xx")).as("lang"),
          (col("n_chars") + 1).as("n_chars"), act.as("_action"),
          lit(1L).as("_seq"))
        .unionByName(ex.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            lit("new").as("lang"), lit(7L).as("n_chars"),
            when(pmod(col("doc_id"), lit(2)) === 0, "upsert").otherwise("update")
              .as("_action"),
            lit(1L).as("_seq")))
      graft.sinks.Sinks.mergeActions(ex, batch, "doc_id")
    }, Some(bulkMergeSql())),

    ("q_pack_sequences", (s: SparkSession, dir: String) => {
      // chunk = 64 forces the multi-chunk two-phase path at sf0.01; the
      // oracle's single SQL window proves chunking doesn't leak into the
      // layout (the operator is deterministic for ANY chunk size)
      // auto chunk sizing (the 100-TB driver-memory-bounded path)
      graft.ops.Curation.packSequences(docs(s, dir), "doc_id", "text",
        budgetTokens = 2048)
    }, Some(
      s"""WITH t AS (SELECT doc_id, CAST(len($tokSql) AS BIGINT) AS n FROM documents),
         | p AS (SELECT doc_id, n, CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
         |  FROM t)
         |SELECT doc_id, n AS n_tokens, start AS start_offset,
         | start // 2048 AS bin_first,
         | CASE WHEN n > 0 THEN (start + n - 1) // 2048
         |   ELSE start // 2048 END AS bin_last
         |FROM p""".stripMargin)),

    ("q_ml_inference", (s: SparkSession, dir: String) => {
      // logistic head over the embedding column; weights are a
      // deterministic literal so the oracle can restate them exactly
      graft.ops.Inference.linearScore(embeddings(s, dir), "vec_id",
        "embedding", inferWeights(64), bias = 0.1)
        .select(col("vec_id"), round(col("logit"), 6).as("logit"),
          round(col("prob"), 4).as("prob"))
    }, Some(mlInferenceSql(inferWeights(64), 0.1))),

    // ---------- similarity / ANN ----------
    ("q_ann_brute", (s: SparkSession, dir: String) => {
      val q = annQueryVec(64)
      // order by the ROUNDED cosine (same as the oracle) so sub-1e-4
      // engine noise can never flip ranks between engines
      embeddings(s, dir).select(col("vec_id"),
        round(Similarity.cosine(col("embedding"), array(q.map(lit): _*)), 4).as("cosine"))
        .orderBy(desc("cosine"), col("vec_id")).limit(10)
    }, Some(annBruteSql(annQueryVec(64), 10))),

    ("q_ann_lsh", (s: SparkSession, dir: String) => {
      // REAL multi-probe run (22 of 64 buckets probed) — the oracle
      // replays bucketing, probing and ranking exactly: the +-1
      // hyperplanes are deterministic literals, so DuckDB computes the
      // same sign bits from the same double dot products
      val q = annQueryVec(64)
      Similarity.lshTopK(embeddings(s, dir), "vec_id", "embedding", q, 10,
        bits = 6, probeHamming = 2, roundCosineTo = Some(4))
    }, Some(annLshSql(annQueryVec(64), 10, bits = 6, probeHamming = 2))),

    ("q_ann_ivf", (s: SparkSession, dir: String) => {
      val q = annQueryVec(64)
      val (assigned, centroids) = Similarity.ivfAssign(embeddings(s, dir), "embedding", 8)
      Similarity.ivfTopK(assigned, centroids, "vec_id", "embedding", q, 10, nprobe = 3)
        .withColumn("cosine", round(col("cosine"), 4))
    }, None),

    ("q_ann_ivf_fixed", (s: SparkSession, dir: String) => {
      // IVF with a FIXED literal codebook: assignment is the pure
      // projection ivfAssignTo (the at-scale path — the quantizer comes
      // from a sampled fit), so the WHOLE query path (assign → probe →
      // rank) is DuckDB-replayable; q_ann_ivf keeps the k-means-fit
      // variant as the ML-runtime demonstration
      val q = annQueryVec(64)
      val cents = annCentroids(8, 64)
      val assigned = Similarity.ivfAssignTo(embeddings(s, dir), "embedding", cents)
      Similarity.ivfTopK(assigned, cents, "vec_id", "embedding", q, 10,
        nprobe = 3, roundCosineTo = Some(4))
    }, Some(annIvfFixedSql(annQueryVec(64), annCentroids(8, 64), 10, 3))),

    ("q_cosine_neardups", (s: SparkSession, dir: String) => {
      // random 64-d embeddings have cosine ~ N(0, 1/64); 0.3 ≈ +2.4σ picks
      // the near-dup tail without an empty result on synthetic data.
      // APPROXIMATE-RECALL contract (exact precision): no oracle because
      // hyperplane LSH at a weak threshold keeps only ~84% of qualifying
      // pairs (bits 2, probe 1 — formula + measured recall in the
      // cosineNearDups scaladoc); the probe=bits ≡ brute-force
      // differential in OpsSpec is the correctness gate
      Similarity.cosineNearDups(embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.3, bits = 2, probeHamming = 1)
        .withColumn("cosine", round(col("cosine"), 4))
    }, None),

    ("q_cosine_pairs_exact", (s: SparkSession, dir: String) => {
      // probeHamming = bits ⇒ every bucket pair probes ⇒ EXHAUSTIVE pair
      // coverage through the same code path — the DuckDB-oracled anchor
      // for the approximate q_cosine_neardups above
      Similarity.cosineNearDups(embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.3, bits = 2, probeHamming = 2)
        .withColumn("cosine", round(col("cosine"), 4))
    }, Some(
      """SELECT a.vec_id AS idA, b.vec_id AS idB,
        | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])), 4) AS cosine
        | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        | WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])) >= 0.3""".stripMargin)),

    ("q_percolate", (s: SparkSession, dir: String) => {
      // PERCOLATION (reverse search): stored bool term queries matched
      // against every document — corpus tokenizes once and never
      // shuffles, queries broadcast, matching is set algebra in the join
      // condition. Oracle replays every query's gates with DuckDB list
      // functions over the same distinct-token sets.
      graft.query.Percolate.percolate(docs(s, dir), "doc_id", "text",
        percolateQueries)
    }, Some(percolateSql(percolateQueries))),

    ("q_analyzer_stop", (s: SparkSession, dir: String) => {
      // `stop` analysis chain as a corpus transform (analyze/Analysis):
      // BM25 over the stop-filtered corpus — field stats (dl, avgdl, df)
      // shift with the filter, which is exactly what an OpenSearch stop
      // analyzer does to scoring. Oracle re-runs the whole BM25 chain on
      // the DuckDB-filtered token stream. (porter_stem is spec-gated —
      // PorterSpec pins the 1980 paper's own per-step examples — since
      // DuckDB's stemmer lives in an extension unavailable offline.)
      val filtered = graft.analyze.Analysis.stopFilter(
        docs(s, dir).select(col("doc_id"), col("text")), "text")
      bm25TopK(filtered,
        graft.analyze.Analysis.analyzeQueryTerms(Seq("the", "data", "query"),
          graft.analyze.Analysis.EnglishStopWords), 20)
    }, Some(bm25StopSql(Seq("data", "query"), 20))),

    ("q_semdedup", (s: SparkSession, dir: String) => {
      // SemDeDup-style semantic dedup: fixed literal codebook (the
      // at-scale quantizer is sample-fit) → one-projection cluster
      // assignment → pairwise cosine ONLY within clusters → keep-lowest-id.
      // The oracle replays assignment, the bounded pair space, and the
      // survivor rule closed-form.
      graft.ops.Dedup.semDedup(embeddings(s, dir), "vec_id", "embedding",
        annCentroids(8, 64), threshold = 0.25)
    }, Some(semDedupSql(annCentroids(8, 64), 0.25))),

    // ---------- multimodal plumbing ----------
    ("q_multimodal_features", (s: SparkSession, dir: String) => {
      import s.implicits._
      val media = Multimodal.synthesize(s, 200)
      Multimodal.extractFeatures(media, featDim = 8).toDF()
        .select(col("media_id"), col("modality"), col("feat_dim"), col("ok"),
          // double-cast before rounding: the oracle replays the float
          // pipeline then widens identically
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
    }, Some(multimodalFeaturesSql(200))),

    ("q_multimodal_decode", (s: SparkSession, dir: String) => {
      // REAL decoders, oracle-checked: payloads are analytically
      // constructed (gradient BMPs: lum(x,y)=x; constant-amplitude WAVs:
      // RMS frame = |amp|/32768) so DuckDB recomputes the grid-pool /
      // RMS features in closed form from the fixture metadata alone
      import s.implicits._
      val fix = Multimodal.decodeFixture(s, 100)
      val mk = udf { (modality: String, w: Int, h: Int, amp: Int) =>
        if (modality == "image")
          graft.ops.MediaCodecs.encodeBmp24(w, h, (x, _) => (x, x, x))
        else
          graft.ops.MediaCodecs.encodeWavPcm16(8000, Array.fill(64)(amp.toShort))
      }
      val rows = fix.select(col("media_id"), col("modality"),
          mk(col("modality"), col("w"), col("h"), col("amp")).as("bytes"),
          col("w").as("width"), col("h").as("height"),
          lit(8000).as("sample_rate"), lit(0).as("n_frames"))
        .as[Multimodal.MediaRow]
      Multimodal.extractFeatures(rows, featDim = 4,
          decoder = Multimodal.RealDecoder).toDF()
        .select(col("media_id"), col("modality"), col("ok"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
          round(element_at(col("features"), 2).cast("double"), 4).as("f1"),
          round(element_at(col("features"), 3).cast("double"), 4).as("f2"),
          round(element_at(col("features"), 4).cast("double"), 4).as("f3"))
    }, Some {
      // featDim=4 grid: 2×2 cells; y never matters (lum depends on x
      // only), so f0=f2 (cx=0: x∈[0, max(1, w//2))) and f1=f3 (cx=1:
      // x∈[w//2, w)); mean of consecutive ints = (first+last)/2
      val img0 = "round(((greatest(1, w//2) - 1) / 2.0) / 255, 4)"
      val img1 = "round(((w//2 + w - 1) / 2.0) / 255, 4)"
      val aud = "round(abs(amp) / 32768.0, 4)"
      s"""SELECT media_id, modality, true AS ok,
         | CASE WHEN modality = 'image' THEN $img0 ELSE $aud END AS f0,
         | CASE WHEN modality = 'image' THEN $img1 ELSE $aud END AS f1,
         | CASE WHEN modality = 'image' THEN $img0 ELSE $aud END AS f2,
         | CASE WHEN modality = 'image' THEN $img1 ELSE $aud END AS f3
         | FROM read_parquet('$${GRAFT_OUT}/fixture_decode/*.parquet')""".stripMargin
    }),

    ("q_multimodal_frames", (s: SparkSession, dir: String) => {
      import s.implicits._
      val media = Multimodal.synthesize(s, 200).toDF()
      Multimodal.sampleFrames(media, everyN = 30)
        .select("media_id", "n_frames", "frame_idx")
    }, Some("""SELECT media_id, n_frames,
              | unnest(range(0, n_frames, 30))::INT AS frame_idx
              | FROM read_parquet('${GRAFT_OUT}/fixture_media/*.parquet')
              | WHERE modality = 'video' AND n_frames > 0""".stripMargin)),

    // ---------- corpus / north-rule pipeline ----------
    // Oracles read the fixture corpus that Verify writes to outDir (the
    // ${GRAFT_OUT} placeholder is substituted with the absolute outDir at
    // oracle_sql.json dump time). The fixture's `text` is ground truth BY
    // CONSTRUCTION (the generator builds text first, then wraps it in
    // html), so DuckDB recomputing len(text) and expecting byte_identical=1
    // independently verifies that extraction reproduced it from the html.
    ("q_corpus_extract", (s: SparkSession, dir: String) => {
      import s.implicits._
      val pages = graft.corpus.SyntheticCorpus.generate(s, 500, seed = 42L)
      val ex = udf((h: Array[Byte]) => graft.extract.HtmlText.extract(h))
      pages.withColumn("etext", ex(col("html")))
        .select(col("url"),
          (col("etext") === col("text")).cast("int").as("byte_identical"),
          length(col("etext")).as("text_len"), col("lang"))
    }, Some("""SELECT url, CAST(1 AS INTEGER) AS byte_identical,
              | len(text)::INT AS text_len, lang
              | FROM read_parquet('${GRAFT_OUT}/fixture_corpus/*.parquet')""".stripMargin)),

    ("q_corpus_bm25", (s: SparkSession, dir: String) => {
      import s.implicits._
      val pages = graft.corpus.SyntheticCorpus.generate(s, 500, seed = 42L)
      // round-then-order (as bm25TopK) so rank ties break identically to
      // the SQL under last-ulp double noise
      BruteForce.scoreAll(pages.toDF(), "url", "text",
        Seq("the", "w00002").distinct.sorted)
        .withColumn("score", round(col("score"), 4))
        .orderBy(desc("score"), col("docId"))
        .limit(10)
        .withColumnRenamed("docId", "url")
    }, Some(bm25Sql(Seq("the", "w00002"), 10,
      table = "read_parquet('${GRAFT_OUT}/fixture_corpus/*.parquet')",
      idCol = "url"))),

    ("q_warc_decode", (s: SparkSession, dir: String) => {
      // analytic fixture: documents become per-bucket WARC files — one
      // response record per doc (every 13th doc preceded by its request
      // record), odd buckets in the Common-Crawl gzip-member layout —
      // then decoded back by the own-kernel reader. The oracle re-derives
      // every decoded column INCLUDING the HTTP framing's Content-Length
      // closed-form from the documents table.
      val iso = udf { (id: Long) =>
        java.time.Instant.ofEpochSecond(1767225600L + id % 2592000L).toString
      }
      val encFile = udf {
        (ds: Seq[org.apache.spark.sql.Row], gz: Boolean) =>
          val recs = ds.sortBy(_.getLong(0)).flatMap { r =>
            val id = r.getLong(0)
            val url = s"https://docs.example.org/d/$id"
            val resp = graft.sources.Warc.responseRecord(
              url, r.getString(2), r.getString(1).getBytes("UTF-8"))
            if (id % 13 == 0)
              Seq(graft.sources.Warc.requestRecord(url, r.getString(2)), resp)
            else Seq(resp)
          }
          graft.sources.Warc.encodeFile(recs, gzipMembers = gz)
      }
      val files = docs(s, dir)
        .select((col("doc_id") % 37).as("bucket"),
          struct(col("doc_id"), col("text"),
            iso(col("doc_id")).as("date")).as("d"))
        .groupBy("bucket").agg(collect_list("d").as("ds"))
        .select(col("bucket"),
          encFile(col("ds"), col("bucket") % 2 === 1).as("content"))
      graft.sources.Warc.records(files, "content")
        .select(col("bucket"), col("record_pos"), col("warc_type"),
          col("target_uri"), col("http_status"), col("warc_date"),
          when(col("warc_type") === "response", col("content_length"))
            .as("content_length"),
          col("payload").cast("string").as("payload_str"))
    }, Some(
      """WITH base AS (
        | SELECT doc_id, doc_id % 37 AS bucket, text,
        |  strftime(TIMESTAMP '2026-01-01 00:00:00'
        |           + (doc_id % 2592000) * INTERVAL 1 SECOND,
        |           '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
        |  'https://docs.example.org/d/' || doc_id AS target_uri,
        |  CASE WHEN doc_id % 13 = 0 THEN 2 ELSE 1 END AS nrec
        | FROM documents),
        |pos AS (
        | SELECT *, CAST(COALESCE(SUM(nrec) OVER (PARTITION BY bucket
        |   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |   AND 1 PRECEDING), 0) AS INT) AS base_pos
        | FROM base)
        |SELECT bucket, record_pos, warc_type, target_uri, http_status,
        |       warc_date, content_length, payload_str
        |FROM (
        | SELECT bucket, base_pos AS record_pos, 'request' AS warc_type,
        |   target_uri, CAST(NULL AS INT) AS http_status, warc_date,
        |   CAST(NULL AS BIGINT) AS content_length, '' AS payload_str
        | FROM pos WHERE nrec = 2
        | UNION ALL
        | SELECT bucket, base_pos + nrec - 1, 'response', target_uri,
        |   200, warc_date,
        |   62 + strlen(CAST(strlen(text) AS VARCHAR)) + strlen(text),
        |   text
        | FROM pos)""".stripMargin)),

    ("q_robots_filter", (s: SparkSession, dir: String) => {
      // analytic fixture: 23 hosts each publish a deterministic
      // robots.txt (specific group for graftbot/friendbot, an otherbot
      // group, a * group, per-host extra rules); each doc becomes one URL
      // in one of 7 path shapes. The ENGINE parses the text and applies
      // RFC 9309 group selection + longest-match precedence; the oracle
      // re-derives every admission decision closed-form.
      val robotsBody = udf { (k: Long) =>
        val sb = new StringBuilder
        sb ++= s"# synthetic robots for host h$k\n"
        sb ++= "User-agent: otherbot\nDisallow: /\n\n"
        sb ++= "User-agent: graftbot\nUser-agent: friendbot\n"
        sb ++= "Disallow: /private\nAllow: /private/ok$\n"
        sb ++= "Disallow: /pub/*.tmp\n"
        if (k % 3 == 0) sb ++= "Disallow: /search\n"
        if (k % 4 == 0) sb ++= "Allow: /\nDisallow: /media\n"
        sb ++= "\nUser-agent: *\nDisallow: /media\n"
        sb.toString
      }
      val hosts = docs(s, dir).select((col("doc_id") % 23).as("k")).distinct()
        .select(concat(lit("h"), col("k"), lit(".example.com")).as("host"),
          robotsBody(col("k")).as("content"))
      val rules = graft.ops.Robots.rulesFor(hosts, "host", "content",
        agent = "graftbot")
      val urls = docs(s, dir).select(col("doc_id"),
        concat(lit("https://h"), col("doc_id") % 23, lit(".example.com"),
          when(col("doc_id") % 7 === 0,
            concat(lit("/private/p"), col("doc_id")))
          .when(col("doc_id") % 7 === 1, lit("/private/ok"))
          .when(col("doc_id") % 7 === 2,
            concat(lit("/pub/a"), col("doc_id"), lit(".tmp")))
          .when(col("doc_id") % 7 === 3,
            concat(lit("/pub/a"), col("doc_id"), lit(".html")))
          .when(col("doc_id") % 7 === 4, lit(""))
          .when(col("doc_id") % 7 === 5,
            concat(lit("/media/img"), col("doc_id")))
          .otherwise(concat(lit("/search?q=w"), col("doc_id")))).as("url"))
      graft.ops.Robots.filter(urls, "url", rules)
        .select("doc_id", "url", "robots_allowed")
    }, Some(
      """SELECT doc_id,
        | 'https://h' || (doc_id % 23) || '.example.com' ||
        | CASE doc_id % 7
        |   WHEN 0 THEN '/private/p' || doc_id
        |   WHEN 1 THEN '/private/ok'
        |   WHEN 2 THEN '/pub/a' || doc_id || '.tmp'
        |   WHEN 3 THEN '/pub/a' || doc_id || '.html'
        |   WHEN 4 THEN ''
        |   WHEN 5 THEN '/media/img' || doc_id
        |   ELSE '/search?q=w' || doc_id
        | END AS url,
        | CASE doc_id % 7
        |   WHEN 0 THEN FALSE
        |   WHEN 1 THEN TRUE
        |   WHEN 2 THEN FALSE
        |   WHEN 3 THEN TRUE
        |   WHEN 4 THEN TRUE
        |   WHEN 5 THEN (doc_id % 23) % 4 <> 0
        |   ELSE (doc_id % 23) % 3 <> 0
        | END AS robots_allowed
        |FROM documents""".stripMargin)),

    ("q_hybrid_rrf", (s: SparkSession, dir: String) => {
      // hybrid lexical+vector retrieval: BM25 top-20 fused with
      // cosine top-20 by reciprocal-rank fusion (k0=60). Both input
      // lists round scores before ranking so ranks are engine-stable;
      // the oracle replays both lists AND the fusion.
      val terms = Seq("the", "w00002").distinct.sorted
      val lex = BruteForce.scoreAll(docs(s, dir), "doc_id", "text", terms)
        .withColumn("score", round(col("score"), 4))
        .orderBy(desc("score"), col("docId")).limit(20)
        .withColumnRenamed("docId", "doc_id")
      val qv = annQueryVec(64)
      val vec = embeddings(s, dir).select(col("vec_id").as("doc_id"),
          round(Similarity.cosine(col("embedding"),
            array(qv.map(lit): _*)), 4).as("score"))
        .orderBy(desc("score"), col("doc_id")).limit(20)
      graft.query.Hybrid.rrf(Seq(lex, vec), "doc_id", "score", k = 10)
    }, Some(
      s"""WITH bm AS (${bm25Sql(Seq("the", "w00002"), 20)}),
         | bmr AS (SELECT doc_id,
         |   row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM bm),
         | cs AS (${annBruteSql(annQueryVec(64), 20)}),
         | csr AS (SELECT vec_id AS doc_id,
         |   row_number() OVER (ORDER BY cosine DESC, vec_id) AS r FROM cs),
         | u AS (SELECT doc_id, r FROM bmr
         |       UNION ALL SELECT doc_id, r FROM csr)
         |SELECT doc_id, round(sum(1.0 / (60 + r)), 6) AS rrf_score,
         | count(*) AS n_lists
         |FROM u GROUP BY 1
         |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin)),

    ("q_prefix_topk_indexed", (s: SparkSession, dir: String) => {
      // index-served prefix query: expansion from termstats/ (sorted,
      // capped), scored as a should-bool over bucket-pruned postings;
      // the oracle re-derives the same expansion with LIKE and replays
      // BM25 — rank identity across engine, index, and DuckDB. "s"
      // matches 6 corpus terms and the cap keeps 4 (scan/slow/small/
      // sort) — the ascending-expansion cap is live on both engines
      // (the original "w001" gate matched ZERO real-corpus terms — a
      // 0-row gate proves nothing; r5 repointed it)
      docIndexSearch(s, dir).prefixTopK("s", k = 12, maxExpansions = 4)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(prefixSql("s", maxExpansions = 4, k = 12))),

    ("q_wildcard_topk_indexed", (s: SparkSession, dir: String) => {
      // index-served wildcard query: anchored glob over the termstats
      // dictionary (LIKE with * → %), sorted capped expansion, scored as
      // a should-bool — oracle re-derives the expansion and BM25 chain.
      // "s*a*" hits 4 real corpus terms (scan/small/spark/stream) — the
      // original "w0*1" matched zero (0-row gate, repointed r5)
      docIndexSearch(s, dir).wildcardTopK("s*a*", k = 10, maxExpansions = 25)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(likeTopKSql("s%a%", maxExpansions = 25, k = 10))),

    ("q_bool_msm_indexed", (s: SparkSession, dir: String) => {
      // minimum_should_match: at least 2 of the 3 should clauses present
      // (must clauses don't count toward m) — gated inside the shard
      // kernel next to the must/must_not flags; oracle adds the HAVING
      // count >= m semi-join to the bool chain.
      docIndexSearch(s, dir).boolTopK(
        must = Seq("the"), should = Seq("spark", "hash", "merge"),
        mustNot = Nil, k = 15, minShouldMatch = 2)
        .transform(indexIdsToDocIds(s, dir))
    }, Some(boolSql(must = Seq("the"), should = Seq("spark", "hash", "merge"),
      mustNot = Nil, k = 15, minShouldMatch = 2))),

    ("q_explain_score", (s: SparkSession, dir: String) => {
      // OpenSearch _explain: per-term BM25 breakdown for one (doc, query),
      // summing to the doc's ranking score; oracle re-derives tf/df/dl/
      // idf/contribution from the corpus with the identical association.
      docIndexSearch(s, dir)
        .explainScore(indexIdOf(s, dir, 42L), Seq("the", "spark", "hash"))
    }, Some(
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         | dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         | g AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
         | tf AS (SELECT term, count(*) AS tf FROM toks
         |        WHERE doc_id = 42 AND term IN ('hash', 'spark', 'the')
         |        GROUP BY 1),
         | df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |        WHERE term IN ('hash', 'spark', 'the') GROUP BY 1),
         | d AS (SELECT dl FROM dl WHERE doc_id = 42)
         |SELECT tf.term, tf.tf, df.df,
         | round(ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(df.df AS DOUBLE))
         |   + 0.5) / (CAST(df.df AS DOUBLE) + 0.5)), 6) AS idf,
         | round(ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(df.df AS DOUBLE))
         |   + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
         |  * ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
         |   + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)
         |     / (CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE)))))), 6)
         |   AS contribution
         |FROM tf JOIN df USING (term) CROSS JOIN g CROSS JOIN d""".stripMargin)),

    ("q_index_stats", (s: SparkSession, dir: String) => {
      // OpenSearch _stats: per-generation docs / distinct terms / total
      // tokens, from globals.json + the termstats artifact; the gate
      // index has one generation, so the oracle is closed-form corpus
      // aggregates.
      docIndexSearch(s, dir).stats
    }, Some(
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents)
         |SELECT 0 AS gen,
         | (SELECT count(*) FROM documents) AS docs,
         | count(DISTINCT term) AS terms,
         | count(*) AS sum_dl
         |FROM toks""".stripMargin)),

    ("q_term_vectors", (s: SparkSession, dir: String) => {
      // OpenSearch _termvectors: one row per term of one doc — (term,
      // tf, df) from the tf artifact (docId pushed) + termstats.
      docIndexSearch(s, dir).termVectors(indexIdOf(s, dir, 42L))
    }, Some(
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         | tf AS (SELECT term, count(*) AS tf FROM toks WHERE doc_id = 42
         |        GROUP BY 1),
         | df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |        GROUP BY 1)
         |SELECT term, tf, df FROM tf JOIN df USING (term)""".stripMargin)),

    ("q_date_histogram_indexed", (s: SparkSession, dir: String) => {
      // OpenSearch date_histogram beside a query, served from the index:
      // match set = decoded postings, buckets = ISO week truncation of a
      // docId-keyed timestamp dimension (closed-form from doc_id so the
      // oracle replays it).
      val meta = s.read.parquet(s"${docIndexDir(s, dir)}/docs")
        .select(col("docId"), expr(
          "timestampadd(DAY, CAST(CAST(substring(url, 2) AS BIGINT) % 90" +
            " AS INT), TIMESTAMP '2026-01-01 00:00:00')").as("ts"))
      docIndexSearch(s, dir)
        .dateHistogram(Seq("spark", "merge"), meta, "ts", "week")
    }, Some(
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         | m AS (SELECT DISTINCT doc_id FROM toks
         |       WHERE term IN ('merge', 'spark'))
         |SELECT date_trunc('week', TIMESTAMP '2026-01-01 00:00:00'
         |         + (doc_id % 90) * INTERVAL 1 DAY) AS bucket,
         |       count(*) AS doc_count
         |FROM m GROUP BY 1""".stripMargin)),

    ("q_range_agg_indexed", (s: SparkSession, dir: String) => {
      // OpenSearch range agg beside a query: half-open [lo,hi) buckets
      // plus unbounded tails over a docId-keyed numeric dimension.
      val meta = s.read.parquet(s"${docIndexDir(s, dir)}/docs")
        .select(col("docId"),
          (expr("CAST(substring(url, 2) AS BIGINT)") % 100)
            .cast("double").as("v"))
      docIndexSearch(s, dir)
        .rangeAgg(Seq("the"), meta, "v", bounds = Seq(10.0, 50.0, 90.0))
    }, Some(
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         | m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'the'),
         | v AS (SELECT doc_id, CAST(doc_id % 100 AS DOUBLE) AS v FROM m)
         |SELECT CASE WHEN v >= 90.0 THEN '[90.0,inf)'
         |            WHEN v >= 50.0 THEN '[50.0,90.0)'
         |            WHEN v >= 10.0 THEN '[10.0,50.0)'
         |            ELSE '(-inf,10.0)' END AS bucket,
         |       count(*) AS doc_count
         |FROM v GROUP BY 1""".stripMargin)),

    ("q_delete_topk", (s: SparkSession, dir: String) => {
      // delete-by-query (OpenSearch _delete_by_query): tombstone every
      // doc matching 'slow', reopen, query. Lucene visibility semantics
      // make the oracle exact: deleted docs leave RESULTS immediately but
      // still count in N/avgdl/df until compaction — i.e. the post-delete
      // ranking is bit-identical to a bool query with mustNot='slow',
      // which is what the oracle replays. A fresh index is built per run
      // (deletion mutates it; the shared gate index must stay pristine).
      import s.implicits._
      val d = java.nio.file.Files.createTempDirectory("graft-delidx").toString
      val pages = docs(s, dir).select(
          format_string("d%09d", col("doc_id")).as("url"),
          lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("warc_ts"),
          encode(concat(lit("<html><body><p>"), col("text"),
            lit("</p></body></html>")), "UTF-8").as("html"),
          col("text"), col("lang"))
        .as[graft.corpus.Page]
      graft.index.IncrementalIndex.append(s, d, pages,
        graft.index.IndexParams(buckets = 8, shardSize = 64,
          blockSize = 32, idBuckets = 1), "delete-gate")
      new graft.query.IndexSearch(s, d).deleteByQuery(Seq("slow"))
      val served = new graft.query.IndexSearch(s, d) // fresh tombstone view
        .boolTopK(Nil, Seq("hash", "spark"), Nil, 15)
      val m = graft.index.IncrementalIndex.genDirs(s, d)
        .map { case (_, g) => s.read.parquet(s"$g/docs") }
        .reduce(_.unionByName(_))
        .select(col("docId"),
          expr("CAST(substring(url, 2) AS BIGINT)").as("doc_id"))
      served.join(m, "docId").select(col("doc_id"), col("score"))
        .orderBy(desc("score"), col("doc_id"))
    }, Some(boolSql(must = Nil, should = Seq("hash", "spark"),
      mustNot = Seq("slow"), k = 15)))
  )

  // ---------------------------------------------------------- helpers

  /** Deterministic ANN query vector (dim 8, matches embeddings table). */
  private def annQueryVec(dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      val r = graft.util.SplitMix64.stream(7L, i.toLong)
      math.rint((r.nextDouble() * 2.0 - 1.0) * 1000.0) / 1000.0
    }

  // ---------- index-served search gate plumbing (round 5) ----------

  /** One index build over the documents table per sfDir, memoized for the
    * Verify run (all *_indexed gates share it). urls are zero-padded
    * doc_ids and idBuckets = 1, so index docIds are assigned in doc_id
    * order — a MONOTONE id mapping, which makes every (rounded score,
    * docId) tie-break identical between the index ranking and the
    * doc_id-keyed oracle. text → html wrapping is exact under the
    * extractor (clean single-spaced text), and the build's byte-identity
    * gate fails loudly if that ever stops holding. */
  private val docIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def docIndexDir(s: SparkSession, dir: String): String =
    docIndexDirs.computeIfAbsent(dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft-docindex").toString
      import s.implicits._
      val pages = docs(s, dir).select(
          format_string("d%09d", col("doc_id")).as("url"),
          lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("warc_ts"),
          encode(concat(lit("<html><body><p>"), col("text"),
            lit("</p></body></html>")), "UTF-8").as("html"),
          col("text"), col("lang"))
        .as[graft.corpus.Page]
      new graft.index.IndexBuilder(s, d, graft.index.IndexParams(
        buckets = 8, shardSize = 64, blockSize = 32, idBuckets = 1,
        positions = true))
        .build(pages, s"documents@$dir")
      d
    })
  private def docIndexSearch(s: SparkSession, dir: String): graft.query.IndexSearch =
    new graft.query.IndexSearch(s, docIndexDir(s, dir))

  /** Second FIELD index over the same url set (multi_match gates): the
    * "title" field = first 8 analyzer tokens of text. Field-local BM25
    * stats, docIds aligned with [[docIndexDir]] by url construction. */
  private val titleIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def titleIndexDir(s: SparkSession, dir: String): String =
    titleIndexDirs.computeIfAbsent(dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft-titleindex").toString
      val pages = graft.corpus.SyntheticCorpus.titleField(
        docs(s, dir).select(
          format_string("d%09d", col("doc_id")).as("url"),
          col("text"), col("lang")))
      new graft.index.IndexBuilder(s, d, graft.index.IndexParams(
        buckets = 8, shardSize = 64, blockSize = 32, idBuckets = 1))
        .build(pages, s"titles@$dir")
      d
    })

  /** The percolation gate's stored-query set: every bool shape — must
    * only, must+mustNot, should-with-msm, mixed, and an alert-ish
    * narrow one. Terms are known corpus vocabulary. */
  private lazy val percolateQueries: Seq[graft.query.Percolate.StoredQuery] = {
    import graft.query.Percolate.StoredQuery
    Seq(
      StoredQuery("q-spark", must = Seq("spark")),
      StoredQuery("q-spark-no-hash", must = Seq("spark"), mustNot = Seq("hash")),
      StoredQuery("q-any-join2", should = Seq("join", "window", "shuffle"),
        minShould = 2),
      StoredQuery("q-data-query", must = Seq("data", "query")),
      StoredQuery("q-mixed", must = Seq("the"),
        should = Seq("spark", "hash"), mustNot = Seq("window"), minShould = 1))
  }

  /** DuckDB replay of percolation: per-doc distinct token sets × the
    * stored-query VALUES table, every gate as list algebra. The VALUES
    * rows come from the ENGINE's own [[graft.query.Percolate.normalize]]
    * (analyzer tokenization, dedup, effective min-should), so the oracle
    * replays matching over identical normalized queries and the two
    * normalizations cannot drift. */
  private def percolateSql(qs: Seq[graft.query.Percolate.StoredQuery]): String = {
    def arr(ts: Seq[String]) =
      if (ts.isEmpty) "[]::VARCHAR[]"
      else ts.map(t => s"'$t'").mkString("[", ", ", "]")
    val rows = qs.map(graft.query.Percolate.normalize).map {
      case (qid, m, s, n, eff) =>
        s"('$qid', ${arr(m)}, ${arr(s)}, ${arr(n)}, $eff)"
    }.mkString(", ")
    s"""WITH toks AS (SELECT doc_id, list_distinct($tokSql) AS ts FROM documents),
       | q(query_id, q_must, q_should, q_not, q_min) AS (VALUES $rows)
       | SELECT doc_id, query_id FROM toks, q
       | WHERE list_has_all(ts, q_must)
       |   AND NOT list_has_any(ts, q_not)
       |   AND len(list_intersect(ts, q_should)) >= q_min""".stripMargin
  }

  /** bm25Sql over the stop-filtered token stream — the `stop` analyzer's
    * oracle (same English stop set as Analysis.EnglishStopWords). */
  private def bm25StopSql(terms: Seq[String], k: Int): String = {
    val stops = graft.analyze.Analysis.EnglishStopWords
      .map(w => s"'$w'").mkString(", ")
    bm25Sql(terms, k,
      tokExpr = s"list_filter($tokSql, t -> t NOT IN ($stops))")
  }

  /** DuckDB replay of the composite aggregation: match set → two-source
    * bucket counts → row-value after cursor → key-ordered page. */
  private def compositeSql(terms0: Seq[String], size: Int,
      afterTuple: String): String = {
    val termList = terms0.distinct.sorted.map(t => s"'$t'").mkString(", ")
    s"""WITH m AS (SELECT DISTINCT doc_id FROM
       |   (SELECT doc_id, unnest($tokSql) AS term FROM documents)
       |   WHERE term IN ($termList)),
       | b AS (SELECT lang, floor(n_chars / 100.0) * 100.0 AS bucket,
       |   count(*) AS doc_count
       |   FROM documents JOIN m USING (doc_id)
       |   WHERE lang IS NOT NULL AND n_chars IS NOT NULL GROUP BY 1, 2)
       | SELECT lang, bucket, doc_count FROM b
       | WHERE (lang, bucket) > $afterTuple
       | ORDER BY lang, bucket LIMIT $size""".stripMargin
  }

  /** DuckDB replay of multi_match over the (title^titleBoost,
    * text^textBoost) fields: one field-local BM25 CTE chain per field
    * (each field is its own index — own n/avgdl/df), boosted per-doc
    * field scores combined by best_fields (best + tie × rest) or
    * most_fields (sum), rounded after combination. */
  private def multiMatchSql(terms0: Seq[String], k: Int, matchType: String,
      tie: Double, titleBoost: Double, textBoost: Double): String = {
    val terms = terms0.distinct.sorted
    val termList = terms.map(t => s"'$t'").mkString(", ")
    def chain(sfx: String, tokList: String) =
      s"""toks$sfx AS (SELECT doc_id, unnest($tokList) AS term FROM documents),
         | dl$sfx AS (SELECT doc_id, len($tokList) AS dl FROM documents),
         | g$sfx AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl$sfx),
         | tf$sfx AS (SELECT doc_id, term, count(*) AS tf FROM toks$sfx
         |   WHERE term IN ($termList) GROUP BY 1, 2),
         | df$sfx AS (SELECT term, count(*) AS df FROM tf$sfx GROUP BY 1),
         | sc$sfx AS (
         |  SELECT tf$sfx.doc_id,
         |   ln(1.0 + ((CAST(g$sfx.n AS DOUBLE) - CAST(df$sfx.df AS DOUBLE)) + 0.5)
         |        / (CAST(df$sfx.df AS DOUBLE) + 0.5))
         |   * ((CAST(tf$sfx.tf AS DOUBLE) * 2.2) / (CAST(tf$sfx.tf AS DOUBLE)
         |      + 1.2 * (0.25 + 0.75 * (CAST(dl$sfx.dl AS DOUBLE)
         |        / (CAST(g$sfx.sumdl AS DOUBLE) / CAST(g$sfx.n AS DOUBLE)))))) AS s
         |  FROM tf$sfx JOIN dl$sfx USING (doc_id) JOIN df$sfx USING (term)
         |  CROSS JOIN g$sfx),
         | fs$sfx AS (SELECT doc_id, sum(s) AS s FROM sc$sfx GROUP BY 1)"""
    val titleToks = s"list_slice($tokSql, 1, 8)"
    val combine = matchType match {
      case "most_fields" => "sm"
      case "best_fields" => s"mx + $tie * (sm - mx)"
    }
    s"""WITH ${chain("t", titleToks)},
       | ${chain("x", tokSql)},
       | u AS (SELECT doc_id, s * $titleBoost AS s FROM fst
       |       UNION ALL SELECT doc_id, s * $textBoost AS s FROM fsx),
       | c AS (SELECT doc_id, max(s) AS mx, sum(s) AS sm FROM u GROUP BY 1)
       | SELECT doc_id, round($combine, 4) AS score FROM c
       | ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Map an index result's docId column back to the documents table's
    * doc_id via the docs/ artifact's url (zero-padded doc_id) — exact
    * under any id distribution, monotone by construction. */
  private def indexIdsToDocIds(s: SparkSession, dir: String)(
      res: DataFrame): DataFrame = {
    val m = s.read.parquet(s"${docIndexDir(s, dir)}/docs")
      .select(col("docId"),
        expr("CAST(substring(url, 2) AS BIGINT)").as("doc_id"))
    res.join(m, "docId")
      .select(col("doc_id"), col("score"))
      .orderBy(desc("score"), col("doc_id"))
  }

  /** docId-keyed dimension for the indexed agg gates: the docs/ artifact's
    * (docId, doc_id via zero-padded url) joined to one documents-table
    * value column — the corpus text is never re-read. */
  private def indexMeta(s: SparkSession, dir: String,
      valueCol: String): DataFrame =
    s.read.parquet(s"${docIndexDir(s, dir)}/docs")
      .select(col("docId"),
        expr("CAST(substring(url, 2) AS BIGINT)").as("doc_id"))
      .join(docs(s, dir).select("doc_id", valueCol), "doc_id")
      .select("docId", valueCol)

  /** Index docId of a documents-table doc_id (query construction: one
    * pushed-predicate lookup on the docs/ artifact). */
  private def indexIdOf(s: SparkSession, dir: String, docId: Long): Long =
    s.read.parquet(s"${docIndexDir(s, dir)}/docs")
      .filter(col("url") === f"d$docId%09d")
      .select("docId").head().getLong(0)

  /** DuckDB replay of the fuzzy-expanded BM25 top-k: dynamic expansion CTE
    * (distance ≤ maxDist slice of the corpus dictionary with the exact-
    * preserving length pre-filter) feeding the standard BM25 CTE chain. */
  private def fuzzyTopKSql(q: String, maxDist: Int, k: Int): String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       | exp AS (SELECT DISTINCT term FROM toks
       |   WHERE abs(length(term) - ${q.length}) <= $maxDist
       |     AND levenshtein(term, '$q') <= $maxDist),
       | dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       | g AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
       | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       |        WHERE term IN (SELECT term FROM exp) GROUP BY 1, 2),
       | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       | scored AS (
       |  SELECT tf.doc_id,
       |   ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5)
       |        / (CAST(df.df AS DOUBLE) + 0.5))
       |   * ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
       |      + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
       |        / (CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE)))))) AS s
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN g)
       |SELECT doc_id, round(sum(s), 4) AS score FROM scored GROUP BY 1
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin

  /** DuckDB replay of a dictionary-expanded BM25 top-k (prefix and
    * wildcard queries): the expansion CTE is the sorted, capped LIKE
    * slice of the corpus dictionary (the engine takes the same slice
    * from the index's termstats/), feeding the standard BM25 CTE chain. */
  private def prefixSql(prefix: String, maxExpansions: Int, k: Int): String =
    likeTopKSql(s"$prefix%", maxExpansions, k)

  private def likeTopKSql(like: String, maxExpansions: Int, k: Int): String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       | exp AS (SELECT term FROM (SELECT DISTINCT term FROM toks
       |   WHERE term LIKE '$like') ORDER BY term LIMIT $maxExpansions),
       | dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       | g AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
       | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       |        WHERE term IN (SELECT term FROM exp) GROUP BY 1, 2),
       | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       | scored AS (
       |  SELECT tf.doc_id,
       |   ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5)
       |        / (CAST(df.df AS DOUBLE) + 0.5))
       |   * ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
       |      + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
       |        / (CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE)))))) AS s
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN g)
       |SELECT doc_id, round(sum(s), 4) AS score FROM scored GROUP BY 1
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin

  /** BM25 top-k over the documents table with rounded scores and rounded-
    * score ordering (rank stability across engines' last-ulp noise).
    * One job: scoreAll + TakeOrdered(k) on the rounded score — no count()
    * pre-pass, no whole-corpus sort. */
  private def bm25TopK(d: DataFrame, terms0: Seq[String], k: Int): DataFrame = {
    val terms = terms0.distinct.sorted
    BruteForce.scoreAll(d, "doc_id", "text", terms)
      .withColumn("score", round(col("score"), 4))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
      .withColumnRenamed("docId", "doc_id")
  }

  /** Phrase top-k with rounded scores and rounded-score ordering (rank
    * stability across engines' last-ulp noise), bm25TopK's convention. */
  private def phraseTopKRounded(d: DataFrame, phrase: Seq[String], k: Int): DataFrame =
    BruteForce.phraseScoreAll(d, "doc_id", "text", phrase)
      .withColumn("score", round(col("score"), 4))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
      .withColumnRenamed("docId", "doc_id")

  /** Slop-phrase top-k with rounded scores, bm25TopK's convention. */
  private def phraseSlopTopKRounded(d: DataFrame, phrase: Seq[String],
      slop: Int, k: Int): DataFrame =
    BruteForce.phraseSlopScoreAll(d, "doc_id", "text", phrase, slop)
      .withColumn("score", round(col("score"), 4))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
      .withColumnRenamed("docId", "doc_id")

  /** DuckDB replay of [[BruteForce.phraseSlopScoreAll]]: per-slot position
    * arrays from `generate_series` + `list_filter`, the greedy ordered
    * chain as nested lambdas (`[1]` on an empty filter → NULL → the start
    * drops out of the match filter, exactly the Spark side's
    * try_element_at null propagation), same slot-summed idf and BM25
    * operand order. */
  private def phraseSlopSql(phrase: Seq[String], slop: Int, k: Int): String = {
    val m = phrase.length
    val dfSelects = phrase.distinct.zipWithIndex.map { case (t, i) =>
      s"(SELECT count(*) FROM dl WHERE list_contains(l, '$t')) AS df$i"
    }.mkString(",\n |   ")
    val dfIdx = phrase.distinct.zipWithIndex.toMap
    val idfTerms = phrase.map { t =>
      val i = dfIdx(t)
      s"ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(dfs.df$i AS DOUBLE)) + 0.5) / (CAST(dfs.df$i AS DOUBLE) + 0.5))"
    }.mkString(" + ")
    // slot position arrays materialized once per row in `pos`, so the
    // chain lambdas scan small arrays — same shape as the Spark side
    val slotArrs = phrase.zipWithIndex.map { case (t, j) =>
      s"list_filter(generate_series(1, len(l)), x -> l[x] = '$t') AS parr$j"
    }.mkString(",\n |   ")
    def chainLast(prev: String, j: Int): String =
      if (j == m) prev
      else chainLast(s"list_filter(parr$j, y -> y > ($prev))[1]", j + 1)
    val matchPred = s"(${chainLast("p0", 1)}) - p0 - ${m - 1} <= $slop"
    s"""WITH toks AS (SELECT doc_id, $tokSql AS l FROM documents),
       | dl AS (SELECT doc_id, len(l) AS dl, l FROM toks),
       | g AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
       | dfs AS (SELECT
       |   $dfSelects),
       | stats AS (SELECT $idfTerms AS idfsum,
       |   CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE) AS avgdl
       |   FROM g, dfs),
       | pos AS (SELECT doc_id, dl,
       |   $slotArrs
       |  FROM dl),
       | ptfs AS (SELECT doc_id, dl,
       |   len(list_filter(parr0, p0 -> $matchPred)) AS ptf FROM pos)
       |SELECT doc_id, ptf AS phrase_tf,
       | round(stats.idfsum * ((CAST(ptf AS DOUBLE) * 2.2) /
       |   (CAST(ptf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / stats.avgdl)))), 4) AS score
       |FROM ptfs, stats WHERE ptf > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** DuckDB replay of [[BruteForce.phraseScoreAll]]: same tokenizer, same
    * consecutive-position match (list_filter over candidate starts), same
    * slot-summed idf and BM25 operand order. */
  private def phraseSql(phrase: Seq[String], k: Int): String = {
    val m = phrase.length
    val dfSelects = phrase.distinct.zipWithIndex.map { case (t, i) =>
      s"(SELECT count(*) FROM dl WHERE list_contains(l, '$t')) AS df$i"
    }.mkString(",\n |   ")
    val dfIdx = phrase.distinct.zipWithIndex.toMap
    val idfTerms = phrase.map { t =>
      val i = dfIdx(t)
      s"ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(dfs.df$i AS DOUBLE)) + 0.5) / (CAST(dfs.df$i AS DOUBLE) + 0.5))"
    }.mkString(" + ")
    val slotEq = phrase.zipWithIndex.map { case (t, j) =>
      if (j == 0) s"l[i] = '$t'" else s"l[i+$j] = '$t'"
    }.mkString(" AND ")
    s"""WITH toks AS (SELECT doc_id, $tokSql AS l FROM documents),
       | dl AS (SELECT doc_id, len(l) AS dl, l FROM toks),
       | g AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
       | dfs AS (SELECT
       |   $dfSelects),
       | stats AS (SELECT $idfTerms AS idfsum,
       |   CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE) AS avgdl
       |   FROM g, dfs),
       | ptfs AS (SELECT doc_id, dl,
       |   len(list_filter(generate_series(1, len(l) - ${m - 1}),
       |       i -> $slotEq)) AS ptf FROM dl)
       |SELECT doc_id, ptf AS phrase_tf,
       | round(stats.idfsum * ((CAST(ptf AS DOUBLE) * 2.2) /
       |   (CAST(ptf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / stats.avgdl)))), 4) AS score
       |FROM ptfs, stats WHERE ptf > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Fixture-side gzip (the decode path under test is
    * [[graft.sources.Feeds.cloudwatchSubscription]]'s gunzip). */
  private val gzipUdf = udf { (s: String) =>
    if (s == null) null
    else {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      g.close()
      bo.toByteArray
    }
  }

  /** DuckDB replay of [[graft.ops.Dedup.dedupLines]] over the synthesized
    * header/body/footer pages: same md5-of-trimmed-line keying, same
    * distinct-docs threshold, same order-preserving reassembly. */
  private def dedupLinesSql(maxDocs: Int): String =
    s"""WITH pages AS (
       |  SELECT doc_id, 'header ' || (doc_id % 7) || chr(10) || text ||
       |    chr(10) || 'shared footer line' AS page FROM documents),
       | lines AS (
       |  SELECT doc_id, u.ord - 1 AS line_no,
       |    string_split(page, chr(10))[u.ord] AS line
       |  FROM pages, LATERAL (SELECT unnest(generate_series(1,
       |    len(string_split(page, chr(10))))) AS ord) u),
       | keyed AS (SELECT doc_id, line_no, line,
       |   CASE WHEN trim(line) = '' THEN NULL ELSE md5(trim(line)) END AS lk
       |   FROM lines),
       | banned AS (
       |   SELECT lk FROM (SELECT DISTINCT lk, doc_id FROM keyed
       |     WHERE lk IS NOT NULL)
       |   GROUP BY lk HAVING count(*) > $maxDocs),
       | kept AS (SELECT * FROM keyed
       |   WHERE lk IS NULL OR lk NOT IN (SELECT lk FROM banned)),
       | tot AS (SELECT doc_id, count(*) AS n_total FROM lines GROUP BY 1),
       | re AS (SELECT doc_id,
       |   string_agg(line, chr(10) ORDER BY line_no) AS text_dedup,
       |   count(*) AS n_kept FROM kept GROUP BY 1)
       |SELECT t.doc_id, coalesce(re.text_dedup, '') AS text_dedup,
       | CAST(coalesce(re.n_kept, 0) AS BIGINT) AS n_lines_kept,
       | CAST(t.n_total - coalesce(re.n_kept, 0) AS BIGINT) AS n_lines_removed
       |FROM tot t LEFT JOIN re USING (doc_id)""".stripMargin

  /** DuckDB replay of more-like-this top-k: term selection (tf desc, df
    * asc, term asc — integer-only keys) feeding the standard BM25 replay
    * with the source document excluded from results (but not from corpus
    * statistics, matching BruteForce.scoreAll). */
  private def mltTopKSql(docId: Long, m: Int, k: Int): String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       | mtf AS (SELECT term, count(*) AS tf FROM toks
       |   WHERE doc_id = $docId GROUP BY 1),
       | mdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       | mlt AS (SELECT term FROM mtf JOIN mdf USING (term)
       |   ORDER BY tf DESC, df, term LIMIT $m),
       | dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       | g AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
       | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       |   WHERE term IN (SELECT term FROM mlt) GROUP BY 1, 2),
       | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       | scored AS (
       |  SELECT tf.doc_id,
       |   ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5)
       |        / (CAST(df.df AS DOUBLE) + 0.5))
       |   * ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
       |      + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
       |        / (CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE)))))) AS s
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN g)
       |SELECT doc_id, round(sum(s), 4) AS score FROM scored
       |WHERE doc_id <> $docId GROUP BY 1
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin

  /** DuckDB replay of [[graft.query.Snippets]]: same candidate starts
    * (match positions), same distinct-terms-in-window score, same
    * first-max tie-break, same highlight markup. */
  private def snippetSql(terms0: Seq[String], w: Int): String = {
    val terms = terms0.map(Analyzer.lowerLikeCatalyst).distinct.sorted
    val ts = terms.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, $tokSql AS l FROM documents),
       | c AS (SELECT doc_id, l,
       |   list_filter(generate_series(0, len(l) - 1),
       |     i -> list_contains($ts, l[i + 1])) AS starts FROM t),
       | d AS (SELECT doc_id, l, starts,
       |   list_transform(starts, s -> len(list_distinct(
       |     list_filter(l[s + 1 : s + $w], x -> list_contains($ts, x)))))
       |   AS cnts FROM c),
       | e AS (SELECT doc_id, l,
       |   CASE WHEN len(starts) > 0
       |     THEN starts[list_position(cnts, list_max(cnts))] END AS best,
       |   CAST(coalesce(list_max(cnts), 0) AS INT) AS n_terms FROM d)
       |SELECT doc_id,
       | CASE WHEN best IS NOT NULL THEN array_to_string(
       |   list_transform(l[best + 1 : best + $w],
       |     x -> CASE WHEN list_contains($ts, x)
       |          THEN '<em>' || x || '</em>' ELSE x END), ' ') END AS snippet,
       | n_terms FROM e""".stripMargin
  }

  /** DuckDB replay of [[graft.ops.Dsir.select]] (α = 0.5, seed = 7,
    * target = lang='en'): hashed unigram+bigram buckets via the md5₆₀
    * prefix, add-α smoothing over exactly `buckets` buckets, the per-doc
    * weight as an ORDERED list_reduce fold (Spark's sorted-struct
    * aggregate), and the md5-derived Gumbel key. */
  private def dsirSql(buckets: Int, n: Int): String = {
    val aB = 0.5 * buckets
    s"""WITH tl AS (SELECT doc_id, $tokSql AS l FROM documents),
       | grams AS (
       |   SELECT doc_id, unnest(l) AS g FROM tl
       |   UNION ALL
       |   SELECT doc_id, unnest(list_transform(
       |     generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i + 1]))
       |   FROM tl WHERE len(l) >= 2),
       | bg AS (SELECT doc_id,
       |   CAST(('0x' || substr(md5(g), 1, 15))::UBIGINT % $buckets AS BIGINT)
       |     AS bucket,
       |   count(*) AS c FROM grams GROUP BY 1, 2),
       | tcnt AS (SELECT bucket, sum(c) AS c FROM bg
       |   JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1),
       | rcnt AS (SELECT bucket, sum(c) AS c FROM bg GROUP BY 1),
       | tn AS (SELECT CAST(sum(c) AS DOUBLE) AS nn FROM tcnt),
       | rn AS (SELECT CAST(sum(c) AS DOUBLE) AS nn FROM rcnt),
       | bks AS (SELECT range AS bucket FROM range($buckets)),
       | lp AS (SELECT b.bucket,
       |   ln((CAST(coalesce(t.c, 0) AS DOUBLE) + 0.5) / (tn.nn + $aB))
       |   - ln((CAST(coalesce(r.c, 0) AS DOUBLE) + 0.5) / (rn.nn + $aB)) AS d
       |  FROM bks b LEFT JOIN tcnt t USING (bucket)
       |  LEFT JOIN rcnt r USING (bucket) CROSS JOIN tn CROSS JOIN rn),
       | w AS (SELECT bg.doc_id,
       |   round(list_reduce(
       |     list(CAST(bg.c AS DOUBLE) * lp.d ORDER BY bg.bucket),
       |     (a, b) -> a + b), 6) AS log_weight
       |  FROM bg JOIN lp USING (bucket) GROUP BY 1),
       | g AS (SELECT doc_id, log_weight,
       |   round(log_weight - ln(-ln(
       |     ((('0x' || substr(md5(doc_id::VARCHAR || ':7'), 1, 15))::UBIGINT
       |       ::DOUBLE + 0.5) / 1152921504606846976.0))), 6) AS key
       |  FROM w)
       |SELECT doc_id, log_weight, key FROM g
       |ORDER BY key DESC, doc_id LIMIT $n""".stripMargin
  }

  /** DuckDB replay of [[graft.query.IndexSearch.topKWithSnippets]]: the
    * bm25 rounded top-k joined with the best-window snippet replay. */
  private def snippetsTopKSql(terms0: Seq[String], k: Int, w: Int): String = {
    val terms = terms0.map(Analyzer.lowerLikeCatalyst).distinct.sorted
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val ts = terms.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""${bm25ScoredCtes(termList)},
       | top AS (SELECT doc_id, round(sum(s), 4) AS score FROM scored
       |   GROUP BY 1 ORDER BY score DESC, doc_id LIMIT $k),
       | t AS (SELECT doc_id, $tokSql AS l FROM documents),
       | c AS (SELECT doc_id, l,
       |   list_filter(generate_series(0, len(l) - 1),
       |     i -> list_contains($ts, l[i + 1])) AS starts FROM t),
       | d2 AS (SELECT doc_id, l, starts,
       |   list_transform(starts, st -> len(list_distinct(
       |     list_filter(l[st + 1 : st + $w], x -> list_contains($ts, x)))))
       |   AS cnts FROM c),
       | e AS (SELECT doc_id, l,
       |   CASE WHEN len(starts) > 0
       |     THEN starts[list_position(cnts, list_max(cnts))] END AS best,
       |   CAST(coalesce(list_max(cnts), 0) AS INT) AS n_terms FROM d2)
       |SELECT top.doc_id, top.score,
       | CASE WHEN best IS NOT NULL THEN array_to_string(
       |   list_transform(l[best + 1 : best + $w],
       |     x -> CASE WHEN list_contains($ts, x)
       |          THEN '<em>' || x || '</em>' ELSE x END), ' ') END AS snippet,
       | e.n_terms
       |FROM top JOIN e USING (doc_id)
       |ORDER BY top.score DESC, top.doc_id""".stripMargin
  }

  /** Fixed BPE merge table for the encode oracle — training-consistent
    * (each merge's operands are single chars or outputs of strictly
    * earlier merges; no later output collides with an earlier operand),
    * so the rank-order replace chain IS the classic BPE apply. */
  private lazy val BpeFixedMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("a", "n"), ("s", "c"), ("sc", "an"),
    ("o", "r"), ("e", "r"), ("w", "i"), ("n", "d"), ("wi", "nd"),
    ("s", "p"), ("sp", "a"), ("r", "k"), ("spa", "rk"), ("m", "e"),
    ("r", "g"))

  /** DuckDB replay of [[graft.ops.Bpe.encodeCol]] under a literal merge
    * table: sentinel-char symbolization via the same regexp, one
    * `replace` per merge in rank order, sentinel strip. */
  private def bpeEncodeSql(merges: Seq[(String, String)]): String = {
    val chain = merges.foldLeft(
      "rtrim(regexp_replace(term, '(.)', chr(1) || '\\1' || ' ', 'g'))") {
      case (acc, (l, r)) =>
        s"replace($acc, chr(1) || '$l ' || chr(1) || '$r', chr(1) || '$l$r')"
    }
    s"""WITH toks AS (SELECT DISTINCT unnest($tokSql) AS term FROM documents),
       | sk AS (SELECT term, $chain AS sym FROM toks)
       |SELECT term, replace(sym, chr(1), '') AS bpe,
       | CAST(len(string_split(sym, ' ')) AS INT) AS n_subwords FROM sk""".stripMargin
  }

  /** DuckDB replay of the ENTIRE [[graft.ops.Bpe.train]] loop: the
    * word-frequency table, per-iteration weighted adjacent-pair counts,
    * the (cnt desc, left, right) argmax and the merge rewrite are unrolled
    * as one CTE level per merge — an independent re-derivation of every
    * learned merge, not a fixture replay. */
  private def bpeTrainSql(numMerges: Int): String = {
    val levels = (1 to numMerges).map { i =>
      s""",
         | p$i AS (
         |   SELECT (s).l AS l, (s).r AS r, sum(freq) AS cnt FROM (
         |     SELECT unnest(list_transform(
         |        generate_series(1, len(string_split(sym, ' ')) - 1),
         |        i -> struct_pack(l := string_split(sym, ' ')[i],
         |                         r := string_split(sym, ' ')[i + 1]))) AS s,
         |        freq
         |     FROM w${i - 1} WHERE len(string_split(sym, ' ')) >= 2)
         |   GROUP BY 1, 2),
         | m$i AS (SELECT l, r FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         | w$i AS (SELECT replace(sym, m$i.l || ' ' || m$i.r,
         |     m$i.l || substr(m$i.r, 2)) AS sym, freq
         |   FROM w${i - 1} CROSS JOIN m$i)""".stripMargin
    }.mkString
    val out = (1 to numMerges).map { i =>
      s"SELECT CAST(${i - 1} AS INT) AS rank, " +
        s"substr((SELECT l FROM m$i), 2) AS merge_left, " +
        s"substr((SELECT r FROM m$i), 2) AS merge_right"
    }.mkString("\nUNION ALL ")
    s"""WITH w0 AS (
       |  SELECT rtrim(regexp_replace(term, '(.)', chr(1) || '\\1' || ' ', 'g')) AS sym,
       |         count(*) AS freq
       |  FROM (SELECT unnest($tokSql) AS term FROM documents)
       |  GROUP BY 1)$levels
       |$out
       |ORDER BY rank""".stripMargin
  }

  /** DuckDB replay of [[graft.query.Search.boolTopK]]: the bm25Sql scoring
    * body over must ∪ should, a distinct-count HAVING gate for must, and a
    * NOT IN exclusion for must_not. */
  private def boolSql(must: Seq[String], should: Seq[String],
      mustNot: Seq[String], k: Int, minShouldMatch: Int = 0): String = {
    val scoreTerms = (must ++ should).distinct.sorted
    val termList = scoreTerms.map(t => s"'$t'").mkString(", ")
    val mustList = must.distinct.sorted.map(t => s"'$t'").mkString(", ")
    val notList = mustNot.distinct.sorted.map(t => s"'$t'").mkString(", ")
    val shouldList = should.distinct.sorted.map(t => s"'$t'").mkString(", ")
    val useMsm = minShouldMatch > 0 && should.nonEmpty
    val mustGate = (if (must.isEmpty) ""
      else s" JOIN hasmust USING (doc_id)") +
      (if (!useMsm) "" else " JOIN hasmsm USING (doc_id)")
    val mustCte = (if (must.isEmpty) ""
      else s""",
        | hasmust AS (SELECT doc_id FROM (SELECT DISTINCT doc_id, term
        |   FROM toks WHERE term IN ($mustList))
        |   GROUP BY 1 HAVING count(*) = ${must.distinct.size})""".stripMargin) +
      (if (!useMsm) "" else s""",
        | hasmsm AS (SELECT doc_id FROM (SELECT DISTINCT doc_id, term
        |   FROM toks WHERE term IN ($shouldList))
        |   GROUP BY 1 HAVING count(*) >= $minShouldMatch)""".stripMargin)
    val notPred = if (mustNot.isEmpty) ""
      else s"\n WHERE a.doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE term IN ($notList))"
    s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       | dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       | g AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
       | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       |        WHERE term IN ($termList) GROUP BY 1, 2),
       | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       | scored AS (
       |  SELECT tf.doc_id,
       |   ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5)
       |        / (CAST(df.df AS DOUBLE) + 0.5))
       |   * ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
       |      + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
       |        / (CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE)))))) AS s
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN g),
       | agg AS (SELECT doc_id, round(sum(s), 4) AS score FROM scored GROUP BY 1)$mustCte
       |SELECT a.doc_id, a.score FROM agg a$mustGate$notPred
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** The shared BM25 per-(doc, term) scoring CTE chain (toks → dl → g →
    * tf → df → scored). `scored` keeps the term column so callers can
    * weight or max over per-term contributions. */
  private def bm25ScoredCtes(termsIn: String): String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       | dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       | g AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
       | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       |        WHERE term IN ($termsIn) GROUP BY 1, 2),
       | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       | scored AS (
       |  SELECT tf.doc_id, tf.term,
       |   ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5)
       |        / (CAST(df.df AS DOUBLE) + 0.5))
       |   * ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
       |      + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
       |        / (CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE)))))) AS s
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN g)""".stripMargin

  /** DuckDB replay of [[graft.query.Search.disMaxTopK]]: per-doc
    * max + tie·(sum − max) over the per-term BM25 scores, rounded to 4. */
  private def disMaxSql(terms0: Seq[String], tie: Double, k: Int): String = {
    val termList = terms0.distinct.sorted.map(t => s"'$t'").mkString(", ")
    s"""${bm25ScoredCtes(termList)}
       |SELECT doc_id, round(max(s) + $tie * (sum(s) - max(s)), 4) AS score
       |FROM scored GROUP BY 1
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** DuckDB replay of [[graft.query.Search.boostedTopK]]: each term's
    * BM25 contribution scales by its boost before the per-doc sum. */
  private def boostedSql(boosts: Seq[(String, Double)], k: Int): String = {
    val termList = boosts.map(_._1).sorted.map(t => s"'$t'").mkString(", ")
    val vals = boosts.sortBy(_._1)
      .map { case (t, b) => s"('$t', $b)" }.mkString(", ")
    s"""${bm25ScoredCtes(termList)},
       | b AS (SELECT * FROM (VALUES $vals) t(term, boost))
       |SELECT scored.doc_id, round(sum(scored.s * b.boost), 4) AS score
       |FROM scored JOIN b USING (term) GROUP BY 1
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** DuckDB replay of [[graft.query.Search.regexpTopK]]: the dictionary's
    * full-match slice (anchored both ends, Lucene's contract), expanded
    * ascending capped at maxExpansions, scored as a should-bool. */
  private def regexpSql(pattern: String, maxExpansions: Int, k: Int)
      : String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       | exp AS (SELECT term FROM (SELECT DISTINCT term FROM toks
       |   WHERE regexp_matches(term, '^(?:$pattern)$$'))
       |   ORDER BY term LIMIT $maxExpansions),
       | dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       | g AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
       | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       |        WHERE term IN (SELECT term FROM exp) GROUP BY 1, 2),
       | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       | scored AS (
       |  SELECT tf.doc_id,
       |   ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5)
       |        / (CAST(df.df AS DOUBLE) + 0.5))
       |   * ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
       |      + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
       |        / (CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE)))))) AS s
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN g)
       |SELECT doc_id, round(sum(s), 4) AS score FROM scored GROUP BY 1
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin

  /** DuckDB replay of [[graft.query.BruteForce.phrasePrefixScoreAll]] for
    * a 2-slot (exact, prefix) phrase: expansion = LIKE-derived ascending
    * capped dictionary slice, last-slot positions = list_contains against
    * the expansion list, the slop chain and BM25 as in phraseSlopSql, and
    * the prefix slot's idf from df_union (docs containing ≥ 1 expansion
    * term). `withTf = false` drops phrase_tf (the index-served form
    * returns (doc_id, score) only). */
  private def phrasePrefixSql(exact: String, prefix: String, slop: Int,
      cap: Int, k: Int, withTf: Boolean): String = {
    val tfCol = if (withTf) " ptf AS phrase_tf," else ""
    s"""WITH tl AS (SELECT doc_id, $tokSql AS l FROM documents),
       | dl AS (SELECT doc_id, len(l) AS dl, l FROM tl),
       | g AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
       | exp AS (SELECT term FROM (SELECT DISTINCT unnest(l) AS term FROM tl)
       |   WHERE term LIKE '$prefix%' ORDER BY term LIMIT $cap),
       | el AS (SELECT list(term ORDER BY term) AS el FROM exp),
       | df0 AS (SELECT count(*) AS df FROM dl WHERE list_contains(l, '$exact')),
       | dfu AS (SELECT count(*) AS df FROM dl, el
       |   WHERE len(list_filter(l, t -> list_contains(el.el, t))) > 0),
       | stats AS (SELECT
       |   ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(df0.df AS DOUBLE)) + 0.5)
       |     / (CAST(df0.df AS DOUBLE) + 0.5))
       |   + ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(dfu.df AS DOUBLE)) + 0.5)
       |     / (CAST(dfu.df AS DOUBLE) + 0.5)) AS idfsum,
       |   CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE) AS avgdl
       |   FROM g, df0, dfu),
       | pos AS (SELECT doc_id, dl.dl AS dl,
       |   list_filter(generate_series(1, len(l)), x -> l[x] = '$exact') AS parr0,
       |   list_filter(generate_series(1, len(l)),
       |     x -> list_contains(el.el, l[x])) AS parr1
       |  FROM dl, el),
       | ptfs AS (SELECT doc_id, dl,
       |   len(list_filter(parr0,
       |     p0 -> (list_filter(parr1, y -> y > (p0))[1]) - p0 - 1 <= $slop)) AS ptf
       |   FROM pos)
       |SELECT doc_id,$tfCol
       | round(stats.idfsum * ((CAST(ptf AS DOUBLE) * 2.2) /
       |   (CAST(ptf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
       |     (CAST(dl AS DOUBLE) / stats.avgdl)))), 4) AS score
       |FROM ptfs, stats WHERE ptf > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** The filters/adjacency gate instance: two real buckets + one that
    * matches nothing (filters keeps it at 0; adjacency omits it). */
  private val filtersGate: Seq[(String, Seq[String])] = Seq(
    ("storage", Seq("table", "row", "column")),
    ("exec", Seq("scan", "join")),
    ("none", Seq("zzzqq")))

  /** Shared membership CTE for the filters/adjacency oracles. */
  private def filtersMemSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       | mem AS (SELECT DISTINCT doc_id,
       |   CASE WHEN term IN ('column', 'row', 'table') THEN 'storage'
       |        WHEN term IN ('join', 'scan') THEN 'exec'
       |        WHEN term = 'zzzqq' THEN 'none' END AS name
       |  FROM toks
       |  WHERE term IN ('column', 'row', 'table', 'join', 'scan', 'zzzqq'))""".stripMargin

  private def filtersAggSql: String =
    s"""$filtersMemSql,
       | c AS (SELECT name, count(*) AS doc_count FROM mem GROUP BY 1)
       |SELECT n.name, coalesce(c.doc_count, 0) AS doc_count
       |FROM (VALUES ('storage'), ('exec'), ('none')) n(name)
       |LEFT JOIN c USING (name) ORDER BY name""".stripMargin

  private def adjacencySql: String =
    s"""$filtersMemSql,
       | ord AS (SELECT * FROM (VALUES ('storage', 0), ('exec', 1),
       |   ('none', 2)) o(name, pos)),
       | s AS (SELECT name AS key, count(*) AS doc_count FROM mem GROUP BY 1),
       | p AS (SELECT concat(a.name, '&', b.name) AS key,
       |   count(*) AS doc_count
       |  FROM mem a JOIN mem b ON a.doc_id = b.doc_id
       |  JOIN ord oa ON oa.name = a.name JOIN ord ob ON ob.name = b.name
       |  WHERE oa.pos < ob.pos GROUP BY 1)
       |SELECT key, doc_count FROM (SELECT * FROM s UNION ALL SELECT * FROM p)
       |WHERE doc_count > 0 ORDER BY key""".stripMargin

  /** DuckDB replay of [[graft.query.Search.topHits]]: per-doc rounded
    * BM25 sums joined to the facet column, the nBuckets biggest buckets
    * (doc_count desc, facet), a per-bucket row_number window on
    * (score desc, doc_id), rank ≤ perBucket. */
  private def topHitsSql(terms0: Seq[String], nBuckets: Int,
      perBucket: Int): String = {
    val termList = terms0.distinct.sorted.map(t => s"'$t'").mkString(", ")
    s"""${bm25ScoredCtes(termList)},
       | per AS (SELECT doc_id, round(sum(s), 4) AS score FROM scored
       |   GROUP BY 1),
       | sc AS (SELECT per.doc_id, per.score, d.lang AS facet
       |   FROM per JOIN documents d USING (doc_id)),
       | cnt AS (SELECT facet, count(*) AS doc_count FROM sc GROUP BY 1
       |   ORDER BY doc_count DESC, facet LIMIT $nBuckets),
       | rk AS (SELECT sc.facet, cnt.doc_count,
       |   row_number() OVER (PARTITION BY sc.facet
       |     ORDER BY sc.score DESC, sc.doc_id) AS rnk,
       |   sc.doc_id, sc.score
       |  FROM sc JOIN cnt USING (facet))
       |SELECT facet, doc_count, rnk, doc_id, score FROM rk
       |WHERE rnk <= $perBucket
       |ORDER BY doc_count DESC, facet, rnk""".stripMargin
  }

  /** Shared match-set CTE prefix: `m` = distinct doc_ids containing any
    * query term, `mv` = their documents rows. */
  private def matchSetCtes(terms0: Seq[String]): String = {
    val termList = terms0.distinct.sorted.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       | m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ($termList)),
       | mv AS (SELECT d.* FROM documents d JOIN m USING (doc_id))""".stripMargin
  }

  /** DuckDB replay of [[graft.query.Search.matchPercentiles]]:
    * quantile_cont shares Spark percentile's rank = p·(n−1) continuous
    * interpolation. */
  private def matchPercentilesSql(terms0: Seq[String], ps: Seq[Double])
      : String = {
    val branches = ps.map(p =>
      s"SELECT CAST($p AS DOUBLE) AS pct, round(quantile_cont(n_chars, $p), 6) AS value FROM mv")
    s"""${matchSetCtes(terms0)}
       |${branches.mkString("", "\nUNION ALL ", "")}
       |ORDER BY pct""".stripMargin
  }

  /** DuckDB replay of [[graft.query.Search.matchHistogram]]. */
  private def matchHistogramSql(terms0: Seq[String], interval: Double)
      : String =
    s"""${matchSetCtes(terms0)}
       |SELECT floor(CAST(n_chars AS DOUBLE) / $interval) * $interval AS bucket,
       | count(*) AS doc_count
       |FROM mv GROUP BY 1""".stripMargin

  /** DuckDB replay of [[graft.query.Search.matchCardinality]]: the KMV
    * bottom-k estimator hash-for-hash (q_kmv_distinct's replay, single
    * bucket, over the match set). */
  private def matchCardinalitySql(terms0: Seq[String], k: Int): String =
    s"""${matchSetCtes(terms0)},
       | h AS (SELECT DISTINCT substr(md5(CAST(n_chars AS VARCHAR)), 1, 16) AS hv
       |   FROM mv),
       | r AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM h),
       | kth AS (SELECT max(CASE WHEN rn = $k THEN hv END) AS uk,
       |   CAST(count(*) AS INT) AS sketch_size FROM r WHERE rn <= $k),
       | ex AS (SELECT count(DISTINCT n_chars) AS exact_distinct FROM mv)
       |SELECT kth.sketch_size,
       | CASE WHEN kth.sketch_size < $k THEN CAST(kth.sketch_size AS DOUBLE)
       |      ELSE round(${(k - 1).toDouble} / (('0x' || kth.uk)::UBIGINT::DOUBLE
       |                    / 18446744073709551616.0), 4) END AS est_distinct,
       | ex.exact_distinct
       |FROM kth, ex""".stripMargin

  /** DuckDB replay of [[graft.query.Search.rescoreTopK]] (score_mode
    * total, phrase ["window","sort"] slop 1): window = top-N by rounded
    * primary BM25, phrase scores join the window only, combined rounds
    * once. */
  private def rescoreSql(terms0: Seq[String], window: Int, k: Int,
      rw: Double): String = {
    val termList = terms0.distinct.sorted.map(t => s"'$t'").mkString(", ")
    s"""${bm25ScoredCtes(termList)},
       | win AS (SELECT doc_id, round(sum(s), 4) AS score FROM scored
       |   GROUP BY 1 ORDER BY score DESC, doc_id LIMIT $window),
       | tl AS (SELECT doc_id, $tokSql AS l FROM documents),
       | pdl AS (SELECT doc_id, len(l) AS pdl, l FROM tl),
       | pdfs AS (SELECT
       |   (SELECT count(*) FROM pdl WHERE list_contains(l, 'window')) AS df0,
       |   (SELECT count(*) FROM pdl WHERE list_contains(l, 'sort')) AS df1),
       | pstats AS (SELECT
       |   ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(pdfs.df0 AS DOUBLE)) + 0.5)
       |     / (CAST(pdfs.df0 AS DOUBLE) + 0.5))
       |   + ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(pdfs.df1 AS DOUBLE)) + 0.5)
       |     / (CAST(pdfs.df1 AS DOUBLE) + 0.5)) AS idfsum,
       |   CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE) AS avgdl
       |   FROM g, pdfs),
       | pos AS (SELECT doc_id, pdl.pdl AS pdl,
       |   list_filter(generate_series(1, len(l)), x -> l[x] = 'window') AS parr0,
       |   list_filter(generate_series(1, len(l)), x -> l[x] = 'sort') AS parr1
       |  FROM pdl),
       | ptfs AS (SELECT doc_id, pdl,
       |   len(list_filter(parr0,
       |     p0 -> (list_filter(parr1, y -> y > (p0))[1]) - p0 - 1 <= 1)) AS ptf
       |   FROM pos),
       | ph AS (SELECT doc_id,
       |   pstats.idfsum * ((CAST(ptf AS DOUBLE) * 2.2) / (CAST(ptf AS DOUBLE)
       |     + 1.2 * (0.25 + 0.75 * (CAST(pdl AS DOUBLE) / pstats.avgdl)))) AS s_ph
       |  FROM ptfs, pstats WHERE ptf > 0)
       |SELECT win.doc_id,
       | round(1.0 * win.score + $rw * coalesce(ph.s_ph, 0), 4) AS score
       |FROM win LEFT JOIN ph ON win.doc_id = ph.doc_id
       |ORDER BY score DESC, win.doc_id LIMIT $k""".stripMargin
  }

  /** DuckDB replay of [[graft.query.Search.fieldValueFactorTopK]] with
    * the ln1p modifier: per-doc BM25 sum × ln(1 + factor·n_chars),
    * rounded once. */
  private def fvfSql(terms0: Seq[String], factor: Double, k: Int): String = {
    val termList = terms0.distinct.sorted.map(t => s"'$t'").mkString(", ")
    s"""${bm25ScoredCtes(termList)},
       | per AS (SELECT doc_id, sum(s) AS score FROM scored GROUP BY 1)
       |SELECT per.doc_id,
       | round(per.score * ln(1.0 + $factor
       |   * coalesce(CAST(d.n_chars AS DOUBLE), 0.0)), 4) AS score
       |FROM per JOIN documents d ON per.doc_id = d.doc_id
       |ORDER BY score DESC, per.doc_id LIMIT $k""".stripMargin
  }

  /** The query_string gate instance — every clause shape at once. */
  private val queryStringGate =
    "+spark merge^2 \"window sort\"~1 -slow st*m sprk~1"

  /** DuckDB replay of [[graft.query.QueryString.topK]] on
    * [[queryStringGate]]: per-term BM25 CTEs over the union of literal
    * terms + LIKE-derived wildcard expansion + levenshtein-derived fuzzy
    * expansion, the slop-phrase chain replay (phraseSlopSql's shape,
    * unrounded so the CLAUSE SUM rounds once like the engine), clause
    * contributions folded in query order, must gate as a NULL check and
    * must_not as NOT IN. */
  private def queryStringSql(k: Int): String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       | dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       | g AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
       | fz AS (SELECT DISTINCT term FROM toks
       |   WHERE abs(len(term) - 4) <= 1 AND levenshtein(term, 'sprk') <= 1),
       | wc AS (SELECT DISTINCT term FROM toks WHERE term LIKE 'st%m'),
       | qt AS (SELECT 'spark' AS term UNION SELECT 'merge'
       |   UNION SELECT term FROM fz UNION SELECT term FROM wc),
       | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       |        WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
       | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       | scored AS (
       |  SELECT tf.doc_id, tf.term,
       |   ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5)
       |        / (CAST(df.df AS DOUBLE) + 0.5))
       |   * ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
       |      + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
       |        / (CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE)))))) AS s
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN g),
       | per AS (SELECT doc_id,
       |   sum(CASE WHEN term = 'spark' THEN s END) AS s_must,
       |   sum(CASE WHEN term = 'merge' THEN s END) AS s_merge,
       |   sum(CASE WHEN term IN (SELECT term FROM wc) THEN s END) AS s_wc,
       |   sum(CASE WHEN term IN (SELECT term FROM fz) THEN s END) AS s_fz
       |  FROM scored GROUP BY 1),
       | tl AS (SELECT doc_id, $tokSql AS l FROM documents),
       | pdfs AS (SELECT
       |   (SELECT count(*) FROM tl WHERE list_contains(l, 'window')) AS df0,
       |   (SELECT count(*) FROM tl WHERE list_contains(l, 'sort')) AS df1),
       | pstats AS (SELECT
       |   ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(pdfs.df0 AS DOUBLE)) + 0.5)
       |     / (CAST(pdfs.df0 AS DOUBLE) + 0.5))
       |   + ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(pdfs.df1 AS DOUBLE)) + 0.5)
       |     / (CAST(pdfs.df1 AS DOUBLE) + 0.5)) AS idfsum,
       |   CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE) AS avgdl
       |   FROM g, pdfs),
       | pos AS (SELECT doc_id, len(l) AS pdl,
       |   list_filter(generate_series(1, len(l)), x -> l[x] = 'window') AS parr0,
       |   list_filter(generate_series(1, len(l)), x -> l[x] = 'sort') AS parr1
       |  FROM tl),
       | ptfs AS (SELECT doc_id, pdl,
       |   len(list_filter(parr0,
       |     p0 -> (list_filter(parr1, y -> y > (p0))[1]) - p0 - 1 <= 1)) AS ptf
       |   FROM pos),
       | ph AS (SELECT doc_id,
       |   pstats.idfsum * ((CAST(ptf AS DOUBLE) * 2.2) / (CAST(ptf AS DOUBLE)
       |     + 1.2 * (0.25 + 0.75 * (CAST(pdl AS DOUBLE) / pstats.avgdl)))) AS s_ph
       |  FROM ptfs, pstats WHERE ptf > 0),
       | base AS (SELECT coalesce(per.doc_id, ph.doc_id) AS doc_id,
       |   s_must, s_merge, s_wc, s_fz, s_ph
       |  FROM per FULL OUTER JOIN ph ON per.doc_id = ph.doc_id),
       | notm AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'slow')
       |SELECT doc_id, round(coalesce(s_must, 0) + 2*coalesce(s_merge, 0)
       |  + coalesce(s_ph, 0) + coalesce(s_wc, 0) + coalesce(s_fz, 0), 4) AS score
       |FROM base WHERE s_must IS NOT NULL
       |  AND doc_id NOT IN (SELECT doc_id FROM notm)
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin

  /** DuckDB replay of [[graft.query.Search.matchStats]]: exact integer
    * count/min/max/sum over the any-term match set; avg is the one
    * division, rounded to 6. */
  private def matchStatsSql(terms0: Seq[String]): String = {
    val termList = terms0.distinct.sorted.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       | m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ($termList))
       |SELECT count(*) AS doc_count,
       | min(n_chars) AS min_v, max(n_chars) AS max_v,
       | CAST(sum(n_chars) AS BIGINT) AS sum_v,
       | round(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |   AS avg_v
       |FROM documents JOIN m USING (doc_id)""".stripMargin
  }

  /** DuckDB replay of [[graft.query.Search.significantTerms]] (JLH):
    * fg% = fg_df/|M|, bg% = df/N, JLH = (fg% − bg%)·(fg%/bg%) — the two
    * divisions and one multiply in the Spark side's exact order. */
  private def sigTermsSql(terms0: Seq[String], n: Int, minDocCount: Int)
      : String = {
    val termList = terms0.distinct.sorted.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (SELECT DISTINCT doc_id, term FROM
       |   (SELECT doc_id, unnest($tokSql) AS term FROM documents)),
       | m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ($termList)),
       | fgc AS (SELECT CAST(count(*) AS DOUBLE) AS fgc FROM m),
       | g AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       | fg AS (SELECT term, count(*) AS fg_df FROM toks
       |   JOIN m USING (doc_id) GROUP BY 1),
       | bg AS (SELECT term, count(*) AS df FROM toks GROUP BY 1)
       |SELECT term, fg_df, df,
       | round((CAST(fg_df AS DOUBLE) / fgc - CAST(df AS DOUBLE) / g.n)
       |   * ((CAST(fg_df AS DOUBLE) / fgc) / (CAST(df AS DOUBLE) / g.n)), 6)
       |   AS jlh
       |FROM fg JOIN bg USING (term) CROSS JOIN fgc CROSS JOIN g
       |WHERE term NOT IN ($termList) AND fg_df >= $minDocCount
       |ORDER BY jlh DESC, term LIMIT $n""".stripMargin
  }

  private def bm25Sql(terms0: Seq[String], k: Int,
      table: String = "documents", idCol: String = "doc_id",
      tokExpr: String = tokSql): String = {
    val terms = terms0.distinct.sorted
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT $idCol AS doc_id, unnest($tokExpr) AS term FROM $table),
       | dl AS (SELECT $idCol AS doc_id, len($tokExpr) AS dl FROM $table),
       | g AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
       | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       |        WHERE term IN ($termList) GROUP BY 1, 2),
       | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       | scored AS (
       |  SELECT tf.doc_id,
       |   ln(1.0 + ((CAST(g.n AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5)
       |        / (CAST(df.df AS DOUBLE) + 0.5))
       |   * ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
       |      + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
       |        / (CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE)))))) AS s
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN g)
       | SELECT doc_id AS $idCol, round(sum(s), 4) AS score FROM scored GROUP BY 1
       | ORDER BY score DESC, $idCol LIMIT $k""".stripMargin
  }

  /** DuckDB re-implementation of the ENTIRE FakeDecoder feature path: the
    * synthetic media generator's per-byte SplitMix64 draws (pure functions
    * of (id, k) — see [[logGenGrokSql]]), the decoder's 31-ary hash fold
    * (LINEAR: h = C·31^len + Σ b_i·31^(len-i) mod 2⁶⁴, so a recursive-CTE
    * power table + one grouped sum replays it), and the seeded feature
    * expansion with bit-exact float32 narrowing. Validated byte-level
    * against the Scala output on all fixture rows before landing. */
  private def multimodalFeaturesSql(n: Long): String = {
    val G = "11400714819323198485"
    val C1 = "13787848793156543929"
    val C2 = "10723151780598845931"
    val M = "18446744073709551616"
    def m64(a: String, b: String): String =
      s"(((($a) % 4294967296)::HUGEINT * $b % $M + " +
        s"((($a) >> 32)::HUGEINT * $b % 4294967296) * 4294967296) % $M)::UBIGINT"
    s"""WITH RECURSIVE pows(p, v) AS (
       |  SELECT 0, 1::UBIGINT
       |  UNION ALL SELECT p + 1, ${m64("v", "31")} FROM pows WHERE p < 520),
       | ids AS (SELECT unnest(range(0, $n))::UBIGINT AS id),
       | a0 AS (SELECT id, xor(42::UBIGINT, ${m64("id", G)}) AS z FROM ids),
       | a1 AS (SELECT id, ${m64("xor(z, z>>30)", C1)} AS z FROM a0),
       | a2 AS (SELECT id, ${m64("xor(z, z>>27)", C2)} AS z FROM a1),
       | s0 AS (SELECT id, xor(z, z>>31) AS s0 FROM a2),
       | hd AS (SELECT id, s0,
       |   ((s0::HUGEINT + 1*$G::HUGEINT) % $M)::UBIGINT AS z1,
       |   ((s0::HUGEINT + 2*$G::HUGEINT) % $M)::UBIGINT AS z2 FROM s0),
       | h1 AS (SELECT id, s0, ${m64("xor(z1, z1>>30)", C1)} AS z1,
       |                       ${m64("xor(z2, z2>>30)", C1)} AS z2 FROM hd),
       | h2 AS (SELECT id, s0, ${m64("xor(z1, z1>>27)", C2)} AS z1,
       |                       ${m64("xor(z2, z2>>27)", C2)} AS z2 FROM h1),
       | hdr AS (SELECT id, s0,
       |   list_extract(['image','audio','video'], ((xor(z1, z1>>31)>>1) % 3)::INT + 1) AS modality,
       |   (64 + (xor(z2, z2>>31)>>1) % 448)::INT AS len FROM h2),
       | series AS (SELECT id, s0, len, unnest(range(1, len + 1))::UBIGINT AS i FROM hdr),
       | b0 AS (SELECT id, len, i,
       |   ((s0::HUGEINT + (i+2)::HUGEINT*$G::HUGEINT) % $M)::UBIGINT AS z FROM series),
       | b1 AS (SELECT id, len, i, ${m64("xor(z, z>>30)", C1)} AS z FROM b0),
       | b2 AS (SELECT id, len, i, ${m64("xor(z, z>>27)", C2)} AS z FROM b1),
       | bytes AS (SELECT id, len, i,
       |   CASE WHEN (xor(z, z>>31) & 255) >= 128
       |        THEN (xor(z, z>>31) & 255)::BIGINT - 256
       |        ELSE (xor(z, z>>31) & 255)::BIGINT END AS b FROM b2),
       | terms AS (SELECT bytes.id, bytes.len,
       |   CASE WHEN b >= 0 THEN ${m64("b::UBIGINT", "v")}
       |        ELSE ($M - ${m64("(-b)::UBIGINT", "v")}::HUGEINT)::UBIGINT % $M
       |   END AS t
       |   FROM bytes JOIN pows ON pows.p = bytes.len - bytes.i),
       | folded AS (SELECT terms.id, (sum(t::HUGEINT) % $M)::UBIGINT AS acc
       |   FROM terms GROUP BY 1),
       | hval AS (SELECT folded.id,
       |   ((${m64("1125899906842597::UBIGINT", "v")}::HUGEINT + acc::HUGEINT) % $M)::UBIGINT AS h
       |   FROM folded JOIN hdr ON hdr.id = folded.id JOIN pows ON pows.p = hdr.len),
       | m0 AS (SELECT id, ${m64("xor(h, h>>30)", C1)} AS z FROM hval),
       | m1 AS (SELECT id, ${m64("xor(z, z>>27)", C2)} AS z FROM m0),
       | m2 AS (SELECT id, ((xor(z, z>>31)::HUGEINT + $G::HUGEINT) % $M)::UBIGINT AS z FROM m1),
       | m3 AS (SELECT id, ${m64("xor(z, z>>30)", C1)} AS z FROM m2),
       | m4 AS (SELECT id, ${m64("xor(z, z>>27)", C2)} AS z FROM m3),
       | fv AS (SELECT id, xor(z, z>>31) AS nl FROM m4)
       | SELECT fv.id::BIGINT AS media_id, hdr.modality,
       |   CAST(8 AS INTEGER) AS feat_dim, true AS ok,
       |   round(CAST(CAST(((nl >> 11)::DOUBLE * 1.1102230246251565e-16)
       |     * 2.0 - 1.0 AS FLOAT) AS DOUBLE), 4) AS f0
       | FROM fv JOIN hdr ON hdr.id = fv.id""".stripMargin
  }

  /** DuckDB re-implementation of [[graft.util.SplitMix64]]: because the
    * generator's state advance is linear (state_k = mix(seed,id) + k·γ mod
    * 2⁶⁴), draw k is a PURE function of (seed, id, k) — finalize(s0 + k·γ).
    * 64×64 multiplication is split at 32 bits to stay inside DuckDB's
    * INT128. This makes the synthetic log-generator fixture independently
    * recomputable by the oracle engine, not just pinned to our output. */
  private def logGenGrokSql(n: Long): String = {
    val G = "11400714819323198485"  // 0x9e3779b97f4a7c15 unsigned
    val C1 = "13787848793156543929" // 0xbf58476d1ce4e5b9
    val C2 = "10723151780598845931" // 0x94d049bb133111eb
    val M = "18446744073709551616"  // 2^64
    // (a * b) mod 2^64 via 32-bit split: a*b = lo(a)*b + (hi(a)*b mod 2^32)<<32
    def m64(a: String, b: String): String =
      s"(((($a) % 4294967296)::HUGEINT * $b % $M + " +
        s"((($a) >> 32)::HUGEINT * $b % 4294967296) * 4294967296) % $M)::UBIGINT"
    // logGenerator's draws: 1-4 ip, 5 method, 6 path, 7 code, 8 bytes
    s"""WITH ids AS (SELECT unnest(range(0, $n))::UBIGINT AS id),
       | a0 AS (SELECT id, xor(42::UBIGINT, ${m64("id", G)}) AS z FROM ids),
       | a1 AS (SELECT id, ${m64("xor(z, z>>30)", C1)} AS z FROM a0),
       | a2 AS (SELECT id, ${m64("xor(z, z>>27)", C2)} AS z FROM a1),
       | a3 AS (SELECT id, xor(z, z>>31) AS s0 FROM a2),
       | b0 AS (SELECT id, ((s0::HUGEINT + 5*$G::HUGEINT) % $M)::UBIGINT AS z5,
       |                   ((s0::HUGEINT + 7*$G::HUGEINT) % $M)::UBIGINT AS z7,
       |                   ((s0::HUGEINT + 8*$G::HUGEINT) % $M)::UBIGINT AS z8 FROM a3),
       | b1 AS (SELECT id, ${m64("xor(z5, z5>>30)", C1)} AS z5,
       |                   ${m64("xor(z7, z7>>30)", C1)} AS z7,
       |                   ${m64("xor(z8, z8>>30)", C1)} AS z8 FROM b0),
       | b2 AS (SELECT id, ${m64("xor(z5, z5>>27)", C2)} AS z5,
       |                   ${m64("xor(z7, z7>>27)", C2)} AS z7,
       |                   ${m64("xor(z8, z8>>27)", C2)} AS z8 FROM b1),
       | b3 AS (SELECT id, xor(z5, z5>>31) AS z5, xor(z7, z7>>31) AS z7,
       |                   xor(z8, z8>>31) AS z8 FROM b2),
       | ev AS (SELECT
       |   list_extract(['GET','POST','PUT','DELETE'], ((z5>>1) % 4)::INT + 1) AS method,
       |   list_extract(['200','200','200','301','404','500'], ((z7>>1) % 6)::INT + 1) AS code,
       |   (100 + ((z8>>1) % 9000))::BIGINT AS bytes FROM b3)
       | SELECT method, code, count(*) AS n, sum(bytes)::BIGINT AS total_bytes
       | FROM ev GROUP BY 1, 2""".stripMargin
  }

  /** All-pairs exact 3-shingle Jaccard >= threshold in DuckDB. With
    * `maxShingleDf = Some(cap)` it is the q_ngram_jaccard oracle (capped
    * universe); with None it is the FULL-universe truth — also the
    * q_minhash_neardups oracle, because banded LSH (16 bands x 4 rows) has
    * measured 100% recall on this fixture (deterministic seeds, so the
    * equality is stable) and the verification filter is exact Jaccard. */
  private def ngramJaccardSql(threshold: Double, maxShingleDf: Option[Int]): String = {
    val keep = maxShingleDf match {
      case Some(cap) =>
        s""" keep AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= $cap),
           | sh AS (SELECT sh0.doc_id, sh0.sh FROM sh0 JOIN keep USING (sh)),""".stripMargin
      case None => " sh AS (SELECT doc_id, sh FROM sh0),"
    }
    s"""WITH toks AS (SELECT doc_id, $tokSql AS l FROM documents),
       | idx AS (SELECT doc_id, l, unnest(range(1, greatest(len(l) - 1, 2))) AS i
       |         FROM toks),
       | sh0 AS (SELECT DISTINCT doc_id,
       |         CASE WHEN len(l) < 3 THEN array_to_string(l, ' ')
       |              ELSE array_to_string(l[i:i+2], ' ') END AS sh
       |        FROM idx),
       |$keep
       | sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       | inter AS (SELECT a.doc_id AS idA, b.doc_id AS idB, count(*) AS inter
       |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2)
       | SELECT idA, idB, round(CAST(inter AS DOUBLE) /
       |   CAST(za.sz + zb.sz - inter AS DOUBLE), 4) AS jaccard
       | FROM inter JOIN sz za ON za.doc_id = idA JOIN sz zb ON zb.doc_id = idB
       | WHERE CAST(inter AS DOUBLE) / CAST(za.sz + zb.sz - inter AS DOUBLE)
       |   >= $threshold""".stripMargin
  }

  /** Min-label connected components over the capped-Jaccard pair list:
    * recursive CTE propagates labels smaller than the receiving node
    * (the component min is < every other member, so the pruned recursion
    * still delivers it everywhere); singletons keep their own id. */
  private def nearDupClustersSql(): String =
    s"""WITH RECURSIVE pairs AS (
       |${ngramJaccardSql(0.2, Some(50))}
       |), edges AS (
       |  SELECT idA AS a, idB AS b FROM pairs
       |  UNION ALL SELECT idB, idA FROM pairs
       |), cc AS (
       |  SELECT doc_id AS id, doc_id AS lab FROM documents
       |  UNION
       |  SELECT e.b, c.lab FROM cc c JOIN edges e ON e.a = c.id
       |  WHERE c.lab < e.b
       |)
       |SELECT id AS doc_id, min(lab) AS component FROM cc GROUP BY 1""".stripMargin

  /** Gopher-style repetition signals: per-n-gram group counts via unnest,
    * top pick ordered (cnt DESC, chars DESC, gram ASC) to mirror the
    * engine's sorted-run fold tie-break. */
  private def repetitionSignalsSql(): String = {
    def gramCtes(n: Int) =
      s"""g$n AS (SELECT doc_id, array_to_string(l[i:i+${n - 1}], ' ') AS g
         |  FROM (SELECT doc_id, l, unnest(range(1, len(l)-${n - 2})) AS i
         |        FROM base WHERE len(l) >= $n)),
         |c$n AS (SELECT doc_id, g, count(*) AS cnt FROM g$n GROUP BY 1, 2)""".stripMargin
    def topCte(n: Int) =
      s"""t$n AS (SELECT doc_id, cnt*length(g) AS chars FROM c$n
         |  QUALIFY row_number() OVER (PARTITION BY doc_id
         |    ORDER BY cnt DESC, cnt*length(g) DESC, g ASC) = 1)""".stripMargin
    def dupCte(n: Int) =
      s"""d$n AS (SELECT doc_id, sum(CASE WHEN cnt >= 2 THEN cnt*length(g)
         |    ELSE 0 END) AS chars FROM c$n GROUP BY 1)""".stripMargin
    s"""WITH toks AS (SELECT doc_id, text, $tokSql AS l FROM documents),
       |base AS (SELECT doc_id, text, l,
       |  CAST(greatest(length(array_to_string(l, ' ')), 1) AS DOUBLE) AS totchars,
       |  CAST(greatest(len(l), 1) AS DOUBLE) AS nwords FROM toks),
       |${gramCtes(2)}, ${topCte(2)},
       |${gramCtes(3)}, ${topCte(3)},
       |${gramCtes(4)}, ${topCte(4)},
       |${gramCtes(5)}, ${dupCte(5)},
       |${gramCtes(10)}, ${dupCte(10)},
       |ln0 AS (SELECT doc_id, list_filter(list_transform(
       |    string_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS ls
       |  FROM toks),
       |lb AS (SELECT doc_id, ls,
       |  CAST(greatest(len(ls), 1) AS DOUBLE) AS nlines,
       |  CAST(greatest(coalesce(list_sum(list_transform(ls, x -> length(x))), 0), 1)
       |    AS DOUBLE) AS linechars,
       |  len(list_filter(ls, x -> ends_with(x, '...') OR ends_with(x, '…'))) AS ell,
       |  len(list_filter(ls, x -> starts_with(x, '- ') OR starts_with(x, '* ')
       |    OR starts_with(x, '• '))) AS bul
       |  FROM ln0),
       |lc AS (SELECT doc_id, line, count(*) AS cnt FROM
       |  (SELECT doc_id, unnest(ls) AS line FROM ln0) GROUP BY 1, 2),
       |ld AS (SELECT doc_id, sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dcnt,
       |  sum(CASE WHEN cnt >= 2 THEN cnt*length(line) ELSE 0 END) AS dchars
       |  FROM lc GROUP BY 1)
       |SELECT b.doc_id,
       | round(least(coalesce(t2.chars, 0) / b.totchars, 1.0), 6) AS top_2gram_char_frac,
       | round(least(coalesce(t3.chars, 0) / b.totchars, 1.0), 6) AS top_3gram_char_frac,
       | round(least(coalesce(t4.chars, 0) / b.totchars, 1.0), 6) AS top_4gram_char_frac,
       | round(least(coalesce(d5.chars, 0) / b.totchars, 1.0), 6) AS dup_5gram_char_frac,
       | round(least(coalesce(d10.chars, 0) / b.totchars, 1.0), 6) AS dup_10gram_char_frac,
       | round(coalesce(ld.dcnt, 0) / lb.nlines, 6) AS dup_line_frac,
       | round(coalesce(ld.dchars, 0) / lb.linechars, 6) AS dup_line_char_frac,
       | round(lb.ell / lb.nlines, 6) AS ellipsis_line_frac,
       | round(lb.bul / lb.nlines, 6) AS bullet_line_frac,
       | round((CAST(length(b.text) - length(replace(b.text, '#', '')) AS BIGINT)
       |   + CAST((length(b.text) - length(replace(b.text, '...', ''))) // 3 AS BIGINT)
       |   + CAST(length(b.text) - length(replace(b.text, '…', '')) AS BIGINT))
       |   / b.nwords, 6) AS symbol_word_ratio
       |FROM base b JOIN lb USING (doc_id)
       |LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
       |LEFT JOIN t4 USING (doc_id) LEFT JOIN d5 USING (doc_id)
       |LEFT JOIN d10 USING (doc_id) LEFT JOIN ld USING (doc_id)""".stripMargin
  }

  /** Replays mergeActions' OpenSearch document semantics in SQL: the
    * batch is rebuilt with identical expressions, then one full-outer
    * join applies index/create/update/upsert/delete per key. */
  private def bulkMergeSql(): String = {
    def mergeCol(c: String) =
      s"""CASE WHEN b._action IS NULL THEN e.$c
         |     WHEN b._action = 'index' THEN b.$c
         |     WHEN b._action = 'create' THEN
         |       CASE WHEN e.doc_id IS NOT NULL THEN e.$c ELSE b.$c END
         |     ELSE coalesce(b.$c, e.$c) END AS $c""".stripMargin
    s"""WITH ex AS (SELECT doc_id, lang, n_chars FROM documents),
       | batch AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 2 = 0 THEN NULL ELSE 'xx' END AS lang,
       |    n_chars + 1 AS n_chars,
       |    CASE doc_id % 5 WHEN 0 THEN 'delete' WHEN 1 THEN 'index'
       |      WHEN 2 THEN 'update' WHEN 3 THEN 'upsert'
       |      ELSE 'create' END AS _action
       |  FROM ex WHERE doc_id % 3 = 0
       |  UNION ALL
       |  SELECT doc_id + 1000000, 'new', 7,
       |    CASE WHEN doc_id % 2 = 0 THEN 'upsert' ELSE 'update' END
       |  FROM ex WHERE doc_id % 10 = 0)
       |SELECT coalesce(e.doc_id, b.doc_id) AS doc_id,
       | ${mergeCol("lang")},
       | ${mergeCol("n_chars")}
       |FROM ex e FULL OUTER JOIN batch b ON e.doc_id = b.doc_id
       |WHERE b._action IS NULL OR (b._action <> 'delete'
       |  AND (b._action <> 'update' OR e.doc_id IS NOT NULL))""".stripMargin
  }

  /** Exact simhash oracle: per-token hash = first 8 bytes of md5 (the
    * operator's "md5" tokenHash mode — bit-identical to
    * `('0x' || substr(md5(t),1,16))::UBIGINT`), signature = sign of the
    * per-bit +-1 vote sum, pairs = brute-force hamming join at small n
    * (the engine's banked join must return EXACTLY these pairs — recall
    * is guaranteed by the maxHamming+1-bank pigeonhole). */
  private def simHashSql(maxHamming: Int): String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS t FROM documents),
       | h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM toks),
       | bits AS (SELECT doc_id, b,
       |     sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
       |   FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) AS bs(b)
       |   GROUP BY 1, 2),
       | sig0 AS (SELECT doc_id,
       |     sum(CASE WHEN acc > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)::UBIGINT AS sim
       |   FROM bits GROUP BY 1),
       | sig AS (SELECT d.doc_id, coalesce(s.sim, 0::UBIGINT) AS sim
       |   FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN sig0 s USING (doc_id))
       |SELECT a.doc_id AS idA, b.doc_id AS idB,
       |  bit_count(xor(a.sim, b.sim)) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= $maxHamming""".stripMargin

  /** Same gram slicing convention as the duplicate-span oracles:
    * `l[i:i+n-1]` with 1-based inclusive DuckDB slices. */
  private def decontaminateSql(n: Int, evalMod: Int): String =
    s"""WITH toks AS (SELECT doc_id, $tokSql AS l FROM documents),
       | g AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+${n - 1}], ' ') AS g
       |       FROM (SELECT doc_id, l, unnest(range(1, len(l)-${n - 2})) AS i
       |             FROM toks WHERE len(l) >= $n)),
       | eg AS (SELECT DISTINCT g FROM g WHERE doc_id % $evalMod = 0),
       | ov AS (SELECT d.doc_id, count(*) AS overlap FROM g d JOIN eg USING (g)
       |        WHERE d.doc_id % $evalMod <> 0 GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap_ngrams,
       |       coalesce(ov.overlap, 0) >= 1 AS contaminated
       |FROM (SELECT doc_id FROM documents WHERE doc_id % $evalMod <> 0) d
       |LEFT JOIN ov USING (doc_id)""".stripMargin

  /** Rules applied to the SAME round(6) signal values the repetition
    * oracle checks (its full query nests as a subquery); thresholds are
    * Curation.GopherRules defaults with the gate's minWords override. */
  private def gopherFilterSql(minWords: Int): String = {
    val stopSet = graft.corpus.SyntheticCorpus.Stopwords
      .map(w => s"'$w'").mkString(", ")
    s"""WITH sig AS (SELECT * FROM (
       |${repetitionSignalsSql()}
       |) q),
       | tk AS (SELECT doc_id, $tokSql AS l FROM documents),
       | x AS (SELECT doc_id,
       |   CAST(len(l) AS BIGINT) AS n_tokens,
       |   round(CAST(coalesce(list_sum(list_transform(l, t -> length(t))), 0) AS DOUBLE)
       |     / greatest(len(l), 1), 6) AS mean_tok_len,
       |   round(CAST(len(list_filter(l, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
       |     / greatest(len(l), 1), 6) AS alpha_word_frac,
       |   len(list_distinct(list_filter(l, t -> t IN ($stopSet)))) AS nstops
       |  FROM tk),
       | r AS (SELECT x.doc_id, x.n_tokens, concat_ws(',',
       |   CASE WHEN NOT (x.n_tokens BETWEEN $minWords AND 100000) THEN 'word_count' END,
       |   CASE WHEN NOT (x.mean_tok_len BETWEEN 3.0 AND 10.0) THEN 'mean_word_length' END,
       |   CASE WHEN NOT (x.alpha_word_frac >= 0.8) THEN 'alpha_words' END,
       |   CASE WHEN NOT (x.nstops >= 2) THEN 'stopwords' END,
       |   CASE WHEN NOT (s.symbol_word_ratio <= 0.1) THEN 'symbol_ratio' END,
       |   CASE WHEN NOT (s.bullet_line_frac <= 0.9) THEN 'bullet_lines' END,
       |   CASE WHEN NOT (s.ellipsis_line_frac <= 0.3) THEN 'ellipsis_lines' END,
       |   CASE WHEN NOT (s.top_2gram_char_frac <= 0.2 AND s.top_3gram_char_frac <= 0.18
       |     AND s.top_4gram_char_frac <= 0.16) THEN 'top_ngram' END,
       |   CASE WHEN NOT (s.dup_5gram_char_frac <= 0.15 AND s.dup_10gram_char_frac <= 0.1)
       |     THEN 'dup_ngram' END,
       |   CASE WHEN NOT (s.dup_line_frac <= 0.3 AND s.dup_line_char_frac <= 0.2)
       |     THEN 'dup_lines' END) AS reasons
       |  FROM x JOIN sig s USING (doc_id))
       |SELECT doc_id, n_tokens, (reasons = '') AS keep, reasons FROM r""".stripMargin
  }

  /** The exact Curation.PiiPatterns regexes (RE2-safe by construction)
    * over the same deterministically augmented text. */
  private def piiRedactSql(): String = {
    val ps = graft.ops.Curation.PiiPatterns
    val redacted = ps.foldLeft("text") { case (acc, (_, re, repl)) =>
      s"regexp_replace($acc, '$re', '$repl', 'g')"
    }
    val counts = ps.map { case (name, re, _) =>
      s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS n_$name"
    }.mkString(",\n |  ")
    s"""WITH aug AS (SELECT doc_id,
       |  text || ' contact user' || CAST(doc_id AS VARCHAR) ||
       |  '@example.com or 10.20.' || CAST(doc_id % 256 AS VARCHAR) ||
       |  '.7 ssn 123-45-6789 call 555-867-5309' AS text FROM documents)
       |SELECT doc_id, $redacted AS redacted,
       |  $counts
       |FROM aug""".stripMargin
  }

  /** Deterministic non-trivial weight vector (mixed signs, zero-free). */
  private def inferWeights(d: Int): Seq[Double] =
    (0 until d).map(i => ((i * 37) % 19 - 9.5) / 10.0)

  /** Dot accumulates in DOUBLE sequentially in both engines (VecDot and
    * list_dot_product over DOUBLE[]) → bit-identical logit; prob rounds
    * to 4 to absorb any last-ulp exp() libm difference. */
  private def mlInferenceSql(w: Seq[Double], bias: Double): String = {
    val vec = w.mkString("[", ", ", "]")
    s"""SELECT vec_id,
       | round(list_dot_product(CAST(embedding AS DOUBLE[]), $vec) + $bias, 6) AS logit,
       | round(1.0 / (1.0 + exp(-(list_dot_product(CAST(embedding AS DOUBLE[]), $vec)
       |   + $bias))), 4) AS prob
       | FROM embeddings""".stripMargin
  }

  /** Deterministic literal codebook for the fixed-IVF gate (same SplitMix
    * recipe as [[annQueryVec]], different seed per centroid). */
  /** Deterministic PQ sub-codebooks: `m` subspaces × `k` codewords ×
    * `dsub` dims (annCentroids' SplitMix64 convention, distinct seed). */
  private def pqCodebooks(m: Int, k: Int, dsub: Int): Array[Array[Array[Double]]] =
    Array.tabulate(m) { s =>
      Array.tabulate(k) { c =>
        Array.tabulate(dsub) { i =>
          val r = graft.util.SplitMix64.stream(7000L + s * 100 + c, i.toLong)
          math.rint((r.nextDouble() * 2.0 - 1.0) * 1000.0) / 1000.0
        }
      }
    }

  /** Full ADC replay: per-subspace argmin assignment over the literal
    * sub-codebooks (identical x·x − 2·x·c + |c|² arithmetic, round-6,
    * lowest-index ties), the query's lookup table derived IN SQL from the
    * same literals, and the rounded LUT-sum ranking. */
  private def pqSql(q: Seq[Double], cbs: Array[Array[Array[Double]]],
      k: Int): String = {
    val m = cbs.length
    val dsub = cbs(0)(0).length
    def vals(s: Int): String = cbs(s).zipWithIndex.map { case (c, j) =>
      s"($j, ${c.mkString("[", ", ", "]")}::DOUBLE[], ${c.map(x => x * x).sum})"
    }.mkString(", ")
    def qsub(s: Int): String =
      q.slice(s * dsub, (s + 1) * dsub).mkString("[", ", ", "]")
    val cbCtes = (0 until m).map(s =>
      s" cb$s(ci, cv, c2) AS (VALUES ${vals(s)})").mkString(",\n|")
    val subSlice = (s: Int) => s"v[${s * dsub + 1}:${(s + 1) * dsub}]"
    val aCtes = (0 until m).map { s =>
      s""" a$s AS (SELECT vec_id, ci AS code$s FROM (
         |   SELECT vec_id, ci, row_number() OVER (PARTITION BY vec_id
         |     ORDER BY round(list_dot_product(${subSlice(s)}, ${subSlice(s)})
         |       - 2 * list_dot_product(${subSlice(s)}, cv) + c2, 6), ci) AS rn
         |   FROM e, cb$s) WHERE rn = 1)""".stripMargin
    }.mkString(",\n|")
    val lCtes = (0 until m).map { s =>
      s""" l$s AS (SELECT ci, round(list_dot_product(${qsub(s)}::DOUBLE[], ${qsub(s)}::DOUBLE[])
         |   - 2 * list_dot_product(${qsub(s)}::DOUBLE[], cv) + c2, 6) AS qd FROM cb$s)""".stripMargin
    }.mkString(",\n|")
    val aJoins = (1 until m).map(s => s"JOIN a$s USING (vec_id)").mkString(" ")
    val lJoins = (0 until m).map(s => s"JOIN l$s ON l$s.ci = a$s.code$s").mkString(" ")
    val estSum = (0 until m).map(s => s"l$s.qd").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$cbCtes,
       |$aCtes,
       |$lCtes
       |SELECT a0.vec_id, round($estSum, 4) AS est_dist
       |FROM a0 $aJoins $lJoins
       |ORDER BY est_dist, a0.vec_id LIMIT $k""".stripMargin
  }

  /** Full IVF-PQ replay: coarse rounded-cosine argmax assignment
    * (annIvfFixedSql's convention), residual v − centroid derived in SQL,
    * per-subspace argmin over the residual, per-CLUSTER query-residual
    * lookup tables derived in SQL from the raw literals, probe pruning,
    * and the rounded LUT-sum ranking. */
  private def ivfPqSql(q: Seq[Double], cents: Array[Array[Double]],
      cbs: Array[Array[Array[Double]]], k: Int, nprobe: Int): String = {
    val m = cbs.length
    val dim = q.length
    val dsub = cbs(0)(0).length
    val qv = q.mkString("[", ", ", "]")
    val centRows = cents.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ", ", "]")}::DOUBLE[])" }
      .mkString(", ")
    def cbVals(s: Int): String = cbs(s).zipWithIndex.map { case (c, j) =>
      s"($j, ${c.mkString("[", ", ", "]")}::DOUBLE[], ${c.map(x => x * x).sum})"
    }.mkString(", ")
    val cbCtes = (0 until m).map(s =>
      s" cb$s(ci, cv, c2) AS (VALUES ${cbVals(s)})").mkString(",\n|")
    def rvSlice(s: Int) = s"rv[${s * dsub + 1}:${(s + 1) * dsub}]"
    def qrSlice(s: Int) = s"qr[${s * dsub + 1}:${(s + 1) * dsub}]"
    val aCtes = (0 until m).map { s =>
      s""" a$s AS (SELECT vec_id, ci AS code$s FROM (
         |   SELECT vec_id, ci, row_number() OVER (PARTITION BY vec_id
         |     ORDER BY round(list_dot_product(${rvSlice(s)}, ${rvSlice(s)})
         |       - 2 * list_dot_product(${rvSlice(s)}, cv) + c2, 6), ci) AS rn
         |   FROM r, cb$s) WHERE rn = 1)""".stripMargin
    }.mkString(",\n|")
    val lCtes = (0 until m).map { s =>
      s""" l$s AS (SELECT luts.cc, cb$s.ci AS lcode$s,
         |   round(list_dot_product(${qrSlice(s)}, ${qrSlice(s)})
         |     - 2 * list_dot_product(${qrSlice(s)}, cv) + c2, 6) AS qd$s
         |   FROM luts, cb$s)""".stripMargin
    }.mkString(",\n|")
    val aJoins = (0 until m).map(s => s"JOIN a$s USING (vec_id)").mkString(" ")
    val lJoins = (0 until m).map(s =>
      s"JOIN l$s ON l$s.cc = r.cc AND l$s.lcode$s = a$s.code$s").mkString(" ")
    val estSum = (0 until m).map(s => s"l$s.qd$s").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       | cents(ci, cv) AS (VALUES $centRows),
       | asg AS (SELECT vec_id, v, ci AS cc FROM (
       |   SELECT vec_id, v, ci, row_number() OVER (PARTITION BY vec_id
       |     ORDER BY round(list_cosine_similarity(v, cv), 6) DESC, ci) AS rn
       |   FROM e, cents) WHERE rn = 1),
       | probes AS (SELECT ci FROM cents
       |   ORDER BY list_cosine_similarity(cv, $qv) DESC, ci LIMIT $nprobe),
       | r AS (SELECT a.vec_id, a.cc,
       |     list_transform(generate_series(1, $dim), i -> a.v[i] - c.cv[i]) AS rv
       |   FROM asg a JOIN cents c ON c.ci = a.cc
       |   WHERE a.cc IN (SELECT ci FROM probes)),
       | luts AS (SELECT c.ci AS cc,
       |     list_transform(generate_series(1, $dim), i -> ($qv)[i] - c.cv[i]) AS qr
       |   FROM cents c WHERE c.ci IN (SELECT ci FROM probes)),
       |$cbCtes,
       |$aCtes,
       |$lCtes
       |SELECT r.vec_id, round($estSum, 4) AS est_dist
       |FROM r $aJoins $lJoins
       |ORDER BY est_dist, r.vec_id LIMIT $k""".stripMargin
  }

  private def annCentroids(k: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(k) { c =>
      Array.tabulate(dim) { i =>
        val r = graft.util.SplitMix64.stream(100L + c, i.toLong)
        math.rint((r.nextDouble() * 2.0 - 1.0) * 1000.0) / 1000.0
      }
    }

  /** Full IVF query-path replay: per-vector argmax assignment over the
    * literal codebook (rounded cosine, lowest-index ties — exactly
    * [[Similarity.ivfAssignTo]]), nprobe nearest centroids to the query,
    * exact rounded-cosine ranking within the probed clusters. */
  private def annIvfFixedSql(q: Seq[Double], cents: Array[Array[Double]],
      k: Int, nprobe: Int): String = {
    val qv = q.mkString("[", ", ", "]")
    val rows = cents.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ", ", "]")}::DOUBLE[])" }
      .mkString(", ")
    s"""WITH cents(ci, cv) AS (VALUES $rows),
       | probes AS (SELECT ci FROM cents
       |   ORDER BY list_cosine_similarity(cv, $qv) DESC, ci LIMIT $nprobe),
       | scored AS (SELECT vec_id, embedding, ci,
       |     row_number() OVER (PARTITION BY vec_id ORDER BY
       |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), cv), 6) DESC,
       |       ci) AS rn
       |   FROM embeddings, cents),
       | assigned AS (SELECT vec_id, embedding FROM scored
       |   WHERE rn = 1 AND ci IN (SELECT ci FROM probes))
       | SELECT vec_id, round(list_cosine_similarity(
       |   CAST(embedding AS DOUBLE[]), $qv), 4) AS cosine
       | FROM assigned
       | ORDER BY cosine DESC, vec_id LIMIT $k""".stripMargin
  }

  /** DuckDB replay of SemDeDup: the annIvfFixedSql assignment pattern
    * (rounded-cosine rank, lowest-index tie), within-cluster pairs only,
    * keep-lowest-id duplicate rule. */
  private def semDedupSql(cents: Array[Array[Double]], t: Double): String = {
    val rows = cents.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ", ", "]")}::DOUBLE[])" }
      .mkString(", ")
    s"""WITH cents(ci, cv) AS (VALUES $rows),
       | scored AS (SELECT vec_id, embedding, ci,
       |     row_number() OVER (PARTITION BY vec_id ORDER BY
       |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), cv), 6) DESC,
       |       ci) AS rn
       |   FROM embeddings, cents),
       | assigned AS (SELECT vec_id, embedding, ci FROM scored WHERE rn = 1),
       | dup AS (SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b
       |   ON a.ci = b.ci AND a.vec_id < b.vec_id
       |   WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |     CAST(b.embedding AS DOUBLE[])) >= $t)
       | SELECT vec_id, ci AS cluster,
       |   (vec_id IN (SELECT vec_id FROM dup)) AS is_dup
       | FROM assigned""".stripMargin
  }

  private def annBruteSql(q: Seq[Double], k: Int): String = {
    val vec = q.mkString("[", ", ", "]")
    s"""SELECT vec_id, round(list_cosine_similarity(
       |  CAST(embedding AS DOUBLE[]), $vec), 4) AS cosine
       | FROM embeddings
       | ORDER BY cosine DESC, vec_id LIMIT $k""".stripMargin
  }

  /** Exact multi-probe LSH oracle: rebuilds the SAME deterministic ±1
    * hyperplanes as Similarity.hyperplanes and replays bucket assignment
    * (sign of the double dot product — bit-identical accumulation order),
    * the probe-set filter, and rounded-cosine ranking in SQL. */
  private def annLshSql(q: Seq[Double], k: Int, bits: Int, probeHamming: Int): String = {
    val planes = graft.ops.Similarity.hyperplanes(q.length, bits)
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      if (p.zip(q).map { case (a, b) => a * b }.sum >= 0.0) 1L << i else 0L
    }.sum
    val probes = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeHamming)
      .map(_ ^ qBucket).mkString(", ")
    val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(e, ${p.mkString("[", ", ", "]")}) >= 0.0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    val vec = q.mkString("[", ", ", "]")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       | b AS (SELECT vec_id, e, $bucketExpr AS bucket FROM v)
       |SELECT vec_id, round(list_cosine_similarity(e, $vec), 4) AS cosine
       |FROM b WHERE bucket IN ($probes)
       |ORDER BY cosine DESC, vec_id LIMIT $k""".stripMargin
  }

  private def langIdSql(): String = {
    val markers = TextAnalysis.LangMarkers.toSeq.sortBy(_._1)
    val hitExprs = markers.map { case (lang, ms) =>
      val set = ms.map(m => s"'$m'").mkString(", ")
      s"len(list_filter($tokSql, t -> t IN ($set))) AS hits_$lang"
    }.mkString(",\n  ")
    // argmax with name-order tie-break (en < de? alphabetical: de, en, fr)
    s"""WITH h AS (SELECT doc_id, greatest(len($tokSql), 1) AS total,
       |  $hitExprs FROM documents)
       | SELECT doc_id, CASE
       |   WHEN greatest(hits_de, hits_en, hits_fr) / CAST(total AS DOUBLE) < 0.05 THEN 'und'
       |   WHEN hits_de >= hits_en AND hits_de >= hits_fr
       |        AND NOT (hits_en > hits_de) AND NOT (hits_fr > hits_de) THEN
       |     CASE WHEN hits_de = -1 THEN 'x' ELSE 'de' END
       |   ELSE CASE WHEN hits_en >= hits_fr THEN 'en' ELSE 'fr' END
       | END AS lang_pred FROM h""".stripMargin
  }

  /** Mirrors TextAnalysis.qualityScore's expression tree 1:1 (same IEEE
    * op order → bit-identical doubles before the shared round(,6)). */
  private def qualityScoreSql(): String = {
    val stopSet = graft.corpus.SyntheticCorpus.Stopwords
      .map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, text, $tokSql AS toks FROM documents),
       | q AS (SELECT doc_id,
       |   len(toks) AS ntoks_i,
       |   CAST(len(toks) AS DOUBLE) AS ntoks,
       |   CAST(len(text) AS DOUBLE) AS nchars,
       |   CAST(len(list_filter(toks, x -> x IN ($stopSet))) AS DOUBLE) AS stophits,
       |   CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alphachars,
       |   CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digitchars,
       |   CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0) AS DOUBLE) AS toklensum
       |  FROM t),
       | r AS (SELECT doc_id, ntoks_i, ntoks,
       |   stophits / greatest(ntoks, 1.0) AS stop_ratio,
       |   alphachars / greatest(nchars, 1.0) AS alpha_ratio_raw,
       |   digitchars / greatest(nchars, 1.0) AS digit_ratio_raw,
       |   toklensum / greatest(ntoks, 1.0) AS mean_tok_len
       |  FROM q)
       | SELECT doc_id,
       |   CAST(ntoks_i AS BIGINT) AS n_tokens,
       |   round(stop_ratio, 6) AS stopword_ratio,
       |   round(alpha_ratio_raw, 6) AS alpha_ratio,
       |   round(least(ntoks / 100.0, 1.0) * 0.25
       |       + least(stop_ratio / 0.3, 1.0) * 0.25
       |       + alpha_ratio_raw * 0.25
       |       + (CASE WHEN mean_tok_len >= 3.0 AND mean_tok_len <= 10.0
       |               THEN 1.0 ELSE 0.5 END) * 0.15
       |       + (1.0 - digit_ratio_raw) * 0.10, 6) AS quality_score
       | FROM r""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, f, _) => n -> f }.toMap

  def oracleSql: Map[String, String] =
    registry.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
