package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-Prepper processor parity, Spark-first (SURVEY.md §2.4–2.5).
  *
  * The reference executes these row-at-a-time over `Collection<Record>`
  * (`Processor.execute`); here each processor is a declarative
  * `DataFrame => DataFrame` stage built from codegen'd Catalyst columns, so
  * filter/projection pushdown, constant folding and whole-stage codegen
  * apply across a composed pipeline for free (§4.2). Every processor
  * supports the reference's `*_when` gate: rows failing the condition pass
  * through unchanged (implemented with `when(cond, new).otherwise(old)` —
  * still a single projection, no branch in the plan).
  */
trait Stage extends (DataFrame => DataFrame) {
  def andThen(next: Stage): Stage = (df: DataFrame) => next(apply(df))
}

object Pipeline {
  /** Compose stages in order — the YAML `processor:` list analog. */
  def apply(stages: Stage*): Stage = (df: DataFrame) => stages.foldLeft(df)((d, s) => s(d))
}

object Processors {

  private def gated(df: DataFrame, col0: String, newValue: Column,
      when0: Option[Column]): DataFrame = {
    val old = if (df.columns.contains(col0)) col(col0) else lit(null)
    when0 match {
      case None => df.withColumn(col0, newValue)
      case Some(c) => df.withColumn(col0, when(c, newValue).otherwise(old))
    }
  }

  /** `add_entries` (mutate-event-processors/.../AddEntryProcessor.java:39):
    * add/overwrite a key with a literal, a format string, or an expression.
    * `overwriteIfExists=false` ≈ the reference default (keep existing). */
  final case class AddEntry(key: String, value: Column,
      overwriteIfExists: Boolean = true, addWhen: Option[Column] = None) extends Stage {
    def apply(df: DataFrame): DataFrame = {
      val v = if (!overwriteIfExists && df.columns.contains(key))
        coalesce(col(key), value) else value
      gated(df, key, v, addWhen)
    }
  }

  object AddEntry {
    /** `format: "${key}-${expr}"` flavor (AddEntryProcessor format entries,
      * JacksonEvent.formatStringInternal templating). */
    def format(key: String, template: String, overwriteIfExists: Boolean = true,
        addWhen: Option[Column] = None): AddEntry =
      AddEntry(key, FormatString.compile(template), overwriteIfExists, addWhen)

    /** `value_expression` flavor (AddEntryProcessor value_expression). */
    def expression(key: String, expr0: String, overwriteIfExists: Boolean = true,
        addWhen: Option[Column] = None): AddEntry =
      AddEntry(key, ExprCompiler.compile(expr0), overwriteIfExists, addWhen)
  }

  /** `copy_values` (CopyValueProcessor.java:29). */
  final case class CopyValue(from: String, to: String,
      overwriteIfExists: Boolean = true, copyWhen: Option[Column] = None) extends Stage {
    def apply(df: DataFrame): DataFrame = {
      val v = if (!overwriteIfExists && df.columns.contains(to))
        coalesce(col(to), col(from)) else col(from)
      gated(df, to, v, copyWhen)
    }
  }

  /** `rename_keys` (RenameKeyProcessor.java:29). */
  final case class RenameKeys(renames: (String, String)*) extends Stage {
    def apply(df: DataFrame): DataFrame =
      renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  }

  /** `delete_entries` (DeleteEntryProcessor.java:33). */
  final case class DeleteEntries(keys: String*) extends Stage {
    def apply(df: DataFrame): DataFrame = df.drop(keys: _*)
  }

  /** `select_entries` (SelectEntriesProcessor.java:26) — projection. */
  final case class SelectEntries(keys: String*) extends Stage {
    def apply(df: DataFrame): DataFrame = df.select(keys.map(col): _*)
  }

  /** `convert_type` (ConvertEntryTypeProcessor.java): cast with
    * null-on-failure semantics (Spark ANSI-off cast) and optional scale. */
  final case class ConvertType(key: String, to: String,
      scale: Option[Int] = None, convertWhen: Option[Column] = None) extends Stage {
    def apply(df: DataFrame): DataFrame = {
      val cast0 = col(key).cast(to)
      val v = scale match {
        case Some(s) if to == "double" => round(cast0, s)
        case _ => cast0
      }
      gated(df, key, v, convertWhen)
    }
  }

  /** Generic per-row conditional gate around a ROW-LOCAL stage (the
    * engine form of the reference's per-processor `*_when` options and of
    * Logstash `if` blocks): `inner` runs over all rows, but rows where
    * `cond` is false keep their original values — columns `inner`
    * modified revert, columns it added become null, columns it removed
    * are restored. Original values ride along as pure column aliases, so
    * Catalyst prunes any copy the final blend doesn't need; everything
    * stays one codegen'd projection. NOT for row-count-changing stages
    * (drop/split) — those gate natively on their own condition. */
  final case class GateWhen(cond: Column, inner: Stage) extends Stage {
    private val id = GateWhen.ids.getAndIncrement()
    def apply(df: DataFrame): DataFrame = {
      val gate = s"_gate_$id"
      val origPrefix = s"_orig_${id}_"
      val pre = df.columns.foldLeft(
        df.withColumn(gate, coalesce(cond, lit(false)))) {
        (d, c) => d.withColumn(origPrefix + c, col(c))
      }
      val out = inner(pre)
      require(out.columns.contains(gate),
        "GateWhen: inner stage dropped the gate column (not row-local)")
      val inCols = df.columns.toSet
      val outCols = out.columns
        .filterNot(c => c == gate || c.startsWith(origPrefix))
      val kept = outCols.map { c =>
        if (inCols(c)) when(col(gate), col(c)).otherwise(col(origPrefix + c)).as(c)
        else when(col(gate), col(c)).as(c)
      }
      val restored = df.columns.filterNot(outCols.contains).map { c =>
        when(!col(gate), col(origPrefix + c)).as(c)
      }
      out.select((kept ++ restored).toSeq: _*)
    }
  }
  object GateWhen {
    private val ids = new java.util.concurrent.atomic.AtomicInteger()
  }

  /** `drop_events` (drop-events-processor/.../DropEventsProcessor.java:26):
    * keep rows where dropWhen is false. */
  final case class DropEvents(dropWhen: Column) extends Stage {
    def apply(df: DataFrame): DataFrame = df.filter(!coalesce(dropWhen, lit(false)))
  }

  /** `split_event` (split-event-processor/.../SplitEventProcessor.java:35-51):
    * one row per delimited part of `field`. */
  final case class SplitEvent(field: String, delimiterRegex: String) extends Stage {
    def apply(df: DataFrame): DataFrame = {
      val others = df.columns.filterNot(_ == field).map(col)
      df.select(others :+ explode(split(col(field), delimiterRegex)).as(field): _*)
    }
  }

  /** `truncate` (truncate-processor/.../TruncateProcessor.java:53-78). */
  final case class Truncate(key: String, startAt: Int = 0,
      len: Option[Int] = None, truncateWhen: Option[Column] = None) extends Stage {
    def apply(df: DataFrame): DataFrame = {
      val v = len match {
        case Some(l) => substring(col(key), startAt + 1, l)
        case None => col(key).substr(lit(startAt + 1),
          greatest(length(col(key)) - startAt, lit(0)))
      }
      gated(df, key, v, truncateWhen)
    }
  }

  /** `obfuscate` with mask action (obfuscate-processor/.../MaskAction.java:16):
    * replace every regex match with `maskChar` × `maskLength`. */
  /** The obfuscate processor's predefined `%{NAME}` pattern library
    * (obfuscate-processor/.../CommonPattern.java:9-14) — same names, same
    * expressions, so reference configs port verbatim. */
  val ObfuscatePatterns: Map[String, String] = Map(
    "EMAIL_ADDRESS" -> "[A-Za-z0-9+_.-]+@([\\w-]+\\.)+[\\w-]{2,4}",
    "IP_ADDRESS_V4" -> "((25[0-5]|(2[0-4]|1\\d|[1-9]|)\\d)\\.?\\b){4}",
    "BASE_NUMBER" -> "[0-9]*\\.?[0-9]+",
    "CREDIT_CARD_NUMBER" -> "(\\d[ -]*?){13,16}",
    "US_PHONE_NUMBER" -> "\\+?\\d?[\\s-]?(\\(\\d{3}\\)|\\d{3})[\\s-]?\\d{3}[\\s-]?\\d{4}",
    "US_SSN_NUMBER" -> "[0-9]{3}-[0-9]{2}-[0-9]{4}")

  /** Expand a `%{NAME}` reference to its predefined expression; raw
    * regexes pass through untouched (ObfuscationProcessor.java pattern
    * resolution). Unknown names fail fast like the reference. */
  private[pipeline] def resolveObfuscatePattern(p: String): String =
    if (p.startsWith("%{") && p.endsWith("}")) {
      val name = p.substring(2, p.length - 1)
      ObfuscatePatterns.getOrElse(name,
        throw new IllegalArgumentException(s"unknown predefined obfuscate pattern: $p"))
    } else p

  final case class ObfuscateMask(key: String, pattern: String,
      maskChar: String = "*", maskLength: Int = 3) extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(key, regexp_replace(col(key),
        resolveObfuscatePattern(pattern), maskChar * maskLength))
  }

  /** `obfuscate` with one-way-hash action (OneWayHashAction.java:28):
    * SHA-512 with salt, like the reference's default. */
  final case class ObfuscateHash(key: String, salt: String = "") extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(key, sha2(concat(col(key).cast("string"), lit(salt)), 512))
  }

  /** `substitute_string` (mutate-string-processors/.../SubstituteStringProcessor.java:27). */
  final case class SubstituteString(key: String, from: String, to: String) extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(key, regexp_replace(col(key), from, to))
  }

  /** `split_string` → array column (SplitStringProcessor.java:22). */
  final case class SplitString(key: String, delimiterRegex: String) extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(key, split(col(key), delimiterRegex))
  }

  /** `trim_string` / `uppercase_string` / `lowercase_string`. */
  final case class TrimString(keys: String*) extends Stage {
    def apply(df: DataFrame): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, trim(col(k))))
  }
  final case class UppercaseString(keys: String*) extends Stage {
    def apply(df: DataFrame): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, upper(col(k))))
  }
  final case class LowercaseString(keys: String*) extends Stage {
    def apply(df: DataFrame): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, lower(col(k))))
  }

  /** `grok`-style named-regex extraction (grok-processor/.../GrokProcessor.java:63):
    * the pattern library is expanded to a plain regex once on the driver;
    * each named capture becomes a column (regexp_extract, codegen'd —
    * no per-row interpreter, no timeout thread needed). */
  final case class RegexExtract(source: String, pattern: String,
      captures: Seq[(String, Int)]) extends Stage {
    def apply(df: DataFrame): DataFrame =
      captures.foldLeft(df) { case (d, (name, group)) =>
        d.withColumn(name, regexp_extract(col(source), pattern, group))
      }
  }

  /** `dissect` positional %{field} tokenization
    * (dissect-processor/.../DissectProcessor.java:37-50 and the dissect
    * field notation): compiled on the driver into a single anchored regex
    * with one group per field occurrence.
    *
    * Modifiers: `%{}` / `%{?name}` skip; `%{+name}` appends every
    * occurrence in order joined with `appendSeparator`; `%{?key} … %{&key}`
    * indirect pairs land in a `dissect_indirect` MAP column (a row-
    * dependent column NAME cannot exist in a static schema — the map is
    * the columnar equivalent). `targetTypes` casts named results
    * (target_types option). */
  final case class Dissect(source: String, pattern: String,
      appendSeparator: String = "",
      targetTypes: Map[String, String] = Map.empty) extends Stage {
    private val fieldRe = "%\\{([^}]*)\\}".r
    def apply(df: DataFrame): DataFrame = {
      val ms = fieldRe.findAllMatchIn(pattern).toSeq
      val sb = new StringBuilder("^")
      var last = 0
      val names = ms.map { m =>
        if (m.start > last) sb.append(java.util.regex.Pattern.quote(pattern.substring(last, m.start)))
        sb.append("(.*?)")
        last = m.end
        m.group(1)
      }
      if (last < pattern.length) sb.append(java.util.regex.Pattern.quote(pattern.substring(last)))
      sb.append("$")
      // dissect is leftmost-shortest, but a trailing field consumes the rest
      val regex =
        if (pattern.endsWith("}")) sb.toString.patch(sb.lastIndexOf("(.*?)"), "(.*)", 5)
        else sb.toString
      def grp(i: Int): Column = regexp_extract(col(source), regex, i + 1)
      val indexed = names.zipWithIndex

      // plain fields: last occurrence wins (reference overwrite semantics)
      val plain = indexed.filter { case (n, _) =>
        n.nonEmpty && !"?+&".contains(n.charAt(0))
      }.groupBy(_._1).map { case (n, occ) => n -> grp(occ.last._2) }

      // %{+name}: all occurrences joined in order
      val appended = indexed.filter(_._1.startsWith("+"))
        .groupBy(_._1.substring(1))
        .map { case (n, occ) =>
          n -> concat_ws(appendSeparator, occ.map(o => grp(o._2)): _*)
        }

      // %{?k}/%{&k} pairs → one map column
      val keys = indexed.collect { case (n, i) if n.startsWith("?") =>
        n.substring(1) -> i }.toMap
      val indirect = indexed.collect { case (n, i) if n.startsWith("&") &&
          keys.contains(n.substring(1)) =>
        (grp(keys(n.substring(1))), grp(i))
      }

      val withFields = (plain ++ appended).foldLeft(df) { case (d, (n, c)) =>
        val casted = targetTypes.get(n).map(c.cast).getOrElse(c)
        d.withColumn(n, casted)
      }
      if (indirect.isEmpty) withFields
      else withFields.withColumn("dissect_indirect",
        map_from_arrays(array(indirect.map(_._1): _*),
          array(indirect.map(_._2): _*)))
    }
  }

  /** `date` (date-processor/.../DateProcessor.java:40,
    * DateProcessorConfig.java:46-53): first-match-wins multi-pattern parse
    * → formatted string at `destination`.
    *
    * Full option surface:
    *  - `patterns` may mix DateTimeFormatter patterns with the epoch
    *    pseudo-patterns `epoch_second` / `epoch_milli` / `epoch_micro` /
    *    `epoch_nano` (reference extractKeyAndFormatters);
    *  - `sourceTimezone` supplies the zone for patterns that carry none
    *    (reference getSourceFormatter's `.withZone(sourceZoneId)` — a
    *    pattern with its own zone field wins, like DateTimeFormatter);
    *  - `outputFormat` is a pattern or an epoch pseudo-pattern
    *    (getEpochFormatOutput);
    *  - `destinationTimezone` shifts the formatted wall time;
    *  - `locale` ≠ English routes through a JVM DateTimeFormatter kernel
    *    (documented UDF seam — Spark's datetime builtins are Locale.US);
    *  - `fromTimeReceived` formats `_meta.time_received` instead of
    *    parsing (getDateTimeFromTimeReceived);
    *  - `dateWhen` gates rows (reference date_when).
    *
    * Missing-field defaults: Spark's `to_timestamp` defaults a missing
    * date to 1970-01-01 — deterministic, unlike the reference's
    * `LocalDate.now()` defaulting, which is a documented divergence (a
    * batch engine must not produce run-dependent output).
    */
  final case class DateParse(source: String, patterns: Seq[String],
      destination: String = "@timestamp",
      sourceTimezone: String = "UTC",
      destinationTimezone: String = "UTC",
      locale: String = "ENGLISH",
      outputFormat: String = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
      fromTimeReceived: Boolean = false,
      dateWhen: Option[Column] = None) extends Stage {

    private def hasZoneField(p: String): Boolean =
      p.exists("XxZzVO".contains(_))

    private def parseOne(p: String): Column = p match {
      case "epoch_second" => timestamp_seconds(col(source).cast("long"))
      case "epoch_milli" => timestamp_millis(col(source).cast("long"))
      case "epoch_micro" => timestamp_micros(col(source).cast("long"))
      // integral DIV, not `/`: double division loses microseconds for
      // nano values beyond 2^53
      case "epoch_nano" => timestamp_micros(
        call_function("div", col(source).cast("long"), lit(1000L)))
      case pat if isEnglish =>
        val t = to_timestamp(col(source), pat)
        if (hasZoneField(pat) || sourceTimezone == "UTC") t
        else to_utc_timestamp(t, sourceTimezone)
      case pat => localeParseUdf(pat)(col(source))
    }

    private def isEnglish: Boolean =
      Seq("ENGLISH", "US", "ROOT", "en", "en-US", "en_US").contains(locale)

    /** JVM kernel for non-English locales — the one case Catalyst's
      * Locale.US datetime builtins cannot express. */
    private def localeParseUdf(pat: String) = {
      val (loc, srcTz) = (locale, sourceTimezone) // capture primitives
      udf { (s: String) =>
        if (s == null) null
        else try {
          val b = new java.time.format.DateTimeFormatterBuilder()
            .appendPattern(pat)
            .parseDefaulting(java.time.temporal.ChronoField.YEAR_OF_ERA, 1970)
            .parseDefaulting(java.time.temporal.ChronoField.MONTH_OF_YEAR, 1)
            .parseDefaulting(java.time.temporal.ChronoField.DAY_OF_MONTH, 1)
            .parseDefaulting(java.time.temporal.ChronoField.HOUR_OF_DAY, 0)
            .parseDefaulting(java.time.temporal.ChronoField.MINUTE_OF_HOUR, 0)
            .parseDefaulting(java.time.temporal.ChronoField.SECOND_OF_MINUTE, 0)
            .toFormatter(java.util.Locale.forLanguageTag(loc))
            .withZone(java.time.ZoneId.of(srcTz))
          java.sql.Timestamp.from(
            java.time.ZonedDateTime.parse(s, b).toInstant)
        } catch { case _: Exception => null }
      }
    }

    def apply(df: DataFrame): DataFrame = {
      val parsed: Column =
        if (fromTimeReceived) col("_meta").getField("time_received")
        else coalesce(patterns.map(parseOne): _*)
      val out: Column = outputFormat match {
        case "epoch_second" => unix_seconds(parsed).cast("string")
        case "epoch_milli" => unix_millis(parsed).cast("string")
        case "epoch_micro" => unix_micros(parsed).cast("string")
        case "epoch_nano" => (unix_micros(parsed) * 1000L).cast("string")
        case pat if destinationTimezone == "UTC" => date_format(parsed, pat)
        case pat =>
          // non-UTC offsets in the output pattern need the JVM formatter
          // (from_utc_timestamp shifts wall time but formats the session
          // zone's offset — wrong for XXX/Z fields)
          val tz = destinationTimezone
          val f = udf { (t: java.sql.Timestamp) =>
            if (t == null) null
            else java.time.format.DateTimeFormatter.ofPattern(pat)
              .withZone(java.time.ZoneId.of(tz)).format(t.toInstant)
          }
          f(parsed)
      }
      gated(df, destination, out, dateWhen)
    }
  }

  /** `csv` processor (csv-processor/.../CsvProcessor.java): parse a CSV
    * string field into named columns via from_csv. */
  final case class CsvParse(source: String, columnNames: Seq[String],
      delimiter: String = ",") extends Stage {
    def apply(df: DataFrame): DataFrame = {
      val schema = columnNames.map(c => s"`$c` STRING").mkString(", ")
      val parsed = from_csv(col(source), org.apache.spark.sql.types.StructType.fromDDL(schema),
        Map("sep" -> delimiter))
      columnNames.foldLeft(df.withColumn("_csv", parsed)) { (d, c) =>
        d.withColumn(c, col("_csv").getField(c))
      }.drop("_csv")
    }
  }

  /** `key_value` (key-value-processor/.../KeyValueProcessor.java:43), simple
    * path: str_to_map with configurable splitters. */
  final case class KeyValue(source: String, destination: String = "kv",
      fieldSplit: String = "&", valueSplit: String = "=") extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destination, str_to_map(col(source), lit(fieldSplit), lit(valueSplit)))
  }

  /** `key_value`, full option surface (key-value-processor/.../
    * KeyValueProcessor.java:421-491,570-640 + KeyValueProcessorConfig.java:
    * 49-273). A JVM scanner kernel (UDF seam — bracket-aware splitting has
    * no Column form): `value_grouping` keeps quoted/bracketed/url runs
    * unsplit; include/exclude/default keys, transform_key, whitespace
    * strict, remove_brackets, delete regexes, key_prefix,
    * skip_duplicate_values, drop_keys_with_no_value follow the reference's
    * executeConfigs order. Output is `map<string, array<string>>`
    * (duplicate keys accumulate — the reference's list promotion, made
    * schema-static). `recursive=true` is [[KeyValueRecursive]].
    */
  final case class KeyValueAdvanced(
      source: String, destination: String = "kv",
      fieldSplitCharacters: String = "&",
      keyValueDelimiterCharacters: String = "=",
      valueGrouping: Boolean = false,
      includeKeys: Seq[String] = Nil,
      excludeKeys: Seq[String] = Nil,
      defaultValues: Map[String, String] = Map.empty,
      transformKey: String = "none",
      whitespace: String = "lenient",
      removeBrackets: Boolean = false,
      deleteKeyRegex: String = "",
      deleteValueRegex: String = "",
      keyPrefix: String = "",
      skipDuplicateValues: Boolean = false,
      dropKeysWithNoValue: Boolean = false) extends Stage {

    def apply(df: DataFrame): DataFrame = {
      val self = this
      val f = udf { (s: String) =>
        if (s == null) null
        else KeyValueKernel.parseToMap(s, self)
      }
      df.withColumn(destination, f(col(source)))
    }
  }

  /** `key_value` with `recursive: true` (KeyValueProcessor.createRecursedMap):
    * bracketed values are parsed as nested key-value groups. The nested
    * result is emitted as a JSON STRING column (consume with `from_json`
    * at a known schema) — a columnar engine needs a static type where the
    * reference returns arbitrarily nested maps. */
  final case class KeyValueRecursive(
      source: String, destination: String = "kv",
      fieldSplitCharacters: String = "&",
      keyValueDelimiterCharacters: String = "=") extends Stage {
    def apply(df: DataFrame): DataFrame = {
      val (fs, kv) = (fieldSplitCharacters, keyValueDelimiterCharacters)
      val f = udf { (s: String) =>
        if (s == null) null else KeyValueKernel.parseRecursiveJson(s, fs, kv)
      }
      df.withColumn(destination, f(col(source)))
    }
  }

  /** `parse_json` (parse-json-processor/.../ParseJsonProcessor.java:30). */
  final case class ParseJson(source: String, schemaDdl: String,
      destination: String = "parsed") extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destination,
        from_json(col(source), org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)))
  }

  /** `parse_ion` (parse-json-processor/.../ParseIonProcessor.java, which
    * delegates to ion-java — absent offline): Ion TEXT events convert to
    * JSON via the [[IonText]] subset kernel (annotations stripped,
    * symbols/timestamps → strings, typed nulls/nan/inf → null, sexps →
    * arrays, blobs → strings), then parse with the same `from_json` shape
    * as parse_json. */
  final case class ParseIon(source: String, schemaDdl: String,
      destination: String = "parsed") extends Stage {
    private val conv = udf((s: String) => IonText.toJson(s))
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destination,
        from_json(conv(col(source)),
          org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)))
  }

  /** `parse_ion` over the BINARY wire form (the codec layer's half —
    * reference ion-java reads both forms transparently): binary Ion
    * payloads convert to JSON via the [[IonBinary]] own kernel (local
    * symbol tables honored, shared-table imports resolved against
    * `catalog`, annotations stripped, same JSON conventions as
    * [[IonText]]), then parse with the same `from_json` shape. The
    * catalog is a small driver-side map captured into the kernel closure
    * — the analog of ion-java's SimpleCatalog. */
  final case class ParseIonBinary(source: String, schemaDdl: String,
      destination: String = "parsed",
      catalog: Map[String, IonBinary.SharedTable] = Map.empty) extends Stage {
    private val conv = udf((b: Array[Byte]) => IonBinary.toJson(b, catalog))
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destination,
        from_json(conv(col(source)),
          org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)))
  }

  /** `parse_xml` (parse-json-processor family): parse an XML string field
    * into a struct at `destination` (Spark 4 native from_xml — codegen'd,
    * no external parser). */
  final case class ParseXml(source: String, schemaDdl: String,
      destination: String = "parsed") extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destination,
        from_xml(col(source),
          org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)))
  }

  /** `write_json` (write-json-processor/.../WriteJsonProcessor.java:27). */
  final case class WriteJson(source: String, destination: String) extends Stage {
    def apply(df: DataFrame): DataFrame = df.withColumn(destination, to_json(col(source)))
  }

  /** `translate` (translate-processor/.../TranslateProcessor.java:41):
    * dictionary lookup as a broadcast hash join — the Spark-native form of
    * the reference's in-memory map, scales to dimension tables that no
    * longer fit one heap. */
  final case class Translate(source: String, target: String,
      mapping: Seq[(String, String)], default: Option[String] = None) extends Stage {
    def apply(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val dim = mapping.toDF("_tk", target)
      val joined = df.join(broadcast(dim), df(source) === dim("_tk"), "left").drop("_tk")
      default match {
        case Some(d) => joined.withColumn(target, coalesce(col(target), lit(d)))
        case None => joined
      }
    }
  }

  /** `translate` numeric-range flavor (TargetsParameterConfig.java:24-54
    * `"1,10": value`): when-chain over [lo, hi] ranges. */
  final case class TranslateRange(source: String, target: String,
      ranges: Seq[(Double, Double, String)], default: Option[String] = None) extends Stage {
    def apply(df: DataFrame): DataFrame = {
      val chain = ranges.foldLeft[Column](lit(null)) { case (acc, (lo, hi, v)) =>
        when(col(source).between(lo, hi) && acc.isNull, lit(v)).otherwise(acc)
      }
      df.withColumn(target, default.map(d => coalesce(chain, lit(d))).getOrElse(chain))
    }
  }

  /** `translate` regex flavor (translate-processor/.../
    * RegexParameterConfiguration.java:13-23): first matching pattern wins
    * in config order; `exact=true` (reference default) anchors the
    * pattern to the whole value, `false` is an unanchored find. One
    * codegen'd when-chain — patterns are a config-sized dimension, not
    * data. */
  final case class TranslateRegex(source: String, target: String,
      patterns: Seq[(String, String)], exact: Boolean = true,
      default: Option[String] = None) extends Stage {
    def apply(df: DataFrame): DataFrame = {
      val chain = patterns.foldRight[Column](
        default.map(lit).getOrElse(lit(null).cast("string"))) {
        case ((p, v), rest) =>
          val re = if (exact) s"\\A(?:$p)\\z" else p
          when(col(source).rlike(re), lit(v)).otherwise(rest)
      }
      df.withColumn(target, chain)
    }
  }

  /** `detect_format` (detect-format-processor/.../DetectFormatProcessor.java:24). */
  final case class DetectFormat(source: String, destination: String = "format") extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destination,
        when(col(source).rlike("^\\s*[\\[{]"), "json")
          .when(col(source).rlike("^[^,\\n]+(,[^,\\n]*)+$"), "csv")
          .when(col(source).rlike("^[^=\\s]+=[^=]*([&;][^=\\s]+=[^=]*)*$"), "kv")
          .otherwise("unknown"))
  }

  /** `flatten` (flatten-processor/.../FlattenProcessor.java:28): hoist every
    * leaf of a struct column to a top-level `a/b` column.
    *
    * Arrays-of-structs flatten with the reference's `remove_list_indices`
    * semantics: `a: array<struct<b>>` → column `a/b: array<leaf>`
    * (`transform(...)`, codegen'd) — per-index columns (`a/0/b`) cannot
    * exist in a static schema. `excludeKeys` leaves the named sub-fields
    * nested (exclude_keys option). */
  final case class Flatten(source: String, sep: String = "/",
      excludeKeys: Seq[String] = Nil) extends Stage {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    def apply(df: DataFrame): DataFrame = {
      val st = df.schema(source).dataType.asInstanceOf[StructType]
      def leaves(prefix: Seq[String], t: StructType): Seq[(Seq[String], Boolean)] =
        t.fields.toSeq.flatMap { f =>
          if (prefix.isEmpty && excludeKeys.contains(f.name))
            Seq((Seq(f.name), false)) // kept as-is, not descended
          else f.dataType match {
            case s: StructType => leaves(prefix :+ f.name, s)
            case ArrayType(s: StructType, _) =>
              // one hop of list flattening: a/b = transform(a, _.b)
              s.fields.toSeq.map(inner => (prefix ++ Seq(f.name, inner.name), true))
            case _ => Seq((prefix :+ f.name, false))
          }
        }
      leaves(Seq.empty, st).foldLeft(df) { case (d, (path, viaArray)) =>
        val c =
          if (!viaArray) path.foldLeft(col(source))((c0, f) => c0.getField(f))
          else {
            val arrPath = path.dropRight(1)
            val leaf = path.last
            val arr = arrPath.foldLeft(col(source))((c0, f) => c0.getField(f))
            transform(arr, x => x.getField(leaf))
          }
        d.withColumn((source +: path).mkString(sep), c)
      }.drop(source)
    }
  }

  /** `list_to_map` (ListToMapProcessor.java:29): array<struct<k,v>> → map. */
  final case class ListToMap(source: String, keyField: String, valueField: String,
      destination: String) extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destination, map_from_entries(
        transform(col(source), e => struct(e.getField(keyField), e.getField(valueField)))))
  }

  /** `map_to_list` (MapToListProcessor.java:33): map → array<struct<key,value>>. */
  final case class MapToList(source: String, destination: String) extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destination,
        transform(map_entries(col(source)), e =>
          struct(e.getField("key").as("key"), e.getField("value").as("value"))))
  }

  /** `filter_list` (FilterListProcessor.java:35): keep array elements
    * matching a per-element predicate (higher-order filter). */
  final case class FilterList(source: String, destination: String,
      predicate: Column => Column) extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(destination, filter(col(source), predicate))
  }

  /** `wrap_entries` (WrapEntriesProcessor.java:31): nest keys in a struct. */
  final case class WrapEntries(keys: Seq[String], wrapper: String) extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(wrapper, struct(keys.map(col): _*)).drop(keys: _*)
  }

  /** `decompress` (decompress-processor/.../DecompressProcessor.java:32):
    * gunzip a binary column. UDF — java.util.zip has no Column form. */
  final case class Decompress(source: String, destination: String) extends Stage {
    private val gunzip = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else try {
        val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var r = in.read(buf)
        while (r > 0) { out.write(buf, 0, r); r = in.read(buf) }
        new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } catch { case _: Exception => null }
    }
    def apply(df: DataFrame): DataFrame = df.withColumn(destination, gunzip(col(source)))
  }
}
