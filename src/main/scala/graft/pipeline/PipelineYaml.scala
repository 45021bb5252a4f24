package graft.pipeline

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Data-Prepper pipeline-definition compiler: the YAML a reference user
  * already runs (`pipelines.yaml`) compiles to a Spark DataFrame DAG.
  *
  * Reference: `data-prepper-pipeline-parser/.../PipelinesDataflowModelParser.java`
  * (YAML → pipeline model), `data-prepper-core/.../PipelineParser` semantics:
  * named pipelines with `source` / `processor` / `route` / `sink`, chained by
  * `pipeline`-typed sinks/sources (`examples/config/example-pipelines.yaml`),
  * sinks filtered by route names (`valid_multiple_sinks_with_routes.yml`;
  * a sink with no `routes` receives every event).
  *
  * Spark-first re-expression: each pipeline is a lazy DataFrame (source →
  * folded [[Stage]] processors); routes compile once to [[ExprCompiler]]
  * Columns; a `pipeline` sink is just an edge in a topologically-evaluated
  * DAG, and multiple upstream contributions union (`unionByName`). Nothing
  * materializes until a terminal sink's action runs, so Catalyst optimizes
  * ACROSS pipeline boundaries — the reference moves every event through
  * an in-memory blocking buffer per pipeline; here a `grok` in a child
  * pipeline can push its filter into the parent's parquet scan.
  *
  * Batch scoping (documented, consistent with COVERAGE.md): push-style
  * network sources and connector-jar sinks are not constructible offline;
  * `in_memory` and unknown-source pipelines can be fed via the `inputs`
  * map. Parsers that the reference types dynamically (`parse_json` family)
  * take a `schema` DDL option — a columnar engine needs static types.
  */
object PipelineYaml {

  // ------------------------------------------------------------- model

  final case class PluginDef(name: String, options: Map[String, Any])

  final case class SinkDef(plugin: PluginDef, routes: Seq[String])

  final case class PipelineDef(
      name: String,
      source: PluginDef,
      processors: Seq[PluginDef],
      routes: Seq[(String, String)],
      sinks: Seq[SinkDef])

  /** One terminal (non-`pipeline`) sink's routed DataFrame. */
  final case class SinkOutput(pipeline: String, plugin: PluginDef,
      routes: Seq[String], df: DataFrame)

  // ------------------------------------------------------------- parse

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case other => other
  }

  /** YAML text → ordered pipeline definitions. Accepts the reference's
    * full top-level shape; engine-runtime keys (`workers`, `delay`,
    * `buffer`) parse and are ignored — they tune the reference's thread
    * pool / blocking queue, which Spark's scheduler replaces. */
  def parse(yamlText: String): Seq[PipelineDef] = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val root = toScala(mapper.readValue(yamlText, classOf[java.util.LinkedHashMap[String, Any]]))
      .asInstanceOf[Map[String, Any]]
    // LinkedHashMap keeps YAML order, but `toMap` above loses it; re-read
    // key order from the raw java map for deterministic DAG listing.
    val order = mapper.readValue(yamlText, classOf[java.util.LinkedHashMap[String, Any]])
      .keySet().asScala.toSeq
    parsePlain(order.map(name => name -> root(name)))
  }

  /** Already-parsed (ordered) pipelines → definitions — the same back half
    * as [[parse]], also fed by the transform front-end
    * ([[Transforms.compile]]) whose rewritten config is a plain tree. */
  def parsePlain(pipelines: Seq[(String, Any)]): Seq[PipelineDef] = {
    pipelines.map { case (name, raw) =>
      val m = raw.asInstanceOf[Map[String, Any]]
      val source = m.get("source") match {
        case Some(s: Map[String, Any] @unchecked) if s.nonEmpty =>
          val (pn, po) = s.head
          PluginDef(pn, asOptions(po))
        case _ => throw new IllegalArgumentException(s"pipeline $name: missing source")
      }
      val processors = m.get("processor").orElse(m.get("prepper")) match {
        case Some(l: Seq[Any] @unchecked) => l.map(onePlugin(s"pipeline $name processor"))
        case _ => Seq.empty
      }
      val routes = m.get("route").orElse(m.get("routes")) match {
        case Some(l: Seq[Any] @unchecked) => l.flatMap {
          case rm: Map[String, Any] @unchecked =>
            rm.map { case (rn, cond) => rn -> cond.toString }
          case other => throw new IllegalArgumentException(
            s"pipeline $name: route entry must be name: condition, got $other")
        }
        case _ => Seq.empty
      }
      val sinks = m.get("sink") match {
        case Some(l: Seq[Any] @unchecked) => l.map { s =>
          val p = onePlugin(s"pipeline $name sink")(s)
          val rs = p.options.get("routes").orElse(p.options.get("route")) match {
            case Some(xs: Seq[Any] @unchecked) => xs.map(_.toString)
            case _ => Seq.empty
          }
          SinkDef(PluginDef(p.name, p.options - "routes" - "route"), rs)
        }
        case _ => Seq.empty
      }
      PipelineDef(name, source, processors, routes, sinks)
    }
  }

  private def onePlugin(ctx: String)(v: Any): PluginDef = v match {
    case m: Map[String, Any] @unchecked if m.size == 1 =>
      val (pn, po) = m.head
      PluginDef(pn, asOptions(po))
    case s: String => PluginDef(s, Map.empty)
    case other => throw new IllegalArgumentException(s"$ctx: expected one-key plugin map, got $other")
  }

  private def asOptions(v: Any): Map[String, Any] = v match {
    case m: Map[String, Any] @unchecked => m
    case null => Map.empty
    case _ => Map.empty
  }

  // ------------------------------------------------- option accessors

  private def optStr(m: Map[String, Any], k: String): Option[String] =
    m.get(k).filter(_ != null).map(_.toString)
  private def reqStr(m: Map[String, Any], k: String, plugin: String): String =
    optStr(m, k).getOrElse(
      throw new IllegalArgumentException(s"$plugin: missing required option '$k'"))
  private def optInt(m: Map[String, Any], k: String): Option[Int] =
    m.get(k).collect { case n: Number => n.intValue() }
  private def optBool(m: Map[String, Any], k: String, default: Boolean): Boolean =
    m.get(k).collect { case b: Boolean => b }.getOrElse(default)
  private def strList(m: Map[String, Any], k: String): Seq[String] = m.get(k) match {
    case Some(l: Seq[Any] @unchecked) => l.map(_.toString)
    case Some(s: String) => Seq(s)
    case _ => Seq.empty
  }
  private def mapList(m: Map[String, Any], k: String): Seq[Map[String, Any]] = m.get(k) match {
    case Some(l: Seq[Any] @unchecked) => l.collect { case e: Map[String, Any] @unchecked => e }
    case _ => Seq.empty
  }
  private def optMap(m: Map[String, Any], k: String): Map[String, Any] = m.get(k) match {
    case Some(x: Map[String, Any] @unchecked) => x
    case _ => Map.empty
  }
  private def whenOpt(m: Map[String, Any], k: String): Option[Column] =
    optStr(m, k).map(ExprCompiler.compile)

  // ------------------------------------------------- processor registry

  import Processors._

  /** One reference plugin name + options → one [[Stage]]. The option
    * names are the reference's (snake_case config fields from each
    * plugin's `*Config.java`). */
  def compileProcessor(p: PluginDef): Stage = {
    // reserved converter-internal gate: wrap any row-local processor in a
    // per-row conditional (LogstashConf `if` blocks compile to this when
    // the target plugin has no native `*_when` option)
    p.options.get("__gate_when") match {
      case Some(expr) => return GateWhen(ExprCompiler.compile(expr.toString),
        compileProcessor(PluginDef(p.name, p.options - "__gate_when")))
      case None =>
    }
    val o = p.options
    p.name match {
      case "grok" =>
        val m = optMap(o, "match")
        require(m.nonEmpty, "grok: 'match' is required")
        val (field, pats0) = m.head
        val pats = pats0 match {
          case l: Seq[Any] @unchecked => l.map(_.toString)
          case s => Seq(s.toString)
        }
        val defs = optMap(o, "pattern_definitions").map { case (k, v) => k -> v.toString }
        Grok(field, pats, defs,
          keepEmptyCaptures = optBool(o, "keep_empty_captures", false),
          tagsOnMatchFailure = strList(o, "tags_on_match_failure"),
          targetKey = optStr(o, "target_key"))

      case "date" =>
        val entry = mapList(o, "match").headOption.getOrElse(
          throw new IllegalArgumentException("date: 'match' is required"))
        DateParse(
          source = reqStr(entry, "key", "date.match"),
          patterns = strList(entry, "patterns"),
          destination = optStr(o, "destination").getOrElse("@timestamp"),
          sourceTimezone = optStr(o, "source_timezone").getOrElse("UTC"),
          destinationTimezone = optStr(o, "destination_timezone").getOrElse("UTC"),
          locale = optStr(o, "locale").getOrElse("ENGLISH"),
          outputFormat = optStr(o, "output_format").getOrElse("yyyy-MM-dd'T'HH:mm:ss.SSSXXX"),
          dateWhen = whenOpt(o, "date_when"))

      case "csv" =>
        CsvParse(optStr(o, "source").getOrElse("message"),
          strList(o, "column_names"),
          optStr(o, "delimiter").getOrElse(","))

      case "key_value" =>
        val source = optStr(o, "source").getOrElse("message")
        val dest = optStr(o, "destination").getOrElse("parsed_message")
        val fieldSplit = optStr(o, "field_split_characters")
          .orElse(optStr(o, "field_delimiter_regex")).getOrElse("&")
        val valueSplit = optStr(o, "value_split_characters")
          .orElse(optStr(o, "key_value_delimiter_regex")).getOrElse("=")
        val advanced = o.contains("value_grouping") || o.contains("include_keys") ||
          o.contains("exclude_keys") || o.contains("default_values") ||
          o.contains("transform_key") || o.contains("whitespace") ||
          o.contains("remove_brackets") || o.contains("key_prefix") ||
          o.contains("skip_duplicate_values") || o.contains("drop_keys_with_no_value")
        if (optBool(o, "recursive", false))
          KeyValueRecursive(source, dest, fieldSplit, valueSplit)
        else if (advanced)
          KeyValueAdvanced(source, dest, fieldSplit, valueSplit,
            valueGrouping = optBool(o, "value_grouping", false),
            includeKeys = strList(o, "include_keys"),
            excludeKeys = strList(o, "exclude_keys"),
            defaultValues = optMap(o, "default_values").map { case (k, v) => k -> v.toString },
            transformKey = optStr(o, "transform_key").getOrElse("none"),
            whitespace = optStr(o, "whitespace").getOrElse("lenient"),
            removeBrackets = optBool(o, "remove_brackets", false),
            deleteKeyRegex = optStr(o, "delete_key_regex").getOrElse(""),
            deleteValueRegex = optStr(o, "delete_value_regex").getOrElse(""),
            keyPrefix = optStr(o, "key_prefix").getOrElse(""),
            skipDuplicateValues = optBool(o, "skip_duplicate_values", false),
            dropKeysWithNoValue = optBool(o, "drop_keys_with_no_value", false))
        else KeyValue(source, dest, fieldSplit, valueSplit)

      case "parse_json" =>
        ParseJson(optStr(o, "source").getOrElse("message"),
          reqStr(o, "schema", "parse_json (static-schema engine)"),
          optStr(o, "destination").getOrElse("parsed"))
      case "parse_ion" =>
        ParseIon(optStr(o, "source").getOrElse("message"),
          reqStr(o, "schema", "parse_ion (static-schema engine)"),
          optStr(o, "destination").getOrElse("parsed"))
      case "parse_xml" =>
        ParseXml(optStr(o, "source").getOrElse("message"),
          reqStr(o, "schema", "parse_xml (static-schema engine)"),
          optStr(o, "destination").getOrElse("parsed"))
      case "write_json" =>
        WriteJson(reqStr(o, "source", "write_json"),
          optStr(o, "target").getOrElse(reqStr(o, "source", "write_json")))

      case "add_entries" =>
        stages(mapList(o, "entries").map { e =>
          val key = reqStr(e, "key", "add_entries.entries")
          val overwrite = optBool(e, "overwrite_if_key_exists", false)
          val w = whenOpt(e, "add_when")
          (optStr(e, "format"), optStr(e, "value_expression")) match {
            case (Some(f), _) => AddEntry.format(key, f, overwrite, w)
            case (_, Some(ex)) => AddEntry.expression(key, ex, overwrite, w)
            case _ => AddEntry(key, lit(e.getOrElse("value", null)), overwrite, w)
          }
        })
      case "copy_values" =>
        stages(mapList(o, "entries").map { e =>
          CopyValue(reqStr(e, "from_key", "copy_values.entries"),
            reqStr(e, "to_key", "copy_values.entries"),
            optBool(e, "overwrite_if_to_key_exists", false),
            whenOpt(e, "copy_when"))
        })
      case "rename_keys" =>
        RenameKeys(mapList(o, "entries").map(e =>
          reqStr(e, "from_key", "rename_keys") -> reqStr(e, "to_key", "rename_keys")): _*)
      case "delete_entries" => DeleteEntries(strList(o, "with_keys"): _*)
      case "select_entries" => SelectEntries(strList(o, "include_keys"): _*)
      // reference name is `convert_type`, `convert_entry_type` deprecated
      // (ConvertEntryTypeProcessor.java:40) — both accepted
      case "convert_type" | "convert_entry_type" =>
        val keys = strList(o, "keys") ++ optStr(o, "key")
        val to = optStr(o, "type").getOrElse("integer") match {
          case "integer" => "int" case t => t
        }
        stages(keys.map(k => ConvertType(k, to, optInt(o, "scale"), whenOpt(o, "convert_when"))))
      case "drop_events" =>
        DropEvents(ExprCompiler.compile(reqStr(o, "drop_when", "drop_events")))
      case "split_event" =>
        SplitEvent(reqStr(o, "field", "split_event"),
          optStr(o, "delimiter_regex").getOrElse(
            java.util.regex.Pattern.quote(optStr(o, "delimiter").getOrElse(" "))))
      case "truncate" =>
        stages(mapList(o, "entries").flatMap { e =>
          strList(e, "source_keys").map(k =>
            Truncate(k, optInt(e, "start_at").getOrElse(0), optInt(e, "length"),
              whenOpt(e, "truncate_when")))
        })
      case "obfuscate" =>
        val source = reqStr(o, "source", "obfuscate")
        val action = optMap(o, "action")
        val pattern = strList(o, "patterns").headOption.getOrElse(".+")
        action.get("hash") match {
          case Some(h: Map[String, Any] @unchecked) =>
            ObfuscateHash(source, optStr(h, "salt").getOrElse(""))
          case _ =>
            val mask = optMap(action, "mask")
            ObfuscateMask(source, pattern,
              optStr(mask, "mask_character").getOrElse("*"),
              optInt(mask, "mask_character_length").getOrElse(3))
        }
      case "substitute_string" =>
        stages(mapList(o, "entries").map(e =>
          SubstituteString(reqStr(e, "source", "substitute_string"),
            reqStr(e, "from", "substitute_string"), optStr(e, "to").getOrElse(""))))
      case "split_string" =>
        stages(mapList(o, "entries").map { e =>
          SplitString(reqStr(e, "source", "split_string"),
            optStr(e, "delimiter_regex").getOrElse(
              java.util.regex.Pattern.quote(optStr(e, "delimiter").getOrElse(","))))
        })
      case "trim_string" => TrimString(strList(o, "with_keys"): _*)
      case "uppercase_string" => UppercaseString(strList(o, "with_keys"): _*)
      case "lowercase_string" => LowercaseString(strList(o, "with_keys"): _*)
      case "string_converter" =>
        val key = optStr(o, "source").getOrElse("message")
        if (optBool(o, "upper_case", true)) UppercaseString(key) else LowercaseString(key)
      case "translate" =>
        stages(mapList(o, "mappings").flatMap { mp =>
          val source = reqStr(mp, "source", "translate.mappings")
          mapList(mp, "targets").map { t =>
            Translate(source, reqStr(t, "target", "translate.targets"),
              optMap(t, "map").map { case (k, v) => k -> v.toString }.toSeq.sortBy(_._1),
              optStr(t, "default"))
          }
        })
      case "user_agent" =>
        UserAgent(reqStr(o, "source", "user_agent"),
          optStr(o, "target").getOrElse("user_agent"))
      case "dissect" =>
        val m = optMap(o, "map")
        require(m.nonEmpty, "dissect: 'map' is required")
        stages(m.toSeq.map { case (field, pat) =>
          Dissect(field, pat.toString,
            optStr(o, "append_separator").getOrElse(""),
            optMap(o, "target_types").map { case (k, v) => k -> v.toString })
        })
      case "flatten" =>
        Flatten(reqStr(o, "source", "flatten"),
          excludeKeys = strList(o, "exclude_keys"))
      case "list_to_map" =>
        ListToMap(reqStr(o, "source", "list_to_map"),
          reqStr(o, "key", "list_to_map"),
          optStr(o, "value_key").getOrElse("value"),
          optStr(o, "target").getOrElse(reqStr(o, "source", "list_to_map")))
      case "map_to_list" =>
        MapToList(reqStr(o, "source", "map_to_list"),
          optStr(o, "target").getOrElse(reqStr(o, "source", "map_to_list")))
      case "decompress" =>
        stages(strList(o, "keys").map(k => Decompress(k, k)))
      case "detect_format" =>
        DetectFormat(optStr(o, "source").getOrElse("message"),
          optStr(o, "destination").getOrElse("format"))

      // ---- stateful processors: the reference hash-routes events to a
      // peer and aggregates in wall-clock windows per group; here the
      // group key IS the shuffle key and windows are event time, so two
      // batch-only options name what the reference gets implicitly from
      // arrival: `time_key` (event-time column; reference: wall clock)
      // and `order_key` (deterministic event order; reference: arrival).
      case "aggregate" =>
        val keys = strList(o, "identification_keys")
        require(keys.nonEmpty, "aggregate: 'identification_keys' is required")
        val action = optMap(o, "action")
        require(action.size == 1, "aggregate: exactly one 'action' plugin is required")
        val (an, ao0) = action.head
        val ao = asOptions(ao0)
        val timeKey = optStr(o, "time_key").getOrElse("ts")
        val orderKey = optStr(o, "order_key").getOrElse(timeKey)
        val windowDur = durationSeconds(optStr(o, "group_duration").getOrElse("180s"))
        def nonKeyFields(df: DataFrame): Seq[String] =
          df.columns.filterNot(c => keys.contains(c) || c == orderKey).toSeq
        an match {
          case "count" =>
            // reference CountAggregateActionConfig.uniqueKeys is List<String>;
            // strList accepts both a YAML list and a bare scalar (optStr
            // would stringify a list into one garbage column name)
            val uniques = strList(ao, "unique_keys")
            if (uniques.nonEmpty)
              (df: DataFrame) => Aggregates.countDistinctAction(df, keys, uniques, approx = false)
            else
              (df: DataFrame) => Aggregates.countAction(df, keys, timeKey, s"$windowDur seconds")
          case "histogram" =>
            val valueKey = reqStr(ao, "key", "aggregate.histogram")
            val bounds = ao.get("buckets") match {
              case Some(l: Seq[Any] @unchecked) =>
                l.collect { case n: Number => n.doubleValue() }
              case _ => throw new IllegalArgumentException("aggregate.histogram: 'buckets' is required")
            }
            (df: DataFrame) => Aggregates.histogramAction(df, keys, valueKey, bounds)
          case "put_all" => (df: DataFrame) =>
            Aggregates.putAllAction(df, keys, orderKey, nonKeyFields(df))
          case "append" => (df: DataFrame) => {
            val fields = strList(ao, "keys_to_append") match {
              case Nil => nonKeyFields(df)
              case ks => ks
            }
            Aggregates.appendAction(df, keys, orderKey, fields)
          }
          case "remove_duplicates" =>
            (df: DataFrame) => Aggregates.removeDuplicates(df, keys, orderKey)
          case "percent_sampler" =>
            val pct = ao.get("percent").collect { case n: Number => n.doubleValue() }
              .getOrElse(throw new IllegalArgumentException("percent_sampler: 'percent' is required"))
            (df: DataFrame) => Aggregates.percentSampler(df, keys, orderKey, pct)
          case "rate_limiter" =>
            val rate = optInt(ao, "events_per_second").getOrElse(
              throw new IllegalArgumentException("rate_limiter: 'events_per_second' is required"))
            optStr(ao, "when_exceeds").getOrElse("block") match {
              case "drop" => (df: DataFrame) => Aggregates.rateLimiterDrop(df, keys, timeKey, rate)
              case _ => (df: DataFrame) =>
                Aggregates.rateLimiterBlock(df, keys, timeKey, rate.toDouble)
            }
          case "tail_sampler" =>
            val pct = ao.get("percent").collect { case n: Number => n.doubleValue() }.getOrElse(100.0)
            val cond = optStr(ao, "condition").map(ExprCompiler.compile).getOrElse(lit(false))
            val gap = s"${durationSeconds(optStr(ao, "wait_period").getOrElse("15s"))}s"
            (df: DataFrame) => Aggregates.tailSampler(df, keys, timeKey, gap, cond, pct)
          case other => throw new IllegalArgumentException(
            s"unsupported aggregate action '$other' (supported: count, histogram, put_all, " +
              "append, remove_duplicates, percent_sampler, rate_limiter, tail_sampler)")
        }

      case "anomaly_detector" =>
        val keys = strList(o, "keys")
        require(keys.nonEmpty, "anomaly_detector: 'keys' is required")
        val idKeys = strList(o, "identification_keys")
        val mode = optMap(o, "mode")
        val modeName = if (mode.nonEmpty) mode.head._1 else "z_score"
        val mo = if (mode.nonEmpty) asOptions(mode.head._2) else Map.empty[String, Any]
        modeName match {
          case "random_cut_forest" =>
            // per-identification-key RCF models (cardinality_limit) have no
            // batch analog worth the memory — documented; global forest here
            val threshold = mo.get("threshold").collect { case n: Number => n.doubleValue() }
              .getOrElse(0.6)
            (df: DataFrame) => graft.ops.Rcf.anomalies(df, keys, threshold,
              sampleSize = optInt(mo, "sample_size").getOrElse(256),
              numTrees = optInt(mo, "number_of_trees").getOrElse(30))
          case _ =>
            require(idKeys.nonEmpty,
              "anomaly_detector z_score mode: 'identification_keys' is required (per-group stats)")
            val threshold = mo.get("threshold").collect { case n: Number => n.doubleValue() }
              .getOrElse(3.0)
            (df: DataFrame) => Enrich.zScoreAnomalies(df, idKeys, keys.head, threshold)
        }

      case "geoip" =>
        // the reference resolves IPs against a MaxMind mmdb configured in
        // the extensions section; no mmdb ships offline, so the range
        // database is inline CIDR → value (`ranges`) — the operator (a
        // broadcast range join) is identical either way
        val ranges = optMap(o, "ranges").map { case (cidr, v) => cidr -> v.toString }.toSeq.sortBy(_._1)
        require(ranges.nonEmpty, "geoip: 'ranges' (cidr: value) is required offline")
        val default = optStr(o, "default").getOrElse("unknown")
        val entries = mapList(o, "entries")
        require(entries.nonEmpty, "geoip: 'entries' is required")
        stages(entries.map { e =>
          val source = reqStr(e, "source", "geoip.entries")
          val target = optStr(e, "target").getOrElse("geo")
          (df: DataFrame) => Enrich.geoLookup(df, source, target, ranges, default)
        })

      case other => throw new IllegalArgumentException(
        s"unsupported processor plugin '$other' in pipeline YAML (supported: grok, date, csv, " +
          "key_value, parse_json/ion/xml, write_json, add_entries, copy_values, rename_keys, " +
          "delete_entries, select_entries, convert_entry_type, drop_events, split_event, " +
          "truncate, obfuscate, substitute_string, split_string, trim/uppercase/lowercase_string, " +
          "string_converter, translate, user_agent, dissect, flatten, list_to_map, map_to_list, " +
          "decompress, detect_format, aggregate, anomaly_detector, geoip)")
    }
  }

  /** "PT20.345S" / "PT15M" (ISO-8601) or "60s" / "1500ms" / "2m" (simple
    * notation — AggregateProcessorConfig.java:52) → whole seconds. */
  private def durationSeconds(s: String): Long = {
    val t = s.trim
    if (t.toUpperCase(java.util.Locale.ROOT).startsWith("PT"))
      math.max(1L, java.time.Duration.parse(t).toSeconds)
    else {
      val num = t.takeWhile(c => c.isDigit || c == '.').toDouble
      val unit = t.dropWhile(c => c.isDigit || c == '.').trim.toLowerCase(java.util.Locale.ROOT)
      val secs = unit match {
        case "ms" => num / 1000.0
        case "m" | "min" => num * 60
        case "h" => num * 3600
        case _ => num
      }
      math.max(1L, secs.toLong)
    }
  }

  private def stages(ss: Seq[Stage]): Stage = (df: DataFrame) => ss.foldLeft(df)((d, s) => s(d))

  // ------------------------------------------------------------ sources

  /** Batch source plugins. `pipeline` sources are resolved by [[compile]];
    * anything unknown falls back to the `inputs` map (the reference's
    * `in_memory` test source generalized — push-style servers have no
    * batch analog, so their pipelines are fed directly). */
  private def compileSource(spark: SparkSession, pipelineName: String, p: PluginDef,
      inputs: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    val o = p.options
    p.name match {
      case "file" | "s3" =>
        val path = optStr(o, "path")
          .getOrElse(reqStr(o, "path_prefix", s"${p.name} source"))
        val codec = optMap(o, "codec")
        val format = if (codec.nonEmpty) codec.head._1
          else optStr(o, "format").getOrElse("newline")
        val copts = if (codec.nonEmpty) asOptions(codec.head._2) else Map.empty[String, Any]
        format match {
          case "newline" =>
            Sources.newlineDelimited(spark, path, optInt(copts, "skip_lines").getOrElse(0))
          case "json" | "ndjson" =>
            Sources.ndjson(spark, path, reqStr(copts, "schema", "ndjson codec (static-schema engine)"))
          case "csv" =>
            Sources.csv(spark, path, optBool(copts, "header", true),
              optStr(copts, "delimiter").getOrElse(","))
          case "parquet" => Sources.parquet(spark, path)
          case "multiline" =>
            Sources.multiline(spark, path, reqStr(copts, "start_pattern", "multiline codec"))
          case other => throw new IllegalArgumentException(s"unsupported file codec '$other'")
        }
      case "parquet" => Sources.parquet(spark, reqStr(o, "path", "parquet source"))
      case "random" | "log_generator" =>
        val n = optInt(o, "lines").orElse(optInt(o, "count")).getOrElse(100)
        Sources.logGenerator(spark, n.toLong,
          optInt(o, "seed").map(_.toLong).getOrElse(42L)).toDF("message")
      case "in_memory" =>
        val key = optStr(o, "testing_key").getOrElse(pipelineName)
        inputs.getOrElse(key, inputs.getOrElse(pipelineName,
          throw new IllegalArgumentException(
            s"in_memory source: no input registered for '$key'")))
      case "dynamodb" =>
        // reference dynamodb-source config shape (TableConfig/StreamConfig):
        // tables[0].table_arn + tables[0].stream.view_on_remove. The Streams
        // wire records (one GetRecords JSON per row) arrive via
        // inputs(pipelineName) — the network consumer is the same seam as
        // kafka/sqs/kinesis. Key names come from DescribeTable at runtime
        // in the reference; offline they are explicit table options
        // (partition_key required, sort_key optional) — documented
        // deviation, loud when absent.
        val records = inputs.getOrElse(pipelineName,
          throw new IllegalArgumentException(
            "dynamodb source: pass the Streams wire records via " +
              s"inputs(\"$pipelineName\") (network consumer seam)"))
        val table = mapList(o, "tables").headOption.getOrElse(
          throw new IllegalArgumentException("dynamodb source needs tables"))
        val arn = reqStr(table, "table_arn", "dynamodb.tables")
        val conf = graft.sources.Cdc.DdbConf(
          tableName = arn.substring(arn.lastIndexOf('/') + 1),
          partitionKey = reqStr(table, "partition_key",
            "dynamodb.tables (no DescribeTable offline)"),
          sortKey = optStr(table, "sort_key"),
          viewOnRemove = optMap(table, "stream").get("view_on_remove")
            .map(_.toString).getOrElse("NEW_IMAGE"))
        graft.sources.Cdc.ddbStream(records, records.columns.head, conf)
      case "documentdb" | "mongodb" =>
        // reference mongodb/.../CollectionConfig: collections[0].collection
        // ("db.coll"); change-stream events (canonical Extended JSON, one
        // per row) arrive via inputs(pipelineName) — same consumer seam.
        val records = inputs.getOrElse(pipelineName,
          throw new IllegalArgumentException(
            s"${p.name} source: pass the change-stream events via " +
              s"inputs(\"$pipelineName\") (network consumer seam)"))
        val coll = mapList(o, "collections").headOption
          .flatMap(c => optStr(c, "collection"))
        graft.sources.Cdc.mongoChange(records, records.columns.head, coll)
      case other =>
        inputs.getOrElse(pipelineName, throw new IllegalArgumentException(
          s"source plugin '$other' has no batch analog; pass a DataFrame via " +
            s"inputs(\"$pipelineName\") to feed this pipeline"))
    }
  }

  // ------------------------------------------------------------ compile

  /** Compile the whole YAML to terminal sink DataFrames (lazy — nothing
    * runs until the caller acts on one). Pipelines are evaluated in
    * dependency order; `pipeline` sinks become union edges. */
  def compile(spark: SparkSession, yamlText: String,
      inputs: Map[String, DataFrame] = Map.empty): Seq[SinkOutput] =
    compileDefs(spark, parse(yamlText), inputs)

  /** Compile already-parsed pipeline definitions — the shared back half of
    * [[compile]], also fed by the Logstash front-end
    * ([[LogstashConf.compile]]). */
  def compileDefs(spark: SparkSession, defs: Seq[PipelineDef],
      inputs: Map[String, DataFrame] = Map.empty): Seq[SinkOutput] = {
    val byName = defs.map(d => d.name -> d).toMap

    // upstream edges: child pipeline -> (parent, routes on the edge)
    val edges: Map[String, Seq[(String, Seq[String])]] = defs.flatMap { d =>
      d.sinks.collect { case SinkDef(PluginDef("pipeline", o), routes) =>
        (reqStr(o, "name", "pipeline sink"), (d.name, routes))
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    val routed = scala.collection.mutable.Map.empty[String, (DataFrame, Map[String, Column])]

    def routeFilter(df: DataFrame, conds: Map[String, Column], routes: Seq[String]): DataFrame =
      if (routes.isEmpty) df
      else {
        val cs = routes.map(r => conds.getOrElse(r,
          throw new IllegalArgumentException(s"sink references undefined route '$r'")))
        df.filter(cs.reduce(_ || _))
      }

    // explicit get/put (not getOrElseUpdate): eval recurses into itself
    // for `pipeline` sources, and mutable.Map.getOrElseUpdate does not
    // allow the default to modify the map
    def eval(name: String, stack: List[String]): (DataFrame, Map[String, Column]) =
      routed.get(name).getOrElse {
        require(!stack.contains(name), s"pipeline cycle: ${(name :: stack).reverse.mkString(" -> ")}")
        val d = byName.getOrElse(name,
          throw new IllegalArgumentException(s"pipeline sink references undefined pipeline '$name'"))
        val src: DataFrame =
          if (d.source.name == "pipeline") {
            val parent = reqStr(d.source.options, "name", "pipeline source")
            val contribs = edges.getOrElse(name, Seq.empty).filter(_._1 == parent)
            require(contribs.nonEmpty,
              s"pipeline '$name' declares source pipeline '$parent' but '$parent' has no matching pipeline sink")
            contribs.map { case (p, rs) =>
              val (pdf, pconds) = eval(p, name :: stack)
              routeFilter(pdf, pconds, rs)
            }.reduce(_ unionByName _)
          } else compileSource(spark, name, d.source, inputs)
        val out = d.processors.foldLeft(src)((df, p) => compileProcessor(p)(df))
        val conds = d.routes.map { case (rn, expr0) => rn -> ExprCompiler.compile(expr0) }.toMap
        val v = (out, conds)
        routed(name) = v
        v
      }

    defs.flatMap { d =>
      val (df, conds) = eval(d.name, Nil)
      d.sinks.collect {
        case SinkDef(p, routes) if p.name != "pipeline" =>
          SinkOutput(d.name, p, routes, routeFilter(df, conds, routes))
      }
    }
  }

  /** Compile AND run terminal sinks that have a batch write analog:
    * `file` writes at its `path` (format from `codec`/`format`, default
    * parquet); `opensearch` writes parquet under `outDir/<index>` with
    * `${}` index templating via [[Sinks.writeGrouped]]'s convention
    * (graft's index build replaces the bulk indexer — COVERAGE.md §2.2);
    * `stdout` stays lazy. Returns every terminal output for inspection. */
  def run(spark: SparkSession, yamlText: String,
      inputs: Map[String, DataFrame] = Map.empty,
      outDir: Option[String] = None): Seq[SinkOutput] = {
    val outs = compile(spark, yamlText, inputs)
    runSinks(outs, outDir)
    outs
  }

  /** The terminal-sink write actions of [[run]], separated so front-ends
    * that compile differently (transforms, Logstash) reuse them. */
  def runSinks(outs: Seq[SinkOutput], outDir: Option[String]): Unit = {
    outs.foreach { so =>
      so.plugin.name match {
        case "file" =>
          val path = reqStr(so.plugin.options, "path", "file sink")
          val fmt = optStr(so.plugin.options, "format").getOrElse("parquet")
          fmt match {
            case "parquet" => so.df.write.mode("overwrite").parquet(path)
            case "json" | "ndjson" => so.df.write.mode("overwrite").json(path)
            case "csv" => so.df.write.mode("overwrite").option("header", "true").csv(path)
            case other => throw new IllegalArgumentException(s"unsupported file sink format '$other'")
          }
        case "opensearch" =>
          outDir.foreach { base =>
            val index = optStr(so.plugin.options, "index").getOrElse("graft")
            // per-event bulk action resolution (sink `action` +
            // conditional `actions` config, EventActionResolver
            // semantics) — the resolved `_action` column is what a
            // downstream Sinks.mergeActions replay consumes
            val actionRules = mapList(so.plugin.options, "actions").map { a =>
              (optStr(a, "when"), reqStr(a, "type", "opensearch.actions"))
            }
            val defaultAction = optStr(so.plugin.options, "action").getOrElse("index")
            val withActions =
              if (actionRules.nonEmpty || so.plugin.options.contains("action"))
                graft.sinks.Sinks.resolveActions(so.df, defaultAction, actionRules)
              else so.df
            // `${}` index templating (index-per-key) = partitioned write
            if (index.contains("${")) {
              val tpl = FormatString.compile(index)
              withActions.withColumn("_index", tpl)
                .write.mode("overwrite").partitionBy("_index").parquet(s"$base/indexed")
            } else withActions.write.mode("overwrite").parquet(s"$base/$index")
          }
        case _ => () // stdout & friends: lazy, caller inspects `df`
      }
    }
  }
}
