package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grok — pattern-library regex extraction (reference:
  * data-prepper-plugins/grok-processor/.../GrokProcessor.java:63,222-276,
  * which delegates to io.krakens:java-grok and the logstash default
  * pattern set).
  *
  * Spark-first: `%{SYNTAX:SEMANTIC:TYPE}` patterns are expanded ONCE on
  * the driver into a plain Java regex with tracked capture-group indices,
  * then evaluated per row with codegen'd `regexp_extract`/`rlike` — no
  * per-row pattern interpreter, no java-grok dependency, no match-timeout
  * watchdog thread (the reference needs one because Oniguruma can
  * backtrack pathologically inside its row loop; a stuck regex here is a
  * visible Spark task, killed by task-level tooling).
  *
  * The default pattern set below reproduces the behavior of the public
  * logstash "grok-patterns" core set (the same set java-grok bundles) for
  * the entries the reference's users hit most; it is written against Java
  * regex semantics (lookbehind + atomic groups are supported by
  * java.util.regex).
  */
object GrokPatterns {

  private val ipv4 =
    """(?<![0-9])(?:(?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5]))(?![0-9])"""

  // Compact-but-complete IPv6 (behavioral match for the logstash entry,
  // including the ::ffff:v4 embedding and zone index).
  private val ipv6 =
    """(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|(?:[0-9A-Fa-f]{1,4}:){1,7}:|(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}|(?:[0-9A-Fa-f]{1,4}:){1,5}(?::[0-9A-Fa-f]{1,4}){1,2}|(?:[0-9A-Fa-f]{1,4}:){1,4}(?::[0-9A-Fa-f]{1,4}){1,3}|(?:[0-9A-Fa-f]{1,4}:){1,3}(?::[0-9A-Fa-f]{1,4}){1,4}|(?:[0-9A-Fa-f]{1,4}:){1,2}(?::[0-9A-Fa-f]{1,4}){1,5}|[0-9A-Fa-f]{1,4}:(?::[0-9A-Fa-f]{1,4}){1,6}|:(?:(?::[0-9A-Fa-f]{1,4}){1,7}|:)|::(?:[fF]{4}:)?%{IPV4})(?:%[0-9A-Za-z]+)?"""

  val Default: Map[String, String] = Map(
    "USERNAME" -> """[a-zA-Z0-9._-]+""",
    "USER" -> """%{USERNAME}""",
    "EMAILLOCALPART" -> """[a-zA-Z][a-zA-Z0-9_.+-=:]+""",
    "EMAILADDRESS" -> """%{EMAILLOCALPART}@%{HOSTNAME}""",
    "HTTPDUSER" -> """%{EMAILADDRESS}|%{USER}""",
    "INT" -> """(?:[+-]?(?:[0-9]+))""",
    "BASE10NUM" -> """(?<![0-9.+-])(?>[+-]?(?:(?:[0-9]+(?:\.[0-9]+)?)|(?:\.[0-9]+)))""",
    "NUMBER" -> """(?:%{BASE10NUM})""",
    "BASE16NUM" -> """(?<![0-9A-Fa-f])(?:[+-]?(?:0x)?(?:[0-9A-Fa-f]+))""",
    "POSINT" -> """\b(?:[1-9][0-9]*)\b""",
    "NONNEGINT" -> """\b(?:[0-9]+)\b""",
    "WORD" -> """\b\w+\b""",
    "NOTSPACE" -> """\S+""",
    "SPACE" -> """\s*""",
    "DATA" -> """.*?""",
    "GREEDYDATA" -> """.*""",
    "QUOTEDSTRING" -> """(?>(?<!\\)(?>"(?>\\.|[^\\"]+)+"|""|(?>'(?>\\.|[^\\']+)+')|''|(?>`(?>\\.|[^\\`]+)+`)|``))""",
    "QS" -> """%{QUOTEDSTRING}""",
    "UUID" -> """[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}""",
    "IPV4" -> ipv4,
    "IPV6" -> ipv6,
    "IP" -> """(?:%{IPV6}|%{IPV4})""",
    "HOSTNAME" -> """\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*(\.?|\b)""",
    "IPORHOST" -> """(?:%{IP}|%{HOSTNAME})""",
    "HOSTPORT" -> """%{IPORHOST}:%{POSINT}""",
    "PATH" -> """(?:%{UNIXPATH}|%{WINPATH})""",
    "UNIXPATH" -> """(/[\w_%!$@:.,+~-]+)+""",
    "WINPATH" -> """(?>[A-Za-z]+:|\\)(?:\\[^\\?*]*)+""",
    "TTY" -> """(?:/dev/(pts|tty(?:[pq])?)(?:\w+)?/?(?:[0-9]+))""",
    "URIPROTO" -> """[A-Za-z]([A-Za-z0-9+\-.]+)+""",
    "URIHOST" -> """%{IPORHOST}(?::%{POSINT:port})?""",
    "URIPATH" -> """(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+""",
    "URIPARAM" -> """\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*""",
    "URIPATHPARAM" -> """%{URIPATH}(?:%{URIPARAM})?""",
    "URI" -> """%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?""",
    "MONTH" -> """\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm](?:a|ä)?r(?:ch|z)?|[Aa]pr(?:il)?|[Mm]a(?:y|i)?|[Jj]un(?:e|i)?|[Jj]ul(?:y|i)?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo](?:c|k)?t(?:ober)?|[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\b""",
    "MONTHNUM" -> """(?:0?[1-9]|1[0-2])""",
    "MONTHDAY" -> """(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])""",
    "DAY" -> """(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)""",
    "YEAR" -> """(?>\d\d){1,2}""",
    "HOUR" -> """(?:2[0123]|[01]?[0-9])""",
    "MINUTE" -> """(?:[0-5][0-9])""",
    "SECOND" -> """(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)""",
    "TIME" -> """(?!<[0-9])%{HOUR}:%{MINUTE}(?::%{SECOND})(?![0-9])""",
    "DATE_US" -> """%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}""",
    "DATE_EU" -> """%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}""",
    "ISO8601_TIMEZONE" -> """(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))""",
    "ISO8601_SECOND" -> """(?:%{SECOND}|60)""",
    "TIMESTAMP_ISO8601" -> """%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?""",
    "DATE" -> """%{DATE_US}|%{DATE_EU}""",
    "DATESTAMP" -> """%{DATE}[- ]%{TIME}""",
    "TZ" -> """(?:[PMCE][SD]T|UTC)""",
    "HTTPDATE" -> """%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}""",
    "SYSLOGTIMESTAMP" -> """%{MONTH} +%{MONTHDAY} %{TIME}""",
    "PROG" -> """[\x21-\x5a\x5c\x5e-\x7e]+""",
    "SYSLOGPROG" -> """%{PROG:program}(?:\[%{POSINT:pid}\])?""",
    "SYSLOGHOST" -> """%{IPORHOST}""",
    "SYSLOGBASE" -> """%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:""",
    "SYSLOGFACILITY" -> """<%{NONNEGINT:facility}.%{NONNEGINT:priority}>""",
    "LOGLEVEL" -> """(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|INFO|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)""",
    "COMMONAPACHELOG" -> """%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} \[%{HTTPDATE:timestamp}\] "(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" %{NUMBER:response} (?:%{NUMBER:bytes}|-)""",
    "COMBINEDAPACHELOG" -> """%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}"""
  )
}

/** One named capture in a compiled grok expression. */
final case class GrokCapture(name: String, group: Int, castTo: Option[String])

/** A grok pattern expanded to a plain Java regex + capture-group indices. */
final case class CompiledGrok(regex: String, captures: Seq[GrokCapture])

object GrokCompiler {

  private val MaxDepth = 32

  /** Expand `%{SYNTAX:SEMANTIC:TYPE}` references into one flat regex.
    * `%{X:name}` becomes a CAPTURING group whose index is tracked;
    * `%{X}` becomes non-capturing. Literal capturing groups inside
    * library patterns (e.g. HOSTNAME's `(\.?|\b)`) are counted so the
    * tracked indices stay correct. */
  def compile(pattern: String,
      extraDefs: Map[String, String] = Map.empty): CompiledGrok = {
    val defs = GrokPatterns.Default ++ extraDefs
    val sb = new StringBuilder
    val caps = scala.collection.mutable.ArrayBuffer.empty[GrokCapture]
    var groupCount = 0

    // Copies raw regex text, counting capturing groups as Java would.
    def copyRaw(s: String): Unit = {
      var i = 0
      var inClass = false
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) { sb += c; sb += s.charAt(i + 1); i += 1 }
        else {
          if (c == '[' && !inClass) inClass = true
          else if (c == ']' && inClass) inClass = false
          else if (c == '(' && !inClass) {
            val isCapturing =
              if (i + 1 >= s.length || s.charAt(i + 1) != '?') true
              else if (i + 2 < s.length && s.charAt(i + 1) == '?' &&
                s.charAt(i + 2) == '<' &&
                i + 3 < s.length && s.charAt(i + 3) != '=' && s.charAt(i + 3) != '!')
                true // (?<name>…) is capturing
              else false
            if (isCapturing) groupCount += 1
          }
          sb += c
        }
        i += 1
      }
    }

    def expandInto(p: String, depth: Int): Unit = {
      require(depth < MaxDepth, s"grok pattern recursion too deep in: $pattern")
      var i = 0
      var litStart = 0
      while (i < p.length) {
        if (p.charAt(i) == '%' && i + 1 < p.length && p.charAt(i + 1) == '{') {
          val close = p.indexOf('}', i + 2)
          require(close > 0, s"unclosed %{ at $i in: $p")
          if (litStart < i) copyRaw(p.substring(litStart, i))
          val parts = p.substring(i + 2, close).split(":", 3)
          val syntax = parts(0)
          val body = defs.getOrElse(syntax,
            throw new IllegalArgumentException(s"unknown grok pattern %{$syntax}"))
          if (parts.length >= 2) {
            groupCount += 1
            caps += GrokCapture(parts(1), groupCount,
              if (parts.length == 3) Some(parts(2)) else None)
            sb += '('
            expandInto(body, depth + 1)
            sb += ')'
          } else {
            sb.append("(?:")
            expandInto(body, depth + 1)
            sb += ')'
          }
          i = close + 1
          litStart = i
        } else i += 1
      }
      if (litStart < p.length) copyRaw(p.substring(litStart))
    }

    expandInto(pattern, 0)
    CompiledGrok(sb.toString, caps.toSeq)
  }
}

/** The `grok` processor stage (GrokProcessor.java semantics):
  *  - `patterns` tried in order, FIRST MATCH WINS (break_on_match);
  *  - a row matching pattern i gets exactly pattern i's captures, others null;
  *  - unmatched rows keep all capture columns null and get
  *    `tagsOnMatchFailure` appended to the `tags` array column;
  *  - `keepEmptyCaptures=false` (reference default) turns empty-string
  *    captures into null;
  *  - `%{NUMBER:f:int}` / `:float` cast the capture;
  *  - `targetKey` nests all captures under one struct column.
  * Matching uses find() semantics (unanchored), like java-grok.
  */
final case class Grok(source: String, patterns: Seq[String],
    extraDefs: Map[String, String] = Map.empty,
    keepEmptyCaptures: Boolean = false,
    tagsOnMatchFailure: Seq[String] = Seq.empty,
    targetKey: Option[String] = None) extends Stage {

  private val compiled: Seq[CompiledGrok] =
    patterns.map(GrokCompiler.compile(_, extraDefs))

  def apply(df: DataFrame): DataFrame = {
    val src = col(source)
    // ONE matcher pass per pattern per row: the custom
    // RegexpFirstMatchGroups expression yields every capture group at
    // once (null array = no match) — the builtin path would re-run the
    // regex k+1 times (rlike + regexp_extract per field)
    val withGroups = compiled.zipWithIndex.foldLeft(df) { case (d, (cg, i)) =>
      d.withColumn(s"_g$i",
        graft.functions.RegexpFirstMatchGroups(src, cg.regex))
    }
    // which pattern matched first (-1 = none)
    val matchIdx = compiled.indices.foldRight(lit(-1): Column) {
      case (i, els) => when(col(s"_g$i").isNotNull, i).otherwise(els)
    }
    val withIdx = withGroups.withColumn("_grok_m", matchIdx)
    val fieldOrder = compiled.flatMap(_.captures.map(_.name)).distinct
    val fieldCols = fieldOrder.map { f =>
      // per field: value from the first-matching pattern that captures it
      val v = compiled.zipWithIndex.foldRight(lit(null).cast("string"): Column) {
        case ((cg, i), els) =>
          cg.captures.find(_.name == f) match {
            case Some(cap) =>
              val raw = element_at(col(s"_g$i"), cap.group)
              val cleaned = if (keepEmptyCaptures) coalesce(raw, lit(""))
                else nullif(raw, lit(""))
              when(col("_grok_m") === i, cleaned).otherwise(els)
            case None => when(col("_grok_m") === i, lit(null)).otherwise(els)
          }
      }
      val casted = compiled.flatMap(_.captures).find(_.name == f).flatMap(_.castTo) match {
        case Some("int") => v.cast("long")
        case Some("float") => v.cast("double")
        case _ => v
      }
      f -> casted
    }
    val projected = targetKey match {
      case Some(t) => withIdx.withColumn(t,
        struct(fieldCols.map { case (n, c) => c.as(n) }: _*))
      case None => fieldCols.foldLeft(withIdx) { case (d, (n, c)) =>
        d.withColumn(n, c)
      }
    }
    val tagged =
      if (tagsOnMatchFailure.isEmpty) projected
      else {
        val newTags = array(tagsOnMatchFailure.map(lit): _*)
        val existing = if (projected.columns.contains("tags")) col("tags")
          else array().cast("array<string>")
        projected.withColumn("tags",
          when(col("_grok_m") === -1, array_union(existing, newTags))
            .otherwise(existing))
      }
    tagged.drop("_grok_m" +: compiled.indices.map(i => s"_g$i"): _*)
  }
}
