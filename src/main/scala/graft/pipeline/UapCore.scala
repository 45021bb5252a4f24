package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Driver-side expansion of a uap-core-format regex database into the
  * [[UserAgent]] when-chain (the expansion the r3 coverage table
  * documented; reference user-agent-processor/.../UserAgentProcessor.java:30
  * delegates the same database to uap-java).
  *
  * The uap-core YAML schema is public (ua-parser/uap-core docs):
  * `user_agent_parsers` (regex, family_replacement, v1..v3_replacement),
  * `os_parsers` (regex, os_replacement, os_v1..v4_replacement),
  * `device_parsers` (regex, regex_flag, device_replacement). Rules apply
  * top-down, first match wins, matching is an unanchored find, `$1..$9`
  * substitute capture groups, defaults are $1 for the name and the
  * following groups for versions. Each rule compiles to one
  * `rlike` guard + `regexp_extract` projections — the whole database is
  * ONE codegen'd Catalyst expression tree, no per-row interpreter.
  *
  * The bundled `graft/uap-lite.yaml` resource is a curated long-tail set
  * in that schema (forks that embed Chrome/Safari tokens, bot and
  * HTTP-library agents, Chrome OS / Windows Phone / console devices)
  * written for this engine; callers can load the full public uap-core
  * `regexes.yaml` through the same [[parse]] at deploy time.
  */
object UapCore {

  final case class UaParser(regex: String, family: Option[String],
      v1: Option[String], v2: Option[String], v3: Option[String])
  final case class OsParser(regex: String, os: Option[String],
      v1: Option[String], v2: Option[String], v3: Option[String],
      v4: Option[String])
  final case class DeviceParser(regex: String, caseInsensitive: Boolean,
      device: Option[String])
  final case class Db(ua: Seq[UaParser], os: Seq[OsParser],
      device: Seq[DeviceParser])

  /** Parse a uap-core-format YAML document. */
  def parse(yamlText: String): Db = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val root = mapper.readValue(yamlText, classOf[java.util.Map[String, Any]])
    def section(name: String): Seq[Map[String, String]] = root.get(name) match {
      case null => Nil
      case l: java.util.List[_] => l.toArray.toSeq.map {
        case m: java.util.Map[_, _] =>
          val b = Map.newBuilder[String, String]
          m.forEach((k, v) => b += k.toString -> String.valueOf(v))
          b.result()
      }
    }
    Db(
      section("user_agent_parsers").map(m => UaParser(m("regex"),
        m.get("family_replacement"), m.get("v1_replacement"),
        m.get("v2_replacement"), m.get("v3_replacement"))),
      section("os_parsers").map(m => OsParser(m("regex"),
        m.get("os_replacement"), m.get("os_v1_replacement"),
        m.get("os_v2_replacement"), m.get("os_v3_replacement"),
        m.get("os_v4_replacement"))),
      section("device_parsers").map(m => DeviceParser(m("regex"),
        m.get("regex_flag").contains("i"), m.get("device_replacement"))))
  }

  /** The bundled curated long-tail database. */
  lazy val lite: Db = {
    val in = getClass.getResourceAsStream("/graft/uap-lite.yaml")
    require(in != null, "uap-lite.yaml resource missing")
    try parse(new String(in.readAllBytes(), "UTF-8")) finally in.close()
  }

  /** Capture-group count of a pattern (drives $n defaults: a group the
    * regex doesn't have yields an absent part, as uap-java does). */
  private def groups(regex: String): Int =
    java.util.regex.Pattern.compile(regex).matcher("").groupCount()

  /** Compile `template` ("Name $1.$2") against `regex` captures; `None`
    * falls back to plain group `defaultGroup`. Returns null-when-empty so
    * concat_ws drops absent version parts. */
  private def part(ua: Column, regex: String, template: Option[String],
      defaultGroup: Int): Column = {
    val n = groups(regex)
    val c = template match {
      case None =>
        if (defaultGroup > n) lit(null).cast("string")
        else regexp_extract(ua, regex, defaultGroup)
      case Some(t) =>
        // split into literal runs and $k refs; concat in order
        val pieces = "\\$([1-9])".r.split(t) // literals between refs
        val refs = "\\$([1-9])".r.findAllMatchIn(t).map(_.group(1).toInt).toSeq
        val cols = Seq.newBuilder[Column]
        pieces.zipWithIndex.foreach { case (p, i) =>
          if (p.nonEmpty) cols += lit(p)
          if (i < refs.length)
            cols += (if (refs(i) > n) lit("") else regexp_extract(ua, regex, refs(i)))
        }
        // a template ending in a ref: split drops the trailing empty run
        if (pieces.length <= refs.length)
          refs.drop(pieces.length).foreach(r =>
            cols += (if (r > n) lit("") else regexp_extract(ua, regex, r)))
        val all = cols.result()
        if (all.isEmpty) lit("") else trim(concat(all: _*))
    }
    nullif(c, lit(""))
  }

  private def versionCol(ua: Column, regex: String,
      parts: Seq[(Option[String], Int)]): Column =
    concat_ws(".", parts.map { case (t, g) => part(ua, regex, t, g) }: _*)

  /** Browser chain → struct(n, v); first matching rule wins. */
  def browserChain(ua: Column, db: Db): Column =
    db.ua.foldRight(struct(lit("Other").as("n"), lit("").as("v"))) { (p, rest) =>
      when(ua.rlike(p.regex), struct(
        coalesce(part(ua, p.regex, p.family, 1), lit("Other")).as("n"),
        versionCol(ua, p.regex, Seq(p.v1 -> 2, p.v2 -> 3, p.v3 -> 4)).as("v")))
        .otherwise(rest)
    }

  /** OS chain → struct(n, v). */
  def osChain(ua: Column, db: Db): Column =
    db.os.foldRight(struct(lit("Other").as("n"), lit("").as("v"))) { (p, rest) =>
      when(ua.rlike(p.regex), struct(
        coalesce(part(ua, p.regex, p.os, 1), lit("Other")).as("n"),
        versionCol(ua, p.regex,
          Seq(p.v1 -> 2, p.v2 -> 3, p.v3 -> 4, p.v4 -> 5)).as("v")))
        .otherwise(rest)
    }

  /** Device chain → device name column. */
  def deviceChain(ua: Column, db: Db): Column =
    db.device.foldRight(lit("Other")) { (p, rest) =>
      val re = if (p.caseInsensitive) "(?i)" + p.regex else p.regex
      when(ua.rlike(re),
        coalesce(part(ua, re, p.device, 1), lit("Other")))
        .otherwise(rest)
    }
}
