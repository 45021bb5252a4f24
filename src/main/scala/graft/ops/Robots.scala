package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt parsing + URL admission — the crawl-politeness curation
  * step a Common-Crawl-style corpus build runs before anything else
  * (pages fetched against a site's wishes are dropped from training
  * sets). Semantics from the PUBLIC RFC 9309 (Robots Exclusion
  * Protocol):
  *
  *  - groups: one or more `User-agent:` lines followed by
  *    `Allow:`/`Disallow:` rules; `#` comments; directive names
  *    case-insensitive;
  *  - group selection: the group whose user-agent token is the longest
  *    case-insensitive prefix of the crawler's product token wins; the
  *    `*` group applies only when no specific group matches;
  *  - rule matching: patterns match the URL's path-with-query as a
  *    prefix, `*` is a wildcard, a FINAL `$` anchors the end; an empty
  *    pattern matches nothing;
  *  - precedence: the matching rule with the longest pattern (octets)
  *    wins; on a length tie, Allow wins; no matching rule → allowed.
  *
  * Scale shape: robots rules are per-HOST dimension data (a few KB per
  * site); [[filter]] joins them to the URL corpus with a broadcast hint
  * and evaluates the precedence argmax inside ONE projection (a JVM
  * glob kernel — no regex compilation per row, no candidate explode, no
  * per-URL aggregation), so the 100 TB URL side never shuffles.
  *
  * The reference has no robots plugin (its saas crawlers delegate
  * politeness to the SaaS APIs, `saas-crawler/...`); this is part of the
  * training-data curation family (SURVEY.md "beyond the reference").
  */
object Robots {

  /** One admission rule: `allow` + the raw pattern. */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parse one robots.txt body and select the rule group for `agent`
    * (RFC 9309 group selection). Returns the selected group's rules in
    * file order; empty if the file has no applicable group. */
  def parseLocal(content: String, agent: String): Seq[Rule] = {
    if (content == null) return Seq.empty
    val a = agent.toLowerCase
    // groups: (agent tokens, rules)
    val groups = Seq.newBuilder[(Seq[String], Seq[Rule])]
    var curAgents = List.empty[String]
    var curRules = List.empty[Rule]
    var inAgents = false // consecutive user-agent lines share one group
    def flush(): Unit =
      if (curAgents.nonEmpty) {
        groups += ((curAgents.reverse, curRules.reverse))
        curAgents = Nil; curRules = Nil
      }
    content.split("\n", -1).foreach { raw =>
      val line = { val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            curAgents ::= value.toLowerCase
            inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            // empty pattern matches nothing (RFC 9309 §2.2.2)
            if (value.nonEmpty && curAgents.nonEmpty)
              curRules ::= Rule(key == "allow", value)
          case _ => inAgents = false // sitemap, crawl-delay, …: ignored
        }
      }
    }
    flush()
    val gs = groups.result()
    val specific = gs.filter { case (toks, _) =>
      toks.exists(t => t != "*" && a.startsWith(t)) }
    if (specific.nonEmpty) {
      // longest matching token wins; merge groups that tie (RFC: groups
      // with the same selected token are combined)
      val best = specific.map { case (toks, _) =>
        toks.filter(t => t != "*" && a.startsWith(t)).map(_.length).max }.max
      specific.collect { case (toks, rules)
        if toks.exists(t => t != "*" && a.startsWith(t) && t.length == best) =>
          rules }.flatten
    } else gs.collect { case (toks, rules) if toks.contains("*") => rules }
      .flatten
  }

  /** Glob match of an RFC 9309 pattern against a path-with-query:
    * prefix semantics, `*` wildcard, final `$` anchor. */
  def matchesLocal(pattern: String, path: String): Boolean = {
    val anchor = pattern.endsWith("$")
    val p = if (anchor) pattern.dropRight(1) else pattern
    val segs = p.split("\\*", -1)
    if (!path.startsWith(segs(0))) return false
    var i = segs(0).length
    var j = 1
    while (j < segs.length) {
      if (j == segs.length - 1 && anchor) {
        val s = segs(j)
        return path.length - i >= s.length && path.endsWith(s)
      }
      val idx = path.indexOf(segs(j), i)
      if (idx < 0) return false
      i = idx + segs(j).length
      j += 1
    }
    if (anchor) i == path.length else true
  }

  /** Precedence: longest matching pattern wins, Allow wins ties,
    * no match → allowed. */
  def decideLocal(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (matchesLocal(r.pattern, path)) {
        val l = r.pattern.length
        if (l > bestLen || (l == bestLen && r.allow && !bestAllow)) {
          bestLen = l; bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  private val parseUdf = udf { (content: String, agent: String) =>
    parseLocal(content, agent)
  }

  /** robots.txt bodies keyed by host → per-host selected rule arrays for
    * `agent`: (hostCol, `rules` array<struct<allow,pattern>>). */
  def rulesFor(robots: DataFrame, hostCol: String, contentCol: String,
      agent: String): DataFrame =
    robots.select(col(hostCol),
      parseUdf(col(contentCol), lit(agent)).as("rules"))

  /** Lowercased host of a URL column. */
  def hostOf(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1))

  /** Path-with-query of a URL column (`/` when absent) — the string RFC
    * 9309 patterns match against. */
  def pathOf(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val p = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(/.*)?$", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  private val decideUdf = udf { (rules: Seq[Rule], path: String) =>
    if (rules == null) true else decideLocal(rules, path)
  }

  /** Admit/deny each URL against its host's rules: adds
    * `robots_allowed`. One broadcast equi-join on host + one projection;
    * the URL side never shuffles, hosts absent from `rulesByHost` are
    * allowed. */
  def filter(urls: DataFrame, urlCol: String,
      rulesByHost: DataFrame): DataFrame = {
    // collision-proof the dimension's column names against the caller's
    // frame (same class as Curation.domainFilter's _host fix): the join
    // side is renamed to reserved temp names before the join, so a urls
    // column named "rules" or like the dimension's host column survives
    val hostCol = rulesByHost.columns.head
    val tmpHost = "__robots_host"
    val tmpRules = "__robots_rules"
    require(!urls.columns.contains(tmpHost) && !urls.columns.contains(tmpRules),
      s"urls must not contain reserved columns $tmpHost/$tmpRules")
    val dim = rulesByHost.withColumnRenamed(hostCol, tmpHost)
      .withColumnRenamed("rules", tmpRules)
    urls
      .join(broadcast(dim), hostOf(col(urlCol)) === col(tmpHost), "left")
      .withColumn("robots_allowed",
        decideUdf(col(tmpRules), pathOf(col(urlCol))))
      .drop(tmpHost, tmpRules)
  }
}
