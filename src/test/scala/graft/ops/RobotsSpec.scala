package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.Robots.Rule

class RobotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val body =
    """# example robots.txt
      |User-agent: otherbot
      |Disallow: /
      |
      |User-agent: graftbot
      |User-agent: friendbot
      |Disallow: /private
      |Allow: /private/ok$
      |Disallow: /pub/*.tmp
      |Disallow:
      |Crawl-delay: 10
      |
      |User-agent: *
      |Disallow: /media
      |""".stripMargin

  test("group selection: specific beats *, consecutive agents share") {
    val g = Robots.parseLocal(body, "GraftBot")
    assert(g == Seq(Rule(false, "/private"), Rule(true, "/private/ok$"),
      Rule(false, "/pub/*.tmp"))) // empty Disallow dropped, crawl-delay ignored
    assert(Robots.parseLocal(body, "friendbot") == g)
    assert(Robots.parseLocal(body, "otherbot") == Seq(Rule(false, "/")))
    // unknown agent falls back to the * group
    assert(Robots.parseLocal(body, "nobody") == Seq(Rule(false, "/media")))
    // longest agent-token match wins
    val two = "User-agent: graft\nDisallow: /a\n\n" +
      "User-agent: graftbot\nDisallow: /b\n"
    assert(Robots.parseLocal(two, "graftbot-news") == Seq(Rule(false, "/b")))
  }

  test("pattern matching: prefix, wildcard, final $ anchor") {
    // Google's published REP examples
    assert(Robots.matchesLocal("/fish*", "/fish.html"))
    assert(Robots.matchesLocal("/fish*", "/fishheads/yummy.html"))
    assert(!Robots.matchesLocal("/fish*", "/Fish.asp"))
    assert(Robots.matchesLocal("/*.php$", "/filename.php"))
    assert(!Robots.matchesLocal("/*.php$", "/filename.php?parameters"))
    assert(Robots.matchesLocal("/*.php", "/folder/any.php.file.html"))
    assert(Robots.matchesLocal("/fish*.php", "/fish.php?id=anything"))
    assert(!Robots.matchesLocal("/fish*.php", "/Fish.PHP"))
    // prefix covers the query string
    assert(Robots.matchesLocal("/search", "/search?q=x"))
    // exact anchor
    assert(Robots.matchesLocal("/p$", "/p"))
    assert(!Robots.matchesLocal("/p$", "/pq"))
  }

  test("precedence: longest pattern wins, allow wins ties, default allow") {
    val rules = Seq(Rule(false, "/private"), Rule(true, "/private/ok$"))
    assert(!Robots.decideLocal(rules, "/private/x"))
    assert(Robots.decideLocal(rules, "/private/ok")) // allow is longer
    assert(Robots.decideLocal(rules, "/public"))     // no match → allowed
    // equal length: allow wins
    assert(Robots.decideLocal(
      Seq(Rule(false, "/page"), Rule(true, "/page")), "/page1"))
    assert(Robots.decideLocal(Nil, "/anything"))
  }

  test("DataFrame filter: broadcast per-host rules, absent host allowed") {
    val robots = Seq(
      ("h1.example.com", body),
      ("h2.example.com", "User-agent: *\nDisallow: /\n")
    ).toDF("host", "content")
    val rules = Robots.rulesFor(robots, "host", "content", "graftbot")
    val urls = Seq(
      "https://h1.example.com/private/x",
      "https://h1.example.com/private/ok",
      "https://h1.example.com/pub/a.tmp",
      "https://h1.example.com/pub/a.html",
      "https://H1.EXAMPLE.COM/private/y", // host matching is case-insensitive
      "https://h2.example.com/",
      "https://h3.example.com/anything"   // no robots → allowed
    ).toDF("url")
    val out = Robots.filter(urls, "url", rules)
      .select("url", "robots_allowed").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!out("https://h1.example.com/private/x"))
    assert(out("https://h1.example.com/private/ok"))
    assert(!out("https://h1.example.com/pub/a.tmp"))
    assert(out("https://h1.example.com/pub/a.html"))
    assert(!out("https://H1.EXAMPLE.COM/private/y"))
    assert(!out("https://h2.example.com/"))
    assert(out("https://h3.example.com/anything"))
    // scale shape: the URL side reaches the join without an Exchange
    val plan = Robots.filter(urls, "url", rules)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  test("partition invariance: decisions identical under repartition") {
    val robots = Seq(("h1.example.com", body)).toDF("host", "content")
    val rules = Robots.rulesFor(robots, "host", "content", "graftbot")
    val urls = (0 until 200)
      .map(i => s"https://h1.example.com/private/p$i").toDF("url")
    val a = Robots.filter(urls, "url", rules)
      .orderBy("url").collect().map(_.getBoolean(1)).toSeq
    val b = Robots.filter(urls.repartition(17), "url", rules)
      .orderBy("url").collect().map(_.getBoolean(1)).toSeq
    assert(a == b)
    assert(a.forall(_ == false))
  }
}
