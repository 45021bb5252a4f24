package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** uap-core-format database expansion (UapCore) — the documented
  * driver-side expansion of the user_agent when-chain. The long-tail
  * fixtures here are exactly the agents the fast subset MIS-parses
  * (Chromium forks keeping the Chrome/ token, HTTP libraries, Chrome OS,
  * Windows Phone, consoles); the differential asserts the expanded chain
  * gets them right while agreeing with the subset on mainstream agents. */
class UapCoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parseWith(db: Option[UapCore.Db])(ua: String) = {
    val df = Seq(ua).toDF("ua")
    UserAgent("ua", db = db)(df).select(
      $"user_agent.name", $"user_agent.version",
      $"user_agent.os.full".as("osfull"),
      $"user_agent.device.name".as("device")).collect().head
  }
  private def uap(ua: String) = parseWith(Some(UapCore.lite))(ua)
  private def subset(ua: String) = parseWith(None)(ua)

  test("yaml parse: sections, defaults, templates, regex_flag") {
    val db = UapCore.parse(
      """user_agent_parsers:
        |  - regex: '(Foo)Client/(\d+)\.(\d+)\.(\d+)'
        |  - regex: 'Bar/(\d+)'
        |    family_replacement: 'Bar Browser $1'
        |os_parsers:
        |  - regex: '(BazOS) (\d+)-(\d+)'
        |    os_replacement: 'Baz'
        |device_parsers:
        |  - regex: 'console-(\w+)'
        |    regex_flag: 'i'
        |    device_replacement: 'Console $1'
        |""".stripMargin)
    assert(db.ua.length == 2 && db.os.length == 1 && db.device.length == 1)
    assert(db.ua.head.family.isEmpty) // default = $1
    assert(db.device.head.caseInsensitive)
    // defaults: family=$1, v1..v3 = groups 2..4
    val r = parseWith(Some(db))("FooClient/1.2.3 BazOS 4-5 CONSOLE-neo")
    assert(r.getString(0) == "Foo")
    assert(r.getString(1) == "1.2.3")
    assert(r.getString(2) == "Baz 4.5")
    assert(r.getString(3) == "Console neo") // (?i) guard, template sub
    // template with a ref and a missing group
    val r2 = parseWith(Some(db))("Bar/7")
    assert(r2.getString(0) == "Bar Browser 7")
    assert(r2.getString(1) == "") // no groups 2..4
  }

  test("long-tail agents the subset mis-parses resolve via the lite db") {
    val vivaldi = "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Vivaldi/6.5.3206"
    assert(subset(vivaldi).getString(0) == "Chrome") // fork token ignored
    val v = uap(vivaldi)
    assert(v.getString(0) == "Vivaldi" && v.getString(1) == "6.5.3206")
    assert(v.getString(2) == "Windows 10")

    val yab = "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/118.0.0.0 YaBrowser/23.11.0.0 Safari/537.36"
    assert(uap(yab).getString(0) == "Yandex Browser")

    val req = "python-requests/2.28.1"
    assert(subset(req).getString(0) == "Other")
    val rq = uap(req)
    assert(rq.getString(0) == "python-requests" && rq.getString(1) == "2.28.1")
    assert(rq.getString(2) == "Other" && rq.getString(3) == "Other")

    val wp = "Mozilla/5.0 (Windows Phone 8.1; ARM; Trident/7.0; Touch; rv:11.0; " +
      "IEMobile/11.0; NOKIA; Lumia 635) like Gecko"
    assert(subset(wp).getString(2) == "Other") // subset knows only Windows NT
    val w = uap(wp)
    assert(w.getString(0) == "IE" && w.getString(1) == "11.0")
    assert(w.getString(2) == "Windows Phone 8.1")
    assert(w.getString(3) == "Generic Smartphone")

    val cros = "Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/120.0.6099.62 Safari/537.36"
    assert(subset(cros).getString(2) == "Other")
    val c = uap(cros)
    assert(c.getString(0) == "Chrome" && c.getString(2) == "Chrome OS 14541.0.0")
    assert(c.getString(3) == "Chromebook")

    val ps5 = "Mozilla/5.0 (PlayStation 5/SmartTV) AppleWebKit/605.1.15 " +
      "(KHTML, like Gecko)"
    assert(uap(ps5).getString(3) == "PlayStation 5") // $1 template

    val uc = "Mozilla/5.0 (Linux; U; Android 12; en-US) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Version/4.0 Chrome/100.0.4896.58 " +
      "UCBrowser/13.4.0.1306 Mobile Safari/537.36"
    assert(subset(uc).getString(0) == "Chrome")
    assert(uap(uc).getString(0) == "UC Browser")
    assert(uap(uc).getString(3) == "Generic Smartphone")
  }

  test("mainstream agents: expanded db agrees with the fast subset") {
    val mainstream = Seq(
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Mobile/15E148 Safari/604.1",
      "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.15; rv:109.0) Gecko/20100101 Firefox/115.0",
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
      "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
      "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.43 Mobile Safari/537.36")
    for (ua <- mainstream) {
      val (a, b) = (uap(ua), subset(ua))
      assert(a.getString(0) == b.getString(0), s"family differs for $ua")
      assert(a.getString(2) == b.getString(2), s"os differs for $ua")
      assert(a.getString(3) == b.getString(3), s"device differs for $ua")
    }
  }
}
