package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `user_agent` processor (reference user-agent-processor/.../
  * UserAgentProcessor.java:30,63-125, which delegates to uap-java + the
  * uap-core regex database).
  *
  * Spark-first subset: the uap-core DB is thousands of community regexes
  * (absent offline); this implements the DOCUMENTED high-traffic subset —
  * major browsers, engines-as-bots, the big OS families and device
  * classes — as one codegen'd when-chain of `regexp_extract`s, producing
  * the reference's exact output shape:
  * `{name, version, os: {name, version, full}, device: {name}, original}`.
  *
  * Passing `db = Some(...)` swaps in a uap-core-format database expanded
  * driver-side by [[UapCore]] (the bundled long-tail `UapCore.lite`, or
  * the full public uap-core `regexes.yaml` via `UapCore.parse`); the fast
  * subset stays the default.
  */
final case class UserAgent(source: String,
    targetKey: String = "user_agent",
    db: Option[UapCore.Db] = None) extends Stage {

  private def ver(c: Column, re: String): Column = regexp_extract(c, re, 1)

  def apply(df: DataFrame): DataFrame = {
    val ua = col(source)
    val (browser, os, device) = db match {
      case Some(d) => (UapCore.browserChain(ua, d), UapCore.osChain(ua, d),
        UapCore.deviceChain(ua, d))
      case None => (subsetBrowser(ua), subsetOs(ua), subsetDevice(ua))
    }

    val osName = os.getField("n")
    val osVer = os.getField("v")
    df.withColumn(targetKey, struct(
      browser.getField("n").as("name"),
      browser.getField("v").as("version"),
      struct(
        osName.as("name"),
        osVer.as("version"),
        when(osVer === "", osName)
          .otherwise(concat_ws(" ", osName, osVer)).as("full")).as("os"),
      struct(device.as("name")).as("device"),
      ua.as("original")))
  }

  // --- browser family + version (order matters: forks before Chrome) ---
  private def subsetBrowser(ua: Column): Column =
    when(ua.rlike("Googlebot"), struct(lit("Googlebot").as("n"), ver(ua, "Googlebot/([\\d.]+)").as("v")))
      .when(ua.rlike("bingbot"), struct(lit("bingbot").as("n"), ver(ua, "bingbot/([\\d.]+)").as("v")))
      .when(ua.rlike("curl/"), struct(lit("curl").as("n"), ver(ua, "curl/([\\d.]+)").as("v")))
      .when(ua.rlike("Wget/"), struct(lit("Wget").as("n"), ver(ua, "Wget/([\\d.]+)").as("v")))
      .when(ua.rlike("Edg(e|A|iOS)?/"), struct(lit("Edge").as("n"), ver(ua, "Edg(?:e|A|iOS)?/([\\d.]+)").as("v")))
      .when(ua.rlike("OPR/"), struct(lit("Opera").as("n"), ver(ua, "OPR/([\\d.]+)").as("v")))
      .when(ua.rlike("SamsungBrowser/"), struct(lit("Samsung Internet").as("n"), ver(ua, "SamsungBrowser/([\\d.]+)").as("v")))
      .when(ua.rlike("Chrome/"), struct(lit("Chrome").as("n"), ver(ua, "Chrome/([\\d.]+)").as("v")))
      .when(ua.rlike("CriOS/"), struct(lit("Chrome Mobile iOS").as("n"), ver(ua, "CriOS/([\\d.]+)").as("v")))
      .when(ua.rlike("Firefox/"), struct(lit("Firefox").as("n"), ver(ua, "Firefox/([\\d.]+)").as("v")))
      .when(ua.rlike("MSIE "), struct(lit("IE").as("n"), ver(ua, "MSIE ([\\d.]+)").as("v")))
      .when(ua.rlike("Trident/.*rv:"), struct(lit("IE").as("n"), ver(ua, "rv:([\\d.]+)").as("v")))
      .when(ua.rlike("Version/[\\d.]+.*Safari"), struct(lit("Safari").as("n"), ver(ua, "Version/([\\d.]+)").as("v")))
      .otherwise(struct(lit("Other").as("n"), lit("").as("v")))

  // --- OS family + version ---
  private def subsetOs(ua: Column): Column = {
    val winVer = ver(ua, "Windows NT ([\\d.]+)")
    val winName = when(winVer === "10.0", "10").when(winVer === "6.3", "8.1")
      .when(winVer === "6.2", "8").when(winVer === "6.1", "7")
      .when(winVer === "6.0", "Vista").when(winVer === "5.1", "XP")
      .otherwise(winVer)
    when(ua.rlike("Windows NT"),
        struct(lit("Windows").as("n"), winName.as("v")))
      .when(ua.rlike("iPhone OS [\\d_]+"),
        struct(lit("iOS").as("n"), translate(ver(ua, "iPhone OS ([\\d_]+)"), "_", ".").as("v")))
      .when(ua.rlike("CPU OS [\\d_]+"),
        struct(lit("iOS").as("n"), translate(ver(ua, "CPU OS ([\\d_]+)"), "_", ".").as("v")))
      .when(ua.rlike("Mac OS X [\\d_.]+"),
        struct(lit("Mac OS X").as("n"), translate(ver(ua, "Mac OS X ([\\d_.]+)"), "_", ".").as("v")))
      .when(ua.rlike("Android [\\d.]+"),
        struct(lit("Android").as("n"), ver(ua, "Android ([\\d.]+)").as("v")))
      .when(ua.rlike("Linux"), struct(lit("Linux").as("n"), lit("").as("v")))
      .otherwise(struct(lit("Other").as("n"), lit("").as("v")))
  }

  // --- device class ---
  private def subsetDevice(ua: Column): Column =
    when(ua.rlike("iPhone"), "iPhone")
      .when(ua.rlike("iPad"), "iPad")
      .when(ua.rlike("Googlebot|bingbot"), "Spider")
      .when(ua.rlike("Android.*Mobile"), "Generic Smartphone")
      .when(ua.rlike("Android"), "Generic Tablet")
      .when(ua.rlike("Macintosh"), "Mac")
      .when(ua.rlike("Windows"), "Other")
      .otherwise("Other")
}
