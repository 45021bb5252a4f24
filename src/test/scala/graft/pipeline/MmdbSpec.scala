package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Own-kernel MaxMind DB reader/writer (public MaxMind-DB spec): tree walk
  * over all record sizes, full data-format decode including pointers,
  * enumeration to the (cidr → record) dimension table, and the geoip
  * range-join integration (reference
  * geoip-processor/.../GeoIPProcessor.java:43). */
class MmdbSpec extends AnyFunSuite {

  private val entries = Seq(
    "10.0.0.0/9" -> Map[String, Any](
      "net" -> Map("name" -> "net-low", "asn" -> 64512L),
      "score" -> 0.25, "anycast" -> false,
      "tags" -> Seq("internal", "low")),
    "10.128.0.0/9" -> Map[String, Any](
      "net" -> Map("name" -> "net-high", "asn" -> 64513L),
      "score" -> 0.75, "anycast" -> true,
      "tags" -> Seq("internal", "high")),
    "192.168.4.0/24" -> Map[String, Any](
      "net" -> Map("name" -> "lan", "asn" -> 7L),
      "score" -> 1.0, "anycast" -> false,
      "tags" -> Seq("internal", "low"))) // shares "internal"/"low" → pointers

  test("write → read round-trips entries and metadata at all record sizes") {
    for (rs <- Seq(24, 28, 32)) {
      val db = Mmdb.read(Mmdb.write(entries, recordSize = rs))
      assert(db.recordSize == rs)
      assert(db.ipVersion == 4)
      assert(db.metadata("database_type") == "graft-Test")
      assert(db.metadata("binary_format_major_version") == 2L)
      assert(db.entries().toMap == entries.toMap.view.mapValues(identity).toMap,
        s"record size $rs")
    }
  }

  test("lookup walks the tree: hits, misses, and longest-prefix containment") {
    val db = Mmdb.read(Mmdb.write(entries))
    def name(ip: String) = db.lookup(ip)
      .map(_.asInstanceOf[Map[String, Any]]("net")
        .asInstanceOf[Map[String, Any]]("name"))
    assert(name("10.0.0.1").contains("net-low"))
    assert(name("10.127.255.255").contains("net-low"))
    assert(name("10.128.0.0").contains("net-high"))
    assert(name("10.255.1.2").contains("net-high"))
    assert(name("192.168.4.200").contains("lan"))
    assert(name("192.168.5.1").isEmpty)
    assert(name("8.8.8.8").isEmpty)
  }

  test("pointer dedup: shared values encode once and decode through pointers") {
    val dup = Seq(
      "10.0.0.0/8" -> Map[String, Any]("v" -> ("x" * 40), "tags" -> Seq("a", "b")),
      "11.0.0.0/8" -> Map[String, Any]("v" -> ("x" * 40), "tags" -> Seq("a", "b")),
      "12.0.0.0/8" -> Map[String, Any]("v" -> ("x" * 40), "tags" -> Seq("a", "b")))
    val unique = Seq(
      "10.0.0.0/8" -> Map[String, Any]("v" -> ("x" * 40), "tags" -> Seq("a", "b")),
      "11.0.0.0/8" -> Map[String, Any]("v" -> ("y" * 40), "tags" -> Seq("c", "d")),
      "12.0.0.0/8" -> Map[String, Any]("v" -> ("z" * 40), "tags" -> Seq("e", "f")))
    val dupBytes = Mmdb.write(dup)
    assert(dupBytes.length < Mmdb.write(unique).length)
    assert(Mmdb.read(dupBytes).entries().toMap == dup.toMap)
  }

  test("writer rejects nested and duplicate-covering cidrs") {
    intercept[IllegalArgumentException] {
      Mmdb.write(Seq("10.0.0.0/8" -> Map("a" -> "b"),
        "10.1.0.0/16" -> Map("c" -> "d")))
    }
  }

  test("geoLookupMmdb enriches identically to the inline range table") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("10.3.2.1", "10.200.0.9", "192.168.4.7", "1.2.3.4")
      .toDF("ip")
    val mmdb = Mmdb.write(entries)
    val viaMmdb = Enrich.geoLookupMmdb(df, "ip", "net", mmdb, Seq("net", "name"))
      .select("ip", "net").as[(String, String)].collect().toMap
    val viaInline = Enrich.geoLookup(df, "ip", "net",
      Seq("10.0.0.0/9" -> "net-low", "10.128.0.0/9" -> "net-high",
        "192.168.4.0/24" -> "lan"))
      .select("ip", "net").as[(String, String)].collect().toMap
    assert(viaMmdb == viaInline)
    assert(viaMmdb("1.2.3.4") == "unknown")
  }

  test("large databases cross the multi-byte size and wide-pointer paths") {
    // 600 /16 networks with distinct 40-char payloads: data section passes
    // 2 KiB (ss=1 pointers for late records) and strings are fixed-width
    val many = (0 until 600).map { i =>
      s"172.${i / 256 + 16}.${i % 256}.0/24" ->
        Map[String, Any]("id" -> i.toLong, "pad" -> ("p" * 40 + i.toString))
    }
    val db = Mmdb.read(Mmdb.write(many))
    assert(db.entries().toMap == many.toMap)
    assert(db.lookup("172.16.37.9").map(_.asInstanceOf[Map[String, Any]]("id"))
      .contains(37L))
  }
}
