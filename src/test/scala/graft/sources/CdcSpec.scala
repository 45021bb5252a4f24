package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.util.Json
import graft.util.Json._

class JsonKernelSpec extends AnyFunSuite {

  test("round trip preserves field order, raw numbers, escapes") {
    // \\u0001 below stays two characters: the Scala lexer would
    // pre-substitute a bare unicode escape even in raw strings.
    val s = "{\"b\":1.50,\"a\":[true,null,\"x\\ny\",-0.5e2],\"c\":{\"z\":\"\\u0001\"}}"
    assert(Json.write(Json.parse(s)) ===
      "{\"b\":1.50,\"a\":[true,null,\"x\\ny\",-0.5e2],\"c\":{\"z\":\"\\u0001\"}}")
  }

  test("parse rejects malformed input") {
    for (bad <- Seq("{", "[1,]", "{\"a\":}", "tru", "\"\\q\"", "1 2", "{'a':1}"))
      assertThrows[Json.JsonError](Json.parse(bad))
  }

  test("get finds first field; numbers keep precision") {
    val o = Json.parse("""{"n":12345678901234567890.00001}""").asInstanceOf[JObj]
    assert(o.get("n") === Some(JNum("12345678901234567890.00001")))
  }
}

class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Cdc.DdbConf("tbl", "pk", Some("sk"))

  private def ddbRecord(name: String, sec: Long, seq: Long,
      newImage: String, oldImage: String = null, userIdentity: String = null,
      keys: String = """{"pk":{"S":"p1"},"sk":{"N":"7"}}"""): String = {
    val oi = Option(oldImage).map(o => s""","OldImage":$o""").getOrElse("")
    val ni = Option(newImage).map(n => s""""NewImage":$n,""").getOrElse("")
    val ui = Option(userIdentity).map(u => s""","userIdentity":$u""").getOrElse("")
    s"""{"eventID":"e$seq","eventName":"$name","dynamodb":{
       |"ApproximateCreationDateTime":$sec,$ni"Keys":$keys$oi,
       |"SequenceNumber":"$seq","SizeBytes":10,
       |"StreamViewType":"NEW_AND_OLD_IMAGES"}$ui}""".stripMargin.replace("\n", "")
  }

  test("ddb: recursive AttributeValue unmarshal (all ten types)") {
    val img = """{"s":{"S":"hi"},"n":{"N":"12.50"},"b":{"B":"AQI="},
      |"t":{"BOOL":true},"nul":{"NULL":true},"ss":{"SS":["a","b"]},
      |"ns":{"NS":["1","2.5"]},"bs":{"BS":["AA==","AQ=="]},
      |"l":{"L":[{"S":"x"},{"N":"3"},{"M":{"k":{"BOOL":false}}}]},
      |"m":{"M":{"inner":{"L":[{"NULL":true}]}}}}""".stripMargin.replace("\n", "")
    val out = Cdc.ddbStream(
      Seq(ddbRecord("INSERT", 100, 1, img)).toDF("j"), "j", conf).collect()(0)
    assert(out.getAs[String]("err") == null)
    assert(out.getAs[String]("data") ===
      """{"s":"hi","n":12.50,"b":"AQI=","t":true,"nul":null,""" +
        """"ss":["a","b"],"ns":[1,2.5],"bs":["AA==","AQ=="],""" +
        """"l":["x",3,{"k":false}],"m":{"inner":[null]}}""")
    assert(out.getAs[String]("partition_key") === "p1")
    assert(out.getAs[String]("sort_key") === "7")
    assert(out.getAs[String]("primary_key") === "p1|7")
    assert(out.getAs[String]("opensearch_action") === "index")
    assert(out.getAs[Long]("dynamodb_timestamp") === 100000L)
    assert(out.getAs[Long]("document_version") === 100000000L)
  }

  test("ddb: REMOVE uses new image by default, old image when configured") {
    val rec = ddbRecord("REMOVE", 5, 2, """{"a":{"S":"new"}}""",
      oldImage = """{"a":{"S":"old"}}""")
    val viaNew = Cdc.ddbStream(Seq(rec).toDF("j"), "j", conf).collect()(0)
    assert(viaNew.getAs[String]("data") === """{"a":"new"}""")
    assert(viaNew.getAs[String]("opensearch_action") === "delete")
    val viaOld = Cdc.ddbStream(Seq(rec).toDF("j"), "j",
      conf.copy(viewOnRemove = "OLD_IMAGE")).collect()(0)
    assert(viaOld.getAs[String]("data") === """{"a":"old"}""")
    // OLD_IMAGE configured but absent → falls back to new image
    val noOld = Cdc.ddbStream(
      Seq(ddbRecord("REMOVE", 5, 3, """{"a":{"S":"new"}}""")).toDF("j"), "j",
      conf.copy(viewOnRemove = "OLD_IMAGE")).collect()(0)
    assert(noOld.getAs[String]("data") === """{"a":"new"}""")
  }

  test("ddb: TTL delete requires the service principal on a REMOVE") {
    val ttl = Cdc.ddbStream(Seq(
      ddbRecord("REMOVE", 5, 1, """{}""",
        userIdentity = """{"PrincipalId":"dynamodb.amazonaws.com","Type":"Service"}"""),
      ddbRecord("REMOVE", 5, 2, """{}""",
        userIdentity = """{"PrincipalId":"user","Type":"Service"}"""),
      ddbRecord("MODIFY", 5, 3, """{}""",
        userIdentity = """{"PrincipalId":"dynamodb.amazonaws.com","Type":"Service"}"""))
      .toDF("j"), "j", conf)
      .orderBy("sequence_number").select("ttl_delete").as[Boolean].collect()
    assert(ttl.toSeq === Seq(true, false, false))
  }

  test("ddb: version counter is per second, ordered by sequence number") {
    val recs = Seq(
      ddbRecord("INSERT", 10, 100, """{}"""),
      ddbRecord("INSERT", 10, 99, """{}"""),
      ddbRecord("INSERT", 11, 101, """{}"""),
      // 2-digit seq after 3-digit: numeric (length-first) ordering wins
      ddbRecord("INSERT", 10, 98, """{}"""))
    val got = Cdc.ddbStream(recs.toDF("j"), "j", conf)
      .select("sequence_number", "document_version").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("98" -> 10000000L, "99" -> 10000001L,
      "100" -> 10000002L, "101" -> 11000000L))
  }

  test("ddb: malformed records quarantine with err, never throw") {
    val out = Cdc.ddbStream(Seq(
      "not json",
      """{"eventName":"INSERT"}""",
      ddbRecord("INSERT", 1, 1, """{"x":{"Q":"?"}}""")).toDF("j"), "j", conf)
    assert(out.where($"err".isNotNull).count() === 3)
  }

  private def mongoEvent(op: String, t: Long, i: Long, fullDoc: String,
      docKey: String = """{"_id":{"$oid":"64a3b2c1d4e5f60718293a4b"}}"""): String = {
    val fd = Option(fullDoc).map(d => s""","fullDocument":$d""").getOrElse("")
    s"""{"_id":{"_data":"rt$t-$i"},"operationType":"$op",
       |"clusterTime":{"$$timestamp":{"t":$t,"i":$i}},
       |"ns":{"db":"d","coll":"c"},"documentKey":$docKey$fd}"""
      .stripMargin.replace("\n", "")
  }

  test("mongo: BsonHelper converter semantics over canonical extended JSON") {
    val doc = """{"_id":{"$oid":"64a3b2c1d4e5f60718293a4b"},
      |"s":"txt","i":{"$numberInt":"7"},"l":{"$numberLong":"900719925474"},
      |"d":{"$numberDouble":"1.5"},"dec":{"$numberDecimal":"1.2E+3"},
      |"when":{"$date":{"$numberLong":"1700000000123"}},
      |"tsv":{"$timestamp":{"t":1700000000,"i":3}},
      |"bin":{"$binary":{"base64":"AQID","subType":"00"}},
      |"uid":{"$binary":{"base64":"AAECAwQFBgcICQoLDA0ODw==","subType":"04"}},
      |"re":{"$regularExpression":{"pattern":"^a.*","options":"i"}},
      |"mx":{"$maxKey":1},"un":{"$undefined":true},
      |"nested":{"deep":[{"$numberInt":"1"},{"$oid":"ffffffffffffffffffffffff"}]}}"""
      .stripMargin.replace("\n", "")
    val out = Cdc.mongoChange(
      Seq(mongoEvent("insert", 1700000001, 2, doc)).toDF("j"), "j").collect()(0)
    assert(out.getAs[String]("err") == null)
    assert(out.getAs[String]("data") ===
      """{"_id":"64a3b2c1d4e5f60718293a4b","s":"txt","i":7,"l":900719925474,""" +
        """"d":1.5,"dec":"1200","when":1700000000123,"tsv":1700000000,""" +
        """"bin":"AQID","uid":"00010203-0405-0607-0809-0a0b0c0d0e0f",""" +
        """"re":{"pattern":"^a.*","options":"i"},"mx":null,"un":null,""" +
        """"nested":{"deep":[1,"ffffffffffffffffffffffff"]}}""")
    assert(out.getAs[String]("partition_key") === "64a3b2c1d4e5f60718293a4b")
    assert(out.getAs[String]("documentdb_id_bson_type") === "ObjectId")
    assert(out.getAs[String]("documentdb_collection") === "d.c")
    assert(out.getAs[Long]("documentdb_timestamp") === 1700000001000L)
    // only event in its second → zero-based rank 0
    assert(out.getAs[Long]("document_version") === 1700000001000000L)
  }

  test("mongo: delete uses the document key; control events are dropped") {
    val rows = Cdc.mongoChange(Seq(
      mongoEvent("delete", 10, 1, null),
      mongoEvent("drop", 10, 2, null),
      mongoEvent("invalidate", 10, 3, null),
      mongoEvent("replace", 10, 4, """{"_id":5,"v":"x"}""",
        docKey = """{"_id":5}""")).toDF("j"), "j")
    val got = rows.orderBy("document_version").collect()
    assert(got.length === 2)
    assert(got(0).getAs[String]("documentdb_event_name") === "delete")
    assert(got(0).getAs[String]("opensearch_action") === "delete")
    assert(got(0).getAs[String]("data") === """{"_id":"64a3b2c1d4e5f60718293a4b"}""")
    assert(got(1).getAs[String]("data") === """{"_id":5,"v":"x"}""")
    assert(got(1).getAs[String]("partition_key") === "5")
    assert(got(1).getAs[String]("documentdb_id_bson_type") === "Number")
    // same second: versions are t*1e6 + zero-based i-rank
    assert(got(0).getAs[Long]("document_version") === 10000000L)
    assert(got(1).getAs[Long]("document_version") === 10000001L)
  }

  test("mongo: collection override and quarantine") {
    val rows = Cdc.mongoChange(Seq(
      mongoEvent("insert", 1, 1, """{"_id":"a"}"""),
      "garbage",
      mongoEvent("update", 2, 1, null)) // update without fullDocument
      .toDF("j"), "j", collection = Some("cfg.coll"))
    assert(rows.where($"err".isNull).select("documentdb_collection")
      .as[String].collect().toSeq === Seq("cfg.coll"))
    assert(rows.where($"err".isNotNull).count() === 2)
  }
}
