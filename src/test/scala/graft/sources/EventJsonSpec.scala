package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventJsonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val doc =
    """{"version":"2.12","events":[
      |{"data":{"msg":"hello","code":7},
      | "metadata":{"eventType":"LOG","tags":["a","b"],
      |   "attributes":{"k":"v"},"timeReceived":1700000000.25}},
      |{"data":{"msg":"world","code":9},"metadata":{}},
      |{"metadata":{"eventType":"LOG"}}
      |]}""".stripMargin.replaceAll("\n", "")

  test("decode: data to columns, metadata to _meta, null-data skipped") {
    import spark.implicits._
    val out = EventJson.decode(Seq(doc).toDF("j"), "j",
      "msg STRING, code INT", overrideTimeReceived = true)
      .orderBy("code").collect()
    assert(out.length == 2) // third event has no data -> dropped
    val r = out(0)
    assert(r.getAs[String]("msg") == "hello" && r.getAs[Int]("code") == 7)
    val meta = r.getAs[org.apache.spark.sql.Row]("_meta")
    assert(meta.getAs[String]("event_type") == "LOG")
    assert(meta.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("a", "b"))
    assert(meta.getAs[Map[String, String]]("attributes") == Map("k" -> "v"))
    assert(meta.getAs[java.sql.Timestamp]("time_received").getTime == 1700000000250L)
    // defaulted metadata on the second event
    val m2 = out(1).getAs[org.apache.spark.sql.Row]("_meta")
    assert(m2.getAs[String]("event_type") == "LOG")
    assert(m2.getAs[scala.collection.Seq[String]]("tags").isEmpty)
  }

  test("incompatible major version drops the whole document") {
    import spark.implicits._
    val v3 = doc.replace("\"version\":\"2.12\"", "\"version\":\"3.0\"")
    assert(EventJson.decode(Seq(v3).toDF("j"), "j", "msg STRING, code INT")
      .count() == 0)
    assert(EventJson.decode(Seq("not json").toDF("j"), "j", "msg STRING")
      .count() == 0)
  }

  test("round-trip: encode partitions to documents, decode back") {
    import spark.implicits._
    val in = Seq(("x", 1), ("y", 2), ("z", 3)).toDF("msg", "code")
      .withColumn("_meta", struct(
        lit("LOG").as("event_type"),
        array(lit("t1")).as("tags"),
        map(lit("src"), col("msg")).as("attributes"),
        timestamp_micros(col("code") * 1000000L).as("time_received")))
    val docs = EventJson.documents(
      EventJson.eventObjects(in.repartition(2), Seq("msg", "code")))
    val back = EventJson.decode(docs.toDF().withColumnRenamed("value", "j"),
      "j", "msg STRING, code INT", overrideTimeReceived = true)
    val rows = back.orderBy("code").collect()
    assert(rows.map(r => (r.getAs[String]("msg"), r.getAs[Int]("code"))).toSeq ==
      Seq(("x", 1), ("y", 2), ("z", 3)))
    val m = rows(1).getAs[org.apache.spark.sql.Row]("_meta")
    assert(m.getAs[Map[String, String]]("attributes") == Map("src" -> "y"))
    assert(m.getAs[java.sql.Timestamp]("time_received").getTime == 2000L)
    // each partition produced ONE well-formed document
    assert(docs.count() <= 2)
    docs.collect().foreach(d => assert(d.startsWith("{\"version\":\"2.12\",\"events\":[")))
  }
}
