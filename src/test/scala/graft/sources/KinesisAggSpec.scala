package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KinesisAggSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def rec(pk: String, s: String) = (pk, s.getBytes("UTF-8"))

  test("roundtrip: aggregate → deaggregate, shared partition-key table") {
    val payload = KinesisAgg.aggregateLocal(Seq(
      rec("pk-a", "one"), rec("pk-b", "two"), rec("pk-a", "three")))
    val out = KinesisAgg.deaggregateLocal(payload)
    assert(out.map(_.partitionKey) == Seq("pk-a", "pk-b", "pk-a"))
    assert(out.map(r => new String(r.data, "UTF-8")) ==
      Seq("one", "two", "three"))
    assert(out.forall(_.explicitHashKey == null))
  }

  test("non-aggregated payload passes through as one raw record") {
    val raw = "plain kinesis record".getBytes("UTF-8")
    val out = KinesisAgg.deaggregateLocal(raw)
    assert(out.size == 1 && out.head.partitionKey == null)
    assert(out.head.data.sameElements(raw))
  }

  test("checksum failure and corrupt protobuf fall back to raw (KCL contract)") {
    val payload = KinesisAgg.aggregateLocal(Seq(rec("pk", "data")))
    val flipped = payload.clone()
    flipped(flipped.length - 1) = (flipped(flipped.length - 1) ^ 0x1).toByte
    val out = KinesisAgg.deaggregateLocal(flipped)
    assert(out.size == 1 && out.head.partitionKey == null)
    assert(out.head.data.sameElements(flipped))
    // valid checksum over a corrupt body: recompute md5 over garbage
    val garbage = Array[Byte](0xF3.toByte, 0x89.toByte, 0x9A.toByte,
      0xC2.toByte) ++ Array[Byte](0x0B, 0x7F) ++ new Array[Byte](16)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sum = md.digest(Array[Byte](0x0B, 0x7F))
    System.arraycopy(sum, 0, garbage, 6, 16)
    val out2 = KinesisAgg.deaggregateLocal(garbage)
    assert(out2.size == 1 && out2.head.partitionKey == null)
  }

  test("deaggregate DataFrame: explode with passthrough columns") {
    import spark.implicits._
    val p1 = KinesisAgg.aggregateLocal(Seq(rec("a", "x"), rec("b", "y")))
    val p2 = "raw".getBytes("UTF-8")
    val df = Seq((1L, p1), (2L, p2)).toDF("seq", "payload")
    val out = KinesisAgg.deaggregate(df, "payload")
      .selectExpr("seq", "record_pos", "partition_key",
        "CAST(data AS STRING) AS s")
      .orderBy("seq", "record_pos")
      .as[(Long, Int, String, String)].collect().toSeq
    assert(out == Seq((1L, 0, "a", "x"), (1L, 1, "b", "y"),
      (2L, 0, null, "raw")))
  }
}
