package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Kafka/SQS consumer seams: everything short of the network hop — option
  * compilation, wire-column decode, envelope decode with MD5 verification,
  * attribute shaping — spec'd without any connector jar. */
class QueuesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------- kafka

  private def topic(serde: String = "plaintext") = Queues.KafkaTopic(
    "logs", groupId = "graft-g1", autoOffsetReset = "earliest",
    serdeFormat = serde)

  test("sparkOptions: plaintext listener, no auth") {
    val o = Queues.sparkOptions(Queues.KafkaConf(
      Seq("b1:9092", "b2:9092"), topic(), encryption = false))
    assert(o("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(o("subscribe") == "logs")
    assert(o("startingOffsets") == "earliest")
    assert(o("kafka.group.id") == "graft-g1")
    assert(o("kafka.security.protocol") == "PLAINTEXT")
    assert(!o.contains("kafka.sasl.mechanism"))
  }

  test("sparkOptions: TLS only; latest offsets; maxPollRecords throttles") {
    val o = Queues.sparkOptions(Queues.KafkaConf(Seq("b:9094"),
      topic().copy(autoOffsetReset = "latest", maxPollRecords = Some(5000L))))
    assert(o("kafka.security.protocol") == "SSL")
    assert(o("startingOffsets") == "latest")
    assert(o("maxOffsetsPerTrigger") == "5000")
  }

  test("sparkOptions: SASL PLAIN and SCRAM mechanisms compile to jaas configs") {
    val plain = Queues.sparkOptions(Queues.KafkaConf(Seq("b:9096"), topic(),
      auth = Some(Queues.KafkaAuth("plain", "u", "p"))))
    assert(plain("kafka.security.protocol") == "SASL_SSL")
    assert(plain("kafka.sasl.mechanism") == "PLAIN")
    assert(plain("kafka.sasl.jaas.config").contains("PlainLoginModule required"))
    assert(plain("kafka.sasl.jaas.config").contains("""username="u""""))
    val scram = Queues.sparkOptions(Queues.KafkaConf(Seq("b:9096"), topic(),
      encryption = false,
      auth = Some(Queues.KafkaAuth("scram_sha_512", "u2", "p2"))))
    assert(scram("kafka.security.protocol") == "SASL_PLAINTEXT")
    assert(scram("kafka.sasl.mechanism") == "SCRAM-SHA-512")
    assert(scram("kafka.sasl.jaas.config").contains("ScramLoginModule required"))
  }

  test("sparkOptions rejects bad offsets/mechanisms loudly") {
    intercept[IllegalArgumentException] {
      Queues.sparkOptions(Queues.KafkaConf(Seq("b:1"),
        topic().copy(autoOffsetReset = "none")))
    }
    intercept[IllegalArgumentException] { Queues.KafkaAuth("oauth", "u", "p") }
  }

  /** Fixture with the connector's exact wire schema. */
  private def wire(values: Seq[String]) =
    values.zipWithIndex.map { case (v, i) =>
      (s"k$i".getBytes("UTF-8"), v.getBytes("UTF-8"), "logs", 0,
        i.toLong, new java.sql.Timestamp(1700000000000L + i))
    }.toDF("key", "value", "topic", "partition", "offset", "timestamp")

  test("kafka decode: plaintext and bytes serde keep offsets/keys") {
    val out = Queues.decode(wire(Seq("hello", "world")), topic())
      .orderBy("kafka_offset")
      .select("message", "kafka_key", "kafka_topic", "kafka_offset")
      .as[(String, String, String, Long)].collect().toSeq
    assert(out == Seq(("hello", "k0", "logs", 0L), ("world", "k1", "logs", 1L)))
    val raw = Queues.decode(wire(Seq("xy")), topic("bytes"))
      .select("message").as[Array[Byte]].head()
    assert(new String(raw, "UTF-8") == "xy")
  }

  test("kafka decode: json serde flattens the value against the schema") {
    val sch = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType)))
    val out = Queues.decode(
      wire(Seq("""{"a":1,"b":"x"}""", """{"a":2,"b":"y"}""")),
      topic("json"), Some(sch))
      .orderBy("kafka_offset").select("a", "b", "kafka_offset")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "x", 0L), (2L, "y", 1L)))
    intercept[IllegalArgumentException] {
      Queues.decode(wire(Seq("{}")), topic("json"))
    }
  }

  // --------------------------------------------------------------- sqs

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sqsReceive: bodies, receipt plumbing, verified md5, attribute shaping") {
    val body1 = """{"evt":1}"""
    val body2 = "plain text"
    val payload =
      s"""{"Messages":[
         |{"MessageId":"m-1","ReceiptHandle":"rh-1",
         | "MD5OfBody":"${md5hex(body1)}",
         | "Body":${"\"" + body1.replace("\"", "\\\"") + "\""},
         | "Attributes":{"SentTimestamp":"123","ApproximateReceiveCount":"1"},
         | "MessageAttributes":{"TraceId":{"StringValue":"t-9","DataType":"String"}}},
         |{"MessageId":"m-2","ReceiptHandle":"rh-2",
         | "MD5OfBody":"deadbeefdeadbeefdeadbeefdeadbeef",
         | "Body":"$body2"}
         |]}""".stripMargin
    val out = Queues.sqsReceive(Seq(payload).toDF("resp"), "resp",
        "https://sqs.us-east-1.example/q1")
      .orderBy("message_id").collect()
    assert(out.length == 2)
    val r1 = out(0)
    assert(r1.getAs[String]("queue_url").endsWith("/q1"))
    assert(r1.getAs[String]("message_id") == "m-1")
    assert(r1.getAs[String]("receipt_handle") == "rh-1")
    assert(r1.getAs[String]("body") == body1)
    assert(r1.getAs[Boolean]("md5_ok"))
    // reference AttributeHandler: first letter lowercased
    val attrs = r1.getAs[Map[String, String]]("attributes")
    assert(attrs == Map("sentTimestamp" -> "123",
      "approximateReceiveCount" -> "1"))
    val mattrs = r1.getAs[Map[String, String]]("message_attributes")
    assert(mattrs == Map("traceId" -> "t-9"))
    // corrupted digest → quarantine flag, not an exception
    val r2 = out(1)
    assert(r2.getAs[String]("body") == body2)
    assert(!r2.getAs[Boolean]("md5_ok"))
    assert(r2.getAs[Map[String, String]]("attributes").isEmpty)
  }

  test("sqsReceive: caller columns named _r/_m survive (collision-proof temps)") {
    val body = "x"
    val payload =
      s"""{"Messages":[{"MessageId":"m-1","ReceiptHandle":"rh-1",
         | "MD5OfBody":"${md5hex(body)}","Body":"$body"}]}""".stripMargin
    val out = Queues.sqsReceive(
        Seq((payload, "keepR", "keepM")).toDF("resp", "_r", "_m"),
        "resp", "q")
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("_r") == "keepR")
    assert(out(0).getAs[String]("_m") == "keepM")
    assert(out(0).getAs[String]("body") == body)
    assert(out(0).getAs[Boolean]("md5_ok"))
  }

  test("sqsReceive is one projection — no shuffle in the decode plan") {
    val plan = Queues.sqsReceive(Seq("""{"Messages":[]}""").toDF("resp"),
      "resp", "q").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
  }

  // ----------------------------------------------------- kafka produce

  test("murmur2 matches independently computed vectors (incl. Kafka's published ones)") {
    // computed with a separate Python MurmurHash2 implementation;
    // "21" and "foobar" are the Kafka project's own published values
    val vectors = Seq(
      "" -> 275646681, "a" -> -1563381124, "ab" -> 316155434,
      "abc" -> 479470107, "abcd" -> -1323649548, "kafka" -> -798503068,
      "k-07" -> -1493134496, "hello-world" -> 1993811437,
      "21" -> -973932308, "foobar" -> -790332482)
    vectors.foreach { case (s, want) =>
      assert(Queues.murmur2(s.getBytes("UTF-8")) === want, s"key '$s'")
    }
  }

  test("produce: wire schema, templated key, deterministic default-partitioner placement") {
    val df = Seq((7L, "click", """{"id":7}"""), (9L, "view", """{"id":9}"""))
      .toDF("id", "etype", "body")
    val out = Queues.produce(df, "logs", "k-${id}", "body", numPartitions = 12)
      .orderBy("key").collect()
    assert(out.map(_.getAs[String]("topic")).toSeq == Seq("logs", "logs"))
    assert(new String(out(0).getAs[Array[Byte]]("key")) == "k-7")
    assert(new String(out(0).getAs[Array[Byte]]("value")) == """{"id":7}""")
    // partition = murmur2 & 0x7fffffff % 12, same kernel
    out.foreach { r =>
      val k = new String(r.getAs[Array[Byte]]("key"))
      assert(r.getAs[Int]("partition") ==
        (Queues.murmur2(k.getBytes) & 0x7fffffff) % 12)
    }
    // encode ∘ decode = identity on the wire columns
    val wire = Queues.produce(df, "logs", "k-${id}", "body", 12)
      .withColumn("offset", monotonically_increasing_id())
      .withColumn("timestamp", current_timestamp())
    val back = Queues.decode(wire, topic("plaintext"))
      .select("kafka_key", "message").as[(String, String)].collect().toSet
    assert(back == Set("k-7" -> """{"id":7}""", "k-9" -> """{"id":9}"""))
  }

  test("produce: empty key → null partition (client sticky choice); plan has no shuffle") {
    val df = Seq((1L, "x")).toDF("id", "body")
    val row = Queues.produce(df, "t", "", "body", 4).collect()(0)
    assert(row.isNullAt(row.fieldIndex("partition")))
    val plan = Queues.produce(df, "t", "k-${id}", "body", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"produce must not shuffle:\n$plan")
  }
}
