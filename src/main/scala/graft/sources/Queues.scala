package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Queue-consumer seams: Kafka and SQS, mirroring the Kinesis pattern
  * ([[KinesisAgg]]) — every piece of logic that does NOT require the
  * external system is running, tested code (config → connector options,
  * wire-envelope decode, checksum verification, metadata attribute
  * shaping); the network hop itself is the one documented seam.
  *
  * Kafka (reference kafka-plugins/.../KafkaSource.java:77 + its
  * KafkaSourceConfig/TopicConsumerConfig surface): Spark's own
  * `spark-sql-kafka-0-10` connector is the execution engine — the adapter
  * compiles the reference's config shape into the connector's option map
  * and standard wire-column decode. The connector JAR is absent in this
  * offline sandbox, so `load()` is exercised in deployments where the jar
  * is on the classpath; everything up to it is spec'd here
  * (QueuesSpec), making the jar's arrival config, not code.
  *
  * SQS (reference sqs-source/.../SqsWorker.java + AttributeHandler.java):
  * the ReceiveMessage response envelope is a PUBLIC wire format — the
  * decode (body, MD5-of-body verification, system/message attribute
  * flattening with the reference's first-letter-lowercased keys) runs as
  * one projection over any DataFrame of response payloads, exactly how
  * the CloudWatch/Kinesis decoders consume their fixtures.
  */
object Queues {

  // ------------------------------------------------------------- kafka

  /** Reference `authentication:` block subset: SASL PLAIN / SCRAM.
    * (MSK-IAM/OAuth are AWS-SDK-bound; out of subset, documented.) */
  final case class KafkaAuth(mechanism: String, username: String, password: String) {
    require(Set("plain", "scram_sha_256", "scram_sha_512")(mechanism.toLowerCase),
      s"unsupported sasl mechanism: $mechanism")
  }

  /** Reference `topics:` entry subset (TopicConsumerConfig): consumption
    * position, group identity, serde format of the value bytes. */
  final case class KafkaTopic(
      name: String,
      groupId: String,
      autoOffsetReset: String = "earliest", // earliest | latest
      serdeFormat: String = "plaintext", // plaintext | json | bytes
      maxPollRecords: Option[Long] = None)

  /** Reference `kafka:` source block subset (KafkaSourceConfig). */
  final case class KafkaConf(
      bootstrapServers: Seq[String],
      topic: KafkaTopic,
      encryption: Boolean = true, // reference EncryptionType default: ssl
      auth: Option[KafkaAuth] = None)

  /** Compile the reference config shape into the spark-sql-kafka option
    * map — the entire translation the connector needs. Pure function;
    * spec'd without the jar. */
  def sparkOptions(conf: KafkaConf): Map[String, String] = {
    require(conf.bootstrapServers.nonEmpty, "bootstrap_servers required")
    require(Set("earliest", "latest")(conf.topic.autoOffsetReset),
      s"auto_offset_reset must be earliest|latest, got ${conf.topic.autoOffsetReset}")
    val base = Map(
      "kafka.bootstrap.servers" -> conf.bootstrapServers.mkString(","),
      "subscribe" -> conf.topic.name,
      "startingOffsets" -> conf.topic.autoOffsetReset,
      "kafka.group.id" -> conf.topic.groupId)
    val throttle = conf.topic.maxPollRecords
      .map(n => Map("maxOffsetsPerTrigger" -> n.toString)).getOrElse(Map.empty)
    val security = (conf.encryption, conf.auth) match {
      case (true, None) => Map("kafka.security.protocol" -> "SSL")
      case (false, None) => Map("kafka.security.protocol" -> "PLAINTEXT")
      case (enc, Some(a)) =>
        val mech = a.mechanism.toUpperCase.replace('_', '-')
        val module =
          if (mech == "PLAIN") "org.apache.kafka.common.security.plain.PlainLoginModule"
          else "org.apache.kafka.common.security.scram.ScramLoginModule"
        Map(
          "kafka.security.protocol" -> (if (enc) "SASL_SSL" else "SASL_PLAINTEXT"),
          "kafka.sasl.mechanism" -> mech,
          "kafka.sasl.jaas.config" ->
            s"""$module required username="${a.username}" password="${a.password}";""")
    }
    base ++ throttle ++ security
  }

  /** Streaming consumer: reference KafkaSource.start — micro-batches of
    * the topic. The connector jar resolves at `load()`; absent jar →
    * loud provider-not-found, never silent. */
  def readStream(spark: SparkSession, conf: KafkaConf): DataFrame =
    decode(spark.readStream.format("kafka").options(sparkOptions(conf)).load(),
      conf.topic)

  /** Batch consumer over an offset range (backfills). */
  def readBatch(spark: SparkSession, conf: KafkaConf): DataFrame =
    decode(spark.read.format("kafka").options(sparkOptions(conf)).load(),
      conf.topic)

  /** Decode the connector's wire columns (key/value binary, topic,
    * partition, offset, timestamp) per the topic's serde_format —
    * reference MessageFormat: plaintext | json | bytes (avro rides the
    * engine's own [[AvroCodec]] over the bytes column). Runs on ANY
    * DataFrame with the kafka wire schema, so it is spec'd on fixtures. */
  def decode(wire: DataFrame, topic: KafkaTopic,
      jsonSchema: Option[StructType] = None): DataFrame = {
    val metaNames = Seq("kafka_topic", "kafka_partition", "kafka_offset",
      "kafka_timestamp", "kafka_key")
    val meta = Seq(col("topic").as("kafka_topic"),
      col("partition").as("kafka_partition"),
      col("offset").as("kafka_offset"),
      col("timestamp").as("kafka_timestamp"),
      col("key").cast("string").as("kafka_key"))
    topic.serdeFormat.toLowerCase match {
      case "plaintext" =>
        wire.select(col("value").cast("string").as("message") +: meta: _*)
      case "bytes" =>
        wire.select(col("value").as("message") +: meta: _*)
      case "json" =>
        val sch = jsonSchema.getOrElse(throw new IllegalArgumentException(
          "serde_format=json needs a value schema"))
        wire.select(from_json(col("value").cast("string"), sch).as("message") +: meta: _*)
          .select(col("message.*") +: metaNames.map(col): _*)
      case other =>
        throw new IllegalArgumentException(s"unsupported serde_format: $other")
    }
  }

  /** Kafka's client-side default partitioner hash — MurmurHash2 (Austin
    * Appleby's public-domain algorithm) with the Kafka client's seed
    * `0x9747b28c`, reimplemented from the published algorithm. Spec'd
    * against independently computed vectors including the Kafka
    * project's published test values ("21" → -973932308). */
  def murmur2(data: Array[Byte]): Int = {
    val m = 0x5bd1e995
    val r = 24
    val length = data.length
    var h = 0x9747b28c ^ length
    var i = 0
    while (i + 4 <= length) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 4
    }
    (length & 3) match {
      case 3 =>
        h ^= (data(i + 2) & 0xff) << 16
        h ^= (data(i + 1) & 0xff) << 8
        h ^= data(i) & 0xff
        h *= m
      case 2 =>
        h ^= (data(i + 1) & 0xff) << 8
        h ^= data(i) & 0xff
        h *= m
      case 1 =>
        h ^= data(i) & 0xff
        h *= m
      case _ => ()
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** PRODUCE side (reference kafka-plugins/.../KafkaCustomProducer.java:
    * `send(topicName, key, value)` with the partition key templated from
    * the event, `KafkaSinkConfig.getPartitionKey`): shape events into the
    * spark-sql-kafka WRITE schema — `(topic, partition, key, value)`
    * binary columns — so `df.write.format("kafka")` ships them unchanged
    * once the connector jar is present (the produce call is the
    * documented egress seam, like every emitter).
    *
    * The reference leaves partition choice to the Kafka client; we
    * pre-assign it with the client's OWN default algorithm —
    * `murmur2(keyBytes) & 0x7fffffff % numPartitions` — making placement
    * deterministic and replayable (null/empty keys, which the client
    * sticky-partitions nondeterministically, land on partition null =
    * client's choice). Zero shuffles: one projection.
    *
    * `keyTemplate` uses the reference's `${field}` format-string syntax
    * (`event.formatString`, compiled by [[graft.pipeline.FormatString]]). */
  def produce(df: DataFrame, topicName: String, keyTemplate: String,
      valueCol: String, numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, s"numPartitions >= 1, got $numPartitions")
    val key = graft.pipeline.FormatString.compile(keyTemplate)
    val part = udf { (k: String) =>
      if (k == null || k.isEmpty) None
      else Some((murmur2(k.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        & 0x7fffffff) % numPartitions)
    }
    df.select(
      lit(topicName).as("topic"),
      part(key).as("partition"),
      key.cast("binary").as("key"),
      col(valueCol).cast("binary").as("value"))
  }

  // --------------------------------------------------------------- sqs

  /** ReceiveMessage response JSON schema (public SQS wire shape). */
  private val sqsReceiveSchema = StructType(Seq(
    StructField("Messages", ArrayType(StructType(Seq(
      StructField("MessageId", StringType),
      StructField("ReceiptHandle", StringType),
      StructField("MD5OfBody", StringType),
      StructField("Body", StringType),
      StructField("Attributes", MapType(StringType, StringType)),
      StructField("MessageAttributes", MapType(StringType, StructType(Seq(
        StructField("StringValue", StringType),
        StructField("DataType", StringType)))))))))))

  /** Decode a DataFrame of SQS ReceiveMessage response payloads (one JSON
    * string per row) into one row per message: body + receipt plumbing +
    * verified MD5-of-body (`md5_ok=false` rows are the reference's
    * on_error=retain_messages quarantine surface, never an exception) +
    * the reference's metadata attributes (queueUrl, first-letter-lowered
    * system attributes, message attribute string values). */
  def sqsReceive(df: DataFrame, jsonCol: String, queueUrl: String): DataFrame = {
    val keep = df.columns.filterNot(_ == jsonCol).map(col)
    // collision-proof temp names: fixed "_r"/"_m" would silently shadow
    // caller columns of the same name (same ADVICE class as collapseTopK)
    var r = "_r"
    while (df.columns.contains(r)) r += "_"
    var m = "_m"
    while (df.columns.contains(m)) m += "_"
    val parsed = df.withColumn(r, from_json(col(jsonCol), sqsReceiveSchema))
      .select(col("*"), explode(col(s"$r.Messages")).as(m))
    val decoded = Seq(
      lit(queueUrl).as("queue_url"),
      col(s"$m.MessageId").as("message_id"),
      col(s"$m.ReceiptHandle").as("receipt_handle"),
      col(s"$m.Body").as("body"),
      (md5(col(s"$m.Body").cast("binary")) === lower(col(s"$m.MD5OfBody")))
        .as("md5_ok"),
      transform_keys(coalesce(col(s"$m.Attributes"),
          map().cast("map<string,string>")),
        (k, _) => concat(lower(k.substr(lit(1), lit(1))), k.substr(lit(2), length(k))))
        .as("attributes"),
      transform_values(
        transform_keys(coalesce(col(s"$m.MessageAttributes"),
            map().cast(
              "map<string,struct<StringValue:string,DataType:string>>")),
          (k, _) => concat(lower(k.substr(lit(1), lit(1))), k.substr(lit(2), length(k)))),
        (_, v) => v.getField("StringValue"))
        .as("message_attributes"))
    parsed.select(keep ++ decoded: _*)
  }
}
