package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KPL aggregated-record deaggregation — the Kinesis WIRE reality the
  * reference consumes through the KCL inside its kinesis source
  * (`kinesis-source/.../KinesisSource.java:44`; the consumer library
  * deaggregates transparently). The container format is the public KPL
  * aggregation spec (aws/amazon-kinesis-producer `aggregation-format.md`):
  *
  * {{{
  *   0xF3 0x89 0x9A 0xC2 | protobuf AggregatedRecord | md5(protobuf)
  *   AggregatedRecord: repeated string partition_key_table = 1;
  *                     repeated string explicit_hash_key_table = 2;
  *                     repeated Record records = 3;
  *   Record: uint64 partition_key_index = 1;
  *           uint64 explicit_hash_key_index = 2;  // optional
  *           bytes data = 3;
  * }}}
  *
  * Decoded with the same own-kernel proto3 reader as OTLP
  * ([[OtlpProto.Reader]]). KCL-compatible fallbacks: a payload without
  * the magic, with a failed md5 checksum, or with a corrupt protobuf
  * body is passed through as ONE raw record (null partition key) — the
  * quarantine contract, never an exception out of the scan. One decode
  * projection + one explode; no shuffle. */
object KinesisAgg {

  private val Magic = Array(0xF3, 0x89, 0x9A, 0xC2).map(_.toByte)

  final case class KRecord(partitionKey: String, explicitHashKey: String,
      data: Array[Byte])

  private def md5(b: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(b, from, to - from)
    md.digest()
  }

  /** JVM kernel: one aggregated payload → its sub-records (or itself). */
  def deaggregateLocal(payload: Array[Byte]): Seq[KRecord] = {
    if (payload == null) return Seq.empty
    val raw = Seq(KRecord(null, null, payload))
    if (payload.length < 4 + 16 ||
      payload(0) != Magic(0) || payload(1) != Magic(1) ||
      payload(2) != Magic(2) || payload(3) != Magic(3)) return raw
    val bodyEnd = payload.length - 16
    val sum = md5(payload, 4, bodyEnd)
    var i = 0
    while (i < 16) {
      if (sum(i) != payload(bodyEnd + i)) return raw // checksum fail → raw
      i += 1
    }
    try {
      val r = new OtlpProto.Reader(payload, 4, bodyEnd)
      val pks = Seq.newBuilder[String]
      val ehks = Seq.newBuilder[String]
      val recs = Seq.newBuilder[(Long, Option[Long], Array[Byte])]
      while (r.hasMore) {
        val tag = r.readVarint().toInt
        (tag >> 3, tag & 7) match {
          case (1, 2) => pks += r.readString()
          case (2, 2) => ehks += r.readString()
          case (3, 2) =>
            val rr = r.sub()
            var pki = 0L
            var ehki: Option[Long] = None
            var data: Array[Byte] = Array.emptyByteArray
            while (rr.hasMore) {
              val t = rr.readVarint().toInt
              (t >> 3, t & 7) match {
                case (1, 0) => pki = rr.readVarint()
                case (2, 0) => ehki = Some(rr.readVarint())
                case (3, 2) => data = rr.readBytes()
                case (_, w) => rr.skip(w)
              }
            }
            recs += ((pki, ehki, data))
          case (_, w) => r.skip(w)
        }
      }
      val pkt = pks.result()
      val ehkt = ehks.result()
      val out = recs.result().map { case (pki, ehki, data) =>
        KRecord(
          if (pki >= 0 && pki < pkt.size) pkt(pki.toInt) else null,
          ehki.filter(i => i >= 0 && i < ehkt.size)
            .map(i => ehkt(i.toInt)).orNull,
          data)
      }
      if (out.isEmpty) raw else out
    } catch { case scala.util.control.NonFatal(_) => raw }
  }

  private val deagg = udf { (payload: Array[Byte]) =>
    deaggregateLocal(payload)
  }

  /** Explode a binary column of Kinesis record payloads into one row per
    * deaggregated sub-record: `record_pos`, `partition_key`,
    * `explicit_hash_key`, `data`. Other columns pass through. */
  def deaggregate(df: DataFrame, bytesCol: String): DataFrame =
    df.select(df.columns.filter(_ != bytesCol).map(col).toSeq :+
        posexplode(deagg(col(bytesCol))).as(Seq("record_pos", "_r")): _*)
      .withColumn("partition_key", col("_r")("partitionKey"))
      .withColumn("explicit_hash_key", col("_r")("explicitHashKey"))
      .withColumn("data", col("_r")("data"))
      .drop("_r")

  /** Fixture-side encoder (the decode path is under test): aggregate
    * (partitionKey, data) pairs into one KPL container. */
  def aggregateLocal(records: Seq[(String, Array[Byte])]): Array[Byte] = {
    val pkt = records.map(_._1).distinct
    val idx = pkt.zipWithIndex.toMap
    val w = new OtlpProto.Writer
    pkt.foreach(w.str(1, _))
    records.foreach { case (pk, data) =>
      w.msg(3, new OtlpProto.Writer()
        .varintField(1, idx(pk).toLong)
        .bytesField(3, data))
    }
    val body = w.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, Magic.length)
    out.write(body, 0, body.length)
    val sum = md5(body, 0, body.length)
    out.write(sum, 0, sum.length)
    out.toByteArray
  }
}
