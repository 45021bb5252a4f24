package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Avro codec parity (reference avro-codecs/.../AvroInputCodec.java /
  * AvroOutputCodec.java:38; SURVEY §2.3).
  *
  * The sandbox has avro-core but NOT the spark-avro DataSource (whose
  * `from_avro`/`to_avro` would be the one-line Spark-native form — the
  * call shape to migrate to when the jar is present). Until then this is
  * a documented JVM-kernel seam: container files are read through the
  * built-in `binaryFile` source + a per-partition DataFileReader, records
  * surface as JSON text (pair with `Processors.ParseJson` for typed
  * columns — same two-step shape the reference's codec→processor split
  * has). One file must fit in memory (binaryFile contract); ingest
  * objects are rolled far below that.
  */
object AvroCodec {

  /** Avro object-container files → one row per record: (file, json). */
  def readContainer(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (p, bytes) =>
          val reader = new DataFileReader[GenericRecord](
            new SeekableByteArrayInput(bytes),
            new GenericDatumReader[GenericRecord]())
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          while (reader.hasNext) out += ((p, reader.next().toString))
          reader.close()
          out
        }
      }.toDF("file", "json")
  }

  /** Column decoder for single binary-encoded avro datums (the event_json
    * / message-payload shape): binary column → JSON string column. */
  def parseDatum(schemaJson: String): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val f = new (Array[Byte] => String) with Serializable {
      @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
      @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
      def apply(bytes: Array[Byte]): String =
        if (bytes == null) null
        else {
          val dec = DecoderFactory.get().binaryDecoder(bytes, null)
          reader.read(null, dec).toString
        }
    }
    udf(f)
  }

  /** Write rows (as JSON strings in `jsonCol`) into avro object-container
    * files, one per non-empty partition — the output-codec role of the
    * reference's AvroOutputCodec. The session's Hadoop configuration
    * (credentials, fs schemes) ships to executors as a plain key/value
    * map; files commit via write-tmp + rename keyed on the task attempt,
    * so a retried/speculative task can't interleave with the winner
    * (last successful rename wins). */
  def writeContainer(df: DataFrame, path: String, schemaJson: String,
      jsonCol: String = "json"): Unit = {
    val hadoopConf = df.sparkSession.sessionState.newHadoopConf()
    val confMap: Array[(String, String)] = {
      val it = hadoopConf.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
      buf.toArray
    }
    df.select(col(jsonCol)).foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confMap.foreach { case (k, v) => conf.set(k, v) }
        val schema = new Schema.Parser().parse(schemaJson)
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val target = new org.apache.hadoop.fs.Path(f"$path/part-$pid%05d.avro")
        val tmp = new org.apache.hadoop.fs.Path(
          f"$path/.part-$pid%05d-attempt-${tc.taskAttemptId()}.avro.tmp")
        val fs = target.getFileSystem(conf)
        val stream = fs.create(tmp, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.create(schema, stream)
        val datumReader = new GenericDatumReader[GenericRecord](schema)
        it.foreach { r =>
          val dec = DecoderFactory.get().jsonDecoder(schema, r.getString(0))
          writer.append(datumReader.read(null, dec))
        }
        writer.close()
        if (fs.exists(target)) fs.delete(target, false)
        if (!fs.rename(tmp, target))
          throw new java.io.IOException(s"avro commit failed: $tmp -> $target")
      }
    }
  }
}
