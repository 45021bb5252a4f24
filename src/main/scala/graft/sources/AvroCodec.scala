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
    * reference's AvroOutputCodec. Paths go through the Hadoop FS API. */
  def writeContainer(df: DataFrame, path: String, schemaJson: String,
      jsonCol: String = "json"): Unit = {
    df.select(col(jsonCol)).foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val out = new org.apache.hadoop.fs.Path(f"$path/part-$pid%05d.avro")
        val fs = out.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val stream = fs.create(out, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.create(schema, stream)
        val datumReader = new GenericDatumReader[GenericRecord](schema)
        it.foreach { r =>
          val dec = DecoderFactory.get().jsonDecoder(schema, r.getString(0))
          writer.append(datumReader.read(null, dec))
        }
        writer.close()
      }
    }
  }
}
