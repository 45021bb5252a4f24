package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.SplitMix64

/** Source/codec parity (SURVEY.md §2.1/§2.3).
  *
  * The reference's sources are servers/pollers feeding a buffer; its codecs
  * decode object payloads (newline, json, ndjson, csv, parquet, multiline).
  * Batch-first Spark collapses both: a source is a `spark.read` (or
  * `readStream`, see graft.streaming) and the codec is the format. These
  * wrappers exist to make the mapping explicit, carry the reference's
  * little decode conventions, and centralize path-level options.
  *
  * Not available offline in this sandbox (documented, not faked):
  * spark-avro data source, Kafka connector — the call shape would be
  * `spark.read.format("avro")` / `readStream.format("kafka")` unchanged.
  */
object Sources {

  /** `newline` codec (newline-codecs/.../NewlineDelimitedInputCodec.java:26):
    * one event per line, optional header skip. */
  def newlineDelimited(spark: SparkSession, path: String,
      skipLines: Int = 0): DataFrame = {
    val lines = spark.read.textFile(path)
    if (skipLines <= 0) lines.toDF("message")
    else {
      // header skip is per FILE (the codec skips the object's first lines)
      import spark.implicits._
      lines.withColumn("_file", input_file_name())
        .withColumn("_i", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"_file")
            .orderBy(monotonically_increasing_id())))
        .filter($"_i" > skipLines).select($"value".as("message"))
    }
  }

  /** `ndjson` codec: tolerant JSON-lines (parse errors → `_corrupt`). */
  def ndjson(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        schemaDdl + ", _corrupt STRING"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** `csv` codec (csv-processor/.../CsvInputCodec.java:40). */
  def csv(spark: SparkSession, path: String, header: Boolean = true,
      delimiter: String = ","): DataFrame =
    spark.read.option("header", header.toString)
      .option("sep", delimiter).option("inferSchema", "false").csv(path)

  /** `parquet` codec — with the scan-pruning the reference's S3 Select
    * pushdown approximates (S3SelectObjectWorker.java): filters/projection
    * reach the parquet reader via Catalyst, nothing to do here. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** `multiline` codec (multiline-codecs/.../MultilineInputCodec.java:50):
    * group physical lines into events; a new event starts when the line
    * matches `startPattern`. wholeTextFiles-free: per-file window scan. */
  def multiline(spark: SparkSession, path: String, startPattern: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"_file").orderBy($"_id")
    spark.read.textFile(path)
      .withColumn("_file", input_file_name())
      .withColumn("_id", monotonically_increasing_id())
      .withColumn("_start", when($"value".rlike(startPattern), 1).otherwise(0))
      .withColumn("_grp", sum($"_start").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"_file", $"_grp")
      .agg(concat_ws("\n", collect_list($"value")).as("message"))
      .select($"message")
  }

  /** `log_generator` source parity (log-generator-source/.../
    * LogGeneratorSource.java:26): deterministic synthetic Apache-style
    * log lines — the dev/test firehose, seeded and distributed. */
  def logGenerator(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[String] = {
    import spark.implicits._
    val methods = Array("GET", "POST", "PUT", "DELETE")
    val paths = Array("/", "/index.html", "/api/v1/items", "/login", "/static/app.js")
    val codes = Array(200, 200, 200, 301, 404, 500)
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism).map { id =>
      val r = SplitMix64.stream(seed, id)
      val ip = s"${10 + r.nextInt(240)}.${r.nextInt(256)}.${r.nextInt(256)}.${r.nextInt(256)}"
      val m = methods(r.nextInt(methods.length))
      val p = paths(r.nextInt(paths.length))
      val c = codes(r.nextInt(codes.length))
      val bytes = 100 + r.nextInt(9000)
      f"""$ip - - [01/Jan/2026:00:${r.nextInt(60)}%02d:${r.nextInt(60)}%02d +0000] "$m $p HTTP/1.1" $c $bytes"""
    }
  }
}
