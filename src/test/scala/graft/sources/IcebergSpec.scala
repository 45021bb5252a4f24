package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Own-kernel Iceberg table-format reader: metadata chain, manifest-level
  * partition pruning, snapshot time travel, delete-file fail-fast. */
class IcebergSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String = TestSpark.tmpDir(s"graft-ice-$tag")

  private def sample = Seq(
    (1L, "alpha", "en"), (2L, "beta", "en"), (3L, "gamma", "de"),
    (4L, "delta", "de"), (5L, "epsilon", "fr"))
    .toDF("id", "text", "lang")

  test("write → read round-trips an unpartitioned table") {
    val dir = freshDir("plain")
    val snap = Iceberg.write(spark, sample, dir)
    assert(snap == 1L)
    val back = Iceberg.read(spark, dir)
      .select("id", "text", "lang").as[(Long, String, String)].collect().sortBy(_._1)
    assert(back.toSeq == sample.as[(Long, String, String)].collect().sortBy(_._1).toSeq)
    val meta = Iceberg.readMeta(spark, dir)
    assert(meta.currentSnapshotId.contains(1L) && meta.snapshots.size == 1)
  }

  test("manifest partition values prune files before any parquet read") {
    val dir = freshDir("part")
    Iceberg.write(spark, sample, dir, partitionCol = Some("lang"))
    val all = Iceberg.liveFiles(spark, dir)
    assert(all.map(_.partition("lang")).toSet == Set("en", "de", "fr"))
    val enOnly = Iceberg.liveFiles(spark, dir).filter(_.partition("lang") == "en")
    assert(enOnly.size < all.size) // the pruning is at the FILE level
    assert(all.map(_.recordCount).sum == 5)
    val rows = Iceberg.read(spark, dir,
      partitionPredicate = p => p("lang") == "en")
      .select("id").as[Long].collect().sorted
    assert(rows.toSeq == Seq(1L, 2L))
  }

  test("append creates a new snapshot; old snapshot stays time-travelable") {
    val dir = freshDir("tt")
    Iceberg.write(spark, sample, dir)
    val more = Seq((6L, "zeta", "en")).toDF("id", "text", "lang")
    val snap2 = Iceberg.append(spark, more, dir)
    assert(snap2 == 2L)
    assert(Iceberg.read(spark, dir).count() == 6)
    assert(Iceberg.read(spark, dir, snapshotId = Some(1L)).count() == 5)
    val meta = Iceberg.readMeta(spark, dir)
    assert(meta.currentSnapshotId.contains(2L) && meta.snapshots.map(_.id) == Seq(1L, 2L))
  }

  test("missing version-hint falls back to the highest vN.metadata.json") {
    val dir = freshDir("hint")
    Iceberg.write(spark, sample, dir)
    Iceberg.append(spark, Seq((9L, "eta", "en")).toDF("id", "text", "lang"), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/metadata/version-hint.text"), false)
    assert(Iceberg.readMeta(spark, dir).currentSnapshotId.contains(2L))
    assert(Iceberg.read(spark, dir).count() == 6)
  }

  test("v2 delete files fail fast instead of resurrecting deleted rows") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.GenericData
    val dir = freshDir("del")
    Iceberg.write(spark, sample, dir)
    // hand-craft a manifest whose entry carries content=1 (position deletes)
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"}]}}]}""".stripMargin)
    val dfr = new GenericData.Record(schema.getField("data_file").schema())
    dfr.put("content", 1)
    dfr.put("file_path", s"$dir/deletes.parquet")
    dfr.put("file_format", "PARQUET")
    dfr.put("record_count", 1L)
    val e = new GenericData.Record(schema)
    e.put("status", 1)
    e.put("data_file", dfr)
    val conf = spark.sparkContext.hadoopConfiguration
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val mp = s"$dir/metadata/snap99-m0.avro"
    w.create(schema, fs.create(new org.apache.hadoop.fs.Path(mp), true))
    w.append(e); w.close()
    // splice it into a new manifest list + metadata version
    val listSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"}]}""".stripMargin)
    val lr = new GenericData.Record(listSchema)
    lr.put("manifest_path", mp)
    lr.put("manifest_length", fs.getFileStatus(new org.apache.hadoop.fs.Path(mp)).getLen)
    lr.put("partition_spec_id", 0)
    val lw = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](listSchema))
    val lp = s"$dir/metadata/snap-99-1-list.avro"
    lw.create(listSchema, fs.create(new org.apache.hadoop.fs.Path(lp), true))
    lw.append(lr); lw.close()
    graft.index.IndexIO.writeString(s"$dir/metadata/v99.metadata.json",
      s"""{"format-version":2,"location":"$dir","current-snapshot-id":99,""" +
        s""""snapshots":[{"snapshot-id":99,"timestamp-ms":0,"manifest-list":"$lp"}]}""")
    graft.index.IndexIO.writeString(s"$dir/metadata/version-hint.text", "99")
    intercept[IllegalArgumentException] { Iceberg.liveFiles(spark, dir) }
  }
}
