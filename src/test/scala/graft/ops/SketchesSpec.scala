package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("below k the sketch IS the distinct set: exact counts, dup-proof") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("k", "v")
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(df, Seq("k"), "v", k = 8), k = 8)
      .select("k", "sketch_size", "est_distinct")
      .as[(String, Int, Double)].collect().sortBy(_._1)
    assert(est.toSeq == Seq(("a", 2, 2.0), ("b", 1, 1.0)))
  }

  test("estimate is sane at k=64 over 500 distinct values") {
    val df = (1 to 500).map(i => ("g", s"value-$i")).toDF("k", "v")
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(df, Seq("k"), "v", k = 64), k = 64)
      .select("est_distinct").as[Double].collect()(0)
    assert(est > 250 && est < 1000, s"est $est wildly off for 500 distinct")
  }

  test("sketches merge losslessly: sketch(A ∪ B) == merge(sketch(A), sketch(B))") {
    val a = (1 to 300).map(i => ("g", s"a-$i")).toDF("k", "v")
    val b = (1 to 300).map(i => ("g", s"${if (i % 3 == 0) "a" else "b"}-$i"))
      .toDF("k", "v") // overlapping values
    val k = 32
    val direct = Sketches.kmvSketch(a.unionByName(b), Seq("k"), "v", k)
      .select("kmv").as[Seq[String]].collect()(0)
    val merged = Sketches.mergeSketches(
      Sketches.kmvSketch(a, Seq("k"), "v", k),
      Sketches.kmvSketch(b, Seq("k"), "v", k), Seq("k"), k)
      .select("kmv").as[Seq[String]].collect()(0)
    assert(direct == merged)
    assert(direct.length == k && direct == direct.sorted && direct.distinct == direct)
  }

  test("streaming micro-batches: per-batch sketches fold to the full-data sketch") {
    import spark.implicits._
    val work = graft.TestSpark.tmpDir("graft-skmv")
    val all = (1 to 600).map(i => (s"k${i % 2}", s"v-$i"))
    all.grouped(200).foreach { chunk =>
      chunk.toDF("k", "v").coalesce(1)
        .write.mode("append").parquet(s"$work/in")
    }
    val k = 24
    // running sketch folded across micro-batches (the foreachBatch shape:
    // sketch each batch, merge into the accumulator — sketch rows are ≤ k
    // hashes per key, so the accumulator is driver-tiny by construction)
    var acc: Seq[(String, Seq[String])] = Seq.empty
    val stream = spark.readStream.schema("k STRING, v STRING")
      .option("maxFilesPerTrigger", 1).parquet(s"$work/in")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sk = Sketches.kmvSketch(batch, Seq("k"), "v", k)
        val merged =
          if (acc.isEmpty) sk
          else Sketches.mergeSketches(acc.toDF("k", "kmv"), sk, Seq("k"), k)
        acc = merged.select("k", "kmv").as[(String, Seq[String])]
          .collect().toSeq
        ()
      }
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val direct = Sketches.kmvSketch(all.toDF("k", "v"), Seq("k"), "v", k)
      .select("k", "kmv").as[(String, Seq[String])].collect().toSeq.sortBy(_._1)
    assert(acc.sortBy(_._1) == direct)
  }

  test("deterministic under repartitioning") {
    val df = (1 to 400).map(i => (s"k${i % 3}", s"v-$i")).toDF("k", "v")
    val s1 = Sketches.kmvSketch(df.repartition(1), Seq("k"), "v", 16)
      .orderBy("k").select("kmv").as[Seq[String]].collect().toSeq
    val s8 = Sketches.kmvSketch(df.repartition(8), Seq("k"), "v", 16)
      .orderBy("k").select("kmv").as[Seq[String]].collect().toSeq
    assert(s1 == s8)
  }
}
