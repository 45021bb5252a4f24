package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: times each build phase in isolation at two
  * parallelism levels to localize anti-scaling. Not part of the engine. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val docsN = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "60000").toLong
    val work = java.nio.file.Files.createTempDirectory("graft-probe").toString

    def session(cores: Int) = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .appName(s"probe-$cores")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }

    // one-time corpus
    locally {
      val s = session(32)
      graft.corpus.SyntheticCorpus.generate(s, docsN, 42L, 64)
        .write.mode(SaveMode.Overwrite).parquet(s"$work/corpus")
      s.stop()
    }

    Seq(8, 32, 8, 32).foreach { cores =>
      val s = session(cores)
      import s.implicits._
      def t(name: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        System.err.println(f"[probe] cores=$cores%2d $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      val corpus = s.read.parquet(s"$work/corpus")
      t("warm-count")(corpus.count())
      val ex = udf((h: Array[Byte]) => graft.extract.HtmlText.extract(h))
      t("extract-count") {
        corpus.select(ex($"html").as("e")).select(sum(length($"e"))).head()
      }
      t("extract-sort-write") {
        corpus.withColumn("e", ex($"html")).select($"url", $"e", $"lang")
          .repartitionByRange(cores * 2, $"url").sortWithinPartitions("url")
          .write.mode(SaveMode.Overwrite).parquet(s"$work/docs-$cores")
      }
      t("tf-narrow-write") {
        s.read.parquet(s"$work/docs-$cores").select($"url", $"e")
          .as[(String, String)]
          .mapPartitions(_.flatMap { case (u, e) =>
            val (c, dl) = graft.analyze.Analyzer.termFreqsLocal(e)
            val it = c.entrySet().iterator()
            new Iterator[(String, String, Long, Long)] {
              def hasNext = it.hasNext
              def next() = { val kv = it.next(); (u, kv.getKey, kv.getValue, dl) }
            }
          }).toDF("url", "term", "tf", "dl")
          .write.mode(SaveMode.Overwrite).parquet(s"$work/tf-$cores")
      }
      t("df-shuffle") {
        s.read.parquet(s"$work/tf-$cores").groupBy($"term").count().count()
      }
      s.stop()
    }
  }
}
