package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time ONLY the headline operator queries on a testdata dir
  * (the full Bench main also rebuilds the index 8×). Not a driver
  * contract — used to iterate on query plans between rounds.
  * Usage: sbt "runMain graft.QueryBench /root/testdata/sf0.1 [q_name…]" */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq else Bench.HeadlineQueries
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        // run twice: second time is the warm measurement
        fn(spark, sfDir).count()
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        System.err.println(f"[qbench] $n%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$rows")
      }
    }
    spark.stop()
  }
}
