package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Diagnostic main: dumps ONE gate query's result parquet + oracle SQL so
  * a builder session can DuckDB-compare it without running the full
  * [[graft.Verify]] sweep. Usage:
  * `sbt "runMain graft.tools.QueryCheck <name> <sfDir> <outDir>"`.
  */
object QueryCheck {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      Files.writeString(Paths.get(s"$outDir/$name.sql"),
        sql.replace("${GRAFT_OUT}", Paths.get(outDir).toAbsolutePath.toString))
    }
    spark.stop()
  }
}
