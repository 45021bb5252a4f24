package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: anchored regex over query names — builder-side
    // iteration on a query subset; the driver always runs the full set
    val nameFilter = args.lift(2).map(_.r)
    def wanted(name: String): Boolean =
      nameFilter.forall(_.pattern.matcher(name).matches())
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Data-Prepper parity semantics: convert_type is null-on-failure and
      // hash folds wrap (Java semantics), so ANSI strict mode is off.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Fixture tables for oracles over driver-invisible synthetic inputs:
    // written into outDir so the oracle SQL (with ${GRAFT_OUT} substituted
    // below) can read them with read_parquet(). text/lang here are the
    // generator's ground truth, not engine output.
    graft.corpus.SyntheticCorpus.generate(spark, 500, seed = 42L)
      .select("url", "text", "lang")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/fixture_corpus")
    graft.ops.Multimodal.synthesize(spark, 200).toDF()
      .select("media_id", "modality", "n_frames")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/fixture_media")
    graft.ops.Multimodal.decodeFixture(spark, 100)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/fixture_decode")
    SparkEntry.queries.foreach { case (name, fn) =>
      if (wanted(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val outAbs = Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => wanted(k) }
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("${GRAFT_OUT}", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
