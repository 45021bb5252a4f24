package graft.index

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Per-stage commit manifest — the engine's resumability unit.
  *
  * Modeled on the reference's lease/GlobalState source-coordination
  * (/root/reference/data-prepper-core/.../sourcecoordination/
  * LeaseBasedSourceCoordinator.java:43,243,305 and the iceberg source's
  * completion counters, leader/LeaderScheduler.java:302-331): every stage
  * records its inputs, row count, per-partition (per output file) lineage
  * and parameters, and commits via atomic rename. A re-run skips any stage
  * whose committed manifest matches the requested parameters; a killed
  * build therefore resumes from the last committed stage.
  *
  * Spark handles *intra*-job retry; manifests handle *inter*-job resume.
  */
final case class StageManifest(
    stage: String,
    status: String, // "committed"
    rows: Long,
    params: Map[String, String],
    inputs: Seq[String],
    perPartition: Seq[PartitionLineage],
    metrics: Map[String, String],
    attempt: Int)

final case class PartitionLineage(file: String, rows: Long)

object Manifest {
  private val mapper = new ObjectMapper()

  def path(indexDir: String, stage: String): String =
    s"$indexDir/_manifests/$stage.json"

  def write(indexDir: String, m: StageManifest): Unit = {
    val root: ObjectNode = mapper.createObjectNode()
    root.put("stage", m.stage)
    root.put("status", m.status)
    root.put("rows", m.rows)
    root.put("attempt", m.attempt)
    val p = root.putObject("params")
    m.params.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
    val in = root.putArray("inputs")
    m.inputs.foreach(in.add)
    val pp = root.putArray("perPartition")
    m.perPartition.sortBy(_.file).foreach { l =>
      val o = pp.addObject(); o.put("file", l.file); o.put("rows", l.rows)
    }
    val me = root.putObject("metrics")
    m.metrics.toSeq.sortBy(_._1).foreach { case (k, v) => me.put(k, v) }

    // commit = write-temp + rename through the Hadoop FS API (same pattern
    // as the reference's idempotent segment paths in its bulk-retry/DLQ
    // flow); works against file:, hdfs:, s3a:, … — see [[IndexIO]]
    IndexIO.writeString(path(indexDir, m.stage),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }

  def read(indexDir: String, stage: String): Option[StageManifest] = {
    val s = IndexIO.readString(path(indexDir, stage)).getOrElse(return None)
    try {
      val root = mapper.readTree(s)
      def strMap(n: JsonNode): Map[String, String] =
        if (n == null) Map.empty
        else n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      val pp =
        if (root.get("perPartition") == null) Seq.empty[PartitionLineage]
        else root.get("perPartition").elements().asScala.map { o =>
          PartitionLineage(o.get("file").asText(), o.get("rows").asLong())
        }.toSeq
      val in =
        if (root.get("inputs") == null) Seq.empty[String]
        else root.get("inputs").elements().asScala.map(_.asText()).toSeq
      Some(StageManifest(
        root.get("stage").asText(),
        root.get("status").asText(),
        root.get("rows").asLong(),
        strMap(root.get("params")),
        in,
        pp,
        strMap(root.get("metrics")),
        if (root.get("attempt") == null) 1 else root.get("attempt").asInt()))
    } catch { case _: Exception => None }
  }

  /** Committed with identical params → stage is reusable. */
  def isCommitted(indexDir: String, stage: String, params: Map[String, String]): Boolean =
    read(indexDir, stage).exists(m => m.status == "committed" && m.params == params)
}
