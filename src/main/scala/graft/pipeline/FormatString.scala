package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `${key}` / `${expr}` format-string templates → one `concat()` Column.
  *
  * Reference: JacksonEvent.formatStringInternal (data-prepper-api/.../
  * event/JacksonEvent.java:544-586) — each `${...}` is resolved first as
  * an event key, else evaluated as a Data-Prepper expression; surrounding
  * text is literal. The idiom appears throughout reference configs
  * (add_entries format values, opensearch index names, s3 object keys).
  *
  * Spark-first: the template compiles ONCE on the driver to
  * `concat(lit, col, lit, …)` — codegen'd, no per-row interpolation. A
  * null reference makes the whole result null (concat null propagation);
  * the reference throws per event instead, which has no per-row analog in
  * a columnar engine (documented divergence).
  */
object FormatString {

  private val Ref = "\\$\\{([^}]+)\\}".r

  /** A `${inner}` that is a bare key / json pointer (no operators). */
  private val PointerLike = "^/?[A-Za-z0-9_.-]+(?:/[A-Za-z0-9_.-]+)*$".r

  def compile(template: String): Column = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- Ref.findAllMatchIn(template)) {
      if (m.start > last) parts += lit(template.substring(last, m.start))
      val inner = m.group(1).trim
      val c = inner match {
        case PointerLike() =>
          val segs = inner.stripPrefix("/").split('/')
          segs.tail.foldLeft(col(segs.head))((c0, f) => c0.getField(f))
        case _ => ExprCompiler.compile(inner)
      }
      parts += c.cast("string")
      last = m.end
    }
    if (last < template.length) parts += lit(template.substring(last))
    if (parts.isEmpty) lit("")
    else if (parts.size == 1) parts.head
    else concat(parts.toSeq: _*)
  }
}
