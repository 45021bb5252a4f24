package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnLift
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All capture groups of the FIRST regex match, in one evaluation:
  * `regexp_first_match_groups(str, pattern)` → `array<string>` of groups
  * 1..groupCount (null array when no match, null elements for
  * non-participating groups).
  *
  * Why a custom expression: Spark's builtins force one full regex
  * evaluation PER GROUP (`regexp_extract(s, p, i)` k times) plus one for
  * the match test (`rlike`) — k+1 scans of every row for a k-capture grok
  * pattern. This runs the matcher ONCE; grok's per-field projection then
  * reads `element_at` from the array. Pattern must be a foldable literal
  * (grok compiles patterns on the driver). CodegenFallback: the regex
  * engine dominates either way, and fallback keeps the Pattern compiled
  * once per task rather than splicing matcher state into generated code.
  */
case class RegexpFirstMatchGroups(child: Expression, regex: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = regex
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      regex.eval(null).asInstanceOf[UTF8String].toString)

  override def eval(input: InternalRow): Any = {
    val s = child.eval(input)
    if (s == null) return null
    val m = pattern.matcher(s.asInstanceOf[UTF8String].toString)
    if (!m.find()) null
    else {
      val n = m.groupCount()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        out(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RegexpFirstMatchGroups =
    copy(child = newLeft, regex = newRight)
}

object RegexpFirstMatchGroups {
  def apply(str: Column, regex: String): Column =
    ColumnLift.column(RegexpFirstMatchGroups(
      ColumnLift.expression(str),
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(regex), StringType)))
}
