package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnLift
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static type name of an expression (the engine's `typeof` operator
  * backend — reference grammar DataPrepperExpression.g4 typeOfOperator).
  *
  * FOLDABLE once resolved: with static schemas a column's type is a plan
  * constant, so the optimizer folds `TypeNameOf(col)` to a string literal
  * and a `typeof` comparison costs zero per row. (Spark 4.1's builtin
  * `typeof()` miscompiles inside codegen'd predicates — emits the type
  * name unquoted — and silently falls back to the interpreter, which is
  * exactly the hot-path regression this avoids.)
  */
case class TypeNameOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = child.resolved
  override def eval(input: InternalRow): Any =
    UTF8String.fromString(child.dataType.catalogString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      _ => "UTF8String.fromString(\"" + child.dataType.catalogString + "\")")
  override protected def withNewChildInternal(newChild: Expression): TypeNameOf =
    copy(child = newChild)
}

object TypeNameOf {
  /** Column-level entry: `typeNameOf($"x") === "bigint"`. */
  def apply(c: Column): Column =
    ColumnLift.column(TypeNameOf(ColumnLift.expression(c)))
}
