package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** Pass-through that raises at EXECUTION when the child evaluates to NULL
  * — the error-class conformance shim for functions where the reference
  * raises a runtime error on values Spark silently nulls (make_date out of
  * range, make_time invalid components, failed numeric coercions). The
  * caller guards genuinely-NULL inputs separately, so only invalid
  * non-null inputs reach the throw. */
case class FailIfNull(child: Expression, message: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) throw new RuntimeException(s"Execution error: $message")
    v
  }

  override protected def withNewChildInternal(newChild: Expression): FailIfNull =
    copy(child = newChild)
}

/** Unconditional EXECUTION-time error: planned successfully, throws when
  * evaluated — for reference restrictions whose class is "Execution
  * error" (an analysis-time throw would be wrapped into Spark's
  * AnalysisException and land in the compile class). */
case class RaiseRuntime(message: String)
    extends org.apache.spark.sql.catalyst.expressions.LeafExpression
    with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.NullType
  override def nullable: Boolean = true
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any =
    throw new RuntimeException(s"Execution error: $message")
}
