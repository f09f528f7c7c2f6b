package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `arrow_typeof(expr)` — the reference's type-introspection function
  * (reference: datafusion/functions/src/core/arrowtypeof.rs), rendering
  * the RESOLVED type in arrow's modern short Debug form ("Int64",
  * "Decimal128(10, 4)", "Timestamp(µs)", "List(Utf8)").
  *
  * Two literal-typing twists mirror the reference's SQL literal rules
  * (its bare integer literals are Int64 and fractional literals Float64,
  * where Spark parses Int32/Decimal): a DIRECT integer literal reports
  * Int64 and a direct fractional-decimal literal Float64. Anything
  * behind a cast or a column reports its actual resolved type, so
  * `1::int` is Int32 and a DECIMAL(10,4) column stays Decimal128(10, 4).
  *
  * Types carried under a graft convention report the CARRIER type
  * honestly (µs timestamps → Timestamp(µs), widened unsigned → the
  * signed carrier): the per-line pins in SltRunnerSpec name those
  * divergences explicitly.
  */
case class ArrowTypeOf(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true

  private lazy val rendered: UTF8String = {
    val name = child match {
      // the reference types bare SQL literals as Int64 / Float64
      case Literal(_, IntegerType) => "Int64"
      case Literal(_, _: DecimalType) => "Float64"
      case Cast(Literal(_, IntegerType), LongType, _, _) => "Int64"
      case _ => ArrowTypeOf.arrowName(child.dataType)
    }
    UTF8String.fromString(name)
  }

  override def eval(input: InternalRow): Any = rendered

  override protected def withNewChildInternal(newChild: Expression): ArrowTypeOf =
    copy(child = newChild)
}

object ArrowTypeOf {
  /** Spark type → arrow short Debug name. */
  def arrowName(t: DataType): String = t match {
    case NullType => "Null"
    case BooleanType => "Boolean"
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case StringType => "Utf8"
    case BinaryType => "Binary"
    case DateType => "Date32"
    case TimestampNTZType => "Timestamp(µs)"
    case TimestampType =>
      // Spark's TimestampType is session-zoned; arrow tags the zone when
      // one is set (UTC = the untagged default in the slt corpus)
      val zone = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
      if (zone == "UTC" || zone == "Etc/UTC" || zone == "+00:00")
        "Timestamp(µs)"
      else s"""Timestamp(µs, "$zone")"""
    case dt: DecimalType => s"Decimal128(${dt.precision}, ${dt.scale})"
    case ArrayType(e, _) => s"List(${arrowName(e)})"
    case MapType(k, v, _) =>
      // arrow's Map Debug: entries struct with non-null key; the value is
      // nullable in the reference's map builders regardless of content
      s"""Map("entries": non-null Struct("key": non-null ${arrowName(k)}, "value": ${arrowName(v)}), unsorted)"""
    case st: StructType =>
      st.fields.map { f =>
        val n = if (f.nullable) "" else "non-null "
        s""""${f.name}": $n${arrowName(f.dataType)}"""
      }.mkString("Struct(", ", ", ")")
    case CalendarIntervalType => "Interval(MonthDayNano)"
    // Spark 4.1's TimeType (behind a flag; current_time returns it)
    case other if other.typeName.startsWith("time") => "Time64(µs)"
    case _: DayTimeIntervalType => "Duration(µs)"
    case _: YearMonthIntervalType => "Interval(YearMonth)"
    case other => other.simpleString
  }
}
