package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Codegen bit-test probes over the BitmapJoin dense bitsets.
  *
  * r13 (optimization round): the probes were Scala-closure UDFs — a boxed
  * call per fact row at the hottest point of q4/q12/q21 (the filter inside
  * the lineitem scan). As Catalyst expressions the bit test inlines into
  * whole-stage codegen (no boxing, no UDF dispatch); the bitset rides the
  * expression as a referenced object, which Spark ships once per stage in
  * the broadcast task binary — the same distribution cost the explicit
  * `sparkContext.broadcast` paid.
  */

/** Set-membership probe (the LEFT SEMI filter): true iff bit `child` is set
  * in `exists`. NULL child → NULL (a WHERE drops it — EXISTS-false). */
case class BitmapExistsProbe(child: Expression, exists: Array[Long])
    extends UnaryExpression {

  override def prettyName: String = "bitmap_exists_probe"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("bitmap probe key must be BIGINT")
  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any = {
    val k = input.asInstanceOf[Long]
    val w = (k >>> 6).toInt
    k >= 0 && w < exists.length && (exists(w) & (1L << (k & 63))) != 0L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ex = ctx.addReferenceObj("exists", exists, "long[]")
      val w = ctx.freshName("w")
      s"""
         |final int $w = (int)($c >>> 6);
         |${ev.value} = $c >= 0L && $w < $ex.length &&
         |  ($ex[$w] & (1L << ($c & 63))) != 0L;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Tri-state flag probe: NULL when the key is absent from `exists`
  * (callers filter it out — the inner-join drop), else the flag bit. */
case class BitmapFlagProbe(child: Expression, exists: Array[Long],
    flags: Array[Long]) extends UnaryExpression {

  override def prettyName: String = "bitmap_flag_probe"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("bitmap probe key must be BIGINT")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val k = v.asInstanceOf[Long]
      val w = (k >>> 6).toInt
      val bit = 1L << (k & 63)
      if (k < 0 || w >= exists.length || (exists(w) & bit) == 0L) null
      else java.lang.Boolean.valueOf((flags(w) & bit) != 0L)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ex = ctx.addReferenceObj("exists", exists, "long[]")
    val fl = ctx.addReferenceObj("flags", flags, "long[]")
    val c = child.genCode(ctx)
    val w = ctx.freshName("w")
    val bit = ctx.freshName("bit")
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;
        if (!${c.isNull}) {
          final int $w = (int)(${c.value} >>> 6);
          final long $bit = 1L << (${c.value} & 63);
          if (${c.value} >= 0L && $w < $ex.length && ($ex[$w] & $bit) != 0L) {
            ${ev.isNull} = false;
            ${ev.value} = ($fl[$w] & $bit) != 0L;
          }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
