package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}

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

/** Wire spelling for the probe payloads (r14): the bitsets/byte maps ride
  * SQL text and Substrait as base64 string literals —
  * `bitmap_exists_probe(key, '<b64>')` re-parses to the exact expression
  * (TextFunctions.builders registers the names in every session), so the
  * optimized q4/q12/q21/q9 plans cross the unparser and the Substrait
  * sweep instead of eroding the wire-coverage floor (r13 verdict item 9).
  * Payloads are small by construction — the same broadcast-threshold gate
  * that admits the probe bounds maxKey (bits or bytes). */
object ProbePayloadCodec {
  def encodeLongs(a: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(a.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(a)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }
  def decodeLongs(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    require(bytes.length % 8 == 0, "bitmap payload must be 8-byte aligned")
    val lb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer()
    val out = new Array[Long](bytes.length / 8)
    lb.get(out)
    out
  }
  def encodeBytes(a: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(a)
  def decodeBytes(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)
}

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

/** Dense byte-map probe (r14): the one-byte-payload generalization of
  * [[BitmapFlagProbe]] — `bytes(key)` holds a 1..255 payload, 0 means the
  * key is absent and the probe yields NULL (callers filter it out — the
  * inner-join drop). For q9's orders side the payload is
  * `year(o_orderdate) - 1900`, turning the fact⋈orders SHUFFLE_HASH (both
  * sides exchanged, 1.5M-entry hash relation built per partition) into an
  * in-scan codegen array index. Same scale gate as the bitmaps: maxKey
  * bytes must fit the broadcast threshold, else the caller falls back to
  * the exchange plan. */
case class ByteMapProbe(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  override def prettyName: String = "bytemap_probe"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("bytemap probe key must be BIGINT")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val k = v.asInstanceOf[Long]
      if (k < 0 || k >= bytes.length || bytes(k.toInt) == 0) null
      else java.lang.Integer.valueOf(bytes(k.toInt) & 0xff)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bm = ctx.addReferenceObj("bytes", bytes, "byte[]")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = 0;
        if (!${c.isNull} && ${c.value} >= 0L && ${c.value} < $bm.length
            && $bm[(int)${c.value}] != 0) {
          ${ev.isNull} = false;
          ${ev.value} = $bm[(int)${c.value}] & 0xff;
        }""")
  }

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
