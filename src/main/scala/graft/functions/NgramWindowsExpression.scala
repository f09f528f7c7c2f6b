package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass n-token window builder (r14): semantically identical to
  * `transform(sequence(0, size(a) - n), i -> concat_ws(' ', slice(a, i+1, n)))`
  * over a NON-NULL token array with size(a) ≥ n, but O(total bytes) instead
  * of O(total bytes × n): the tokens are space-joined ONCE into a single
  * byte buffer and each window is a zero-copy UTF8String slice
  * (offset + length) of that buffer — the §4.2 "re-slice bytes via a new
  * offsets array" trick in JVM form. The old expression sliced a fresh
  * n-element array and re-concatenated it per window (measured: the window
  * build was 533 ms of text_repeated_ngrams' 1.58 s steady profile, and
  * the giant per-window expression tree dominated an 8.8 s first-run
  * codegen bill).
  *
  * PRECONDITION (the only caller, Dedup.ngramWindows, guarantees both):
  * array elements are non-null (`words()` output) and callers filter
  * size ≥ n; shorter arrays yield an empty array defensively. */
object NgramWindowsKernel {
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](m)
    var total = m - 1 // single-space separators
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      require(t != null, "ngram_windows: token array must not contain NULL")
      toks(i) = t
      total += t.numBytes
      i += 1
    }
    val buf = new Array[Byte](total)
    val starts = new Array[Int](m)
    var off = 0
    i = 0
    while (i < m) {
      starts(i) = off
      toks(i).writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + off)
      off += toks(i).numBytes
      if (i < m - 1) { buf(off) = ' '; off += 1 }
      i += 1
    }
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      val s = starts(i)
      val e = starts(i + n - 1) + toks(i + n - 1).numBytes
      out(i) = UTF8String.fromAddress(buf, Platform.BYTE_ARRAY_OFFSET + s, e - s)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class NgramWindows(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "ngram_windows: n >= 1")

  override def prettyName: String = "ngram_windows"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "ngram_windows input must be ARRAY<STRING>")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NgramWindowsKernel.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramWindowsKernel.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
