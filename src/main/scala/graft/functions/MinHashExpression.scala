package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash signature kernel: text → the k per-seed minima in ONE pass
  * per document, with no shingle explode and no aggregation.
  *
  * Semantics are bit-identical to the composed form the DuckDB oracle
  * reproduces (PipelineQueries dedup_minhash_* CTEs):
  * words = single-space split, empties dropped; shingles = 3-word windows
  * (whole text when < 3 words); hash_i(sh) = 8-hex-char slice i%4 of
  * md5("(i/4)|" + sh); signature_i = lexicographic min over shingles.
  * Four 32-bit hashes per md5 call, so k=8 costs 2 digests per shingle.
  *
  * Replaces explode → per-shingle md5 Columns → map-side-combined groupBy:
  * the row count through the plan stays |docs| (not |docs|×|shingles|) and
  * the signature stage needs NO shuffle at all — at 100 TB the only
  * shuffle left in the minhash pipeline is the band-bucket aggregation.
  * Heavy per-row compute, so CodegenFallback (an interpreted call from the
  * generated stage) costs nothing relative to the md5 work.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "k >= 1")
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val hexDigits = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = hexDigits(b >>> 4)
      out(2 * i + 1) = hexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val ws = text.split(" ", -1).filter(_.nonEmpty)
    val shingles: Array[String] =
      if (ws.length < 3) Array(ws.mkString(" "))
      else Array.tabulate(ws.length - 2)(j => ws(j) + " " + ws(j + 1) + " " + ws(j + 2))
    val nSalts = (k + 3) / 4
    val mins = new Array[String](k)
    val md = MessageDigest.getInstance("MD5")
    var s = 0
    while (s < shingles.length) {
      val sh = shingles(s)
      var salt = 0
      while (salt < nSalts) {
        md.reset()
        val hex = toHex(md.digest((salt.toString + "|" + sh).getBytes(StandardCharsets.UTF_8)))
        var j = 0
        while (j < 4 && salt * 4 + j < k) {
          val i = salt * 4 + j
          val slice = hex.substring(8 * j, 8 * j + 8)
          if (mins(i) == null || slice.compareTo(mins(i)) < 0) mins(i) = slice
          j += 1
        }
        salt += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
