package graft.functions

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
  *
  * r13 (optimization round): the inner loop is allocation-free. The md5
  * input is fed straight from the document's UTF-8 bytes (word boundaries
  * are byte offsets — a space is a single byte in UTF-8 and never part of a
  * multi-byte sequence, so byte-level tokenization equals
  * split(" ").filter(_.nonEmpty)); per-shingle/per-salt String building,
  * hex encoding and substring slicing are gone. The running minima are kept
  * as unsigned 32-bit ints (big-endian digest bytes): lexicographic order
  * on fixed-width lowercase hex IS unsigned numeric order, so comparing
  * ints and hex-encoding only the k winners at the end returns the same
  * strings. Measured sf0.1: the signature stage of dedup_minhash_stats /
  * dedup_cluster dropped ~2× (see OPTIMIZATION_r13.md).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "k >= 1")
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val hexDigits = "0123456789abcdef".toCharArray

  /** 8-char lowercase hex of an unsigned 32-bit value — identical to the
    * corresponding md5-hex slice. */
  private def hex8(v: Long): String = {
    val out = new Array[Char](8)
    var i = 0
    while (i < 8) {
      out(i) = hexDigits(((v >>> (28 - 4 * i)) & 0xf).toInt)
      i += 1
    }
    new String(out)
  }

  private val nSalts = (k + 3) / 4
  // "0|", "1|", ... — ASCII, so bytes == salt.toString+"|" under UTF-8
  private val saltPrefix: Array[Array[Byte]] =
    Array.tabulate(nSalts)(s => (s.toString + "|").getBytes("UTF-8"))
  private val Space = ' '.toByte

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].getBytes
    // tokenize: (offset, length) per non-empty single-space-separated token
    var nWords = 0
    var offs = new Array[Int](16)
    var lens = new Array[Int](16)
    var i = 0
    val n = raw.length
    while (i < n) {
      while (i < n && raw(i) == Space) i += 1
      if (i < n) {
        val start = i
        while (i < n && raw(i) != Space) i += 1
        if (nWords == offs.length) {
          offs = java.util.Arrays.copyOf(offs, nWords * 2)
          lens = java.util.Arrays.copyOf(lens, nWords * 2)
        }
        offs(nWords) = start
        lens(nWords) = i - start
        nWords += 1
      }
    }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = MessageDigest.getInstance("MD5")
    val digest = new Array[Byte](16)

    // one shingle = words [from, to]; < 3 words → a single shingle of all
    // words (empty text included: the digest input is just the salt prefix)
    def shingle(from: Int, to: Int): Unit = {
      var salt = 0
      while (salt < nSalts) {
        md.update(saltPrefix(salt))
        var w = from
        while (w <= to) {
          if (w > from) md.update(Space)
          md.update(raw, offs(w), lens(w))
          w += 1
        }
        md.digest(digest, 0, 16)
        var j = 0
        while (j < 4 && salt * 4 + j < k) {
          val idx = salt * 4 + j
          val v = ((digest(4 * j) & 0xffL) << 24) |
            ((digest(4 * j + 1) & 0xffL) << 16) |
            ((digest(4 * j + 2) & 0xffL) << 8) |
            (digest(4 * j + 3) & 0xffL)
          if (v < mins(idx)) mins(idx) = v
          j += 1
        }
        salt += 1
      }
    }

    if (nWords < 3) shingle(0, nWords - 1)
    else {
      var s = 0
      while (s + 2 < nWords) { shingle(s, s + 2); s += 1 }
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(hex8(m)): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
