package graft.tools

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.functions._

/** r13 kernel A/B: the pre-r13 MinHashSig inner loop (per-shingle String +
  * hex + substring churn), kept verbatim here as `OldMinHashSig`, vs the
  * shipped allocation-free kernel — same-JVM interleaved min-of-8 over the
  * sf0.1 documents corpus, plus a bit-equality sweep.
  * Usage: runMain graft.tools.MinHashLab [dir] */
object MinHashLab {

  case class OldMinHashSig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
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

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    // 10x-replicated corpus: enough per-pass kernel work that the md5
    // loop dominates scheduling jitter
    val docs = graft.Tables.load(spark, dir, "documents")
      .crossJoin(spark.range(10).select(col("id").as("__i")))
      .select((col("doc_id") * 10 + col("__i")).as("doc_id"), col("text"))
      .repartition(32, col("doc_id"))
      .localCheckpoint(true)
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}

    def run(old: Boolean) = docs.select(col("doc_id"),
      (if (old) column(OldMinHashSig(expression(col("text")), 8))
       else column(graft.functions.MinHashSig(expression(col("text")), 8)))
        .as("sig"))

    // bit-equality sweep first
    val a = run(true).collect().map(_.toString).sorted
    val b = run(false).collect().map(_.toString).sorted
    println(s"bit-identical over ${a.length} docs: ${a.sameElements(b)}")

    val variants = Seq("old kernel" -> true, "new kernel" -> false)
    variants.foreach(v => run(v._2).write.mode("overwrite").format("noop").save())
    val times = collection.mutable.Map[String, Vector[Double]]()
    for (_ <- 1 to 12; (tag, old) <- variants) {
      val t0 = System.nanoTime()
      run(old).write.mode("overwrite").format("noop").save()
      times(tag) = times.getOrElse(tag, Vector.empty) :+
        (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (tag, _) =>
      val ts = times(tag)
      println(f"$tag%-12s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
