package graft.tools

import graft.slt.SltRunner

/** Ad-hoc conformance triage: run reference slt files by name and print
  * pass/fail/skip summaries without the spec harness. Usage:
  *   runMain graft.tools.SltTriage file1.slt [file2.slt ...]
  */
object SltTriage {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/reference/datafusion/sqllogictest/test_files"
    args.foreach { f =>
      try {
        val path = if (f.startsWith("/")) f else s"$dir/$f"
        val r = SltRunner.runFile(spark.newSession(), path)
        println(s"== $f: ${r.summary}")
        r.skipped.groupBy(_._2).foreach { case (reason, xs) =>
          println(s"   skip x${xs.size} [l${xs.map(_._1).sorted.take(12).mkString(",")}]: $reason")
        }
        r.failures.take(12).foreach(x =>
          println(s"   FAIL l${x.line}: ${x.sql.take(150).replace('\n', ' ')} -> ${x.detail.take(200).replace('\n', ' ')}"))
        if (r.failures.size > 12) println(s"   ... ${r.failures.size - 12} more failures")
      } catch {
        case e: Throwable =>
          println(s"== $f: CRASH ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
          e.getStackTrace.filter(_.toString.contains("graft")).take(8).foreach(fr => println(s"   at $fr"))
      }
    }
    spark.stop()
  }
}
