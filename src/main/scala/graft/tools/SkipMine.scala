package graft.tools

import graft.slt.SltRunner

/** Skip-mining sweep: run the whole non-spark slt corpus and dump every
  * skip whose reason belongs to a convertible class (parse-syntax dialect
  * gaps, typed literals, EXPLAIN-over-dialect), with the SQL text at the
  * skipped line, grouped by normalized reason. Usage:
  *   runMain graft.tools.SkipMine [substring-filter] > /tmp/skips.txt
  */
object SkipMine {
  def main(args: Array[String]): Unit = {
    val filter = args.headOption.getOrElse("")
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File("/root/reference/datafusion/sqllogictest/test_files")
    val files = {
      def walk(d: java.io.File): Seq[java.io.File] =
        d.listFiles().toSeq.flatMap {
          case f if f.isDirectory && f.getName != "spark" => walk(f)
          case f if f.getName.endsWith(".slt") => Seq(f)
          case _ => Seq.empty
        }
      walk(dir).sortBy(_.getPath)
    }
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Int, String)]()
    var totPassed = 0; var totSkipped = 0; var totFailed = 0
    for (f <- files) {
      val rel = f.getPath.stripPrefix(dir.getPath + "/")
      try {
        val r = SltRunner.runFile(spark.newSession(), f.getPath)
        totPassed += r.passed; totSkipped += r.skipped.size
        totFailed += r.failures.size
        val lines = scala.io.Source.fromFile(f)("UTF-8").getLines().toArray
        for ((ln, reason) <- r.skipped if filter.isEmpty || reason.contains(filter)) {
          // the record's SQL starts on the line after the directive
          val sql = lines.drop(ln).takeWhile(l =>
            l.trim.nonEmpty && !l.startsWith("----")).mkString(" ").take(220)
          out += ((reason, rel, ln, sql))
        }
      } catch {
        case e: Throwable =>
          println(s"== $rel CRASH ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    println(s"TOTALS passed=$totPassed failed=$totFailed skipped=$totSkipped (mined=${out.size})")
    // group by a normalized reason (strip line-specific payload after ':')
    val grouped = out.groupBy(x => x._1).toSeq.sortBy(-_._2.size)
    for ((reason, xs) <- grouped) {
      println(s"\n### x${xs.size}  $reason")
      xs.sortBy(x => (x._2, x._3)).foreach { case (_, rel, ln, sql) =>
        println(f"  $rel%-40s l$ln%-5d $sql")
      }
    }
    spark.stop()
  }
}
