package graft.tools

/** Run a list of reference .slt files and print each file's summary plus
  * its skip lines matching a reason substring. Developer tool.
  * Usage: runMain graft.tools.SltBatch <reasonFilter> <file1> <file2> ... */
object SltBatch {
  def main(args: Array[String]): Unit = {
    val filter = args.headOption.getOrElse("")
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/reference/datafusion/sqllogictest/test_files"
    for (f <- args.drop(1)) {
      try {
        val r = graft.slt.SltRunner.runFile(spark.newSession(), s"$base/$f")
        println(s"== $f: ${r.passed} passed, ${r.failures.size} failed, ${r.skipped.size} skipped")
        r.skipped.filter(_._2.contains(filter)).sortBy(_._1)
          .foreach { case (l, why) => println(s"  SKIP l$l: $why") }
        r.failures.foreach(x => println(
          s"  FAIL l${x.line}: ${x.sql.replaceAll("\\s+", " ").take(90)} -> ${x.detail.replaceAll("\\s+", " ").take(160)}"))
      } catch { case e: Throwable =>
        println(s"== $f CRASH ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    spark.stop()
  }
}
