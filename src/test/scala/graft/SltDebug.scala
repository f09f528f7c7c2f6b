package graft
object SltDebug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val file = args(0)
    val r = graft.slt.SltRunner.runFile(spark.newSession(),
      if (file.startsWith("/")) file else s"/root/reference/datafusion/sqllogictest/test_files/$file")
    println(r.summary)
    val lo = if (args.length > 1) args(1).toInt else 0
    val hi = if (args.length > 2) args(2).toInt else Int.MaxValue
    r.skipped.filter(s => s._1 >= lo && s._1 <= hi).sortBy(_._1)
      .foreach { case (l, why) => println(s"SKIP l$l: $why") }
    r.failures.filter(f => f.line >= lo && f.line <= hi)
      .foreach(f => println(s"FAIL l${f.line}: ${f.sql.take(100)} -> ${f.detail.take(1200)}"))
    spark.stop()
  }
}
