object SltProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSparkLike.session()
    val f = args(0)
    val r = graft.slt.SltRunner.runFile(spark.newSession(),
      s"/root/reference/datafusion/sqllogictest/test_files/$f")
    println(s"PROBE ${r.passed} passed ${r.failures.size} failed")
    r.failures.foreach(x => println(s"PROBEFAIL ${x.line}: ${x.sql.replaceAll("\\s+"," ").take(100)} :: ${x.detail.replaceAll("\\s+"," ").take(120)}"))
  }
}
object TestSparkLike {
  def session(): org.apache.spark.sql.SparkSession = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
