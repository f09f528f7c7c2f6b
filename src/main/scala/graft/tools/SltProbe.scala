package graft.tools

/** Debug entrypoint: run one reference .slt file and print per-line
  * failures. Developer tool only — not part of the engine surface. */
object SltProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val f = args(0)
    val r = graft.slt.SltRunner.runFile(spark.newSession(),
      s"/root/reference/datafusion/sqllogictest/test_files/$f")
    println(s"PROBE ${r.passed} passed ${r.failures.size} failed")
    r.failures.foreach(x => println(s"PROBEFAIL ${x.line}: ${x.sql.replaceAll("\\s+", " ").take(100)} :: ${x.detail.replaceAll("\\s+", " ").take(120)}"))
  }
}
