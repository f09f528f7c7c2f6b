package graft.tools

/** Dev probe: how does this Spark read unsigned / TIME parquet types? */
object TypeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(4)
      .config("spark.sql.timeType.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val t = spark.read.parquet("/tmp/ducktime.parquet")
      t.printSchema(); t.show(false)
      import org.apache.spark.sql.functions._
      t.select(col("t64_us").cast("string"), expr("hour(t64_us)"), expr("minute(t64_us)"), expr("second(t64_us)")).show(false)
    } catch { case e: Throwable => println("TIME READ FAILED: " + e.toString.take(400)) }
    spark.stop()
  }
}
