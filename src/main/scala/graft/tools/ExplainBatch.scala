// Batch plan capture for the optimization-round evidence trail:
//   runMain graft.tools.ExplainBatch <outDir> <suffix> <sfDir> [q1,q2,...]
// writes <outDir>/<query>_<suffix>.txt with the formatted physical plan of
// every requested query (default: the bench headline + tpch22 lists) in one
// JVM, so a 40-plan dump does not pay 40 session startups.
package graft.tools

import graft.{GraftSession, SparkEntry}

object ExplainBatch {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "/root/repo/plans/r13"
    val suffix = if (args.length > 1) args(1) else "before"
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 3) args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else (graft.Bench.headline ++ graft.Bench.tpch22).distinct
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
        .getOrElse(Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[explain] wrote $n")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
