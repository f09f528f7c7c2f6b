// Plan inspection: sbt "runMain graft.tools.Explain <query> [sfdir]"
package graft.tools

import graft.{GraftSession, SparkEntry}

object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q6_filter")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(8)
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
