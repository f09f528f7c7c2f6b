package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.{GraftSession, SparkEntry}

/** Ad-hoc stage profiler: runs one inventory query twice (steady state) and
  * prints per-stage wall time + task count + shuffle bytes, then the
  * formatted plan. Usage: runMain graft.tools.Profile <query> <sfDir>. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    // ad-hoc conf overrides (applied at build time so static core confs
    // like shuffle compression / local dirs take effect): "k=v;k=v"
    var b = GraftSession.builder(32)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b = b.config(k, v); println(s"conf $k=$v")
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var stages = List.empty[String]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        val m = si.taskMetrics
        val scope = si.rddInfos.flatMap(_.scope).map(_.name).distinct
          .mkString(">").take(90)
        stages ::= f"stage ${si.stageId}%3d ${ms.getOrElse(-1L)}%6d ms " +
          f"tasks=${si.numTasks}%3d shufW=${m.shuffleWriteMetrics.bytesWritten / 1024 / 1024}%4d MB " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1024 / 1024}%4d MB " +
          f"input=${m.inputMetrics.bytesRead / 1024 / 1024}%5d MB  [$scope]"
      }
    }

    def once(tag: String): org.apache.spark.sql.DataFrame = {
      stages = Nil
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"== $tag: $sec%.3f s")
      // listener events are delivered async; give the bus a moment so the
      // final stages' completions are included
      Thread.sleep(500)
      stages.reverse.foreach(println)
      df
    }

    once("warm-up run")
    // planning-only cost (analyze + optimize + physical planning, no exec)
    val tp = System.nanoTime()
    val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
    qe.executedPlan
    println(f"== planning only: ${(System.nanoTime() - tp) / 1e9}%.3f s")
    qe.tracker.phases.toSeq.sortBy(_._2.startTimeMs).foreach { case (phase, t) =>
      println(f"   phase $phase%-16s ${t.durationMs}%5d ms")
    }
    spark.sparkContext.addSparkListener(listener)
    once("steady run")
    // post-execution plan: shows what AQE actually ran (join conversions,
    // coalesced readers), unlike the initial plan explain() would print
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.toRdd.foreach(_ => ())
    println("== executed (adaptive, final) plan ==")
    println(df.queryExecution.executedPlan.toString.take(6000))
    println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
