package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once file-sink pattern: foreachBatch writing each epoch into
  * its own directory (idempotent on retry), with the stream stopped and
  * RESTARTED from its checkpoint mid-input — rows must come out exactly
  * once across both runs. This is the recovery semantics a production
  * ingest pipeline leans on; the reference's unbounded execution has no
  * checkpoint story at all (its streams are process-lifetime).
  */
class StreamRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("restart from checkpoint continues without duplicating epochs") {
    val base = Paths.get(System.getProperty("java.io.tmpdir"), "stream_restart")
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    val srcDir = base.resolve("src"); Files.createDirectories(srcDir)
    val outDir = base.resolve("out").toString
    val ckDir = base.resolve("ck").toString
    import spark.implicits._

    def stage(n: Int): Unit =
      spark.range(n * 1000, (n + 1) * 1000).select($"id")
        .coalesce(1).write.mode("overwrite")
        .parquet(srcDir.resolve(s"f$n").toString + ".d")

    def runStream(): Unit = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT")
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString + "/*.d")
        .writeStream
        .option("checkpointLocation", ckDir)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
          // idempotent epoch sink: a retried epoch overwrites its own dir
          batch.write.mode("overwrite").parquet(s"$outDir/epoch=$epoch")
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    stage(0); stage(1)
    runStream()
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst == 2000, s"first run emitted $afterFirst rows")

    stage(2) // new data arrives while the stream is DOWN
    runStream() // restart from the same checkpoint
    val rows = spark.read.parquet(outDir).select($"id").as[Long].collect().sorted
    assert(rows.length == 3000, s"expected 3000 exactly-once rows, got ${rows.length}")
    assert(rows.toSeq == (0L until 3000L), "rows duplicated or lost across restart")
  }
}
