package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Query cancellation — the reference ships a whole bench family for this
  * (benchmarks/bench.sh `cancellation`; Tokio drop-based stream
  * cancellation). Spark's mechanism is job-group cancellation with task
  * interruption: a long-running query must abort promptly when its group
  * is cancelled, and the session must remain fully usable — on a shared
  * 1000-executor cluster, "kill the runaway query without restarting the
  * app" is day-one operational surface.
  */
class CancellationSpec extends AnyFunSuite {

  test("cancelJobGroup aborts a running query and the session survives") {
    val s = TestSpark.spark
    val ctx = s.sparkContext
    @volatile var outcome: Either[Throwable, Long] = Right(-1L)
    val t0 = System.nanoTime()
    val worker = new Thread(() => {
      try {
        ctx.setJobGroup("graft-cancel-test", "cancellation spec",
          interruptOnCancel = true)
        // ~100s of work if left alone: md5 over half a billion rows
        val n = s.range(500L * 1000 * 1000)
          .select(md5(concat_ws(":", col("id"), lit("salt"))).as("h"))
          .filter(col("h").startsWith("0000000"))
          .count()
        outcome = Right(n)
      } catch { case e: Throwable => outcome = Left(e) }
      finally ctx.clearJobGroup()
    })
    worker.start()
    Thread.sleep(2000) // let tasks actually start
    ctx.cancelJobGroup("graft-cancel-test")
    worker.join(60000)
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(!worker.isAlive, "worker thread did not terminate after cancel")
    assert(outcome.isLeft, s"query was not cancelled: $outcome")
    assert(elapsedSec < 45,
      f"cancellation took $elapsedSec%.1f s — tasks not interrupted")
    // the session is untouched: a fresh query runs normally
    assert(s.range(10).agg(sum("id")).collect()(0).getLong(0) == 45L)
  }
}
