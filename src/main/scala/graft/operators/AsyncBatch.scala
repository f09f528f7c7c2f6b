package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Batched asynchronous evaluation inside partitions — the Spark-native
  * analogue of the reference's `AsyncFuncExec` / `AsyncScalarUDFImpl`
  * (datafusion/physical-plan/src/async_func.rs:49, expr/src/async_udf.rs:37),
  * which exists to overlap slow external calls (remote services, LLM
  * endpoints) with execution.
  *
  * `mapAsync` launches up to `concurrency` in-flight futures per partition
  * and emits results in input order: the distributed shape (one task per
  * partition, bounded in-flight work, ordered output) is exactly what a
  * remote-inference stage needs; swap `fn` for a real client call.
  */
object AsyncBatch {

  /** `timeout` bounds each in-flight call: a hung external service fails the
    * task with a descriptive error (letting Spark's task retry kick in)
    * instead of wedging the executor thread forever. */
  def mapAsync[T, U: Encoder](ds: Dataset[T], concurrency: Int,
      timeout: Duration = Duration(10, "min"))(fn: T => U): Dataset[U] =
    ds.mapPartitions { rows =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      // sliding window of in-flight futures, emitted in order
      new Iterator[U] {
        private val buf = scala.collection.mutable.Queue.empty[Future[U]]
        private def fill(): Unit =
          while (buf.size < concurrency && rows.hasNext) {
            // pull on the caller thread — the source iterator is not
            // thread-safe, only fn runs on the pool
            val x = rows.next()
            buf.enqueue(Future(fn(x)))
          }
        override def hasNext: Boolean = { fill(); buf.nonEmpty }
        override def next(): U = {
          fill()
          try Await.result(buf.dequeue(), timeout)
          catch {
            case _: java.util.concurrent.TimeoutException =>
              throw new java.util.concurrent.TimeoutException(
                s"AsyncBatch.mapAsync: external call exceeded $timeout")
          }
        }
      }
    }
}
