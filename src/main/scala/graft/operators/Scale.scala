package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-engineering primitives: skew mitigation by key salting and
  * shuffle-free joins via bucketed tables.
  *
  * At 100 TB these are the difference between a job that finishes and one
  * that straggles on a single hot-key task:
  *   - `saltedJoin` splits each hot build-key into `saltFactor` sub-keys,
  *     replicating the (small) right side per salt — the classic
  *     skew-breaker when AQE's skew-join splitting isn't available or the
  *     skew is in an aggregation feeding the join;
  *   - bucketed tables (`writeBucketed`) persist a hash-partitioned layout
  *     so repeated joins/aggregations on the bucket key skip the shuffle
  *     entirely (Spark reads bucket files as pre-partitioned splits).
  */
object Scale {

  /** Equi-join with salting on the left (large/skewed) side: left rows get
    * a deterministic salt derived from the full row hash; right rows are
    * replicated once per salt value. Semantically identical to a plain
    * inner equi-join. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Persist as a bucketed+sorted table (bucket pruning + shuffle-free
    * joins/aggregations on the bucket key).
    *
    * The input is pre-partitioned on the bucket column with exactly
    * nBuckets tasks: Spark's writer emits one file per (task, bucket)
    * pair, and the scan only trusts the bucket SORT order when each
    * bucket is a single file — without this, downstream sort-merge joins
    * still re-sort both sides (exchange-free but not sort-free).
    * repartition(n, col) and bucketBy hash with the same Murmur3, so each
    * task holds exactly one bucket. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.repartition(nBuckets, col(bucketCol))
      .write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", s"${System.getProperty("java.io.tmpdir")}/graft_buckets/$tableName")
      .saveAsTable(tableName)
}
