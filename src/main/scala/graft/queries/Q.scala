package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle-checked query inventory.
  *
  * Conventions that make Spark results hash-comparable with the DuckDB
  * oracle (the driver sorts columns by name and hashes values):
  *   - every aggregate / computed column is aliased identically on both sides;
  *   - doubles that come out of non-associative aggregation are `round`ed the
  *     same way on both sides (FP sums depend on partition order);
  *   - integer sums are BIGINT on both sides (DuckDB sum(int) is HUGEINT →
  *     oracle casts);
  *   - timestamps in output are either cast to DATE (day precision) or
  *     formatted as strings (sub-day precision) to dodge ns/µs and tz
  *     representation drift;
  *   - every LIMIT is preceded by a total order with a unique tiebreaker.
  */
object Q {

  type QueryFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** Round for money-ish sums. */
  def r2(c: Column): Column = round(c, 2)
  /** Round for averages / ratios. */
  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)
}
