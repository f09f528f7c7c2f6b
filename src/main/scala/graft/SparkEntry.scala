package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2): one entry per
  * implemented operator/capability; `oracleSql` holds the DuckDB-equivalent
  * SQL for the driver's differential check. Column names and rounding must
  * match exactly on both sides (see graft.queries.Q).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchQueries.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. (A `val`: the
    * 27-map concatenation costs real milliseconds inside benchmarked query
    * construction when rebuilt per call.) */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    TpchQueries.queries ++ TpchQueries2.queries ++ RelationalQueries.queries ++
      AggQueries.queries ++ WindowQueries.queries ++ WindowQueries2.queries ++ FunctionQueries.queries ++ FunctionQueries2.queries ++ FunctionQueries3.queries ++ ArrayMathQueries.queries ++ ArrayMathQueries.queries2 ++
      PipelineQueries.queries ++ DmlQueries.queries ++ StreamQueries.queries ++ MultimodalQueries.queries ++ Round2Queries.queries ++ Round3Queries.queries ++ Round3bQueries.queries ++ Round3cQueries.queries ++ Round3dQueries.queries ++ Round3eQueries.queries ++ Round3fQueries.queries ++ Round4Queries.queries ++ Round4bQueries.queries ++ Round4cQueries.queries ++ Round4dQueries.queries ++ Round4eQueries.queries ++ Round4fQueries.queries ++ PipelineQueries2.queries ++ TpcdsQueries.queries ++ TpcdsQueries2.queries ++ TpcdsQueries3.queries ++ TpcdsQueries4.queries ++ TpcdsQueries5.queries ++ Round5Queries.queries ++ Round5bQueries.queries ++ WorkloadQueries.queries ++ Round6Queries.queries ++ Round8Queries.queries ++ Round9Queries.queries ++ Round10Queries.queries ++ Round11Queries.queries ++ Round12Queries.queries ++ Round13Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    TpchQueries.oracleSql ++ TpchQueries2.oracleSql ++ RelationalQueries.oracleSql ++
      AggQueries.oracleSql ++ WindowQueries.oracleSql ++ WindowQueries2.oracleSql ++ FunctionQueries.oracleSql ++ FunctionQueries2.oracleSql ++ FunctionQueries3.oracleSql ++ ArrayMathQueries.oracleSql ++
      PipelineQueries.oracleSql ++ DmlQueries.oracleSql ++ StreamQueries.oracleSql ++ MultimodalQueries.oracleSql ++ Round2Queries.oracleSql ++ Round3Queries.oracleSql ++ Round3bQueries.oracleSql ++ Round3cQueries.oracleSql ++ Round3dQueries.oracleSql ++ Round3eQueries.oracleSql ++ Round3fQueries.oracleSql ++ Round4Queries.oracleSql ++ Round4bQueries.oracleSql ++ Round4cQueries.oracleSql ++ Round4dQueries.oracleSql ++ Round4eQueries.oracleSql ++ Round4fQueries.oracleSql ++ PipelineQueries2.oracleSql ++ TpcdsQueries.oracleSql ++ TpcdsQueries2.oracleSql ++ TpcdsQueries3.oracleSql ++ TpcdsQueries4.oracleSql ++ TpcdsQueries5.oracleSql ++ Round5Queries.oracleSql ++ Round5bQueries.oracleSql ++ WorkloadQueries.oracleSql ++ Round6Queries.oracleSql ++ Round8Queries.oracleSql ++ Round9Queries.oracleSql ++ Round10Queries.oracleSql ++ Round11Queries.oracleSql ++ Round12Queries.oracleSql ++ Round13Queries.oracleSql
}
