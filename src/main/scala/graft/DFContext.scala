package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Engine facade — the Spark-native equivalent of the reference's
  * `SessionContext` (datafusion/core/src/execution/context/mod.rs:611):
  * table registration, SQL entry point, prepared-statement parameters, an
  * information_schema surface and EXPLAIN.
  *
  * SQL goes through a light pre-rewriter (`DFContext.rewrite`) that adds the
  * two reference SQL forms Spark's parser lacks — `QUALIFY`
  * (sqllogictest/test_files/qualify.slt) and `DISTINCT ON`
  * (DataFrame distinct_on, dataframe/mod.rs:963) — by textual rewrite into
  * window-function subqueries, exactly the rewrite the reference's planner
  * performs. Everything else is passed to Catalyst untouched.
  */
class DFContext(val spark: SparkSession) {

  // engine function-gap layer available from SQL immediately
  graft.functions.VectorFunctions.register(spark)

  /** Register a file-backed table; format inferred from the extension
    * (parquet/csv/json), mirroring CREATE EXTERNAL TABLE
    * (reference: sql/src/parser.rs:245). */
  def register(name: String, path: String): Unit = {
    val df =
      if (path.endsWith(".csv")) spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      else if (path.endsWith(".json")) spark.read.json(path)
      else spark.read.parquet(path)
    df.createOrReplaceTempView(name)
  }

  def registerTable(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Register every fixture table from a scale-factor directory. */
  def registerAll(dir: String): Unit = Tables.registerAll(spark, dir)

  def table(name: String): DataFrame = spark.table(name)

  def sql(query: String): DataFrame = spark.sql(DFContext.rewrite(query))

  /** Prepared-statement surface (reference: Expr::Placeholder,
    * dataframe with_param_values — dataframe/mod.rs:2384): named `:name`
    * placeholders bound via Spark's parameterized SQL (literal-safe). */
  def sqlWithParams(query: String, params: Map[String, Any]): DataFrame =
    spark.sql(DFContext.rewrite(query), params.view.mapValues(lit).toMap)

  /** information_schema.tables equivalent
    * (reference: catalog/src/information_schema.rs:77). */
  def informationSchemaTables(): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables()
      .select($"name".as("table_name"), $"tableType".as("table_type"),
        $"isTemporary".as("is_temporary"))
  }

  /** information_schema.columns for one table. */
  def informationSchemaColumns(tableName: String): DataFrame = {
    import spark.implicits._
    spark.catalog.listColumns(tableName)
      .select($"name".as("column_name"), $"dataType".as("data_type"),
        $"nullable".as("is_nullable"))
  }

  /** EXPLAIN surface (reference: ExplainExec — physical-plan/src/explain.rs:39). */
  def explain(query: String, mode: String = "formatted"): String =
    sql(query).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode))
}

object DFContext {

  def apply(spark: SparkSession): DFContext = new DFContext(spark)

  private val QualifyRe =
    """(?is)^(.*?)\s+QUALIFY\s+(.+?)\s*$""".r
  private val DistinctOnRe =
    """(?is)^\s*SELECT\s+DISTINCT\s+ON\s*\(([^)]*)\)\s*(.*?)\s+FROM\s+(.*?)(?:\s+ORDER\s+BY\s+(.*?))?\s*$""".r

  /** Light SQL pre-rewrite for QUALIFY and DISTINCT ON.
    *
    * - `... QUALIFY <pred>` → `SELECT * FROM (...) __q WHERE <pred>`
    *   (the predicate must reference select-list aliases, the common form).
    * - `SELECT DISTINCT ON (k) cols FROM rel ORDER BY k, o...` →
    *   row_number() OVER (PARTITION BY k ORDER BY o...) = 1, preserving the
    *   reference's first-row-per-key semantics (deterministic only with an
    *   ORDER BY, as in the reference).
    */
  def rewrite(query: String): String = query match {
    case DistinctOnRe(keys, selectList, rel, orderBy) =>
      val order = Option(orderBy).map(_.trim).filter(_.nonEmpty).getOrElse(keys)
      s"""SELECT $selectList FROM (
         |  SELECT *, row_number() OVER (PARTITION BY $keys ORDER BY $order) AS __rn
         |  FROM $rel) __don
         |WHERE __rn = 1""".stripMargin
    case QualifyRe(base, pred) if !base.toUpperCase.contains("QUALIFY") =>
      s"SELECT * FROM (\n$base\n) __q WHERE $pred"
    case _ => query
  }
}
