package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DML over immutable storage: the reference executes INSERT / DELETE /
  * UPDATE / MERGE against writable table providers
  * (datafusion/expr/src/logical_plan/dml.rs:140,237-247,271; slt coverage
  * dml_delete.slt, dml_update.slt, merge_into.slt). Vanilla Spark file
  * sources are immutable, so session tables are emulated the way the
  * reference's MemTable works: each DML statement is a pure relational
  * transform producing the table's next state (re-registered as a temp
  * view by the caller when named access is needed).
  *
  * All transforms are single-pass projections/filters/joins — no
  * collect-to-driver, so they scale like any other operator.
  */
object SessionTables {

  /** INSERT INTO t VALUES / SELECT — bag union with the new rows. */
  def insertInto(table: DataFrame, rows: DataFrame): DataFrame =
    table.unionByName(rows)

  /** TRUNCATE TABLE t — the empty table with the schema preserved
    * (reference: sqllogictest/test_files/truncate.slt). */
  def truncate(table: DataFrame): DataFrame =
    table.where(lit(false))

  /** DELETE FROM t WHERE cond — keep the complement. */
  def delete(table: DataFrame, cond: Column): DataFrame =
    table.where(!coalesce(cond, lit(false)))

  /** UPDATE t SET col = expr WHERE cond — conditional projection. */
  def update(table: DataFrame, cond: Column, assignments: Map[String, Column]): DataFrame = {
    val cols = table.columns.map { c =>
      assignments.get(c) match {
        case Some(e) => when(coalesce(cond, lit(false)), e).otherwise(col(c)).as(c)
        case None    => col(c)
      }
    }
    table.select(cols.toSeq: _*)
  }

  /** MERGE INTO target USING source ON key —
    * WHEN MATCHED THEN UPDATE SET assignments,
    * WHEN NOT MATCHED THEN INSERT source row.
    *
    * Implemented as a full outer join on the key: matched rows take the
    * updated values, target-only rows pass through, source-only rows insert.
    * Which side a joined row came from is tracked with explicit presence
    * markers, not key null-ness — a NULL merge key never joins (both sides'
    * `===` is false), so a null-key target row surfaces as target-only and
    * passes through unchanged, matching SQL MERGE.
    *
    * Preconditions (same as SQL MERGE): `source` exposes the same columns as
    * `target`, and source keys are unique — SQL raises on a target row
    * matched by several source rows; here duplicates would multiply it.
    */
  def merge(target: DataFrame, source: DataFrame, key: String,
      assignments: Map[String, Column]): DataFrame = {
    val t = target.columns.foldLeft(target)((d, c) => d.withColumnRenamed(c, s"t_$c"))
      .withColumn("__t_present", lit(true))
    val sr = source.columns.foldLeft(source)((d, c) => d.withColumnRenamed(c, s"s_$c"))
      .withColumn("__s_present", lit(true))
    val joined = t.join(sr, col(s"t_$key") === col(s"s_$key"), "full")
    val matched = col("__t_present").isNotNull && col("__s_present").isNotNull
    val cols = target.columns.map { c =>
      val updated = assignments.getOrElse(c, col(s"t_$c"))
      when(matched, updated)
        .when(col("__t_present").isNotNull, col(s"t_$c"))
        .otherwise(col(s"s_$c")).as(c)
    }
    joined.select(cols.toSeq: _*)
  }
}
