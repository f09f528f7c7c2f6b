package graft.operators

import org.apache.spark.sql.DataFrame

/** Recursive CTE evaluation.
  *
  * The reference implements `WITH RECURSIVE` as an iterative loop over a
  * working table (reference: datafusion/physical-plan/src/recursive_query.rs:66
  * and work_table.rs:101), in two modes — UNION ALL and UNION (distinct,
  * `is_distinct` at recursive_query.rs:76). Spark 4.1 has a native
  * `WITH RECURSIVE` SQL surface (exercised by the cte_recursive_sql
  * inventory entry); this Scala-API loop is the programmatic counterpart,
  * running the same fixpoint on the driver: each iteration derives the next
  * increment from the previous one and unions it into the accumulator.
  *
  * Scale note: each iteration is a distributed job; the driver only holds
  * plan metadata (plus one `isEmpty` check per step — a cheap limit-1 job).
  * `localCheckpoint` every few iterations truncates the growing lineage so
  * deep recursions don't blow up plan optimization time.
  */
object RecursiveCte {

  def iterate(
      base: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int = 100,
      checkpointEvery: Int = 16): DataFrame = {
    var acc = base
    var frontier = base
    var i = 0
    while (i < maxIterations && !frontier.isEmpty) {
      frontier = step(frontier)
      if (!frontier.isEmpty) {
        acc = acc.unionAll(frontier)
        if ((i + 1) % checkpointEvery == 0) {
          acc = acc.localCheckpoint(eager = true)
          frontier = frontier.localCheckpoint(eager = true)
        }
      }
      i += 1
    }
    acc
  }

  /** UNION (distinct) mode: the frontier is deduplicated against everything
    * already accumulated before each step, so cyclic graphs terminate — the
    * reference's `is_distinct` behavior (recursive_query.rs:76). `except`
    * has set semantics, which is exactly the dedup the mode requires.
    *
    * The frontier is checkpointed EVERY iteration: `except(acc)` embeds the
    * accumulator's plan in the frontier's, and the accumulator embeds every
    * previous frontier — without truncation the plan tree doubles per
    * iteration and the driver dies in the optimizer long before any
    * executor works. A checkpointed frontier keeps plans linear in the
    * iteration count (the reference's WorkTable is the same idea: each
    * iteration reads materialized batches, not the prior plan). */
  def iterateDistinct(
      base: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int = 100,
      checkpointEvery: Int = 16): DataFrame = {
    var acc = base.distinct().localCheckpoint(eager = true)
    var frontier = acc
    var i = 0
    while (i < maxIterations && !frontier.isEmpty) {
      frontier = step(frontier).except(acc).localCheckpoint(eager = true)
      if (!frontier.isEmpty) {
        acc = acc.union(frontier)
        if ((i + 1) % checkpointEvery == 0)
          acc = acc.localCheckpoint(eager = true)
      }
      i += 1
    }
    acc
  }
}
