package graft.operators

import org.apache.spark.sql.DataFrame

/** Recursive CTE evaluation.
  *
  * The reference implements `WITH RECURSIVE` as an iterative loop over a
  * working table (reference: datafusion/physical-plan/src/recursive_query.rs:66
  * and work_table.rs:101). Spark has no recursive-CTE operator, so we run the
  * same fixpoint loop on the driver: each iteration derives the next
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
}
