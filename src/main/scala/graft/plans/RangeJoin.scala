package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Broadcast range join — the full custom-operator stack (logical node →
  * strategy → physical operator), SURVEY §2.10 path (c).
  *
  * Mirrors the reference's PiecewiseMergeJoinExec
  * (datafusion/physical-plan/src/joins/piecewise_merge_join/exec.rs:254):
  * for a single-inequality condition `left.a <op> right.b`, sort the build
  * side once and binary-search each probe key — every probe row matches a
  * contiguous prefix/suffix of the sorted build side, so candidate
  * enumeration is O(log m) per row instead of BroadcastNestedLoopJoin's
  * O(m) predicate evaluations.
  *
  * The build (right) side is collected + broadcast like Spark's own
  * broadcast joins; the probe side streams partition-parallel. Registered
  * explicitly (opt-in API `RangeJoin.join`) rather than hijacking Catalyst's
  * join planning, so standard queries are unaffected.
  */
case class RangeJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression, op: String) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, lk, rk, op) =>
      RangeJoinExec(planLater(l), planLater(r), lk, rk, op) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression, op: String) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def doExecute(): RDD[InternalRow] = {
    val rightOut = right.output
    val boundRight = BindReferences.bindReference(rightKey, rightOut)
    // Keys are compared in their native internal representation via the
    // type's interpreted ordering — the same comparator SortExec uses — so
    // long keys beyond 2^53, decimals, dates/timestamps and strings all
    // order exactly (no double coercion).
    val keyOrdering: Ordering[Any] =
      org.apache.spark.sql.GraftSqlBridge.interpretedOrdering(rightKey.dataType)
    // build side: collect, key, sort ascending (nulls dropped — an
    // inequality never matches null). Same broadcast contract as Spark's
    // own broadcast joins, with an explicit fail-fast guard instead of a
    // silent driver OOM when the build side is too big.
    val collected = right.executeCollect()
    val maxRows = conf.getConfString("spark.graft.rangeJoin.maxBuildRows", "10000000").toLong
    if (collected.length > maxRows)
      throw new IllegalStateException(
        s"RangeJoinExec build side has ${collected.length} rows (> $maxRows); " +
          "swap the sides or raise spark.graft.rangeJoin.maxBuildRows")
    val buildRows: Array[(Any, InternalRow)] = collected
      .flatMap { row =>
        boundRight.eval(row) match {
          case null => None
          case v    => Some((v, row))
        }
      }
      .sortBy(_._1)(keyOrdering)
    val keys: Array[Any] = buildRows.map(_._1)
    val rows = buildRows.map(_._2)
    val bc = sparkContext.broadcast((keys, rows))

    val leftOut = left.output
    val boundLeft = BindReferences.bindReference(leftKey, leftOut)
    val opLocal = op
    val outputLocal = output
    val ordLocal = keyOrdering

    left.execute().mapPartitions { iter =>
      val (ks, rs) = bc.value
      val proj = UnsafeProjection.create(outputLocal, outputLocal)
      val joined = new JoinedRow

      // first index i with ks(i) > key (upperBound) / ks(i) >= key (lowerBound)
      def upperBound(key: Any): Int = {
        var lo = 0; var hi = ks.length
        while (lo < hi) { val mid = (lo + hi) >>> 1; if (ordLocal.compare(ks(mid), key) <= 0) lo = mid + 1 else hi = mid }
        lo
      }
      def lowerBound(key: Any): Int = {
        var lo = 0; var hi = ks.length
        while (lo < hi) { val mid = (lo + hi) >>> 1; if (ordLocal.compare(ks(mid), key) < 0) lo = mid + 1 else hi = mid }
        lo
      }

      iter.flatMap { lrow =>
        val key = boundLeft.eval(lrow)
        if (key == null) Iterator.empty
        else {
          // match range in the ascending build side
          val (from, until) = opLocal match {
            case "<"  => (upperBound(key), ks.length) // right keys strictly greater
            case "<=" => (lowerBound(key), ks.length)
            case ">"  => (0, lowerBound(key))         // right keys strictly smaller
            case ">=" => (0, upperBound(key))
            case o => throw new IllegalArgumentException(s"range op $o")
          }
          val lcopy = lrow.copy()
          Iterator.range(from, until).map { i => proj(joined(lcopy, rs(i))) }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object RangeJoin {

  /** Install the strategy once per session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy

  /** Partitioned range join — the scale path when NEITHER side fits in a
    * broadcast: bucket the right side by its key-quantile boundaries
    * (balanced by construction), explode each left row to the bucket range
    * its inequality can match, equi-join on the bucket id and filter
    * exactly. Composes existing operators (SURVEY §2.10 preference (a)):
    * both sides shuffle once by bucket, work per task is bounded by bucket
    * width, skew is handled by the quantile split. Numeric keys only
    * (approxQuantile contract). The left-row fan-out averages numBuckets/2
    * — inherent to partitioned inequality joins, whose output is that much
    * bigger anyway.
    */
  def joinPartitioned(left: DataFrame, leftCol: String, op: String,
      right: DataFrame, rightCol: String, numBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode, filter, lit, sequence, size, typedlit}
    require(Seq("<", "<=", ">", ">=").contains(op), s"range op $op")
    val probes = (1 until numBuckets).map(_.toDouble / numBuckets).toArray
    val bounds = right.na.drop(Seq(rightCol))
      .stat.approxQuantile(rightCol, probes, 0.001).distinct.sorted
    def bucketOf(c: org.apache.spark.sql.Column) =
      size(filter(typedlit(bounds.toSeq), b => b <= c))
    val n = bounds.length + 1
    val r = right.na.drop(Seq(rightCol)).withColumn("__rjb", bucketOf(col(rightCol)))
    val range = op match {
      case "<" | "<=" => sequence(bucketOf(col(leftCol)), lit(n - 1))
      case ">" | ">=" => sequence(lit(0), bucketOf(col(leftCol)))
    }
    val l = left.na.drop(Seq(leftCol)).withColumn("__rjb", explode(range))
    // side-qualified references: leftCol/rightCol may share a name
    // (self range-joins), where bare col() would be ambiguous post-join
    val cond = op match {
      case "<"  => l(leftCol) <  r(rightCol)
      case "<=" => l(leftCol) <= r(rightCol)
      case ">"  => l(leftCol) >  r(rightCol)
      case ">=" => l(leftCol) >= r(rightCol)
    }
    l.join(r, "__rjb").where(cond).drop("__rjb")
  }

  /** `left JOIN right ON leftCol <op> rightCol` via the range-join operator.
    * The right side is the build side and must fit in the driver/broadcast
    * (same contract as Spark's broadcast joins). */
  def join(left: DataFrame, leftCol: String, op: String,
      right: DataFrame, rightCol: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    val lk = lp.output.find(_.name == leftCol)
      .getOrElse(throw new IllegalArgumentException(s"no column $leftCol"))
    val rk = rp.output.find(_.name == rightCol)
      .getOrElse(throw new IllegalArgumentException(s"no column $rightCol"))
    // Keys are compared with the type's native ordering — both sides must
    // share an orderable type (cast beforehand for mixed-width numerics).
    require(lk.dataType == rk.dataType,
      s"range-join key types differ: ${lk.dataType} vs ${rk.dataType}; cast one side first")
    require(GraftSqlBridge.isOrderable(lk.dataType),
      s"range-join key type ${lk.dataType} has no total order")
    GraftSqlBridge.ofRows(spark, RangeJoinPlan(lp, rp, lk, rk, op))
  }
}
