package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, AttributeReference, Expression, ExpressionInfo, Literal, MicrosToTimestamp, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Project, Range => LRange}
import org.apache.spark.sql.types._

/** `generate_series` / `range` TABLE functions with the reference's
  * semantics (functions-table/src/generate_series.rs;
  * sqllogictest/test_files/table_functions.slt):
  *
  *   - `generate_series(end)` = 0..end INCLUSIVE (descending when end<0);
  *     `range(end)` is end-EXCLUSIVE — the only difference between the two.
  *   - 2- and 3-arg integer forms with positive/negative step.
  *   - any NULL argument → EMPTY result (not an error).
  *   - timestamp/date + INTERVAL step: `range(TIMESTAMP…, TIMESTAMP…,
  *     INTERVAL '1' DAY)`; dates are promoted to timestamps (the
  *     reference renders these as timestamps too). Year-month intervals
  *     step by calendar months.
  *   - the output column is named `value` (reference convention).
  *
  * Scale: integer and fixed-duration series plan as a Catalyst `Range`
  * (distributed, parallelized by Spark) with the value computed per-row by
  * projection — a billion-row series never materializes on the driver.
  * Only calendar-month stepping builds a driver-side LocalRelation (its
  * cardinality is bounded by months-between, ≤ ~10^5 for any sane span).
  *
  * Registered via SparkSessionExtensions.injectTableFunction; overrides the
  * builtin `range` TVF (internal callers alias columns positionally —
  * `range(100) t(id)` — so the `value` column name is compatible).
  */
object GenerateSeriesTVF {

  def register(e: SparkSessionExtensions): Unit = {
    e.injectTableFunction((FunctionIdentifier("generate_series"),
      new ExpressionInfo(getClass.getCanonicalName, null, "generate_series"),
      (exprs: Seq[Expression]) => build(exprs, inclusive = true)))
    e.injectTableFunction((FunctionIdentifier("range"),
      new ExpressionInfo(getClass.getCanonicalName, null, "range"),
      (exprs: Seq[Expression]) => build(exprs, inclusive = false)))
    e.injectTableFunction((FunctionIdentifier("unnest"),
      new ExpressionInfo(getClass.getCanonicalName, null, "unnest"),
      (exprs: Seq[Expression]) => buildUnnest(exprs)))
  }

  /** `unnest` as a TABLE function (reference: `FROM unnest(array)` /
    * `FROM unnest(struct)` — unnest.slt). Arrays explode to one row per
    * element via a Generate over a one-row relation (the argument may
    * contain scalar subqueries — nothing is evaluated at plan time);
    * structs flatten to one row of one column per field. */
  private def buildUnnest(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.size > 1) {
      // FROM unnest(a, b, …): the reference ZIPS the lists to the longest
      // per-row length, padding shorter ones with NULL (unnest.slt:321);
      // a NULL list behaves as empty. explode(arrays_zip(…)) + a field
      // projection expresses exactly that (arrays_zip pads to longest).
      import org.apache.spark.sql.catalyst.expressions.{Alias, ArraysZip, Coalesce, CreateArray, Explode, Literal}
      import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue}
      val names = exprs.indices.map(i => Literal(s"c$i"): Expression)
      val coalesced = exprs.map(e =>
        Coalesce(Seq(e, CreateArray(Seq.empty))): Expression)
      val gen = org.apache.spark.sql.catalyst.plans.logical.Generate(
        Explode(ArraysZip(coalesced.toIndexedSeq, names.toIndexedSeq)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Nil,
        org.apache.spark.sql.catalyst.plans.logical.OneRowRelation())
      val cols = exprs.indices.map(i => Alias(
        UnresolvedExtractValue(UnresolvedAttribute("col"), Literal(s"c$i")),
        s"c$i")())
      return Project(cols.toSeq, gen)
    }
    require(exprs.size == 1, s"unnest table function expects 1 argument")
    val e = exprs.head
    val structType =
      try e.dataType match { case s: StructType => Some(s); case _ => None }
      catch { case _: Exception => None } // unresolved → analyzer decides
    structType match {
      case Some(st) =>
        val cols = st.fields.zipWithIndex.map { case (f, i) =>
          Alias(org.apache.spark.sql.catalyst.expressions.GetStructField(
            e, i, Some(f.name)), f.name)()
        }
        Project(cols.toSeq, org.apache.spark.sql.catalyst.plans.logical.OneRowRelation())
      case None =>
        org.apache.spark.sql.catalyst.plans.logical.Generate(
          org.apache.spark.sql.catalyst.expressions.Explode(e),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Nil,
          org.apache.spark.sql.catalyst.plans.logical.OneRowRelation())
    }
  }

  private def emptyOf(t: DataType): LogicalPlan =
    LocalRelation(AttributeReference("value", t, nullable = false)())

  private def longPlan(start: Long, endExclusive: Long, step: Long): LogicalPlan = {
    val r = LRange(start, endExclusive, step, None)
    Project(Seq(Alias(r.output.head, "value")()), r)
  }

  private def longPlanSliced(start: Long, endExclusive: Long, step: Long,
      numSlices: Int): LogicalPlan = {
    val r = LRange(start, endExclusive, step, Some(numSlices))
    Project(Seq(Alias(r.output.head, "value")()), r)
  }

  private def evalArg(e: Expression): Any = {
    require(e.foldable, s"generate_series arguments must be constant, got: ${e.sql}")
    e.eval()
  }

  private def isTemporal(t: DataType): Boolean = t match {
    case _: TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  private def build(exprs0: Seq[Expression], inclusive: Boolean): LogicalPlan = {
    // Spark's builtin range(start, end, step, numSlices) 4-arg form: honor
    // the explicit slice count so external SQL keeps working (the column is
    // still named `value` — alias positionally, `range(...) t(id)`, for the
    // builtin name)
    val (exprs, slices) =
      if (!inclusive && exprs0.size == 4)
        (exprs0.take(3), Some(evalArg(exprs0(3)).asInstanceOf[Number].intValue()))
      else (exprs0, None)
    require(exprs.nonEmpty && exprs.size <= 3,
      s"generate_series expects 1-3 arguments, got ${exprs.size}")
    val isInterval = (t: DataType) =>
      t.isInstanceOf[DayTimeIntervalType] || t.isInstanceOf[YearMonthIntervalType]
    if (exprs.exists(e => isTemporal(e.dataType)) ||
        exprs.exists(e => isInterval(e.dataType)))
      buildTemporal(exprs, inclusive)
    else {
      val vals = exprs.map(evalArg)
      if (vals.contains(null)) return emptyOf(LongType)
      val nums = vals.map(_.asInstanceOf[Number].longValue())
      val (start, end, step) = nums match {
        case Seq(e0)         => (0L, e0, if (e0 < 0) -1L else 1L)
        case Seq(s0, e0)     => (s0, e0, 1L)
        case Seq(s0, e0, st) => (s0, e0, st)
      }
      slices.foreach(n => return longPlanSliced(start,
        if (!inclusive) end else if (step > 0) end + 1 else end - 1, step, n))
      require(step != 0, "generate_series step must not be zero")
      val endEx =
        if (!inclusive) end
        else if (step > 0) end + 1
        else end - 1
      // wrong-direction ranges (start=6, end=-6, step=1) are empty, which
      // Catalyst Range already yields for start >= end with positive step
      longPlan(start, endEx, step)
    }
  }

  private val MicrosPerDay = 86400000000L

  private def buildTemporal(exprs: Seq[Expression], inclusive: Boolean): LogicalPlan = {
    require(exprs.size == 3,
      "temporal generate_series needs (start, end, step interval)")
    val vals = exprs.map(evalArg)
    if (vals.contains(null)) return emptyOf(TimestampType)
    def micros(v: Any, t: DataType): Long = t match {
      case DateType => v.asInstanceOf[Number].longValue() * MicrosPerDay
      case _        => v.asInstanceOf[Number].longValue() // timestamp micros
    }
    val start = micros(vals(0), exprs(0).dataType)
    val end = micros(vals(1), exprs(1).dataType)
    exprs(2).dataType match {
      case _: DayTimeIntervalType =>
        val step = vals(2).asInstanceOf[Number].longValue() // micros
        require(step != 0, "generate_series step must not be zero")
        val diff = end - start
        // count of i >= 0 with start + i*step strictly before `end` in the
        // step direction; inclusive adds the boundary hit
        val iMax = Math.floorDiv(diff, step) // largest i with i*step <= diff (sign-aware)
        val count =
          if ((step > 0 && diff < 0) || (step < 0 && diff > 0)) 0L
          else if (inclusive) iMax + 1
          else if (iMax * step == diff) iMax else iMax + 1
        if (count <= 0) return emptyOf(TimestampType)
        val r = LRange(0L, count, 1L, None)
        val value = Alias(MicrosToTimestamp(
          Add(Literal(start), Multiply(r.output.head, Literal(step)))), "value")()
        Project(Seq(value), r)
      case _: YearMonthIntervalType =>
        val stepMonths = vals(2).asInstanceOf[Number].intValue()
        require(stepMonths != 0, "generate_series step must not be zero")
        val zone = java.time.ZoneOffset.UTC
        val startT = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(start, 1000000L), (Math.floorMod(start, 1000000L) * 1000).toInt, zone)
        val endMicros = end
        val out = scala.collection.mutable.ArrayBuffer[Long]()
        var i = 0L
        var continue = true
        val cap = 1000000
        while (continue && i < cap) {
          val t = startT.plusMonths(i * stepMonths)
          val m = t.toEpochSecond(zone) * 1000000L + t.getNano / 1000
          val before = if (stepMonths > 0) m < endMicros else m > endMicros
          if (before || (inclusive && m == endMicros)) { out += m; i += 1 }
          else continue = false
        }
        require(i < cap, s"generate_series month series exceeds $cap values")
        val attr = AttributeReference("value", TimestampType, nullable = false)()
        LocalRelation(Seq(attr), out.toSeq.map(m =>
          org.apache.spark.sql.catalyst.InternalRow(m)))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported generate_series step type: $other")
    }
  }
}
