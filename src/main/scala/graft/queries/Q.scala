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

  /** Fast-path session for short static-plan queries: AQE disabled.
    *
    * AQE's per-stage materialize→replan handoffs cost a measured ~70-80 ms
    * on a 3-4 stage query (SF1 q3/q5/q10 bench, AQE on vs off), which is
    * pure tax when the plan is already fully decided at planning time —
    * explicit broadcast hints, no data-dependent join choices, only
    * KB-scale exchanges left to coalesce. Adaptivity stays ON (the session
    * default) for everything with real shuffles, where runtime coalescing
    * and skew handling are the 100-TB-correct behavior.
    *
    * One child session per parent (weak — collected with the parent); it
    * shares the SparkContext, so executors/caches are common and only the
    * session conf differs. */
  private val fastSessions = new java.util.WeakHashMap[SparkSession, SparkSession]()
  def staticPlanSession(s: SparkSession): SparkSession = fastSessions.synchronized {
    val existing = fastSessions.get(s)
    if (existing != null) existing
    else {
      val ss = s.newSession()
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      // These queries' post-scan exchanges carry ≤4 MB; 32 final-agg tasks
      // are pure launch latency for that (measured 146→106 ms on the SF1 q3
      // final stage at 8). With AQE on, coalescePartitions reaches the same
      // shape at runtime — this is the static mirror of it. At cluster
      // scale these queries run on the default AQE session instead.
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      // Constraint propagation infers IsNotNull/transitive predicates from
      // join keys — useful inference for machine-generated plans, a pure
      // planning tax here where every filter is already explicit (measured
      // 59→41 ms/plan on the q3 shape; the reference has no equivalent
      // optimizer pass either). Scan pushdown of the explicit predicates is
      // unaffected.
      ss.conf.set("spark.sql.constraintPropagation.enabled", "false")
      fastSessions.put(s, ss)
      ss
    }
  }

  /** staticPlanSession variant with ONE shuffle partition, for queries
    * whose every exchange is provably tiny (a grouped aggregate over a
    * bounded key domain — partial aggregation caps each map task's output
    * at the group count, so the single reducer receives ≤ groups × tasks
    * rows at ANY input scale). Beyond the smaller final stage, a
    * single-partition child satisfies the Sort's required distribution, so
    * the ORDER BY's range exchange (and its sampling job) vanish — two
    * whole stages off a latency-bound query. */
  /** staticPlanSession variant that KEEPS the session's shuffle width
    * (32 = cores in the bench harness): for static 3-stage shapes whose
    * one real shuffle carries MBs and wants every core (q12's mid-size
    * partitioned hash join), where the 8-partition static session would
    * run the join on a quarter of the machine. AQE off for the same
    * reason as staticPlanSession — the plan is decided at planning time. */
  private val wideSessions = new java.util.WeakHashMap[SparkSession, SparkSession]()
  def staticWideSession(s: SparkSession): SparkSession = wideSessions.synchronized {
    val existing = wideSessions.get(s)
    if (existing != null) existing
    else {
      val ss = s.newSession()
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      ss.conf.set("spark.sql.constraintPropagation.enabled", "false")
      wideSessions.put(s, ss)
      ss
    }
  }

  private val tinySessions = new java.util.WeakHashMap[SparkSession, SparkSession]()
  def tinyResultSession(s: SparkSession): SparkSession = tinySessions.synchronized {
    val existing = tinySessions.get(s)
    if (existing != null) existing
    else {
      val ss = s.newSession()
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      ss.conf.set("spark.sql.shuffle.partitions", "1")
      ss.conf.set("spark.sql.constraintPropagation.enabled", "false")
      // r13 (Q22Lab variant G, min-of-8 interleave: shipped 0.649 →
      // excluded-rules 0.555): rules that CANNOT fire on the tiny-result
      // shapes routed here (explicit joins — no reorder; no CSV/JSON
      // exprs, decimals, object serialization, concats, repartitions or
      // windows) still walk the whole tree every plan. Plan-constant
      // shaving, scale-independent; results oracle-gated as always.
      ss.conf.set("spark.sql.optimizer.excludedRules", Seq(
        "org.apache.spark.sql.catalyst.optimizer.CostBasedJoinReorder",
        "org.apache.spark.sql.catalyst.optimizer.ReorderJoin",
        "org.apache.spark.sql.catalyst.optimizer.OptimizeCsvJsonExprs",
        "org.apache.spark.sql.catalyst.optimizer.DecimalAggregates",
        "org.apache.spark.sql.catalyst.optimizer.ObjectSerializerPruning",
        "org.apache.spark.sql.catalyst.optimizer.EliminateSerialization",
        "org.apache.spark.sql.catalyst.optimizer.CombineConcats",
        "org.apache.spark.sql.catalyst.optimizer.OptimizeRepartition",
        "org.apache.spark.sql.catalyst.optimizer.TransposeWindow",
        "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit").mkString(","))
      tinySessions.put(s, ss)
      ss
    }
  }

  /** Register the fixture tables as temp views once per (session, dir) —
    * `createOrReplaceTempView` costs ~20-25 ms per table-triple per call
    * (measured 139 vs 64 ms/plan on the q3 shape with registration inline),
    * which a real engine pays once at catalog setup, not per query. A dir
    * switch (verify at sf0.01 vs bench at SF1 in one JVM) re-registers. */
  private val registeredDirs = new java.util.WeakHashMap[SparkSession, String]()
  def fixtureViews(s: SparkSession, dir: String): Unit = registeredDirs.synchronized {
    if (registeredDirs.get(s) != dir) {
      // only tables present in the dir — scale fixtures (gen_sf1.py) carry
      // the TPC-H star only, not events/documents/embeddings
      graft.Tables.names
        .filter(n => new java.io.File(s"$dir/$n.parquet").exists())
        .foreach(n => graft.Tables.load(s, dir, n).createOrReplaceTempView(n))
      // partsupp: real file in the scale fixtures, derived elsewhere
      graft.Tables.partsupp(s, dir).createOrReplaceTempView("partsupp")
      registeredDirs.put(s, dir)
    }
  }

  /** Cross-engine-stable rounding.
    *
    * Two failure modes make naive `round` un-comparable across engines:
    * (1) Spark's `round` goes through BigDecimal.valueOf (shortest decimal
    * string) while DuckDB rounds the raw double — they disagree whenever the
    * true value sits at a decimal half boundary (54132.795 → .80 vs .79);
    * (2) aggregation order differs across engines (pairwise vs sequential
    * summation), so the doubles themselves drift by ~1e-13 relative — and
    * data-derived values (cents, integer quantities) CLUSTER exactly at
    * half boundaries, so drift flips the rounded digit.
    *
    * Fix: round as pure IEEE arithmetic (identical in both engines) and
    * shift the boundary by a non-decimal epsilon (1.37% of a bin) so no
    * data-clustered value sits near it:  floor((x + eps)·10^k + 0.5)/10^k.
    * The oracle SQL uses the same formula (see tools/roundconv.py).
    */
  private def rnd(c: Column, k: Int): Column = {
    val p = lit(math.pow(10, k))
    val eps = lit(1.37e-2 / math.pow(10, k))
    floor((c + eps) * p + lit(0.5)).cast("double") / p
  }

  /** Round for money-ish sums. */
  def r2(c: Column): Column = rnd(c, 2)
  /** Round for averages / ratios. */
  def r4(c: Column): Column = rnd(c, 4)
  def r6(c: Column): Column = rnd(c, 6)
}
