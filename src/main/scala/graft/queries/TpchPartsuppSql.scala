package graft.queries

/** The four TPC-H partsupp queries (Q2/Q11/Q16/Q20) as engine-shared SQL —
  * the same text runs on Spark (against the `partsupp` view: real file in
  * the scale fixtures, derived at oracle scales — see
  * [[graft.Tables.partsupp]]) and on DuckDB with the deriving CTE prepended
  * ([[oracle]]). Q16/Q20 run this text directly on Spark; Q2/Q11 run a
  * stats-gated single-scan reshape (see their query entries) with this text
  * as both the past-threshold fallback and, always, the oracle. Adapted to the reduced fixture schema (no p_mfgr /
  * s_address / s_phone / s_comment) but carrying the reference's real
  * structural shape AND input volume: 4 suppliers/part, 800k partsupp rows
  * at SF1. Reference: sqllogictest/test_files/tpch/answers/
  * q{2,11,16,20}.slt.part.
  *
  * Money columns are DECIMAL(12,2), so `sum(ps_supplycost * ps_availqty)`
  * is exact decimal arithmetic — summation-order-independent in both
  * engines; the one double conversion happens once, after aggregation.
  */
object TpchPartsuppSql {

  /** Prepend the partsupp derivation for the DuckDB oracle. */
  def oracle(sql: String): String =
    "WITH " + graft.Tables.partsuppCte + "\n" + sql

  /** Q2: min-cost supplier per part (correlated scalar min over partsupp,
    * 5-way dim join, top-100 by acctbal). s_suppkey added as the unique
    * LIMIT tiebreaker (fixture s_name is not provably unique). */
  val q2: String =
    """SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey
      |FROM part, supplier, partsupp, nation, region
      |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      |  AND p_size = 15 AND p_type LIKE '%STAND%'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND ps_supplycost = (
      |    SELECT min(ps_supplycost)
      |    FROM partsupp, supplier, nation, region
      |    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      |      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |      AND r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
      |LIMIT 100""".stripMargin

  /** Q11: per-part inventory value in one nation vs a fraction of the
    * total (scalar-subquery HAVING over the same 3-way join). */
  val q11: String =
    """SELECT ps_partkey,
      |  CAST(sum(ps_supplycost * ps_availqty) AS DOUBLE) AS value
      |FROM partsupp, supplier, nation
      |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND n_name = 'NATION_3'
      |GROUP BY ps_partkey
      |HAVING sum(ps_supplycost * ps_availqty) > (
      |  SELECT sum(ps_supplycost * ps_availqty) * 0.0001
      |  FROM partsupp, supplier, nation
      |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND n_name = 'NATION_3')
      |ORDER BY value DESC, ps_partkey""".stripMargin

  /** Q16: distinct-supplier counts per (brand, type, size) with negated
    * predicates. (The reference's supplier-complaints NOT IN is dropped —
    * the fixture has no s_comment.) */
  val q16: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      |FROM partsupp, part
      |WHERE p_partkey = ps_partkey
      |  AND p_brand <> 'Brand#3'
      |  AND p_type NOT LIKE 'MEDIUM%'
      |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q20: suppliers with excess availability — nested IN chain with a
    * correlated scalar 0.5*sum(l_quantity) over the shipdate window. (The
    * reference's final nation filter is dropped to keep the result
    * non-empty at sf0.001; the semi-join chain is the shape under test.) */
  val q20: String =
    """SELECT s_name, s_suppkey FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT ps_suppkey FROM partsupp
      |  WHERE ps_partkey IN (
      |      SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |    AND ps_availqty > (
      |      SELECT 0.5 * sum(l_quantity) FROM lineitem
      |      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      |        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
      |ORDER BY s_suppkey""".stripMargin
}
