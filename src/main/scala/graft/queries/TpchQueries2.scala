package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Second TPC-H-style batch: the remaining reference benchmark shapes
  * (sqllogictest/test_files/tpch/ q4,q7,q8,q9,q13,q15,q17,q19,q20,q21,q22)
  * adapted to the reduced fixture schema (no partsupp/commitdate/phone —
  * predicates substituted with available columns, keeping each query's
  * structural signature: decorrelated EXISTS, multi-way joins with
  * conditional aggregation, views, nested INs, disjunctive DNF predicates,
  * anti-join + scalar subquery, etc.).
  */
object TpchQueries2 {

  val queries: Map[String, QueryFn] = Map(
    // Q4: EXISTS-decorrelated semi join + group on priority.
    "q4_priority" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                      AND l_quantity > 45)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
      """)
    },

    // Q7: volume between two nations by year (join + CASE pairs).
    "q7_volume" -> { (s, dir) =>
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("sk"))
        .join(n2, col("c_nationkey") === col("ck"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
    },

    // Q8: market-share ratio per year (conditional agg over a big join).
    "q8_share" -> { (s, dir) =>
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("ck"), col("n_regionkey").as("crk"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_type") === "ECONOMY"),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("c_nationkey") === col("ck"))
        .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
          col("crk") === col("r_regionkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(n2, col("s_nationkey") === col("sk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(r6(
          sum(when(col("supp_nation") === "NATION_3",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)) /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("mkt_share"))
    },

    // Q9: profit per nation/year; supplycost substituted with a
    // deterministic column formula (no partsupp in the fixture).
    "q9_profit" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_name").contains("a")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(r2(sum(
          col("l_extendedprice") * (lit(1) - col("l_discount")) -
            col("p_retailprice") * col("l_quantity") * 0.1)).as("profit"))
    },

    // Q13: distribution of orders per customer (left join + double groupBy).
    "q13_custdist" -> { (s, dir) =>
      val counts = t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      counts.groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q15: top supplier(s) by quarterly revenue — view + scalar-subquery max.
    "q15_topsupplier" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(l_extendedprice * (1 - l_discount)) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name,
               floor((total_revenue + 1.37e-4) * 100 + 0.5) / 100 AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      """)
    },

    // Q17: small-quantity revenue vs per-part average (correlated agg).
    "q17_smallqty" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT floor((sum(l_extendedprice) / 7.0 + 1.37e-4) * 100 + 0.5) / 100 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
      """)
    },

    // Q19: DNF of conjunctive range predicates (join + OR-of-ANDs).
    "q19_disjunct" -> { (s, dir) =>
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 21)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 40)))
        .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
    },

    // Q20: nested IN subqueries (semi-join chain).
    "q20_nested_in" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT s_name, s_suppkey FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING sum(l_quantity) > 300)
        ORDER BY s_suppkey
      """)
    },

    // Q21: orders where a supplier is the only one with high quantity —
    // EXISTS + NOT EXISTS pair.
    "q21_waiting" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT s_name, count(*) AS numwait
        FROM supplier
          JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F' AND l1.l_quantity > 30
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_quantity > 30)
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
      """)
    },

    // Q22: customers with above-average balance and no orders —
    // scalar subquery + null-aware-ish anti join.
    "q22_global" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_mktsegment AS cntrycode, count(*) AS numcust,
               floor((sum(c_acctbal) + 1.37e-4) * 100 + 0.5) / 100 AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_totalprice > 200000)
        GROUP BY c_mktsegment ORDER BY cntrycode
      """)
    })

  val oracleSql: Map[String, String] = Map(
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |              AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | floor((sum(l_extendedprice * (1 - l_discount)) + 1.37e-4) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation n1 ON s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3""".stripMargin,

    "q8_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | floor((sum(CASE WHEN n2.n_name = 'NATION_3'
        |     THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
        |   / sum(l_extendedprice * (1 - l_discount)) + 1.37e-8) * 1000000 + 0.5) / 1000000 AS mkt_share
        |FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON c_nationkey = n1.n_nationkey
        | JOIN region ON n1.n_regionkey = r_regionkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
        |GROUP BY 1""".stripMargin,

    "q9_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | floor((sum(l_extendedprice * (1 - l_discount)
        |   - p_retailprice * l_quantity * 0.1) + 1.37e-4) * 100 + 0.5) / 100 AS profit
        |FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN nation ON s_nationkey = n_nationkey
        |WHERE contains(p_name, 'a')
        |GROUP BY 1, 2""".stripMargin,

    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_topsupplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |       floor((total_revenue + 1.37e-4) * 100 + 0.5) / 100 AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin,

    "q17_smallqty" ->
      """SELECT floor((sum(l_extendedprice) / 7.0 + 1.37e-4) * 100 + 0.5) / 100 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,

    "q19_disjunct" ->
      """SELECT floor((sum(l_extendedprice * (1 - l_discount)) + 1.37e-4) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "q20_nested_in" ->
      """SELECT s_name, s_suppkey FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING sum(l_quantity) > 300)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |  JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |  JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_quantity > 30
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_quantity > 30)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q22_global" ->
      """SELECT c_mktsegment AS cntrycode, count(*) AS numcust,
        | floor((sum(c_acctbal) + 1.37e-4) * 100 + 0.5) / 100 AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_totalprice > 200000)
        |GROUP BY c_mktsegment ORDER BY cntrycode""".stripMargin)
}
