package graft.ops

import graft.{Q, Tables}

/** Subquery surface — the common SQL shapes real warehouse users write that
  * no other registered query exercises: correlated EXISTS / NOT EXISTS,
  * uncorrelated IN, and scalar subqueries (both uncorrelated-in-filter and
  * correlated-in-select). The reference never writes a subquery (its examples
  * are all DataFrame chains and flat CTEs — /root/reference/examples/
  * script_10_mart_customer_value.py is its most complex SQL), but a drop-in
  * engine has to plan them well.
  *
  * 100 TB shapes: Catalyst rewrites every one of these into a join —
  * correlated EXISTS → LEFT SEMI on the correlation key, NOT EXISTS → LEFT
  * ANTI, uncorrelated IN over a small table → broadcast LEFT SEMI,
  * uncorrelated scalar agg → a 1-row subquery result reused as a literal,
  * correlated scalar COUNT → co-partitioned aggregate + LEFT OUTER join.
  * None of them degenerates into a per-row re-execution or a nested-loop
  * join; SubquerySpec pins the semi/anti/broadcast shapes on the physical
  * plan so a planner regression fails the suite.
  */
object Subqueries {

  private val q85Sql = """SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 3)"""

  /** Correlated EXISTS + NOT EXISTS + uncorrelated IN, one filter. Spark
    * plans: semi join ⋉ orders(F), anti join ▷ orders(P) — both
    * co-partitioned on custkey — and a broadcast semi join against the
    * 25-row nation subquery. */
  val semiAnti: Q = Q(
    "q85_exists_subquery",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      Tables.nation(s, dir).createOrReplaceTempView("nation")
      s.sql(q85Sql)
    },
    Some(q85Sql))

  // Scalar-subquery arithmetic stays on the FP contract
  // (pipelines/Pipelines.scala header): max/min/count are exact, and
  // o_totalprice / max is ONE per-row double division of exact inputs —
  // bit-identical across engines with no rounding step needed.
  private val q86Sql = """SELECT o_orderkey, o_custkey, o_totalprice,
      o_totalprice / (SELECT MAX(o_totalprice) FROM orders) AS price_ratio,
      (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
    FROM orders
    WHERE o_totalprice >= 2e0 * (SELECT MIN(o_totalprice) FROM orders)"""

  /** Scalar subqueries: two uncorrelated aggregates (one in the projection,
    * one in the filter — each computed ONCE and injected as a literal, not
    * per row) and a correlated COUNT, which Catalyst de-correlates into a
    * pre-aggregated LEFT OUTER join on l_orderkey (count-bug-safe: orders
    * with no lineitems get 0, not NULL). */
  val scalar: Q = Q(
    "q86_scalar_subquery",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql(q86Sql)
    },
    Some(q86Sql))

  val all: Seq[Q] = Seq(semiAnti, scalar)
}
