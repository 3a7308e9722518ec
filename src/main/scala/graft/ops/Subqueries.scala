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

  // The one classic subquery trap q85/q86 leave uncovered: NOT IN against a
  // list containing NULL. Three-valued logic makes `x NOT IN (..., NULL, ...)`
  // never TRUE (x = NULL gives NULL; x in the list gives FALSE; x absent gives
  // NULL), so the poisoned variant is EMPTY — while the IS NOT NULL rewrite
  // and the NOT EXISTS form return the real anti-join count. All three are
  // counted side by side so the contrast itself is what the oracle pins.
  private val q98Sql = """SELECT 'not_in_null_poisoned' AS variant, COUNT(1) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN
      (SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN o_custkey END
       FROM orders)
    UNION ALL
    SELECT 'not_in_null_filtered', COUNT(1)
    FROM customer
    WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders
       WHERE o_orderpriority = '1-URGENT' AND o_custkey IS NOT NULL)
    UNION ALL
    SELECT 'not_exists', COUNT(1)
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')"""

  /** NOT IN with NULLs in the subquery list — the null-aware anti join.
    * Spark cannot plan a NOT IN as a plain LEFT ANTI (it must also check
    * "does the build side contain ANY null", or rows would leak through):
    * both NOT IN variants get Catalyst's `(k = x) OR isnull(k = x)`
    * null-aware pattern — a null-aware BroadcastHashJoin, with AQE
    * short-circuiting the poisoned branch to an EmptyRelation the moment
    * the build side materializes a null — while the NOT EXISTS form is the
    * one that plans as an ordinary (flag=false) anti join. SubquerySpec
    * pins both shapes. 100 TB shape: NAAJ requires a broadcast build side
    * by construction (Spark refuses to plan it any other way), which is
    * exactly right — the semantics hinge on a global "any null?" predicate
    * only a broadcast can answer locally; the scalable formulations for a
    * non-broadcastable list are precisely the guarded/NOT EXISTS rewrites
    * shown alongside. */
  val notInNull: Q = Q(
    "q98_not_in_null",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql(q98Sql)
    },
    Some(q98Sql))

  // the `late` CTE pins join order: the selective orders filter runs BEFORE
  // the two correlated-subquery joins, so the semi/anti probes see only the
  // late lines, not the whole fact table (Spark's rule-based planner would
  // otherwise attach the subquery joins first and the orders join last —
  // measured ~3× slower at sf0.1: 2.9 s vs 1.1 s)
  private val q127Sql = """WITH late AS (
      SELECT l1.l_orderkey, l1.l_suppkey, l1.l_shipdate
      FROM lineitem l1 JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_suppkey, s_name, COUNT(*) AS numwait
    FROM supplier, late l1
    WHERE s_suppkey = l1.l_suppkey
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_suppkey, s_name"""

  /** TPC-H Q21 shape (adapted: this lineitem has no commit/receipt dates, so
    * "late" is shipdate > orderdate + 60 days): suppliers whose line was the
    * LAST to ship on a late multi-supplier order — one correlated EXISTS and
    * one correlated NOT EXISTS against the SAME fact table the outer query
    * scans, each with a non-equi correlated predicate on top of the
    * orderkey equality. This is the classic planner stress the simpler q85
    * never reaches: Catalyst must de-correlate BOTH into self-joins of
    * lineitem — a LEFT SEMI and a LEFT ANTI co-partitioned on l_orderkey
    * with the suppkey/shipdate comparisons as residual join conditions —
    * while the supplier dim broadcasts. Three scans of the same fact, zero
    * nested-loop re-execution; SubquerySpec pins the semi+anti pair on the
    * physical plan. */
  val lateSupplier: Q = Q(
    "q127_late_supplier",
    (s, dir) => {
      Tables.supplier(s, dir).createOrReplaceTempView("supplier")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql(q127Sql)
    },
    Some(q127Sql))

  // SQL text shared verbatim by both engines: the correlated LATERAL
  // derived table is ANSI (Spark 4 and DuckDB agree on syntax and
  // semantics), and the inner ORDER BY carries a custkey tie-break so the
  // top-3 cut is a total order.
  private val q168Sql = """SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal, t.rnk
    FROM nation n
    CROSS JOIN LATERAL (
      SELECT c_custkey, c_name, c_acctbal,
             ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 3
    ) t"""

  /** q168: correlated LATERAL top-N — the per-row subquery form of
    * top-k-per-group ("for every nation, its 3 richest customers"),
    * exercising Spark 4's lateral derived-table support; the same SQL text
    * runs in both engines. Catalyst de-correlates the lateral into a
    * windowed rank over a c_nationkey-partitioned customer scan — the q58
    * plan — so the declarative per-row form pays the set-based price, not
    * |nations| scans. */
  val lateralTopN: Q = Q(
    "q168_lateral_topn",
    (s, dir) => {
      Tables.nation(s, dir).createOrReplaceTempView("nation")
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      s.sql(q168Sql)
    },
    Some(q168Sql))

  val all: Seq[Q] = Seq(semiAnti, scalar, notInNull, lateSupplier, lateralTopN)
}
