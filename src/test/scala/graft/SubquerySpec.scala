package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SubquerySpec extends AnyFunSuite {
  import SparkTestSession._

  test("q85 EXISTS/NOT EXISTS/IN rewrite to semi/anti joins, never nested loops") {
    val df = SparkEntry.queries("q85_exists_subquery")(spark, sfDir)
    df.count() // let AQE finalize the physical plan before inspecting it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in plan:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join in plan:\n$plan")
    // the 25-row nation IN-list must come in broadcast, and nothing may
    // degenerate into a per-row nested-loop re-execution
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast semi join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join leaked:\n$plan")
  }

  test("q85 matches an independent composition of joins") {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val expected = c
      .join(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .join(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(n.filter(col("n_regionkey") < 3).select(col("n_nationkey")),
        col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val got = SparkEntry.queries("q85_exists_subquery")(spark, sfDir)
    assert(got.count() > 0)
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("q86 scalar subqueries: literals injected once, correlated count is join+agg") {
    val df = SparkEntry.queries("q86_scalar_subquery")(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // the correlated COUNT de-correlates into an aggregate + outer join on
    // l_orderkey — not a per-row nested-loop probe
    assert(plan.contains("HashAggregate"), s"no pre-aggregation in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join leaked:\n$plan")
  }

  test("q98 NOT IN null semantics: poisoned variant empty, rewrites agree, NAAJ planned") {
    val df = SparkEntry.queries("q98_not_in_null")(spark, sfDir)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // three-valued logic: one NULL in the list empties the NOT IN
    assert(got("not_in_null_poisoned") === 0L)
    // the two correct formulations agree and are non-trivial
    assert(got("not_in_null_filtered") === got("not_exists"))
    assert(got("not_exists") > 0L,
      "sf0.001 must contain customers with no urgent orders")
    // cross-check against an explicit anti join
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val expected = c.join(
      o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
      col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(got("not_exists") === expected)
    // the poisoned variant must plan as a NULL-AWARE anti join — a plain
    // LEFT ANTI would leak every customer through when the list has a NULL.
    // Catalyst's canonical NAAJ shape is `(key = x) OR isnull(key = x)` on a
    // LeftAnti join; physically it prints as the trailing `true` flag on
    // BroadcastHashJoin (NAAJ requires a broadcast build by construction —
    // the "any null in the list?" predicate is global)
    val logical = df.queryExecution.optimizedPlan.toString
    assert(logical.contains("LeftAnti") && logical.contains("OR isnull("),
      s"no null-aware anti join pattern in logical plan:\n${logical.take(1200)}")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("LeftAnti, BuildRight, true") ||
      physical.contains("EmptyRelation"), // AQE: a null on the build side
      // short-circuits the whole branch to empty at runtime
      s"no NAAJ/empty-relation in physical plan:\n${physical.take(1200)}")
  }

  test("q86 matches an independent window/join recomputation") {
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val bounds = o.agg(max(col("o_totalprice")).as("mx"), min(col("o_totalprice")).as("mn"))
      .head()
    val (mx, mn) = (bounds.getDouble(0), bounds.getDouble(1))
    // distinct key name: sharing `l_orderkey` between the recomputed side and
    // the de-correlated got-plan trips a Catalyst constraint-rewrite ambiguity
    // inside exceptAll's union
    val counts = li.select(col("l_orderkey").as("lo_key"))
      .groupBy(col("lo_key")).agg(count(lit(1)).as("n_items"))
    val expected = o.filter(col("o_totalprice") >= lit(2.0) * lit(mn))
      .join(counts, col("o_orderkey") === col("lo_key"), "left")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        (col("o_totalprice") / lit(mx)).as("price_ratio"),
        coalesce(col("n_items"), lit(0L)).as("n_items"))
    val got = SparkEntry.queries("q86_scalar_subquery")(spark, sfDir)
    // collect-compare (tiny at sf0.001): unioning the de-correlated plan into
    // exceptAll trips the same Catalyst constraint-rewrite bug as above, from
    // the got side's own pruned-attribute constraints
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("price_ratio"), col("n_items"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    val g = rows(got)
    assert(g.nonEmpty)
    assert(g === rows(expected))
  }

  test("q127 Q21 shape: both correlated subqueries become lineitem self semi/anti joins") {
    val df = SparkEntry.queries("q127_late_supplier")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in plan:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested loop crept into the Q21 shape:\n$plan")
    // independent recompute with explicit joins (no subqueries)
    val li = Tables.lineitem(spark, sfDir)
    val l1 = li.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val others = li.select(col("l_orderkey").as("o2_orderkey"),
      col("l_suppkey").as("o2_suppkey"), col("l_shipdate").as("o2_shipdate"))
    val late = l1.join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey") && col("o_orderstatus") === "F" &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val multi = late.join(others,
        col("l_orderkey") === col("o2_orderkey") &&
          col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
    val lastShip = multi.join(others,
        col("l_orderkey") === col("o2_orderkey") &&
          col("l_suppkey") =!= col("o2_suppkey") &&
          col("o2_shipdate") > col("l_shipdate"), "left_anti")
    val expected = lastShip
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name").agg(count(lit(1)).as("numwait"))
    assert(df.count() > 0)
    assert(df.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(df).count() === 0)
  }
}
