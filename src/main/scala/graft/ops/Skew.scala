package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Skew mitigation for joins with hot keys: salt the (large, skewed) left side
  * into `salt` sub-keys and replicate the right side once per salt value, so a
  * hot key's rows spread across `salt` tasks instead of one straggler. AQE's
  * skew-join handles the sort-merge case at runtime; explicit salting is the
  * deterministic-plan alternative and the only option for non-AQE engines or
  * aggregate-under-join shapes.
  */
object Skew {

  /** Equi-join `left.leftKey == right.rightKey` with left-side salting.
    * Semantics identical to the plain join (verified in SkewSpec, incl. the
    * left-outer case) for join types that preserve each left row's single
    * salt value; cost is a `salt`× replication of the right side — use when
    * right ≪ left.
    *
    * Right/full outer joins are rejected: the right side is exploded once per
    * salt value, so each unmatched right row would surface `salt` times as
    * duplicate null-extended rows. Salt the other way around (swap the
    * inputs) for a right-heavy skew.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      joinType: String = "inner", salt: Int = 8): DataFrame = {
    require(salt > 0, "salt must be positive")
    val ok = Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(ok.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin does not support joinType=$joinType: unmatched right rows " +
        "would be replicated once per salt value; swap the inputs instead")
    // deterministic pseudo-random salt from the whole left row
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.toIndexedSeq.map(left(_)): _*), lit(salt)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    l.join(r, leftKey === rightKey && l("__salt") === r("__salt"), joinType)
      .drop("__salt")
  }

  /** The salted join registered as a driver-checked query: salting must be
    * invisible in the result, so the oracle is the PLAIN join — the DuckDB
    * hash-compare proves semantic neutrality on real data, not just in unit
    * tests. Aggregated per brand (bounded groups, round(sum,2) per the FP
    * contract). */
  val skewSaltedJoin: Q = Q(
    "q49_skew_salted_join",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      saltedJoin(li, p, li("l_partkey"), p("p_partkey"), "inner", salt = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
    },
    Some("""SELECT p_brand, COUNT(1) AS n,
        ROUND(SUM(l_extendedprice), 2) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand"""))

  val all: Seq[Q] = Seq(skewSaltedJoin)
}
