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

  private val skewKeys: Seq[(String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "lineitem.l_orderkey"),
    ("lineitem", "l_partkey", "lineitem.l_partkey"),
    ("lineitem", "l_suppkey", "lineitem.l_suppkey"),
    ("orders", "o_custkey", "orders.o_custkey"),
    ("events", "user_id", "events.user_id"))

  /** q178: the "should I salt?" report — for every join-key family of the
    * schema, the exact skew profile that decides partitioning strategy:
    * distinct keys, rows, the heaviest key's row count and share, and the
    * avg rows/key. A share near 1/|partitions| means one straggler owns a
    * reducer — the q49 salting (or AQE skew-join) trigger; reading this
    * BEFORE wiring a join is the difference between a plan that survives
    * 100× and one that stalls on a hot key.
    *
    * Distributed shape: per family, one map-side-combined key count then a
    * 1-row aggregate over the key-grain table; scans read exactly one
    * column. The max-share division is the only double. */
  val skewReport: Q = Q(
    "q178_skew_report",
    (s, dir) => {
      skewKeys.map { case (table, key, famName) =>
        val counts = Tables.table(s, dir, table).select(col(key).as("k"))
          .groupBy("k").agg(count(lit(1)).as("c"))
        counts.agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
            max("c").as("max_key_rows"))
          .select(lit(famName).as("key_family"), col("n_keys"), col("n_rows"),
            col("max_key_rows"),
            (col("max_key_rows").cast("double") / col("n_rows").cast("double"))
              .as("max_share"),
            (col("n_rows").cast("double") / col("n_keys").cast("double"))
              .as("avg_rows_per_key"))
      }.reduce(_ unionAll _)
    },
    Some(skewKeys.map { case (table, key, famName) =>
      s"""SELECT '$famName' AS key_family,
        count(1) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
        CAST(MAX(c) AS BIGINT) AS max_key_rows,
        CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS max_share,
        CAST(SUM(c) AS DOUBLE) / CAST(count(1) AS DOUBLE) AS avg_rows_per_key
      FROM (SELECT $key AS k, count(1) AS c FROM $table GROUP BY $key)"""
    }.mkString("\nUNION ALL\n")))

  val all: Seq[Q] = Seq(skewSaltedJoin, skewReport)
}
