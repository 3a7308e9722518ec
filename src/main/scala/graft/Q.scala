package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark plan builder over an sf-dir plus (when the
  * semantics are ANSI-SQL-expressible) equivalent DuckDB oracle SQL the driver
  * hash-compares against. `oracle = None` → driver runs a rows-only check.
  *
  * `oracleDyn`, when set, is consulted at oracle-dump time (after the queries
  * have run) and wins over `oracle` — for oracles that embed run-derived
  * literals, e.g. q34's trained IVF centroids. Returning None falls back to
  * `oracle` (and then to a rows-only check).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleDyn: Option[() => Option[String]] = None)
