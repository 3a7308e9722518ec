package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark plan builder over an sf-dir plus (when the
  * semantics are ANSI-SQL-expressible) equivalent DuckDB oracle SQL the driver
  * hash-compares against. `oracle = None` → driver runs a rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
