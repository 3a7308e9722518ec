package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bench failure-honesty: a throwing query must surface in the JSON as an
  * error with a −1 timing, never as a fast-looking wall time (a broken query
  * would otherwise read as a performance win in the driver's BENCH JSON). */
class BenchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("a failing query reports err and -1 seconds, not a wall time") {
    val qs = Seq(
      "ok" -> ((s: SparkSession, d: String) => Tables.region(s, d)),
      "boom" -> ((s: SparkSession, d: String) => s.sql("SELECT * FROM graft_missing_table")))
    val rs = Bench.runSuite(spark, sfDir, qs)
    val boom = rs.find(_.name == "boom").get
    assert(boom.err.isDefined, "throwing query did not surface an error")
    assert(boom.sec == -1.0)
    assert(rs.find(_.name == "ok").get.err.isEmpty)
    val json = Bench.renderJson(rs, sfDir, gcSec = 0.1, persistentRdds = 0, storageBytes = 0L)
    assert(json.contains("\"boom\":-1.0"), json)
    assert(json.contains("\"failed\":1"), json)
    // total sums only successes — the failure must not contribute −1
    val total = """"value":([-0-9.eE]+)""".r.findFirstMatchIn(json).get.group(1).toDouble
    assert(total >= 0.0, json)
  }
}
