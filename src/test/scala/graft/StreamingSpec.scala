package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming session_window produces the same sessions as batch q06") {
    val streaming = SparkEntry.queries("q31_streaming_sessions")(spark, sfDir)
    val batch = SparkEntry.queries("q06_sessionization")(spark, sfDir)
    assert(streaming.count() === batch.count())
    // per-user session counts agree
    val s = streaming.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = batch.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s === b)
    // event totals agree
    val se = streaming.agg(sum("events_n")).head().getLong(0)
    val be = batch.agg(sum("events_n")).head().getLong(0)
    assert(se === be)
  }
}
