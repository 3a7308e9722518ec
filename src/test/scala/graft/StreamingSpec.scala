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

  test("flatMapGroupsWithState sessionization matches session_window") {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    val stageDir = s"/root/repo/target/graft_stream/$tag"
    val q = graft.streaming.StreamingSessions.statefulSessions(spark, stageDir)
      .writeStream.format("memory").queryName("graft_stateful").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val stateful = spark.table("graft_stateful").cache()
    stateful.count()
    val sw = SparkEntry.queries("q31_streaming_sessions")(spark, sfDir)
    assert(stateful.count() === sw.count())
    val a = stateful.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = sw.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
