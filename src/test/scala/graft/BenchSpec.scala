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
    val json = Bench.renderJson(rs, sfDir, gcSec = 0.1, persistentRdds = 0, storageBytes = 0L,
      regs = Nil, warmSharedSec = 0.0, rewarmed = Nil, selfHeals = Nil)
    assert(json.contains("\"boom\":-1.0"), json)
    assert(json.contains("\"failed\":1"), json)
    // total sums only successes — the failure must not contribute −1
    val total = """"value":([-0-9.eE]+)""".r.findFirstMatchIn(json).get.group(1).toDouble
    assert(total >= 0.0, json)
  }

  test("load probes land in both JSON lines; external cores are measurable") {
    val rs = Seq(Bench.QResult("ok", 0.5, None))
    val json = Bench.renderJson(rs, sfDir, 0.0, 0, 0L, Nil, 0.0, Nil, Nil,
      Map.empty, loadBefore = 1.25, loadAfter = 3.5, extBusy = 0.75)
    assert(json.contains("\"load_before\":1.25"), json)
    assert(json.contains("\"load_after\":3.5"), json)
    assert(json.contains("\"external_busy_cores\":0.75"), json)
    val summary = Bench.renderSummary(rs, sfDir, Nil,
      loadBefore = 1.25, loadAfter = 3.5, extBusy = 0.75)
    assert(summary.contains("\"external_busy_cores\":0.75"), summary)
    // default (unprobed) renders -1.0, never an absent field
    val bare = Bench.renderJson(rs, sfDir, 0.0, 0, 0L, Nil, 0.0, Nil, Nil)
    assert(bare.contains("\"external_busy_cores\":-1.0"), bare)
    // the probe itself: non-negative on this Linux box, and self time is
    // excluded (an idle-probe reading can't be the whole machine)
    val ext = Bench.externalBusyCores(ms = 200)
    assert(ext >= 0.0)
    assert(ext <= Runtime.getRuntime.availableProcessors.toDouble)
  }

  test("regression alarm: pinned queries over 2x and 0.5s flag; others don't") {
    val rs = Seq(
      Bench.QResult("q_slow", 7.29, None),     // pinned 1.93 -> 3.8x, flags
      Bench.QResult("q_jitter", 0.12, None),   // pinned 0.05 -> 2.4x but under abs floor
      Bench.QResult("q_fine", 1.00, None),     // pinned 0.90 -> 1.1x
      Bench.QResult("q_unpinned", 9.0, None),  // no pin -> never flags
      Bench.QResult("q_broken", -1.0, Some("boom"))) // failures aren't regressions
    val pins = Map("q_slow" -> 1.93, "q_jitter" -> 0.05, "q_fine" -> 0.9,
      "q_broken" -> 0.1)
    val regs = Bench.regressions(rs, pins)
    assert(regs == Seq(("q_slow", 7.29, 1.93)), regs.toString)
    // no confirm reading -> the [timed, pin] shape (pre-r13 compatible)
    val json = Bench.renderJson(rs, sfDir, 0.0, 0, 0L, regs, warmSharedSec = 1.234,
      rewarmed = Seq("q14_pairs" -> 0.2345), selfHeals = Seq("qa_corpus" -> "q30_qa"))
    assert(json.contains("\"regressions\":{\"q_slow\":[7.29,1.93]}"), json)
    assert(json.contains("\"warm_shared_sec\":1.234"), json)
    assert(json.contains("\"rewarm_sec\":{\"q14_pairs\":0.235"), json)
    assert(json.contains("\"cache_selfheals\":[\"qa_corpus@q30_qa\"]"), json)
    val summary = Bench.renderSummary(rs, sfDir, regs, Seq("qa_corpus" -> "q30_qa"))
    assert(summary.contains("\"regressions\":{\"q_slow\":[7.29,1.93]}"), summary)
    assert(summary.contains("\"cache_selfheals\":[\"qa_corpus@q30_qa\"]"), summary)
  }

  test("confirm pass: breached queries re-time once and emit [timed,pin,confirm]") {
    val qs = Seq(
      "q_slow" -> ((s: SparkSession, d: String) => Tables.region(s, d)),
      "q_fine" -> ((s: SparkSession, d: String) => Tables.region(s, d)))
    val regs = Seq(("q_slow", 7.29, 1.93))
    val confirm = Bench.confirmRegs(spark, sfDir, qs, regs)
    assert(confirm.keySet == Set("q_slow"), confirm.toString) // only breaches re-run
    assert(confirm("q_slow") >= 0.0, "confirm of a working query must be a wall time")
    val rs = Seq(Bench.QResult("q_slow", 7.29, None, 1700000000000L),
      Bench.QResult("q_fine", 1.0, None, 1700000010000L))
    val json = Bench.renderJson(rs, sfDir, 0.0, 0, 0L, regs, 0.0, Nil, Nil,
      confirm = Map("q_slow" -> 1.889))
    assert(json.contains("\"regressions\":{\"q_slow\":[7.29,1.93,1.89]}"), json)
    val summary = Bench.renderSummary(rs, sfDir, regs,
      confirm = Map("q_slow" -> 1.889), gcSec = 0.5,
      rewarmed = Seq("a" -> 0.1, "q14_pairs" -> 0.42))
    assert(summary.contains("\"regressions\":{\"q_slow\":[7.29,1.93,1.89]}"), summary)
    assert(summary.contains("\"reg_t_start\":{\"q_slow\":1700000000000}"), summary)
    assert(summary.contains("\"gc_sec\":0.5"), summary)
    assert(summary.contains("\"rewarm_max\":{\"q14_pairs\":0.42}"), summary)
  }

  test("regression alarm adds the recorded warm-suite delta to isolated pins") {
    // r17 (VERDICT r16 #4): q113/q148/q237 are pinned from ISOLATED quiet
    // readings; the warm:<query> entry widens only their band so the
    // sensitive pin doesn't fire permanently inside a warm suite
    val pins = Map("q_iso" -> 1.0, "warm:q_iso" -> 0.9, "q_plain" -> 1.0)
    val rs = Seq(Bench.QResult("q_iso", 3.7, None),
      Bench.QResult("q_plain", 3.7, None))
    // q_iso band = 2*(1.0+0.9) = 3.8 -> quiet at 3.7; q_plain band = 2.0
    assert(Bench.regressions(rs, pins).map(_._1) === Seq("q_plain"))
    // past the widened band the alarm still fires, reporting the BASE pin
    val rs2 = Seq(Bench.QResult("q_iso", 3.9, None))
    assert(Bench.regressions(rs2, pins) === Seq(("q_iso", 3.9, 1.0)))
  }

  test("total_confirmed substitutes confirm readings; -1 confirms never substitute") {
    val rs = Seq(
      Bench.QResult("q_slow", 9.73, None),   // breached; confirm 1.42
      Bench.QResult("q_bad", 5.0, None),     // breached; confirm failed (-1)
      Bench.QResult("q_fine", 1.0, None),
      Bench.QResult("q_broken", -1.0, Some("boom"))) // failure: in neither total
    val confirm = Map("q_slow" -> 1.42, "q_bad" -> -1.0)
    // q_slow substituted, q_bad keeps its timed reading, q_broken excluded
    assert(math.abs(Bench.totalConfirmed(rs, confirm) - (1.42 + 5.0 + 1.0)) < 1e-9)
    // no confirms -> identical to the raw successful total
    assert(math.abs(Bench.totalConfirmed(rs, Map.empty) - (9.73 + 5.0 + 1.0)) < 1e-9)
    val regs = Seq(("q_slow", 9.73, 2.0), ("q_bad", 5.0, 2.0))
    val json = Bench.renderJson(rs, sfDir, 0.0, 0, 0L, regs, 0.0, Nil, Nil, confirm)
    assert(json.contains("\"total_confirmed\":7.42"), json)
    val summary = Bench.renderSummary(rs, sfDir, regs, confirm = confirm)
    assert(summary.contains("\"total_confirmed\":7.42"), summary)
  }

  test("timestamps: full line carries per-query t_start; summary t0 + ckpt offsets") {
    val rs = (0 until 25).map(i =>
      Bench.QResult(f"q$i%02d", 0.1, None, 1700000000000L + i * 1000L))
    val json = Bench.renderJson(rs, sfDir, 0.0, 0, 0L, Nil, 0.0, Nil, Nil)
    assert(json.contains("\"t_start\":{\"q00\":1700000000000,"), json)
    assert(json.contains("\"q24\":1700000024000}"), json)
    val summary = Bench.renderSummary(rs, sfDir, Nil)
    assert(summary.contains("\"t0\":1700000000000"), summary)
    // every 10th query start as offset-from-t0 seconds: q00, q10, q20
    assert(summary.contains("\"ckpt_sec\":[0.0,10.0,20.0]"), summary)
  }

  test("self-heal forensics: an external unpersist of a cached entry is recorded") {
    PlanCache.drainSelfHeals()
    val name = "benchspec_selfheal_probe"
    val df = PlanCache.cached(spark, name, sfDir, sfDir + "/region.parquet") {
      Tables.region(spark, sfDir)
    }
    df.count()
    df.unpersist(blocking = true) // the CacheManager eviction class, by reference
    PlanCache.setConsumer("q_probe_consumer")
    val again = PlanCache.cached(spark, name, sfDir, sfDir + "/region.parquet") {
      Tables.region(spark, sfDir)
    }
    assert(again.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "self-heal did not re-persist the evicted entry")
    val events = PlanCache.drainSelfHeals()
    assert(events.contains((name, "q_probe_consumer")), events.toString)
    again.unpersist(blocking = true)
  }

  test("every non-aux registered query has a bench pin (alarm coverage)") {
    // The regression alarm only protects what it can see (VERDICT r11: q213's
    // 3.11 s was invisible because the 20 r11 queries landed unpinned). Every
    // new operator must land with its pin in the same commit.
    val pins = Bench.loadPins("bench_pins.json")
    assert(pins.nonEmpty, "bench_pins.json missing or unparseable")
    val unpinned = SparkEntry.queries.keys.toSeq
      .filterNot(_.startsWith("aux_")).filterNot(pins.contains).sorted
    assert(unpinned.isEmpty, s"queries without a bench pin: ${unpinned.mkString(", ")}")
  }

  test("oracleRefJson embeds _total/_meta and degrades on old-format/missing files") {
    // r18 (VERDICT r17 #3): the bench artifact carries the DuckDB side of
    // the matched pair with its measurement metadata, so a ratio swing is
    // attributable from BENCH_r{N} alone.
    val f = java.nio.file.Files.createTempFile("otimes", ".json")
    java.nio.file.Files.write(f,
      ("""{"q01_x": 0.031, "_total": 106.7, "_meta": {"duckdb_version": """ +
        """"v1.0.0", "ts": "2026-08-16T00:00:00+00:00", "ext_busy_cores": 0.05}}""")
        .getBytes)
    val ref = Bench.oracleRefJson(f.toString)
    assert(ref.contains(""""total":106.7"""), ref)
    assert(ref.contains(""""duckdb_version": "v1.0.0""""), ref)
    // embedded raw meta must still be valid JSON inside a bench line
    assert(ref.count(_ == '{') == ref.count(_ == '}'), ref)
    // pre-r18 dump (no _total/_meta) and missing file → "{}" not a throw
    val old = java.nio.file.Files.createTempFile("otimes_old", ".json")
    java.nio.file.Files.write(old, """{"q01_x": 0.031}""".getBytes)
    assert(Bench.oracleRefJson(old.toString) == "{}")
    assert(Bench.oracleRefJson("/nonexistent/otimes.json") == "{}")
    java.nio.file.Files.delete(f); java.nio.file.Files.delete(old)
  }

  test("loadPins parses a flat json map and tolerates a missing file") {
    val f = java.nio.file.Files.createTempFile("pins", ".json")
    java.nio.file.Files.write(f,
      """{"q01_x": 0.34, "q148_source_overlap":1.93}""".getBytes)
    val pins = Bench.loadPins(f.toString)
    assert(pins == Map("q01_x" -> 0.34, "q148_source_overlap" -> 1.93), pins)
    assert(Bench.loadPins("/nonexistent/pins.json").isEmpty)
    java.nio.file.Files.delete(f)
  }
}
