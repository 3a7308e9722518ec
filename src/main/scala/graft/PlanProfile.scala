package graft

import org.apache.spark.sql.SparkSession

/** Per-query time split — guide §1 "measure first" for the long tail: a
  * registered query's wall clock is (a) the builder call (driver-side Scala,
  * including any collect-driven loops), (b) Catalyst analysis + optimization
  * + physical planning, and (c) execution. Optimizing (c) is pointless for a
  * query whose time is (a)/(b) — this tool says which it is, per query,
  * after the same warmup discipline Bench uses.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.PlanProfile [query ...]
  * Prints: PROF <name> build=<s> plan=<s> exec=<s> total=<s>
  * (best-of-2 per phase; `plan` forces queryExecution.executedPlan on a
  * fresh frame, so with AQE it covers the INITIAL physical plan — runtime
  * re-optimization still lands in exec, as it does in production.)
  */
object PlanProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // warmup identical to Bench: one untimed pass + shared-frame rewarm
    names.foreach { n => SparkEntry.queries(n)(spark, sfDir).count() }
    PlanCache.rewarm(spark)
    def best2(f: => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val tBuild = best2 { fn(spark, sfDir) }
      val tPlan = best2 {
        fn(spark, sfDir).queryExecution.executedPlan
      }
      val tExec = best2 { fn(spark, sfDir).count() }
      println(f"PROF $n build=$tBuild%.3f plan=${math.max(0.0, tPlan - tBuild)}%.3f " +
        f"exec=${math.max(0.0, tExec - tPlan)}%.3f total=$tExec%.3f")
    }
    spark.stop()
  }
}
