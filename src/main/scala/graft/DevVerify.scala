package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only subset of [[Verify]]: dump ONLY the named queries (plus their
  * oracle SQL) so `tools/verify_local.py` can hash-compare one new operator
  * without re-running the whole 140-query suite.
  *
  * Usage: runMain graft.DevVerify <sfDir> <outDir> <query> [query...]
  */
object DevVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.oracle.sfdir", sfDir)
    System.setProperty("graft.oracle.outdir", new java.io.File(outDir).getAbsolutePath)
    System.setProperty("graft.oracle.runstart", System.currentTimeMillis().toString)
    new java.io.File(outDir).mkdirs()
    val missing = names -- SparkEntry.queries.keySet
    require(missing.isEmpty, s"unknown queries: $missing")
    SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[dev] dumped $name")
    }
    // the lineage-family dynamic oracles (q26/q28/q29/q30/q44/q183/q184) need
    // the aux dumps in the same outDir — cheap (metadata scale), dump always
    try ops.LineageQueries.dumpRetrievalAux(spark, sfDir, outDir)
    catch { case e: Throwable =>
      System.err.println(s"[dev] aux dump failed: ${e.getMessage}")
    }
    val json = SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${Json.str(k)}: ${Json.str(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
