package graft.extract

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.command.DataWritingCommand
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
import org.apache.spark.sql.util.QueryExecutionListener

/** Runtime write-asset capture via QueryExecutionListener — the Spark-native
  * replacement for the reference's trailing-Expr write heuristic
  * (static_extract.py:250-265, SURVEY §2A A8): sinks are observed from the
  * executed write commands themselves, so the false-positive classes
  * (tempView/SQL-text recorded as "writes", SURVEY §4.3.4) cannot occur.
  *
  * The listener bus is asynchronous; `await` polls until the expected count
  * arrives (production code attributes by path, not by ordering).
  */
final class WriteCapture extends QueryExecutionListener {
  private val q = new ConcurrentLinkedQueue[(String, String)]() // (format, path)

  def captured: Seq[(String, String)] = q.asScala.toSeq

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    qe.analyzed.foreach {
      case i: InsertIntoHadoopFsRelationCommand =>
        q.add((i.fileFormat.toString.toLowerCase.replaceAll("[^a-z0-9]", ""),
          i.outputPath.toString))
      case d: DataWritingCommand =>
        q.add((d.getClass.getSimpleName, d.outputColumnNames.mkString(",")))
      case _ => ()
    }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()

  /** Wait for at least n captured writes (listener bus is async). */
  def await(n: Int, timeoutMs: Long = 10000): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (q.size() < n && System.currentTimeMillis() < deadline) Thread.sleep(20)
    q.size() >= n
  }
}

object WriteCapture {
  def install(spark: SparkSession): WriteCapture = {
    val l = new WriteCapture
    spark.listenerManager.register(l)
    l
  }

  def uninstall(spark: SparkSession, l: WriteCapture): Unit =
    spark.listenerManager.unregister(l)
}
