package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** `system.query_log` analog (reference: system tables,
  * src/query/storages/system/src/ — query_log being the operationally
  * important one): a QueryExecutionListener records every completed
  * action's timing and plan summary into a bounded in-memory ring,
  * exposed as the `system_query_log` view.
  */
object QueryLog {

  final case class Entry(
      ts_ms: Long,
      action: String,
      duration_ms: Double,
      status: String,
      error: String,
      output_columns: String,
      plan_head: String)

  private val maxEntries = 10000
  private val buf = new java.util.concurrent.ConcurrentLinkedDeque[Entry]()
  @volatile private var installed: Option[QueryExecutionListener] = None

  private def push(e: Entry): Unit = {
    buf.addLast(e)
    while (buf.size() > maxEntries) buf.pollFirst()
  }

  private def summarize(qe: QueryExecution): (String, String) = {
    val cols = qe.analyzed.output.map(_.name).mkString(",")
    val head = qe.executedPlan.nodeName
    (cols, head)
  }

  /** Install the listener (idempotent) and register the view. */
  def register(spark: SparkSession): Unit = synchronized {
    if (installed.isEmpty) {
      val l = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
          val (cols, head) = summarize(qe)
          push(Entry(System.currentTimeMillis(), funcName, durationNs / 1e6,
            "ok", "", cols, head))
        }
        override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = {
          val (cols, head) = summarize(qe)
          push(Entry(System.currentTimeMillis(), funcName, 0.0,
            "error", String.valueOf(e.getMessage), cols, head))
        }
      }
      spark.listenerManager.register(l)
      installed = Some(l)
    }
    refreshView(spark)
  }

  /** Materialize the current ring as the `system_query_log` temp view. */
  def refreshView(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val df = buf.iterator().asScala.toSeq.toDF()
    df.createOrReplaceTempView("system_query_log")
    df
  }

  def clear(): Unit = buf.clear()
}
