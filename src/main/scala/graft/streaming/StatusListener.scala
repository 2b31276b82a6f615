package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Completion-status eventing — the Spark-native analog of the reference's
  * post-ingestion flow ("Sending completion status of process to CW to
  * terminate EC2", `/root/reference/Untitled Diagram.drawio:147-149`):
  * instead of CloudWatch + Lambda teardown, a QueryExecutionListener /
  * StreamingQueryListener emits one JSON status record per completed
  * action/micro-batch to an in-process sink that a scheduler can watch.
  */
final class StatusListener extends QueryExecutionListener {
  private val events = new ConcurrentLinkedQueue[String]()

  def statuses: List[String] = events.asScala.toList

  // Records must be VALID JSON whatever the payload — the gate now parses
  // them, and an unparseable record classifies as a failure (the safe
  // direction, but a clean run must never produce one). Jackson owns the
  // string escaping, so an error message carrying quotes/newlines (e.g. a
  // path inside an exception message) cannot tear the record.
  private def jstr(s: String): String =
    StatusListener.mapper.writeValueAsString(s)

  private def record(funcName: String, qe: QueryExecution,
                     durationNs: Long, error: Option[String]): Unit = {
    val rows = Option(qe.executedPlan.metrics.get("numOutputRows"))
      .flatten.map(_.value).getOrElse(-1L)
    val status = error.map(e => s""""failed","error":${jstr(e)}""").getOrElse("\"success\"")
    events.add(
      s"""{"action":${jstr(funcName)},"status":$status,"output_rows":$rows,""" +
        s""""duration_ms":${durationNs / 1000000}}""")
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    record(funcName, qe, durationNs, None)

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    record(funcName, qe, 0L, Some(exception.getClass.getSimpleName))
}

object StatusListener {
  // One shared mapper: ObjectMapper construction is heavy and the class is
  // thread-safe after configuration — per-event construction (one per
  // query execution) was avoidable hot-path overhead.
  private[streaming] val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Attach a fresh batch-status listener to the session and return it. */
  def attach(spark: SparkSession): StatusListener = {
    val l = new StatusListener
    spark.listenerManager.register(l)
    l
  }
}

/** Streaming counterpart: one status record per micro-batch progress and a
  * terminal record on query stop ([REF] completion-status analog). */
final class StreamingStatusListener extends StreamingQueryListener {
  private val events = new ConcurrentLinkedQueue[String]()

  def statuses: List[String] = events.asScala.toList

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    events.add(s"""{"query":"${e.id}","status":"started"}""")

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    events.add(
      s"""{"query":"${e.progress.id}","status":"progress",""" +
        s""""batch":${e.progress.batchId},"input_rows":${e.progress.numInputRows}}""")

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    val status = e.exception.map(_ => "failed").getOrElse("completed")
    events.add(s"""{"query":"${e.id}","status":"$status"}""")
  }
}
