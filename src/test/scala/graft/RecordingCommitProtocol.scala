package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage
import org.apache.spark.internal.io.FileNameSpec
import org.apache.spark.sql.execution.datasources.SQLHadoopMapReduceCommitProtocol

/** The executable half of SURVEY §2.1's cloud-committer claim: every file
  * sink commits through `spark.sql.sources.commitProtocolClass`, so moving
  * to an S3/cloud-native committer is a CONFIG SWAP, not a code change.
  * This subclass proves the swap by execution — Spark instantiates it
  * reflectively (3-arg constructor, the `FileCommitProtocol.instantiate`
  * contract), and it counts every lifecycle hook it is driven through
  * while delegating the actual semantics to the stock protocol. A real
  * deployment substitutes e.g. the S3A magic committer's protocol class
  * the same way; nothing in graft's sinks knows the difference.
  *
  * Counters are JVM-global statics: under local[*] driver and executors
  * share the JVM, so task-side hooks are visible to the asserting test. */
class RecordingCommitProtocol(jobId: String, path: String,
                              dynamicPartitionOverwrite: Boolean)
  extends SQLHadoopMapReduceCommitProtocol(jobId, path, dynamicPartitionOverwrite) {

  override def setupJob(jobContext: JobContext): Unit = {
    RecordingCommitProtocol.jobsSetup.incrementAndGet()
    super.setupJob(jobContext)
  }

  override def commitJob(jobContext: JobContext,
                         taskCommits: Seq[TaskCommitMessage]): Unit = {
    RecordingCommitProtocol.jobsCommitted.incrementAndGet()
    super.commitJob(jobContext, taskCommits)
  }

  override def newTaskTempFile(taskContext: TaskAttemptContext,
                               dir: Option[String], spec: FileNameSpec): String = {
    RecordingCommitProtocol.tempFiles.incrementAndGet()
    super.newTaskTempFile(taskContext, dir, spec)
  }

  override def commitTask(taskContext: TaskAttemptContext): TaskCommitMessage = {
    RecordingCommitProtocol.tasksCommitted.incrementAndGet()
    super.commitTask(taskContext)
  }
}

object RecordingCommitProtocol {
  val jobsSetup      = new AtomicInteger(0)
  val jobsCommitted  = new AtomicInteger(0)
  val tempFiles      = new AtomicInteger(0)
  val tasksCommitted = new AtomicInteger(0)
  def reset(): Unit =
    Seq(jobsSetup, jobsCommitted, tempFiles, tasksCommitted).foreach(_.set(0))
}
