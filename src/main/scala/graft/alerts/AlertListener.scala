package graft.alerts

import java.time.Instant

import org.apache.spark.scheduler.{JobSucceeded, SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.alerts.Alerts.{Config, RunContext}

/** Engine-native alert hooks (SURVEY §2 S13).
  *
  * The reference wires its alert callbacks into the Airflow scheduler
  * (`on_failure_callback`, reference: airflow/utils/alerts.py:19-41); a
  * Spark pipeline's equivalent failure surface is the listener bus, so
  * these adapters translate scheduler events into [[Alerts.RunContext]]s
  * and fan out through the configured channels.
  *
  * Registration:
  * {{{
  * spark.sparkContext.addSparkListener(
  *   new AlertListener(sender, cfg, pipelineId = "daily_etl"))
  * spark.streams.addListener(
  *   new StreamingAlertListener(sender, cfg, pipelineId = "ingest"))
  * }}}
  *
  * Listener callbacks run on the bus dispatch thread: they must never
  * throw (the sender contract already absorbs delivery failures) and
  * never block the bus on network latency beyond the sender's own
  * timeout — at cluster scale point the sender at a local relay, not a
  * slow external endpoint.
  */
final class AlertListener(
    sender: WebhookSender,
    cfg: Config,
    pipelineId: String,
    clock: () => Instant = () => Instant.now())
  extends SparkListener {

  /** Job-level failure → failure fan-out. Success is NOT announced
    * per-job (a pipeline runs many jobs); callers announce pipeline
    * success explicitly via [[Alerts.notifySuccess]], mirroring the
    * reference's "use on last task only" success callback
    * (alerts.py:123-124). */
  override def onJobEnd(jobEnd: SparkListenerJobEnd): Unit =
    jobEnd.jobResult match {
      case JobSucceeded => ()
      case failed => // JobFailed is private[spark]; its toString carries the cause
        Alerts.notifyFailure(sender, cfg, RunContext(
          pipelineId = pipelineId,
          taskId = s"job-${jobEnd.jobId}",
          executionDate = clock().toString,
          runId = s"job-${jobEnd.jobId}-${jobEnd.time}",
          tryNumber = 1,
          error = Some(failed.toString)))
    }
}

/** Streaming twin: a terminated query with an exception is a failure; a
  * clean stop (e.g. AvailableNow completion) resolves/announces success
  * so a PagerDuty incident opened by an earlier crash auto-closes on the
  * healthy rerun. */
final class StreamingAlertListener(
    sender: WebhookSender,
    cfg: Config,
    pipelineId: String,
    clock: () => Instant = () => Instant.now())
  extends StreamingQueryListener {

  private def ctx(id: java.util.UUID, runId: java.util.UUID,
                  error: Option[String]): RunContext = RunContext(
    pipelineId = pipelineId,
    taskId = s"stream-$id",
    executionDate = clock().toString,
    runId = runId.toString,
    tryNumber = 1,
    error = error)

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = ()

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit =
    event.exception match {
      case Some(err) =>
        Alerts.notifyFailure(sender, cfg, ctx(event.id, event.runId, Some(err)))
      case None =>
        Alerts.notifySuccess(sender, cfg, ctx(event.id, event.runId, None))
    }
}
