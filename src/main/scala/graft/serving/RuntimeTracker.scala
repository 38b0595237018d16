package graft.serving

import java.time.{Instant, ZoneId}
import java.time.format.DateTimeFormatter

/** Route-execution runtime tracking — the reference's
  * `api/logs/Tracker.py` + `api/logs/models.py`: a fixed route list in
  * scheduler order, each with not_started/in_progress/completed/failed
  * status, start/end/duration, error details; app-level start/end and a
  * total error count. The middleware (`api/logs/middleware.py:11-45`)
  * drives start/complete/fail around each tracked request —
  * [[HttpServing]] does the same around its handlers.
  *
  * One deliberate divergence, documented: the reference marks
  * `app_end_time` when a route named `/extract/convo-analysis` completes
  * (`Tracker.py:45-50`), but its tracked list registers
  * `/extract/process-convo` — the comparison can never fire, so its
  * app_status stays "running" forever. We implement the evident intent:
  * the LAST scheduler-ordered route's completion ends the app run.
  *
  * `clock` is injectable so specs pin exact timestamps.
  */
final class RuntimeTracker(clock: () => Instant = () => Instant.now()) {

  /** `RouteStatus` (models.py:6-10). */
  object Status {
    val NotStarted = "not_started"
    val InProgress = "in_progress"
    val Completed = "completed"
    val Failed = "failed"
  }

  /** `RouteExecution` (models.py:13-21). */
  final class RouteExecution(val route: String) {
    @volatile var status: String = Status.NotStarted
    @volatile var startTime: Option[Instant] = None
    @volatile var endTime: Option[Instant] = None
    @volatile var durationSeconds: Option[Double] = None
    @volatile var errorMessage: Option[String] = None
    @volatile var errorType: Option[String] = None
  }

  /** The tracked list, scheduler order (models.py:33-38 = app.py:45-55). */
  val TrackedRoutes: Seq[String] = Seq(
    "/extract/process-agents",
    "/extract/process-tags",
    "/extract/process-tickets-and-messages",
    "/extract/process-convo")

  @volatile private var appStart: Option[Instant] = None
  @volatile private var appEnd: Option[Instant] = None
  @volatile private var errors: Int = 0
  private val routes: Seq[RouteExecution] = TrackedRoutes.map(new RouteExecution(_))

  /** `initialize()` (Tracker.py:16-18): stamp the app start. */
  def initialize(): Unit = synchronized {
    appStart = Some(clock())
    appEnd = None
    errors = 0
    routes.foreach { r =>
      r.status = Status.NotStarted
      r.startTime = None; r.endTime = None; r.durationSeconds = None
      r.errorMessage = None; r.errorType = None
    }
  }

  def initialized: Boolean = appStart.isDefined
  def appStartTime: Option[Instant] = appStart
  def appEndTime: Option[Instant] = appEnd
  def totalErrors: Int = errors
  def totalDurationSeconds: Option[Double] =
    for (s <- appStart; e <- appEnd) yield (e.toEpochMilli - s.toEpochMilli) / 1000.0
  def routeExecutions: Seq[RouteExecution] = routes

  private def find(path: String): Option[RouteExecution] = routes.find(_.route == path)

  def startRoute(path: String): Unit = synchronized {
    if (appStart.isEmpty) return
    find(path).foreach { r =>
      r.status = Status.InProgress
      r.startTime = Some(clock())
    }
  }

  def completeRoute(path: String): Unit = synchronized {
    if (appStart.isEmpty) return
    find(path).foreach { r =>
      if (r.startTime.isDefined) {
        val end = clock()
        r.endTime = Some(end)
        r.durationSeconds =
          r.startTime.map(s => (end.toEpochMilli - s.toEpochMilli) / 1000.0)
        r.status = Status.Completed
        // intent of Tracker.py:45-50 (see class doc): last route ends the run
        if (path == TrackedRoutes.last) appEnd = Some(end)
      }
    }
  }

  def failRoute(path: String, error: Throwable): Unit = synchronized {
    if (appStart.isEmpty) return
    find(path).foreach { r =>
      if (r.startTime.isDefined) {
        val end = clock()
        r.endTime = Some(end)
        r.durationSeconds =
          r.startTime.map(s => (end.toEpochMilli - s.toEpochMilli) / 1000.0)
        r.status = Status.Failed
        r.errorMessage = Some(String.valueOf(error.getMessage))
        r.errorType = Some(error.getClass.getSimpleName)
        errors += 1
      }
    }
  }

  /** The routes-execution frame [[Serving.runtimeSummary]] aggregates —
    * the batch/warehouse view of the same state.
    */
  def routesDf(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = routes.map(r => org.apache.spark.sql.Row(r.route, r.status)).asJava
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("route", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("status", org.apache.spark.sql.types.StringType))))
  }
}

object RuntimeTracker {
  /** The reference formats all tracker timestamps in Manila local time
    * (`config MNL_TZ`) — deployment config here, not a hardcoded locale.
    */
  val DefaultZone: ZoneId = ZoneId.of("Asia/Manila")
  def iso(i: Instant, zone: ZoneId = DefaultZone): String =
    DateTimeFormatter.ISO_OFFSET_DATE_TIME.format(i.atZone(zone))
}
