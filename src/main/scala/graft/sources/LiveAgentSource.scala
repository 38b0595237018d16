package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1–S9 — the paginated REST source re-expressed as a connector
  * (SURVEY.md §2.1). The reference drives LiveAgent API v3 with a page
  * loop, a Semaphore(15) + 0.4 s throttle, and a success/error envelope
  * (`core/LiveAgentClient.py:36-185`); here the HTTP client is behind
  * `LiveAgentApi` so tests inject JSON fixtures, and the engine side turns
  * pages into a DataFrame via spark.read.json.
  *
  * Scale note: ingest parallelism is bounded by the API (150 req/min), not
  * the cluster — fetching stays driver-side by design; the moment data
  * lands in a DataFrame everything downstream is distributed. A DataSource
  * V2 TableProvider with page-range input partitions is the documented
  * extension point if a bulk export endpoint ever allows parallel reads.
  */
trait LiveAgentApi extends Serializable {
  /** One page of raw JSON objects (the unwrapped `data` envelope), or
    * Left(error). Empty page ⇒ pagination stops (reference behavior).
    */
  def fetchPage(endpoint: String, page: Int, perPage: Int,
                filters: Map[String, String]): Either[ApiError, Seq[String]]
}

final case class ApiError(status: Int, message: String)

/** Token-bucket rate limiter mirroring the reference's envelope:
  * `maxConcurrent` in flight, at most one launch per `delayMillis`
  * (Semaphore(15) + 0.4 s ⇒ ~150 req/min, under the API's 180/min cap).
  */
final class RateLimiter(maxConcurrent: Int, delayMillis: Long) {
  private val sem = new java.util.concurrent.Semaphore(maxConcurrent)
  private var lastLaunch = 0L
  def acquire(): Unit = {
    sem.acquire()
    val wait = this.synchronized {
      val now = System.nanoTime() / 1000000
      val w = (lastLaunch + delayMillis) - now
      lastLaunch = math.max(now, lastLaunch + delayMillis)
      w
    }
    if (wait > 0) Thread.sleep(wait)
  }
  def release(): Unit = sem.release()
}

/** JSON-fixture API for tests: endpoint → pages of JSON rows. */
final class FixtureApi(pages: Map[String, Seq[Seq[String]]]) extends LiveAgentApi {
  override def fetchPage(endpoint: String, page: Int, perPage: Int,
                         filters: Map[String, String]): Either[ApiError, Seq[String]] =
    pages.get(endpoint) match {
      case None     => Left(ApiError(404, s"no such endpoint: $endpoint"))
      case Some(ps) => Right(if (page <= ps.size) ps(page - 1) else Seq.empty)
    }
}

object LiveAgentSource {

  val PageSize = 100 // constants.py:15 MAX_VALUE
  val MaxPages = 100

  /** `set_filter` analog (utils/tickets_util.py:5-15): the reference
    * serializes the window predicate into the API's `_filters` JSON —
    * predicate pushdown into the source, done in the connector (Catalyst
    * can't see across the HTTP boundary).
    */
  def windowFilters(field: String, start: String, end: String): Map[String, String] =
    Map("_filters" -> s"""[["$field","D>","$start"],["$field","D<=","$end"]]""")

  /** S1 — generic page loop: fetch pages until empty/error/maxPages, then
    * one spark.read.json over the accumulated rows.
    */
  def paginate(spark: SparkSession, api: LiveAgentApi, endpoint: String,
               filters: Map[String, String] = Map.empty,
               limiter: Option[RateLimiter] = None,
               maxPages: Int = MaxPages): DataFrame = {
    val rows = Iterator.from(1).map { page =>
      limiter.foreach(_.acquire())
      try api.fetchPage(endpoint, page, PageSize, filters)
      finally limiter.foreach(_.release())
    }.takeWhile {
      case Right(items) => items.nonEmpty
      case Left(_)      => false
    }.take(maxPages).collect { case Right(items) => items }.flatten.toSeq
    import spark.implicits._
    if (rows.isEmpty) spark.emptyDataFrame
    else spark.read.json(rows.toDS())
  }

  /** S4 — tickets scan post-processing: default missing columns, tags
    * array → CSV (F5). Reference `core/Ticket.py:57-71`.
    */
  def processTickets(raw: DataFrame): DataFrame = {
    val withTags =
      if (raw.columns.contains("tags"))
        raw.withColumn("tags", graft.functions.TextFns.tagsCsv(col("tags")))
      else raw.withColumn("tags", lit(""))
    Seq("owner_name", "agentid").foldLeft(withTags) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast("string"))
    }
  }

  /** S6 — flatten nested message groups: each group row × its inner
    * `messages[]` (explode_outer keeps groups with no messages,
    * reference `core/Ticket.py:149-183`).
    */
  def flattenMessageGroups(groups: DataFrame,
                           inner: String = "messages"): DataFrame = {
    val exploded = groups.withColumn("__m", explode_outer(col(inner))).drop(inner)
    val innerFields = exploded.schema("__m").dataType match {
      case st: org.apache.spark.sql.types.StructType => st.fieldNames.toSeq
      case _ => Seq.empty
    }
    innerFields.foldLeft(exploded) { (df, f) =>
      df.withColumn(s"message_$f", col(s"__m.$f"))
    }.drop("__m")
  }
}
