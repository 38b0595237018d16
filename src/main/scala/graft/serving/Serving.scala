package graft.serving

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Warehouse

/** The reference's operational serving surface, engine-side: the
  * table-fetch facade (`api/routes/tables.py:12-23` whitelist + limit
  * passthrough, `core/extract/Extractor.py:178-198` fetch-with-error-
  * envelope), the typed response envelope (`api/schemas/response.py:5-23`),
  * and the logs/runtime summary aggregations (`api/logs/routes.py:35-80`,
  * `core/extract/ExtractionLogger.py:72-83`).
  *
  * HTTP itself is out of engine scope (SURVEY §7.1.8 — a route handler
  * calls these and serializes); everything behind the route IS here, and
  * each read stays a lazy DataFrame so a LIMIT reaches the scan
  * (CollectLimit stops after the first partitions — it never materializes
  * the table, which is the difference between "serve a preview" and "scan
  * 100 TB to show 10 rows").
  */
object Serving {

  /** `ResponseStatus` (response.py:5-8). */
  val Success = "success"
  val Error = "error"

  /** `ExtractionResponse` (response.py:18-23): status + stringly count +
    * payload + optional message. `data` stays a DataFrame — the serving
    * edge decides how much to collect.
    */
  final case class Envelope(status: String, count: String,
                            data: Option[DataFrame], message: Option[String])

  /** Typed route-level error (FastAPI HTTPException analog). */
  final case class HttpError(statusCode: Int, detail: String)

  /** The fetchable-table whitelist (`tables.py:18`). */
  val FetchWhitelist: Set[String] =
    Set("tickets", "messages", "agents", "convo_analysis")

  /** `GET /fetch/{table}?limit=` — whitelist gate (404 outside it,
    * `tables.py:18-19`), then fetch-with-envelope: a missing/failed table
    * is an ERROR envelope with the reference's message, not an exception
    * (`Extractor.py:191-198`).
    *
    * The limited page runs EXACTLY ONE job: CollectLimit stops after the
    * first partitions, the collected rows are counted locally, and the
    * envelope carries a LocalRelation over those rows — so the serving
    * edge's own collect/show is free instead of re-running the scan
    * (previously `page.count()` + the caller's collect ran the job twice).
    */
  def fetch(wh: Warehouse, table: String, limit: Int = 10): Either[HttpError, Envelope] =
    if (!FetchWhitelist(table)) Left(HttpError(404, "Table not found!"))
    else if (!wh.exists(table))
      Right(Envelope(Error, "0", None, Some("Table not found!")))
    else {
      val page = wh.read(table).limit(limit)
      val rows = page.collect() // the one job; limit is in this plan
      val local = page.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), page.schema)
      Right(Envelope(Success, rows.length.toString, Some(local), None))
    }

  /** Per-model token totals for one extraction window
    * (`ExtractionLogger.get_total_tokens`, `:72-83`): SUM(tokens) GROUP BY
    * model over `convo_analysis` rows stamped inside [start, end). The
    * reference returns (0, "N/A") for an empty window — kept as a row so
    * the shape is uniform.
    */
  def tokenTotals(convo: DataFrame, start: String, end: String): DataFrame = {
    val windowed = convo
      .where(col("date_extracted") >= lit(start).cast("timestamp_ntz") &&
        col("date_extracted") < lit(end).cast("timestamp_ntz"))
      .groupBy(col("model")).agg(sum(col("tokens")).as("total_tokens"))
    val empty = windowed.sparkSession.sql(
      "SELECT 'N/A' AS model, CAST(0 AS BIGINT) AS total_tokens")
    if (windowed.isEmpty) empty else windowed
  }

  /** Runtime-log summary (`api/logs/routes.py:43-51`): route counts by
    * status over a routes-execution frame with (`route`, `status`) plus a
    * `total_errors` passthrough. One conditional aggregation — the A12
    * pattern, not five scans.
    */
  def runtimeSummary(routes: DataFrame, totalErrors: Long,
                     appEnded: Boolean): DataFrame = {
    def n(status: String) =
      sum(when(col("status") === status, 1L).otherwise(0L)).as(s"${status}_routes")
    routes.agg(
      count(lit(1)).as("total_routes"),
      n("completed"), n("failed"), n("in_progress"), n("not_started"))
      .withColumn("total_errors", lit(totalErrors))
      // "completed" iff the app recorded an end time (routes.py:50)
      .withColumn("app_status", lit(if (appEnded) "completed" else "running"))
  }
}
