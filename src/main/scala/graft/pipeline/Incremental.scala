package graft.pipeline

import java.sql.Timestamp
import java.time.LocalDate

/** The reference's two extraction cadences as pure window arithmetic
  * (reference `api/routes/helpers/tickets_route_helpers.py:6-16` +
  * `utils/tickets_util.py:6-8` + `utils/date_utils.py:14-21`):
  *
  * - incremental (`is_initial=false`): one 6-hour lookback window floored
  *   to the hour, filtering on date_changed — `TimeFns.windowStart/End`.
  * - backfill (`is_initial=true`): calendar-month windows starting at
  *   2025-01-01 (or a caller date), filtering on date_created, processed
  *   in ascending order — this object.
  *
  * At 100 TB the month list is a driver-side plan (a few dozen tuples),
  * each month a separate bounded job — never one unbounded scan.
  */
object Incremental {

  val BackfillEpoch: LocalDate = LocalDate.of(2025, 1, 1)

  /** Calendar-month windows [month-start 00:00:00, month-end 23:59:59],
    * ascending, covering `from`'s month through `until`'s month.
    */
  def backfillMonths(from: LocalDate = BackfillEpoch,
                     until: LocalDate): Seq[(Timestamp, Timestamp)] = {
    require(!until.isBefore(from), s"until $until precedes from $from")
    Iterator.iterate(from.withDayOfMonth(1))(_.plusMonths(1))
      .takeWhile(!_.isAfter(until))
      .map { m =>
        val end = m.plusMonths(1).atStartOfDay().minusSeconds(1)
        (Timestamp.valueOf(m.atStartOfDay()), Timestamp.valueOf(end))
      }.toSeq
  }
}
