package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** F6's forgiving time parse as one compiled pass: returns the
  * seconds-past-midnight for a schedule time string, with the reference's
  * exact rules (extraction_helpers.py:182-196): strip ASCII spaces ONLY
  * (case preserved, periods kept), require a literal uppercase `AM`/`PM`
  * suffix, then accept `h[h][:m[m]]AM|PM` with hour 1–12 and minute 0–59
  * (strptime `%I`/`%M` accept 1–2 digits); anything unparseable → 0 =
  * midnight, matching the reference's fallback Timestamp at date midnight.
  * The composed when/regexp_extract chain evaluated the same regex up to
  * ~8× per row through the CASE tree; this is one scan.
  * Semantics are locked by the FunctionsSpec format table and the
  * f6_schedule_combine oracle (which replicates the RULES, not the
  * implementation).
  */
case class ParseScheduleTime(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_schedule_time expects string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any = {
    val raw = v.asInstanceOf[UTF8String].toString
    // cleaned = strip ASCII spaces only, case preserved (the reference does
    // time_str.replace(' ', '') and nothing else)
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c != ' ') sb.append(c)
      i += 1
    }
    val s = sb.toString
    // ^(\d{1,2})(?::(\d{1,2}))?(AM|PM)$  (uppercase suffix required: the
    // reference gates on a literal 'AM'/'PM' substring before parsing)
    val n = s.length
    if (n < 3) return 0
    val ap = s.substring(n - 2)
    if (ap != "AM" && ap != "PM") return 0
    val body = s.substring(0, n - 2)
    var hh = 0; var mm = 0
    val colon = body.indexOf(':')
    def digits(str: String, lo: Int, hi: Int): Boolean = {
      if (hi <= lo) return false
      var j = lo
      while (j < hi) { if (!Character.isDigit(str.charAt(j))) return false; j += 1 }
      true
    }
    if (colon >= 0) {
      val mmLen = body.length - colon - 1
      if (!digits(body, 0, colon) || colon > 2 ||
          mmLen < 1 || mmLen > 2 || !digits(body, colon + 1, body.length)) return 0
      hh = body.substring(0, colon).toInt
      mm = body.substring(colon + 1).toInt
    } else {
      if (!digits(body, 0, body.length) || body.length > 2) return 0
      hh = body.toInt
    }
    if (hh < 1 || hh > 12 || mm > 59) return 0
    val hour24 = if (ap == "PM" && hh < 12) hh + 12
                 else if (ap == "AM" && hh == 12) 0
                 else hh
    hour24 * 3600 + mm * 60
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ParseScheduleTime {
  def apply(c: Column): Column =
    Bridge.column(ParseScheduleTime(Bridge.expression(c)))
}
