package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A6 — per-group sorted string aggregation (conversation reassembly).
  *
  * Reference: `core/extract/ConvoDataExtract.py:189-203` — messages of one
  * ticket ordered by `datecreated`, each rendered as
  * "sender: {sender}\nmessage: {message}", joined with "\n\n".
  *
  * Spark-first: collect_list(struct(orderKeys…, rendered)) → array_sort →
  * transform → array_join. One shuffle on the group key with map-side
  * partial aggregation; no window, no per-group driver loop. At 100 TB the
  * only care is group width (a pathological ticket with millions of
  * messages) — bounded upstream by the extraction window.
  */
object Convo {

  /** Generic sorted string agg: group by `groupCol`, order rows by
    * `orderCols` (must be struct-sortable; make them unique and non-null
    * for full determinism), render each row with `rendered`, join with
    * `sep`. The sort+extract+join tail runs as one compiled pass
    * (SortJoinLastField) instead of three interpreted HOF evaluations.
    */
  def sortedStringAgg(df: DataFrame, groupCol: String, orderCols: Seq[Column],
                      rendered: Column, sep: String,
                      outCol: String = "convo"): DataFrame = {
    val packed = struct(orderCols :+ rendered.as("__r"): _*)
    df.groupBy(col(groupCol))
      .agg(graft.expressions.SortJoinLastField(collect_list(packed), lit(sep))
        .as(outCol))
  }

  /** Built-ins-only formulation, kept as the spec reference. */
  def sortedStringAggHof(df: DataFrame, groupCol: String, orderCols: Seq[Column],
                         rendered: Column, sep: String,
                         outCol: String = "convo"): DataFrame = {
    val packed = struct(orderCols :+ rendered.as("__r"): _*)
    df.groupBy(col(groupCol))
      .agg(array_join(transform(array_sort(collect_list(packed)),
        s => s.getField("__r")), sep).as(outCol))
  }

  /** The reference's exact rendering over a messages-shaped frame. */
  def conversationText(messages: DataFrame, ticketId: String = "ticket_id",
                       sender: String = "sender_type", message: String = "message",
                       orderBy: String = "datecreated"): DataFrame =
    sortedStringAgg(messages, ticketId, Seq(col(orderBy)),
      concat(lit("sender: "), col(sender), lit("\nmessage: "), col(message)),
      "\n\n")
}
