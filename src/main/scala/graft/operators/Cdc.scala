package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC ops-log compaction: reduce an (insert/update/delete) change stream
  * to the final table state — latest op per key wins, a winning delete
  * removes the key.
  *
  * Implemented as a hash AGGREGATION (`max(struct(seq, ...))`), not a
  * window: partial aggregation collapses each key map-side before the
  * shuffle, so the exchange carries one row per (partition, key) instead
  * of the whole log — the difference between compacting a 100 TB CDC
  * feed and sorting it. Requires `seqCol` unique per key (a log offset /
  * LSN); the struct comparison is then decided entirely by its leading
  * field.
  */
object Cdc {

  def applyLatest(ops: DataFrame, keyCol: String, seqCol: String,
                  opCol: String, valueCols: Seq[String],
                  deleteOp: String = "D"): DataFrame = {
    require(!ops.columns.contains("__last"),
      "__last is a reserved working column name")
    val fields = Seq(seqCol, opCol) ++ valueCols
    ops.groupBy(col(keyCol))
      .agg(max(struct(fields.map(col): _*)).as("__last"))
      .select(col(keyCol) +: fields.map(f => col(s"__last.$f").as(f)): _*)
      // null-safe: a winning row with a NULL op is NOT a delete and must
      // survive (`=!=` would three-value it out of the result)
      .where(!(col(opCol) <=> lit(deleteOp)))
  }
}
