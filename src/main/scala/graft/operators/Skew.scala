package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities — the explicit answers for hot keys at scale
  * (SURVEY.md "100 TB-minded partitioning"; AQE's skew-join handles sort
  * -merge cases, these handle the shapes AQE doesn't).
  */
object Skew {

  /** Two-phase (salted) aggregation: partial aggregate on (key, salt) —
    * spreading a hot key over `saltFactor` reducers — then final aggregate
    * on key. Caller supplies the partial aggs and the matching final
    * (re-)aggs over the partial columns; associative aggs only
    * (sum/count/min/max).
    *
    * {{{
    * Skew.saltedAggregate(events, Seq("event_type"), 16)(
    *   partial = Seq(count(lit(1)).as("n")),
    *   fin     = Seq(sum("n").as("n")))
    * }}}
    */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltFactor: Int)(
      partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    // deterministic spread: hash of the whole row modulo saltFactor —
    // not rand(), so retries/resubmits see the same salt
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(saltFactor)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(fin.head, fin.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a deterministic
    * salt in [0, saltFactor); the (smaller, but not broadcastable) right
    * side is replicated saltFactor times; the join key becomes (key, salt),
    * so one hot key spreads over saltFactor reducers.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(replicatedRight,
        Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
