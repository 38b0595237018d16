package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ-style contract check a
  * training pipeline runs before every ingest): a rule set compiles to the
  * smallest number of passes the rule classes allow —
  *
  *  - ROW-LOCAL rules (not-null, in-set, in-range, regex) all fold into
  *    ONE map-side-combinable aggregate over a single scan, regardless of
  *    rule count: per-rule violation counts are `sum(when(...))` columns
  *    of the same agg, and the result is one row exploded into a
  *    (rule, violations) report. 100 TB cost = one pass, no shuffle
  *    beyond the final 1-row combine.
  *  - UNIQUENESS is one exact distinct aggregate (n − countDistinct) —
  *    the one rule class that inherently needs a key shuffle.
  *  - REFERENTIAL integrity is a broadcast anti-join count against the
  *    (dimension-sized) referenced key set — the fact side streams.
  *
  * Violation semantics: value rules IGNORE nulls (a null fails only its
  * `notNull` rule) — so each rule counts exactly one defect class and the
  * report is additive.
  */
object Validate {

  final case class Rule(name: String, violation: Column)

  def notNull(c: String): Rule = Rule(s"not_null($c)", col(c).isNull)

  def inSet(c: String, values: Seq[Any]): Rule =
    Rule(s"in_set($c)", col(c).isNotNull && !col(c).isin(values: _*))

  def inRange(c: String, lo: Any, hi: Any): Rule =
    Rule(s"in_range($c)", col(c).isNotNull && !col(c).between(lo, hi))

  def matches(c: String, regex: String): Rule =
    Rule(s"matches($c)", col(c).isNotNull && !col(c).rlike(regex))

  /** All row-local rules in one aggregate pass → (rule, violations,
    * n_rows) report rows.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case (r, i) => sum(when(r.violation, 1L).otherwise(0L)).as(s"__v$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col(s"__v$i").as("violations"),
          col("__n").as("n_rows"))
      }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.violations").as("violations"),
        col("r.n_rows").as("n_rows"))
  }

  /** Uniqueness report row: violations = rows beyond the first per key
    * (n − distinct keys). NULL key components count via the null-safe
    * struct equality of countDistinct's underlying grouping.
    */
  def checkUnique(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val key = struct(keyCols.map(col): _*)
    df.agg(count(lit(1)).as("__n"), countDistinct(key).as("__d"))
      .select(lit(s"unique(${keyCols.mkString(",")})").as("rule"),
        (col("__n") - col("__d")).as("violations"), col("__n").as("n_rows"))
  }

  /** Referential-integrity report row: fact rows whose non-null `factKey`
    * has no match in `dim.dimKey`. The dimension key set is broadcast —
    * the fact table is never shuffled.
    */
  def checkReferential(fact: DataFrame, factKey: String,
                       dim: DataFrame, dimKey: String): DataFrame = {
    val n = fact.agg(count(lit(1)).as("__n"))
    val orphans = fact.where(col(factKey).isNotNull)
      .join(broadcast(dim.select(col(dimKey)).distinct()),
        col(factKey) === col(dimKey), "left_anti")
      .agg(count(lit(1)).as("__v"))
    n.crossJoin(orphans).select(
      lit(s"referential($factKey->$dimKey)").as("rule"),
      col("__v").as("violations"), col("__n").as("n_rows"))
  }
}
