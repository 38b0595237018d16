package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sketch primitives (HyperLogLog,
  * Count-Min). Everything here is exact-reproducible in ANSI SQL: hashes
  * are md5 prefixes (not engine-native hash functions), the HLL harmonic
  * sum is integer-scaled by 2^52 so no float-addition-order can differ,
  * and rank-of-leading-bit is a branch chain rather than log2 (libm
  * rounding is not portable across engines).
  *
  * Scale notes: both sketches are classic map-side-combinable aggregations
  * — the HLL register table is `groupBy(bucket).max(rho)` (512 rows after
  * partial agg, one tiny shuffle) and the CMS matrix is
  * `groupBy(row, cell).count` (d×w cells). At 100 TB the shuffle carries
  * only the register/cell partials, never the raw rows.
  */
object SketchFns {

  /** 2^52 as a long and double — the HLL fixed-point scale. */
  val HllScale: Long = 1L << 52

  val HllP: Int = 9                 // 512 buckets
  val HllM: Int = 1 << HllP
  val HllRemBits: Int = 60 - HllP   // 51-bit remainder window

  /** 60-bit hash: first 15 hex chars of md5 (portable; DuckDB mirror is
    * CAST(concat('0x', substr(md5(v),1,15)) AS BIGINT)).
    */
  def hash60(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")

  /** 52-bit hash (first 13 md5 hex chars): every value is exactly
    * representable as a DOUBLE, so a (score, id) bounded aggregate can
    * carry it without rounding collisions — the KMV sketch needs that.
    */
  def hash52(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 13), 16, 10).cast("long")

  /** 32-bit hash (first 8 md5 hex chars): small enough that
    * `hash32 · count` stays inside int64 for counts up to ~2^31 — the
    * exact-integer Bernoulli test (`hash32·n < rate_num·2^32`) the
    * mixture sampler uses instead of a float threshold.
    */
  def hash32(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 8), 16, 10).cast("long")

  def hllBucket(h: Column): Column = shiftright(h, HllRemBits)

  def hllRem(h: Column): Column = h.bitwiseAND(lit((1L << HllRemBits) - 1))

  /** Position of the leading 1-bit in the remainder window, 1-based;
    * remBits+1 when the remainder is 0. Branch chain == the generated SQL
    * CASE chain in [[graft.queries.Sql.hllRho]].
    */
  def hllRho(rem: Column): Column =
    (0 until HllRemBits).foldLeft(lit(null).cast("int")) { (acc, i) =>
      if (i == 0) when(rem >= lit(1L << (HllRemBits - 1)), lit(1))
      else acc.when(rem >= lit(1L << (HllRemBits - 1 - i)), lit(i + 1))
    }.otherwise(lit(HllRemBits + 1))

  /** Raw HLL estimate from (sumScaled, bucketsPresent): missing buckets
    * contribute 2^0 = 1, i.e. HllScale in fixed point. The constant factor
    * is written as the identical double expression on both engines.
    */
  def hllEstimate(sumScaledPresent: Column, bucketsPresent: Column): Column = {
    val m = HllM.toDouble
    val sumScaled =
      sumScaledPresent + (lit(HllM.toLong) - bucketsPresent) * lit(HllScale)
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m)) * lit(m) * lit(m) *
      lit(HllScale.toDouble) / sumScaled.cast("double")
  }

  /** Count-Min cell for hash row `j`: first 8 md5 hex chars of "j:v",
    * mod width (mirrors [[graft.queries.Sql.cmsCell]]).
    */
  def cmsCell(j: Column, v: Column, width: Int): Column =
    conv(substring(md5(concat(j.cast("string"), lit(":"), v.cast("string"))), 1, 8),
      16, 10).cast("long") % width
}
