package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning: build a Bloom filter over the dimension
  * side's join keys, prune the fact side with a codegen `might_contain`
  * predicate BEFORE any shuffle, then close with the exact join so false
  * positives never reach the result.
  *
  * This is the explicit form of the runtime row-level filtering Spark's
  * optimizer injects for shuffle joins (`InjectRuntimeFilter`), exposed
  * as an operator for the cases the optimizer won't touch: a prune
  * planned across stages or jobs (build once, reuse against many facts),
  * a fact written back pre-pruned, or an anti join (which the optimizer
  * never bloom-filters, yet benefits most — see [[antiJoin]]).
  *
  * Scale shape: the filter costs one aggregation over the DIMENSION only
  * (`expectedItems`-sized bitset, built distributedly, merged on the
  * driver like any sketch) and ships to every task as a plan literal —
  * the fact table is never shuffled to discover that 99% of its rows
  * have no partner. With fpp 3% and a selective dimension, the exact
  * semi/anti join that follows shuffles ~|matches| + 3% noise instead of
  * |fact|. Keys are pre-hashed with xxhash64 on BOTH sides, so the
  * bitset probes longs regardless of key type.
  */
object BloomPrune {

  /** Serialized Bloom filter over `dim[key]`'s xxhash64 values (nulls
    * dropped — an equi-join never matches them). `expectedItems` should
    * be ~|distinct keys|; oversizing wastes plan bytes, undersizing
    * raises the false-positive rate above `fpp` (never correctness).
    */
  def buildBloom(dim: DataFrame, key: String,
                 expectedItems: Long, fpp: Double): Array[Byte] = {
    val hashed = dim.where(col(key).isNotNull)
      .select(xxhash64(col(key)).as("__h"))
    // stat.bloomFilter NPEs on an empty input (null aggregate buffer);
    // an empty dim is legal — semi prunes everything, anti keeps all —
    // so probe emptiness first (a limit-1 job on the small side) and
    // hand back the all-zero filter, whose mightContain is always false
    val bf =
      if (hashed.isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
      else hashed.stat.bloomFilter("__h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The codegen probe predicate: true when `value`'s xxhash64 might be
    * in the serialized filter. Same Catalyst expression Spark's runtime
    * filters use — stays inside whole-stage codegen.
    */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      Bridge.expression(xxhash64(value))))

  /** Fact rows that MIGHT have a dim partner: null keys and bloom-misses
    * dropped (both are definite non-matches for an equi join). Contains
    * false positives at ~fpp — close with the exact join.
    */
  def prefilter(fact: DataFrame, dim: DataFrame,
                factKey: String, dimKey: String,
                expectedItems: Long = 1L << 20, fpp: Double = 0.03): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, fpp)
    fact.where(col(factKey).isNotNull && mightContain(bloom, col(factKey)))
  }

  /** Exact semi join with the bloom prune in front: ≡ `fact ⋉ dim`, but
    * the semi-join shuffle sees only bloom survivors.
    */
  def semiJoin(fact: DataFrame, dim: DataFrame,
               factKey: String, dimKey: String,
               expectedItems: Long = 1L << 20, fpp: Double = 0.03): DataFrame = {
    val pruned = prefilter(fact, dim, factKey, dimKey, expectedItems, fpp)
    pruned.join(dim, pruned(factKey) === dim(dimKey), "left_semi")
  }

  /** Exact anti join, bloom-accelerated: a bloom MISS is a *proof* of
    * non-membership, so miss rows skip the join entirely; only the ~fpp
    * sliver of bloom hits goes through the exact anti join. Two branches
    * over one fact scan each — at scale that trades a second columnar
    * scan (cheap, pruned) for shuffling |fact| into the anti join
    * (expensive): the shuffle input drops from |fact| to
    * |true matches| + fpp·|fact|.
    */
  def antiJoin(fact: DataFrame, dim: DataFrame,
               factKey: String, dimKey: String,
               expectedItems: Long = 1L << 20, fpp: Double = 0.03): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, fpp)
    val definiteMiss = fact.where(
      col(factKey).isNull || !mightContain(bloom, col(factKey)))
    val maybeHit = fact.where(
      col(factKey).isNotNull && mightContain(bloom, col(factKey)))
    val checked = maybeHit.join(dim, maybeHit(factKey) === dim(dimKey), "left_anti")
    definiteMiss.unionByName(checked)
  }
}
