package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity primitives (SURVEY.md §2.6 F9/F10 and the §2.3 similarity
  * joins) as pure built-in column expressions. Keeping these as Catalyst
  * expression trees (higher-order functions over arrays) rather than UDFs
  * means they serialize into any plan, need no closure shipping, and the
  * surrounding filters/projections stay optimizable.
  */
object SimFns {

  /** Distinct character n-grams of a string; n may be a per-row column.
    * Empty/short input → empty array (never null for non-null input).
    * Compiled loop (graft.expressions.CharNgrams); `charNgramsHof` is the
    * built-ins-only reference formulation, asserted equal in tests.
    */
  def charNgrams(s: Column, n: Column): Column =
    graft.expressions.CharNgrams(s, n.cast("int"))

  def charNgramsHof(s: Column, n: Column): Column = {
    val cnt = length(s) - n + lit(1)
    when(s.isNull, lit(null).cast("array<string>"))
      .when(cnt <= 0, array().cast("array<string>"))
      .otherwise(array_distinct(transform(sequence(lit(1), cnt), i => s.substr(i, n))))
  }

  /** Distinct word w-shingles (space-joined runs of w consecutive tokens).
    * Compiled single pass (graft.expressions.WordShingles); the HOF
    * reference formulation is kept for equivalence tests.
    */
  def wordShingles(tokens: Column, w: Int): Column =
    graft.expressions.WordShingles(tokens, lit(w))

  def wordShinglesHof(tokens: Column, w: Int): Column = {
    val cnt = size(tokens) - w + 1
    when(tokens.isNull, lit(null).cast("array<string>"))
      .when(cnt <= 0, array().cast("array<string>"))
      .otherwise(array_distinct(transform(sequence(lit(1), cnt),
        i => array_join(slice(tokens, i, lit(w)), " "))))
  }

  /** Jaccard similarity of two pre-computed DISTINCT-element arrays
    * (precondition: no duplicates — charNgrams/wordShingles guarantee it).
    * Exact rational |A∩B|/|A∪B| as double; both empty → 0.0. Numerator via
    * the compiled IntersectCount; |A∪B| = |A|+|B|−|A∩B| (distinctness).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = graft.expressions.IntersectCount(a, b)
    val union = size(a) + size(b) - inter
    when(union === 0, lit(0.0)).otherwise(inter.cast("double") / union.cast("double"))
  }

  /** F9 — the reference's per-address n-gram size rule:
    * n = max(5, round(sqrt(len/2))). Reference: `core/Geocode.py:53`.
    */
  def refNgramSize(s: Column): Column =
    greatest(lit(5), round(sqrt(length(s).cast("double") / 2.0), 0).cast("int"))

  /** F9 — n-gram Jaccard with the reference's dynamic n (both sides
    * shingled at the n derived from the left string, as the reference does
    * per input address).
    */
  def jaccardNgram(a: Column, b: Column): Column = {
    val n = refNgramSize(a)
    jaccard(charNgrams(a, n), charNgrams(b, n))
  }

  /** F10 — Levenshtein-based similarity ratio in [0,100]; the built-in-only
    * approximation of fuzzywuzzy's ratio (SURVEY.md §2.6 F10).
    * Both empty → 100 (identical).
    */
  def levRatio(a: Column, b: Column): Column = {
    val maxLen = greatest(length(a), length(b))
    when(maxLen === 0, lit(100.0))
      .otherwise((lit(1.0) - levenshtein(a, b).cast("double") / maxLen.cast("double")) * 100.0)
  }
}
