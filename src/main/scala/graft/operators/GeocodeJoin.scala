package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{SimFns, TextFns}

/** The reference's two-phase similarity geocode join (SURVEY.md §2.3
  * J5–J8; `core/Geocode.py:45-157`, `utils/geocode_utils.py:16-32`).
  *
  * Phase 1 prunes: inputs × municipality/province rows (small, broadcast)
  * scored by n-gram Jaccard, keep score ≠ 0. Phase 2 scores only the
  * barangay rows whose codes matched phase 1 (semi-join), then takes the
  * per-input top-1 with threshold 0.1. The two-phase plan IS the
  * reference's key optimization — kept explicitly; both joins broadcast the
  * reference table, so the input side never shuffles.
  */
object GeocodeJoin {

  /** Phase-1 candidates: every input × refTable row with nonzero n-gram
    * Jaccard between `addrCol` and refTable's `refNameCol` (both cleaned).
    */
  def phase1Candidates(inputs: DataFrame, refTable: DataFrame,
                       addrCol: String, refNameCol: String): DataFrame = {
    // per-pair scoring work: spread the probe side so a small input file
    // doesn't serialize the whole cross join into one task
    val cleanedIn  = inputs.repartition(inputs.columns.map(col): _*)
      .withColumn("__addr", TextFns.cleanStr(col(addrCol)))
    val cleanedRef = broadcast(refTable.withColumn("__ref", TextFns.cleanStr(col(refNameCol))))
    cleanedIn.crossJoin(cleanedRef)
      .withColumn("score", SimFns.jaccardNgram(col("__addr"), col("__ref")))
      .where(col("score") =!= 0)
      .drop("__addr", "__ref")
  }

  /** Phase-1 candidates, SCALE PATH (SURVEY §7.3): the broadcast NL form
    * above is right for the reference's 70-row PSGC table; when the
    * reference table is itself large (a country-scale gazetteer), the
    * nonzero-Jaccard pair set is generated through a shingle inverted
    * index instead — EXACTLY the same pairs, never a cartesian:
    *
    *   nonzero n-gram Jaccard ⟺ the two strings share ≥ 1 n-gram
    *   (at the INPUT side's dynamic n, `SimFns.refNgramSize`),
    *
    * so candidates = equi-join of the two exploded gram sets on (n, gram).
    * The reference side is gram-indexed once per DISTINCT n in the input
    * batch (n is ⌈√(len/2)⌉-bounded — a handful of values, broadcast), the
    * gram join is a plain distributed hash join, and each candidate pair
    * is then scored with the same exact Jaccard and filtered the same way.
    * Shuffle volume is O(grams + candidates), not |inputs| × |ref|.
    *
    * Requires unique `inputKey` / `refKey` per row (the rejoin would
    * multiply duplicates).
    */
  def phase1CandidatesBlocked(inputs: DataFrame, refTable: DataFrame,
                              addrCol: String, refNameCol: String,
                              inputKey: String, refKey: String): DataFrame = {
    val cleanedIn = inputs
      .withColumn("__addr", TextFns.cleanStr(col(addrCol)))
      .withColumn("__n", SimFns.refNgramSize(col("__addr")))
    val inGrams = cleanedIn.select(col(inputKey).as("__ik"), col("__n"),
      explode(SimFns.charNgrams(col("__addr"), col("__n"))).as("__g"))
    // the distinct dynamic-n values in this batch: tiny by construction
    val ns = cleanedIn.select(col("__n")).distinct()
    val refGrams = refTable
      .withColumn("__ref", TextFns.cleanStr(col(refNameCol)))
      .crossJoin(broadcast(ns)) // bounded replicate: |distinct n| copies
      .select(col(refKey).as("__rk"), col("__n"),
        explode(SimFns.charNgrams(col("__ref"), col("__n"))).as("__g"))
    val pairs = inGrams.join(refGrams, Seq("__n", "__g"))
      .select(col("__ik"), col("__rk")).distinct()
    val left = inputs.withColumn("__addr", TextFns.cleanStr(col(addrCol)))
    val right = refTable.withColumn("__ref", TextFns.cleanStr(col(refNameCol)))
    left.join(pairs, col(inputKey) === col("__ik"))
      .join(right, col(refKey) === col("__rk"))
      .withColumn("score", SimFns.jaccardNgram(col("__addr"), col("__ref")))
      .where(col("score") =!= 0)
      .drop("__addr", "__ref", "__ik", "__rk")
  }

  /** Phase 2 + top-1: keep the best nonzero-scored reference row per input,
    * accepted when score ≥ threshold.
    *
    * Physical plan: the custom TopKPerProbe operator (one pass, bounded
    * top-1 buffer per probe, reference broadcast) instead of
    * cross-join → Window row_number — no candidate materialization, no
    * exchange. Semantics identical to the window form (score desc, ref
    * name asc tie-break, zero scores dropped); `bestMatchViaWindow` keeps
    * the composed formulation for equivalence tests.
    */
  def bestMatch(inputs: DataFrame, refTable: DataFrame, addrCol: String,
                refNameCol: String, inputKey: String,
                threshold: Double = 0.1): DataFrame = {
    val cleanedIn = inputs.repartition(inputs.columns.map(col): _*)
      .withColumn("__addr", TextFns.cleanStr(col(addrCol)))
    val cleanedRef = refTable.withColumn("__ref", TextFns.cleanStr(col(refNameCol)))
    graft.plans.TopKPerProbe.join(cleanedIn, cleanedRef,
        SimFns.jaccardNgram(col("__addr"), col("__ref")), col(refNameCol),
        k = 1, minScoreExclusive = 0.0)
      .drop("__addr", "__ref")
      .withColumn("accepted", col("score") >= threshold)
  }

  /** [[bestMatch]], LARGE-GAZETTEER SCALE PATH: the same per-input best
    * nonzero match without EVER broadcasting or replicating the reference
    * table — candidates come from [[phase1CandidatesBlocked]]'s gram
    * inverted index (the only broadcast is the tiny distinct-n set), and
    * the top-1 is ONE bounded `min(struct(-score, name))` aggregation:
    * map-side combinable, one partial (score, name) pair per (partition,
    * input) in the shuffle — never a window sort over all candidates.
    * Struct ordering gives exactly bestMatch's (score DESC, name ASC)
    * tie-break; double negation is exact, so scores are bit-identical.
    *
    * Shuffle volume is O(grams + candidates + |matched inputs|); use this
    * when the gazetteer is country-scale (millions of rows) and
    * [[bestMatch]]'s broadcast would not fit — results are identical
    * (spec-proven on the PSGC-shaped fixture). Requires unique
    * `inputKey` / `refKey` per row, like the blocked phase 1.
    */
  def bestMatchBlocked(inputs: DataFrame, refTable: DataFrame, addrCol: String,
                       refNameCol: String, inputKey: String, refKey: String,
                       threshold: Double = 0.1): DataFrame = {
    val cands = phase1CandidatesBlocked(inputs, refTable, addrCol, refNameCol,
      inputKey, refKey)
    val top = cands
      .groupBy(col(inputKey))
      .agg(min(struct(negate(col("score")).as("ns"),
        col(refNameCol).as("n"))).as("__b"))
      .select(col(inputKey), col("__b.n").as(refNameCol),
        negate(col("__b.ns")).as("score"))
    inputs.join(top, Seq(inputKey))
      .withColumn("accepted", col("score") >= threshold)
  }

  /** The composed (cross join + window) formulation of bestMatch. */
  def bestMatchViaWindow(inputs: DataFrame, refTable: DataFrame, addrCol: String,
                         refNameCol: String, inputKey: String,
                         threshold: Double = 0.1): DataFrame = {
    val cands = phase1Candidates(inputs, refTable, addrCol, refNameCol)
    val w = Window.partitionBy(col(inputKey))
      .orderBy(col("score").desc, col(refNameCol).asc)
    cands.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .withColumn("accepted", col("score") >= threshold)
  }

  /** J5→J6→J7 — the full two-phase plan (`core/Geocode.py:53-89`), the
    * reference's key algorithmic optimization kept explicit:
    * phase 1 scores inputs against the SMALL coarse table
    * (municipality/province level); a semi-join then narrows the LARGE
    * fine-grained table (barangay level) to rows whose `fineParentCol`
    * matched; phase 2 scores only those and takes the per-input top-1.
    * At scale this is the difference between inputs × |barangays| and
    * inputs × |matched subset| — the coarse table broadcasts both times.
    */
  def twoPhase(inputs: DataFrame, coarseRef: DataFrame, fineRef: DataFrame,
               addrCol: String, coarseNameCol: String, coarseCodeCol: String,
               fineNameCol: String, fineParentCol: String, inputKey: String,
               threshold: Double = 0.1): DataFrame = {
    val p1 = phase1Candidates(inputs, coarseRef, addrCol, coarseNameCol)
    val matchedCodes = p1.select(col(coarseCodeCol)).distinct()
    val narrowed = fineRef.join(broadcast(matchedCodes),
      fineRef(fineParentCol) === matchedCodes(coarseCodeCol), "left_semi")
    bestMatch(inputs, narrowed, addrCol, fineNameCol, inputKey, threshold)
  }

  /** J8 — fuzzy serviceability tag: best Levenshtein-ratio match of the
    * normalized location against the serviceable list; "Yes" iff best
    * ratio ≥ 90 (reference threshold).
    *
    * The list is tiny by construction (69 municipalities), so it is
    * collected once and compiled into a single-pass MaxLevRatio projection:
    * a narrow map stage with no ×N row expansion and no groupBy re-shuffle
    * — the shape that stays cheap at 100 TB of inputs. Per-pair math is
    * bit-identical to the crossJoin + max formulation (spec-proven).
    */
  def tagViable(inputs: DataFrame, serviceable: DataFrame, locCol: String,
                svcNameCol: String, threshold: Double = 90.0): DataFrame = {
    val names = serviceable
      .select(TextFns.normalizeLocation(col(svcNameCol)).as("n"))
      .collect().map(_.getString(0)).toSeq
    inputs.withColumn("is_serviceable",
      when(graft.expressions.MaxLevRatio(
          TextFns.normalizeLocation(col(locCol)), names) >= threshold, lit("Yes"))
        .otherwise(lit("No")))
  }
}
