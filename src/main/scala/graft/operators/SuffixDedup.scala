package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Suffix-ranking substring deduplication — the scale upgrade of the
  * fixed-L gram-key approach (`dedup_substring_exact`): find all MAXIMAL
  * duplicate token spans of length ≥ L across the corpus, the
  * training-data-dedup standard of Lee et al. 2021 ("Deduplicating
  * Training Data Makes Language Models Better", arXiv:2107.06499), which
  * builds a suffix array over the corpus and removes every repeated
  * substring over a length threshold.
  *
  * Spark-first shape — prefix doubling over equi-joins, never all-pairs
  * and never materialized L-grams:
  *
  *  - Round 0 assigns each distinct TOKEN a dense integer label.
  *  - Doubling round j: label_{2w}(p) = dense id of the pair
  *    (label_w(p), label_w(p+w)) — one self EQUI-join on (doc, pos+w)
  *    plus one distinct+sort to densify, per round; ⌈log₂ L⌉ rounds
  *    total. Each row is a fixed handful of longs, so the working set is
  *    O(N·log L) small rows — the gram-key approach pays O(N·L) tokens of
  *    materialized gram strings (a 50× blowup at Lee et al.'s L = 50).
  *  - Two positions share an L-token window iff their overlapping
  *    power-of-two window labels agree: with a = the largest power of two
  *    < L (so a ≥ L/2), key_L(p) = (label_a(p), label_a(p+L−a)) — the
  *    sparse-table trick; label equality is EXACT (dense ids, no hashing,
  *    zero false positives/negatives).
  *  - A position is COVERED iff its key occurs ≥ 2 times corpus-wide
  *    (cross-doc or within-doc). Maximal spans = per-doc runs of covered
  *    positions merged while consecutive windows overlap or touch
  *    (gap ≤ L) — a bounded per-doc gaps-and-islands window.
  *
  * Dense labels are assigned by total-sorting the distinct pair set and
  * attaching contiguous indices (GlobalRank.globalRowNumber — the sharded
  * prefix-sum pattern: range partition, per-partition rank window,
  * broadcast offsets; no single-partition window, no RDD round trip). Each round's labeled table is
  * `localCheckpoint`ed: the values are pinned once (a lazily recomputed
  * id assignment could disagree with itself across reuses) and the
  * per-round lineage is truncated, exactly like PageRank's iterations.
  *
  * 100 TB: every join is an equi-join on (doc_id, pos) keys; shuffles
  * carry O(N) fixed-width rows per round for ⌈log₂ L⌉ ≈ 6 rounds at
  * L = 50; the only windows are per-doc (bounded by doc length). The
  * densify sort is a standard distributed sort of ≤ N rows per round.
  */
object SuffixDedup {

  /** (doc_id, pos) of every position whose L-token window occurs ≥ 2
    * times in the corpus. `toks` must be (doc_id: long, pos: long 1-based,
    * tok: string) with contiguous per-doc positions.
    */
  def coveredPositions(toks: DataFrame, L: Int): DataFrame = {
    require(L >= 2, s"window length must be >= 2, got $L")

    // a = largest power of two < L; a >= L/2 so the two a-windows at p and
    // p+L-a overlap and exactly cover [p, p+L-1]
    val a = Integer.highestOneBit(L - 1)

    // round 0: dense token ids (distinct tokens, total-sorted)
    val tokIds = GlobalRank.globalRowNumber(
      toks.select(col("tok")).distinct(), Seq(col("tok")), "id")
    var cur = toks.join(tokIds, Seq("tok"))
      .select(col("doc_id"), col("pos"), col("id").as("lbl"))
      .localCheckpoint()

    var width = 1
    while (width < a) {
      val nxt = cur.as("x").join(cur.as("y"),
          col("x.doc_id") === col("y.doc_id") &&
            col("y.pos") === col("x.pos") + width)
        .select(col("x.doc_id").as("doc_id"), col("x.pos").as("pos"),
          col("x.lbl").as("l1"), col("y.lbl").as("l2"))
      // in-place dense rank: ONE range shuffle per round (equality-correct
      // labels are all this duplicate test needs; order-correctness comes
      // free and keeps the device shared with suffixRanks)
      cur = GlobalRank.withDenseRank(nxt, Seq(col("l1"), col("l2")), "lbl")
        ._1.select(col("doc_id"), col("pos"), col("lbl"))
      width *= 2
    }

    // key_L(p) = (label_a(p), label_a(p + L - a)); the join's existence
    // also enforces pos + L - 1 <= doc_len (short-tail positions drop out)
    val keyed = cur.as("x").join(cur.as("y"),
        col("x.doc_id") === col("y.doc_id") &&
          col("y.pos") === col("x.pos") + (L - a))
      .select(col("x.doc_id").as("doc_id"), col("x.pos").as("pos"),
        col("x.lbl").as("k1"), col("y.lbl").as("k2"))
    val dupKeys = keyed.groupBy(col("k1"), col("k2"))
      .agg(count(lit(1)).as("__n")).where(col("__n") >= 2)
      .select(col("k1"), col("k2"))
    keyed.join(dupKeys, Seq("k1", "k2")).select(col("doc_id"), col("pos"))
  }

  /** TRUE suffix ranks — the distributed suffix ARRAY, not just the
    * duplicate test: every (doc_id, pos) gets a label such that
    * label(a) < label(b) ⇔ the token suffix starting at a sorts strictly
    * before the one starting at b (equal suffixes share a label; ties are
    * broken downstream by (doc_id, pos)). Same prefix-doubling loop as
    * [[coveredPositions]] with two changes that make the labels
    * ORDER-correct, not merely equality-correct:
    *
    *  - the densify sort assigns ids in (l1, l2) order and the initial
    *    token ids are assigned in token order, so order is preserved
    *    inductively — rank_{2w} order IS lexicographic (rank_w[p],
    *    rank_w[p+w]) order;
    *  - positions whose second half falls off the end of the doc keep a
    *    SENTINEL −1 second label (LEFT join), which sorts first — the
    *    standard "shorter suffix is a prefix ⇒ sorts first" rule.
    *
    * Rounds: ⌈log₂ max-doc-length⌉ equi-join + densify-sort rounds; the
    * suffix order of a corpus-sized token table is built in O(N log N)
    * fixed-width rows, never materializing suffix strings.
    */
  def suffixRanks(toks: DataFrame): DataFrame = {
    val maxLen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).first().getLong(0)
    val tokIds = GlobalRank.globalRowNumber(
      toks.select(col("tok")).distinct(), Seq(col("tok")), "id")
    var cur = toks.join(tokIds, Seq("tok"))
      .select(col("doc_id"), col("pos"), col("id").as("lbl"))
      .localCheckpoint()
    var width = 1L
    // classic prefix-doubling termination: label classes only ever SPLIT,
    // so if a round's distinct-label count is unchanged the partition is
    // identical and (inductively) every later round is too — iterate
    // until stable or width covers the longest doc, whichever is first.
    // On mostly-unique text this stops at width ≈ the longest repeated
    // passage, not the longest document.
    var nDistinct = -1L
    var stable = false
    while (width < maxLen && !stable) {
      val nxt = cur.as("x").join(cur.as("y"),
          col("x.doc_id") === col("y.doc_id") &&
            col("y.pos") === col("x.pos") + width, "left_outer")
        .select(col("x.doc_id").as("doc_id"), col("x.pos").as("pos"),
          col("x.lbl").as("l1"), coalesce(col("y.lbl"), lit(-1L)).as("l2"))
      // in-place ORDER-correct dense rank (one range shuffle per round;
      // the distinct count for the termination test is the offsets sum —
      // free); labels are pinned by the checkpoint inside withDenseRank
      val (labeled, n) = GlobalRank.withDenseRank(
        nxt, Seq(col("l1"), col("l2")), "lbl")
      cur = labeled.select(col("doc_id"), col("pos"), col("lbl"))
      stable = n == nDistinct
      nDistinct = n
      width *= 2
    }
    cur
  }

  /** Maximal duplicate spans ≥ L tokens: merged runs of covered L-windows
    * per doc — output (doc_id, span_start, span_end, span_len), 1-based
    * inclusive token positions. Two windows merge while they overlap or
    * touch (next start ≤ prev start + L).
    */
  def maximalDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                            L: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TextAnalysisFns.tokens(col(textCol)))
          .as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("tok"))
    val covered = coveredPositions(toks, L)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    covered
      .withColumn("__prev", lag(col("pos"), 1).over(w))
      .withColumn("__brk",
        when(col("__prev").isNull || col("pos") - col("__prev") > L, 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (L - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
      .orderBy(col("doc_id"), col("span_start"))
  }
}
