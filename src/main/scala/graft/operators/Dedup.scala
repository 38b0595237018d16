package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{SimFns, TextAnalysisFns}

/** Deduplication operator family for a training-data pipeline.
  *
  * Scale design: every variant avoids the O(N²) comparison by blocking —
  * exact dedup is a hash groupBy (one shuffle); MinHash-LSH and SimHash
  * shuffle on band keys so only same-bucket pairs are compared; n-gram
  * Jaccard runs over an inverted shingle index (explode → equi-join →
  * count) instead of per-pair array intersections. Signature computation
  * is explode + codegen'd hash aggregation (map-side partial min/sum), not
  * nested array lambdas — the same plan that survives 1000 executors.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct hash (keeper = min
    * id), with the duplicate count. Hash-groupBy — map-side partial agg,
    * single shuffle.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup with PROVENANCE-priority keeper selection: within each
    * content-hash group keep the row with the greatest `prefCol` value
    * (ties → min id) — what a curation pipeline wants when duplicates
    * differ in source quality (keep the curated copy, not whichever id
    * happens to be smallest). Same shape as [[exact]]: ONE map-side-
    * combinable `max(struct(pref, −id))` argmax aggregation, never a
    * window over the corpus — partial state is one candidate per
    * (partition, hash), so the shuffle carries keepers, not duplicates.
    */
  def exactKeepBest(df: DataFrame, idCol: String, textCol: String,
                    prefCol: String): DataFrame =
    df.select(md5(col(textCol)).as("content_hash"),
        struct(col(prefCol).as("pref"), (-col(idCol)).as("nid")).as("__cand"))
      .groupBy(col("content_hash"))
      .agg(max(col("__cand")).as("__best"), count(lit(1)).as("n_dups"))
      .select(col("content_hash"), (-col("__best.nid")).as("keep_id"),
        col("__best.pref").as("keep_pref"), col("n_dups"))

  /** (id, shingles) with empty-shingle rows dropped — shared prep. */
  private def shingled(df: DataFrame, idCol: String, textCol: String,
                       shingleWords: Int): DataFrame =
    df.select(col(idCol).as("id"),
        SimFns.wordShingles(TextAnalysisFns.tokens(col(textCol)), shingleWords)
          .as("shingles"))
      .where(size(col("shingles")) > 0)

  /** MinHash + LSH near-dup candidate pairs, verified by true shingle
    * Jaccard ≥ `threshold`. Returns (id_a < id_b, jaccard).
    *
    * Plan: explode shingles → one hash-aggregate computing all k minima
    * (sig_j = min md5(j":"shingle)) → band keys from the signature columns
    * → self equi-join on band → verify with exact Jaccard on the shingle
    * arrays. The only wide stages are the groupBy(id) and the band join.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleWords: Int = 3, numHashes: Int = 8, bands: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    // referenced by the signature build AND both verify joins: cache so the
    // shingling runs once, not re-derived inside three scans
    val sh = shingled(df, idCol, textCol, shingleWords).cache()
    val sig = sh.select(col("id"), explode(col("shingles")).as("s"))
      .groupBy(col("id"))
      .agg(min(md5(concat(lit("0:"), col("s")))).as("h0"),
        (1 until numHashes).map(j =>
          min(md5(concat(lit(s"$j:"), col("s")))).as(s"h$j")): _*)
    val bandCols = (0 until bands).map { i =>
      val slice = (i * rows until (i + 1) * rows).map(j => col(s"h$j"))
      concat(lit(s"$i#"), md5(concat_ws(",", slice: _*)))
    }
    // both self-join sides read this frame: cache so the k-min signature
    // aggregate runs once, not once per side
    val banded = sig.select(col("id"), explode(array(bandCols: _*)).as("band"))
      .cache()
    val pairs = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct() // a pair can collide in multiple bands
    pairs
      .join(sh.select(col("id").as("id_a"), col("shingles").as("__sa")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("__sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        SimFns.jaccard(col("__sa"), col("__sb")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit simhash, banded into 4×16-bit blocks
    * (recall guarantee for hamming ≤ 3), verified by hamming ≤ maxHamming.
    *
    * Plan: explode tokens → md5 once per token → one hash-aggregate with 64
    * ±1 vote sums (codegen) → flat bit-pack → band equi-join.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              maxHamming: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        TextAnalysisFns.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("id"), explode(col("toks")).as("t"))
      .select(col("id"), md5(col("t")).as("h"))
    // vote_q = Σ tokens (bit q of md5 ? +1 : -1); bit q = nibble q/4, bit q%4
    def voteExpr(q: Int): Column = {
      val nib = conv(substring(col("h"), q / 4 + 1, 1), 16, 10).cast("int")
      val bit = shiftright(nib, q % 4).bitwiseAND(lit(1))
      sum(when(bit === 1, 1).otherwise(-1)).as(s"v$q")
    }
    val votes = toks.groupBy(col("id"))
      .agg(voteExpr(0), (1 until 64).map(voteExpr): _*)
    val low63 = (0 until 63).map(q =>
      when(col(s"v$q") > 0, lit(1L << q)).otherwise(lit(0L))).reduce(_ + _)
    val packed = low63 +
      when(col("v63") > 0, lit(Long.MinValue)).otherwise(lit(0L))
    // both self-join sides read this frame: cache so the 64-vote hash
    // aggregate (the expensive stage) runs once, not once per side
    val hashed = votes.select(col("id"), packed.as("simhash"))
      .withColumn("band", explode(graft.functions.HashFns.simhashBands(col("simhash"))))
      .cache()
    hashed.alias("a")
      .join(hashed.alias("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.HashFns.hammingDistance(col("a.simhash"), col("b.simhash"))
          .as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** N-gram Jaccard near-dup pairs within blocks: equi-join on the block
    * key, then one compiled intersection count per candidate pair.
    * (An inverted-index plan was tried and rejected: with natural-language
    * n-grams the per-gram self-join fans out as Σ freq² on stop-grams,
    * which loses badly to O(pairs) × a compiled hash-probe intersect.)
    * Blocking keys keep the candidate pair count linear-ish; with
    * `blockCols` empty this degrades to the exact quadratic form.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String, n: Int,
                   blockCols: Seq[String], threshold: Double): DataFrame = {
    // grams kept SORTED so the threshold predicate is a single merge scan
    // with early exit (JaccardGeq); the sort happens inside the compiled
    // CharNgrams pass (array_sort's comparator lambda is interpreted per
    // comparison). Cached because the self-join references this frame
    // twice and predicate pushdown would otherwise re-derive the grams
    // inside each scan's filter (3 evaluations per row).
    val grams = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
        graft.expressions.CharNgrams.sorted(col(textCol), lit(n)).as("grams"): _*)
      .where(size(col("grams")) > 0)
      // the pair loop's work is per-PAIR, not per-row: spread the streamed
      // side across the cluster or a small input file runs every
      // comparison in one task
      .repartition(col("id"))
      .cache()
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(col("a.id") < col("b.id"))(_ && _)
    grams.alias("a").join(grams.alias("b"),
        blockCond && graft.expressions.JaccardGeq(col("a.grams"), col("b.grams"), threshold))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        SimFns.jaccard(col("a.grams"), col("b.grams")).as("jaccard"))
  }

  /** Connected components over near-dup pairs → canonical keeper per
    * cluster (min id), the step that turns pairwise dedup output into a
    * keep/drop decision. Returns (id, keep_id).
    *
    * Two physical paths behind one semantics:
    *  - pair set ≤ `driverMaxPairs` and integral ids: collect the edges and
    *    run union-find on the driver (path-compressed, min-id roots). The
    *    LSH candidate set is orders of magnitude smaller than the corpus —
    *    10M edges is ~160 MB of driver heap — and this replaces
    *    O(diameter) shuffle rounds with one collect.
    *  - otherwise: distributed min-label propagation; each round every
    *    node adopts the smallest label among itself and its neighbors,
    *    converging in O(cluster diameter) rounds of two bounded shuffles —
    *    the path that holds when even the pair set is cluster-sized.
    */
  def components(pairs: DataFrame, maxIter: Int = 1000,
                 driverMaxPairs: Long = 10L * 1000 * 1000): DataFrame = {
    val idType = pairs.schema("id_a").dataType
    val integralIds = idType == org.apache.spark.sql.types.LongType ||
      idType == org.apache.spark.sql.types.IntegerType
    val p = pairs.select(col("id_a"), col("id_b")).cache()
    val nPairs = p.count()
    if (integralIds && nPairs <= driverMaxPairs) {
      val result = componentsUnionFind(p, idType)
      p.unpersist()
      return result
    }
    // cached hash(dst)-partitioned: each round's edges ⋈ labels join
    // consumes the cached partitioning with no exchange on the edge side
    // (the PageRank pattern, round 16) — labels come out of the previous
    // round's id-keyed join, so both sides arrive co-partitioned
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().repartition(col("dst")).cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("keep_id", col("id"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2")).agg(min(col("keep_id")).as("nmin"))
      // localCheckpoint (eager), not cache: the join references `labels`
      // twice, so without lineage truncation the logical plan doubles per
      // round and a diameter-d chain builds an O(2^d) plan tree.
      // __chg rides the same pass (new < old ⟺ the row changed), so the
      // convergence probe is a scan of the pinned frame — the previous
      // updated ⋈ labels probe re-joined two corpus-of-clusters tables
      // every round just to detect change.
      val updated = labels.join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"),
          least(col("keep_id"), coalesce(col("nmin"), col("keep_id")))
            .as("keep_id"),
          (col("nmin") < col("keep_id")).as("__chg"))
        .localCheckpoint()
      val changed = updated.where(col("__chg")).limit(1).count()
      labels = updated.select(col("id"), col("keep_id"))
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    p.unpersist()
    // A silently-split cluster gives wrong keep/drop decisions; the pair set
    // is small by construction, so non-convergence is a bug, not a budget.
    if (!converged) throw new IllegalStateException(
      s"Dedup.components did not converge after $maxIter label-propagation " +
        "rounds (dup-chain diameter exceeds maxIter)")
    labels
  }

  /** Driver-side path-compressed union-find with min-id roots; exact same
    * (id, keep_id) contract as the distributed loop.
    */
  private def componentsUnionFind(pairs: DataFrame,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (c != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
      r
    }
    def asLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int  => i.toLong
    }
    pairs.collect().foreach { row =>
      val a = asLong(row.get(0)); val b = asLong(row.get(1))
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size())
    parent.keySet().forEach(id => out += ((id, find(id))))
    out.toSeq.toDF("id", "keep_id")
      .select(col("id").cast(idType).as("id"),
        col("keep_id").cast(idType).as("keep_id"))
  }

  /** Embedding cosine near-dup pairs within a hyperplane-LSH bucket.
    * `numPlanes` sign bits form the bucket; same-bucket pairs with cosine ≥
    * threshold are returned. For oracle-exact small-scale checks use
    * `Ann.bruteForcePairs` instead.
    *
    * Scale knob: with a FIXED plane count the same-bucket pair count grows
    * ~N²/2^planes — grow planes with the corpus via
    * [[Ann.adaptivePlaneCount]] (⌈log₂(N/targetBucket)⌉) so total
    * candidate pairs stay linear in N.
    */
  def embeddingCosine(df: DataFrame, idCol: String, vecCol: String,
                      planes: Seq[Seq[Double]], threshold: Double): DataFrame = {
    import graft.functions.VecFns
    val planeCols = planes.map(p => array(p.map(lit): _*))
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      VecFns.hyperplaneBucket(col(vecCol), planeCols).as("bucket"),
      VecFns.norm(col(vecCol)).as("nrm"))
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        when(col("a.nrm") === 0.0 || col("b.nrm") === 0.0, lit(0.0))
          .otherwise(VecFns.dot(col("a.vec"), col("b.vec")) /
            (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** SemDeDup-style semantic dedup: cluster by nearest centroid
    * ([[Ann.assignCells]]), then within each cluster mark a row duplicate
    * iff some LOWER-id row of the same cell has cosine ≥ `threshold` to
    * it (greedy keep-lowest-id — the partner itself may also be a dup;
    * the rule is EXISTS against all lower ids, not just survivors, which
    * keeps it one self-join instead of an iterative fixpoint).
    *
    * Scale: the cell equi-join bounds the quadratic to within-cell pairs;
    * `nlist` grows with the corpus so cells stay near-constant size, and
    * an oversized cell can be re-blocked with hyperplane LSH
    * ([[embeddingCosine]]) — never corpus × corpus.
    */
  def semantic(df: DataFrame, idCol: String, vecCol: String,
               index: Ann.IvfIndex, threshold: Double): DataFrame = {
    import graft.functions.VecFns
    val cells = Ann.assignCells(df, vecCol, index)
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("cell"),
        VecFns.norm(col(vecCol)).as("nrm"))
    val a = cells.alias("a")
    val b = cells.alias("b")
    val dup = a.join(b, col("a.cell") === col("b.cell") &&
        col("b.id") < col("a.id"))
      .where(when(col("a.nrm") === 0.0 || col("b.nrm") === 0.0, lit(0.0))
        .otherwise(VecFns.dot(col("a.vec"), col("b.vec")) /
          (col("a.nrm") * col("b.nrm"))) >= threshold)
      .select(col("a.id").as("id")).distinct()
      .withColumn("__dup", lit(true))
    cells.select(col("id"), col("cell"))
      .join(dup, Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
  }

  /** CCNet-style line-level dedup: a line occurring in MORE THAN ONE
    * distinct document is boilerplate — dropped from every document; each
    * document is reassembled from its surviving lines in original order.
    * Returns one row per document: `n_lines`, `n_kept`, `kept_text`
    * (space-joined survivors; empty string when nothing survives).
    *
    * The line unit is caller-chosen via `lineTokens`
    * ([[TextAnalysisFns.pseudoLines]] fixed-token windows — the synthetic
    * corpus has no newlines; on real text split on '\n' first).
    *
    * Scale: explode → hash-agg line doc-frequency (map-side combine on the
    * line hash) → equi-join back → per-doc agg. Two shuffles on bounded
    * keys, never doc × doc; the reassembly sort is per-doc (array_sort of
    * that doc's collected lines), not a global order.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                lineTokens: Int): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(TextAnalysisFns.pseudoLines(col(textCol), lineTokens))
        .as(Seq("pos", "line")))
    val common = lines.groupBy(col("line"))
      .agg(count_distinct(col("id")).as("__docs"))
      .where(col("__docs") > 1)
      .select(col("line"), lit(true).as("__common"))
    lines.join(common, Seq("line"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_lines"),
        // when() without otherwise yields NULL for common lines, and both
        // count() and collect_list() skip NULLs — one pass, no second join
        count(when(col("__common").isNull, lit(1))).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__common").isNull, struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          " ").as("kept_text"))
  }
}
