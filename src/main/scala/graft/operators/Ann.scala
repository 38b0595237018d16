package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VecFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — queries are broadcast (small side),
  * so the corpus streams through a broadcast nested-loop join with the
  * cosine computed in codegen'd expressions; per-query top-k via window
  * rank. At 100 TB the scale path is `lshTopK`: hyperplane buckets prune
  * the corpus to same-bucket candidates (equi-join on bucket id), trading
  * recall for a shuffle-bounded plan.
  */
object Ann {

  /** Cosine from a precomputed-norm pair — the per-pair work is one dot
    * product; norms are computed once per vector upstream (identical
    * double math to VecFns.cosine, just not recomputed per pair).
    */
  private def cosinePre(av: Column, an: Column, bv: Column, bn: Column): Column =
    when(an === 0.0 || bn === 0.0, lit(0.0))
      .otherwise(VecFns.dot(av, bv) / (an * bn))

  /** Per-query top-k over (query_id, neighbor_id, cosine) via the bounded
    * TypedImperativeAggregate (TopKAgg: score DESC, id ASC — the same
    * total order as the row_number window it replaces, proven equivalent
    * in AnnSpec/TopKAggSpec). The window formulation shuffles and sorts
    * EVERY scored candidate; this folds candidates into ≤2k entries of
    * partial state per (partition, query), so the shuffle carries
    * O(queries × k).
    */
  private def topKByScore(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.expressions.TopKAgg.topK(
        struct(col("cosine").cast("double"), col("neighbor_id").cast("long")), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("query_id"), col("__e.id").as("neighbor_id"),
        col("__e.score").as("cosine"), (col("__pos") + 1).cast("int").as("rank"))

  /** SQ8 top-k: brute-force search against the int8 scalar-quantized
    * corpus — per-vector scale `127 / max|x|`, codes `round(x·scale)`
    * (round-to-nearest, ties away from zero — the same convention in
    * Spark's `round` and DuckDB's `round`, and the same quantizer as
    * `embed_quantize_int8`; an earlier floor() variant biased codes
    * toward −∞ by up to half a step), queries scored at
    * full precision against the on-the-fly reconstruction
    * `codes[i] / scale` (asymmetric distance: the standard SQ8 serving
    * shape — e.g. Faiss `ScalarQuantizer` QT_8bit). Zero vectors
    * quantize to scale 0 and reconstruct to the zero vector (cosine 0
    * via the zero-norm guard).
    *
    * Scale contract: at 100 TB the `codes` column IS what the index
    * stores — int8 codes are 4× smaller than float32, and the
    * reconstruction + dot product run in one codegen projection per
    * candidate, never materializing a float copy of the corpus. The
    * search itself keeps `bruteForceTopK`'s plan (broadcast queries,
    * bounded TopKAgg tail); compose with cell/bucket pruning (ivf/lsh)
    * for the candidate-bounded variant.
    */
  def sqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int): DataFrame = {
    val v = col(vecCol)
    val recon = corpus
      .withColumn("__m", array_max(transform(v, x => abs(x.cast("double")))))
      .withColumn("__scale",
        when(col("__m") === 0.0, lit(0.0)).otherwise(lit(127.0) / col("__m")))
      .withColumn("__codes",
        transform(v, x => round(x.cast("double") * col("__scale")).cast("long")))
      .select(col(idCol).as("neighbor_id"),
        transform(col("__codes"), c =>
          when(col("__scale") === 0.0, lit(0.0))
            .otherwise(c.cast("double") / col("__scale"))).as("cv"))
      .withColumn("cn", VecFns.norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VecFns.norm(col(vecCol)).as("qn"))
    val scored = recon.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("qn"), col("cv"), col("cn")).as("cosine"))
    topKByScore(scored, k)
  }

  /** The shared brute-force scoring block (broadcast queries × streamed
    * corpus, norms precomputed, self-match excluded) — one source of
    * truth for [[bruteForceTopK]] and [[hardNegatives]], so a fix to the
    * plan (exclusion rule, norm precompute) lands in both.
    */
  private def scoredCandidates(queries: DataFrame, corpus: DataFrame,
                               idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VecFns.norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VecFns.norm(col(vecCol)).as("cn"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("qn"), col("cv"), col("cn")).as("cosine"))
  }

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors (self-match excluded), ties broken by corpus id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame =
    topKByScore(scoredCandidates(queries, corpus, idCol, vecCol), k)

  /** Hard-negative mining for contrastive embedding training: per query,
    * the k MOST similar corpus vectors that are NOT near-duplicates
    * (cosine < `dupThreshold`) — the highest-signal negatives a
    * dense-retrieval trainer wants (too-similar rows are presumed
    * positives/dups and excluded; the band just below the threshold is
    * exactly the "hard" region). Same plan as [[bruteForceTopK]]
    * (broadcast queries, codegen cosine, bounded TopKAgg tail) with the
    * near-dup band filtered BEFORE the aggregate so duplicates never
    * occupy top-k slots; at scale swap the scored-candidate source for
    * the lsh/ivf candidate equi-join — filter and tail are unchanged.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int, dupThreshold: Double): DataFrame =
    topKByScore(scoredCandidates(queries, corpus, idCol, vecCol)
      .where(col("cosine") < dupThreshold), k)

  /** All pairs (id_a < id_b) with cosine ≥ threshold — exact, O(N²); the
    * small-scale oracle for the LSH variants.
    */
  def bruteForcePairs(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      VecFns.norm(col(vecCol)).as("na"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      VecFns.norm(col(vecCol)).as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosinePre(col("va"), col("na"), col("vb"), col("nb")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** LSH-bucketed top-k: hyperplane sign buckets prune candidates; within a
    * bucket the exact cosine ranks. Multi-probe is achieved by passing
    * several plane sets (each adds one bucket per vector).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, planeSets: Seq[Seq[Seq[Double]]]): DataFrame = {
    def bucketed(df: DataFrame, id: String, v: String): DataFrame =
      planeSets.zipWithIndex.map { case (planes, i) =>
        val planeCols = planes.map(p => array(p.map(lit): _*))
        df.select(col(idCol).as(id), col(vecCol).as(v),
          concat(lit(s"$i#"),
            VecFns.hyperplaneBucket(col(vecCol), planeCols).cast("string")).as("bucket"))
      }.reduce(_ unionByName _)
    val q = bucketed(queries, "query_id", "qv")
    val c = bucketed(corpus, "neighbor_id", "cv")
    val cand = q.join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .distinct()
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      VecFns.cosine(col("qv"), col("cv")).as("cosine"))
    topKByScore(scored, k)
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed). */
  def deterministicPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** The hyperplane-LSH scale knob, executable instead of prose: the
    * plane count that keeps EXPECTED bucket size near `targetBucketSize`
    * as the corpus grows. 2^planes buckets ⇒ planes = ⌈log₂(n/target)⌉;
    * with planes FIXED the same-bucket candidate-pair count grows
    * ~N²/2^planes (quadratic in the corpus), while growing planes with
    * log₂(N) pins per-bucket pairs at ~target²/2 so TOTAL candidates stay
    * LINEAR in N — the same discipline as IVF's √N nlist. Clamped to
    * [1, 62] (bucket ids pack into a positive long).
    */
  def adaptivePlaneCount(n: Long, targetBucketSize: Int = 256): Int = {
    require(n > 0 && targetBucketSize > 0)
    val buckets = (n + targetBucketSize - 1) / targetBucketSize
    val planes = 64 - java.lang.Long.numberOfLeadingZeros(math.max(buckets - 1, 1))
    math.min(math.max(planes, 1), 62)
  }

  /** IVF (inverted-file) index state: centroid id → centroid vector. */
  final case class IvfIndex(centroids: Seq[(Int, Seq[Double])])

  /** Deterministic k-means‖ seeding (Bahmani et al. 2012, "Scalable
    * k-means++", PVLDB 5(7)) — the quality-aware init for [[ivfTrain]]'s
    * `scalableInit` flag. The classic k-means++ picks one center per
    * sequential pass (k passes over the corpus — a non-starter at scale);
    * k-means‖ instead OVERSAMPLES ~ℓ candidates per round for a fixed
    * handful of rounds, then reduces the small weighted candidate set to
    * `nlist` centers driver-side.
    *
    * Determinism (no RNG): the per-point "uniform draw" is
    * xxhash64(id, round) scaled to [0,1) — reproducible across runs,
    * partitionings, and cluster sizes; the driver-side reduction is the
    * weighted farthest-point (maximin) variant of k-means++ followed by
    * weighted Lloyd, ties to the lowest candidate index.
    *
    * Scale: each round is two corpus scans (the Σ min-d² aggregate and
    * the filtered sample) with the candidate matrix as a compiled
    * reference object ([[graft.expressions.NearestCentroidDist]] — O(1)
    * expression tree at any candidate count); driver memory is bounded
    * by the candidate cap (≤ 16·ℓ per round), never corpus rows.
    */
  def kmeansParInit(corpus: DataFrame, idCol: String, vecCol: String,
                    nlist: Int, rounds: Int = 5,
                    oversample: Int = 0): Seq[(Int, Seq[Double])] = {
    val ell = if (oversample > 0) oversample else 2 * nlist
    val vecs = corpus.select(col(idCol).cast("long").as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    var cand: Vector[Seq[Double]] =
      vecs.orderBy(col("__id")).limit(1).select(col("__v"))
        .collect().map(_.getSeq[Double](0).toSeq).toVector
    var r = 1
    var exhausted = cand.isEmpty
    while (r <= rounds && !exhausted) {
      val d2 = graft.expressions.NearestCentroidDist(col("__v"), cand)
      val phi = vecs.agg(sum(d2)).first() match {
        case row if row.isNullAt(0) => 0.0
        case row => row.getDouble(0)
      }
      if (phi <= 0.0) exhausted = true // every point coincides with a candidate
      else {
        // deterministic pseudo-uniform draw in [0,1) per (point, round)
        val u = pmod(xxhash64(col("__id"), lit(r)), lit(1L << 24))
          .cast("double") / lit((1L << 24).toDouble)
        val p = least(lit(1.0), lit(ell.toDouble) * d2 / lit(phi))
        // E[sample] = ℓ; the cap bounds the driver collect against skew
        // (a near-degenerate corpus where most mass sits on few points)
        val picked = vecs.where(u < p).orderBy(col("__id"))
          .limit(16 * ell).select(col("__v"))
          .collect().map(_.getSeq[Double](0).toSeq)
        cand = cand ++ picked
      }
      r += 1
    }
    // weight candidates by how many corpus points they are nearest to
    val candIdx = cand.zipWithIndex.map { case (v, i) => (i, v) }
    val weights: Map[Int, Long] =
      if (cand.isEmpty) Map.empty
      else vecs.select(graft.expressions.NearestCentroid(col("__v"), candIdx)
          .as("__c"))
        .groupBy(col("__c")).agg(count(lit(1)).as("__n"))
        .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
    reduceWeighted(cand, cand.indices.map(i => weights.getOrElse(i, 0L)), nlist)
  }

  /** Driver-side reduction of the k-means‖ candidate set: weighted
    * maximin seeding (first = candidate 0, then repeatedly the candidate
    * maximizing weight × min-d² to chosen, ties → lowest index) followed
    * by weighted Lloyd until stable (≤ 20 rounds). Deterministic; input
    * is the bounded candidate set, never corpus rows.
    */
  private def reduceWeighted(cand: Vector[Seq[Double]], w: Seq[Long],
                             nlist: Int): Seq[(Int, Seq[Double])] = {
    if (cand.isEmpty) return Seq.empty
    val arrs = cand.map(_.toArray)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // dedupe exact-duplicate candidates (their weights merge) so maximin
    // never wastes a center on a copy
    val uniq = scala.collection.mutable.LinkedHashMap.empty[Seq[Double], Long]
    cand.zip(w).foreach { case (v, wi) =>
      uniq.updateWith(v)(prev => Some(prev.getOrElse(0L) + wi))
    }
    val uv = uniq.keys.toArray.map(_.toArray)
    val uw = uniq.values.toArray.map(_.toDouble)
    val k = math.min(nlist, uv.length)
    val chosen = scala.collection.mutable.ArrayBuffer(0)
    val minD = uv.map(d2(_, uv(0)))
    while (chosen.length < k) {
      var bi = -1; var bs = -1.0
      var i = 0
      while (i < uv.length) {
        val s = uw(i) * minD(i)
        if (s > bs + 1e-18 && !chosen.contains(i)) { bs = s; bi = i }
        i += 1
      }
      chosen += bi
      i = 0
      while (i < uv.length) {
        val d = d2(uv(i), uv(bi)); if (d < minD(i)) minD(i) = d; i += 1
      }
    }
    var centers = chosen.map(uv(_)).toArray
    var moved = true
    var it = 0
    while (moved && it < 20) {
      val sums = Array.fill(centers.length)(new Array[Double](uv(0).length))
      val cnts = new Array[Double](centers.length)
      var i = 0
      while (i < uv.length) {
        var bj = 0; var bd = Double.PositiveInfinity
        var j = 0
        while (j < centers.length) {
          val d = d2(uv(i), centers(j)); if (d < bd) { bd = d; bj = j }; j += 1
        }
        var t = 0
        while (t < uv(i).length) { sums(bj)(t) += uw(i) * uv(i)(t); t += 1 }
        cnts(bj) += uw(i)
        i += 1
      }
      val next = centers.indices.map { j =>
        if (cnts(j) > 0) sums(j).map(_ / cnts(j)) else centers(j)
      }.toArray
      moved = centers.zip(next).exists { case (a, b) => d2(a, b) > 1e-24 }
      centers = next
      it += 1
    }
    centers.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
  }

  /** Train an IVF coarse quantizer with deterministic Lloyd's iterations:
    * init = the `nlist` lowest-id vectors (default — oracle parity) or
    * deterministic k-means‖ ([[kmeansParInit]], `scalableInit = true`),
    * then `iters` rounds of assign-to-nearest (L2) + recompute means —
    * all DataFrame ops, the centroid table broadcast each round.
    * Deterministic either way: no RNG, fixed iteration count, ties broken
    * by centroid id.
    */
  def ivfTrain(corpus: DataFrame, idCol: String, vecCol: String,
               nlist: Int, iters: Int = 5,
               scalableInit: Boolean = false): IvfIndex = {
    val spark = corpus.sparkSession
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    var centroids: Seq[(Int, Seq[Double])] =
      if (scalableInit) kmeansParInit(corpus, idCol, vecCol, nlist)
      else corpus.orderBy(col(idCol)).limit(nlist)
        // float AND double embedding columns are accepted, like every other
        // Ann/VecFns entry point
        .select(col(vecCol).cast("array<double>")).collect()
        .map(_.getSeq[Double](0).toSeq)
        .zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    for (_ <- 1 to iters) {
      val assigned = assignToCentroids(corpus, vecCol, centroids)
      val sums = assigned
        .select(col("__centroid"),
          posexplode(col(vecCol)).as(Seq("__d", "__x")))
        .groupBy(col("__centroid"), col("__d"))
        .agg(sum(col("__x").cast("double")).as("__sum"), count(lit(1)).as("__n"))
        .collect()
      val byCentroid = sums.groupBy(_.getInt(0))
      centroids = centroids.map { case (cid, old) =>
        byCentroid.get(cid) match {
          case Some(rows) =>
            val mean = new Array[Double](dim)
            rows.foreach(r => mean(r.getInt(1)) = r.getDouble(2) / r.getLong(3))
            (cid, mean.toSeq)
          case None => (cid, old) // empty cell keeps its centroid
        }
      }
    }
    IvfIndex(centroids)
  }

  /** Squared L2 distance to a constant centroid via the codegen dot
    * product: ||v−c||² = v·v − 2v·c + c·c (monotonic in distance, so
    * comparisons need no sqrt; c·c folds to a constant).
    */
  private def distSqTo(v: Column, cv: Seq[Double]): Column = {
    val c = array(cv.map(lit): _*)
    VecFns.dot(v, v) - lit(2.0) * VecFns.dot(v, c) + lit(cv.map(x => x * x).sum)
  }

  /** (distance², centroid id) structs for every centroid — struct ordering
    * is lexicographic, so `array_min` picks nearest-with-lowest-id and
    * `array_sort` ranks probes, both with LINEAR expression size in
    * `nlist` (a when-chain reduce would double the expression tree per
    * centroid — 2^nlist plan blow-up).
    */
  private def cellStructs(v: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    array(centroids.map { case (cid, cv) =>
      struct(distSqTo(v, cv).as("d"), lit(cid).as("cid"))
    }: _*)

  /** Nearest centroid (L2, ties → lowest centroid id) per row. */
  private def assignToCentroids(df: DataFrame, vecCol: String,
                                centroids: Seq[(Int, Seq[Double])]): DataFrame =
    df.withColumn("__centroid",
      array_min(cellStructs(col(vecCol), centroids)).getField("cid"))

  /** Above this many centroids the literal-expression assignment is
    * replaced by [[graft.expressions.NearestCentroid]]: the literal form
    * embeds nlist × dim constants in ONE expression tree, and past a few
    * dozen centroids the generated code grows to megabytes — Janino
    * spends tens of seconds COMPILING it (measured: 45 s at nlist=142 on
    * 20k rows, data-independent) or falls back to interpreted eval.
    */
  private val LiteralAssignMaxCells = 32

  /** Public cell assignment: every row tagged with its nearest-centroid id
    * as `cell` — the shared front half of [[ivfTopK]] and
    * `Dedup.semantic`. Small nlist: pure codegen expressions over one
    * scan (centroid table literal). Large nlist (the √N regime of a big
    * corpus): the [[graft.expressions.NearestCentroid]] compiled argmin —
    * centroid matrix as a reference object, O(1) expression tree, tight
    * per-row loop, still one scan and no shuffle. Identical assignment
    * either way (same ||v−c||² accumulation, same lowest-cid tie-break;
    * spec-pinned equality).
    */
  def assignCells(df: DataFrame, vecCol: String, index: IvfIndex): DataFrame =
    if (index.centroids.size <= LiteralAssignMaxCells)
      assignToCentroids(df, vecCol, index.centroids)
        .withColumnRenamed("__centroid", "cell")
    else df.withColumn("cell",
      graft.expressions.NearestCentroid(col(vecCol), index.centroids))

  /** IVF top-k: assign corpus to cells once, probe the `nprobe` cells
    * nearest each query, exact cosine rank within the probed subset. The
    * cell equi-join replaces the full-corpus scan — the IVF trade: recall
    * bounded by nprobe/nlist, cost bounded by probed cells.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, index: IvfIndex, nprobe: Int): DataFrame = {
    val cells = assignToCentroids(corpus, vecCol, index.centroids)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col("__centroid").as("cell"),
        VecFns.norm(col(vecCol)).as("cn"))
    // per-query probe list: nprobe nearest centroids
    val probes = array_sort(cellStructs(col(vecCol), index.centroids))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        VecFns.norm(col(vecCol)).as("qn"),
        slice(transform(probes, p => p.getField("cid")), 1, nprobe).as("cells"))
      .withColumn("cell", explode(col("cells"))).drop("cells")
    val scored = cells.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        when(col("qn") === 0.0 || col("cn") === 0.0, lit(0.0))
          .otherwise(VecFns.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cosine"))
    topKByScore(scored, k)
  }

  /** Product-quantization index: per subspace j, code id → centroid
    * subvector. With m subspaces of ksub codes each, a corpus vector
    * compresses to m small ints — at 100 TB the difference between an
    * index that fits executor memory (m bytes/vector) and one that
    * doesn't (4·dim bytes/vector). Trained like the IVF coarse
    * quantizer: deterministic Lloyd's per subspace (no RNG; iters=0 →
    * codebooks are the ksub lowest-id subvectors, fully derivable in
    * the SQL oracle).
    */
  final case class PqIndex(dsub: Int, codebooks: Seq[Seq[(Int, Seq[Double])]])

  /** Train per-subspace codebooks by reusing the IVF trainer on each
    * dim/m-wide slice of the embedding column — m small k-means runs,
    * each collecting only ksub×dsub centroid sums to the driver.
    */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int, ksub: Int, iters: Int = 0): PqIndex = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val codebooks = (0 until m).map { j =>
      val sub = corpus.select(col(idCol),
        slice(col(vecCol), j * dsub + 1, dsub).as("__sub"))
      ivfTrain(sub, idCol, "__sub", nlist = ksub, iters = iters).centroids
    }
    PqIndex(dsub, codebooks)
  }

  /** Encode each vector as its m nearest-subspace-centroid code ids
    * (`__codes` array<int>, ties → lowest code id) — pure codegen
    * expressions over one scan, the codebooks are plan literals.
    */
  def pqEncode(df: DataFrame, vecCol: String, index: PqIndex): DataFrame =
    df.withColumn("__codes", array(index.codebooks.zipWithIndex.map {
      case (cb, j) =>
        array_min(cellStructs(
          slice(col(vecCol), j * index.dsub + 1, index.dsub), cb))
          .getField("cid")
    }: _*))

  /** PQ top-k by asymmetric-distance computation (ADC): the corpus is
    * encoded ONCE to m-byte codes; each query computes one distance
    * table per subspace (ksub entries, the codebooks are literals); a
    * candidate's approximate distance is m table lookups summed —
    * dim/m-fold less arithmetic per pair than the exact dot product,
    * over a corpus that never materializes its float vectors past the
    * encode. Composable with [[assignCells]] for IVF-PQ (probe cells
    * first, ADC within). Ties → lowest neighbor id, like every Ann
    * entry point.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int, index: PqIndex): DataFrame = {
    val m = index.codebooks.size
    val enc = pqEncode(corpus, vecCol, index)
      .select(col(idCol).as("neighbor_id"), col("__codes"))
    val q = queries.select(col(idCol).as("query_id") +:
      index.codebooks.zipWithIndex.map { case (cb, j) =>
        val sub = slice(col(vecCol), j * index.dsub + 1, index.dsub)
        // positional table: entry c (1-based c+1) is the distance to
        // code id c — codebook ids are 0..ksub-1 by construction
        array(cb.sortBy(_._1).map { case (_, cv) => distSqTo(sub, cv) }: _*)
          .as(s"__dt$j")
      }: _*)
    val adc = (0 until m)
      .map(j => element_at(col(s"__dt$j"), col("__codes")(j) + 1))
      .reduce(_ + _)
    val scored = enc.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("__d"))
      // TopKAgg's total order is score DESC, id ASC; ADC wants distance
      // ASC — negate in, negate back out
      .select(col("query_id"), col("neighbor_id"), negate(col("__d")).as("cosine"))
    topKByScore(scored, k)
      .select(col("query_id"), col("neighbor_id"),
        negate(col("cosine")).as("adc_dist"), col("rank"))
  }
}
