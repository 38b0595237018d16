package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Ann

/** Round-6 eval/statistics wave: equi-depth histogram construction (the
  * ANALYZE-style optimizer statistic), int8 embedding quantization with a
  * fold-exact reconstruction error, ANN recall evaluation (approximate
  * index vs exact ground truth), and a three-step strict-sequence funnel
  * (MATCH_RECOGNIZE-shaped). Exactness: integer cum-threshold tests for
  * the histogram; single-op / ordered-fold float arithmetic everywhere
  * else.
  */
object EvalStatsQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  private val K = 8

  /** int8 quantization report per vector: scale 127/max|x|, codes
    * floor(x·s), reconstruction MSE via the sequential foldSum pattern.
    * Zero vectors → scale 0, all-zero codes, mse 0 (never divides by
    * zero). Pure elementwise projections — no shuffle.
    */
  private[graft] def quantizeInt8(df: org.apache.spark.sql.DataFrame,
                                  idCol: String, vecCol: String)
      : org.apache.spark.sql.DataFrame = {
    val v = col(vecCol)
    df
      .withColumn("m", array_max(transform(v, x => abs(x.cast("double")))))
      .withColumn("scale",
        when(col("m") === 0.0, lit(0.0)).otherwise(lit(127.0) / col("m")))
      .withColumn("codes", transform(v,
        x => round(x.cast("double") * col("scale")).cast("long")))
      .withColumn("sq", transform(expr(s"arrays_zip($vecCol, codes)"),
        e => {
          val err = e.getField(vecCol).cast("double") -
            when(col("scale") === 0.0, lit(0.0))
              .otherwise(e.getField("codes").cast("double") / col("scale"))
          err * err
        }))
      .select(col(idCol), col("scale"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("sum_codes"),
        array_max(col("codes")).as("max_code"),
        (aggregate(col("sq"), lit(0.0), (a, c) => a + c)
          / size(v)).as("mse"))
  }

  val defs: Seq[QueryDef] = Seq(

    // Equi-depth histogram of o_totalprice (cents grid), K = 8 buckets —
    // the statistic behind range partitioning and CBO selectivity. The
    // fact collapses map-side into a (cents, count) histogram; the
    // cumulative window and the K boundary probes run on the HISTOGRAM
    // (distinct values), never the fact — the stats_percentile_mode
    // pattern generalized to a full boundary vector. Boundaries are
    // cross-multiplied BIGINT tests (cum·K ≥ n·i ⇔ cum ≥ i·n/K), no
    // float: boundary_i is the smallest value covering quantile i/K.
    // The cumulative count is a DISTRIBUTED PREFIX SUM: the fact
    // collapses map-side into a ($10-bin, count) histogram; bins group
    // into contiguous shards of 256; within-shard cumsum is a window
    // PARTITIONED by shard (never a global window), and each shard's
    // global offset comes from a non-equi join over the |shards|-row
    // shard-total table (broadcast). The oracle computes the cum the
    // naive global way — matching hashes prove the decomposition.
    QueryDef("stats_equidepth_histogram", (s, dir) => {
      val hist = t("orders")(s, dir)
        // exact-integer binning: ×100 makes the decimal integral BEFORE
        // the cast (Spark truncates decimal→long, DuckDB rounds — on an
        // integral value they agree), then BIGINT division bins by $10
        .select(expr("CAST(o_totalprice * 100 AS BIGINT) DIV 1000").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      val inner = hist
        .withColumn("shard", expr("bin DIV 256"))
        .withColumn("icum", sum(col("cnt")).over(
          Window.partitionBy(col("shard")).orderBy(col("bin"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val stot = inner.groupBy(col("shard")).agg(sum(col("cnt")).as("scnt"))
      val offsets = stot.as("a")
        .join(broadcast(stot.as("b")), col("b.shard") < col("a.shard"), "left")
        .groupBy(col("a.shard").as("shard"))
        .agg(coalesce(sum(col("b.scnt")), lit(0L)).as("off"))
      val h2 = inner.join(broadcast(offsets), Seq("shard"))
        .select(col("bin"), (col("icum") + col("off")).as("cum"))
      val n = hist.agg(sum(col("cnt")).as("n"))
      val aggs = max(col("n")).as("__n") +: (1 to K).map(i =>
        min(when(col("cum") * K >= col("n") * i, col("bin"))).as(s"__b$i"))
      h2.crossJoin(broadcast(n))
        .agg(aggs.head, aggs.tail: _*)
        .select(explode(array((1 to K).map(i =>
          struct(lit(i).as("bucket"), col(s"__b$i").as("upper_bin"),
            col("__n").as("n_rows"))): _*)).as("r"))
        .select(col("r.bucket").as("bucket"),
          col("r.upper_bin").as("upper_bin"),
          col("r.n_rows").as("n_rows"))
        .orderBy(col("bucket"))
    }, Some(s"""
      WITH hist AS (
        SELECT CAST(o_totalprice * 100 AS BIGINT) // 1000 AS bin,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1),
      h2 AS (
        SELECT bin,
               CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER () AS BIGINT) AS n
        FROM hist),
      b AS (
        SELECT max(n) AS n_rows,
               ${(1 to K).map(i =>
                 s"min(CASE WHEN cum * $K >= n * $i THEN bin END) AS b$i")
                 .mkString(", ")}
        FROM h2)
      SELECT i AS bucket,
             CASE ${(1 to K).map(i => s"WHEN i = $i THEN b$i").mkString(" ")}
             END AS upper_bin, n_rows
      FROM b CROSS JOIN (SELECT unnest(generate_series(1, $K)) AS i) ii
      ORDER BY bucket""")),

    // int8 embedding quantization (the 4× memory compressor for vector
    // serving): per-vector scale 127/max|x|, codes round(x·s)
    // (round-to-nearest, ties away from zero — Spark round and DuckDB
    // round agree; floor would bias codes toward −∞ by half a step and
    // can emit −128 for the max-magnitude negative component) — pure
    // elementwise projections, no shuffle. The reconstruction MSE is a
    // SEQUENTIAL left fold over the element errors (the foldSum
    // pattern), so even the accumulated float error is bit-identical to
    // the oracle. Zero vectors quantize to scale 0 / mse 0 by contract.
    QueryDef("embed_quantize_int8", (s, dir) =>
      quantizeInt8(t("embeddings")(s, dir), "vec_id", "embedding")
        .orderBy(col("vec_id"))
    , Some(s"""
      WITH q AS (
        SELECT vec_id, embedding AS v,
               list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))) AS m
        FROM embeddings),
      sc AS (
        SELECT vec_id, v,
               CASE WHEN m = 0.0 THEN 0.0 ELSE 127.0 / m END AS scale
        FROM q),
      c AS (
        SELECT vec_id, v, scale,
               list_transform(v, x ->
                 CAST(round(CAST(x AS DOUBLE) * scale) AS BIGINT)) AS codes
        FROM sc),
      e AS (
        SELECT vec_id, scale, codes,
               list_transform(generate_series(1, len(v)), i ->
                 (CAST(v[i] AS DOUBLE) -
                   CASE WHEN scale = 0.0 THEN 0.0
                        ELSE CAST(codes[i] AS DOUBLE) / scale END) *
                 (CAST(v[i] AS DOUBLE) -
                   CASE WHEN scale = 0.0 THEN 0.0
                        ELSE CAST(codes[i] AS DOUBLE) / scale END)) AS sq,
               len(v) AS d
        FROM c)
      SELECT vec_id, scale,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
               (a, x) -> a + x) AS BIGINT) AS sum_codes,
             list_max(codes) AS max_code,
             ${Sql.foldSum("sq")} / d AS mse
      FROM e ORDER BY vec_id""")),

    // ANN recall@5: the LSH index's top-5 against the exact brute-force
    // top-5 per query — the evaluation loop every approximate index
    // ships with. Both paths are the engine's own operators (bounded
    // TopKAgg tails, bucket-pruned candidates); the intersection is an
    // equi-join on (query, neighbor), and queries the index misses
    // entirely still report (left join from the query set). The oracle
    // recomputes BOTH paths from scratch — ground truth and index —
    // so the recall numbers are pinned end to end.
    QueryDef("ann_recall_eval", (s, dir) => {
      val emb = t("embeddings")(s, dir)
      val q = emb.where(col("vec_id") < 10)
      val planeSets = Seq(
        Ann.deterministicPlanes(8, 64, seed = 1),
        Ann.deterministicPlanes(8, 64, seed = 2))
      val exact = Ann.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Ann.lshTopK(q, emb, "vec_id", "embedding", 5, planeSets)
        .select(col("query_id").as("ql"), col("neighbor_id").as("nl"))
      val hits = exact.join(approx,
          col("query_id") === col("ql") && col("neighbor_id") === col("nl"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
      q.select(col("vec_id").as("qid"))
        .join(hits, col("qid") === col("query_id"), "left")
        .select(col("qid").as("query_id"),
          coalesce(col("h"), lit(0L)).as("n_hits"),
          (coalesce(col("h"), lit(0L)) / lit(5.0)).as("recall"))
        .orderBy(col("query_id"))
    }, Some {
      val planeSets = Seq(
        Ann.deterministicPlanes(8, 64, seed = 1),
        Ann.deterministicPlanes(8, 64, seed = 2))
      def bucketSql(v: String, planes: Seq[Seq[Double]]): String =
        planes.zipWithIndex.map { case (p, i) =>
          val lit = p.map(_.toString).mkString("[", ", ", "]")
          s"CASE WHEN ${Sql.dot(v, s"CAST($lit AS DOUBLE[])")} >= 0.0 THEN ${1L << i} ELSE 0 END"
        }.mkString("(", " + ", ")")
      val b0q = bucketSql("q.embedding", planeSets(0))
      val b1q = bucketSql("q.embedding", planeSets(1))
      val b0c = bucketSql("c.embedding", planeSets(0))
      val b1c = bucketSql("c.embedding", planeSets(1))
      s"""
      WITH ex AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY ${Sql.cosine("q.embedding", "c.embedding")} DESC,
                            c.vec_id) AS rnk
          FROM embeddings q JOIN embeddings c
            ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
        WHERE rnk <= 5),
      ap AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY ${Sql.cosine("q.embedding", "c.embedding")} DESC,
                            c.vec_id) AS rnk
          FROM embeddings q JOIN embeddings c
            ON q.vec_id < 10 AND c.vec_id <> q.vec_id
           AND ($b0q = $b0c OR $b1q = $b1c))
        WHERE rnk <= 5),
      h AS (
        SELECT query_id, CAST(count(*) AS BIGINT) AS h
        FROM ex JOIN ap USING (query_id, neighbor_id) GROUP BY 1)
      SELECT qq.vec_id AS query_id,
             coalesce(h.h, 0) AS n_hits,
             coalesce(h.h, 0) / 5.0 AS recall
      FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) qq
      LEFT JOIN h ON h.query_id = qq.vec_id
      ORDER BY query_id"""
    }),

    // Three-step strict-sequence funnel (view → click → purchase, each
    // step strictly after the previous first occurrence) — the
    // MATCH_RECOGNIZE shape reduced to two conditional-min passes: each
    // step's table is the type-filtered events (filter pushes to the
    // scan), joined on the key and the previous step's timestamp, so no
    // per-user array materializes and no ordering window runs. A null
    // step timestamp falls through both joins and reports matched =
    // false.
    QueryDef("seq_pattern_match", (s, dir) => {
      val ev = t("events")(s, dir)
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"))
      val vc = v.join(c, col("user_id") === col("cu") && col("cts") > col("t1"),
          "left")
        .groupBy(col("user_id"), col("t1")).agg(min(col("cts")).as("t2"))
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pts"))
      vc.join(p, col("user_id") === col("pu") && col("pts") > col("t2"),
          "left")
        .groupBy(col("user_id"), col("t1"), col("t2"))
        .agg(min(col("pts")).as("t3"))
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          col("t3").isNotNull.as("matched"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      vc AS (
        SELECT v.user_id, v.t1, min(c.ts) AS t2
        FROM v LEFT JOIN events c
          ON c.user_id = v.user_id AND c.event_type = 'click' AND c.ts > v.t1
        GROUP BY v.user_id, v.t1),
      vcp AS (
        SELECT vc.user_id, vc.t1, vc.t2, min(p.ts) AS t3
        FROM vc LEFT JOIN events p
          ON p.user_id = vc.user_id AND p.event_type = 'purchase'
         AND p.ts > vc.t2
        GROUP BY vc.user_id, vc.t1, vc.t2)
      SELECT user_id, t1, t2, t3, t3 IS NOT NULL AS matched
      FROM vcp ORDER BY user_id""")),

    // Language-ID confusion matrix: the classifier-eval table for the
    // langid heuristic against the ground-truth `lang` label — per
    // (actual, predicted) cell counts plus the cell's share of its
    // actual-row total (one exact division). The matrix is |langs|²
    // rows at any corpus size; the heavy step is the same one-pass
    // codegen scoring text_langid pins row-by-row.
    QueryDef("eval_langid_confusion", (s, dir) => {
      val cells = t("documents")(s, dir)
        .select(col("lang").as("actual"),
          graft.functions.TextAnalysisFns.langId(col("text")).as("predicted"))
        .groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n"))
      val totals = cells.groupBy(col("actual")).agg(sum(col("n")).as("row_n"))
      cells.join(broadcast(totals), Seq("actual"))
        .select(col("actual"), col("predicted"), col("n"),
          (col("n").cast("double") / col("row_n")).as("share"))
        .orderBy(col("actual"), col("predicted"))
    }, Some {
      val toks = s"list_distinct(${Sql.tokens("lower(text)")})"
      val scores = graft.functions.TextAnalysisFns.LangMarkers.map { case (lang, ms) =>
        val arr = ms.map(m => s"'$m'").mkString("[", ", ", "]")
        s"len(list_intersect($toks, $arr)) AS s_$lang"
      }.mkString(", ")
      val langs = graft.functions.TextAnalysisFns.LangMarkers.map(_._1)
      val best  = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val cases = langs.map(l => s"WHEN s_$l = __best THEN '$l'").mkString(" ")
      s"""
      WITH sc AS (SELECT doc_id, lang, $scores FROM documents),
      b AS (SELECT *, $best AS __best FROM sc),
      pred AS (
        SELECT lang AS actual,
               CASE WHEN __best = 0 THEN 'und' $cases ELSE 'und' END AS predicted
        FROM b),
      cells AS (
        SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
        FROM pred GROUP BY 1, 2),
      rt AS (SELECT actual, CAST(sum(n) AS BIGINT) AS row_n
             FROM cells GROUP BY 1)
      SELECT c.actual, c.predicted, c.n,
             CAST(c.n AS DOUBLE) / rt.row_n AS share
      FROM cells c JOIN rt USING (actual)
      ORDER BY actual, predicted"""
    }),

    // Join-size estimation from per-key histograms — the CBO statistic,
    // verified in-result: predicted |A⋈B| on the partkey = Σ_k cnt(k)²
    // (exact BIGINT over the per-key histogram, no join executed), next
    // to the ACTUAL self-join cardinality — their equality in the
    // hash-checked row IS the estimator's exactness law. At 100 TB the
    // prediction costs one histogram aggregate; the actual join costs
    // the shuffle the prediction exists to avoid planning blind.
    QueryDef("profile_join_size", (s, dir) => {
      val li = t("lineitem")(s, dir)
        .where(col("l_orderkey") <= 6000)
        .select(col("l_partkey"))
      val hist = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      val predicted = hist.agg(sum(col("cnt") * col("cnt")).as("predicted_pairs"))
      val actual = li.as("a")
        .join(li.as("b"), col("a.l_partkey") === col("b.l_partkey"))
        .agg(count(lit(1)).as("actual_pairs"))
      predicted.crossJoin(actual)
    }, Some("""
      WITH li AS (SELECT l_partkey FROM lineitem WHERE l_orderkey <= 6000),
      h AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
            FROM li GROUP BY 1),
      p AS (SELECT CAST(sum(cnt * cnt) AS BIGINT) AS predicted_pairs FROM h),
      a AS (SELECT CAST(count(*) AS BIGINT) AS actual_pairs
            FROM li a JOIN li b ON a.l_partkey = b.l_partkey)
      SELECT * FROM p CROSS JOIN a""")),

    // ANN MRR evaluation: mean reciprocal rank of the TRUE nearest
    // neighbor (brute-force top-1) inside the LSH top-5 list — the
    // rank-sensitive companion to ann_recall_eval (recall says the
    // neighbor was found; MRR says WHERE). Reciprocals are single IEEE
    // divisions; the mean is a query_id-ORDERED sequential fold
    // (sort_array + aggregate ↔ list(… ORDER BY) + list_reduce), never
    // an unordered double sum across groups.
    QueryDef("ann_mrr_eval", (s, dir) => {
      val emb = t("embeddings")(s, dir)
      val q = emb.where(col("vec_id") < 10)
      val planeSets = Seq(
        Ann.deterministicPlanes(8, 64, seed = 1),
        Ann.deterministicPlanes(8, 64, seed = 2))
      val truth = Ann.bruteForceTopK(q, emb, "vec_id", "embedding", 1)
        .select(col("query_id"), col("neighbor_id").as("true_nn"))
      val approx = Ann.lshTopK(q, emb, "vec_id", "embedding", 5, planeSets)
        .select(col("query_id").as("ql"), col("neighbor_id").as("nl"),
          col("rank"))
      val rr = truth.join(approx,
          col("query_id") === col("ql") && col("true_nn") === col("nl"), "left")
        .select(col("query_id"),
          coalesce(lit(1.0) / col("rank").cast("double"), lit(0.0)).as("rr"))
      rr.agg(count(lit(1)).as("n_queries"),
          sort_array(collect_list(struct(col("query_id"), col("rr"))))
            .as("__arr"))
        .select(col("n_queries"),
          (aggregate(transform(col("__arr"), x => x.getField("rr")),
            lit(0.0), (a, v) => a + v) / col("n_queries").cast("double"))
            .as("mrr"))
    }, Some {
      val planeSets = Seq(
        Ann.deterministicPlanes(8, 64, seed = 1),
        Ann.deterministicPlanes(8, 64, seed = 2))
      def bucketSql(v: String, planes: Seq[Seq[Double]]): String =
        planes.zipWithIndex.map { case (p, i) =>
          val lit = p.map(_.toString).mkString("[", ", ", "]")
          s"CASE WHEN ${Sql.dot(v, s"CAST($lit AS DOUBLE[])")} >= 0.0 THEN ${1L << i} ELSE 0 END"
        }.mkString("(", " + ", ")")
      val b0q = bucketSql("q.embedding", planeSets(0))
      val b1q = bucketSql("q.embedding", planeSets(1))
      val b0c = bucketSql("c.embedding", planeSets(0))
      val b1c = bucketSql("c.embedding", planeSets(1))
      s"""
      WITH truth AS (
        SELECT query_id, neighbor_id AS true_nn FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY ${Sql.cosine("q.embedding", "c.embedding")} DESC, c.vec_id) AS rn
          FROM embeddings q JOIN embeddings c
            ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
        WHERE rn = 1),
      cand AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               q.embedding AS qv, c.embedding AS cv
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 10 AND c.vec_id <> q.vec_id
         AND ($b0q = $b0c OR $b1q = $b1c)),
      approx AS (
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY ${Sql.cosine("qv", "cv")} DESC, neighbor_id) AS INT) AS rank
        FROM cand QUALIFY rank <= 5),
      rr AS (
        SELECT t.query_id,
               coalesce(1.0e0 / CAST(a.rank AS DOUBLE), 0.0e0) AS rr
        FROM truth t LEFT JOIN approx a
          ON a.query_id = t.query_id AND a.neighbor_id = t.true_nn)
      SELECT CAST(count(*) AS BIGINT) AS n_queries,
             ${Sql.foldSum("list(rr ORDER BY query_id)")}
               / CAST(count(*) AS DOUBLE) AS mrr
      FROM rr"""
    }),

    // Dedup-LSH PRECISION evaluation — the other half of the banding
    // tradeoff (dedup_lsh_recall_eval audits recall): of the candidate
    // pairs the band join surfaces, how many survive the true-Jaccard
    // verify? Low precision means the verify stage (the expensive
    // per-pair Jaccard) is mostly wasted work and wants more bands/rows.
    // Counts exact; precision is the one division.
    QueryDef("dedup_lsh_precision_eval", (s, dir) => {
      import graft.functions.{SimFns, TextAnalysisFns}
      val docs = t("documents")(s, dir)
      val sh = docs.select(col("doc_id").as("id"),
          SimFns.wordShingles(TextAnalysisFns.tokens(col("text")), 3).as("grams"))
        .where(size(col("grams")) > 0)
      val banded = sh.select(col("id"), col("grams"),
        explode(graft.functions.HashFns.lshBandKeys(
          graft.functions.HashFns.minhashSignature(col("grams"), 8), 4, 2))
          .as("band"))
      val cand = banded.alias("a").join(banded.alias("b"),
          col("a.band") === col("b.band") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.grams").as("ga"), col("b.grams").as("gb"))
        .distinct()
      cand.agg(count(lit(1)).as("n_candidates"),
          sum(when(graft.expressions.JaccardGeq(col("ga"), col("gb"), 0.2), 1L)
            .otherwise(0L)).as("n_verified"))
        .select(col("n_candidates"), col("n_verified"),
          (col("n_verified").cast("double") / col("n_candidates").cast("double"))
            .as("precision"))
    }, Some {
      val toks = Sql.tokens("text")
      val sig  = Sql.minhashSignature("shingles", 8)
      val bandKeys = Sql.lshBandKeys("sig", 4, 2)
      s"""
      WITH sh AS (
        SELECT doc_id AS id, ${Sql.wordShingles(toks, 3)} AS shingles
        FROM documents),
      nz AS (SELECT * FROM sh WHERE len(shingles) > 0),
      sg AS (SELECT id, shingles, $sig AS sig FROM nz),
      banded AS (SELECT id, shingles, unnest($bandKeys) AS band FROM sg),
      cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b ON a.band = b.band AND a.id < b.id),
      v AS (
        SELECT c.id_a, c.id_b,
               CASE WHEN ${Sql.jaccard("x.shingles", "y.shingles")} >= 0.2
                    THEN 1 ELSE 0 END AS ok
        FROM cand c
        JOIN nz x ON x.id = c.id_a
        JOIN nz y ON y.id = c.id_b)
      SELECT CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(sum(ok) AS BIGINT) AS n_verified,
             CAST(sum(ok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS precision
      FROM v"""
    }),

    // Dedup-LSH recall evaluation: exact all-pairs ground truth (word
    // 3-shingle Jaccard ≥ 0.2 over a bounded doc subset — O(N²) BY
    // DESIGN, it's the ground truth) vs the MinHash-LSH pair set over
    // the same subset (the same 8-hash/4-band parameters as
    // dedup_minhash_lsh). The found set joins truth on pair ids — the
    // banding theory says recall ≈ 1 − (1 − J^r)^b, and this query is
    // how the parameter choice gets AUDITED instead of assumed. Counts
    // exact; recall is the one division.
    QueryDef("dedup_lsh_recall_eval", (s, dir) => {
      import graft.functions.{SimFns, TextAnalysisFns}
      val docs = t("documents")(s, dir).where(col("doc_id") < 800)
      val sh = docs.select(col("doc_id").as("id"),
          SimFns.wordShingles(TextAnalysisFns.tokens(col("text")), 3).as("grams"))
        .where(size(col("grams")) > 0)
      val truth = sh.alias("a").join(sh.alias("b"),
          col("a.id") < col("b.id") &&
            graft.expressions.JaccardGeq(col("a.grams"), col("b.grams"), 0.2))
        .select(col("a.id").as("ta"), col("b.id").as("tb"))
      val lsh = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text", 3, 8, 4, 0.2)
        .select(col("id_a"), col("id_b"))
      val found = truth.join(lsh,
        col("ta") === col("id_a") && col("tb") === col("id_b"))
      truth.agg(count(lit(1)).as("n_true")).crossJoin(
          found.agg(count(lit(1)).as("n_found")))
        .select(col("n_true"), col("n_found"),
          (col("n_found").cast("double") / col("n_true").cast("double"))
            .as("recall"))
    }, Some {
      val toks = Sql.tokens("text")
      val sig  = Sql.minhashSignature("shingles", 8)
      val bandKeys = Sql.lshBandKeys("sig", 4, 2)
      s"""
      WITH sh AS (
        SELECT doc_id AS id, ${Sql.wordShingles(toks, 3)} AS shingles
        FROM documents WHERE doc_id < 800),
      nz AS (SELECT * FROM sh WHERE len(shingles) > 0),
      truth AS (
        SELECT a.id AS ta, b.id AS tb
        FROM nz a JOIN nz b ON a.id < b.id
        WHERE ${Sql.jaccard("a.shingles", "b.shingles")} >= 0.2),
      sg AS (SELECT id, shingles, $sig AS sig FROM nz),
      banded AS (SELECT id, shingles, unnest($bandKeys) AS band FROM sg),
      cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b ON a.band = b.band AND a.id < b.id),
      lsh AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN nz x ON x.id = c.id_a
        JOIN nz y ON y.id = c.id_b
        WHERE ${Sql.jaccard("x.shingles", "y.shingles")} >= 0.2),
      f AS (SELECT count(*) AS n_found
            FROM truth t JOIN lsh l ON l.id_a = t.ta AND l.id_b = t.tb),
      tr AS (SELECT count(*) AS n_true FROM truth)
      SELECT CAST(tr.n_true AS BIGINT) AS n_true,
             CAST(f.n_found AS BIGINT) AS n_found,
             CAST(f.n_found AS DOUBLE) / CAST(tr.n_true AS DOUBLE) AS recall
      FROM tr CROSS JOIN f"""
    })
  )
}
