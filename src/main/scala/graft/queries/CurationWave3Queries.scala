package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{SimFns, SketchFns, TextAnalysisFns}
import graft.operators.{Ann, Dedup}

/** Curation wave 3: the selection / compression / linkage operators a
  * training-data pipeline runs after the dedup and retrieval stages —
  *
  *  - SQ8 compressed-corpus ANN (`ann_topk_sq`): search against int8
  *    scalar-quantized vectors, the 4× index-memory compressor,
  *  - cluster-balanced sampling (`sample_cluster_balanced`): per-IVF-cell
  *    quotas, the diversity-preserving downsampler,
  *  - pseudo-relevance-feedback query expansion
  *    (`retrieval_prf_expansion`): RM1-style term weights from the BM25
  *    top docs,
  *  - winnowing fingerprints (`text_winnowing`): the MOSS local
  *    fingerprinting scheme (Schleimer et al., SIGMOD '03),
  *  - blocked entity resolution (`er_entity_resolution`): block → fuzzy
  *    match → connected components, the record-linkage skeleton.
  *
  * Every query is exact cross-engine: integer/hash arithmetic where
  * possible, and where doubles appear (cosines, BM25 fractions, lev
  * ratios) the fold order is pinned on both sides.
  */
object CurationWave3Queries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  /** Winnowing char-gram size and window (Schleimer et al. §4: guarantee
    * = any match of length ≥ K + W − 1 shares a fingerprint).
    */
  private val WinK = 8
  private val WinW = 4

  val defs: Seq[QueryDef] = Seq(

    // SQ8 ANN: top-5 neighbors for the first 10 query vectors, scored
    // against the int8-quantized corpus reconstruction (asymmetric
    // distance — full-precision query, compressed corpus). The codes
    // column is what a 100 TB index stores (4× smaller than float32);
    // quantize + reconstruct + dot all run in one codegen projection.
    // The oracle replays the same quantizer (scale 127/max|x|, codes
    // round(x·s) — round-to-nearest, ties away from zero, identical in
    // Spark and DuckDB) and the engine-standard cosine fold, so even the
    // lossy scores are hash-exact.
    QueryDef("ann_topk_sq", (s, dir) => {
      val emb = t("embeddings")(s, dir)
      Ann.sqTopK(emb.where(col("vec_id") < 10), emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }, Some(s"""
      WITH qz AS (
        SELECT vec_id, embedding AS v,
               list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))) AS m
        FROM embeddings),
      sc AS (
        SELECT vec_id, v,
               CASE WHEN m = 0.0 THEN 0.0 ELSE 127.0 / m END AS scale
        FROM qz),
      rec AS (
        SELECT vec_id AS neighbor_id,
               list_transform(v, x -> CASE WHEN scale = 0.0 THEN 0.0
                 ELSE CAST(CAST(round(CAST(x AS DOUBLE) * scale) AS BIGINT)
                        AS DOUBLE) / scale END) AS rv
        FROM sc)
      SELECT q.vec_id AS query_id, r.neighbor_id,
             ${Sql.cosine("q.embedding", "r.rv")} AS cosine,
             CAST(row_number() OVER (PARTITION BY q.vec_id
               ORDER BY ${Sql.cosine("q.embedding", "r.rv")} DESC, r.neighbor_id)
               AS INT) AS rank
      FROM embeddings q JOIN rec r ON q.vec_id < 10 AND r.neighbor_id <> q.vec_id
      QUALIFY rank <= 5
      ORDER BY query_id, rank""")),

    // Cluster-balanced sampling: assign every vector to its iteration-0
    // IVF cell (centroids = the 8 lowest-id embeddings — the same
    // SQL-derivable device as dedup_semantic), then keep a per-cell
    // quota of 16 chosen by md5 hash order — the diversity-preserving
    // downsample (cap dominant clusters, keep rare ones whole). The
    // quota selection is a bounded TopKAgg per cell (score = −hash52,
    // exact in double below 2^52), NOT a row_number window — the shuffle
    // carries O(cells × quota), never a per-cell sort of the corpus.
    QueryDef("sample_cluster_balanced", (s, dir) => {
      val emb = t("embeddings")(s, dir)
      val index = CorpusFronts.ivfIndex(s, dir, nlist = 8)
      val cells = Ann.assignCells(emb, "embedding", index)
        .select(col("vec_id"), col("cell"))
      val sel = cells.groupBy(col("cell"))
        .agg(graft.expressions.TopKAgg.topK(
          struct((-SketchFns.hash52(
              concat(lit("cbal:"), col("vec_id").cast("string")))).cast("double"),
            col("vec_id").cast("long")), 16).as("__top"))
        .select(col("cell"), posexplode(col("__top")).as(Seq("__pos", "__e")))
        .select(col("cell"), col("__e.id").as("vec_id"),
          (col("__pos") + 1).cast("int").as("rk"))
      val sizes = cells.groupBy(col("cell")).agg(count(lit(1)).as("n_cell"))
      sel.join(broadcast(sizes), Seq("cell"))
        .select(col("vec_id"), col("cell").cast("int").as("cell"),
          col("rk"), col("n_cell"))
        .orderBy(col("vec_id"))
    }, Some {
      // ||v−c||² operation tree identical to Ann.distSqTo
      def distSq(v: String, c: String): String =
        s"(${Sql.dot(v, v)} - 2.0 * ${Sql.dot(v, c)} + ${Sql.dot(c, c)})"
      s"""
      WITH cent AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
               CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
        QUALIFY row_number() OVER (ORDER BY vec_id) <= 8),
      corp AS (SELECT vec_id, embedding AS v FROM embeddings),
      assign AS (
        SELECT corp.vec_id, cent.cid,
               row_number() OVER (PARTITION BY corp.vec_id
                 ORDER BY ${distSq("corp.v", "cent.cv")}, cent.cid) AS rn
        FROM corp CROSS JOIN cent),
      cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
      rk AS (
        SELECT vec_id, cell,
               CAST(row_number() OVER (PARTITION BY cell
                 ORDER BY ${Sql.hash52("'cbal:' || CAST(vec_id AS VARCHAR)")},
                          vec_id) AS INT) AS rk,
               CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS n_cell
        FROM cells)
      SELECT vec_id, CAST(cell AS INT) AS cell, rk, n_cell
      FROM rk WHERE rk <= 16 ORDER BY vec_id"""
    }),

    // Pseudo-relevance-feedback query expansion (RM1 relevance-model
    // weights, Lavrenko & Croft '01): take the BM25 top-10 docs for the
    // standing two-term query, weight every candidate term by
    // Σ_d tf(t,d)/|d| over those docs, emit the top 15 (original query
    // terms excluded). The per-term sum is an ORDERED fold over the
    // (doc_id-sorted) per-doc fractions — collect-sort-fold on the
    // engine side, list(… ORDER BY doc_id) + list_reduce in the oracle —
    // so the doubles are bit-identical despite being a float sum over a
    // group. Everything after the BM25 leg is bounded by the 10
    // pseudo-relevant docs: the candidate vocabulary, the ranking
    // window, and the output are all constant-sized at any corpus scale.
    QueryDef("retrieval_prf_expansion", (s, dir) => {
      val docs = t("documents")(s, dir).select(col("doc_id"), col("text"))
      val top = RetrievalQueries.bm25ScoresCached(s, dir)
        .groupBy().agg(graft.expressions.TopKAgg.topK(
          struct(col("score"), col("doc_id").cast("long").as("id")), 10).as("__top"))
        .select(explode(col("__top")).as("__e"))
        .select(col("__e.id").as("doc_id"))
      val toks = docs.join(broadcast(top), Seq("doc_id"))
        .select(col("doc_id"),
          explode(TextAnalysisFns.tokens(col("text"))).as("term"))
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val frac = toks.where(!col("term").isin("table", "spark"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .join(dl, Seq("doc_id"))
        .select(col("term"), col("doc_id"),
          (col("tf").cast("double") / col("dl").cast("double")).as("fr"))
      val weighted = frac.groupBy(col("term")).agg(
        count(lit(1)).as("n_docs"),
        aggregate(
          sort_array(collect_list(struct(col("doc_id"), col("fr")))),
          lit(0.0), (a, e) => a + e.getField("fr")).as("w"))
      weighted
        .withColumn("rank", row_number()
          .over(Window.orderBy(col("w").desc, col("term"))).cast("int"))
        .where(col("rank") <= 15)
        .select(col("rank"), col("term"), col("w"), col("n_docs"))
        .orderBy(col("rank"))
    }, Some(s"""
      WITH ${RetrievalQueries.bm25Sc2Ctes},
      top10 AS (SELECT doc_id FROM sc2
                QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 10),
      ttoks AS (SELECT toks.doc_id, toks.term
                FROM toks JOIN top10 USING (doc_id)),
      tdl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
              FROM ttoks GROUP BY 1),
      etf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM ttoks WHERE term NOT IN ('table', 'spark') GROUP BY 1, 2),
      efr AS (SELECT term, etf.doc_id,
                     CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE) AS fr
              FROM etf JOIN tdl USING (doc_id)),
      ew AS (SELECT term, CAST(count(*) AS BIGINT) AS n_docs,
                    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list(fr ORDER BY doc_id)), (a, x) -> a + x) AS w
             FROM efr GROUP BY term),
      r AS (SELECT term, n_docs, w,
                   CAST(row_number() OVER (ORDER BY w DESC, term) AS INT) AS rank
            FROM ew)
      SELECT rank, term, w, n_docs FROM r WHERE rank <= 15 ORDER BY rank""")),

    // Winnowing fingerprints (k=8 char grams, window w=4): every
    // w-window of consecutive gram hashes contributes its minimum
    // (rightmost on ties), consecutive re-selections dedupe — the MOSS
    // guarantee that any shared substring of length ≥ k+w−1 shares a
    // fingerprint, at ~2/(w+1) the density of full gram hashing. The
    // whole scheme is ONE narrow codegen projection per document
    // (O(len·w) integer work, no shuffle); the output pins the count
    // AND the order-sensitive fold hash of the selected gram hashes.
    // NB the oracle is row-exploded (unnest + window argmin), NOT the
    // engine's nested higher-order-function shape: DuckDB 1.0 returns
    // batch-dependent results for a list_reduce nested inside a
    // list_transform lambda (same row, different answer at 1 vs 3 input
    // rows — verified against an independent Python reference, which
    // the engine matches). Keep reduce-inside-transform out of oracles.
    QueryDef("text_winnowing", (s, dir) => {
      val txt = col("text")
      val nGrams = greatest(length(txt) - lit(WinK - 1), lit(0))
      val hs = when(nGrams === 0, array().cast("array<bigint>"))
        .otherwise(transform(sequence(lit(1), nGrams),
          i => SketchFns.hash32(txt.substr(i, lit(WinK)))))
      // if 0 < n < w the whole doc is one window; n = 0 → no windows
      val nw = greatest(nGrams - lit(WinW - 1), least(nGrams, lit(1)))
      val initSel = struct(lit(Long.MaxValue).as("h"), lit(0).as("p"))
      val win = when(nw === 0,
          array().cast("array<struct<h:bigint,p:int>>"))
        .otherwise(transform(sequence(lit(1), nw), j =>
          aggregate(sequence(lit(0), least(lit(WinW - 1), col("__n") - j)),
            initSel, (acc, o) => {
              val p = j + o
              val h = element_at(col("__hs"), p)
              when(h <= acc.getField("h"), struct(h.as("h"), p.as("p")))
                .otherwise(acc)
            })))
      val initFp = struct(lit(0).as("lastp"), lit(0L).as("nfp"), lit(0L).as("fh"))
      val st = aggregate(col("__win"), initFp, (acc, e) =>
        when(e.getField("p") =!= acc.getField("lastp"),
          struct(e.getField("p").as("lastp"),
            (acc.getField("nfp") + 1L).as("nfp"),
            ((acc.getField("fh") * 31L + e.getField("h")) % 1000000007L).as("fh")))
          .otherwise(acc))
      t("documents")(s, dir)
        .select(col("doc_id"), txt, nGrams.as("__n"), hs.as("__hs"))
        .withColumn("__win", win)
        .select(col("doc_id"), col("__n").cast("long").as("n_grams"),
          st.getField("nfp").as("n_fp"), st.getField("fh").as("fp_hash"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH g AS (
        SELECT doc_id,
               list_transform(generate_series(1, greatest(length(text) - ${WinK - 1}, 0)),
                 i -> ${Sql.hash32(s"substr(text, CAST(i AS INT), $WinK)")}) AS hs
        FROM documents),
      w AS (SELECT doc_id, hs, len(hs) AS n,
                   greatest(len(hs) - ${WinW - 1}, least(len(hs), 1)) AS nw
            FROM g),
      gr AS (SELECT doc_id, nw, unnest(hs) AS h,
                    unnest(generate_series(1, len(hs))) AS p
             FROM w),
      wj AS (SELECT doc_id, h, p,
                    unnest(generate_series(greatest(p - ${WinW - 1}, 1),
                                           least(p, nw))) AS j
             FROM gr),
      selr AS (SELECT doc_id, j, h, p,
                      row_number() OVER (PARTITION BY doc_id, j
                        ORDER BY h, p DESC) AS rn
               FROM wj),
      ded AS (SELECT doc_id, j, h, p,
                     lag(p) OVER (PARTITION BY doc_id ORDER BY j) AS pp
              FROM selr WHERE rn = 1),
      fp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list(h ORDER BY j)),
                      (a, x) -> (a * 31 + x) % 1000000007) AS fp_hash
             FROM ded WHERE pp IS NULL OR pp <> p GROUP BY doc_id)
      SELECT w.doc_id, CAST(w.n AS BIGINT) AS n_grams,
             coalesce(fp.n_fp, 0) AS n_fp,
             coalesce(fp.fp_hash, 0) AS fp_hash
      FROM w LEFT JOIN fp USING (doc_id) ORDER BY doc_id""")),

    // Blocked entity resolution over part names: dedupe to distinct
    // names (entity candidates), block on the last name token, fuzzy
    // edges at Levenshtein ratio ≥ 75 within a block, connected
    // components → entity id (= lowest member name_id). The
    // record-linkage skeleton: blocking bounds the pair volume (never
    // all-pairs — only same-block name pairs are scored), the fuzzy
    // score is the engine's proven-exact levRatio, and the closure is
    // Dedup.components (driver union-find under 10M edges, distributed
    // label propagation beyond). The oracle replays the closure as a
    // recursive CTE over the same edge set.
    QueryDef("er_entity_resolution", (s, dir) => {
      val names = t("part")(s, dir)
        .groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("name_id"), count(lit(1)).as("n_parts"))
      val blocked = names
        .withColumn("blk", element_at(split(col("p_name"), " "), -1))
      val pairs = blocked.as("a")
        .join(blocked.as("b"),
          col("a.blk") === col("b.blk") && col("a.name_id") < col("b.name_id"))
        .where(SimFns.levRatio(col("a.p_name"), col("b.p_name")) >= 75.0)
        .select(col("a.name_id").as("id_a"), col("b.name_id").as("id_b"))
      val comp = Dedup.components(pairs)
      names.join(comp, col("name_id") === col("id"), "left")
        .select(col("p_name"), col("name_id"),
          coalesce(col("keep_id"), col("name_id")).as("entity_id"),
          col("n_parts"))
        .orderBy(col("name_id"))
    }, Some(s"""
      WITH RECURSIVE names AS (
        SELECT p_name, min(p_partkey) AS name_id,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY p_name),
      b AS (SELECT p_name, name_id, n_parts,
                   str_split(p_name, ' ')[-1] AS blk
            FROM names),
      edges AS (
        SELECT a.name_id AS ia, b.name_id AS ib
        FROM b a JOIN b b ON a.blk = b.blk AND a.name_id < b.name_id
        WHERE ${Sql.levRatio("a.p_name", "b.p_name")} >= 75.0),
      und AS (SELECT ia, ib FROM edges UNION SELECT ib, ia FROM edges),
      reach(id, r) AS (
        SELECT name_id, name_id FROM b
        UNION
        SELECT reach.id, und.ib FROM reach JOIN und ON und.ia = reach.r),
      ent AS (SELECT id, min(r) AS entity_id FROM reach GROUP BY id)
      SELECT n.p_name, n.name_id, e.entity_id, n.n_parts
      FROM b n JOIN ent e ON e.id = n.name_id
      ORDER BY name_id"""))
  )
}
