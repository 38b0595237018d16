package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.MmrSelect
import graft.operators.Ann

/** Hybrid retrieval wave: the two ranking combinators a serving-side
  * retrieval (or training-data selection) stack runs on top of the
  * existing sparse (BM25) and dense (cosine ANN) legs —
  *
  *  - reciprocal-rank fusion of the two legs' top-k lists (the standard
  *    hybrid-search merge; Cormack et al. '09), and
  *  - greedy maximal-marginal-relevance diversity rerank of a dense
  *    candidate set (Carbonell & Goldstein '98 — also the dedup-aware
  *    "pick diverse examples" selection step in data curation).
  *
  * Both operate on BOUNDED candidate sets (legs are already top-k), so
  * every plan here is constant work after the leg queries: fusion joins
  * two ≤k-row sides; MMR is one bounded scalar expression per query. At
  * 100 TB the corpus appears only inside the legs (which have their own
  * scale paths — TopKAgg bounded aggregates, LSH/IVF blocking); the
  * combinators never touch it.
  */
object HybridRetrievalQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  /** Unrolled greedy-MMR step CTEs for the oracle: `pick1`/`seld1` then
    * `pick_i`/`seld_i` for i = 2..k — each step one `ORDER BY marginal
    * DESC, doc_id LIMIT 1` over the not-yet-selected candidates, with
    * `max(s)`-to-selected from the pairwise `sim` CTE. Unrolling (vs a
    * recursive CTE) keeps the oracle on the most portable SQL subset; the
    * weights are the literal 0.7/0.3 pair the engine embeds (never 1−λ).
    */
  private def mmrStepCtes(k: Int): String = {
    val first = s"""
      pick1 AS MATERIALIZED (SELECT doc_id, rel, rel AS marginal
                FROM cand ORDER BY rel DESC, doc_id LIMIT 1),
      seld1 AS MATERIALIZED (SELECT doc_id FROM pick1)"""
    val rest = (2 to k).map { i => s"""
      pick$i AS MATERIALIZED (
        SELECT c.doc_id, c.rel,
               0.7 * c.rel - 0.3 * (SELECT max(s) FROM sim
                                    WHERE ia = c.doc_id
                                      AND ib IN (SELECT doc_id FROM seld${i - 1})) AS marginal
        FROM cand c
        WHERE c.doc_id NOT IN (SELECT doc_id FROM seld${i - 1})
        ORDER BY marginal DESC, c.doc_id LIMIT 1),
      seld$i AS MATERIALIZED (SELECT doc_id FROM seld${i - 1} UNION ALL SELECT doc_id FROM pick$i)"""
    }
    (first +: rest).mkString(",")
  }

  val defs: Seq[QueryDef] = Seq(

    // Reciprocal-rank fusion (k0 = 60) of the BM25 top-50 and the dense
    // cosine top-50 for query vector 0. Each leg is rank-only (floats
    // feed ranks, never cross-engine float arithmetic beyond the legs'
    // proven-exact scores); the fused score 1/(60+r_dense) + 1/(60+r_sparse)
    // is division and addition of small exact integers in FIXED order —
    // IEEE-identical in both engines. The final row_number window runs
    // over ≤100 rows (the union of two top-50s — bounded by construction,
    // NOT data-sized), so the single-partition sort is O(1) at any corpus
    // scale.
    QueryDef("retrieval_rrf_fusion", (s, dir) => {
      val emb = t("embeddings")(s, dir)
      val dense = Ann.bruteForceTopK(emb.where(col("vec_id") === 0), emb,
          "vec_id", "embedding", 50)
        .select(col("neighbor_id").as("doc_id"), col("rank").as("rank_dense"))
      val sparse = RetrievalQueries.bm25ScoresCached(s, dir)
        .groupBy().agg(graft.expressions.TopKAgg.topK(
          struct(col("score"), col("doc_id").cast("long").as("id")), 50).as("__top"))
        .select(posexplode(col("__top")).as(Seq("__pos", "__e")))
        .select(col("__e.id").as("doc_id"),
          (col("__pos") + 1).cast("int").as("rank_sparse"))
      val fused = dense.join(sparse, Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60.0) + col("rank_dense").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("rank_sparse").cast("double")), lit(0.0)))
      fused
        .withColumn("rank",
          row_number().over(Window.orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
        .where(col("rank") <= 20)
        .select(col("rank"), col("doc_id"), col("rank_dense"), col("rank_sparse"),
          col("rrf"))
        .orderBy(col("rank"))
    }, Some(s"""
      WITH ${RetrievalQueries.bm25Sc2Ctes},
      sparse AS (SELECT doc_id, score,
                        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank_sparse
                 FROM sc2 QUALIFY rank_sparse <= 50),
      q0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      d0 AS (SELECT CAST(c.vec_id AS BIGINT) AS doc_id,
                    ${Sql.cosine("qv", "c.embedding")} AS cosine
             FROM embeddings c, q0 WHERE c.vec_id <> 0),
      dense AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INT) AS rank_dense
                FROM d0 QUALIFY rank_dense <= 50),
      f AS (SELECT doc_id, rank_dense, rank_sparse,
                   coalesce(1.0 / (60.0 + CAST(rank_dense AS DOUBLE)), 0.0)
                 + coalesce(1.0 / (60.0 + CAST(rank_sparse AS DOUBLE)), 0.0) AS rrf
            FROM dense FULL OUTER JOIN (SELECT doc_id, rank_sparse FROM sparse) sp
            USING (doc_id)),
      r AS (SELECT f.*, CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank
            FROM f)
      SELECT rank, doc_id, rank_dense, rank_sparse, rrf
      FROM r WHERE rank <= 20 ORDER BY rank""")),

    // Greedy MMR (λ=0.7, μ=0.3, k=10) over the dense top-20 for query
    // vector 0: step 1 takes the most relevant candidate, each later step
    // argmax(0.7·rel − 0.3·maxSim-to-selected), ties to the lowest id.
    // The selection runs inside ONE bounded scalar expression
    // (MmrSelect) on the per-query collected candidate list — O(k²·dim)
    // constant work per query, shuffle O(queries×k×dim); the oracle
    // unrolls the same 10 argmax steps as chained CTEs.
    QueryDef("retrieval_mmr_rerank", (s, dir) => {
      val emb = t("embeddings")(s, dir)
      val cand = Ann.bruteForceTopK(emb.where(col("vec_id") === 0), emb,
          "vec_id", "embedding", 20)
        .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding")),
          Seq("neighbor_id"))
      cand.groupBy(col("query_id"))
        .agg(collect_list(struct(col("neighbor_id").cast("long").as("id"),
          col("cosine").as("rel"), col("embedding").as("vec"))).as("cs"))
        .select(explode(MmrSelect(col("cs"), k = 10, lambda = 0.7, mu = 0.3)).as("e"))
        .select(col("e.pos").as("pos"), col("e.doc_id").as("doc_id"),
          col("e.rel").as("rel"), col("e.marginal").as("marginal"))
        .orderBy(col("pos"))
    }, Some {
      val selects = (1 to 10).map { i =>
        s"SELECT $i AS pos, doc_id, rel, marginal FROM pick$i"
      }.mkString(" UNION ALL ")
      s"""
      WITH q0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      c0 AS (SELECT CAST(c.vec_id AS BIGINT) AS doc_id,
                    ${Sql.cosine("qv", "c.embedding")} AS rel,
                    c.embedding AS v
             FROM embeddings c, q0 WHERE c.vec_id <> 0),
      cand AS MATERIALIZED (SELECT doc_id, rel, v FROM c0
               QUALIFY row_number() OVER (ORDER BY rel DESC, doc_id) <= 20),
      sim AS MATERIALIZED (SELECT a.doc_id AS ia, b.doc_id AS ib,
                     ${Sql.cosine("a.v", "b.v")} AS s
              FROM cand a JOIN cand b ON a.doc_id <> b.doc_id),
      ${mmrStepCtes(10)}
      SELECT CAST(pos AS INT) AS pos, doc_id, rel, marginal
      FROM ($selects) ORDER BY pos"""
    }))
}
