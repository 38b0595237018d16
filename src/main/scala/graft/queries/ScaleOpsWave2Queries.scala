package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysisFns
import graft.operators.{Ann, IncrementalAgg, Skew}

/** Round-6 scale-ops wave 2: the skew-mitigation and incremental-
  * maintenance operators get correctness-gate coverage. Each query's
  * oracle is the PLAIN relational form — the whole point of these
  * rewrites is result-identity under a different (skew/delta-robust)
  * physical shape, so "salted ≡ plain" / "incremental ≡ recompute" is
  * exactly the property the gate should pin.
  */
object ScaleOpsWave2Queries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // Two-phase salted aggregation (Skew.saltedAggregate): partial agg on
    // (key, salt) spreads a hot key across 16 reducers, final agg merges
    // the partials. Decimal sums keep both phases associative-exact, so
    // the result is bit-identical to the one-phase GROUP BY the oracle
    // runs. At 100 TB this is the fallback when ONE key dominates a
    // groupBy and even map-side combine leaves a single hot reducer.
    QueryDef("skew_salted_agg", (s, dir) => {
      Skew.saltedAggregate(t("events")(s, dir), Seq("event_type"), 16)(
          partial = Seq(
            count(lit(1)).as("__n"),
            sum(col("value").cast("decimal(12,2)")).as("__sv")),
          fin = Seq(
            sum(col("__n")).as("n_events"),
            sum(col("__sv")).cast("double").as("total_value")))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // Salted equi-join (Skew.saltedJoin): fact rows get a deterministic
    // salt, the non-broadcastable dim is replicated saltFactor ways, and
    // the join key widens to (key, salt) — a hot part key spreads over 8
    // reducers instead of stalling one. Result ≡ the plain join; the
    // oracle runs the plain join. (When the dim DOES fit in memory,
    // broadcast beats salting — this is the middle regime: dim too big
    // to broadcast, fact skewed on the key.)
    QueryDef("skew_salted_join", (s, dir) => {
      val fact = t("lineitem")(s, dir)
        .select(col("l_partkey").as("partkey"),
          col("l_quantity").cast("decimal(12,2)").as("qty"))
      val dim = t("part")(s, dir)
        .select(col("p_partkey").as("partkey"), col("p_brand"))
      Skew.saltedJoin(fact, dim, "partkey", 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("qty")).cast("double").as("sum_qty"))
        .orderBy(col("p_brand"))
    }, Some("""
      SELECT p_brand, count(*) AS n_lines,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""")),

    // Incremental aggregate maintenance (IncrementalAgg.applyDelta): a
    // standing per-user aggregate (events with event_id % 4 <> 3) folded
    // with a delta batch's partial aggregate (the % 4 = 3 slice) — one
    // small hash agg over the delta plus one key-keyed outer join, never
    // a rescan of history. The oracle recomputes from scratch over ALL
    // events; merged ≡ recomputed is the materialized-view invariant.
    QueryDef("incremental_agg_merge", (s, dir) => {
      val ev = t("events")(s, dir)
        .select(col("event_id"), col("user_id"),
          col("value").cast("decimal(12,2)").as("v"))
      def aggOf(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("user_id")).agg(
          count(lit(1)).as("n_events"),
          sum(col("v")).as("total_value"),
          max(col("v")).as("max_value"))
      val standing = aggOf(ev.where(col("event_id") % 4 =!= 3))
      val delta    = aggOf(ev.where(col("event_id") % 4 === 3))
      IncrementalAgg.applyDelta(standing, delta, Seq("user_id"),
          Map("n_events" -> IncrementalAgg.Add,
              "total_value" -> IncrementalAgg.Add,
              "max_value" -> IncrementalAgg.Max))
        .select(col("user_id"), col("n_events").cast("long").as("n_events"),
          col("total_value").cast("double").as("total_value"),
          col("max_value").cast("double").as("max_value"))
        .orderBy(col("user_id"))
    }, Some("""
      SELECT user_id, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
             CAST(max(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS max_value
      FROM events GROUP BY user_id ORDER BY user_id""")),

    // Product-quantization ANN (Ann.pqTopK), oracle-backed end to end
    // like ann_topk_ivf: iteration-0 codebooks (per subspace, the ksub
    // lowest-id subvectors — SQL-derivable; Lloyd-trained codebooks are
    // covered by the recall spec), m=4 subspaces of 16 dims, 8 codes
    // each. The corpus compresses to 4 code ids; a candidate's distance
    // is 4 table lookups instead of a 64-dim dot product — the memory/
    // compute compressor that makes a 100 TB vector index fit executors.
    QueryDef("ann_topk_pq", (s, dir) => {
      val emb = t("embeddings")(s, dir)
      val index = CorpusFronts.pqIndex(s, dir, m = 4, ksub = 8)
      Ann.pqTopK(emb.where(col("vec_id") < 10), emb, "vec_id", "embedding",
          k = 5, index)
        .orderBy(col("query_id"), col("rank"))
    }, Some {
      // ||v−c||² with the same operation tree as Ann.distSqTo
      def distSq(v: String, c: String): String =
        s"(${Sql.dot(v, v)} - 2.0 * ${Sql.dot(v, c)} + ${Sql.dot(c, c)})"
      s"""
      WITH corp AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
      sub AS (
        SELECT vec_id, j, (v)[j*16+1 : j*16+16] AS sv
        FROM corp CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) js),
      cb AS (SELECT j, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < 8),
      enc AS (
        SELECT s.vec_id, s.j, cb.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.j
                 ORDER BY ${distSq("s.sv", "cb.cv")}, cb.cid) AS rn
        FROM sub s JOIN cb ON cb.j = s.j),
      codes AS (SELECT vec_id, j, cid FROM enc WHERE rn = 1),
      perj AS (
        SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id, c.j,
               ${distSq("qs.sv", "cb.cv")} AS d
        FROM codes c
        JOIN cb ON cb.j = c.j AND cb.cid = c.cid
        JOIN sub qs ON qs.j = c.j AND qs.vec_id < 10
                   AND qs.vec_id <> c.vec_id),
      adc AS (
        SELECT query_id, neighbor_id,
               (max(d) FILTER (j = 0)) + (max(d) FILTER (j = 1))
               + (max(d) FILTER (j = 2)) + (max(d) FILTER (j = 3)) AS adc_dist
        FROM perj GROUP BY 1, 2)
      SELECT query_id, neighbor_id, adc_dist,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY adc_dist, neighbor_id) AS INT) AS rank
      FROM adc
      QUALIFY rank <= 5
      ORDER BY query_id, rank"""
    }),

    // Compression-ratio quality signal (CCNet/RefinedWeb-style): deflated
    // bytes / raw bytes per document, flagged against the prose band.
    // DEFLATE has no DuckDB scalar, so the oracle reads the deflate byte
    // counts from the committed fixture parquets — the GLOB unions every
    // per-SF fixture (regenerate with `runMain graft.tools.GenFixtures
    // <sfDir>` after a testdata refresh), and the (doc_id, text_md5) join
    // picks exactly the rows computed from THIS corpus's texts, so the
    // gate passes at any SF with a committed fixture and fails loudly
    // (dropped rows) at one without. A full hash gate instead of the
    // former rows-only check. The fixture pins stability; the SEMANTICS
    // (repetitive < prose < noise ordering, empty/null, codegen) stay
    // pinned by ExpressionsSpec. Ratio is ONE double division of two
    // exact integers in both engines — bit-identical.
    // Scale shape: one projection over the scan, no shuffle — the
    // cheapest quality cut a 100 TB curation pass runs first.
    QueryDef("text_compress_ratio", (s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_raw_bytes"),
          TextAnalysisFns.deflateLen(col("text")).cast("long").as("n_deflate_bytes"),
          TextAnalysisFns.compressRatio(col("text")).as("compress_ratio"))
        .withColumn("keep",
          col("compress_ratio") >= 0.25 && col("compress_ratio") <= 0.95)
        .orderBy(col("doc_id"))
    }, Some("""
      WITH f AS (SELECT DISTINCT doc_id, text_md5, n_deflate_bytes
                 FROM read_parquet('/root/repo/fixtures/compress_ratio_sf*.parquet')),
      m AS (
        SELECT d.doc_id, CAST(strlen(d.text) AS BIGINT) AS n_raw_bytes,
               f.n_deflate_bytes,
               CASE WHEN strlen(d.text) = 0 THEN 1.0
                    ELSE CAST(f.n_deflate_bytes AS DOUBLE) /
                         CAST(strlen(d.text) AS DOUBLE) END AS compress_ratio
        FROM documents d JOIN f
          ON d.doc_id = f.doc_id
         AND f.text_md5 = md5(coalesce(d.text, ''))) -- stale/wrong-SF fixture drops rows → loud row-count FAIL
      SELECT doc_id, n_raw_bytes, n_deflate_bytes, compress_ratio,
             compress_ratio >= CAST(0.25 AS DOUBLE) AND
             compress_ratio <= CAST(0.95 AS DOUBLE) AS keep
      FROM m ORDER BY doc_id"""))
  )
}
