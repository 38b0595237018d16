package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{SimFns, SketchFns, TextAnalysisFns}
import graft.operators.IncrementalAgg

/** Round-6 scale-ops wave 3: prefix-filtered set-similarity join (the
  * PPJoin/AllPairs family — candidate generation that provably misses no
  * qualifying pair without comparing all pairs) and the HLL merge law
  * (sketch mergeability is THE property that makes sketches work on a
  * cluster: partial sketches combine losslessly).
  */
object ScaleOpsWave3Queries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // Prefix-filtered Jaccard similarity join at t = 0.9 over word-token
    // sets: under ANY fixed total token order, two sets with
    // J ≥ t MUST share a token within their first n − ⌈t·n⌉ + 1 tokens
    // (if the prefixes were disjoint, the ⌈t·n⌉-sized tails couldn't
    // overlap enough) — so an equi-join on exploded PREFIX tokens
    // generates a candidate superset with zero false negatives, and the
    // compiled JaccardGeq merge-scan verifies each candidate once.
    // Versus dedup_ngram_jaccard's block-join: no blocking key needed,
    // candidates scale with prefix-token collisions (production orders
    // tokens by ascending corpus frequency to shrink them further; the
    // lexicographic order here keeps the DuckDB mirror trivial and the
    // guarantee identical). ⌈9n/10⌉ is exact BIGINT ceil-division — the
    // prefix length never hangs on float rounding. Scoped to doc_id <
    // 1000 (the dedup_ngram_jaccard convention): the synthetic corpus
    // draws every doc from one tiny vocabulary, so nearly all pairs are
    // similar and candidate counts scale quadratically with corpus
    // size — the cap keeps the BENCH pair count representative of a
    // real corpus's collision rate rather than the degenerate one.
    QueryDef("dedup_jaccard_prefix", (s, dir) => {
      val base = t("documents")(s, dir)
        .where(col("doc_id") < 1000)
        .select(col("doc_id").as("id"),
          array_sort(array_distinct(TextAnalysisFns.tokens(col("text")))).as("toks"))
        .withColumn("n", size(col("toks")))
        .where(col("n") > 0)
        .withColumn("pref",
          slice(col("toks"), lit(1), expr("n - ((9*n + 9) div 10) + 1")))
        // pair work is per-PAIR: spread ids so one small input file does
        // not serialize every comparison through one task
        .repartition(col("id"))
        .cache()
      val pa = base.select(col("id").as("id_a"), explode(col("pref")).as("tok"))
      val pb = base.select(col("id").as("id_b"), explode(col("pref")).as("tok"))
      val pairs = pa.join(pb, Seq("tok"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      pairs
        .join(base.select(col("id").as("id_a"), col("toks").as("ta")), Seq("id_a"))
        .join(base.select(col("id").as("id_b"), col("toks").as("tb")), Seq("id_b"))
        .where(graft.expressions.JaccardGeq(col("ta"), col("tb"), 0.9))
        .select(col("id_a"), col("id_b"),
          SimFns.jaccard(col("ta"), col("tb")).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some(s"""
      WITH d AS (
        SELECT doc_id AS id, list_sort(list_distinct(${Sql.tokens("text")})) AS toks
        FROM documents WHERE doc_id < 1000),
      d2 AS (SELECT id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
      p AS (
        SELECT id, unnest(toks[1 : n - ((9*n + 9) // 10) + 1]) AS tok FROM d2),
      pairs AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM p a JOIN p b ON a.tok = b.tok AND a.id < b.id),
      j AS (
        SELECT id_a, id_b, ${Sql.jaccard("da.toks", "db.toks")} AS jaccard
        FROM pairs
        JOIN d2 da ON da.id = pairs.id_a
        JOIN d2 db ON db.id = pairs.id_b)
      SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.9
      ORDER BY id_a, id_b""")),

    // Aggregate-over-join materialized-view maintenance, end to end:
    // split both fact sides at a date cutoff (A = lineitem by shipdate,
    // B = orders by orderdate), maintain the per-(priority, flag)
    // aggregate as standing(A₀⋈B₀) ⊕ agg(Δ(A⋈B)) where
    // Δ(A⋈B) = ΔA⋈B ∪ A₀⋈ΔB (IncrementalAgg.deltaJoin — each new pair
    // exactly once) and ⊕ is the applyDelta outer-join fold. The oracle
    // computes the PLAIN join+aggregate — matching hashes prove the
    // incremental law. Scale: both delta joins broadcast the delta side
    // (standing tables scanned, never shuffled); a full recompute
    // shuffles |A|+|B| every refresh. (The in-query standing join stands
    // in for the warehouse-stored MV of a real deployment.)
    QueryDef("incremental_join_agg", (s, dir) => {
      val cutoff = lit("2000-01-01 00:00:00").cast("timestamp_ntz")
      val A = t("lineitem")(s, dir)
        .select(col("l_orderkey"), col("l_returnflag"),
          col("l_quantity"), col("l_shipdate"))
      val B = t("orders")(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      val a0 = A.where(col("l_shipdate") < cutoff)
      val da = A.where(col("l_shipdate") >= cutoff)
      val b0 = B.where(col("o_orderdate") < cutoff)
      val db = B.where(col("o_orderdate") >= cutoff)
      val cond = col("l_orderkey") === col("o_orderkey")
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("o_orderpriority"), col("l_returnflag"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"),
            count(lit(1)).as("n"))
      val standing = agg(a0.join(b0, cond))
      val deltaAgg = agg(IncrementalAgg.deltaJoin(a0, da, b0, db, cond))
      IncrementalAgg.applyDelta(standing, deltaAgg,
          Seq("o_orderpriority", "l_returnflag"),
          Map("qty" -> IncrementalAgg.Add, "n" -> IncrementalAgg.Add))
        .select(col("o_orderpriority"), col("l_returnflag"),
          col("qty").cast("double").as("sum_qty"), col("n"))
        .orderBy(col("o_orderpriority"), col("l_returnflag"))
    }, Some("""
      SELECT o_orderpriority, l_returnflag,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    // HLL merge law: per-event_type register sets merged by per-bucket
    // MAX equal the registers sketched directly over the whole table —
    // max is associative/commutative/idempotent, which is exactly why
    // HLL partials combine losslessly across partitions, days, or
    // engines. The query outputs the merged-path and direct-path
    // estimates side by side; the oracle recomputes both, so the hash
    // compare pins the law (merged ≡ direct) AND the estimator value.
    QueryDef("sketch_hll_merge", (s, dir) => {
      val ev = t("events")(s, dir)
      val h = SketchFns.hash60(col("user_id"))
      val perType = ev
        .select(col("event_type"), SketchFns.hllBucket(h).as("bucket"),
          SketchFns.hllRho(SketchFns.hllRem(h)).as("rho"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(max(col("rho")).as("maxrho"))
      val merged = perType.groupBy(col("bucket"))
        .agg(max(col("maxrho")).as("maxrho"))
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - maxrho)")).as("sp"),
          count(lit(1)).as("nb"))
        .select(SketchFns.hllEstimate(col("sp"), col("nb")).as("merged_estimate"))
      val direct = ev
        .select(SketchFns.hllBucket(h).as("bucket"),
          SketchFns.hllRho(SketchFns.hllRem(h)).as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("maxrho"))
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - maxrho)")).as("sp"),
          count(lit(1)).as("nb"))
        .select(SketchFns.hllEstimate(col("sp"), col("nb")).as("direct_estimate"))
      merged.crossJoin(direct)
    }, Some(s"""
      WITH h AS (
        SELECT event_type, ${Sql.hash60("user_id")} AS h FROM events),
      b AS (
        SELECT event_type, h >> ${SketchFns.HllP + 42} AS bucket,
               h & ${(1L << SketchFns.HllRemBits) - 1} AS rem FROM h),
      r AS (SELECT event_type, bucket, ${Sql.hllRho("rem")} AS rho FROM b),
      pt AS (
        SELECT event_type, bucket, max(rho) AS maxrho
        FROM r GROUP BY event_type, bucket),
      mg AS (SELECT bucket, max(maxrho) AS maxrho FROM pt GROUP BY bucket),
      ms AS (
        SELECT sum(1::BIGINT << (52 - maxrho)) AS sp, count(*) AS nb FROM mg),
      dr AS (SELECT bucket, max(rho) AS maxrho FROM r GROUP BY bucket),
      ds AS (
        SELECT sum(1::BIGINT << (52 - maxrho)) AS sp, count(*) AS nb FROM dr)
      SELECT
        0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0 * 4503599627370496.0
          / CAST(ms.sp + (512 - ms.nb) * 4503599627370496 AS DOUBLE) AS merged_estimate,
        0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0 * 4503599627370496.0
          / CAST(ds.sp + (512 - ds.nb) * 4503599627370496 AS DOUBLE) AS direct_estimate
      FROM ms CROSS JOIN ds"""))
  )
}
