package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{PiiFns, SimFns, TextAnalysisFns}
import graft.operators.{Ann, Dedup, Sampling, Splits}

/** Round-4 data-curation operators: PII redaction, deterministic corpus
  * shuffling, and the cross-document duplicate-n-gram quality signal —
  * the curation steps a pre-training pipeline runs between dedup and
  * packing. All exact (counts, md5 hashes, integer ratios as doubles of
  * exact integers) so the DuckDB oracle hash-matches.
  */
object DataCurationQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // PII detection + redaction: deterministic synthetic PII (an email on
    // every 3rd row, a PH-mobile on every 2nd) woven into customer rows,
    // then counted and redacted via codegen regex expressions. The
    // redacted-text md5 proves byte-identical scrub output, not just
    // matching counts.
    QueryDef("text_pii_redact", (s, dir) => {
      val doc = t("customer")(s, dir).select(
        col("c_custkey"),
        concat(
          col("c_name"),
          when(col("c_custkey") % 3 === 0,
            concat(lit(" at user"), col("c_custkey").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("c_custkey") % 2 === 0,
            concat(lit(" call 09"),
              lpad(((col("c_custkey") * 7919) % 1000000000).cast("string"),
                9, "0"))).otherwise(lit("")),
          lit(" ok")).as("text"))
      doc.select(
          col("c_custkey"),
          PiiFns.piiCount(col("text"), PiiFns.EmailRe).as("n_emails"),
          PiiFns.piiCount(col("text"), PiiFns.PhoneRe).as("n_phones"),
          md5(PiiFns.redactAll(col("text"))).as("redacted_hash"))
        .orderBy(col("c_custkey"))
    }, Some(s"""
      WITH d AS (
        SELECT c_custkey,
               c_name ||
               CASE WHEN c_custkey % 3 = 0
                    THEN ' at user' || CAST(c_custkey AS VARCHAR) || '@example.com'
                    ELSE '' END ||
               CASE WHEN c_custkey % 2 = 0
                    THEN ' call 09' ||
                         lpad(CAST((c_custkey * 7919) % 1000000000 AS VARCHAR), 9, '0')
                    ELSE '' END || ' ok' AS text
        FROM customer)
      SELECT c_custkey,
             CAST(len(regexp_extract_all(text, '${PiiFns.EmailRe}')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(text, '${PiiFns.PhoneRe}')) AS INT) AS n_phones,
             md5(regexp_replace(regexp_replace(text, '${PiiFns.EmailRe}',
               '${PiiFns.EmailToken}', 'g'), '${PiiFns.PhoneRe}',
               '${PiiFns.PhoneToken}', 'g')) AS redacted_hash
      FROM d ORDER BY c_custkey""")),

    // Per-segment PII exposure report — the compliance dashboard number:
    // share of rows carrying ANY email/phone per market segment, plus
    // total hit counts (same synthesized PII text and regexes as
    // text_pii_redact). Exact integer counts, one final division.
    QueryDef("pii_rate_by_segment", (s, dir) => {
      val doc = t("customer")(s, dir).select(
        col("c_mktsegment"),
        concat(
          col("c_name"),
          when(col("c_custkey") % 3 === 0,
            concat(lit(" at user"), col("c_custkey").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("c_custkey") % 2 === 0,
            concat(lit(" call 09"),
              lpad(((col("c_custkey") * 7919) % 1000000000).cast("string"),
                9, "0"))).otherwise(lit("")),
          lit(" ok")).as("text"))
      doc.select(col("c_mktsegment"),
          PiiFns.piiCount(col("text"), PiiFns.EmailRe).as("ne"),
          PiiFns.piiCount(col("text"), PiiFns.PhoneRe).as("np"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("ne").cast("long")).as("n_emails"),
          sum(col("np").cast("long")).as("n_phones"),
          sum(when(col("ne") > 0 || col("np") > 0, 1L).otherwise(0L))
            .as("pii_rows"))
        .select(col("c_mktsegment"), col("n_rows"), col("n_emails"),
          col("n_phones"), col("pii_rows"),
          (col("pii_rows").cast("double") / col("n_rows").cast("double"))
            .as("pii_row_rate"))
        .orderBy(col("c_mktsegment"))
    }, Some(s"""
      WITH d AS (
        SELECT c_mktsegment,
               c_name ||
               CASE WHEN c_custkey % 3 = 0
                    THEN ' at user' || CAST(c_custkey AS VARCHAR) || '@example.com'
                    ELSE '' END ||
               CASE WHEN c_custkey % 2 = 0
                    THEN ' call 09' ||
                         lpad(CAST((c_custkey * 7919) % 1000000000 AS VARCHAR), 9, '0')
                    ELSE '' END || ' ok' AS text
        FROM customer),
      h AS (SELECT c_mktsegment,
                   len(regexp_extract_all(text, '${PiiFns.EmailRe}')) AS ne,
                   len(regexp_extract_all(text, '${PiiFns.PhoneRe}')) AS np
            FROM d)
      SELECT c_mktsegment,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(ne) AS BIGINT) AS n_emails,
             CAST(sum(np) AS BIGINT) AS n_phones,
             CAST(sum(CASE WHEN ne > 0 OR np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pii_rows,
             CAST(sum(CASE WHEN ne > 0 OR np > 0 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS pii_row_rate
      FROM h GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Deterministic corpus shuffle: seeded md5 permutation into shards +
    // in-shard positions (Splits.deterministicShuffle). Replaces ORDER BY
    // rand() — reproducible, engine-portable, and the position window
    // partitions by shard so no task orders more than one shard.
    QueryDef("corpus_shuffle", (s, dir) =>
      Splits.deterministicShuffle(
          t("documents")(s, dir).select(col("doc_id")), "doc_id",
          seed = "epoch0", shards = 8)
        .orderBy(col("shard"), col("pos"))
    , Some("""
      WITH k AS (
        SELECT doc_id, md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS h
        FROM documents),
      sh AS (
        SELECT doc_id, h,
               CAST(CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % 8 AS INT) AS shard
        FROM k)
      SELECT doc_id, shard,
             CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
                  AS INT) AS pos
      FROM sh ORDER BY shard, pos""")),

    // Cross-document duplicate-n-gram fraction (the Gopher/C4-style
    // quality signal; distinct from text_repetition = WITHIN-doc and
    // decontamination = vs an eval set): share of a doc's distinct word
    // 5-grams that occur in at least one other document. Explode → gram
    // doc-frequency → per-doc ratio: two hash-shuffles on bounded keys,
    // never doc × doc.
    QueryDef("text_dup_ngram_frac", (s, dir) => {
      val grams = t("documents")(s, dir)
        .select(col("doc_id"),
          explode(SimFns.wordShingles(
            TextAnalysisFns.tokens(col("text")), 5)).as("g"))
        .distinct()
      val gramDf = grams.groupBy(col("g"))
        .agg(count(lit(1)).as("df"))
      grams.join(gramDf, "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_grams"), col("n_dup"),
          (col("n_dup").cast("double") / col("n_grams")).as("dup_frac"))
        .orderBy(col("doc_id"))
    }, Some {
      val sh = Sql.wordShingles("toks", 5)
      s"""
      WITH tk AS (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents),
      grams AS (SELECT DISTINCT doc_id, unnest($sh) AS g FROM tk),
      gdf AS (SELECT g, count(*) AS df FROM grams GROUP BY g)
      SELECT doc_id, count(*) AS n_grams,
             CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
               AS dup_frac
      FROM grams JOIN gdf USING (g)
      GROUP BY doc_id ORDER BY doc_id"""
    }),

    // SemDeDup-style semantic dedup: iteration-0 IVF cells (centroids =
    // the nlist lowest-id embeddings — SQL-derivable, same device as
    // ann_topk_ivf's oracle) + greedy keep-lowest-id within each cell at
    // the repo-standard cosine threshold. The Lloyd-trained clustering is
    // covered by the Ann recall spec; THIS query pins the cell → pair →
    // survivor plumbing to an exact cross-engine oracle.
    //
    // SemDeDup's scale contract: nlist = max(8, ceil(√N)) — the standard
    // IVF balance, making BOTH the O(N·nlist) assignment and the
    // within-cell pair volume O(N^1.5). A fixed nlist=8 read 110x on the
    // 10x sf1.0→sf10 decade (cells grow with N ⇒ pairs with N²); adaptive
    // nlist re-measured 366 s → ~30 s at sf10, and the compiled
    // NearestCentroid assignment (Ann.assignCells past 32 cells — the
    // literal expression tree costs Janino 45 s at nlist=142) took it to
    // 7.4 s. The oracle computes the same nlist from count(*) (identical
    // IEEE sqrt/ceil), so the gate stays hash-exact at every SF.
    QueryDef("dedup_semantic", (s, dir) => {
      val emb = t("embeddings")(s, dir)
      val nlist = math.max(8L,
        math.ceil(math.sqrt(emb.count().toDouble)).toLong).toInt
      val index = CorpusFronts.ivfIndex(s, dir, nlist = nlist)
      Dedup.semantic(emb, "vec_id", "embedding", index, threshold = 0.3)
        .orderBy(col("id"))
    }, Some {
      // ||v−c||² operation tree identical to Ann.distSqTo
      def distSq(v: String, c: String): String =
        s"(${Sql.dot(v, v)} - 2.0 * ${Sql.dot(v, c)} + ${Sql.dot(c, c)})"
      s"""
      WITH cent AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
               CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
        QUALIFY row_number() OVER (ORDER BY vec_id) <=
          greatest(8, CAST(ceil(sqrt(count(*) OVER ())) AS BIGINT))),
      corp AS (SELECT vec_id, embedding AS v FROM embeddings),
      assign AS (
        SELECT corp.vec_id, cent.cid,
               row_number() OVER (PARTITION BY corp.vec_id
                 ORDER BY ${distSq("corp.v", "cent.cv")}, cent.cid) AS rn
        FROM corp CROSS JOIN cent),
      cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
      dup AS (
        SELECT DISTINCT a.vec_id
        FROM cells a JOIN cells b ON a.cell = b.cell AND b.vec_id < a.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
        WHERE ${Sql.cosine("ea.embedding", "eb.embedding")} >= 0.3)
      SELECT c.vec_id AS id, CAST(c.cell AS INT) AS cell,
             (d.vec_id IS NOT NULL) AS is_dup
      FROM cells c LEFT JOIN dup d ON d.vec_id = c.vec_id
      ORDER BY id"""
    }),

    // CCNet-style line-level dedup: 3-token pseudo-lines (the corpus has
    // no newlines), lines in >1 distinct doc dropped everywhere, docs
    // reassembled from survivors in order. The kept-text md5 pins the
    // reassembly ORDER, not just the counts.
    QueryDef("text_line_dedup", (s, dir) =>
      Dedup.lineDedup(t("documents")(s, dir), "doc_id", "text", lineTokens = 3)
        .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
          md5(col("kept_text")).as("kept_hash"))
        .orderBy(col("doc_id"))
    , Some(s"""
      WITH tk AS (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents),
      lines AS (
        SELECT doc_id, s AS pos, array_to_string(toks[s:s+2], ' ') AS line
        FROM tk, unnest(generate_series(1, len(toks), 3)) AS u(s)),
      common AS (
        SELECT line FROM lines GROUP BY line
        HAVING count(DISTINCT doc_id) > 1)
      SELECT l.doc_id, count(*) AS n_lines,
             count(*) FILTER (c.line IS NULL) AS n_kept,
             md5(coalesce(string_agg(l.line, ' ' ORDER BY l.pos)
               FILTER (c.line IS NULL), '')) AS kept_hash
      FROM lines l LEFT JOIN common c ON c.line = l.line
      GROUP BY l.doc_id ORDER BY l.doc_id""")),

    // Temperature sampling (α = ½) over the language groups — en is
    // downsampled relative to its share, rare langs oversampled. The
    // u < p_g decision is pure integer arithmetic (see
    // Sampling.temperatureSample) so the oracle matches bit-for-bit with
    // no float-sum order hazard.
    QueryDef("sample_temperature", (s, dir) =>
      Sampling.temperatureSample(
          t("documents")(s, dir).select(col("doc_id"), col("lang")),
          "doc_id", "lang", seed = "temp0", num = 1, den = 2)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    , Some("""
      WITH g AS (
        SELECT lang, count(*) AS n,
               CAST(floor(sqrt(count(*))) AS BIGINT) AS w
        FROM documents GROUP BY lang),
      t AS (SELECT CAST(sum(w) AS BIGINT) AS totw,
                   CAST(sum(n) AS BIGINT) AS nn FROM g)
      SELECT d.doc_id, d.lang
      FROM documents d JOIN g ON g.lang = d.lang CROSS JOIN t
      WHERE CAST(concat('0x', substr(md5('temp0:' ||
              CAST(d.doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
            * 2 * t.totw * g.n
          < 1 * t.nn * g.w * 16777216
      ORDER BY doc_id""")),

    // Classifier-based quality scoring via the hashing trick: each token
    // maps to one of 1024 model buckets (md5), each bucket carries a
    // deterministic integer weight in [-1000, 1000], the doc score is the
    // fold-sum over tokens — the exact-integer skeleton of fastText-style
    // linear quality filters. All inside one codegen projection
    // (transform + aggregate over the token array): no explode, no
    // shuffle — the shape that matters at 100 TB.
    QueryDef("quality_linear_score", (s, dir) => {
      val toks = TextAnalysisFns.tokens(col("text"))
      def weightOf(tok: Column): Column = {
        val bucket = conv(substring(md5(concat(lit("w:"), tok)), 1, 8), 16, 10)
          .cast("bigint") % 1024
        conv(substring(md5(concat(lit("v:"), bucket.cast("string"))), 1, 8), 16, 10)
          .cast("bigint") % 2001 - 1000
      }
      t("documents")(s, dir)
        .select(col("doc_id"), size(toks).cast("long").as("n_toks"),
          aggregate(transform(toks, weightOf(_)), lit(0L), (a, x) => a + x)
            .as("score"))
        .select(col("doc_id"), col("n_toks"), col("score"),
          when(col("n_toks") === 0, lit(0.0))
            .otherwise(col("score") / col("n_toks").cast("double"))
            .as("norm_score"),
          (col("score") >= 0).as("keep"))
        .orderBy(col("doc_id"))
    }, Some {
      val w = "(CAST(concat('0x', substr(md5('v:' || CAST(" +
        "CAST(concat('0x', substr(md5('w:' || t), 1, 8)) AS BIGINT) % 1024" +
        " AS VARCHAR)), 1, 8)) AS BIGINT) % 2001) - 1000"
      s"""
      WITH tk AS (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents),
      sc AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(toks, t -> $w)), (a, b) -> a + b) AS score
        FROM tk)
      SELECT doc_id, n_toks, score,
             CASE WHEN n_toks = 0 THEN 0.0
                  ELSE score / CAST(n_toks AS DOUBLE) END AS norm_score,
             score >= 0 AS keep
      FROM sc ORDER BY doc_id"""
    }),

    // Mixture/epoch plan: per-source token totals vs integer mixture
    // weights (derived from the source id so the query is
    // self-contained) → exact ceil-division epoch counts for a 1M-token
    // target budget.
    QueryDef("mix_plan", (s, dir) =>
      Sampling.mixturePlan(t("documents")(s, dir), "source",
          TextAnalysisFns.wordCount(col("text")).cast("long"),
          regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 4 + 1,
          budget = 1000000L)
        .select(col("source"), col("n_docs"), col("tokens"),
          col("weight"), col("epochs"))
        .orderBy(col("source"))
    , Some(s"""
      WITH per0 AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(${Sql.tokens("text")})) AS BIGINT) AS tokens
        FROM documents GROUP BY source),
      per AS (
        SELECT source, n_docs, tokens,
               CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT) % 4 + 1
                 AS weight
        FROM per0),
      t AS (SELECT CAST(sum(weight) AS BIGINT) AS totw FROM per)
      SELECT source, n_docs, tokens, weight,
             (1000000 * weight + totw * tokens - 1) // (totw * tokens)
               AS epochs
      FROM per CROSS JOIN t ORDER BY source"""))
  )
}
