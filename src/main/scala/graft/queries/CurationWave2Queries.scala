package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{SimFns, TextAnalysisFns}

/** Round-4 curation wave 2: rule-based quality filtering (Gopher-style),
  * importance-weighted data selection (DSIR-style), and exact-substring
  * duplicate flagging — the remaining selection/dedup steps of a
  * pre-training curation pipeline. All arithmetic is integer (counts and
  * cross-multiplied ratio tests), so the DuckDB oracle hash-matches with
  * no float tolerance.
  */
object CurationWave2Queries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // Gopher-style rule filter (Rae et al. 2021 §A1.1 shape): word-count
    // bounds, mean-word-length bounds, distinct-token ratio, and a
    // stopword floor. Every ratio rule is cross-multiplied to stay in
    // BIGINT (3 <= sum_len/n <= 5 becomes 3n <= sum_len AND sum_len <= 5n)
    // — no division anywhere. One codegen projection over one scan: no
    // explode, no shuffle, the shape that holds at 100 TB.
    QueryDef("gopher_quality", (s, dir) => {
      val toks = TextAnalysisFns.tokens(col("text"))
      t("documents")(s, dir)
        .select(col("doc_id"), toks.as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_words"),
          aggregate(transform(col("toks"), t => length(t).cast("long")),
            lit(0L), (a, x) => a + x).as("sum_len"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
          aggregate(transform(col("toks"),
              t => when(t.isin("a", "the", "of"), lit(1L)).otherwise(lit(0L))),
            lit(0L), (a, x) => a + x).as("n_stop"))
        .select(col("doc_id"), col("n_words"), col("sum_len"),
          col("n_distinct"), col("n_stop"),
          (col("n_words").between(30L, 80L) &&
            col("sum_len") >= col("n_words") * 3 &&
            col("sum_len") <= col("n_words") * 5 &&
            col("n_distinct") * 2 >= col("n_words") &&
            col("n_stop") >= 2).as("keep"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH tk AS (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents),
      m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(toks, t -> CAST(length(t) AS BIGINT))),
                 (a, b) -> a + b) AS sum_len,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(toks, t -> CASE WHEN t IN ('a', 'the', 'of')
                   THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
                 (a, b) -> a + b) AS n_stop
        FROM tk)
      SELECT doc_id, n_words, sum_len, n_distinct, n_stop,
             (n_words BETWEEN 30 AND 80)
               AND sum_len >= n_words * 3 AND sum_len <= n_words * 5
               AND n_distinct * 2 >= n_words
               AND n_stop >= 2 AS keep
      FROM m ORDER BY doc_id""")),

    // DSIR-style importance scoring (Xie et al. 2023 shape): hashed
    // n-gram (here unigram) features over 4096 md5 buckets; per-bucket
    // weight = tgt_cnt*raw_tot - raw_cnt*tgt_tot — the exact-integer
    // cross-multiplied sign of p_target/p_raw - 1 (positive iff the
    // bucket is over-represented in the target slice). A doc's score is
    // the token-multiplicity sum of its bucket weights.
    //
    // Scale shape: the exploded token stream is aggregated ONCE, map-side,
    // to per-(doc, bucket) multiplicity rows; the bucket count table
    // (raw and target in one conditional aggregation) and the per-doc
    // score both derive from that frame — its shuffle exchange is
    // byte-identical in the two branches, so Spark's ReuseExchange runs
    // the tokenize+hash scan a single time (the previous raw/target/score
    // three-branch form re-tokenized the corpus three times). The weight
    // table is broadcast back, and the only wide shuffle keys on
    // (doc_id, bucket). Nothing driver-side, nothing all-pairs.
    QueryDef("dsir_importance", (s, dir) => {
      val docs = t("documents")(s, dir)
        .select(col("doc_id"), col("lang"),
          TextAnalysisFns.tokens(col("text")).as("toks"))
      val db = docs
        .select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
        .select(col("doc_id"), col("lang"),
          (conv(substring(md5(concat(lit("f:"), col("tok"))), 1, 8), 16, 10)
            .cast("long") % 4096).as("bucket"))
        .groupBy(col("doc_id"), col("lang"), col("bucket"))
        .agg(count(lit(1)).as("c"))
      val cnts = db.groupBy(col("bucket")).agg(
        sum(col("c")).as("raw_cnt"),
        coalesce(sum(when(col("lang") === "en", col("c"))), lit(0L))
          .as("tgt_cnt"))
      val tots = cnts.agg(sum(col("raw_cnt")).as("raw_tot"),
        sum(col("tgt_cnt")).as("tgt_tot"))
      val w = cnts.crossJoin(broadcast(tots))
        .select(col("bucket"),
          (col("tgt_cnt") * col("raw_tot") - col("raw_cnt") * col("tgt_tot"))
            .as("w"))
      val sc = db.join(broadcast(w), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_toks"), sum(col("c") * col("w")).as("score"))
      docs.select(col("doc_id"), col("lang")).join(sc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("n_toks"), lit(0L)).as("n_toks"),
          coalesce(col("score"), lit(0L)).as("score"),
          (coalesce(col("score"), lit(0L)) > 0).as("keep"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH tk AS (SELECT doc_id, lang, ${Sql.tokens("text")} AS toks
                  FROM documents),
      tok AS (
        SELECT doc_id, lang,
               CAST(concat('0x', substr(md5('f:' || t), 1, 8)) AS BIGINT)
                 % 4096 AS bucket
        FROM tk, unnest(toks) AS u(t)),
      raw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS raw_cnt
              FROM tok GROUP BY bucket),
      tgt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS tgt_cnt
              FROM tok WHERE lang = 'en' GROUP BY bucket),
      cnts AS (
        SELECT r.bucket, r.raw_cnt, coalesce(g.tgt_cnt, 0) AS tgt_cnt
        FROM raw r LEFT JOIN tgt g USING (bucket)),
      tot AS (SELECT CAST(sum(raw_cnt) AS BIGINT) AS raw_tot,
                     CAST(sum(tgt_cnt) AS BIGINT) AS tgt_tot FROM cnts),
      w AS (SELECT bucket, tgt_cnt * raw_tot - raw_cnt * tgt_tot AS w
            FROM cnts CROSS JOIN tot),
      sc AS (
        SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
               CAST(sum(w.w) AS BIGINT) AS score
        FROM tok JOIN w USING (bucket) GROUP BY tok.doc_id)
      SELECT d.doc_id, d.lang,
             coalesce(sc.n_toks, 0) AS n_toks,
             coalesce(sc.score, 0) AS score,
             coalesce(sc.score, 0) > 0 AS keep
      FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
      ORDER BY d.doc_id""")),

    // Exact-substring duplicate flagging (the n-gram-key approximation of
    // suffix-array dedup, Lee et al. 2022 shape): a doc is a duplicate if
    // any of its 8-token contiguous grams already occurs in a lower-id
    // doc. Explode -> min-doc-per-gram -> per-doc OR: two bounded
    // hash-shuffles (gram, then doc_id), never doc x doc.
    QueryDef("dedup_substring_exact", (s, dir) => {
      val docs = t("documents")(s, dir)
        .select(col("doc_id"),
          SimFns.wordShingles(TextAnalysisFns.tokens(col("text")), 8)
            .as("grams"))
      val gr = docs.select(col("doc_id"), explode(col("grams")).as("g"))
      val gmin = gr.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
      val per = gr.join(gmin, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          max(when(col("first_doc") < col("doc_id"), lit(1)).otherwise(lit(0)))
            .as("dup"))
      docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("dup") === 1, lit(false)).as("is_dup"))
        .orderBy(col("doc_id"))
    }, Some {
      val sh = Sql.wordShingles("toks", 8)
      s"""
      WITH tk AS (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents),
      gr AS (SELECT doc_id, unnest($sh) AS g FROM tk),
      gmin AS (SELECT g, min(doc_id) AS first_doc FROM gr GROUP BY g),
      per AS (
        SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               max(CASE WHEN gmin.first_doc < gr.doc_id THEN 1 ELSE 0 END) = 1
                 AS is_dup
        FROM gr JOIN gmin USING (g) GROUP BY gr.doc_id)
      SELECT d.doc_id, coalesce(p.n_grams, 0) AS n_grams,
             coalesce(p.is_dup, FALSE) AS is_dup
      FROM documents d LEFT JOIN per p USING (doc_id)
      ORDER BY doc_id"""
    })
  )
}
