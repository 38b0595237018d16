package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{PiiFns, SimFns, TextAnalysisFns}
import graft.operators.Splits

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
    })
  )
}
