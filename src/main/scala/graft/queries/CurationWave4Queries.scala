package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.SuffixDedup

/** Round-10 curation wave: suffix-ranking substring dedup (the Lee et al.
  * 2021 "all maximal duplicate spans ≥ L tokens" standard, replacing the
  * fixed-L gram-key approximation's boolean per-doc flag with exact span
  * boundaries), computed by prefix doubling over equi-joins — see
  * [[graft.operators.SuffixDedup]] for the plan-shape and 100 TB argument.
  */
object CurationWave4Queries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  /** Span window length in tokens (Lee et al. use 50 BPE tokens at web
    * scale; 8 word-tokens matches `dedup_substring_exact`'s gram size so
    * the two operators adjudicate the same duplicates on this corpus).
    */
  private val SpanL = 8

  val defs: Seq[QueryDef] = Seq(

    // Maximal duplicate token spans (≥ 8 tokens, 1-based inclusive token
    // positions, within-doc AND cross-doc occurrences both count). The
    // engine never materializes an L-gram: labels double in width through
    // log2(L) equi-join rounds and the final duplicated-key test is a
    // grouped count. The oracle CAN afford L-gram strings at sf0.01 —
    // it explodes every 8-token window, groups to find duplicated grams,
    // and merges covered positions with the same gaps-and-islands rule
    // (windows merge while next_start <= prev_start + L). Label equality
    // is exact (dense ids, no hashing), so the two formulations define
    // the same covered set by construction.
    QueryDef("dedup_substring_suffix", (s, dir) =>
      SuffixDedup.maximalDuplicateSpans(t("documents")(s, dir),
        "doc_id", "text", SpanL)
    , Some(s"""
      WITH tk AS (SELECT doc_id, ${Sql.tokens("text")} AS ts FROM documents),
      g AS (SELECT doc_id,
                   unnest(generate_series(1, greatest(len(ts) - ${SpanL - 1}, 0)))
                     AS pos,
                   unnest(list_transform(
                     generate_series(1, greatest(len(ts) - ${SpanL - 1}, 0)),
                     i -> array_to_string(ts[i:i+${SpanL - 1}], ' '))) AS gram
            FROM tk),
      dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
      cov AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
      isl AS (SELECT doc_id, pos,
                     CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                            IS NULL
                          OR pos - lag(pos) OVER (PARTITION BY doc_id
                                                  ORDER BY pos) > $SpanL
                          THEN 1 ELSE 0 END AS brk
              FROM cov),
      is2 AS (SELECT doc_id, pos,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS island
              FROM isl)
      SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
             CAST(max(pos) + ${SpanL - 1} AS BIGINT) AS span_end,
             CAST(max(pos) + $SpanL - min(pos) AS BIGINT) AS span_len
      FROM is2 GROUP BY doc_id, island
      ORDER BY doc_id, span_start"""))
  )
}
