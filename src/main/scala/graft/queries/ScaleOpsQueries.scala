package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysisFns
import graft.operators.BloomPrune

/** Round-6 scale-ops wave: Bloom-filter join pruning (the explicit form
  * of Spark's runtime row-level filtering, plus the anti-join
  * acceleration the optimizer never applies), corpus bigram-frequency
  * LM scoring (the exact-count cousin of `dsir_importance`'s hashed
  * buckets — the CCNet/KenLM "does this text look like the corpus"
  * signal), and URL canonicalization dedup (the first dedup step of
  * every web-crawl pipeline). All arithmetic is integer/count-based, so
  * the DuckDB oracles hash-match with no tolerance.
  */
object ScaleOpsQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  /** The shared URL canonicalization chain, one regexp step per rule so
    * the DuckDB mirror is literally the same regexes: (1) lowercase
    * scheme+authority only (paths stay case-sensitive), (2) drop the
    * fragment, (3) http→https, (4) strip `www.`, (5) drop `utm_*`
    * tracking params, (6) strip a dangling `?`/`&`/`/`.
    */
  private def normalizeUrl(u: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val auth = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
    val lowered = concat(lower(regexp_extract(u, auth, 0)),
      regexp_replace(u, auth, ""))
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(lowered,
        "#.*$", ""),
        "^http://", "https://"),
        "^https://www\\.", "https://"),
        "utm_[^&]*&", ""),
        "[?&]utm_[^&]*$", ""),
        "(/|[?&])$", "")
  }

  val defs: Seq[QueryDef] = Seq(

    // Bloom-pruned semi join: lineitem ⋉ high-balance suppliers. The
    // bloom literal prunes the fact BEFORE the semi-join shuffle — at
    // 100 TB the shuffle input is ~|matches| + fpp·|fact| instead of
    // |fact|. The exact semi join removes false positives, so the
    // result ≡ plain EXISTS; the oracle is the plain form.
    QueryDef("bloom_semi_join", (s, dir) => {
      val dim = t("supplier")(s, dir).where(col("s_acctbal") > 6000)
      BloomPrune.semiJoin(t("lineitem")(s, dir), dim,
          "l_suppkey", "s_suppkey", expectedItems = 1024)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_qty
      FROM lineitem l
      WHERE EXISTS (SELECT 1 FROM supplier s
                    WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal > 6000)
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Bloom-accelerated anti join: a bloom MISS proves non-membership,
    // so miss rows skip the join entirely and only the ~fpp sliver of
    // hits pays the exact anti join — the shuffle input drops from
    // |fact| to |matches| + fpp·|fact|. Result ≡ plain NOT EXISTS.
    QueryDef("bloom_anti_join", (s, dir) => {
      val dim = t("supplier")(s, dir).where(col("s_acctbal") > 6000)
      BloomPrune.antiJoin(t("lineitem")(s, dir), dim,
          "l_suppkey", "s_suppkey", expectedItems = 1024)
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy(col("l_linestatus"))
    }, Some("""
      SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_price
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM supplier s
                        WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal > 6000)
      GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // Corpus bigram-frequency LM score (CCNet/KenLM shape, exact
    // counts): every doc's word bigrams against the whole corpus's
    // bigram frequencies; a doc whose average bigram is rare reads as
    // gibberish. freq_sum/n_bigrams stay separate BIGINTs (the keep
    // rule cross-multiplies) — no division, no float. Scale shape: the
    // frequency table is ONE map-side-combinable groupBy on the bigram
    // key; the score join is bigram-keyed equi — the corpus never
    // self-joins doc×doc.
    QueryDef("text_lm_score", (s, dir) => {
      val docs = t("documents")(s, dir)
        .select(col("doc_id"), TextAnalysisFns.tokens(col("text")).as("toks"))
      // zip_with over two shifted slices, NOT transform(sequence)+
      // element_at: per-index element_at inside a lambda drops out of
      // codegen and ran ~13× slower at sf0.1 (11.9 s vs 0.9 s isolated)
      val withBg = docs.select(col("doc_id"),
        when(size(col("toks")) < 2, array().cast("array<string>"))
          .otherwise(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat(a, lit(" "), b))).as("bgs"))
      // explode_outer, NOT explode: InferFiltersFromGenerate clones the
      // whole bigram expression into a pre-Generate filter for a plain
      // explode (evaluating tokens+zip_with twice per row); the rule
      // skips outer generates, and the explicit null filter restores
      // inner-explode semantics on the already-computed column
      val bg = withBg.select(col("doc_id"), explode_outer(col("bgs")).as("bg"))
        .where(col("bg").isNotNull)
      val cnt = bg.groupBy(col("bg")).agg(count(lit(1)).as("bg_cnt"))
      val sc = bg.join(cnt, Seq("bg"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("bg_cnt")).as("freq_sum"))
      docs.select(col("doc_id")).join(sc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("freq_sum"), lit(0L)).as("freq_sum"),
          (coalesce(col("freq_sum"), lit(0L)) >=
            coalesce(col("n_bigrams"), lit(0L)) * 2 &&
            coalesce(col("n_bigrams"), lit(0L)) > 0).as("keep"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH tk AS (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents),
      bg AS (
        SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg
        FROM tk, unnest(generate_series(1, greatest(len(toks)-1, 0))) AS u(i)),
      cnt AS (SELECT bg, CAST(count(*) AS BIGINT) AS bg_cnt FROM bg GROUP BY bg),
      sc AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                    CAST(sum(cnt.bg_cnt) AS BIGINT) AS freq_sum
             FROM bg JOIN cnt USING (bg) GROUP BY bg.doc_id)
      SELECT d.doc_id,
             coalesce(sc.n_bigrams, 0) AS n_bigrams,
             coalesce(sc.freq_sum, 0) AS freq_sum,
             coalesce(sc.freq_sum, 0) >= coalesce(sc.n_bigrams, 0) * 2
               AND coalesce(sc.n_bigrams, 0) > 0 AS keep
      FROM documents d LEFT JOIN sc USING (doc_id)
      ORDER BY d.doc_id""")),

    // URL canonicalization dedup — the first dedup pass of a web-crawl
    // pipeline: canonicalize (lowercased authority, https, no www/
    // fragment/utm params/trailing slash), then exact dedup on the
    // canonical form, keeper = min doc_id. URLs are synthesized from
    // document columns (the corpus has no url column) with enough
    // casing/tracking noise that canonicalization creates real
    // clusters; the normalizer is the operator under test and the
    // oracle runs the identical regex chain. One narrow projection +
    // one hash groupBy — the exact-dedup scale shape.
    QueryDef("dedup_url", (s, dir) => {
      val url = concat(
        when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTP://WWW."))
          .otherwise(lit("https://")),
        col("source"), lit(".com/"), col("lang"), lit("/item-"),
        pmod(col("doc_id"), lit(40)),
        when(pmod(col("doc_id"), lit(3)) === 0,
          lit("?utm_source=feed&utm_campaign=x")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0, lit("#frag")).otherwise(lit("")))
      t("documents")(s, dir)
        .select(col("doc_id"), normalizeUrl(url).as("url_norm"))
        .groupBy(col("url_norm"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy(col("url_norm"))
    }, Some("""
      WITH raw AS (
        SELECT doc_id,
               concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.' ELSE 'https://' END,
                      source, '.com/', lang, '/item-', doc_id % 40,
                      CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_campaign=x' ELSE '' END,
                      CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url
        FROM documents),
      norm AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 concat(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)),
                        regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '')),
                 '#.*$', ''), '^http://', 'https://'), '^https://www\.', 'https://'),
                 'utm_[^&]*&', '', 'g'), '[?&]utm_[^&]*$', ''), '(/|[?&])$', '') AS url_norm
        FROM raw)
      SELECT url_norm, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
      FROM norm GROUP BY url_norm ORDER BY url_norm"""))
  )
}
