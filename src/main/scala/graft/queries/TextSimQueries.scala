package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{SimFns, TextAnalysisFns, TextFns, TimeFns}
import graft.operators.GeocodeJoin

/** Scalar-function and similarity-join coverage (SURVEY.md §2.6 F1–F15,
  * §2.3 J5–J8) plus the text-analysis operator family, each paired with an
  * exact DuckDB oracle built from the mirrored SQL snippets in `Sql`.
  */
object TextSimQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  /** The small literal reference table for the similarity joins (the PSGC
    * munprov analog): part-name-like phrases sharing 5-grams with p_name.
    */
  private val RefNames = Seq(
    "small ring", "red bolt", "blue gear", "large plate",
    "hot gizmo", "old widget")
  private def refNamesSqlValues: String =
    RefNames.map(n => s"('$n')").mkString(", ")

  private val ServiceableNames = Seq("BUILDING", "AUTOMOBILE", "MACHINERY")

  /** Oracle for the J7 per-input top-1 — shared verbatim by the broadcast
    * (`bestMatch`) and blocked-scale (`bestMatchBlocked`) formulations:
    * the two plans are REQUIRED to be result-identical, so they hash
    * against the same SQL.
    */
  private def j7OracleSql: String = {
    val ga = Sql.charNgrams("ca", "n")
    val gb = Sql.charNgrams("cb", "n")
    s"""
      WITH inputs AS (SELECT DISTINCT p_name FROM part),
      ref AS (SELECT * FROM (VALUES $refNamesSqlValues) t(ref_name)),
      pairs AS (
        SELECT p_name, ref_name, ${Sql.cleanStr("p_name")} AS ca,
               ${Sql.cleanStr("ref_name")} AS cb
        FROM inputs CROSS JOIN ref),
      g AS (SELECT p_name, ref_name, ca, cb, ${Sql.refNgramSize("ca")} AS n FROM pairs),
      sets AS (SELECT p_name, ref_name, $ga AS ga, $gb AS gb FROM g),
      scored AS (SELECT p_name, ref_name, ${Sql.jaccard("ga", "gb")} AS score FROM sets),
      nz AS (SELECT * FROM scored WHERE score <> 0)
      SELECT p_name, ref_name, score, score >= 0.1 AS accepted FROM nz
      QUALIFY row_number() OVER (PARTITION BY p_name
                                 ORDER BY score DESC, ref_name) = 1
      ORDER BY p_name"""
  }

  val defs: Seq[QueryDef] = Seq(

    // F1 — reference-code regex extraction with default
    // (extraction_helpers.py:24-29).
    QueryDef("f1_reference_code", (s, dir) => {
      val msg = when(col("event_id") % 3 === 0, lit("no code in this message"))
        .otherwise(concat(lit("please see Ref: "), upper(col("event_type")), lit(" thanks")))
      t("events")(s, dir)
        .select(col("event_id"), TextFns.extractReferenceCode(msg).as("reference_code"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH m AS (
        SELECT event_id,
               CASE WHEN event_id % 3 = 0 THEN 'no code in this message'
                    ELSE 'please see Ref: ' || upper(event_type) || ' thanks' END AS msg
        FROM events)
      SELECT event_id,
             CASE WHEN regexp_extract(msg, 'Ref:\s*([A-Z0-9]+)\b', 1) = ''
                  THEN 'No Reference code'
                  ELSE regexp_extract(msg, 'Ref:\s*([A-Z0-9]+)\b', 1) END AS reference_code
      FROM m ORDER BY event_id""")),

    // F2 — UTC → Asia/Manila naive wall-clock (date_utils.py:4-12).
    // Manila is UTC+8 (no DST) ⇒ the oracle's fixed 8-hour shift is exact.
    QueryDef("f2_timezone_manila", (s, dir) => {
      t("events")(s, dir)
        .select(col("event_id"),
          TimeFns.toManilaWallClock(col("ts")).cast("timestamp_ntz").as("ts_mnl"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, CAST(ts AS TIMESTAMP) + INTERVAL 8 HOUR AS ts_mnl
      FROM events ORDER BY event_id""")),

    // F4 — custom_fields normalize: single-element list → element, else null
    // (extraction_helpers.py:47-49).
    QueryDef("f4_custom_fields", (s, dir) => {
      val arr = when(col("event_id") % 2 === 0, array(col("event_type")))
        .otherwise(array(col("event_type"), lit("extra")))
      t("events")(s, dir)
        .select(col("event_id"), TextFns.singleElementOrNull(arr).as("custom_field"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH m AS (
        SELECT event_id,
               CASE WHEN event_id % 2 = 0 THEN [event_type]
                    ELSE [event_type, 'extra'] END AS arr
        FROM events)
      SELECT event_id, CASE WHEN len(arr) = 1 THEN arr[1] END AS custom_field
      FROM m ORDER BY event_id""")),

    // F5 — tags array → CSV (Ticket.py:60); array built from doc words.
    QueryDef("f5_tags_csv", (s, dir) => {
      t("documents")(s, dir)
        .select(col("doc_id"),
          TextFns.tagsCsv(slice(split(col("text"), " "), 1, 5)).as("tags"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
             CASE WHEN len(str_split(text, ' ')[1:5]) = 0 THEN ''
                  ELSE array_to_string(str_split(text, ' ')[1:5], ',') END AS tags
      FROM documents ORDER BY doc_id""")),

    // F6 — schedule date+time combine with the reference's forgiving
    // time-format parsing (extraction_helpers.py:164-216).
    QueryDef("f6_schedule_combine", (s, dir) => {
      val dateStr = date_format(col("ts"), "yyyy-MM-dd")
      val timeStr = when(col("event_id") % 7 === 0, lit("3PM"))
        .when(col("event_id") % 7 === 1, lit("10:30AM"))
        .when(col("event_id") % 7 === 2, lit("12 PM"))
        .when(col("event_id") % 7 === 3, lit("9.45 pm"))
        .when(col("event_id") % 7 === 4, lit("1:99PM"))
        .when(col("event_id") % 7 === 5, lit("7:5AM"))
        .otherwise(lit("not a time"))
      t("events")(s, dir)
        .select(col("event_id"),
          TimeFns.combineScheduleDateTime(dateStr, timeStr)
            .cast("timestamp_ntz").as("schedule_ts"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH m AS (
        SELECT event_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS sd,
               CASE WHEN event_id % 7 = 0 THEN '3PM'
                    WHEN event_id % 7 = 1 THEN '10:30AM'
                    WHEN event_id % 7 = 2 THEN '12 PM'
                    WHEN event_id % 7 = 3 THEN '9.45 pm'
                    WHEN event_id % 7 = 4 THEN '1:99PM'
                    WHEN event_id % 7 = 5 THEN '7:5AM'
                    ELSE 'not a time' END AS st
        FROM events),
      p AS (
        SELECT event_id, TRY_CAST(sd AS TIMESTAMP) AS d,
               replace(st, ' ', '') AS cleaned
        FROM m),
      x AS (
        SELECT event_id, d,
               regexp_extract(cleaned, '^(\d{1,2})(?::(\d{1,2}))?(AM|PM)$', 1) AS hh,
               regexp_extract(cleaned, '^(\d{1,2})(?::(\d{1,2}))?(AM|PM)$', 2) AS mm,
               regexp_extract(cleaned, '^(\d{1,2})(?::(\d{1,2}))?(AM|PM)$', 3) AS ap
        FROM p),
      y AS (
        SELECT event_id, d,
               CASE WHEN hh = '' THEN NULL ELSE CAST(hh AS INT) END AS hhn,
               CASE WHEN mm = '' THEN 0 ELSE CAST(mm AS INT) END AS mmn, ap
        FROM x),
      z AS (
        SELECT event_id, d,
               CASE WHEN ap IS NOT NULL AND ap <> '' AND hhn IS NOT NULL
                         AND hhn >= 1 AND hhn <= 12 AND mmn <= 59
                    THEN (CASE WHEN ap = 'PM' AND hhn < 12 THEN hhn + 12
                               WHEN ap = 'AM' AND hhn = 12 THEN 0
                               ELSE hhn END) * 3600 + mmn * 60
                    ELSE 0 END AS secs
        FROM y)
      SELECT event_id,
             CASE WHEN d IS NULL THEN NULL
                  ELSE date_trunc('day', d) + to_seconds(secs) END AS schedule_ts
      FROM z ORDER BY event_id""")),

    // F7 — clean_str (Geocode.py:36-40).
    QueryDef("f7_clean_str", (s, dir) => {
      t("documents")(s, dir)
        .select(col("doc_id"), TextFns.cleanStr(col("text")).as("cleaned"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      SELECT doc_id, ${Sql.cleanStr("text")} AS cleaned
      FROM documents ORDER BY doc_id""")),

    // F8 — normalize_location (geocode_utils.py:5-14) over part names.
    QueryDef("f8_normalize_location", (s, dir) => {
      t("part")(s, dir)
        .select(col("p_partkey"), TextFns.normalizeLocation(col("p_name")).as("normalized"))
        .orderBy(col("p_partkey"))
    }, Some(s"""
      SELECT p_partkey, ${Sql.normalizeLocation("p_name")} AS normalized
      FROM part ORDER BY p_partkey""")),

    // F9 — n-gram Jaccard with the reference's dynamic n rule
    // (Geocode.py:42-53) over adjacent document pairs.
    QueryDef("f9_jaccard_ngram", (s, dir) => {
      val d  = t("documents")(s, dir)
      val a  = d.select(col("doc_id").as("id_a"), col("text").as("ta"))
        .where(col("id_a") % 2 === 0)
      val b  = d.select(col("doc_id").as("id_b"), col("text").as("tb"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"),
          SimFns.jaccardNgram(col("ta"), col("tb")).as("score"))
        .orderBy(col("id_a"))
    }, Some {
      val ga = Sql.charNgrams("ta", "n")
      val gb = Sql.charNgrams("tb", "n")
      s"""
      WITH pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.text AS ta, b.text AS tb
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 2 = 0),
      g AS (SELECT id_a, id_b, ta, tb, ${Sql.refNgramSize("ta")} AS n FROM pairs),
      sets AS (SELECT id_a, id_b, $ga AS ga, $gb AS gb FROM g)
      SELECT id_a, id_b, ${Sql.jaccard("ga", "gb")} AS score
      FROM sets ORDER BY id_a"""
    }),

    // F10 — Levenshtein-ratio fuzzy score (geocode_utils.py:18).
    QueryDef("f10_fuzzy_ratio", (s, dir) => {
      t("customer")(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          SimFns.levRatio(col("c_mktsegment"), lit("BUILDING")).as("ratio"))
        .orderBy(col("c_custkey"))
    }, Some(s"""
      SELECT c_custkey, c_mktsegment,
             ${Sql.levRatio("c_mktsegment", "'BUILDING'")} AS ratio
      FROM customer ORDER BY c_custkey""")),

    // F11/F12 — null normalization + fill (df_utils.py:9-15).
    QueryDef("f11_fillna", (s, dir) => {
      t("customer")(s, dir)
        .select(col("c_custkey"),
          when(col("c_acctbal") < 500, lit(null))
            .otherwise(col("c_acctbal")).as("bal"))
        .na.fill(0, Seq("bal"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey,
             coalesce(CASE WHEN c_acctbal < 500 THEN NULL ELSE c_acctbal END,
                      CAST(0 AS DOUBLE)) AS bal
      FROM customer ORDER BY c_custkey""")),

    // J5 — similarity theta-join phase 1: inputs × reference rows, n-gram
    // Jaccard score, keep nonzero (Geocode.py:53-59).
    QueryDef("j5_similarity_phase1", (s, dir) => {
      val inputs = t("part")(s, dir).select(col("p_name")).distinct()
      val ref = inputs.sparkSession.createDataFrame(
        RefNames.map(Tuple1(_))).toDF("ref_name")
      GeocodeJoin.phase1Candidates(inputs, ref, "p_name", "ref_name")
        .select(col("p_name"), col("ref_name"), col("score"))
        .orderBy(col("p_name"), col("ref_name"))
    }, Some {
      val ga = Sql.charNgrams("ca", "n")
      val gb = Sql.charNgrams("cb", "n")
      s"""
      WITH inputs AS (SELECT DISTINCT p_name FROM part),
      ref AS (SELECT * FROM (VALUES $refNamesSqlValues) t(ref_name)),
      pairs AS (
        SELECT p_name, ref_name, ${Sql.cleanStr("p_name")} AS ca,
               ${Sql.cleanStr("ref_name")} AS cb
        FROM inputs CROSS JOIN ref),
      g AS (SELECT p_name, ref_name, ca, cb, ${Sql.refNgramSize("ca")} AS n FROM pairs),
      sets AS (SELECT p_name, ref_name, $ga AS ga, $gb AS gb FROM g),
      scored AS (SELECT p_name, ref_name, ${Sql.jaccard("ga", "gb")} AS score FROM sets)
      SELECT p_name, ref_name, score FROM scored WHERE score <> 0
      ORDER BY p_name, ref_name"""
    }),

    // J7 — similarity phase 2 + per-input top-1 with threshold 0.1
    // (Geocode.py:70-89).
    QueryDef("j7_similarity_top1", (s, dir) => {
      val inputs = t("part")(s, dir).select(col("p_name")).distinct()
      val ref = inputs.sparkSession.createDataFrame(
        RefNames.map(Tuple1(_))).toDF("ref_name")
      GeocodeJoin.bestMatch(inputs, ref, "p_name", "ref_name", "p_name")
        .select(col("p_name"), col("ref_name"), col("score"), col("accepted"))
        .orderBy(col("p_name"))
    }, Some(j7OracleSql)),

    // J7, LARGE-GAZETTEER SCALE PATH — identical semantics through the
    // gram-inverted-index candidate join + bounded min(struct) top-1
    // (GeocodeJoin.bestMatchBlocked): never broadcasts or replicates the
    // reference table, so it holds when the gazetteer is country-scale.
    // Hash-gated against the SAME oracle as j7_similarity_top1.
    QueryDef("j7_similarity_top1_blocked", (s, dir) => {
      val inputs = t("part")(s, dir).select(col("p_name")).distinct()
      val ref = inputs.sparkSession.createDataFrame(
        RefNames.zipWithIndex).toDF("ref_name", "ref_id")
      GeocodeJoin.bestMatchBlocked(inputs, ref, "p_name", "ref_name",
          inputKey = "p_name", refKey = "ref_id")
        .select(col("p_name"), col("ref_name"), col("score"), col("accepted"))
        .orderBy(col("p_name"))
    }, Some(j7OracleSql)),

    // J8 — fuzzy semi-join serviceability tag, threshold 90
    // (geocode_utils.py:16-32).
    QueryDef("j8_fuzzy_semi_join", (s, dir) => {
      val inputs = t("customer")(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
      val svc = inputs.sparkSession.createDataFrame(
        ServiceableNames.map(Tuple1(_))).toDF("svc_name")
      GeocodeJoin.tagViable(inputs, svc, "c_mktsegment", "svc_name")
        .select(col("c_custkey"), col("c_mktsegment"), col("is_serviceable"))
        .orderBy(col("c_custkey"))
    }, Some {
      val ratios = ServiceableNames.map(n =>
        Sql.levRatio(Sql.normalizeLocation("c_mktsegment"),
          Sql.normalizeLocation(s"'$n'"))).mkString(", ")
      s"""
      SELECT c_custkey, c_mktsegment,
             CASE WHEN greatest($ratios) >= 90 THEN 'Yes' ELSE 'No' END AS is_serviceable
      FROM customer ORDER BY c_custkey"""
    }),

    // Corpus profiling: per-language token-count quartiles (exact
    // interpolated percentile — Spark `percentile` and DuckDB
    // `quantile_cont` share the linear-interpolation definition, and
    // quarter fractions over integer-valued doubles are exactly
    // representable, so the compare stays bit-exact).
    QueryDef("text_token_quantiles", (s, dir) => {
      t("documents")(s, dir)
        .select(col("lang"),
          TextAnalysisFns.wordCount(col("text")).cast("double").as("wc"))
        .groupBy(col("lang"))
        .agg(expr("percentile(wc, 0.25D)").as("p25"),
          expr("percentile(wc, 0.5D)").as("p50"),
          expr("percentile(wc, 0.75D)").as("p75"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }, Some(s"""
      WITH w AS (SELECT lang, CAST(len(${Sql.tokens("text")}) AS DOUBLE) AS wc
                 FROM documents)
      SELECT lang, quantile_cont(wc, 0.25) AS p25, quantile_cont(wc, 0.5) AS p50,
             quantile_cont(wc, 0.75) AS p75, count(*) AS n_docs
      FROM w GROUP BY lang ORDER BY lang""")),

    // F17 — datetime → ISO string at the serialization edge
    // (api/logs/routes.py:15-25).
    QueryDef("f17_date_format", (s, dir) => {
      t("orders")(s, dir)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("iso"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso
      FROM orders ORDER BY o_orderkey""")),

    // Text analysis: language-ID (stopword heuristic).
    QueryDef("text_langid", (s, dir) => {
      t("documents")(s, dir)
        .select(col("doc_id"), col("lang"),
          TextAnalysisFns.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }, Some {
      val toks = s"list_distinct(${Sql.tokens("lower(text)")})"
      val scores = TextAnalysisFns.LangMarkers.map { case (lang, ms) =>
        val arr = ms.map(m => s"'$m'").mkString("[", ", ", "]")
        s"len(list_intersect($toks, $arr)) AS s_$lang"
      }.mkString(", ")
      val langs = TextAnalysisFns.LangMarkers.map(_._1)
      val best  = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val cases = langs.map(l => s"WHEN s_$l = __best THEN '$l'").mkString(" ")
      s"""
      WITH sc AS (SELECT doc_id, lang, $scores FROM documents),
      b AS (SELECT *, $best AS __best FROM sc)
      SELECT doc_id, lang,
             CASE WHEN __best = 0 THEN 'und' $cases ELSE 'und' END AS lang_pred
      FROM b ORDER BY doc_id"""
    }),

    // Text analysis: quality scoring (length/punct/stopword ratios).
    QueryDef("text_quality", (s, dir) => {
      t("documents")(s, dir)
        .select(col("doc_id"),
          TextAnalysisFns.wordCount(col("text")).as("word_count"),
          TextAnalysisFns.punctRatio(col("text")).as("punct_ratio"),
          TextAnalysisFns.stopwordRatio(col("text")).as("stopword_ratio"),
          TextAnalysisFns.qualityScore(col("text")).as("quality_score"))
        .orderBy(col("doc_id"))
    }, Some {
      val toks = Sql.tokens("text")
      val lowToks = Sql.tokens("lower(text)")
      val en = TextAnalysisFns.LangMarkers.head._2.map(m => s"'$m'")
        .mkString("[", ", ", "]")
      val punct = s"CASE WHEN length(text) = 0 THEN 0.0 ELSE len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) / CAST(length(text) AS DOUBLE) END"
      val stop  = s"CASE WHEN len($lowToks) = 0 THEN 0.0 ELSE len(list_filter($lowToks, t -> list_contains($en, t))) / CAST(len($lowToks) AS DOUBLE) END"
      s"""
      WITH m AS (
        SELECT doc_id, len($toks) AS word_count,
               $punct AS punct_ratio, $stop AS stopword_ratio,
               least(length(text) / 500.0, 1.0) AS len_term
        FROM documents)
      SELECT doc_id, word_count, punct_ratio, stopword_ratio,
             (len_term + least(stopword_ratio * 4.0, 1.0) +
              greatest(0.0, 1.0 - punct_ratio * 4.0)) / 3.0 AS quality_score
      FROM m ORDER BY doc_id"""
    }),

    // Text analysis: token counting — whitespace + BPE-ish regex.
    QueryDef("text_tokens", (s, dir) => {
      t("documents")(s, dir)
        .select(col("doc_id"),
          TextAnalysisFns.wordCount(col("text")).as("ws_tokens"),
          TextAnalysisFns.bpeishTokenCount(col("text")).as("bpeish_tokens"))
        .orderBy(col("doc_id"))
    }, Some {
      val pat = TextAnalysisFns.BpeishPattern.replace("'", "''")
      s"""
      SELECT doc_id, len(${Sql.tokens("text")}) AS ws_tokens,
             len(regexp_extract_all(text, '$pat')) AS bpeish_tokens
      FROM documents ORDER BY doc_id"""
    }),

    // Text analysis: EXACT byte-level BPE token counting (closes F14's
    // lower bound): GPT-2 pretokenizer + byte→unicode mapping + the real
    // merge loop over the shipped GPT-2-format merges table. The Spark
    // side is one codegen'd static call per row over the scan — no
    // shuffle, cache-accelerated. The oracle replays ENCODING (not
    // training) in DuckDB: the same merges table as literal VALUES, each
    // pretoken's symbol string folded through every merge in rank order
    // (rank-order application ≡ the min-rank loop for any valid trained
    // table — BpeSpec pins the equivalence corpus-wide). The corpus is
    // single-spaced ASCII, where the RE2-safe pretokenizer below is
    // exactly the GPT-2 pattern (the lookahead branch only matters for
    // multi-whitespace runs).
    QueryDef("text_tokens_bpe", (s, dir) =>
      t("documents")(s, dir)
        // coalesce: BpeCountTokens is null-intolerant, but the oracle's
        // LEFT JOIN emits 0 for a token-less doc — NULL text must count
        // as 0, not propagate NULL (same guard as bpe_ids_fingerprint)
        .select(col("doc_id"),
          graft.expressions.BpeCountTokens(coalesce(col("text"), lit("")))
            .as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    , Some(s"""
      WITH ${Sql.bpeDocCountCtes}
      SELECT doc_id, n_bpe AS n_bpe_tokens FROM bpe_counts ORDER BY doc_id""")),

    // Tokenizer FERTILITY by language — BPE tokens per whitespace word,
    // THE standard multilingual tokenizer-quality metric (a language
    // with fertility ≫ others is being over-segmented and pays more
    // compute per word). Exact integer sums over the same exact-BPE
    // count used by text_tokens_bpe; the ratio is the one final double
    // division. Scale: one projection + one grouped agg on |langs| keys.
    QueryDef("bpe_fertility", (s, dir) =>
      t("documents")(s, dir)
        .select(col("lang"),
          graft.expressions.BpeCountTokens(coalesce(col("text"), lit("")))
            .as("nb"),
          size(graft.functions.TextAnalysisFns.tokens(col("text")))
            .cast("long").as("nw"))
        .groupBy(col("lang"))
        .agg(sum(col("nb")).as("bpe_tokens"), sum(col("nw")).as("words"))
        .select(col("lang"), col("bpe_tokens"), col("words"),
          (col("bpe_tokens").cast("double") / col("words").cast("double"))
            .as("fertility"))
        .orderBy(col("lang"))
    , Some {
      val toks = Sql.tokens("text")
      s"""
      WITH ${Sql.bpeDocCountCtes},
      w AS (SELECT d.doc_id, d.lang, CAST(len($toks) AS BIGINT) AS nw,
                   c.n_bpe AS nb
            FROM documents d JOIN bpe_counts c USING (doc_id))
      SELECT lang, CAST(sum(nb) AS BIGINT) AS bpe_tokens,
             CAST(sum(nw) AS BIGINT) AS words,
             CAST(sum(nb) AS DOUBLE) / CAST(sum(nw) AS DOUBLE) AS fertility
      FROM w GROUP BY lang ORDER BY lang"""
    }),

    // The same exact-BPE count under the o200k_base ENCODING RULES — the
    // tokenizer family the reference actually counts with (tiktoken for
    // gpt-4o-mini, `core/extract/ConvoDataExtract.py:74-82`): a base64
    // rank-file vocabulary (ranks double as merge priorities and ids),
    // the o200k pretokenizer regex, and the authentic tiktoken byte-pair
    // loop. The committed fixture is a corpus-trained 48-merge subset in
    // the real file format (the full published file is ~4 MB) — loading
    // OpenAI's o200k_base.tiktoken through the same loader is a data
    // swap. Oracle: merge pairs recovered from the rank file, folded in
    // rank order under the RE2-safe o200k pretokenizer (fold ≡ tiktoken
    // loop law spec-pinned corpus-wide). 48 > 32 merges, so this pins
    // DIFFERENT counts than text_tokens_bpe — the two encodings are
    // independently gated.
    QueryDef("text_tokens_bpe_o200k", (s, dir) =>
      t("documents")(s, dir)
        .select(col("doc_id"),
          graft.expressions.BpeCountTokens(coalesce(col("text"), lit("")),
            graft.expressions.BpeOps.o200kFixture).as("n_bpe_tokens_o200k"))
        .orderBy(col("doc_id"))
    , Some(s"""
      WITH ${Sql.bpeO200kDocCountCtes}
      SELECT doc_id, n_bpe AS n_bpe_tokens_o200k FROM bpe_counts ORDER BY doc_id""")),

    // BPE vocabulary statistics: corpus-wide token frequencies over the
    // EXACT encoding — the coverage report a tokenizer pipeline prints
    // (which merges actually fire, what the head of the distribution
    // looks like). Spark: explode the codegen'd token sequence → one
    // map-side-combinable count shuffle → top 20 (count desc, token asc
    // — unique tie-break, rank boundary deterministic). Oracle: the
    // shared encoding-replay CTEs, then the same unnest + group.
    QueryDef("bpe_token_freq", (s, dir) =>
      t("documents")(s, dir)
        .select(explode(graft.expressions.BpeEncodeTokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)
    , Some(s"""
      WITH ${Sql.bpeDocCountCtes}
      SELECT token, count(*) AS n
      FROM (SELECT unnest(str_split(fs, ' ')) AS token FROM bpe_sym)
      GROUP BY token ORDER BY n DESC, token LIMIT 20""")),

    // Encode-to-ids — what actually feeds a training tensor: ids are the
    // derived vocabulary (256 base bytes, merges at 256+rank). The gate
    // pins the FULL id sequence order-sensitively without an array output
    // (forbidden in oracles): an order-sensitive fold hash, the count,
    // and the max id. Oracle: the shared encoding CTEs now carry pretoken
    // ordinality; tokens join the generated vocab VALUES, the per-doc id
    // list reassembles in (pretoken, symbol) order, and the same integer
    // fold runs in SQL. All integer-exact.
    QueryDef("bpe_ids_fingerprint", (s, dir) => {
      // coalesce: the oracle's LEFT JOIN emits (0, 0, -1) for token-less
      // docs, so NULL text must encode as empty, not propagate NULL
      val ids = graft.expressions.BpeEncodeIds(coalesce(col("text"), lit("")))
      t("documents")(s, dir)
        .select(col("doc_id"),
          size(ids).cast("long").as("n_tokens"),
          TextAnalysisFns.bpeIdsFoldHash(ids).as("ids_hash"),
          coalesce(array_max(ids), lit(-1)).cast("long").as("max_id"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH ${Sql.bpeIdCtes}
      SELECT doc_id, n_toks AS n_tokens, doc_hash AS ids_hash, max_id
      FROM bpe_doc_ids ORDER BY doc_id""")),

    // Composite training-data filter — the realistic production shape:
    // keep documents that pass quality, are detected English, and are
    // their exact-dup cluster's keeper — all in one plan (filters fused
    // over one scan + a broadcast semi-join against the keeper set).
    QueryDef("pipeline_doc_filter", (s, dir) => {
      val docs = t("documents")(s, dir)
      val keepers = docs.groupBy(md5(col("text")).as("__h"))
        .agg(min(col("doc_id")).as("keep_id"))
        .select(col("keep_id"))
      docs.join(broadcast(keepers), col("doc_id") === col("keep_id"), "left_semi")
        .where(TextAnalysisFns.qualityScore(col("text")) >= 0.5 &&
               TextAnalysisFns.langId(col("text")) === "en")
        .select(col("doc_id"), col("lang"),
          TextAnalysisFns.qualityScore(col("text")).as("quality_score"))
        .orderBy(col("doc_id"))
    }, Some {
      val toks = Sql.tokens("text")
      val lowToks = Sql.tokens("lower(text)")
      val en = TextAnalysisFns.LangMarkers.head._2.map(m => s"'$m'")
        .mkString("[", ", ", "]")
      val punct = s"CASE WHEN length(text) = 0 THEN 0.0 ELSE len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) / CAST(length(text) AS DOUBLE) END"
      val stop  = s"CASE WHEN len($lowToks) = 0 THEN 0.0 ELSE len(list_filter($lowToks, t -> list_contains($en, t))) / CAST(len($lowToks) AS DOUBLE) END"
      val quality = s"(least(length(text) / 500.0, 1.0) + least(($stop) * 4.0, 1.0) + greatest(0.0, 1.0 - ($punct) * 4.0)) / 3.0"
      val distToks = s"list_distinct($lowToks)"
      val scores = TextAnalysisFns.LangMarkers.map { case (lang, ms) =>
        val arr = ms.map(m => s"'$m'").mkString("[", ", ", "]")
        s"len(list_intersect($distToks, $arr)) AS s_$lang"
      }.mkString(", ")
      val langs = TextAnalysisFns.LangMarkers.map(_._1)
      val best  = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val cases = langs.map(l => s"WHEN s_$l = __best THEN '$l'").mkString(" ")
      s"""
      WITH keepers AS (
        SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text)),
      sc AS (SELECT doc_id, lang, text, $scores FROM documents),
      lp AS (SELECT *, $best AS __best FROM sc),
      pred AS (SELECT doc_id, lang, text,
                      CASE WHEN __best = 0 THEN 'und' $cases ELSE 'und' END AS lang_pred
               FROM lp)
      SELECT doc_id, lang, $quality AS quality_score
      FROM pred
      WHERE doc_id IN (SELECT keep_id FROM keepers)
        AND ($quality) >= 0.5 AND lang_pred = 'en'
      ORDER BY doc_id"""
    }),

    // Filter-ablation attribution for the composite doc filter: per
    // rule (quality ≥ 0.5, lang = en, dedup keeper) how many docs fail
    // it at all and how many fail ONLY it — the marginal cost each rule
    // adds to the stack, the number a curation review actually argues
    // about. ONE corpus pass: three boolean flags, conditional sums in a
    // single aggregate. All integer counts.
    QueryDef("quality_ablation_report", (s, dir) => {
      val docs = t("documents")(s, dir)
      val keepers = docs.groupBy(md5(col("text")).as("__h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), lit(true).as("__keep"))
      val flags = docs.join(broadcast(keepers), Seq("doc_id"), "left")
        .select(
          (TextAnalysisFns.qualityScore(col("text")) >= 0.5).as("q"),
          (TextAnalysisFns.langId(col("text")) === "en").as("l"),
          coalesce(col("__keep"), lit(false)).as("k"))
      flags.agg(
        count(lit(1)).as("n_docs"),
        sum(when(!col("q"), 1L).otherwise(0L)).as("fail_quality"),
        sum(when(!col("l"), 1L).otherwise(0L)).as("fail_lang"),
        sum(when(!col("k"), 1L).otherwise(0L)).as("fail_dedup"),
        sum(when(!col("q") && col("l") && col("k"), 1L).otherwise(0L)).as("only_quality"),
        sum(when(col("q") && !col("l") && col("k"), 1L).otherwise(0L)).as("only_lang"),
        sum(when(col("q") && col("l") && !col("k"), 1L).otherwise(0L)).as("only_dedup"),
        sum(when(col("q") && col("l") && col("k"), 1L).otherwise(0L)).as("pass_all"))
    }, Some {
      val lowToks = Sql.tokens("lower(text)")
      val en = TextAnalysisFns.LangMarkers.head._2.map(m => s"'$m'")
        .mkString("[", ", ", "]")
      val punct = s"CASE WHEN length(text) = 0 THEN 0.0 ELSE len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) / CAST(length(text) AS DOUBLE) END"
      val stop  = s"CASE WHEN len($lowToks) = 0 THEN 0.0 ELSE len(list_filter($lowToks, t -> list_contains($en, t))) / CAST(len($lowToks) AS DOUBLE) END"
      val quality = s"(least(length(text) / 500.0, 1.0) + least(($stop) * 4.0, 1.0) + greatest(0.0, 1.0 - ($punct) * 4.0)) / 3.0"
      val distToks = s"list_distinct($lowToks)"
      val scores = TextAnalysisFns.LangMarkers.map { case (lang, ms) =>
        val arr = ms.map(m => s"'$m'").mkString("[", ", ", "]")
        s"len(list_intersect($distToks, $arr)) AS s_$lang"
      }.mkString(", ")
      val langs = TextAnalysisFns.LangMarkers.map(_._1)
      val best  = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val cases = langs.map(l => s"WHEN s_$l = __best THEN '$l'").mkString(" ")
      s"""
      WITH keepers AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      sc AS (SELECT doc_id, text, $scores FROM documents),
      lp AS (SELECT *, $best AS __best FROM sc),
      fl AS (SELECT doc_id,
                    ($quality) >= 0.5 AS q,
                    (CASE WHEN __best = 0 THEN 'und' $cases ELSE 'und' END) = 'en' AS l,
                    doc_id IN (SELECT doc_id FROM keepers) AS k
             FROM lp)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN NOT q THEN 1 ELSE 0 END) AS BIGINT) AS fail_quality,
             CAST(sum(CASE WHEN NOT l THEN 1 ELSE 0 END) AS BIGINT) AS fail_lang,
             CAST(sum(CASE WHEN NOT k THEN 1 ELSE 0 END) AS BIGINT) AS fail_dedup,
             CAST(sum(CASE WHEN NOT q AND l AND k THEN 1 ELSE 0 END) AS BIGINT) AS only_quality,
             CAST(sum(CASE WHEN q AND NOT l AND k THEN 1 ELSE 0 END) AS BIGINT) AS only_lang,
             CAST(sum(CASE WHEN q AND l AND NOT k THEN 1 ELSE 0 END) AS BIGINT) AS only_dedup,
             CAST(sum(CASE WHEN q AND l AND k THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
      FROM fl"""
    }),

    // Text analysis: rolling-hash document fingerprint.
    QueryDef("text_fingerprint", (s, dir) => {
      t("documents")(s, dir)
        .select(col("doc_id"),
          TextAnalysisFns.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      SELECT doc_id, ${Sql.rollingFingerprint(Sql.tokens("text"))} AS fingerprint
      FROM documents ORDER BY doc_id"""))
  )
}
