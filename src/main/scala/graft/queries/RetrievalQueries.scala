package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.CdcChunkStarts
import graft.functions.TextAnalysisFns
import graft.operators.Sampling

/** Round-6 retrieval & ingestion wave: the text-retrieval pair a corpus
  * pipeline serves queries with (distributed inverted-index build, BM25
  * ranking), exact per-group reservoir sampling on the bounded top-k
  * aggregate, content-defined chunking for chunk-level dedup, and
  * source/sink roundtrips through the two remaining self-describing
  * formats (ORC, JSON lines) — proving the engine reads more than
  * parquet/CSV.
  */
object RetrievalQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  /** Scratch dir for format roundtrips — inside the repo's target/, keyed
    * by sf dir so concurrent sf runs never collide; overwrite mode keeps
    * the query idempotent.
    */
  private def scratch(dir: String, tag: String): String =
    s"target/tmp/roundtrip_${tag}_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** BM25 (k1=1.2, b=0.75) per-document scores for the fixed two-term
    * query ("table", "spark") — the scoring core shared by `text_bm25`
    * and `retrieval_rrf_fusion`. Rational Robertson idf (see the
    * text_bm25 comment), per-term scores in fixed columns summed in fixed
    * order, so doubles are bit-identical to [[bm25Sc2Ctes]]. Returns
    * (doc_id, score) with doc_id in its source type.
    */
  /** The PERSISTED sparse leg is the PER-DOCUMENT POSTING frame
    * `(doc_id, dl, tf_table, tf_spark)` — one row per tokenized doc,
    * every value a function of THAT doc's text alone. That per-file
    * decomposition is what makes the front incrementally maintainable
    * ([[graft.operators.FrontStore.frameIncremental]], round-15 ask
    * #5): an additions-only corpus change tokenizes only the NEW
    * document files and unions their rows with the stored postings —
    * at 100 TB the daily delta, not the corpus. The corpus-global
    * score layer (idf from df counts, avgdl from total length) is NOT
    * persisted: it recomputes from the posting rows on read — an
    * aggregation over the tiny front, exact integer counts either way,
    * so the scores are bit-identical whichever path built the
    * snapshot.
    */
  private[graft] def bm25ScoresCached(s: org.apache.spark.sql.SparkSession,
                                        dir: String): org.apache.spark.sql.DataFrame =
    bm25ScoresFromPostings(
      graft.operators.FrontStore.frameIncremental(s,
        s"bm25-post:$dir:terms=table,spark", dir)(
        bm25DocPostings(Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text")))) { added =>
        val docFiles = added.filter(_.contains("/documents"))
        if (docFiles.isEmpty)
          bm25DocPostings(s.range(0)
            .select(col("id").as("doc_id"), lit("").as("text")))
        else
          bm25DocPostings(s.read.parquet(docFiles: _*)
            .select(col("doc_id"), col("text")))
      })

  /** Per-document posting rows: `dl` = token count, `tf_*` = the fixed
    * query terms' frequencies; docs with zero tokens yield no row (the
    * `toks`-derived `dl` of [[bm25Sc2Ctes]] has the same convention).
    * Every value is a per-row function of the token ARRAY (size +
    * filtered sizes — exact integer counts, identical to counting the
    * exploded rows), so the whole build is a narrow map over one scan:
    * no explode, no aggregation exchange at all (round-16; previously
    * the corpus' every token was materialized as a row and hash-
    * aggregated back per doc). Each row still depends on one document
    * only — the incremental-merge contract.
    */
  private[graft] def bm25DocPostings(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), TextAnalysisFns.tokens(col("text")).as("__ts"))
      .select(col("doc_id"),
        size(col("__ts")).cast("long").as("dl"),
        size(filter(col("__ts"), _ === "table")).cast("long").as("tf_table"),
        size(filter(col("__ts"), _ === "spark")).cast("long").as("tf_spark"))
      .where(col("dl") > 0)

  /** The corpus-global BM25 (k1=1.2, b=0.75) score layer over the
    * posting frame — the exact operation tree of [[bm25Sc2Ctes]]'s `s`
    * CTE, applied per fixed term column (a per-(doc,term) `sc` row
    * with `max(CASE term)` pivot and this per-doc two-column form
    * compute the SAME double for each (doc, term), and the final sum
    * runs in the same fixed order). Returns (doc_id, score) for
    * term-matching docs only, like the original.
    */
  private[graft] def bm25ScoresFromPostings(
      post: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val stats = post.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"),
      count(when(col("tf_table") > 0, lit(1))).as("df_table"),
      count(when(col("tf_spark") > 0, lit(1))).as("df_spark"))
    val avgdl = col("total_len").cast("double") / col("n_docs").cast("double")
    def idf(dfc: org.apache.spark.sql.Column) =
      (col("n_docs").cast("double") - dfc.cast("double") + lit(0.5)) /
        (dfc.cast("double") + lit(0.5))
    def tfpart(tf: org.apache.spark.sql.Column) =
      (tf.cast("double") * lit(2.2)) /
        (tf.cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
    post.where(col("tf_table") > 0 || col("tf_spark") > 0)
      .crossJoin(broadcast(stats))
      .withColumn("s_table",
        when(col("tf_table") > 0, idf(col("df_table")) * tfpart(col("tf_table"))))
      .withColumn("s_spark",
        when(col("tf_spark") > 0, idf(col("df_spark")) * tfpart(col("tf_spark"))))
      .withColumn("score",
        coalesce(col("s_table"), lit(0.0)) + coalesce(col("s_spark"), lit(0.0)))
      .select(col("doc_id"), col("score"))
  }

  /** The one-shot (unfronted) score build — plan-audit surface and the
    * reference implementation the posting/score split must reproduce.
    */
  private[graft] def bm25TwoTermScores(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    bm25ScoresFromPostings(bm25DocPostings(docs))

  /** The DuckDB CTE chain mirroring [[bm25TwoTermScores]]: `toks` … `sc2`
    * with `sc2(doc_id BIGINT, score DOUBLE)`. Compose as
    * `WITH $bm25Sc2Ctes, …`.
    */
  private[queries] def bm25Sc2Ctes: String = s"""
      toks AS (
        SELECT doc_id, unnest(${Sql.tokens("text")}) AS term FROM documents),
      dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
      stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
      tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM toks WHERE term IN ('table', 'spark') GROUP BY 1, 2),
      dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      s AS (
        SELECT tf.doc_id, tf.term,
               ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5))
               * ((CAST(tf AS DOUBLE) * 2.2)
                  / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
                      * (CAST(dl AS DOUBLE)
                         / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS sc
        FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
      p AS (
        SELECT doc_id,
               max(CASE WHEN term = 'table' THEN sc END) AS s_table,
               max(CASE WHEN term = 'spark' THEN sc END) AS s_spark
        FROM s GROUP BY doc_id),
      sc2 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     coalesce(s_table, 0.0) + coalesce(s_spark, 0.0) AS score
              FROM p)"""

  val defs: Seq[QueryDef] = Seq(

    // Exact k-per-group uniform sample via the bounded TopKAgg (state ≤2k
    // per partial, shuffle carries O(groups·k) — see
    // Sampling.reservoirPerGroup). The oracle takes the row_number-window
    // route over the identical 48-bit seeded hash: agg ≡ window is the
    // correctness claim, the bounded state is the scale claim.
    QueryDef("sample_reservoir", (s, dir) =>
      Sampling.reservoirPerGroup(
          t("orders")(s, dir).select(col("o_orderpriority"), col("o_orderkey")),
          "o_orderpriority", "o_orderkey", k = 10, seed = "res0")
        .orderBy(col("o_orderpriority"), col("rn"))
    , Some("""
      WITH h AS (
        SELECT o_orderpriority, o_orderkey,
               CAST(concat('0x', substr(md5('res0:' || CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT) AS h48
        FROM orders),
      r AS (
        SELECT o_orderpriority, o_orderkey, h48,
               CAST(row_number() OVER (PARTITION BY o_orderpriority
                                       ORDER BY h48, o_orderkey) AS INT) AS rn
        FROM h)
      SELECT o_orderpriority, rn, o_orderkey, h48
      FROM r WHERE rn <= 10
      ORDER BY o_orderpriority, rn""")),

    // Per-document keyword extraction: top-3 terms by tf/df — TF-IDF's
    // ordering without the log (idf is monotone in 1/df, so the top-k by
    // tf/df equals the top-k by tf·idf for any corpus; the ratio is ONE
    // double division, portable, where log(N/df) is libm). Per-doc
    // window sort is bounded by the doc's own distinct-term count.
    QueryDef("doc_top_terms", (s, dir) => {
      val tf = t("documents")(s, dir)
        .where(col("doc_id") < 200)
        .select(col("doc_id"),
          explode(graft.functions.TextAnalysisFns.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(df, Seq("term"))
        .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .where(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
          col("score"))
        .orderBy(col("doc_id"), col("rank"))
    }, Some {
      val toks = Sql.tokens("text")
      s"""
      WITH tk AS (SELECT doc_id, unnest($toks) AS term
                  FROM documents WHERE doc_id < 200),
      tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM tk GROUP BY 1, 2),
      df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      sc AS (SELECT doc_id, tf.term, tf, df,
                    CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS score
             FROM tf JOIN df ON df.term = tf.term),
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, term) AS INT) AS rank
            FROM sc)
      SELECT doc_id, rank, term, tf, df, score
      FROM r WHERE rank <= 3
      ORDER BY doc_id, rank"""
    }),

    // Collocation mining by LIFT — P(ab)/(P(a)·P(b)) without log-PMI
    // (same ranking, zero libm). Factored as
    // (c_ab·N_uni)/(N_bg·c_a) × (N_uni/c_b): every integer product stays
    // far below 2⁶³ even at 10⁸-token corpora (the single-fraction form
    // squares N_uni and overflows BIGINT two decades earlier), and both
    // engines compute the identical two-division, one-multiply chain.
    // Min support 5; top-20 by (lift DESC, bigram) — deterministic.
    QueryDef("bigram_lift_top", (s, dir) => {
      val toks = t("documents")(s, dir)
        .select(col("doc_id"),
          graft.functions.TextAnalysisFns.tokens(col("text")).as("ts"))
      val uni = toks.select(explode(col("ts")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val nUni = uni.agg(sum(col("c")).as("n_uni"))
      // guard size(ts) >= 2 EXPLICITLY: Spark's sequence(1, 0) yields the
      // DESCENDING array [1, 0] (not empty, unlike DuckDB's
      // generate_series), which would emit null-bigram rows that only
      // happen to vanish in the inner joins below — make the short-doc
      // case produce a genuinely empty array instead.
      val bg = toks
        .select(explode(expr(
          """CASE WHEN size(ts) >= 2
               THEN transform(sequence(1, size(ts) - 1),
                              i -> concat(ts[i-1], ' ', ts[i]))
               ELSE CAST(array() AS ARRAY<STRING>) END"""))
          .as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
        .where(col("c_ab") >= 5)
      val nBg = toks.select(
        greatest(size(col("ts")) - 1, lit(0)).cast("long").as("k"))
        .agg(sum(col("k")).as("n_bg"))
      bg
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
        .join(uni.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
        .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBg))
        .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
          ((col("c_ab") * col("n_uni")).cast("double") /
            (col("n_bg") * col("c_a")).cast("double") *
            (col("n_uni").cast("double") / col("c_b").cast("double")))
            .as("lift"))
        .orderBy(col("lift").desc, col("bigram"))
        .limit(20)
    }, Some {
      val toks = Sql.tokens("text")
      s"""
      WITH d AS (SELECT doc_id, $toks AS ts FROM documents),
      uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c
              FROM (SELECT unnest(ts) AS w FROM d) GROUP BY w),
      nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uni),
      bg0 AS (SELECT unnest(list_transform(generate_series(1, greatest(len(ts) - 1, 0)),
                     i -> ts[i] || ' ' || ts[i+1])) AS bigram
              FROM d),
      bg AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c_ab
             FROM bg0 GROUP BY bigram HAVING count(*) >= 5),
      nb AS (SELECT CAST(sum(greatest(len(ts) - 1, 0)) AS BIGINT) AS n_bg FROM d),
      j AS (SELECT bigram, c_ab,
                   split_part(bigram, ' ', 1) AS w1,
                   split_part(bigram, ' ', 2) AS w2
            FROM bg)
      SELECT bigram, c_ab, a.c AS c_a, b.c AS c_b,
             CAST(c_ab * nu.n_uni AS DOUBLE) / CAST(nb.n_bg * a.c AS DOUBLE)
               * (CAST(nu.n_uni AS DOUBLE) / CAST(b.c AS DOUBLE)) AS lift
      FROM j JOIN uni a ON a.w = j.w1 JOIN uni b ON b.w = j.w2
      CROSS JOIN nu CROSS JOIN nb
      ORDER BY lift DESC, bigram LIMIT 20"""
    }),

    // WEIGHTED k-per-source sample without replacement (priority
    // sampling: q = w/u, u = (h48+1)/2^48 — libm-free, so the oracle
    // reproduces every priority double bit-for-bit; see
    // Sampling.priorityPerGroup). Weight = document length + 1: longer
    // docs sampled proportionally more often, the length-weighted
    // subsample a token-budgeted curation pass actually wants.
    QueryDef("sample_weighted_priority", (s, dir) =>
      graft.operators.Sampling.priorityPerGroup(
          t("documents")(s, dir).select(col("source"), col("doc_id"),
            // null text → weight 1 (a null weight would drop the row from
            // the aggregate while the oracle ranks it NULLS LAST — guard
            // the divergence even though the corpus has no null text)
            (coalesce(length(col("text")), lit(0)) + lit(1)).as("w")),
          "source", "doc_id", col("w"), k = 5, seed = "pri0")
        .orderBy(col("source"), col("rn"))
    , Some("""
      WITH h AS (
        SELECT source, doc_id,
               CAST(concat('0x', substr(md5('pri0:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h48,
               coalesce(length(text), 0) + 1 AS w
        FROM documents),
      p AS (
        SELECT source, doc_id,
               CAST(w AS DOUBLE) / (CAST(h48 + 1 AS DOUBLE) / CAST(281474976710656 AS DOUBLE)) AS priority
        FROM h),
      r AS (
        SELECT source, doc_id, priority,
               CAST(row_number() OVER (PARTITION BY source
                                       ORDER BY priority DESC, doc_id) AS INT) AS rn
        FROM p)
      SELECT source, rn, doc_id, priority
      FROM r WHERE rn <= 5
      ORDER BY source, rn""")),

    // Budget-capped weighted selection: per source, admit documents in
    // priority order (the same q = w/u priority-sampling key) until a
    // 3000-token budget is spent — the "fill each domain's quota with a
    // weighted draw" curation step that composes sampling with mixture
    // budgets. The kept set is pinned by an order-sensitive fold hash
    // ((a·31 + id) mod 1e9+7 over ids in admission order), so the oracle
    // checks WHICH docs were taken and in what order, not just counts.
    // Scale note: the per-source priority sort is inherent to budgeted
    // selection; at extreme per-source cardinality the admission
    // threshold is found on the count-grid first (profile_key_skew's
    // trick) and only candidates above it are sorted.
    QueryDef("mixture_priority_sample", (s, dir) => {
      val budget = 3000L
      val base = t("documents")(s, dir).select(col("source"), col("doc_id"),
        size(graft.functions.TextAnalysisFns.tokens(col("text")))
          .cast("long").as("n_toks"))
      val q = graft.operators.Sampling.priorityKey("mix0",
        col("doc_id"), col("n_toks") + lit(1L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("priority").desc, col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val kept = base.withColumn("priority", q)
        .withColumn("cum", sum(col("n_toks")).over(w))
        .where(col("cum") <= budget)
      kept.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_toks")).as("tokens_kept"),
          aggregate(
            transform(sort_array(collect_list(struct(
              (-col("priority")).as("negp"), col("doc_id")))),
              x => x.getField("doc_id")),
            lit(0L), (a, id) => (a * 31 + id) % 1000000007L).as("kept_hash"))
        .orderBy(col("source"))
    }, Some(s"""
      WITH b AS (
        SELECT source, doc_id,
               CAST(len(${Sql.tokens("text")}) AS BIGINT) AS n_toks,
               CAST(concat('0x', substr(md5('mix0:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h48
        FROM documents),
      p AS (
        SELECT source, doc_id, n_toks,
               CAST(n_toks + 1 AS DOUBLE) / (CAST(h48 + 1 AS DOUBLE) / CAST(281474976710656 AS DOUBLE)) AS priority
        FROM b),
      c AS (
        SELECT source, doc_id, n_toks, priority,
               sum(n_toks) OVER (PARTITION BY source
                 ORDER BY priority DESC, doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM p),
      k AS (SELECT * FROM c WHERE cum <= 3000)
      SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(n_toks) AS BIGINT) AS tokens_kept,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list(doc_id ORDER BY priority DESC, doc_id)),
               (a, id) -> (a * 31 + id) % 1000000007) AS BIGINT) AS kept_hash
      FROM k GROUP BY source ORDER BY source""")),

    // Distributed inverted-index build: distinct (doc, term) postings →
    // per-term document frequency + a capped, doc-id-ordered postings
    // head (cap 100 — real indexes shard the tail; the df column keeps
    // the true count). Two hash-shuffles on bounded keys (term), postings
    // ordered by a per-term window BEFORE the aggregate so no task ever
    // holds an uncapped list. String-joined postings because oracle
    // outputs never carry arrays.
    QueryDef("text_inverted_index", (s, dir) => {
      val posting = t("documents")(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(TextAnalysisFns.tokens(col("text")))).as("term"))
      val dfreq = posting.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("term")).orderBy(col("doc_id"))
      val capped = posting.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 100)
      capped.groupBy(col("term"))
        .agg(array_join(transform(array_sort(collect_list(col("doc_id"))),
          _.cast("string")), ",").as("postings"))
        .join(dfreq, Seq("term"))
        .select(col("term"), col("df"), col("postings"))
        .orderBy(col("term"))
    }, Some(s"""
      WITH toks AS (
        SELECT doc_id, unnest(list_distinct(${Sql.tokens("text")})) AS term
        FROM documents),
      dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY 1),
      capped AS (
        SELECT term, doc_id,
               row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        FROM toks),
      p AS (
        SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        FROM capped WHERE rn <= 100 GROUP BY term)
      SELECT term, df, postings FROM p JOIN dfreq USING (term)
      ORDER BY term""")),

    // BM25 ranking (k1=1.2, b=0.75) for a fixed two-term query, top 20 by
    // the bounded global TopKAgg — no full sort of the scored set. The
    // idf is the RATIONAL Robertson form (N−df+0.5)/(df+0.5), not the
    // usual log of it: log is monotone (ranking unchanged) but libm
    // rounding is not portable, while +,−,×,÷ are IEEE-exact in both
    // engines — the identical expression tree yields bit-identical
    // doubles. Per-term scores land in fixed columns (conditional max)
    // and sum in a FIXED order — never a float SUM aggregate, whose
    // partition-dependent order would unpin the result.
    QueryDef("text_bm25", (s, dir) => {
      bm25ScoresCached(s, dir)
        .groupBy().agg(graft.expressions.TopKAgg.topK(
          struct(col("score"), col("doc_id").cast("long").as("id")), 20).as("__top"))
        .select(posexplode(col("__top")).as(Seq("__pos", "__e")))
        .select((col("__pos") + 1).cast("int").as("rank"),
          col("__e.id").as("doc_id"), col("__e.score").as("score"))
        .orderBy(col("rank"))
    }, Some(s"""
      WITH $bm25Sc2Ctes,
      r AS (SELECT doc_id, score,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
            FROM sc2)
      SELECT rank, doc_id, score FROM r WHERE rank <= 20 ORDER BY rank""")),

    // Content-defined chunking (see CdcChunkStarts): boundaries from a
    // rolling 4-codepoint content hash, expected chunk ≈64 chars —
    // insertion-stable, so chunk_md5 is the dedup key that survives
    // near-identical documents. One codegen'd pass per doc to find
    // starts, then a narrow explode; no shuffle until a consumer groups
    // by chunk_md5. The oracle rebuilds the identical boundary set by
    // exploding positions.
    QueryDef("text_cdc_chunks", (s, dir) => {
      val docs = t("documents")(s, dir)
        .select(col("doc_id"), col("text"),
          CdcChunkStarts(col("text")).as("__starts"))
      docs.select(col("doc_id"), col("text"), col("__starts"),
          posexplode(col("__starts")).as(Seq("__i", "st")))
        .withColumn("en",
          coalesce(try_element_at(col("__starts"), col("__i") + lit(2)),
            length(col("text"))))
        .select(col("doc_id"),
          (col("__i") + 1).cast("int").as("chunk_idx"),
          (col("en") - col("st")).cast("int").as("chunk_len"),
          md5(expr("substr(text, st + 1, en - st)")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }, Some("""
      WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
      pos AS (
        SELECT doc_id, text, unnest(range(4, length(text) + 1)) AS i FROM d),
      b AS (
        SELECT doc_id, i FROM pos
        WHERE ((((ord(substr(text, i - 3, 1)) * 31 + ord(substr(text, i - 2, 1))) * 31
                 + ord(substr(text, i - 1, 1))) * 31 + ord(substr(text, i, 1))) % 64) = 0
          AND i < length(text)),
      starts AS (
        SELECT doc_id, 0 AS st FROM d
        UNION ALL SELECT doc_id, i AS st FROM b),
      ch AS (
        SELECT doc_id, st,
               lead(st) OVER (PARTITION BY doc_id ORDER BY st) AS nxt,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY st) AS INT) AS chunk_idx
        FROM starts)
      SELECT c.doc_id, c.chunk_idx,
             CAST(coalesce(c.nxt, length(d.text)) - c.st AS INT) AS chunk_len,
             md5(substr(d.text, c.st + 1, coalesce(c.nxt, length(d.text)) - c.st)) AS chunk_md5
      FROM ch c JOIN d ON c.doc_id = d.doc_id
      ORDER BY c.doc_id, chunk_idx""")),

    // ORC source + sink roundtrip: write the fact columns to ORC, read
    // them back, aggregate — the oracle runs the same aggregate on the
    // original parquet, so any write- or read-side corruption
    // (encoding, type mapping, nulls) breaks the hash. Decimal-sum →
    // double, the q1_agg exactness idiom.
    QueryDef("s14_orc_roundtrip", (s, dir) => {
      val path = scratch(dir, "orc")
      t("lineitem")(s, dir)
        .select(col("l_orderkey"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // JSON-lines source + sink roundtrip with an EXPLICIT read schema
    // (schema inference would re-scan the data — never at 100 TB).
    // Decimal survives the text roundtrip exactly; the date goes through
    // as an ISO string. Aggregates are order-independent (count / decimal
    // sum / min / max) so the roundtrip is the only thing under test.
    QueryDef("s15_json_roundtrip", (s, dir) => {
      val path = scratch(dir, "json")
      t("orders")(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,2)").as("price"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .write.mode("overwrite").json(path)
      s.read
        .schema("o_orderkey BIGINT, o_orderstatus STRING, price DECIMAL(18,2), day STRING")
        .json(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("sum_price"),
          min(col("day")).as("first_day"),
          max(col("day")).as("last_day"))
        .orderBy(col("o_orderstatus"))
    }, Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             min(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
             max(strftime(o_orderdate, '%Y-%m-%d')) AS last_day
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))
  )
}
