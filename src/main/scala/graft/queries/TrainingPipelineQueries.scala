package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysisFns

/** Round-3 LLM-training-data operators over `documents`: sliding-window
  * chunking (the tokenize-and-split step before packing), contiguous
  * sequence packing by token budget, and benchmark decontamination
  * (n-gram overlap against a held-out eval source). All integer/md5
  * exact — no float anywhere.
  */
object TrainingPipelineQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  /** chunk size / stride (overlap = size − stride) */
  private val C = 20
  private val S = 15
  /** packing token budget per training sequence */
  private val B = 256
  /** packing shard count (at scale: pick ~#cores × a few) */
  private val NShards = 16
  /** mixture target weights, per-mille by language (integer-exact), and
    * the total token budget the mixture aims at
    */
  private val MixtureWeightsPm: Map[String, Long] =
    Map("en" -> 400L, "de" -> 200L, "es" -> 150L, "fr" -> 150L, "zh" -> 100L)
  private val MixtureBudget = 50000L
  private def mixtureWeightsSqlValues: String =
    MixtureWeightsPm.toSeq.sortBy(_._1)
      .map { case (l, w) => s"('$l',$w)" }.mkString(",")

  /** Sequence packing over `documents`. `shards = Some(n)` (the default
    * query form) partitions the cumulative window by `doc_id % n` — each
    * shard packs its own sequence space in parallel. `shards = None` is
    * the global form: ONE total order, ONE WindowExec task — correct, but
    * only for inputs small enough to sort on a single executor.
    */
  def packed(docs: org.apache.spark.sql.DataFrame,
             shards: Option[Int],
             nToks: org.apache.spark.sql.Column =
               TextAnalysisFns.wordCount(col("text")).cast("long"))
      : org.apache.spark.sql.DataFrame = {
    val sharded = docs
      .select(col("doc_id"), nToks.as("n_toks"))
      .withColumn("shard",
        shards.map(n => (col("doc_id") % n).cast("int")).getOrElse(lit(0)))
    val cum = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val packedDf = sharded
      .withColumn("prev_cum", coalesce(sum(col("n_toks")).over(cum), lit(0L)))
      .groupBy(col("shard"), expr(s"prev_cum DIV $B").as("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("total_toks"))
    if (shards.isDefined) packedDf.orderBy(col("shard"), col("seq_id"))
    else packedDf.drop("shard").orderBy(col("seq_id"))
  }

  val defs: Seq[QueryDef] = Seq(

    // Packing attention-leakage report: when packed sequences are trained
    // WITHOUT block-diagonal attention masking, every cross-document
    // position pair inside a pack leaks. Per pack with doc lengths lᵢ the
    // ordered cross-doc pairs are (Σlᵢ)² − Σlᵢ² — exact integers from
    // the SAME shard-partitioned packing as text_packing; the leakage
    // share is the one final division. The report a pretraining run reads
    // before deciding whether packing needs the mask.
    QueryDef("pack_attention_leakage", (s, dir) => {
      val sharded = t("documents")(s, dir)
        .select(col("doc_id"),
          TextAnalysisFns.wordCount(col("text")).cast("long").as("n_toks"))
        .withColumn("shard", (col("doc_id") % NShards).cast("int"))
      val cum = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val packs = sharded
        .withColumn("prev_cum", coalesce(sum(col("n_toks")).over(cum), lit(0L)))
        .groupBy(col("shard"), expr(s"prev_cum DIV $B").as("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("s1"),
          sum(col("n_toks") * col("n_toks")).as("s2"))
      packs.agg(
          count(lit(1)).as("n_packs"),
          sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("multi_doc_packs"),
          sum(col("s1") * col("s1") - col("s2")).as("cross_positions"),
          sum(col("s1") * col("s1")).as("total_positions"))
        .select(col("n_packs"), col("multi_doc_packs"),
          col("cross_positions"), col("total_positions"),
          (col("cross_positions").cast("double") /
            col("total_positions").cast("double")).as("leakage_share"))
    }, Some(s"""
      WITH c AS (SELECT doc_id, CAST(doc_id % $NShards AS INT) AS shard,
                        CAST(len(${Sql.tokens("text")}) AS BIGINT) AS n_toks
                 FROM documents),
      w AS (SELECT shard, doc_id, n_toks,
                   coalesce(sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
            FROM c),
      p AS (SELECT shard, prev_cum // $B AS seq_id,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_toks) AS BIGINT) AS s1,
                   CAST(sum(n_toks * n_toks) AS BIGINT) AS s2
            FROM w GROUP BY 1, 2)
      SELECT CAST(count(*) AS BIGINT) AS n_packs,
             CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS multi_doc_packs,
             CAST(sum(s1 * s1 - s2) AS BIGINT) AS cross_positions,
             CAST(sum(s1 * s1) AS BIGINT) AS total_positions,
             CAST(sum(s1 * s1 - s2) AS DOUBLE) / CAST(sum(s1 * s1) AS DOUBLE) AS leakage_share
      FROM p""")),

    // Sliding-window chunking: starts at 0, S, 2S, …; the last start is
    // the first one whose window reaches the end (n_starts =
    // 1 + ceil(max(len−C,0)/S), all integer math). Chunks shorter than C
    // only at the tail. One generate-and-explode stage — no UDF, no
    // driver loop; each chunk carries its md5 for downstream exact dedup.
    QueryDef("text_chunking", (s, dir) => {
      t("documents")(s, dir)
        .select(col("doc_id"), TextAnalysisFns.tokens(col("text")).as("toks"))
        .where(size(col("toks")) > 0)
        .withColumn("n_starts",
          expr(s"(greatest(size(toks) - $C, 0) + ${S - 1}) DIV $S + 1"))
        .select(col("doc_id"),
          posexplode(expr(s"transform(sequence(0, n_starts - 1), i -> slice(toks, i*$S + 1, $C))")))
        .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
          size(col("col")).cast("long").as("n_toks"),
          md5(concat_ws(" ", col("col"))).as("chunk_hash"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }, Some(s"""
      WITH tk AS (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents),
      n AS (SELECT doc_id, toks,
                   (greatest(len(toks) - $C, 0) + ${S - 1}) // $S + 1 AS ns
            FROM tk WHERE len(toks) > 0),
      ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                    toks[CAST(i*$S + 1 AS INT):CAST(i*$S + $C AS INT)] AS chunk
             FROM n, UNNEST(generate_series(0, ns - 1)) AS t(i))
      SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_toks,
             md5(array_to_string(chunk, ' ')) AS chunk_hash
      FROM ch ORDER BY doc_id, chunk_idx""")),

    // Contiguous sequence packing, SHARDED: documents in doc_id order
    // within a shard, sequence id = floor(preceding-cumulative-tokens /
    // budget) — a doc is never split; a bin closes when the budget is
    // crossed. The cumulative window partitions by the shard key, so the
    // pack is embarrassingly parallel across shards (the 100 TB shape —
    // a no-partition window would serialize the whole corpus through one
    // task). [[packed]] keeps the global single-sequence-space form as an
    // option for small inputs.
    QueryDef("text_packing", (s, dir) =>
      packed(t("documents")(s, dir), shards = Some(NShards))
    , Some(s"""
      WITH c AS (SELECT doc_id, CAST(doc_id % $NShards AS INT) AS shard,
                        CAST(len(${Sql.tokens("text")}) AS BIGINT) AS n_toks
                 FROM documents),
      w AS (SELECT shard, doc_id, n_toks,
                   coalesce(sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
            FROM c)
      SELECT shard, CAST(prev_cum // $B AS BIGINT) AS seq_id, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS total_toks
      FROM w GROUP BY 1, 2 ORDER BY 1, 2""")),

    // The same sharded packing under an EXACT BPE token budget — what a
    // real pretraining pipeline packs by (context windows are measured in
    // BPE tokens, not words). Spark side: one codegen'd BpeCountTokens
    // per doc feeding the identical shard-partitioned cumulative window;
    // the oracle replays BPE encoding through the shared fold CTEs
    // (Sql.bpeDocCountCtes) and then the same window arithmetic.
    QueryDef("text_packing_bpe", (s, dir) =>
      packed(t("documents")(s, dir), shards = Some(NShards),
        // coalesce: the oracle's bpe_counts LEFT JOIN yields 0 for NULL
        // text; the null-intolerant expression must agree
        nToks = graft.expressions.BpeCountTokens(coalesce(col("text"), lit(""))))
    , Some(s"""
      WITH ${Sql.bpeDocCountCtes},
      c AS (SELECT doc_id, CAST(doc_id % $NShards AS INT) AS shard,
                   n_bpe AS n_toks
            FROM bpe_counts),
      w AS (SELECT shard, doc_id, n_toks,
                   coalesce(sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
            FROM c)
      SELECT shard, CAST(prev_cum // $B AS BIGINT) AS seq_id, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS total_toks
      FROM w GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Data-mixture planning (the Pile/DoReMi-style step): per language
    // domain, available exact-BPE tokens vs a target mixture — keep rate
    // when over-supplied, epoch count when under-supplied. All integer
    // except the single-division keep_rate (identical double op both
    // engines). One scan + one small agg shuffle; weights ride as a
    // broadcast literal table. At 100 TB the plan is the cheap step; the
    // point is it needs only per-domain token totals, never the docs.
    QueryDef("mixture_plan", (s, dir) => {
      import s.implicits._
      val wDf = MixtureWeightsPm.toSeq.sortBy(_._1).toDF("lang", "w_pm")
      t("documents")(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.expressions.BpeCountTokens(coalesce(col("text"), lit(""))))
            .as("n_tokens"))
        .join(broadcast(wDf), Seq("lang"))
        .withColumn("target_tokens", expr(s"$MixtureBudget * w_pm DIV 1000"))
        // n_tokens = 0 guard: Spark non-ANSI would return NULL for the
        // integer division but DuckDB's // RAISES — emit 0 epochs / keep
        // everything on both engines for an empty-token domain
        .withColumn("n_epochs",
          expr("CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE (target_tokens + n_tokens - 1) DIV n_tokens END"))
        .withColumn("keep_rate",
          when(col("n_tokens") === 0, lit(1.0)).otherwise(
            least(lit(1.0),
              col("target_tokens").cast("double") / col("n_tokens").cast("double"))))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          col("target_tokens"), col("keep_rate"), col("n_epochs"))
        .orderBy(col("lang"))
    }, Some(s"""
      WITH ${Sql.bpeDocCountCtes},
      w AS (SELECT * FROM (VALUES $mixtureWeightsSqlValues) w(lang, w_pm)),
      agg AS (
        SELECT d.lang, count(*) AS n_docs,
               CAST(sum(c.n_bpe) AS BIGINT) AS n_tokens
        FROM documents d JOIN bpe_counts c USING (doc_id)
        GROUP BY d.lang)
      SELECT a.lang, a.n_docs, a.n_tokens,
             CAST($MixtureBudget * w.w_pm // 1000 AS BIGINT) AS target_tokens,
             CASE WHEN a.n_tokens = 0 THEN 1.0
                  ELSE least(1.0, CAST($MixtureBudget * w.w_pm // 1000 AS DOUBLE) /
                             CAST(a.n_tokens AS DOUBLE)) END AS keep_rate,
             CASE WHEN a.n_tokens = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST((($MixtureBudget * w.w_pm // 1000) + a.n_tokens - 1)
                       // a.n_tokens AS BIGINT) END AS n_epochs
      FROM agg a JOIN w USING (lang) ORDER BY a.lang""")),

    // Mixture EXECUTION, deterministically: each over-supplied domain's
    // docs pass an exact-integer Bernoulli test (hash32(doc_id)·avail <
    // target·2³²  ⟺  hash-fraction < target/avail — no float threshold).
    // The products run in DECIMAL(38,0) on both engines, so the test
    // stays exact at ANY domain size (int64 would overflow past ~2³¹
    // tokens per domain — silently under Spark non-ANSI, loudly in
    // DuckDB). ONE pass over the docs: the expensive per-doc BPE count
    // is computed once and the per-domain total rides a lang-partitioned
    // window over those cheap (id, lang, count) rows — never a second
    // corpus scan re-running the tokenizer. (At extreme scale you'd
    // materialize the per-doc counts and two-pass instead; the window
    // form keeps the gate query self-contained.)
    QueryDef("mixture_sample", (s, dir) => {
      import s.implicits._
      val wDf = MixtureWeightsPm.toSeq.sortBy(_._1).toDF("lang", "w_pm")
      val dec = "decimal(38,0)"
      t("documents")(s, dir)
        .select(col("doc_id"), col("lang"),
          graft.expressions.BpeCountTokens(coalesce(col("text"), lit("")))
            .as("n_toks"))
        .withColumn("avail",
          sum(col("n_toks")).over(Window.partitionBy(col("lang"))))
        .join(broadcast(wDf), Seq("lang"))
        .withColumn("target", expr(s"$MixtureBudget * w_pm DIV 1000"))
        .where(col("target") >= col("avail") ||
          graft.functions.SketchFns.hash32(col("doc_id")).cast(dec) *
            col("avail").cast(dec) <
          col("target").cast(dec) * lit(4294967296L).cast(dec))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(col("n_toks")).as("n_tokens_kept"))
        .orderBy(col("lang"))
    }, Some(s"""
      WITH ${Sql.bpeDocCountCtes},
      w AS (SELECT * FROM (VALUES $mixtureWeightsSqlValues) w(lang, w_pm)),
      perdoc AS (
        SELECT d.doc_id, d.lang, c.n_bpe AS n_toks,
               sum(c.n_bpe) OVER (PARTITION BY d.lang) AS avail
        FROM documents d JOIN bpe_counts c USING (doc_id))
      SELECT p.lang, count(*) AS n_docs_kept,
             CAST(sum(p.n_toks) AS BIGINT) AS n_tokens_kept
      FROM perdoc p JOIN w USING (lang)
      WHERE ($MixtureBudget * w.w_pm // 1000) >= p.avail
         OR CAST(${Sql.hash32("p.doc_id")} AS DECIMAL(38,0)) * CAST(p.avail AS DECIMAL(38,0))
            < CAST($MixtureBudget * w.w_pm // 1000 AS DECIMAL(38,0)) * CAST(4294967296 AS DECIMAL(38,0))
      GROUP BY p.lang ORDER BY p.lang""")),

    // Assembled-sequence fingerprints: each packed training sequence gets
    // an order-sensitive hash — chain the per-doc id-sequence hash (the
    // bpe_ids_fingerprint fold) through the pack's docs in doc order.
    // The end-to-end reproducibility check a training run records: same
    // corpus + tokenizer + packing ⇒ same fingerprints, and any drift
    // (different merge table, lost doc, reordered pack) moves the hash.
    // Same shard-partitioned window as text_packing_bpe; the second fold
    // is per-pack over already-aggregated rows.
    QueryDef("pack_fingerprint", (s, dir) => {
      // coalesce mirrors the oracle's token-less-doc (0, 0) rows; the
      // fold is the SHARED bpeIdsFoldHash so this query's chained hashes
      // stay bit-identical to bpe_ids_fingerprint's per-doc hashes
      val ids = graft.expressions.BpeEncodeIds(coalesce(col("text"), lit("")))
      val perDoc = t("documents")(s, dir)
        .select(col("doc_id"),
          size(ids).cast("long").as("n_toks"),
          TextAnalysisFns.bpeIdsFoldHash(ids).as("doc_hash"))
        .withColumn("shard", (col("doc_id") % NShards).cast("int"))
      val cum = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      perDoc
        .withColumn("prev_cum", coalesce(sum(col("n_toks")).over(cum), lit(0L)))
        .withColumn("seq_id", expr(s"prev_cum DIV $B"))
        .groupBy(col("shard"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("total_toks"),
          aggregate(transform(sort_array(collect_list(
              struct(col("doc_id"), col("doc_hash")))), e => e.getField("doc_hash")),
            lit(0L), (a, h) => (a * 37 + h) % 1000000007L).as("pack_hash"))
        .orderBy(col("shard"), col("seq_id"))
    }, Some(s"""
      WITH ${Sql.bpeIdCtes},
      sharded AS (SELECT doc_id, n_toks, doc_hash,
                         CAST(doc_id % $NShards AS INT) AS shard
                  FROM bpe_doc_ids),
      w AS (SELECT shard, doc_id, n_toks, doc_hash,
                   coalesce(sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
            FROM sharded)
      SELECT shard, CAST(prev_cum // $B AS BIGINT) AS seq_id,
             count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS total_toks,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list(doc_hash ORDER BY doc_id)),
                    (a, h) -> (a * 37 + h) % 1000000007) AS BIGINT) AS pack_hash
      FROM w GROUP BY shard, seq_id ORDER BY shard, seq_id""")),

    // Benchmark decontamination: flag every training document (source ≠
    // src0) sharing at least one exact word-8-gram with the held-out
    // eval source. Explode-to-grams + distinct eval side + equi join —
    // the blocking structure is the same as MinHash-LSH candidate
    // generation, so it scales as one shuffle on the gram key, not a
    // cross join of corpora.
    QueryDef("decontamination", (s, dir) => {
      val tk = t("documents")(s, dir)
        .select(col("doc_id"), col("source"),
          graft.functions.SimFns.wordShingles(
            TextAnalysisFns.tokens(col("text")), 8).as("grams"))
      val sh = tk.select(col("doc_id"), col("source"),
        explode(col("grams")).as("g"))
      val evalGrams = sh.where(col("source") === "src0").select(col("g")).distinct()
      val flagged = sh.where(col("source") =!= "src0")
        .join(evalGrams, "g").select(col("doc_id")).distinct()
        .withColumn("hit", lit(true))
      tk.where(col("source") =!= "src0").select(col("doc_id"))
        .join(flagged, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("hit"), lit(false)).as("contaminated"))
        .orderBy(col("doc_id"))
    }, Some {
      val toks = Sql.tokens("text")
      val sh = Sql.wordShingles("toks", 8)
      s"""
      WITH tk AS (SELECT doc_id, source, $toks AS toks FROM documents),
      sh AS (SELECT doc_id, source, unnest($sh) AS g FROM tk),
      ev AS (SELECT DISTINCT g FROM sh WHERE source = 'src0'),
      fl AS (SELECT DISTINCT doc_id FROM sh
             WHERE source <> 'src0' AND g IN (SELECT g FROM ev))
      SELECT t.doc_id, fl.doc_id IS NOT NULL AS contaminated
      FROM (SELECT doc_id FROM documents WHERE source <> 'src0') t
      LEFT JOIN fl ON t.doc_id = fl.doc_id
      ORDER BY t.doc_id"""
    })
  )
}
