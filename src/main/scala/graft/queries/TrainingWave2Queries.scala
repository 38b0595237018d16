package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysisFns

/** Round-6 training-pipeline wave 2: BPE merge training (the pair-count →
  * argmax → apply loop at the heart of tokenizer training), a
  * sequential-fold EWMA (the portable-exact float pattern: identical
  * left-to-right fold order in both engines), per-group min-max feature
  * scaling, degree-oriented triangle counting / global clustering
  * coefficient, and schema-evolution union (union-by-name with missing
  * columns). All exact: integer counts, single-op float arithmetic, or
  * order-pinned folds — no tolerance anywhere.
  */
object TrainingWave2Queries {

  private def t(name: String) = (s: SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  /** One BPE merge applied to a space-joined symbol string via a greedy
    * left-to-right fold — the exact semantics of the classic BPE `merge`
    * step (non-overlapping, left to right, no cascading within a round:
    * a freshly merged symbol never re-matches as the LEFT half because
    * the accumulator's tail is now `p1p2`, not `p1`). The boundary check
    * `acc == p1 OR acc ends with ' '+p1` is what makes multi-char
    * symbols safe: a pair can only match at a symbol boundary, never
    * inside a previously merged symbol. Mirrored verbatim by the
    * `list_reduce` in the oracle — same fold order, same string ops.
    */
  private[graft] def applyMerge(sym: Column, p1: String, p2: String): Column = {
    val merged = p1 + p2
    aggregate(
      split(sym, " "),
      lit(""),
      (acc, x) =>
        when(acc === "", x)
          .when(x === p2 && (acc === p1 || acc.endsWith(" " + p1)),
            when(acc === p1, lit(merged))
              .otherwise(concat(
                acc.substr(lit(1), length(acc) - lit(p1.length + 1)),
                lit(" " + merged))))
          .otherwise(concat(acc, lit(" "), x)))
  }

  /** NULL-seeded left-fold EWMA over an ordered double array: the first
    * value initializes the state, each later value folds in as
    * `acc + α·(v − acc)`. The fold order is the array order, so the
    * DuckDB `list_reduce` mirror produces bit-identical doubles.
    */
  private[graft] def ewmaFold(values: Column, alpha: Double): Column =
    aggregate(values, lit(null).cast("double"),
      (acc, v) => when(acc.isNull, v).otherwise(acc + lit(alpha) * (v - acc)))

  /** Count triangles on an undirected simple graph given as distinct
    * `(u, v)` edges with `u < v`: orient each edge from its lower-
    * (degree, id) endpoint, close directed wedges with a third oriented
    * edge. Orientation caps per-node join fan-out at out-degree², with
    * out-degree O(√|E|) on any graph — the bound that survives power-law
    * hubs at cluster scale. Returns one row: (triangles, wedges,
    * global_cc).
    */
  private[graft] def triangleCoeff(e: DataFrame): DataFrame = {
    val deg = e.select(col("u").as("n"))
      .unionByName(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val du = deg.select(col("n").as("u"), col("d").as("du"))
    val dv = deg.select(col("n").as("v"), col("d").as("dv"))
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = e.join(du, Seq("u")).join(dv, Seq("v"))
      .select(when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"))
    val tri = o.as("o1")
      .join(o.as("o2"), col("o2.src") === col("o1.dst"))
      .join(o.as("o3"), col("o3.src") === col("o1.src") &&
        col("o3.dst") === col("o2.dst"))
      .agg(count(lit(1)).as("triangles"))
    val wedges = deg.agg(sum(expr("d * (d - 1) DIV 2")).as("wedges"))
    tri.crossJoin(wedges)
      .select(col("triangles"), col("wedges"),
        when(col("wedges") === 0, lit(0.0))
          .otherwise(lit(3.0) * col("triangles") / col("wedges"))
          .as("global_cc"))
  }

  /** Weighted symbol-pair counts over the (vocab-sized) word table. */
  private[graft] def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), split(col("sym"), " ").as("ss"))
      .where(size(col("ss")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(ss) - 1), " +
          "i -> concat(element_at(ss, i), ' ', element_at(ss, i + 1)))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))

  private val sqlApply: String => String = tAlias => {
    val p1 = s"split_part($tAlias.pair, ' ', 1)"
    val p2 = s"split_part($tAlias.pair, ' ', 2)"
    val m  = s"replace($tAlias.pair, ' ', '')"
    // NB: no line here may START with '|' — SparkEntry.oracleSql applies
    // stripMargin, which would eat the first bar of a leading '||'.
    s"""list_reduce(list_prepend('', str_split(sym, ' ')), (acc, x) ->
       CASE WHEN acc = '' THEN x
            WHEN x = $p2 AND (acc = $p1 OR ends_with(acc, ' ' || $p1))
              THEN CASE WHEN acc = $p1 THEN $m
                   ELSE concat(substr(acc, 1, length(acc) - length($p1) - 1),
                               ' ', $m) END
            ELSE acc || ' ' || x END)"""
  }

  private val sqlPairCounts: String => String = from => s"""
    SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
      SELECT freq, unnest(list_transform(generate_series(1, len(ss) - 1),
               i -> ss[i] || ' ' || ss[i+1])) AS pair
      FROM (SELECT freq, str_split(sym, ' ') AS ss FROM $from))
    GROUP BY pair"""

  val defs: Seq[QueryDef] = Seq(

    // T5-style span-corruption PLAN: deterministic non-overlapping
    // corruption spans per document (≈15% of tokens in length-3 spans ⇒
    // one span per 20 tokens). Placement is stride-partitioned — span i
    // lives inside token stride [i·stride, (i+1)·stride) at a seeded
    // md5 offset — so non-overlap holds BY CONSTRUCTION (pure per-span
    // arithmetic, no sequential clipping cascade, embarrassingly
    // parallel; real T5 rejection-samples, which doesn't distribute).
    // All integers: token counts, integer division, md5-mod offsets.
    QueryDef("span_corruption_plan", (s, dir) => {
      val L = 3
      val d = t("documents")(s, dir)
        .select(col("doc_id"),
          size(TextAnalysisFns.tokens(col("text"))).cast("long").as("n"))
        .withColumn("n_spans", expr("n DIV 20"))
        .where(col("n_spans") >= 1)
        .withColumn("stride", expr("n DIV n_spans"))
      val off = conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":"), col("span_idx").cast("string"))), 1, 8), 16, 10)
        .cast("bigint") % (col("stride") - lit(L - 1))
      d.select(col("doc_id"), col("n"), col("n_spans"), col("stride"),
          explode(sequence(lit(0L), col("n_spans") - 1)).as("span_idx"))
        .select(col("doc_id"), col("n"), col("span_idx"),
          (col("span_idx") * col("stride") + off).as("span_start"),
          lit(L.toLong).as("span_len"))
        .orderBy(col("doc_id"), col("span_idx"))
    }, Some {
      val toks = Sql.tokens("text")
      s"""
      WITH d0 AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n FROM documents),
      d AS (SELECT doc_id, n, n // 20 AS n_spans, n // (n // 20) AS stride
            FROM d0 WHERE n // 20 >= 1),
      e AS (SELECT doc_id, n, n_spans, stride,
                   unnest(generate_series(0, n_spans - 1)) AS span_idx
            FROM d)
      SELECT doc_id, n, CAST(span_idx AS BIGINT) AS span_idx,
             CAST(span_idx * stride +
               (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                  CAST(span_idx AS VARCHAR)), 1, 8)) AS BIGINT) % (stride - 2))
               AS BIGINT) AS span_start,
             CAST(3 AS BIGINT) AS span_len
      FROM e ORDER BY doc_id, span_idx"""
    }),

    // BPE merge training, two rounds: word frequencies once over the
    // corpus (the ONLY corpus-sized pass — one shuffle), then every
    // round runs on the VOCAB table (thousands of rows at any corpus
    // size — the classic BPE trick that makes tokenizer training
    // tractable at 100 TB: pair counting is weighted by word frequency,
    // never re-reads documents). The driver collects exactly ONE row per
    // round (the argmax pair — ties broken by pair text) and re-applies
    // it distributively via the fold expression; per-round weighted
    // symbol totals are recomputed from the APPLIED table in both
    // engines, so a divergence in merge application (not just counting)
    // breaks the hash. n_after = n_before − cnt is the conservation law
    // the totals must obey.
    QueryDef("bpe_merge_train", (s, dir) => {
      val words = t("documents")(s, dir)
        .select(explode(TextAnalysisFns.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .select(
          array_join(expr("regexp_extract_all(w, '.', 0)"), " ").as("sym"),
          col("freq"))
        .cache()
      var cur = words
      val out = (1 to 2).map { round =>
        val top = pairCounts(cur)
          .orderBy(col("cnt").desc, col("pair")).limit(1)
          .collect()(0)
        val (pair, cnt) = (top.getString(0), top.getLong(1))
        val Array(p1, p2) = pair.split(" ", 2)
        cur = cur
          .select(applyMerge(col("sym"), p1, p2).as("sym"), col("freq"))
          .cache()
        val nAfter = cur
          .select(sum(col("freq") * size(split(col("sym"), " "))).as("n"))
          .collect()(0).getLong(0)
        (round, pair, cnt, nAfter)
      }
      import s.implicits._
      out.toDF("round", "pair", "cnt", "n_syms_after").orderBy(col("round"))
    }, Some(s"""
      WITH words AS (
        SELECT array_to_string(str_split(w, ''), ' ') AS sym,
               CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(${Sql.tokens("text")}) AS w FROM documents)
        GROUP BY w),
      p1c AS (${sqlPairCounts("words")}),
      t1 AS (SELECT pair, cnt FROM p1c ORDER BY cnt DESC, pair LIMIT 1),
      w1 AS (SELECT ${sqlApply("t1")} AS sym, freq
             FROM words CROSS JOIN t1),
      p2c AS (${sqlPairCounts("w1")}),
      t2 AS (SELECT pair, cnt FROM p2c ORDER BY cnt DESC, pair LIMIT 1),
      w2 AS (SELECT ${sqlApply("t2")} AS sym, freq
             FROM w1 CROSS JOIN t2),
      n1 AS (SELECT CAST(sum(freq * len(str_split(sym, ' '))) AS BIGINT)
               AS n_syms FROM w1),
      n2 AS (SELECT CAST(sum(freq * len(str_split(sym, ' '))) AS BIGINT)
               AS n_syms FROM w2)
      SELECT 1 AS round, t1.pair, t1.cnt, n1.n_syms AS n_syms_after
      FROM t1 CROSS JOIN n1
      UNION ALL
      SELECT 2 AS round, t2.pair, t2.cnt, n2.n_syms
      FROM t2 CROSS JOIN n2
      ORDER BY round""")),

    // Per-user EWMA (α = 1/2) over the event-time-ordered value stream.
    // EWMA is inherently sequential — the portable form is an explicit
    // LEFT FOLD over the per-key ordered array (NULL-seeded: first value
    // initializes), the same op sequence `acc + α·(v − acc)` in both
    // engines ⇒ bit-identical doubles, no tolerance. Scale: the fold is
    // per-user after one hash shuffle; state is one double, the array is
    // bounded by per-user activity (the convo-agg bound). A window
    // formulation cannot express EWMA without higher-order recursion;
    // the fold is the Spark-native shape.
    QueryDef("win_ewma", (s, dir) =>
      t("events")(s, dir)
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("value")))).as("seq"))
        .select(col("user_id"),
          size(col("seq")).cast("long").as("n"),
          ewmaFold(transform(col("seq"), e => e.getField("value")), 0.5)
            .as("ewma"))
        .orderBy(col("user_id"))
    , Some("""
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             list_reduce(
               list_prepend(NULL::DOUBLE, list(value ORDER BY ts, event_id)),
               (acc, v) -> CASE WHEN acc IS NULL THEN v
                                ELSE acc + 0.5 * (v - acc) END) AS ewma
      FROM events GROUP BY user_id ORDER BY user_id""")),

    // Per-group min-max feature scaling: group stats are one map-side-
    // combinable aggregate over the full table, broadcast back onto the
    // (filtered) fact rows — the standing normalize-before-training
    // step. min/max are exact; the scale itself is two float ops
    // ((v − mn) / (mx − mn)) evaluated identically in both engines.
    // Degenerate groups (mx = mn) pin to 0.5 — never divide by zero.
    QueryDef("feature_minmax", (s, dir) => {
      val ev = t("events")(s, dir)
      val stats = ev.groupBy(col("event_type"))
        .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      ev.where(col("event_id") < 500)
        .join(broadcast(stats), Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          when(col("mx") === col("mn"), lit(0.5))
            .otherwise((col("value") - col("mn")) / (col("mx") - col("mn")))
            .as("scaled"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH st AS (
        SELECT event_type, min(value) AS mn, max(value) AS mx
        FROM events GROUP BY event_type)
      SELECT event_id, e.event_type,
             CASE WHEN mx = mn THEN 0.5
                  ELSE (value - mn) / (mx - mn) END AS scaled
      FROM events e JOIN st USING (event_type)
      WHERE event_id < 500 ORDER BY event_id""")),

    // Triangle count + global clustering coefficient over the part
    // co-purchase graph (parts sharing an order, orderkey-capped like
    // the dedup queries so the bench pair count stays representative).
    // The scale move is DEGREE ORIENTATION: orient every undirected edge
    // from its lower-(degree, id) endpoint, then count directed wedges
    // closed by a third edge — join fan-out per node drops from deg² to
    // out-deg² where out-degree is bounded by O(√|E|) (arboricity), the
    // standard trick that makes triangle counting survive power-law
    // graphs at cluster scale. Each triangle is counted exactly once
    // (its unique (deg, id)-minimum corner). All integer; the
    // coefficient is one float division at the end.
    QueryDef("graph_triangle_coeff", (s, dir) =>
      // the co-purchase edge set is a per-corpus FRONT shared with
      // graph_bfs_reach — FrontCache-pinned like the suffix spans
      triangleCoeff(CorpusFronts.partCoPurchase(s, dir))
    , Some("""
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                  WHERE l_orderkey <= 6000),
      e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                              AND a.l_partkey < b.l_partkey),
      deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d
              FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
              GROUP BY n),
      o AS (SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
                        THEN u ELSE v END AS src,
                   CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
                        THEN v ELSE u END AS dst
            FROM e JOIN deg du ON du.n = u JOIN deg dv ON dv.n = v),
      tri AS (SELECT CAST(count(*) AS BIGINT) AS triangles
              FROM o o1 JOIN o o2 ON o2.src = o1.dst
                        JOIN o o3 ON o3.src = o1.src AND o3.dst = o2.dst),
      w AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS wedges FROM deg)
      SELECT triangles, wedges,
             CASE WHEN wedges = 0 THEN 0.0
                  ELSE 3.0 * triangles / wedges END AS global_cc
      FROM tri CROSS JOIN w""")),

    // End-to-end curation pipeline as ONE oracle-checked query — the
    // integration proof that the curation stages COMPOSE: language
    // filter (pushes to the scan) → token-length band → exact dedup
    // (min-id keeper per content hash, one shuffle) → sharded greedy
    // packing into 256-token sequences (cumulative window PARTITIONED
    // by shard — the text_packing scale shape). The oracle rebuilds the
    // identical four stages in SQL, so a semantic drift in ANY stage —
    // or in how stages hand off — breaks the hash, not just a
    // stage-local test.
    QueryDef("pipeline_curation_e2e", (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val survivors = t("documents")(s, dir)
        .where(col("lang") === "en")
        .select(col("doc_id"),
          TextAnalysisFns.wordCount(col("text")).cast("long").as("n_toks"),
          md5(col("text")).as("__h"))
        .where(col("n_toks").between(5, 1000))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("__h")).orderBy(col("doc_id"))))
        .where(col("__rn") === 1)
      survivors
        .withColumn("shard", (col("doc_id") % 16).cast("int"))
        .withColumn("prev_cum", coalesce(sum(col("n_toks")).over(w), lit(0L)))
        .groupBy(col("shard"), expr("prev_cum DIV 256").as("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("total_toks"))
        .orderBy(col("shard"), col("seq_id"))
    }, Some(s"""
      WITH en AS (
        SELECT doc_id, CAST(len(${Sql.tokens("text")}) AS BIGINT) AS n_toks,
               md5(text) AS h
        FROM documents WHERE lang = 'en'),
      band AS (SELECT * FROM en WHERE n_toks BETWEEN 5 AND 1000),
      ded AS (
        SELECT doc_id, n_toks FROM band
        QUALIFY row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1),
      c AS (SELECT doc_id, n_toks, CAST(doc_id % 16 AS INT) AS shard FROM ded),
      w AS (
        SELECT shard, doc_id, n_toks,
               coalesce(sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
        FROM c)
      SELECT shard, CAST(prev_cum // 256 AS BIGINT) AS seq_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS total_toks
      FROM w GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Incremental batch dedup — the PRODUCTION dedup mode: a new batch
    // dedupes against the standing corpus's fingerprint set AND within
    // itself, without ever re-reading standing text. The standing side
    // reduces to content hashes (the only state a dedup service keeps);
    // cross-corpus checks are one hash equi-join (left_anti); the
    // within-batch keeper is the usual min-id window. At 100 TB the
    // standing fingerprints are a fraction of corpus bytes and bloom-
    // prunable (bloom_anti_join is the pre-filter for exactly this
    // join); the corpus text itself never moves.
    QueryDef("dedup_incremental_batch", (s, dir) => {
      val docs = t("documents")(s, dir)
      val standingHashes = docs.where(col("doc_id") < 250)
        .select(md5(col("text")).as("h")).distinct()
      val batch = docs.where(col("doc_id") >= 250)
        .select(col("doc_id"), md5(col("text")).as("h"))
      val newVsStanding = batch.join(standingHashes, Seq("h"), "left_anti")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h")).orderBy(col("doc_id"))
      newVsStanding
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH standing AS (
        SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250),
      batch AS (
        SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id >= 250),
      fresh AS (
        SELECT b.doc_id, b.h FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM standing s WHERE s.h = b.h))
      SELECT doc_id FROM fresh
      QUALIFY row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1
      ORDER BY doc_id""")),

    // Schema-evolution union: two batches of the same logical table with
    // drifted physical schemas (a column dropped, a column added) union
    // BY NAME with missing columns null-filled — the lake-ingestion
    // semantics of reading across schema versions (Spark:
    // unionByName(allowMissingColumns); DuckDB: UNION ALL BY NAME). No
    // positional union can express this; the name-resolved form is what
    // a mergeSchema parquet read produces at scale.
    QueryDef("s16_union_by_name", (s, dir) => {
      val o = t("orders")(s, dir)
      val v1 = o.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val v2 = o.where(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      v1.unionByName(v2, allowMissingColumns = true)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT * FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey % 2 = 0
        UNION ALL BY NAME
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        WHERE o_orderkey % 2 = 1)
      ORDER BY o_orderkey"""))
  )
}
