package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Ann, Dedup}

/** The training-data-pipeline operator families over `documents` and
  * `embeddings`: deduplication (exact / MinHash-LSH / SimHash / n-gram
  * Jaccard / embedding-cosine), ANN search, and streaming-shaped window
  * queries over `events`. Oracles replicate the full algorithm in DuckDB
  * SQL (same md5 hashes, same sequential folds) — exact, no tolerance.
  */
object DedupVectorQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  // MinHash-LSH parameters shared by Spark impl and oracle.
  private val ShingleWords = 3
  private val NumHashes    = 8
  private val Bands        = 4
  private val MinhashThreshold = 0.2
  private val NgramThreshold   = 0.3
  private val CosineThreshold  = 0.3

  /** Canonical-form content hash: NFC-normalize, casefold, collapse
    * whitespace, md5 — the key of `dedup_exact_canonical` (the corpus
    * has no reformatted copies, so the spec constructs them; the oracle
    * mirrors each step with utf8proc nfc_normalize / lower /
    * regexp_replace).
    */
  def canonicalHash(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(regexp_replace(
      lower(graft.expressions.NfcNormalize(text)), "\\s+", " "))

  /** The dedup-clustering oracle (MinHash-LSH pairs → recursive-CTE
    * transitive closure → min reachable id), shared verbatim by
    * `dedup_components` (driver union-find path) and
    * `dedup_components_labelprop` (forced distributed label propagation) —
    * one oracle, two physical paths, so the scale path is hash-gated
    * against the exact same answer as the small path.
    */
  private def componentsOracle: String = {
    val toks = Sql.tokens("text")
    val sig  = Sql.minhashSignature("shingles", NumHashes)
    val bandKeys = Sql.lshBandKeys("sig", Bands, NumHashes / Bands)
    s"""
      WITH RECURSIVE sh AS (
        SELECT doc_id AS id, ${Sql.wordShingles(toks, ShingleWords)} AS shingles
        FROM documents),
      nz AS (SELECT * FROM sh WHERE len(shingles) > 0),
      sg AS (SELECT id, shingles, $sig AS sig FROM nz),
      banded AS (SELECT id, shingles, unnest($bandKeys) AS band FROM sg),
      cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b ON a.band = b.band AND a.id < b.id),
      pairs AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN nz x ON x.id = c.id_a
        JOIN nz y ON y.id = c.id_b
        WHERE ${Sql.jaccard("x.shingles", "y.shingles")} >= $MinhashThreshold),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      reach AS (
        SELECT id, id AS label FROM nodes
        UNION
        SELECT e.dst AS id, r.label
        FROM reach r JOIN edges e ON e.src = r.id)
      SELECT id, min(label) AS keep_id FROM reach GROUP BY id ORDER BY id"""
  }

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: hash-groupBy, keeper = min id.
    QueryDef("dedup_exact", (s, dir) => {
      Dedup.exact(t("documents")(s, dir), "doc_id", "text")
        .orderBy(col("keep_id"))
    }, Some("""
      SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
      FROM documents GROUP BY md5(text) ORDER BY keep_id""")),

    // Exact dedup, provenance-priority keeper: within a duplicate cluster
    // keep the copy from the preferred source (lexicographic max here —
    // a real pipeline maps sources to ranks), ties broken by min id. The
    // oracle takes the window-argmax route; matching hashes prove the
    // one-aggregation argmax ≡ the window form.
    QueryDef("dedup_keep_best", (s, dir) => {
      Dedup.exactKeepBest(t("documents")(s, dir), "doc_id", "text", "source")
        .orderBy(col("content_hash"))
    }, Some("""
      WITH ranked AS (
        SELECT md5(text) AS content_hash, doc_id, source,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY source DESC, doc_id ASC) AS rn,
               count(*) OVER (PARTITION BY md5(text)) AS n_dups
        FROM documents)
      SELECT content_hash, doc_id AS keep_id, source AS keep_pref, n_dups
      FROM ranked WHERE rn = 1 ORDER BY content_hash""")),

    // CANONICAL-FORM exact dedup: NFC-normalize + casefold + collapse
    // whitespace BEFORE hashing, so trivially-reformatted copies (combining
    // marks vs precomposed, case, spacing) land in one cluster that raw
    // md5(text) splits. Same hash-groupBy plan as dedup_exact; the
    // normalization is one compiled projection (NfcNormalize ≡ utf8proc
    // nfc_normalize — portability pinned by f33).
    QueryDef("dedup_exact_canonical", (s, dir) => {
      t("documents")(s, dir)
        .select(col("doc_id"), canonicalHash(col("text")).as("canon_hash"))
        .groupBy(col("canon_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy(col("keep_id"))
    }, Some("""
      SELECT md5(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS canon_hash,
             min(doc_id) AS keep_id, count(*) AS n_dups
      FROM documents GROUP BY 1 ORDER BY keep_id""")),

    // Per-source duplication report: how much of each ingest source is
    // exact-dup redundancy (non-keeper share of docs AND of token mass) —
    // the per-feed number a curation dashboard tracks week over week.
    // Keeper = min doc_id of the content hash, same rule as dedup_exact;
    // counts exact, two final divisions.
    QueryDef("dedup_rate_by_source", (s, dir) => {
      val docs = t("documents")(s, dir)
        .select(col("source"), col("doc_id"), md5(col("text")).as("h"),
          size(graft.functions.TextAnalysisFns.tokens(col("text")))
            .cast("long").as("n_toks"))
      val keepers = docs.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
      docs.join(keepers, Seq("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L))
            .as("dup_docs"),
          sum(col("n_toks")).as("tokens"),
          sum(when(col("doc_id") =!= col("keep_id"), col("n_toks"))
            .otherwise(0L)).as("dup_tokens"))
        .select(col("source"), col("n_docs"), col("dup_docs"),
          col("tokens"), col("dup_tokens"),
          (col("dup_docs").cast("double") / col("n_docs").cast("double"))
            .as("dup_doc_rate"),
          (col("dup_tokens").cast("double") / col("tokens").cast("double"))
            .as("dup_token_rate"))
        .orderBy(col("source"))
    }, Some {
      val toks = Sql.tokens("text")
      s"""
      WITH d AS (
        SELECT source, doc_id, md5(text) AS h,
               CAST(len($toks) AS BIGINT) AS n_toks
        FROM documents),
      k AS (SELECT h, min(doc_id) AS keep_id FROM d GROUP BY h)
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
             CAST(sum(n_toks) AS BIGINT) AS tokens,
             CAST(sum(CASE WHEN doc_id <> keep_id THEN n_toks ELSE 0 END) AS BIGINT) AS dup_tokens,
             CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS dup_doc_rate,
             CAST(sum(CASE WHEN doc_id <> keep_id THEN n_toks ELSE 0 END) AS DOUBLE)
               / CAST(sum(n_toks) AS DOUBLE) AS dup_token_rate
      FROM d JOIN k USING (h)
      GROUP BY source ORDER BY source"""
    }),

    // MinHash + LSH near-dup pairs, verified by true shingle Jaccard.
    QueryDef("dedup_minhash_lsh", (s, dir) => {
      Dedup.minhashLsh(t("documents")(s, dir), "doc_id", "text",
          ShingleWords, NumHashes, Bands, MinhashThreshold)
        .orderBy(col("id_a"), col("id_b"))
    }, Some {
      val toks = Sql.tokens("text")
      val sig  = Sql.minhashSignature("shingles", NumHashes)
      val bandKeys = Sql.lshBandKeys("sig", Bands, NumHashes / Bands)
      s"""
      WITH sh AS (
        SELECT doc_id AS id, ${Sql.wordShingles(toks, ShingleWords)} AS shingles
        FROM documents),
      nz AS (SELECT * FROM sh WHERE len(shingles) > 0),
      sg AS (SELECT id, shingles, $sig AS sig FROM nz),
      banded AS (SELECT id, shingles, unnest($bandKeys) AS band FROM sg),
      pairs AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b ON a.band = b.band AND a.id < b.id),
      scored AS (
        SELECT p.id_a, p.id_b, ${Sql.jaccard("x.shingles", "y.shingles")} AS jaccard
        FROM pairs p
        JOIN nz x ON x.id = p.id_a
        JOIN nz y ON y.id = p.id_b)
      SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= $MinhashThreshold
      ORDER BY id_a, id_b"""
    }),

    // MinHash estimator-quality audit: for every LSH candidate pair, the
    // signature-agreement Jaccard ESTIMATE (#equal minhash components / k
    // — the standard unbiased estimator the banding theory rests on) next
    // to the TRUE shingle Jaccard, plus |error|. This is the eval that
    // justifies k: a drifting corpus (longer docs, different shingle
    // cardinality) degrades the estimate before it degrades recall, and
    // this query sees it first. Integer agreement count, one division,
    // abs of an exact IEEE difference — hash-exact on both engines.
    // Scale: same band equi-join as dedup_minhash_lsh; the signature zip
    // is O(k) per candidate pair.
    QueryDef("minhash_jaccard_est_eval", (s, dir) => {
      val sh = t("documents")(s, dir).select(col("doc_id").as("id"),
          graft.functions.SimFns.wordShingles(
            graft.functions.TextAnalysisFns.tokens(col("text")),
            ShingleWords).as("shingles"))
        .where(size(col("shingles")) > 0)
      val sg = sh.withColumn("sig",
        graft.functions.HashFns.minhashSignature(col("shingles"), NumHashes))
      val banded = sg.select(col("id"),
        explode(graft.functions.HashFns.lshBandKeys(
          col("sig"), Bands, NumHashes / Bands)).as("band"))
      val pairs = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
      pairs
        .join(sg.select(col("id").as("id_a"), col("shingles").as("sh_a"),
          col("sig").as("sig_a")), Seq("id_a"))
        .join(sg.select(col("id").as("id_b"), col("shingles").as("sh_b"),
          col("sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (aggregate(zip_with(col("sig_a"), col("sig_b"),
              (x, y) => when(x === y, 1L).otherwise(0L)),
            lit(0L), (a, c) => a + c).cast("double") /
            lit(NumHashes).cast("double")).as("est_jaccard"),
          graft.functions.SimFns.jaccard(col("sh_a"), col("sh_b"))
            .as("jaccard"))
        .withColumn("abs_err", abs(col("est_jaccard") - col("jaccard")))
        .orderBy(col("id_a"), col("id_b"))
    }, Some {
      val toks = Sql.tokens("text")
      val sig  = Sql.minhashSignature("shingles", NumHashes)
      val bandKeys = Sql.lshBandKeys("sig", Bands, NumHashes / Bands)
      s"""
      WITH sh AS (
        SELECT doc_id AS id, ${Sql.wordShingles(toks, ShingleWords)} AS shingles
        FROM documents),
      nz AS (SELECT * FROM sh WHERE len(shingles) > 0),
      sg AS (SELECT id, shingles, $sig AS sig FROM nz),
      banded AS (SELECT id, unnest($bandKeys) AS band FROM sg),
      pairs AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b ON a.band = b.band AND a.id < b.id),
      sc AS (
        SELECT p.id_a, p.id_b,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(generate_series(1, $NumHashes),
                   i -> CASE WHEN x.sig[i] = y.sig[i]
                        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
                 (a, c) -> a + c) AS DOUBLE)
                 / CAST($NumHashes AS DOUBLE) AS est_jaccard,
               ${Sql.jaccard("x.shingles", "y.shingles")} AS jaccard
        FROM pairs p
        JOIN sg x ON x.id = p.id_a
        JOIN sg y ON y.id = p.id_b)
      SELECT id_a, id_b, est_jaccard, jaccard,
             abs(est_jaccard - jaccard) AS abs_err
      FROM sc ORDER BY id_a, id_b"""
    }),

    // Dedup clustering: connected components over the MinHash near-dup
    // pairs → canonical keeper per doc (min reachable id). Oracle: the
    // same pair set + a recursive-CTE transitive closure.
    QueryDef("dedup_components", (s, dir) => {
      val pairs = Dedup.minhashLsh(t("documents")(s, dir), "doc_id", "text",
        ShingleWords, NumHashes, Bands, MinhashThreshold)
      Dedup.components(pairs).orderBy(col("id"))
    }, Some(componentsOracle)),

    // Dedup clustering, FORCED onto the distributed label-propagation path
    // (driverMaxPairs = -1 disables the driver union-find shortcut) — the
    // physical plan that holds when even the near-dup pair set is too big
    // to collect. Same oracle SQL as `dedup_components`: the scale path
    // must produce the exact same (id, keep_id) table, hash-checked.
    QueryDef("dedup_components_labelprop", (s, dir) => {
      val pairs = Dedup.minhashLsh(t("documents")(s, dir), "doc_id", "text",
        ShingleWords, NumHashes, Bands, MinhashThreshold)
      Dedup.components(pairs, driverMaxPairs = -1L).orderBy(col("id"))
    }, Some(componentsOracle)),

    // FUZZY benchmark decontamination: training docs near-duplicating the
    // held-out eval source (src0) by MinHash-LSH + true-Jaccard verify —
    // catches the paraphrased / lightly-edited eval leakage the exact
    // 8-gram `decontamination` query misses. Same band equi-join blocking
    // as dedup_minhash_lsh (one shuffle on the band key, never corpus ×
    // eval); roles resolved by joining sources back onto the pair set.
    QueryDef("decontamination_fuzzy", (s, dir) => {
      val docs = t("documents")(s, dir)
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
        ShingleWords, NumHashes, Bands, MinhashThreshold)
      val roles = docs.select(col("doc_id"), (col("source") === "src0").as("is_eval"))
      pairs
        .join(roles.select(col("doc_id").as("id_a"), col("is_eval").as("ev_a")), "id_a")
        .join(roles.select(col("doc_id").as("id_b"), col("is_eval").as("ev_b")), "id_b")
        .where(col("ev_a") =!= col("ev_b"))
        .select(when(col("ev_a"), col("id_b")).otherwise(col("id_a")).as("doc_id"),
          col("jaccard"))
        .groupBy(col("doc_id"))
        .agg(max(col("jaccard")).as("max_eval_jaccard"),
          count(lit(1)).as("n_eval_pairs"))
        .orderBy(col("doc_id"))
    }, Some {
      val toks = Sql.tokens("text")
      val sig  = Sql.minhashSignature("shingles", NumHashes)
      val bandKeys = Sql.lshBandKeys("sig", Bands, NumHashes / Bands)
      s"""
      WITH sh AS (
        SELECT doc_id AS id, ${Sql.wordShingles(toks, ShingleWords)} AS shingles
        FROM documents),
      nz AS (SELECT * FROM sh WHERE len(shingles) > 0),
      sg AS (SELECT id, shingles, $sig AS sig FROM nz),
      banded AS (SELECT id, shingles, unnest($bandKeys) AS band FROM sg),
      cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b ON a.band = b.band AND a.id < b.id),
      scored AS (
        SELECT p.id_a, p.id_b, ${Sql.jaccard("x.shingles", "y.shingles")} AS jaccard
        FROM cand p
        JOIN nz x ON x.id = p.id_a
        JOIN nz y ON y.id = p.id_b),
      sel AS (SELECT * FROM scored WHERE jaccard >= $MinhashThreshold),
      crossrole AS (
        SELECT CASE WHEN da.source = 'src0' THEN s.id_b ELSE s.id_a END AS doc_id,
               s.jaccard
        FROM sel s
        JOIN documents da ON da.doc_id = s.id_a
        JOIN documents db ON db.doc_id = s.id_b
        WHERE (da.source = 'src0') <> (db.source = 'src0'))
      SELECT doc_id, max(jaccard) AS max_eval_jaccard, count(*) AS n_eval_pairs
      FROM crossrole GROUP BY doc_id ORDER BY doc_id"""
    }),

    // N-gram Jaccard near-dup pairs, blocked by language.
    QueryDef("dedup_ngram_jaccard", (s, dir) => {
      // doc_id bound keeps the blocked pair count tractable at bench SF
      Dedup.ngramJaccard(t("documents")(s, dir).where(col("doc_id") < 2000),
          "doc_id", "text", 5, Seq("lang"), NgramThreshold)
        .orderBy(col("id_a"), col("id_b"))
    }, Some {
      val grams = Sql.charNgrams("text", "5")
      s"""
      WITH g AS (
        SELECT doc_id AS id, lang, $grams AS grams FROM documents
        WHERE doc_id < 2000),
      nz AS (SELECT * FROM g WHERE len(grams) > 0)
      SELECT a.id AS id_a, b.id AS id_b, ${Sql.jaccard("a.grams", "b.grams")} AS jaccard
      FROM nz a JOIN nz b ON a.lang = b.lang AND a.id < b.id
      WHERE ${Sql.jaccard("a.grams", "b.grams")} >= $NgramThreshold
      ORDER BY id_a, id_b"""
    }),

    // SimHash near-dup pairs (banded 16-bit blocks, hamming ≤ 3).
    QueryDef("dedup_simhash", (s, dir) => {
      Dedup.simhash(t("documents")(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }, Some {
      val toks = Sql.tokens("text")
      // per-token md5 once, then 64 vote-folds over hex digits
      val nibIdx = "CAST((q - (q % 4)) / 4 AS INT) + 1"
      val bits =
        s"""list_transform(generate_series(0, 63), q ->
            CASE WHEN list_reduce(list_prepend(0, list_transform(hashes, h ->
              CASE WHEN ((((strpos('0123456789abcdef', h[$nibIdx:$nibIdx]) - 1) >> (q % 4)) & 1) = 1)
                   THEN 1 ELSE -1 END)), (a, b) -> a + b) > 0
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)"""
      val pack =
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_reverse(bits[1:63])),
             (a, b) -> a * 2 + b) +
           CASE WHEN bits[64] = 1 THEN CAST(-9223372036854775807 AS BIGINT) - 1 ELSE CAST(0 AS BIGINT) END"""
      // band i value = bits 16i..16i+15 packed little-endian (bit q weight
      // 2^(q-16i)) — identical to Spark's (simhash >>> 16i) & 0xFFFF.
      val bands = (0 to 3).map { i =>
        val chunk = s"bits[${i * 16 + 1}:${i * 16 + 16}]"
        s"CAST($i AS VARCHAR) || '#' || CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_reverse($chunk)), (a, b) -> a * 2 + b) AS VARCHAR)"
      }.mkString("[", ", ", "]")
      s"""
      WITH h0 AS (
        SELECT doc_id AS id, list_transform($toks, t -> md5(t)) AS hashes
        FROM documents),
      h AS (SELECT * FROM h0 WHERE len(hashes) > 0),
      bt AS (SELECT id, $bits AS bits FROM h),
      sh AS (SELECT id, bits, $pack AS simhash FROM bt),
      banded AS (SELECT id, simhash, unnest($bands) AS band FROM sh),
      pairs AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM banded a JOIN banded b ON a.band = b.band AND a.id < b.id)
      SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
      ORDER BY id_a, id_b"""
    }),

    // Embedding-cosine near-dup pairs — exact brute-force baseline.
    QueryDef("dedup_embedding_cosine", (s, dir) => {
      // vec_id bound keeps the exact O(N²) baseline tractable at bench SF;
      // the scale path is Dedup.embeddingCosine (hyperplane-LSH blocked)
      Ann.bruteForcePairs(t("embeddings")(s, dir).where(col("vec_id") < 2000),
          "vec_id", "embedding", CosineThreshold)
        .orderBy(col("id_a"), col("id_b"))
    }, Some(s"""
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ${Sql.cosine("a.embedding", "b.embedding")} AS cosine
      FROM embeddings a JOIN embeddings b
        ON a.vec_id < b.vec_id AND a.vec_id < 2000 AND b.vec_id < 2000
      WHERE ${Sql.cosine("a.embedding", "b.embedding")} >= $CosineThreshold
      ORDER BY id_a, id_b""")),

    // Embedding-cosine near-dup pairs — the hyperplane-LSH SCALE path
    // (`Dedup.embeddingCosine`): bucket by 8 projection sign bits, score
    // only same-bucket pairs. The deterministic planes are embedded in the
    // oracle as double literals (shortest-roundtrip printing ⇒ identical
    // doubles on both engines), so the approximate variant is hash-gated
    // exactly, not just recall-checked.
    QueryDef("dedup_embedding_lsh", (s, dir) => {
      val planes = Ann.deterministicPlanes(8, 64, seed = 3)
      Dedup.embeddingCosine(t("embeddings")(s, dir), "vec_id", "embedding",
          planes, CosineThreshold)
        .orderBy(col("id_a"), col("id_b"))
    }, Some {
      val planes = Ann.deterministicPlanes(8, 64, seed = 3)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        val lit = p.map(_.toString).mkString("[", ", ", "]")
        s"CASE WHEN ${Sql.dot("embedding", s"CAST($lit AS DOUBLE[])")} >= 0.0 THEN ${1L << i} ELSE 0 END"
      }.mkString("(", " + ", ")")
      s"""
      WITH bk AS (
        SELECT vec_id AS id, embedding, $bucket AS bucket,
               sqrt(${Sql.dot("embedding", "embedding")}) AS nrm
        FROM embeddings)
      SELECT a.id AS id_a, b.id AS id_b,
             CASE WHEN a.nrm = 0.0 OR b.nrm = 0.0 THEN 0.0
                  ELSE ${Sql.dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
             END AS cosine
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.id < b.id
      WHERE (CASE WHEN a.nrm = 0.0 OR b.nrm = 0.0 THEN 0.0
                  ELSE ${Sql.dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
             END) >= $CosineThreshold
      ORDER BY id_a, id_b"""
    }),

    // ANN: brute-force cosine top-k (k=5) for the first 10 vectors.
    QueryDef("ann_topk_bruteforce", (s, dir) => {
      val emb = t("embeddings")(s, dir)
      Ann.bruteForceTopK(emb.where(col("vec_id") < 10), emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }, Some(s"""
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ${Sql.cosine("q.embedding", "c.embedding")} AS cosine,
             CAST(row_number() OVER (PARTITION BY q.vec_id
               ORDER BY ${Sql.cosine("q.embedding", "c.embedding")} DESC, c.vec_id) AS INT) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
      QUALIFY rank <= 5
      ORDER BY query_id, rank""")),

    // Hard-negative mining for contrastive embedding training: per query
    // the top-5 most-similar corpus vectors BELOW the near-dup threshold
    // (cosine < 0.5) — near-dups are presumed positives and must never
    // occupy negative slots. Same broadcast + bounded-TopKAgg plan as
    // ann_topk_bruteforce with the band filter before the aggregate.
    QueryDef("mine_hard_negatives", (s, dir) => {
      val emb = t("embeddings")(s, dir)
      Ann.hardNegatives(emb.where(col("vec_id") < 10), emb,
          "vec_id", "embedding", 5, dupThreshold = 0.5)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }, Some(s"""
      WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ${Sql.cosine("q.embedding", "c.embedding")} AS cosine
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
      SELECT query_id, neighbor_id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      FROM scored WHERE cosine < 0.5
      QUALIFY rank <= 5
      ORDER BY query_id, rank""")),

    // ANN scale path, oracle-backed: hyperplane-LSH bucketed top-k with
    // two probe sets. The deterministic planes are embedded in the oracle
    // as double literals (shortest-roundtrip printing ⇒ identical doubles
    // on both engines), so even the approximate variant is hash-checked.
    QueryDef("ann_topk_lsh", (s, dir) => {
      val emb = t("embeddings")(s, dir)
      val planeSets = Seq(
        graft.operators.Ann.deterministicPlanes(8, 64, seed = 1),
        graft.operators.Ann.deterministicPlanes(8, 64, seed = 2))
      graft.operators.Ann.lshTopK(emb.where(col("vec_id") < 10), emb,
          "vec_id", "embedding", 5, planeSets)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }, Some {
      val planeSets = Seq(
        graft.operators.Ann.deterministicPlanes(8, 64, seed = 1),
        graft.operators.Ann.deterministicPlanes(8, 64, seed = 2))
      // bucket id for one plane set: Σ 2^i over planes with v·p_i ≥ 0
      def bucketSql(v: String, planes: Seq[Seq[Double]]): String =
        planes.zipWithIndex.map { case (p, i) =>
          val lit = p.map(_.toString).mkString("[", ", ", "]")
          s"CASE WHEN ${Sql.dot(v, s"CAST($lit AS DOUBLE[])")} >= 0.0 THEN ${1L << i} ELSE 0 END"
        }.mkString("(", " + ", ")")
      val b0q = bucketSql("q.embedding", planeSets(0))
      val b1q = bucketSql("q.embedding", planeSets(1))
      val b0c = bucketSql("c.embedding", planeSets(0))
      val b1c = bucketSql("c.embedding", planeSets(1))
      s"""
      WITH cand AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               q.embedding AS qv, c.embedding AS cv
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 10 AND c.vec_id <> q.vec_id
         AND ($b0q = $b0c OR $b1q = $b1c))
      SELECT query_id, neighbor_id, ${Sql.cosine("qv", "cv")} AS cosine,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY ${Sql.cosine("qv", "cv")} DESC, neighbor_id) AS INT) AS rank
      FROM cand
      QUALIFY rank <= 5
      ORDER BY query_id, rank"""
    }),

    // Training-data split assignment: md5-bucketed deterministic
    // train/val/test — stable across runs, shards, and engines.
    QueryDef("split_assign", (s, dir) => {
      graft.operators.Splits.withSplit(
          t("documents")(s, dir).select(col("doc_id")), "doc_id")
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
             CASE WHEN b < 90 THEN 'train'
                  WHEN b < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 AS b
            FROM documents)
      ORDER BY doc_id""")),

    // Streaming-shaped: tumbling 1-hour window aggregation (batch form of
    // the Structured Streaming query in graft.streaming).
    QueryDef("stream_window_1h", (s, dir) => {
      t("events")(s, dir)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
        .select(col("window.start").cast("timestamp_ntz").as("window_start"),
          col("n_events"), col("total_value"))
        .orderBy(col("window_start"))
    }, Some("""
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1 ORDER BY 1""")),

    // Streaming-shaped: per-window top-k events by value (batch form of
    // Streams.windowedTopK — the bounded TopKAgg inside the windowed
    // aggregation, state ≤2k per window, no per-window sort; oracle takes
    // the row_number-window route over the same total order).
    QueryDef("stream_window_topk", (s, dir) => {
      val win = t("events")(s, dir)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(graft.expressions.TopKAgg.topK(
          struct(col("value").cast("double"), col("event_id").cast("long")), 3)
          .as("__top"))
      win.select(col("window.start").cast("timestamp_ntz").as("window_start"),
          posexplode(col("__top")).as(Seq("__pos", "__e")))
        .select(col("window_start"), (col("__pos") + 1).cast("int").as("rank"),
          col("__e.id").as("event_id"), col("__e.score").as("value"))
        .orderBy(col("window_start"), col("rank"))
    }, Some("""
      WITH r AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
               event_id, value,
               CAST(row_number() OVER (PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP))
                 ORDER BY value DESC, event_id) AS INT) AS rank
        FROM events)
      SELECT window_start, rank, event_id, value
      FROM r WHERE rank <= 3
      ORDER BY window_start, rank""")),

    // Streaming-shaped: sessionization — 30-minute inactivity gap splits
    // sessions (gaps-and-islands; batch form of session_window).
    QueryDef("stream_sessionize", (s, dir) => {
      val w  = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t("events")(s, dir)
        .withColumn("__prev", lag(col("ts"), 1).over(w))
        .withColumn("__new", when(col("__prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev")) > 1800L * 1000000L, 1L)
          .otherwise(0L))
        .withColumn("session_id", sum(col("__new")).over(ws))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).cast("timestamp_ntz").as("session_start"),
          max(col("ts")).cast("timestamp_ntz").as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    }, Some("""
      WITH o AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               lag(CAST(ts AS TIMESTAMP)) OVER
                 (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        FROM events),
      f AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS newf
        FROM o),
      sx AS (
        SELECT user_id, event_id, ts,
               sum(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
        FROM f)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
      FROM sx GROUP BY user_id, session_id ORDER BY user_id, session_id"""))
  )
}
