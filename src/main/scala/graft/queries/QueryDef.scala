package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate query: the Spark implementation plus (when the op is
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same tables.
  * Column names/aliases must match exactly — the driver sorts columns by
  * name before hashing values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** DuckDB-SQL snippet builders mirrored 1:1 by the Spark column functions in
  * `graft.functions`. Keeping both sides generated next to each other is
  * what keeps the oracle honest: every fold is sequential left-to-right in
  * both engines, every division is done in double, every hash is md5 —
  * so results match bit-for-bit, no tolerance needed.
  */
object Sql {

  /** Whitespace tokens, empties dropped (mirrors TextAnalysisFns.tokens). */
  def tokens(c: String): String =
    s"list_filter(str_split_regex($c, '\\s+'), t -> t <> '')"

  /** Distinct char n-grams; n may be an expression (mirrors SimFns.charNgrams). */
  def charNgrams(s: String, n: String): String =
    s"list_distinct(list_transform(generate_series(1, greatest(length($s) - ($n) + 1, 0)), i -> ($s)[i:i+($n)-1]))"

  /** Distinct word w-shingles (mirrors SimFns.wordShingles). */
  def wordShingles(toks: String, w: Int): String =
    s"list_distinct(list_transform(generate_series(1, greatest(len($toks) - $w + 1, 0)), i -> array_to_string(($toks)[i:i+${w - 1}], ' ')))"

  /** Jaccard of two distinct-element lists (mirrors SimFns.jaccard). */
  def jaccard(a: String, b: String): String =
    s"CASE WHEN len(list_distinct(list_concat($a, $b))) = 0 THEN 0.0 " +
      s"ELSE len(list_intersect($a, $b)) / CAST(len(list_distinct(list_concat($a, $b))) AS DOUBLE) END"

  /** Reference n-gram size rule (mirrors SimFns.refNgramSize). */
  def refNgramSize(s: String): String =
    s"greatest(5, CAST(round(sqrt(length($s) / 2.0)) AS INT))"

  /** Levenshtein ratio 0..100 (mirrors SimFns.levRatio). */
  def levRatio(a: String, b: String): String =
    s"CASE WHEN greatest(length($a), length($b)) = 0 THEN 100.0 " +
      s"ELSE (1.0 - levenshtein($a, $b) / CAST(greatest(length($a), length($b)) AS DOUBLE)) * 100.0 END"

  /** clean_str (mirrors TextFns.cleanStr). */
  def cleanStr(c: String): String =
    s"lower(regexp_replace(regexp_replace($c, 'ñ|Ñ', 'n', 'g'), 'ã±', 'n', 'g'))"

  /** normalize_location (mirrors TextFns.normalizeLocation). */
  def normalizeLocation(c: String): String = {
    val lowered = s"lower($c)"
    val letters = s"regexp_replace($lowered, '[^a-z\\s]', '', 'g')"
    val dropped = s"regexp_replace($letters, '\\b(city of|municipality of)\\b', '', 'g')"
    val gen     = s"regexp_replace($dropped, '\\bgen\\b', 'general', 'g')"
    val sto     = s"regexp_replace($gen, '\\bsto\\b', 'santo', 'g')"
    s"trim(regexp_replace($sto, '\\s+', ' ', 'g'))"
  }

  /** Sequential left-fold sum of a double list, init 0.0 (mirrors
    * VecFns dot-product fold — identical order ⇒ identical doubles).
    */
  def foldSum(xs: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $xs), (acc, v) -> acc + v)"

  /** Elementwise product list in double (mirrors VecFns.dot's zip_with). */
  def products(a: String, b: String): String =
    s"list_transform(generate_series(1, len($a)), i -> CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE))"

  def dot(a: String, b: String): String = foldSum(products(a, b))

  /** Cosine similarity (mirrors VecFns.cosine). */
  def cosine(a: String, b: String): String = {
    val d  = dot(a, b)
    val na = s"sqrt(${dot(a, a)})"
    val nb = s"sqrt(${dot(b, b)})"
    s"CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0 ELSE $d / ($na * $nb) END"
  }

  /** MinHash signature as a list of md5 hex strings (mirrors
    * HashFns.minhashSignature).
    */
  def minhashSignature(shingles: String, k: Int): String =
    s"list_transform(generate_series(0, ${k - 1}), j -> list_min(list_transform($shingles, s -> md5(CAST(j AS VARCHAR) || ':' || s)))) "

  /** LSH band keys (mirrors HashFns.lshBandKeys). */
  def lshBandKeys(sig: String, b: Int, r: Int): String =
    s"list_transform(generate_series(0, ${b - 1}), i -> CAST(i AS VARCHAR) || '#' || md5(array_to_string(($sig)[i*$r+1:i*$r+$r], ',')))"

  /** 60-bit md5-prefix hash (mirrors SketchFns.hash60). */
  def hash60(v: String): String =
    s"CAST(concat('0x', substr(md5(CAST($v AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** 52-bit md5-prefix hash (mirrors SketchFns.hash52). */
  def hash52(v: String): String =
    s"CAST(concat('0x', substr(md5(CAST($v AS VARCHAR)), 1, 13)) AS BIGINT)"

  /** 32-bit md5-prefix hash (mirrors SketchFns.hash32). */
  def hash32(v: String): String =
    s"CAST(concat('0x', substr(md5(CAST($v AS VARCHAR)), 1, 8)) AS BIGINT)"

  /** Leading-one rank in the 51-bit HLL remainder window (mirrors
    * SketchFns.hllRho — a generated branch chain, NOT log2: libm rounding
    * is not portable across engines).
    */
  def hllRho(rem: String): String = {
    val bits = graft.functions.SketchFns.HllRemBits
    val cases = (0 until bits)
      .map(i => s"WHEN $rem >= ${1L << (bits - 1 - i)} THEN ${i + 1}")
      .mkString(" ")
    s"CASE $cases ELSE ${bits + 1} END"
  }

  /** Count-Min cell for hash row j (mirrors SketchFns.cmsCell). */
  def cmsCell(j: String, v: String, width: Int): String =
    s"CAST(concat('0x', substr(md5(CAST($j AS VARCHAR) || ':' || CAST($v AS VARCHAR)), 1, 8)) AS BIGINT) % $width"

  /** The shipped BPE merges table as VALUES rows (rank, p1, p2) — the
    * SINGLE source of truth is the classpath resource BpeOps loads, so
    * the oracle can never drift from the engine's table.
    */
  def bpeMergesValues: String =
    graft.expressions.BpeOps.default.merges.zipWithIndex
      .map { case ((p1, p2), i) =>
        s"(${i + 1},'${p1.replace("'", "''")}','${p2.replace("'", "''")}')" }
      .mkString(",")

  /** RE2-safe GPT-2 pretokenizer (single-quote-escaped for SQL): exactly
    * the GPT-2 pattern minus the whitespace lookahead branch, which only
    * matters for multi-whitespace runs — the corpus has none.
    */
  def gpt2Re2Pattern: String =
    "''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** RE2-safe o200k_base pretokenizer (tiktoken's published pattern with
    * the `\\s+(?!\\S)` lookahead branch dropped — same corpus argument as
    * [[gpt2Re2Pattern]]; RE2 supports the `(?i:...)` groups and unicode
    * categories directly, and DuckDB matched Java on the divergence
    * fixtures: case-insensitive contraction absorption, 3-digit chunking,
    * leading non-letter absorption).
    */
  def o200kRe2Pattern: String =
    "[^\\r\\n\\p{L}\\p{N}]?[\\p{Lu}\\p{Lt}\\p{Lm}\\p{Lo}\\p{M}]*[\\p{Ll}\\p{Lm}\\p{Lo}\\p{M}]+" +
      "(?i:''s|''t|''re|''ve|''m|''ll|''d)?" +
      "|[^\\r\\n\\p{L}\\p{N}]?[\\p{Lu}\\p{Lt}\\p{Lm}\\p{Lo}\\p{M}]+[\\p{Ll}\\p{Lm}\\p{Lo}\\p{M}]*" +
      "(?i:''s|''t|''re|''ve|''m|''ll|''d)?" +
      "|\\p{N}{1,3}| ?[^\\s\\p{L}\\p{N}]+[\\r\\n/]*|\\s*[\\r\\n]+|\\s+"

  /** The o200k-subset fixture's implicit merge list as VALUES rows —
    * recovered from the committed tiktoken rank file
    * ([[graft.expressions.BpeOps.mergePairsFromRanks]]), so the oracle
    * can never drift from the resource the engine loads.
    */
  def bpeO200kMergesValues: String =
    graft.expressions.BpeOps
      .mergePairsFromRanks(graft.expressions.BpeOps.o200kFixture.entries)
      .zipWithIndex
      .map { case ((p1, p2), i) =>
        s"(${i + 1},'${p1.replace("'", "''")}','${p2.replace("'", "''")}')" }
      .mkString(",")

  /** CTE chain computing per-document EXACT BPE token counts —
    * `bpe_counts(doc_id, n_bpe)` over `documents` — by replaying ENCODING
    * in DuckDB (mirrors expressions.BpeOps): the encoding's RE2-safe
    * pretokenizer, space→Ġ byte-symbol mapping, then each pretoken's
    * symbol string folded through every merge in rank order (≡ the
    * min-rank/tiktoken loop for any valid trained table — BpeSpec pins
    * the law corpus-wide for BOTH shipped tables). Compose as
    * `WITH $bpeDocCountCtes, ...`.
    * NB: no line may START with '|' (stripMargin); '||' stays mid-line.
    */
  def bpeDocCountCtesFor(mergesValues: String, re2Pattern: String): String = s"""
      bpe_m AS (SELECT * FROM (VALUES $mergesValues) m(rank, p1, p2)),
      bpe_ml AS (SELECT list(p1 || ' ' || p2 ORDER BY rank) AS ms FROM bpe_m),
      bpe_pt AS (SELECT doc_id, unnest(regexp_extract_all(text,
                   '$re2Pattern')) AS pt,
                   unnest(generate_series(1, len(regexp_extract_all(text,
                   '$re2Pattern')))) AS pt_ord
                 FROM documents),
      bpe_sym AS (
        SELECT doc_id, pt_ord,
          list_reduce(
            list_prepend(array_to_string(str_split(replace(pt, ' ', 'Ġ'), ''), ' '), ms),
            (acc, mg) -> list_reduce(
              list_prepend('', str_split(acc, ' ')),
              (a2, x) -> CASE WHEN a2 = '' THEN x
                WHEN x = split_part(mg, ' ', 2) AND (a2 = split_part(mg, ' ', 1)
                     OR ends_with(a2, ' ' || split_part(mg, ' ', 1)))
                  THEN CASE WHEN a2 = split_part(mg, ' ', 1) THEN replace(mg, ' ', '')
                       ELSE concat(substr(a2, 1, length(a2) - length(split_part(mg, ' ', 1)) - 1),
                                   ' ', replace(mg, ' ', '')) END
                ELSE a2 || ' ' || x END)
          ) AS fs
        FROM bpe_pt CROSS JOIN bpe_ml),
      bpe_enc AS (SELECT doc_id, len(str_split(fs, ' ')) AS n FROM bpe_sym),
      bpe_counts AS (
        SELECT d.doc_id, CAST(coalesce(s.n, 0) AS BIGINT) AS n_bpe
        FROM documents d
        LEFT JOIN (SELECT doc_id, sum(n) AS n FROM bpe_enc GROUP BY doc_id) s
        USING (doc_id))"""

  /** The GPT-2-format shipped table's count CTEs. */
  def bpeDocCountCtes: String = bpeDocCountCtesFor(bpeMergesValues, gpt2Re2Pattern)

  /** The o200k-subset fixture's count CTEs: o200k pretokenizer, merge
    * pairs recovered from the tiktoken rank file.
    */
  def bpeO200kDocCountCtes: String =
    bpeDocCountCtesFor(bpeO200kMergesValues, o200kRe2Pattern)

  /** CTE chain extending [[bpeDocCountCtes]] to per-document BPE id
    * SEQUENCES: `bpe_doc_ids(doc_id, n_toks, doc_hash)` — tokens joined
    * to the generated vocab, per-doc id lists reassembled in (pretoken,
    * symbol) order via zip-unnest ordinality, and the order-sensitive
    * `(a·31+id) mod 1e9+7` fold (mirrors
    * `TextAnalysisFns.bpeIdsFoldHash`). Shared by `bpe_ids_fingerprint`
    * and `pack_fingerprint` so the chained-hash invariant between them
    * has one source of truth. Docs with no tokens keep (0, 0) rows.
    */
  def bpeIdCtes: String = s"""
      $bpeDocCountCtes,
      bpe_vocab AS (SELECT * FROM (VALUES $bpeVocabValues) v(tok, id)),
      bpe_tk AS (SELECT doc_id, pt_ord,
                        unnest(str_split(fs, ' ')) AS tok,
                        unnest(generate_series(1, len(str_split(fs, ' ')))) AS ord
                 FROM bpe_sym),
      bpe_dh0 AS (SELECT doc_id,
                         CAST(count(*) AS BIGINT) AS n_toks,
                         list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list(v.id ORDER BY pt_ord, ord)),
                           (a, x) -> (a * 31 + x) % 1000000007) AS doc_hash,
                         CAST(max(v.id) AS BIGINT) AS max_id
                  FROM bpe_tk JOIN bpe_vocab v ON v.tok = bpe_tk.tok
                  GROUP BY doc_id),
      bpe_doc_ids AS (SELECT d.doc_id,
                             coalesce(h.n_toks, 0) AS n_toks,
                             coalesce(h.doc_hash, 0) AS doc_hash,
                             coalesce(h.max_id, -1) AS max_id
                      FROM documents d LEFT JOIN bpe_dh0 h USING (doc_id))"""

  /** The full derived vocabulary as VALUES rows (tok, id): 256 base byte
    * symbols (byte-value ids) + merge outputs (256 + rank) — mirrors
    * `BpeOps.Tokenizer.tokenToId`, generated from the same resource.
    */
  def bpeVocabValues: String = {
    val base = (0 until 256).map { b =>
      val tok = graft.expressions.BpeOps.byteToChar(b).toString
      s"('${tok.replace("'", "''")}',$b)"
    }
    val merged = graft.expressions.BpeOps.default.merges.zipWithIndex.map {
      case ((p1, p2), r) => s"('${(p1 + p2).replace("'", "''")}',${256 + r})"
    }
    (base ++ merged).mkString(",")
  }

  /** Rolling fingerprint (mirrors HashFns.rollingFingerprint). */
  def rollingFingerprint(toks: String): String = {
    val vals = s"list_transform($toks, t -> CAST(ascii(t) * 131 + length(t) AS BIGINT))"
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $vals), (acc, v) -> (acc * 31 + v) % 1000000007)"
  }
}
