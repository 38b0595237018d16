package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static bodies of the custom expressions, shared by interpreted eval and
  * generated code. A standalone Scala object gets Java static forwarders,
  * so whole-stage-codegen'd Java calls these directly — one static call per
  * row instead of a CodegenFallback expression that drops the enclosing
  * operator out of codegen.
  */
object ExprOps {

  /** Distinct character n-grams in first-occurrence order (codepoint
    * semantics); `sortGrams` → UTF8String (byte) order instead.
    */
  def charNgrams(s: UTF8String, n: Int, sortGrams: Boolean): ArrayData = {
    val bytes = s.getBytes
    // codepoint start offsets (O(len) walk — substringSQL per position
    // would be O(len²))
    val offs = new java.util.ArrayList[Int]()
    var o = 0
    while (o < bytes.length) {
      offs.add(o)
      o += UTF8String.numBytesForFirstByte(bytes(o))
    }
    offs.add(bytes.length)
    val len = offs.size() - 1
    if (n <= 0 || len - n + 1 <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      val from = offs.get(i)
      seen.add(UTF8String.fromBytes(bytes, from, offs.get(i + n) - from))
      i += 1
    }
    val arr = seen.toArray.asInstanceOf[Array[AnyRef]]
    if (sortGrams) java.util.Arrays.sort(arr,
      (a: AnyRef, b: AnyRef) =>
        a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]))
    new GenericArrayData(arr)
  }

  /** Unicode NFC canonical composition; zero-copy when the input is
    * already normalized (the overwhelming case on real corpora).
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  // All of Unicode's mark categories — nonspacing (Mn), spacing-combining
  // (Mc: e.g. Devanagari/Bengali vowel signs), and enclosing (Me). utf8proc
  // STRIPMARK removes every \p{M} codepoint, not just Mn; stripping only Mn
  // diverges from the DuckDB oracle on Indic scripts.
  private val CombiningMarks = java.util.regex.Pattern.compile("\\p{M}+")

  /** Accent stripping: canonical decomposition, drop the combining marks
    * (all of \p{M}), recompose what remains — byte-identical to utf8proc's
    * STRIPMARK semantics (DuckDB `strip_accents`): ñ → n, while letters
    * with no decomposition (ø, Hangul syllables) pass through unchanged.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val stripped = CombiningMarks.matcher(nfd).replaceAll("")
    val out = java.text.Normalizer.normalize(stripped, java.text.Normalizer.Form.NFC)
    if (out == str) s else UTF8String.fromString(out)
  }

  /** Count of distinct common elements of two string arrays. */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[UTF8String](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      set.add(small.getUTF8String(i)); i += 1
    }
    var cnt = 0
    val seen = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < large.numElements()) {
      val e = large.getUTF8String(i)
      if (set.contains(e) && seen.add(e)) cnt += 1
      i += 1
    }
    cnt
  }

  /** Distinct word w-shingles in first-occurrence order. */
  def wordShingles(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (w <= 0 || n - w + 1 <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](2 * w - 1)
    var i = 0
    while (i <= n - w) {
      var j = 0
      while (j < w) {
        if (j > 0) parts(2 * j - 1) = space
        parts(2 * j) = toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  private def jAtLeast(inter: Int, total: Int, t: Double): Boolean = {
    val union = total - inter
    if (union == 0) false // matches jaccard() = 0.0 for two empty arrays
    else inter.toDouble / union.toDouble >= t
  }

  /** `jaccard(a, b) >= t` over two SORTED distinct string arrays: one merge
    * scan with conservative early exits (see JaccardGeq's exactness
    * contract — the decisive division is identical to the scorer's).
    */
  def jaccardGeq(a: ArrayData, b: ArrayData, t: Double): Boolean = {
    val na = a.numElements()
    val nb = b.numElements()
    val total = na + nb
    val maxI = math.min(na, nb)
    // minimal intersection count that satisfies the predicate, found by
    // binary search with the IDENTICAL double test (J monotonic in I) —
    // the merge loop below then needs only integer compares
    var lo = 0; var hi = maxI + 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (jAtLeast(mid, total, t)) hi = mid else lo = mid + 1
    }
    val required = lo // maxI+1 ⇒ unreachable
    if (required == 0) return true
    if (required > maxI) return false
    var i = 0; var j = 0; var m = 0
    while (i < na && j < nb) {
      if (m >= required) return true
      if (m + math.min(na - i, nb - j) < required) return false
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { m += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    m >= required
  }

  /** Sort an array of structs by their full field tuple and concatenate the
    * LAST field (string) with `sep`, skipping nulls — array_sort +
    * transform(_.getField) + array_join fused into one pass with a direct
    * row comparator instead of an interpreted comparator lambda per
    * comparison.
    */
  def sortJoinLast(arr: ArrayData, sep: UTF8String,
                   ord: java.util.Comparator[AnyRef], numFields: Int): UTF8String = {
    val n = arr.numElements()
    val rows = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      // copy: unsafe-backed structs share their buffer with the array
      if (!arr.isNullAt(i)) rows.add(arr.getStruct(i, numFields).copy())
      i += 1
    }
    val a = rows.toArray
    java.util.Arrays.sort(a, ord)
    val parts = new java.util.ArrayList[UTF8String](2 * a.length)
    i = 0
    while (i < a.length) {
      val r = a(i).asInstanceOf[InternalRow]
      if (!r.isNullAt(numFields - 1)) {
        if (!parts.isEmpty) parts.add(sep)
        parts.add(r.getUTF8String(numFields - 1))
      }
      i += 1
    }
    UTF8String.concat(parts.toArray(new Array[UTF8String](parts.size())): _*)
  }

  /** Best Levenshtein ratio of `s` against a constant name list, with the
    * exact per-pair formula of SimFns.levRatio / the DuckDB oracle:
    * maxLen == 0 → 100.0 else (1.0 − d/maxLen) · 100.0 — same operations in
    * the same order, so the running max is over bit-identical doubles.
    */
  def maxLevRatio(s: UTF8String, names: Array[UTF8String]): Double = {
    val slen = s.numChars()
    var best = Double.NegativeInfinity
    var i = 0
    while (i < names.length) {
      val n = names(i)
      val maxLen = math.max(slen, n.numChars())
      val r = if (maxLen == 0) 100.0
              else (1.0 - s.levenshteinDistance(n).toDouble / maxLen.toDouble) * 100.0
      if (r > best) best = r
      i += 1
    }
    best
  }

  /** Schedule-time parse → seconds past midnight (reference rules; see
    * ParseScheduleTime's Scaladoc).
    */
  def parseScheduleTime(v: UTF8String): Int = {
    val raw = v.toString
    // cleaned = strip ASCII spaces only, case preserved (the reference does
    // time_str.replace(' ', '') and nothing else)
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c != ' ') sb.append(c)
      i += 1
    }
    val s = sb.toString
    // ^(\d{1,2})(?::(\d{1,2}))?(AM|PM)$  (uppercase suffix required: the
    // reference gates on a literal 'AM'/'PM' substring before parsing)
    val n = s.length
    if (n < 3) return 0
    val ap = s.substring(n - 2)
    if (ap != "AM" && ap != "PM") return 0
    val body = s.substring(0, n - 2)
    var hh = 0; var mm = 0
    val colon = body.indexOf(':')
    def digits(str: String, lo: Int, hi: Int): Boolean = {
      if (hi <= lo) return false
      var j = lo
      while (j < hi) { if (!Character.isDigit(str.charAt(j))) return false; j += 1 }
      true
    }
    if (colon >= 0) {
      val mmLen = body.length - colon - 1
      if (!digits(body, 0, colon) || colon > 2 ||
          mmLen < 1 || mmLen > 2 || !digits(body, colon + 1, body.length)) return 0
      hh = body.substring(0, colon).toInt
      mm = body.substring(colon + 1).toInt
    } else {
      if (!digits(body, 0, body.length) || body.length > 2) return 0
      hh = body.toInt
    }
    if (hh < 1 || hh > 12 || mm > 59) return 0
    val hour24 = if (ap == "PM" && hh < 12) hh + 12
                 else if (ap == "AM" && hh == 12) 0
                 else hh
    hour24 * 3600 + mm * 60
  }

  /** Rolling polynomial fingerprint over a token array — one compiled
    * loop per row, replacing the interpreted transform+aggregate HOF
    * chain. Bit-identical to
    * `aggregate(transform(toks, t -> (ascii(t)*131 + length(t))::long),
    *            0L, (acc, v) -> (acc*31 + v) % 1000000007)`:
    * ascii = codepoint of the first character (Spark Ascii semantics,
    * empty → 0), length = character count, fold strictly left-to-right.
    */
  def rollingFingerprint(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val chars = t.numChars()
      val a = if (chars > 0) t.substring(0, 1).toString.codePointAt(0) else 0
      h = (h * 31L + (a.toLong * 131L + chars.toLong)) % 1000000007L
      i += 1
    }
    h
  }

  /** Content-defined chunk START offsets (0-based codepoint offsets) of a
    * string, one left-to-right pass: a cut falls AFTER codepoint position
    * `i` (1-based) whenever the polynomial hash of the trailing `window`
    * codepoints `(((c₁·31 + c₂)·31 + c₃)·31 + c₄) mod modulus == 0` and
    * `i < len` (a terminal cut would add an empty chunk). The result is
    * `{0} ∪ {cut positions}` sorted ascending; empty string → empty array.
    *
    * Codepoint semantics (not UTF-16 chars, not bytes) so the DuckDB
    * oracle's `ord(substr(text, i, 1))` mirror computes the identical
    * hash. The window hash is recomputed per position (window is 4; a
    * rolling update would save nothing measurable and would need modular
    * inverse bookkeeping the SQL mirror can't express).
    */
  def cdcStarts(s: UTF8String, window: Int, modulus: Int): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val starts = new java.util.ArrayList[Any]()
    starts.add(Integer.valueOf(0))
    var j = window - 1 // 0-based index of the window's last codepoint
    while (j < n) {
      var h = 0
      var w = j - window + 1
      while (w <= j) { h = h * 31 + cps(w); w += 1 }
      if (h % modulus == 0 && j + 1 < n) starts.add(Integer.valueOf(j + 1))
      j += 1
    }
    new GenericArrayData(starts.toArray)
  }

  /** DEFLATE-compressed size of a string's UTF-8 bytes (level 6, raw
    * deflate — no gzip header, so the size is pure entropy signal).
    * Deterministic: zlib's output for a fixed level/strategy/input is
    * fixed. One Deflater per call — the object is not thread-safe and
    * rows evaluate concurrently across tasks; allocation is dwarfed by
    * the compression itself.
    */
  def deflateLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 0
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** [[NearestCentroid]]'s loop: argmin over `||v−c||² = v·v − 2 v·c +
    * Σc²` with [[DotProduct]]-identical left-to-right double accumulation;
    * `ccs`/`cids` are precomputed per centroid, centroids arrive sorted by
    * id and the strict `<` keeps the lowest id on exact ties — the same
    * answer as `array_min` over per-centroid (d, cid) structs.
    */
  def nearestCentroid(v: ArrayData, isFloat: Boolean,
                      cents: Array[Array[Double]], ccs: Array[Double],
                      cids: Array[Int]): Int = {
    val n = v.numElements()
    var dvv = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      dvv += x * x
      i += 1
    }
    var best = Double.PositiveInfinity
    var bestCid = if (cids.length > 0) cids(0) else -1
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val m = math.min(n, c.length)
      var dvc = 0.0
      i = 0
      while (i < m) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dvc += x * c(i)
        i += 1
      }
      val d = dvv - 2.0 * dvc + ccs(j)
      if (d < best) { best = d; bestCid = cids(j) }
      j += 1
    }
    bestCid
  }

  /** [[NearestCentroidDist]]'s loop: the MIN squared L2 distance itself
    * (same accumulation as [[nearestCentroid]], which returns the argmin
    * id) — the k-means‖ sampling weight, clamped at 0 against the
    * dvv − 2·dvc + Σc² form's tiny negative float residue when v ≡ c.
    */
  def nearestCentroidDistSq(v: ArrayData, isFloat: Boolean,
                            cents: Array[Array[Double]],
                            ccs: Array[Double]): Double = {
    val n = v.numElements()
    var dvv = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      dvv += x * x
      i += 1
    }
    var best = Double.PositiveInfinity
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val m = math.min(n, c.length)
      var dvc = 0.0
      i = 0
      while (i < m) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dvc += x * c(i)
        i += 1
      }
      val d = dvv - 2.0 * dvc + ccs(j)
      if (d < best) best = d
      j += 1
    }
    if (best < 0.0) 0.0 else best
  }

  /** Left-to-right dot product of two dense double vectors — the same
    * accumulation order as `VecFns.dot` / `Sql.dot`, so cosines computed
    * here are bit-identical to both engines' column formulations.
    */
  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    val m = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < m) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Cosine with the zero-norm guard, mirroring `Sql.cosine`:
    * `d / (na * nb)` — norms multiplied FIRST, then one division.
    */
  private def cosD(a: Array[Double], b: Array[Double]): Double = {
    val na = math.sqrt(dotD(a, a))
    val nb = math.sqrt(dotD(b, b))
    if (na == 0.0 || nb == 0.0) 0.0 else dotD(a, b) / (na * nb)
  }

  /** [[MmrSelect]]'s greedy loop: maximal-marginal-relevance selection of
    * `k` items from a BOUNDED candidate array (each element a struct
    * `(id: long, rel: double, vec: array<float|double>)`).
    *
    * Step 1 picks argmax relevance; step i>1 picks
    * `argmax λ·rel − μ·maxSim(c, selected)` — λ and μ arrive as SEPARATE
    * literals (never `1−λ`: `1.0-0.7` is not the double `0.3`, and the
    * oracle writes `0.3`). Candidates are scanned in ascending-id order
    * with a strict `>`, so exact ties keep the LOWEST id — the same total
    * order as the oracle's `ORDER BY marginal DESC, doc_id LIMIT 1`.
    * `maxSim` is maintained incrementally (one cosine per remaining
    * candidate per step — O(n·k·dim) total); max over identical doubles is
    * order-free, so it equals the oracle's `max(s)` correlated subquery.
    *
    * Returns `array<struct<pos:int, doc_id:long, rel:double,
    * marginal:double>>` in selection order.
    */
  def mmrSelect(cands: ArrayData, isFloat: Boolean, k: Int,
                lambda: Double, mu: Double): ArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val r = cands.getStruct(i, 3)
      ids(i) = r.getLong(0)
      rels(i) = r.getDouble(1)
      val a = r.getArray(2)
      val m = a.numElements()
      val v = new Array[Double](m)
      var j = 0
      while (j < m) {
        v(j) = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
        j += 1
      }
      vecs(i) = v
      i += 1
    }
    // ascending-id scan order makes the strict-> argmax keep the lowest id
    val ord = Array.range(0, n).sortBy(ids(_))
    val taken = new Array[Boolean](n)
    val maxSim = new Array[Double](n) // valid from step 2 (all updated at step 1)
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.min(k, n))
    var step = 1
    while (step <= math.min(k, n)) {
      var bestIdx = -1
      var bestMarg = 0.0
      var oi = 0
      while (oi < ord.length) {
        val c = ord(oi)
        if (!taken(c)) {
          val marg =
            if (step == 1) rels(c) else lambda * rels(c) - mu * maxSim(c)
          if (bestIdx < 0 || marg > bestMarg) { bestIdx = c; bestMarg = marg }
        }
        oi += 1
      }
      taken(bestIdx) = true
      out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](step, ids(bestIdx), rels(bestIdx), bestMarg))
      oi = 0
      while (oi < ord.length) {
        val c = ord(oi)
        if (!taken(c)) {
          val s = cosD(vecs(c), vecs(bestIdx))
          if (step == 1 || s > maxSim(c)) maxSim(c) = s
        }
        oi += 1
      }
      step += 1
    }
    new GenericArrayData(out.toArray)
  }
}
