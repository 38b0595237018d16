package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Round-9 curation wave 3: SQ8 ANN, cluster-balanced sampling,
  * winnowing fingerprints, PRF expansion, blocked entity resolution.
  * Engine-side invariants, independent of the DuckDB oracle gate.
  */
class CurationWave3Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.load(spark, dir, "embeddings")

  // --- SQ8 ANN ---

  test("sqTopK: high recall vs exact brute force, and lossy scores stay close") {
    val q = emb.where($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    val sq = Ann.sqTopK(q, emb, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sqSets = sq.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(sqSets.keySet == exactSets.keySet)
    // int8 quantization barely moves 64-dim cosines: expect near-total
    // agreement of the top-5 sets
    val recall = exactSets.keys.toSeq.map { k =>
      (sqSets(k) intersect exactSets(k)).size / 5.0
    }.sum / exactSets.size
    assert(recall >= 0.9, s"mean recall@5 = $recall")
    // and the quantized cosine of any returned pair is within SQ8 error
    val exactByPair = exact.map { case (a, b, c) => ((a, b), c) }.toMap
    sq.foreach { case (a, b, c) =>
      exactByPair.get((a, b)).foreach { e =>
        assert(math.abs(c - e) < 0.05, s"pair ($a,$b): sq=$c exact=$e")
      }
    }
  }

  test("sqTopK: zero corpus vector reconstructs to zero, never NaN") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val got = Ann.sqTopK(df.where($"vec_id" === 0), df, "vec_id", "embedding", 2)
      .select($"neighbor_id", $"cosine").as[(Long, Double)].collect().toMap
    assert(!got.values.exists(_.isNaN))
    assert(got(1L) == 0.0) // zero vector: cosine 0 by the zero-norm guard
    assert(got(2L) > 0.95)
  }

  // --- cluster-balanced sampling ---

  test("sample_cluster_balanced: per-cell quota respected, deterministic, ids real") {
    val fn = queries.CurationWave3Queries.defs
      .find(_.name == "sample_cluster_balanced").get.fn
    val got = fn(spark, dir)
      .select($"vec_id", $"cell", $"rk", $"n_cell")
      .as[(Long, Int, Int, Long)].collect()
    val byCell = got.groupBy(_._2)
    byCell.foreach { case (cell, rows) =>
      val nCell = rows.head._4
      assert(rows.length == math.min(nCell, 16L),
        s"cell $cell kept ${rows.length} of $nCell")
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // sizes add up to the corpus
    assert(byCell.values.map(_.head._4).sum == emb.count())
    // deterministic: second run identical
    val again = fn(spark, dir)
      .select($"vec_id", $"cell", $"rk", $"n_cell")
      .as[(Long, Int, Int, Long)].collect()
    assert(got.toSeq == again.toSeq)
  }

  // --- winnowing ---

  /** Independent winnowing reference: same hash (md5-prefix of the char
    * 8-gram), explicit window scan with rightmost-min tie, consecutive
    * position dedupe, (a·31+h) mod 1e9+7 fold.
    */
  private def refWinnow(text: String, k: Int = 8, w: Int = 4): (Long, Long, Long) = {
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    val n = math.max(text.length - k + 1, 0)
    val hs = (0 until n).map(i => h32(text.substring(i, i + k)))
    val nw = math.max(n - w + 1, math.min(n, 1))
    var lastp, nfp = 0L
    var fh = 0L
    for (j <- 0 until nw) {
      var bh = Long.MaxValue; var bp = 0
      for (o <- 0 until math.min(w, n - j)) {
        val p = j + o
        if (hs(p) <= bh) { bh = hs(p); bp = p + 1 }
      }
      if (bp != lastp) { lastp = bp; nfp += 1; fh = (fh * 31 + bh) % 1000000007L }
    }
    (n.toLong, nfp, fh)
  }

  test("text_winnowing: matches the brute-force reference on the corpus + edges") {
    val fn = queries.CurationWave3Queries.defs
      .find(_.name == "text_winnowing").get.fn
    val got = fn(spark, dir)
      .select($"doc_id", $"n_grams", $"n_fp", $"fp_hash")
      .as[(Long, Long, Long, Long)].collect()
    val texts = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    got.foreach { case (id, n, nfp, fh) =>
      assert((n, nfp, fh) == refWinnow(texts(id)), s"doc $id")
    }
    assert(got.length == texts.size)
  }

  test("text_winnowing: MOSS guarantee — shared substring >= k+w-1 shares a fingerprint") {
    // selections via the reference on synthetic docs with an 11-char
    // (= k+w-1) common substring in different contexts
    def selections(text: String, k: Int = 8, w: Int = 4): Set[Long] = {
      def h32(s: String): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
      }
      val n = math.max(text.length - k + 1, 0)
      val hs = (0 until n).map(i => h32(text.substring(i, i + k)))
      val nw = math.max(n - w + 1, math.min(n, 1))
      (0 until nw).map { j =>
        (0 until math.min(w, n - j)).map(o => (hs(j + o), j + o))
          .reduceLeft((a, b) => if (b._1 <= a._1) b else a)._1
      }.toSet
    }
    val shared = "QWERTYUIOPA" // 11 chars = k + w - 1
    val d1 = "xxxx" + shared + "yyyyyyyy"
    val d2 = "zzzzzzzzzz" + shared + "wwww"
    assert((selections(d1) intersect selections(d2)).nonEmpty)
  }

  // --- PRF expansion ---

  test("retrieval_prf_expansion: terms come from pseudo-relevant docs, query terms excluded") {
    val fn = queries.CurationWave3Queries.defs
      .find(_.name == "retrieval_prf_expansion").get.fn
    val got = fn(spark, dir)
      .select($"rank", $"term", $"w", $"n_docs")
      .as[(Int, String, Double, Long)].collect()
    assert(got.length == 15)
    assert(got.map(_._1).toSeq == (1 to 15).toSeq)
    assert(!got.exists(r => r._2 == "table" || r._2 == "spark"))
    // weights are positive, bounded by n_docs (each per-doc fraction < 1),
    // and non-increasing in rank
    got.foreach { case (_, t, w, nd) =>
      assert(w > 0.0 && w <= nd.toDouble, s"term $t")
    }
    assert(got.map(_._3).toSeq == got.map(_._3).sortBy(-_).toSeq)
  }

  // --- entity resolution ---

  test("er_entity_resolution: entities are the transitive closure of blocked fuzzy edges") {
    val fn = queries.CurationWave3Queries.defs
      .find(_.name == "er_entity_resolution").get.fn
    val got = fn(spark, dir)
      .select($"p_name", $"name_id", $"entity_id", $"n_parts")
      .as[(String, Long, Long, Long)].collect()
    // independent reference: recompute edges with java's levenshtein-free
    // DP + union-find on the driver
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def ratio(a: String, b: String): Double = {
      val m = math.max(a.length, b.length)
      if (m == 0) 100.0 else (1.0 - lev(a, b) / m.toDouble) * 100.0
    }
    val names = got.map(r => (r._2, r._1)).toMap // name_id -> name
    val parent = scala.collection.mutable.Map(names.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    val ids = names.keys.toSeq.sorted
    for (i <- ids; j <- ids if i < j) {
      val (na, nb) = (names(i), names(j))
      if (na.split(" ").last == nb.split(" ").last && ratio(na, nb) >= 75.0)
        union(i, j)
    }
    val expected = ids.map(id => id -> find(id)).toMap
    got.foreach { case (nm, id, ent, _) =>
      assert(ent == expected(id), s"name '$nm' ($id): got $ent expected ${expected(id)}")
    }
    // sanity: the threshold actually merges something and splits something
    val nEntities = got.map(_._3).distinct.length
    assert(nEntities > 1 && nEntities < got.length)
  }

  test("span corruption plan: non-overlapping, in-bounds, one span per 20 tokens") {
    val rows = SparkEntry.queries("span_corruption_plan")(spark, dir)
      .select($"doc_id", $"n", $"span_idx", $"span_start", $"span_len")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._5 == 3L))
    // within bounds: every span ends inside the document
    assert(rows.forall { case (_, n, _, start, len) => start >= 0 && start + len <= n })
    rows.groupBy(_._1).foreach { case (_, spans) =>
      val s = spans.sortBy(_._3)
      // exactly n DIV 20 spans, indexed densely from 0
      assert(s.map(_._3).toSeq == (0L until (s.head._2 / 20)))
      // stride placement ⇒ strictly non-overlapping in order
      s.sliding(2).foreach {
        case Array(a, b) => assert(b._4 >= a._4 + a._5, s"overlap: $a $b")
        case _ =>
      }
    }
  }
}
