package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.CdcChunkStarts
import graft.operators.Sampling

/** Round-6 retrieval wave: content-defined chunking invariants and the
  * reservoir sampler's agg ≡ window law.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // --- content-defined chunking ---

  /** Brute-force reference of ExprOps.cdcStarts (independent formulation:
    * substring hashes over codepoints).
    */
  private def refStarts(text: String, window: Int = 4, modulus: Int = 64): Seq[Int] = {
    val cps = text.codePoints().toArray
    if (cps.isEmpty) return Seq.empty
    val cuts = (window to cps.length).filter { i => // i = 1-based last-char pos
      val h = cps.slice(i - window, i).foldLeft(0)((a, c) => a * 31 + c)
      h % modulus == 0 && i < cps.length
    }
    0 +: cuts
  }

  test("cdc chunk starts: matches brute force, incl. unicode + edge cases") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefgh  ñ😀"
    val texts = Seq.fill(60)(
      (0 until rnd.nextInt(300)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    ) ++ Seq("", "ab", "abcd", "a" * 400)
    val got = texts.toDF("text")
      .select($"text", CdcChunkStarts($"text").as("starts")).collect()
    got.foreach { r =>
      val text = r.getString(0)
      assert(r.getSeq[Int](1) == refStarts(text), s"text=$text")
    }
  }

  test("cdc chunks: reassembly identity — chunks concatenate back to the doc") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val chunks = docs
      .select($"doc_id", $"text", CdcChunkStarts($"text").as("st"),
        posexplode(CdcChunkStarts($"text")).as(Seq("i", "b")))
      .withColumn("e", coalesce(try_element_at($"st", $"i" + lit(2)), length($"text")))
      .select($"doc_id", $"i", expr("substr(text, b + 1, e - b)").as("chunk"))
    val rebuilt = chunks.groupBy($"doc_id")
      .agg(concat_ws("", array_sort(collect_list(struct($"i", $"chunk")))
        .getField("chunk")).as("rebuilt"))
    val joined = docs.join(rebuilt, Seq("doc_id"))
      .where($"text" =!= $"rebuilt")
    assert(joined.count() == 0)
    // insertion-stability: a prefix edit leaves the tail chunks' hashes
    // intact (the fixed-size formulation would shift every one of them)
    val base = "the quick brown fox jumps over the lazy dog " * 20
    val edited = "XYZ " + base
    def chunkHashes(t: String): Seq[String] = {
      val starts = refStarts(t)
      (starts :+ t.length).sliding(2).map {
        case Seq(a, b) => java.security.MessageDigest.getInstance("MD5")
          .digest(t.substring(a, b).getBytes("UTF-8")).map("%02x".format(_)).mkString
      }.toSeq
    }
    val h0 = chunkHashes(base).toSet
    val h1 = chunkHashes(edited)
    assert(h1.count(h0.contains) >= h1.size - 2,
      "at most the first couple of chunks may differ after a prefix edit")
  }

  test("cdc chunk starts: stays inside whole-stage codegen over a real scan") {
    val scanDf = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(CdcChunkStarts($"text"))
    scanDf.collect()
    val plan = (scanDf.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    // AQE's ResultQueryStage renders codegen stages as "*(n)" markers
    val projectLine = plan.linesIterator.find(_.contains("cdc_chunk_starts"))
    assert(projectLine.exists(_.contains("*(")), plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }

  // --- reservoir sampling ---

  test("reservoir per group ≡ row_number window over the same hash; short groups kept whole") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderpriority", $"o_orderkey")
    val k = 7
    val got = Sampling.reservoirPerGroup(ev, "o_orderpriority", "o_orderkey", k, "s1")
    val h48 = conv(substring(md5(concat(lit("s1:"), $"o_orderkey".cast("string"))), 1, 12), 16, 10)
      .cast("bigint")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderpriority").orderBy($"h48", $"o_orderkey")
    val ref = ev.withColumn("h48", h48)
      .withColumn("rn", row_number().over(w).cast("int"))
      .where($"rn" <= k)
      .select($"o_orderpriority", $"rn", $"o_orderkey".cast("long").as("o_orderkey"), $"h48")
    assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0)
    // a group smaller than k survives intact, in hash order
    val tiny = Seq(("g", 1L), ("g", 2L), ("h", 3L)).toDF("grp", "id")
    val sampled = Sampling.reservoirPerGroup(tiny, "grp", "id", 10, "s2")
    assert(sampled.count() == 3)
    val rns = sampled.where($"grp" === "g").orderBy($"rn")
      .select($"rn").as[Int].collect().toSeq
    assert(rns == Seq(1, 2))
  }

  test("weighted priority sample ≡ row_number window over the same q = w/u") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderpriority", $"o_orderkey",
        ($"o_custkey" % 97 + lit(1)).as("w"))
    val k = 7
    val got = Sampling.priorityPerGroup(ev, "o_orderpriority", "o_orderkey",
      $"w", k, "p1")
    val h48 = conv(substring(md5(concat(lit("p1:"), $"o_orderkey".cast("string"))), 1, 12), 16, 10)
      .cast("bigint")
    val q = $"w".cast("double") /
      (($"h48" + lit(1L)).cast("double") / lit(281474976710656.0))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderpriority").orderBy($"priority".desc, $"o_orderkey")
    val ref = ev.withColumn("h48", h48).withColumn("priority", q)
      .withColumn("rn", row_number().over(win).cast("int"))
      .where($"rn" <= k)
      .select($"o_orderpriority", $"rn",
        $"o_orderkey".cast("long").as("o_orderkey"), $"priority")
    assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0)
  }

  test("priority sample: an overwhelming weight is always included, weight 0 never wins a contested slot") {
    // q = w/u with u = (h48+1)/2^48 ∈ (0,1] bounds q: w ≤ q ≤ w·2^48.
    // A 2^50 weight therefore beats every weight-1 row (whose q ≤ 2^48);
    // a weight-0 row has q = 0, below any positive-weight row.
    val rows = (1L to 50L).map(i => ("g", i, 1L)) :+ (("g", 99L, 1L << 50)) :+ (("g", 100L, 0L))
    val df = rows.toDF("grp", "id", "w")
    val top = Sampling.priorityPerGroup(df, "grp", "id", $"w", 5, "p2")
      .select($"id").as[Long].collect().toSet
    assert(top.contains(99L), s"heavy row missing from $top")
    assert(!top.contains(100L), s"zero-weight row sampled into a contested slot: $top")
  }

  // --- greedy MMR rerank ---

  /** Independent MMR reference: recomputes max-sim-to-selected FRESH each
    * step over the whole selected set (the expression maintains it
    * incrementally — max over identical doubles, so results must agree
    * exactly), and resolves argmax by sorting instead of a scan.
    */
  private def refMmr(cands: Seq[(Long, Double, Seq[Double])], k: Int,
                     lambda: Double, mu: Double): Seq[(Int, Long, Double, Double)] = {
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val na = math.sqrt(dot(a, a)); val nb = math.sqrt(dot(b, b))
      if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
    }
    var remaining = cands.sortBy(_._1)
    var selected = Vector.empty[(Long, Double, Seq[Double])]
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Double, Double)]()
    for (pos <- 1 to math.min(k, cands.size)) {
      val scoredCands = remaining.map { c =>
        val marg = if (pos == 1) c._2
        else lambda * c._2 - mu * selected.map(s => cos(c._3, s._3)).max
        (c, marg)
      }
      val (best, marg) = scoredCands.sortBy { case (c, m) => (-m, c._1) }.head
      out += ((pos, best._1, best._2, marg))
      selected :+= best
      remaining = remaining.filterNot(_._1 == best._1)
    }
    out.toSeq
  }

  test("MmrSelect: matches the brute-force greedy reference on random candidates") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 5) {
      val n = 8 + rnd.nextInt(12)
      val cands = (0 until n).map { i =>
        (i.toLong, rnd.nextDouble(),
          Seq.fill(6)(rnd.nextDouble() * 2 - 1))
      }
      val df = Seq(Tuple1(cands.map { case (id, rel, v) => (id, rel, v) }))
        .toDF("cs")
      val got = df.select(explode(graft.expressions.MmrSelect(
          $"cs".cast("array<struct<id:bigint,rel:double,vec:array<double>>>"),
          k = 5, lambda = 0.7, mu = 0.3)).as("e"))
        .select($"e.pos", $"e.doc_id", $"e.rel", $"e.marginal")
        .as[(Int, Long, Double, Double)].collect().toSeq.sortBy(_._1)
      assert(got == refMmr(cands, 5, 0.7, 0.3), s"trial=$trial")
    }
  }

  test("MmrSelect: near-duplicate of the top hit is deferred; pure top-k would keep it") {
    // c0 best, c1 = c0 slightly perturbed (near-dup, rel just below), c2
    // orthogonal with lower rel: relevance order is (0, 1, 2) but MMR
    // picks the diverse c2 at position 2.
    val cands = Seq(
      (0L, 0.99, Seq(1.0, 0.0, 0.0)),
      (1L, 0.98, Seq(0.999, 0.04, 0.0)),
      (2L, 0.60, Seq(0.0, 1.0, 0.0)))
    val df = Seq(Tuple1(cands)).toDF("cs")
    val picks = df.select(explode(graft.expressions.MmrSelect(
        $"cs".cast("array<struct<id:bigint,rel:double,vec:array<double>>>"),
        k = 3, lambda = 0.7, mu = 0.3)).as("e"))
      .select($"e.pos", $"e.doc_id").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(picks.map(_._2) == Seq(0L, 2L, 1L))
  }

  test("MmrSelect: float vectors accepted; k beyond candidate count selects all") {
    val df = Seq(Tuple1(Seq((5L, 0.4, Seq(1.0f, 0.0f)), (9L, 0.9, Seq(0.0f, 1.0f)))))
      .toDF("cs")
    val got = df.select(explode(graft.expressions.MmrSelect(
        $"cs".cast("array<struct<id:bigint,rel:double,vec:array<float>>>"),
        k = 10, lambda = 0.7, mu = 0.3)).as("e"))
      .select($"e.pos", $"e.doc_id").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, 9L), (2, 5L)))
  }
}
