package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.queries.TrainingWave2Queries

/** Property-based invariants over the fold/graph/sketch primitives —
  * randomized inputs catch shapes example specs miss. Deterministic:
  * every draw comes from a FIXED seed sequence (seeds 0..n-1), so a
  * failure always reproduces. Each property is a law the operator must
  * hold for EVERY input, not a pinned example.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** n deterministic draws from a generator (seeds 0..). */
  private def samples[A](g: Gen[A], n: Int = 40): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, Seed(i.toLong)))
  }

  private val symGen: Gen[List[String]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab")))
  private val pairGen: Gen[(String, String)] =
    Gen.zip(Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c"))

  test("applyMerge law: content preserved; symbol count drops by greedy merge count") {
    // batch all cases through ONE DataFrame pass
    val cases = samples(Gen.zip(symGen, pairGen), 120).map {
      case (syms, (p1, p2)) => (syms.mkString(" "), p1, p2, syms)
    }
    cases.groupBy { case (_, p1, p2, _) => (p1, p2) }.foreach {
      case ((p1, p2), group) =>
        val merged = group.map(_._1).toDF("sym")
          .select(col("sym"),
            TrainingWave2Queries.applyMerge(col("sym"), p1, p2).as("m"))
          .as[(String, String)].collect().toMap
        group.foreach { case (sym, _, _, syms) =>
          val m = merged(sym)
          assert(m.replace(" ", "") == sym.replace(" ", ""),
            s"content changed: '$sym' -> '$m' under ($p1,$p2)")
          val expected = {
            var c = 0; var i = 0
            while (i < syms.length - 1) {
              if (syms(i) == p1 && syms(i + 1) == p2) { c += 1; i += 2 }
              else i += 1
            }
            c
          }
          assert(syms.length - m.split(" ").length == expected,
            s"'$sym' under ($p1,$p2): drop ${syms.length - m.split(" ").length}, expected $expected")
        }
    }
  }

  test("ewmaFold law: result lies within [min, max] of the inputs") {
    val valsGen = Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1000.0, 1000.0)))
    val cases = samples(valsGen, 60).filter(_.nonEmpty)
    val got = cases.map(Tuple1(_)).toDF("v")
      .select(col("v"), TrainingWave2Queries.ewmaFold(col("v"), 0.5).as("e"))
      .as[(Seq[Double], Double)].collect()
    got.foreach { case (vals, e) =>
      assert(e >= vals.min - 1e-9 && e <= vals.max + 1e-9,
        s"EWMA $e outside [${vals.min}, ${vals.max}]")
    }
  }

  test("triangleCoeff law: oriented count == naive count on random graphs") {
    val edgeGen = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(1L, 7L), Gen.choose(1L, 7L))))
    samples(edgeGen, 12).foreach { raw =>
      val edges = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b))
      }.distinct
      if (edges.nonEmpty) {
        val e = edges.toDF("u", "v")
        val (tri, wedges, _) = TrainingWave2Queries.triangleCoeff(e)
          .as[(Long, Long, Double)].first()
        val naive = e.as("e1")
          .join(e.as("e2"), col("e2.u") === col("e1.v"))
          .join(e.as("e3"), col("e3.u") === col("e1.u") &&
            col("e3.v") === col("e2.v"))
          .count()
        assert(tri == naive, s"oriented $tri != naive $naive on $edges")
        // every triangle closes exactly 3 of the Σ d(d−1)/2 wedges
        assert(wedges >= 3 * tri, s"wedges $wedges < 3·$tri on $edges")
      }
    }
  }

  test("BPE laws on random text: count ≡ tokens ≡ ids; lossless; fold ≡ min-rank") {
    import graft.expressions.BpeOps
    val tok = BpeOps.default
    val textGen: Gen[String] = Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '), 1 -> Gen.numChar,
        1 -> Gen.oneOf('!', '.', '\'', 'é', '中'))).map(_.mkString))
    samples(textGen, 120).foreach { text =>
      val toks = {
        val m = BpeOps.Gpt2Pattern.matcher(text)
        val b = Vector.newBuilder[String]
        while (m.find()) b ++= tok.encodePretoken(m.group())
        b.result()
      }
      val ids = tok.encodeIds(text)
      // the three surfaces agree
      assert(tok.countTokens(text) == toks.size.toLong, s"count/tokens: '$text'")
      assert(ids.length == toks.size, s"ids/tokens: '$text'")
      // encoding is a lossless partition of the mapped byte stream
      assert(toks.mkString == BpeOps.mapBytes(text), s"round-trip: '$text'")
      // ids map tokens through the vocab
      assert(ids.toSeq == toks.map(t => tok.tokenToId.get(t).intValue()),
        s"vocab map: '$text'")
      // the oracle's rank-order fold agrees with the min-rank loop
      val m2 = BpeOps.Gpt2Pattern.matcher(text)
      while (m2.find()) {
        val mapped = BpeOps.mapBytes(m2.group())
        assert(tok.applyMergesInOrder(mapped) == tok.encodeMapped(mapped),
          s"fold/min-rank: '${m2.group()}'")
      }
    }
  }

  test("quantizeInt8 law: codes bounded by 127; zero scale only for zero vectors") {
    val vecGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100.0f, 100.0f)))
    val cases = samples(vecGen, 60).filter(_.nonEmpty).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val got = graft.queries.EvalStatsQueries.quantizeInt8(
        cases.toDF("id", "v"), "id", "v")
      .as[(Long, Double, Long, Long, Double)].collect()
    val byId = cases.toMap
    got.foreach { case (id, scale, _, mx, mse) =>
      assert(mx <= 127L, s"vec $id code $mx > 127")
      assert(mse >= 0.0)
      if (byId(id).exists(_ != 0.0f)) assert(scale > 0.0)
      else assert(scale == 0.0)
    }
  }

  test("gini law: count-grid form ≡ mean-absolute-difference form on random lists") {
    // G = Σᵢⱼ|xᵢ−xⱼ| / (2n²μ) = Σᵢⱼ|xᵢ−xⱼ| / (2nT) — the textbook MAD
    // identity, computed independently of the rank-based grid form
    val listGen = Gen.choose(2, 30)
      .flatMap(n => Gen.listOfN(n, Gen.choose(0L, 50L)))
      .suchThat(_.sum > 0)
    samples(listGen, 25).zipWithIndex.foreach { case (xs, i) =>
      val got = graft.queries.ProfilingQueries
        .giniLong(xs.toDF("v")).select($"gini").as[Double].first()
      val n = xs.length
      val t = xs.sum
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      val ref = mad.toDouble / (2.0 * n * t)
      assert(math.abs(got - ref) < 1e-12, s"case $i: $got vs $ref on $xs")
      assert(got >= -1e-12 && got <= (n - 1).toDouble / n + 1e-12)
    }
  }

  test("priority-sample law: agg top-k ≡ window top-k over q = w/u on random weights") {
    val rowsGen = Gen.choose(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("g1", "g2", "g3"), Gen.choose(0L, 100L))))
    val all = samples(rowsGen, 12).zipWithIndex.flatMap { case (rows, i) =>
      rows.zipWithIndex.map { case ((g, w), j) =>
        (s"case$i#$g", i.toLong * 1000 + j, w) }
    }.toDF("grp", "id", "w")
    val k = 4
    val got = graft.operators.Sampling
      .priorityPerGroup(all, "grp", "id", $"w", k, "pp")
      .select($"grp", $"id").as[(String, Long)].collect().toSet
    val h48 = conv(substring(md5(concat(lit("pp:"), $"id".cast("string"))), 1, 12), 16, 10)
      .cast("bigint")
    val q = $"w".cast("double") /
      (($"h48" + lit(1L)).cast("double") / lit(281474976710656.0))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"q".desc, $"id")
    val ref = all.withColumn("h48", h48).withColumn("q", q)
      .withColumn("rn", row_number().over(win))
      .where($"rn" <= k).select($"grp", $"id").as[(String, Long)].collect().toSet
    assert(got == ref)
  }
}
