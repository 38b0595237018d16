package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextAnalysisFns
import graft.operators.{Ann, Dedup, Sampling}

/** Round-4 curation wave: semantic (SemDeDup-style) dedup, line-level
  * dedup, temperature sampling, and the mixture/epoch plan.
  */
class CurationWaveSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- pseudo-lines -------------------------------------------------

  test("pseudoLines: fixed-width windows, short tail, empty text") {
    val df = Seq("a b c d e", "x y", "").toDF("text")
      .select(TextAnalysisFns.pseudoLines(col("text"), 2).as("lines"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b", "c d", "e"), Seq("x y"), Seq()))
  }

  // ---- semantic dedup -----------------------------------------------

  test("semantic: within-cell lower-id near-dup marks the higher id only") {
    // two well-separated clusters; ids 1/2/3 near +x, ids 10/11 near +y;
    // 3 is close to 1 and 2, 11 close to 10; 20 is alone near -x
    val emb = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.99, 0.05)), (3L, Seq(0.98, 0.08)),
      (10L, Seq(0.0, 1.0)), (11L, Seq(0.05, 0.99)),
      (20L, Seq(-1.0, 0.02))).toDF("vec_id", "embedding")
    val index = Ann.IvfIndex(Seq(
      0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0), 2 -> Seq(-1.0, 0.0)))
    val got = Dedup.semantic(emb, "vec_id", "embedding", index, threshold = 0.9)
      .orderBy("id").as[(Long, Int, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 0, false), (2L, 0, true), (3L, 0, true),
      (10L, 1, false), (11L, 1, true),
      (20L, 2, false)))
  }

  test("semantic: near-dups in DIFFERENT cells are not compared") {
    // identical vectors assigned to different cells by construction
    // (cell equi-join bounds the quadratic — that is the scale contract)
    val emb = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.6, 0.8))).toDF("vec_id", "embedding")
    val index = Ann.IvfIndex(Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.6, 0.8)))
    val got = Dedup.semantic(emb, "vec_id", "embedding", index, threshold = 0.5)
      .orderBy("id").as[(Long, Int, Boolean)].collect().toSeq
    // cos(v1, v2) = 0.6 ≥ 0.5, but they sit in different cells → both kept
    assert(got == Seq((1L, 0, false), (2L, 1, false)))
  }

  // ---- line dedup ---------------------------------------------------

  test("lineDedup: cross-doc common lines dropped, order preserved") {
    val docs = Seq(
      (1L, "common line one unique alpha beta"),
      (2L, "common line one other gamma delta"),
      (3L, "solo text here repeated twice ok")).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text", lineTokens = 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    // "common line one" appears in docs 1 and 2 → dropped from both;
    // doc 3's lines are unique to it → fully kept, original order
    assert(got == Seq(
      (1L, 2L, 1L, "unique alpha beta"),
      (2L, 2L, 1L, "other gamma delta"),
      (3L, 2L, 2L, "solo text here repeated twice ok")))
  }

  test("lineDedup: within-doc repetition alone is NOT common; all-common doc → empty") {
    val docs = Seq(
      (1L, "dup line x dup line x"),   // same line twice in ONE doc
      (2L, "shared tail z"),
      (3L, "shared tail z")).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text", lineTokens = 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, "dup line x dup line x"), // 1 distinct doc → kept
      (2L, 1L, 0L, ""),                       // cross-doc → dropped, empty
      (3L, 1L, 0L, "")))
  }

  // ---- temperature sampling -----------------------------------------

  test("temperatureSample: deterministic, subset, and p≥1 keeps whole group") {
    val rows = (1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 104).map(i => (i.toLong, "rare"))
    val df = rows.toDF("id", "grp")
    val s1 = Sampling.temperatureSample(df, "id", "grp", "s", num = 1, den = 1)
    val s2 = Sampling.temperatureSample(df, "id", "grp", "s", num = 1, den = 1)
    val ids1 = s1.select("id").as[Long].collect().toSet
    assert(ids1 == s2.select("id").as[Long].collect().toSet) // pure fn of row
    assert(ids1.subsetOf(rows.map(_._1).toSet))
    // rare group: p = N·w/(Σw·n) = 104·2/(12·4) > 1 → all 4 kept
    assert(s1.where(col("grp") === "rare").count() == 4)
    // big group is downsampled: p = 104·10/(12·100) ≈ 0.87 < 1
    assert(s1.where(col("grp") === "big").count() < 100)
    // output columns = input columns (working columns dropped)
    assert(s1.columns.toSeq == df.columns.toSeq)
  }

  test("temperatureSample: ceil-threshold form ≡ the raw product inequality") {
    // the keep decision is u < ⌈num·N·w·2²⁴ / (den·Σw·n)⌉, equivalent for
    // integer u to u·den·Σw·n < num·N·w·2²⁴ — re-derive the raw four-factor
    // product per row (safe at this scale) and check exact agreement,
    // boundary rows included
    val rows = (1 to 500).map(i => (i.toLong, s"g${i % 7}"))
    val df = rows.toDF("id", "grp")
    val kept = Sampling.temperatureSample(df, "id", "grp", "t9", num = 2, den = 5)
      .select("id").as[Long].collect().toSet
    val n = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val w = n.view.mapValues(v => math.floor(math.sqrt(v.toDouble)).toLong).toMap
    val (totw, nn) = (w.values.sum, n.values.sum)
    val expected = rows.filter { case (id, g) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t9:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hash24 = java.lang.Long.parseLong(md5.take(6), 16)
      // BigInt = the overflow-free ground truth of the product form
      BigInt(hash24) * 5 * totw * n(g) < BigInt(2) * nn * w(g) * (1L << 24)
    }.map(_._1).toSet
    assert(kept == expected)
  }

  test("temperatureSample: reserved working column names are rejected") {
    val bad = Seq((1L, "g", 0L)).toDF("id", "grp", "__totw")
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureSample(bad, "id", "grp", "s", 1, 2)
    }
    assert(e.getMessage.contains("reserved"))
  }

  // ---- mixture plan --------------------------------------------------

  test("mixturePlan: exact ceil-division epochs") {
    val df = Seq.tabulate(10)(i =>
      (s"a", 100L)) ++ Seq.tabulate(2)(i => (s"b", 50L))
    val plan = Sampling.mixturePlan(df.toDF("src", "toks"), "src",
        col("toks"), when(col("src") === "a", 1L).otherwise(3L), budget = 10000L)
      .orderBy("src")
      .select("src", "n_docs", "tokens", "weight", "epochs")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // Σw = 4; a: ⌈10000·1/(4·1000)⌉ = ⌈2.5⌉ = 3; b: ⌈10000·3/(4·100)⌉ = 75
    assert(plan == Seq(("a", 10L, 1000L, 1L, 3L), ("b", 2L, 100L, 3L, 75L)))
  }
}
