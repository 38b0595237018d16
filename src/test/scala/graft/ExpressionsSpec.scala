package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SimFns, VecFns}

/** The custom codegen expressions must be BIT-IDENTICAL to their
  * built-ins-only (HOF) reference formulations — that equivalence is what
  * lets the DuckDB oracle stay exact. Checked on seeded random inputs.
  */
class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randText(maxLen: Int): String = {
    val alphabet = "abcde ñ 😀"
    (0 until rnd.nextInt(maxLen)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }

  test("CharNgrams ≡ HOF formulation (incl. unicode, short, empty)") {
    for (n <- 1 to 7) {
      val texts = Seq.fill(40)(randText(50)) :+ "" :+ "ñ" :+ "ab"
      val got = texts.toDF("s").select(
        SimFns.charNgrams($"s", lit(n)).as("fast"),
        SimFns.charNgramsHof($"s", lit(n)).as("ref")).collect()
      got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n"))
    }
  }

  test("CharNgrams.sorted ≡ array_sort(CharNgrams) (unicode included)") {
    for (n <- 1 to 5) {
      val texts = Seq.fill(40)(randText(60)) :+ "" :+ "ñab😀cñ"
      val got = texts.toDF("s").select(
        graft.expressions.CharNgrams.sorted($"s", lit(n)).as("fast"),
        array_sort(SimFns.charNgrams($"s", lit(n))).as("ref")).collect()
      got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n"))
    }
  }

  test("SortJoinLastField ≡ array_sort+transform+array_join (convo agg)") {
    val rows = (1 to 200).map { i =>
      (rnd.nextInt(10).toLong,                        // group
       new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
       i.toLong,                                      // unique tiebreak
       randText(20))                                  // rendered payload
    }
    val df = rows.toDF("g", "ts", "id", "r")
    val fast = graft.operators.Convo.sortedStringAgg(
      df, "g", Seq($"ts", $"id"), $"r", "\n\n")
    val ref = graft.operators.Convo.sortedStringAggHof(
      df, "g", Seq($"ts", $"id"), $"r", "\n\n")
    val f = fast.orderBy("g").as[(Long, String)].collect().toSeq
    val h = ref.orderBy("g").as[(Long, String)].collect().toSeq
    assert(f == h)
  }

  test("CharNgrams dynamic n per row ≡ HOF") {
    val texts = Seq.fill(30)(randText(120))
    val got = texts.toDF("s").select(
      SimFns.charNgrams($"s", SimFns.refNgramSize($"s")).as("fast"),
      SimFns.charNgramsHof($"s", SimFns.refNgramSize($"s")).as("ref")).collect()
    got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("WordShingles ≡ HOF formulation") {
    for (w <- 1 to 4) {
      val rows = Seq.fill(40)(Seq.fill(rnd.nextInt(10))(
        Seq("aa", "bb", "cc", "dd")(rnd.nextInt(4))))
      val got = rows.toDF("toks").select(
        SimFns.wordShingles($"toks", w).as("fast"),
        SimFns.wordShinglesHof($"toks", w).as("ref")).collect()
      got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"w=$w"))
    }
  }

  test("DotProduct ≡ HOF fold, bit-for-bit, float arrays") {
    val pairs = Seq.fill(50)((
      Seq.fill(16)(rnd.nextFloat() * 10 - 5),
      Seq.fill(16)(rnd.nextFloat() * 10 - 5)))
    val got = pairs.toDF("a", "b").select(
      VecFns.dot($"a", $"b").as("fast"),
      VecFns.dotHof($"a", $"b").as("ref")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("DotProduct with double-array side (hyperplanes)") {
    val v = Seq(Seq(1.0f, 2.0f, 3.0f)).toDF("a")
      .withColumn("p", array(lit(0.5), lit(-1.0), lit(2.0)))
    val got = v.select(VecFns.dot($"a", $"p")).as[Double].head()
    assert(got == 1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0)
  }

  test("IntersectCount ≡ size(array_intersect) on distinct arrays") {
    val alphabet = Seq("p", "q", "r", "s", "t", "u")
    val pairs = Seq.fill(60)((
      rnd.shuffle(alphabet).take(rnd.nextInt(7)),
      rnd.shuffle(alphabet).take(rnd.nextInt(7))))
    val got = pairs.toDF("a", "b").select(
      graft.expressions.IntersectCount($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("JaccardGeq ≡ (jaccard >= t) on sorted arrays, incl. boundary") {
    val alphabet = Seq("p", "q", "r", "s", "t", "u", "v", "w")
    for (t <- Seq(0.1, 0.3, 0.5, 1.0 / 3.0, 1.0)) {
      val pairs = Seq.fill(80)((
        rnd.shuffle(alphabet).take(rnd.nextInt(9)).sorted,
        rnd.shuffle(alphabet).take(rnd.nextInt(9)).sorted))
      val got = pairs.toDF("a", "b").select(
        graft.expressions.JaccardGeq($"a", $"b", t).as("fast"),
        (SimFns.jaccard($"a", $"b") >= t).as("ref")).collect()
      got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), s"t=$t"))
    }
  }

  test("JaccardGeq exact boundary: J == t decides >= as true") {
    // |∩|=1, |∪|=3 → J = 1/3 exactly; t = 1/3 must be true on both forms
    val df = Seq((Seq("a", "b"), Seq("b", "c"))).toDF("a", "b")
    assert(df.select(graft.expressions.JaccardGeq($"a", $"b", 1.0 / 3.0))
      .as[Boolean].head())
  }

  test("RollingFingerprint ≡ transform+aggregate HOF, incl. unicode and empties") {
    val docs = Seq(
      "the quick brown fox", "", "a", "über café naïve 日本語 text",
      "x " * 50, "MiXeD CaSe And 123 numbers!") ++
      Seq.fill(40)(rnd.shuffle(Seq("alpha", "beta", "γάμμα", "", "delta-7", "é"))
        .take(rnd.nextInt(6)).mkString(" "))
    val df = docs.toDF("text")
      .select(graft.functions.TextAnalysisFns.tokens($"text").as("toks"))
    val got = df.select(
      graft.functions.HashFns.rollingFingerprint($"toks").as("fast"),
      graft.functions.HashFns.rollingFingerprintHof($"toks").as("ref")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("cosine guards: zero vector → 0.0") {
    val df = Seq((Seq(0f, 0f), Seq(1f, 2f))).toDF("a", "b")
    assert(df.select(VecFns.cosine($"a", $"b")).as[Double].head() == 0.0)
  }
}
