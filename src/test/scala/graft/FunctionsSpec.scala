package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("F1 reference code: match, no-match, null") {
    val df = Seq(
      ("a", "please see Ref: ABC123 thanks"),
      ("b", "Ref:XYZ"),
      ("c", "no code here"),
      ("d", null)).toDF("id", "message")
    val got = df.select($"id",
      TextFns.extractReferenceCode($"message").as("code"))
      .as[(String, String)].collect().toMap
    assert(got("a") == "ABC123")
    assert(got("b") == "XYZ")
    assert(got("c") == TextFns.NoReferenceCode)
    assert(got("d") == TextFns.NoReferenceCode)
  }

  test("F4 custom_fields: single element kept, others null") {
    val df = Seq(
      (1, Seq("only")), (2, Seq("a", "b")), (3, Seq.empty[String]))
      .toDF("id", "arr")
    val got = df.select($"id", TextFns.singleElementOrNull($"arr").as("v"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(1) == "only"); assert(got(2) == null); assert(got(3) == null)
  }

  test("F5 tags CSV: join, empty, null") {
    val df = Seq(
      (1, Seq("x", "y")), (2, Seq.empty[String])).toDF("id", "tags")
    val got = df.select($"id", TextFns.tagsCsv($"tags").as("t"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(1) == "x,y"); assert(got(2) == "")
  }

  test("F15 name coalesce: name → email → Unknown") {
    val df = Seq(
      ("n", "e"), ("  ", "e"), ("", ""), (null, null))
      .toDF("name", "email")
    val got = df.select(TextFns.nameCoalesce($"name", $"email"))
      .as[String].collect().toSeq
    assert(got == Seq("n", "e", TextFns.UnknownName, TextFns.UnknownName))
  }

  test("F2 timezone: UTC instant → Manila wall clock (+8, no DST)") {
    val df = Seq("2024-03-10 10:00:00").toDF("s")
    val got = df.select(TimeFns.parseToManila($"s").cast("string")).as[String].head()
    assert(got == "2024-03-10 18:00:00")
  }

  test("F2 coerce: unparseable → null") {
    val got = Seq("not a date").toDF("s")
      .select(TimeFns.parseToManila($"s")).collect().head
    assert(got.isNullAt(0))
  }

  test("F6 schedule combine: format table from the reference") {
    val cases = Seq(
      ("2024-01-05", "3PM", "2024-01-05 15:00:00"),
      ("2024-01-05", "10:30AM", "2024-01-05 10:30:00"),
      ("2024-01-05", "12 PM", "2024-01-05 12:00:00"),   // strip spaces
      ("2024-01-05", "12AM", "2024-01-05 00:00:00"),    // midnight rule
      ("2024-01-05", "7:5AM", "2024-01-05 07:05:00"),   // strptime %M takes 1-2 digits
      ("2024-01-05", "1:99PM", "2024-01-05 00:00:00"),  // minute > 59 rejected
      ("2024-01-05", "3pm", "2024-01-05 00:00:00"),     // lowercase: no 'AM'/'PM' gate hit
      ("2024-01-05", "9.45 pm", "2024-01-05 00:00:00"), // period NOT stripped → midnight
      ("2024-01-05", "9.45 PM", "2024-01-05 00:00:00"), // same, uppercase
      ("2024-01-05", "garbage", "2024-01-05 00:00:00"), // unparseable time → midnight
      ("garbage", "3PM", null))                          // unparseable date → null
    val df = cases.map(c => (c._1, c._2)).toDF("d", "t")
    val got = df.select(TimeFns.combineScheduleDateTime($"d", $"t").cast("string"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == cases.map(_._3))
  }

  test("F6 window bounds: floor to hour, 6h span, end inclusive-1s") {
    val df = Seq("2024-01-10 13:47:12").toDF("now")
    val got = df.select(
      TimeFns.windowStart(to_timestamp($"now")).cast("string"),
      TimeFns.windowEnd(to_timestamp($"now")).cast("string")).as[(String, String)].head()
    assert(got == ("2024-01-10 07:00:00", "2024-01-10 12:59:59"))
  }

  test("F9 jaccard: known value and dynamic n rule") {
    // identical strings → 1.0; disjoint → 0.0
    val df = Seq(("abcdefgh", "abcdefgh"), ("abcdefgh", "zzzzzzzz")).toDF("a", "b")
    val got = df.select(SimFns.jaccardNgram($"a", $"b")).as[Double].collect()
    assert(got(0) == 1.0 && got(1) == 0.0)
    // n = max(5, round(sqrt(len/2))): len 8 → max(5, 2) = 5; len 200 → 10
    val ns = Seq("a" * 8, "a" * 200).toDF("s")
      .select(SimFns.refNgramSize($"s")).as[Int].collect()
    assert(ns.toSeq == Seq(5, 10))
  }

  test("F10 lev ratio: identity 100, known distance") {
    val df = Seq(("kitten", "kitten"), ("kitten", "sitting"), ("", "")).toDF("a", "b")
    val got = df.select(SimFns.levRatio($"a", $"b")).as[Double].collect()
    assert(got(0) == 100.0)
    assert(math.abs(got(1) - (1.0 - 3.0 / 7.0) * 100.0) < 1e-12)
    assert(got(2) == 100.0)
  }

  test("text analysis: tokens, langid, fingerprint determinism") {
    val df = Seq("the cat and the dog", "", "el que la de y").toDF("text")
    val toks = df.select(TextAnalysisFns.wordCount($"text")).as[Int].collect()
    assert(toks.toSeq == Seq(5, 0, 5))
    val langs = df.select(TextAnalysisFns.langId($"text")).as[String].collect()
    assert(langs(0) == "en"); assert(langs(1) == "und"); assert(langs(2) == "es")
    val fp1 = df.select(TextAnalysisFns.fingerprint($"text")).as[Long].collect()
    val fp2 = df.select(TextAnalysisFns.fingerprint($"text")).as[Long].collect()
    assert(fp1.toSeq == fp2.toSeq)
  }
}
