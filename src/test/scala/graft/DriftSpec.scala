package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DriftQueries

/** Drift-statistic laws on constructed inputs (the oracle corpus never
  * produces the boundary values — identical halves, disjoint supports).
  */
class DriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("TV = 0 for identical week distributions, 1 for disjoint supports") {
    // weeks of Jan 1 and Jan 8: same counts per type → tv 0
    val same = Seq(
      (1L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(8), "click"), (4L, ts(9), "view"))
      .toDF("event_id", "ts", "event_type")
    // (the trailing week one past the end of data always reports tv = 1.0
    // — "everything vanished" — by the vanished-week rule; see the next
    // test)
    val tv0 = DriftQueries.tvWeekly(same)
      .orderBy($"week").select($"tv").as[Double].collect()
    assert(tv0.toSeq == Seq(0.0, 1.0))

    // disjoint type sets across the week boundary → tv 1
    val disjoint = Seq(
      (1L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(8), "purchase"), (4L, ts(9), "signup"))
      .toDF("event_id", "ts", "event_type")
    val tv1 = DriftQueries.tvWeekly(disjoint)
      .orderBy($"week").select($"tv").as[Double].collect()
    assert(tv1.toSeq == Seq(1.0, 1.0))
  }

  test("TV reports 1.0 for a week that vanishes entirely (zero current events)") {
    // week of Jan 1 has events; week of Jan 8 has NONE; week of Jan 15
    // resumes. Two rows must come out, both tv = 1.0 with n_cur = 0:
    //  - Jan 8 vs Jan 1 — the feed vanished (the old inner joins silently
    //    dropped exactly this, the most extreme drift);
    //  - Jan 22 vs Jan 15 — the trailing week one past the end of data is
    //    likewise "everything vanished", by the same rule.
    // Jan 15 itself does NOT appear: its predecessor Jan 8 is empty, so
    // there is no prior distribution to drift from (same reason the first
    // week of data never appears).
    val ev = Seq(
      (1L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(15), "click"))
      .toDF("event_id", "ts", "event_type")
    val rows = DriftQueries.tvWeekly(ev)
      .select($"week", $"n_prev", $"n_cur", $"tv")
      .as[(Timestamp, Long, Long, Double)].collect().sortBy(_._1.getTime)
    assert(rows.length == 2, rows.mkString(","))
    val (wk8, nPrev8, nCur8, tv8) = rows(0)
    assert(wk8 == Timestamp.valueOf("2024-01-08 00:00:00"))
    assert(nPrev8 == 2L && nCur8 == 0L && tv8 == 1.0)
    val (wk22, nPrev22, nCur22, tv22) = rows(1)
    assert(wk22 == Timestamp.valueOf("2024-01-22 00:00:00"))
    assert(nPrev22 == 1L && nCur22 == 0L && tv22 == 1.0)
  }

  test("TV is within [0,1] and weeks without a predecessor are dropped") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val rows = DriftQueries.tvWeekly(ev)
      .select($"week", $"tv").as[(Timestamp, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, tv) => tv >= 0.0 && tv <= 1.0 })
    // the first calendar week has no previous week → must not appear
    val firstWeek = rows.map(_._1).min
    val allWeeks = ev.select(date_trunc("week", $"ts").cast("timestamp"))
      .distinct().as[Timestamp].collect()
    assert(firstWeek.after(allWeeks.min))
  }

  test("KS = 0 when even and odd halves share the value distribution exactly") {
    // value i/2 appears once with an even id and once with an odd id
    val ev = (0L until 100L).map(i => (i, ts(1, 0), (i / 2).toDouble))
      .toDF("event_id", "ts", "value")
    val (na, nb, num, ks) = DriftQueries.ksValue(ev)
      .as[(Long, Long, Long, Double)].first()
    assert(na == 50L && nb == 50L && num == 0L && ks == 0.0)
  }

  test("KS = 1 for disjoint value ranges; real data stays in [0,1]") {
    val ev = (0L until 100L)
      .map(i => (i, ts(1), if (i % 2 == 0) i.toDouble else 1000.0 + i))
      .toDF("event_id", "ts", "value")
    val ks = DriftQueries.ksValue(ev).select($"ks").as[Double].first()
    assert(ks == 1.0)
    val real = DriftQueries.ksValue(
      Tables.load(spark, "/root/testdata/sf0.001", "events"))
      .select($"ks").as[Double].first()
    assert(real >= 0.0 && real <= 1.0)
  }

  test("decile bounds: identical halves gap 0, a shifted half shows the shift in every decile") {
    val same = (0L until 200L).map(i => (i, ts(1), (i / 2).toDouble))
      .toDF("event_id", "ts", "value")
    val gaps0 = DriftQueries.decileBounds(same)
      .select($"gap").as[Long].collect().toSeq
    assert(gaps0 == Seq.fill(9)(0L))

    // odd half shifted by +3.0 → every decile bound_b = bound_a + 300 bins
    val shifted = (0L until 200L)
      .map(i => (i, ts(1), (i / 2).toDouble + (if (i % 2 == 1) 3.0 else 0.0)))
      .toDF("event_id", "ts", "value")
    val rows = DriftQueries.decileBounds(shifted)
      .select($"decile", $"bound_a", $"bound_b", $"gap")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == (1L to 9L))
    assert(rows.forall(_._4 == 300L), rows.toString)
    // bounds monotone in decile
    assert(rows.map(_._2) == rows.map(_._2).sorted)
  }

  test("Gini: 0 for equal values, (n-1)/n for total concentration, known 2-value case") {
    import graft.queries.ProfilingQueries.giniLong
    val equal = Seq.fill(50)(7L).toDF("v")
    assert(giniLong(equal).select($"gini").as[Double].first() == 0.0)

    // one holder of all mass among n=10: G = (n-1)/n = 0.9 — asserted via
    // the same W/(nT) − (n+1)/n op sequence (2.0 − 1.1 in IEEE)
    val conc = (Seq.fill(9)(0L) :+ 1000L).toDF("v")
    assert(giniLong(conc).select($"gini").as[Double].first() == 2.0 - 1.1)

    // {1,3}: sorted ranks → G = (2·(1·1+2·3)/(2·4)) − 3/2 = 14/8 − 12/8 = 0.25
    val two = Seq(1L, 3L).toDF("v")
    assert(giniLong(two).select($"gini").as[Double].first() == 0.25)
  }

  test("Lorenz deciles: shares monotone, below the diagonal, consistent with Gini's data") {
    val rows = SparkEntry.queries("stats_lorenz_doclen")(spark, "/root/testdata/sf0.001")
      .select($"decile", $"share").as[(Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 9L))
    val shares = rows.map(_._2)
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b }, shares.mkString(","))
    // bottom d·10% of docs (by length) holds AT MOST d·10% of tokens
    rows.foreach { case (d, s) => assert(s <= d / 10.0 + 1e-12, s"d=$d s=$s") }
    assert(shares.head > 0.0 && shares.last < 1.0)
  }

  test("canonicalHash: whitespace/case/NFC variants collapse to one cluster, cross-engine-pinned") {
    import graft.queries.DedupVectorQueries.canonicalHash
    // the fixture corpus has no reformatted copies, so the oracle gate
    // exercises this vacuously — these constructed variants are the test
    val variants = Seq(
      "Hello  Wórld\tx",        // double space + tab, precomposed ó
      "hello wórld x",          // already canonical
      "HELLO WÓRLD X",         // decomposed o + combining acute
      "hello\nwórld  x")        // newline + trailing double space
    val hashes = variants.toDF("text")
      .select(canonicalHash($"text").as("h")).as[String].collect().toSet
    assert(hashes.size == 1, hashes.toString)
    // pinned against DuckDB's md5(regexp_replace(lower(nfc_normalize(..)))
    // on the same variants (computed once, offline)
    assert(hashes.head == "c2718f18059d8bd9bb973063b56e11f1")
    // and a genuinely different text does NOT collapse
    val other = Seq("hello world x").toDF("text")
      .select(canonicalHash($"text")).as[String].first()
    assert(other != hashes.head)
  }

  test("leadingDigit: single digit across all 19 decades of a long") {
    // one value per decade, with a non-trivial lead (7×10^p), plus edges
    val cases = (0 to 18).map(p =>
      if (p == 18) 7000000000000000000L else 7L * math.pow(10, p).toLong) ++
      Seq(1L, 9L, 10L, 99L, Long.MaxValue)
    val got = cases.toDF("__m")
      .select($"__m", DriftQueries.leadingDigit("__m").as("d"))
      .as[(Long, Long)].collect().toMap
    cases.foreach { m =>
      val expected = m.toString.head.toString.toLong
      assert(got(m) == expected, s"m=$m got=${got(m)}")
    }
  }

  test("dup-rate report reconciles with exact dedup; stickiness bounded") {
    val dir = "/root/testdata/sf0.001"
    val rates = SparkEntry.queries("dedup_rate_by_source")(spark, dir)
      .select($"n_docs", $"dup_docs", $"dup_doc_rate", $"dup_token_rate")
      .as[(Long, Long, Double, Double)].collect()
    assert(rates.forall { case (n, d, rd, rt) =>
      d <= n && rd >= 0.0 && rd <= 1.0 && rt >= 0.0 && rt <= 1.0 })
    // Σ dup_docs over sources == total docs − distinct content hashes
    val docs = Tables.load(spark, dir, "documents")
    val expectDups = docs.count() -
      docs.select(org.apache.spark.sql.functions.md5($"text")).distinct().count()
    assert(rates.map(_._2).sum == expectDups)

    val st = SparkEntry.queries("stickiness_dau_wau")(spark, dir)
      .select($"stickiness").as[Double].collect()
    assert(st.nonEmpty && st.forall(s => s > 0.0 && s <= 1.0), st.mkString(","))
  }

  private def date_trunc(unit: String, c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.date_trunc(unit, c)
}
