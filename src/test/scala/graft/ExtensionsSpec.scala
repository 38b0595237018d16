package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val dir = "/root/testdata/sf0.001"

  test("graft_top_k is callable as a SQL aggregate and matches the window form") {
    import spark.implicits._
    Seq((1L, 5.0, 10L), (1L, 7.0, 11L), (1L, 7.0, 9L), (2L, 1.0, 20L))
      .toDF("g", "score", "id").createOrReplaceTempView("graft_tk_v")
    val rows = spark.sql("""
      SELECT g, e.id AS id
      FROM (SELECT g, graft_top_k(struct(score, id), 2) AS top
            FROM graft_tk_v GROUP BY g)
      LATERAL VIEW explode(top) AS e
      ORDER BY g, e.score DESC, e.id""").as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 9L), (1L, 11L), (2L, 20L))) // tie at 7.0 → lower id first
    // non-literal k is rejected with a clear error
    val err = intercept[Exception] {
      spark.sql("SELECT graft_top_k(struct(score, id), CAST(id AS INT)) FROM graft_tk_v GROUP BY g").collect()
    }
    assert(err.getMessage.contains("int literal"))
  }

  test("rolling fingerprint, sort-join, max-lev-ratio callable by SQL name") {
    import spark.implicits._
    Seq(("b a c", "Quezon")).toDF("s", "loc").createOrReplaceTempView("sqlfn_v")
    val structArr =
      "array(struct(2, 'b'), struct(1, 'a'), struct(3, 'c'))"
    val row = spark.sql(s"""
      SELECT graft_rolling_fingerprint(split(s, ' ')) AS fp,
             graft_sort_join_last($structArr, '-') AS sj,
             graft_max_lev_ratio(loc, array('quezon city', 'manila')) AS ratio
      FROM sqlfn_v""").head()
    // same values as the Column API forms
    val exp = Seq(("b a c", "Quezon")).toDF("s", "loc").select(
      graft.expressions.RollingFingerprint(split($"s", " ")),
      graft.expressions.SortJoinLastField(
        org.apache.spark.sql.functions.expr(structArr),
        org.apache.spark.sql.functions.lit("-")),
      graft.expressions.MaxLevRatio($"loc", Seq("quezon city", "manila"))).head()
    assert(row == exp && row.getString(1) == "a-b-c")
    // guarded inputs raise the intended error, not a raw NPE/CCE
    for (bad <- Seq("CAST(NULL AS ARRAY<STRING>)", "array('a', NULL)", "array(1, 2)")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_max_lev_ratio(loc, $bad) FROM sqlfn_v").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("graft_max_lev_ratio")), s"$bad: $e")
    }
  }

  test("nanos rule: raw-long fixture pushes rewritten ns bounds to the scan") {
    // The shared testdata's physical type has flipped between TIMESTAMP
    // (NANOS) and TIMESTAMP(MICROS) across generations; this fixture pins
    // the rule's coverage independently of it. Spark cannot WRITE parquet
    // nanos, but the legacy-flag read path surfaces nanos as a plain long
    // — so a long column + the loader's exact conversion expression is the
    // same logical shape the rule rewrites.
    import spark.implicits._
    val fx = java.nio.file.Files.createTempDirectory("graft_ns_fx").toString
    val base = java.sql.Timestamp.valueOf("2024-01-10 00:00:00").getTime * 1000000L
    (0L until 100L).map(i => (i, base + i * 3600L * 1000000000L))
      .toDF("event_id", "ts").write.mode("overwrite").parquet(fx)
    val ev = spark.read.parquet(fx)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val lo = lit("2024-01-11 00:00:00").cast("timestamp")
    val hi = lit("2024-01-12 00:00:00").cast("timestamp")
    val df = ev.where(col("ts") >= lo && col("ts") < hi).select("event_id")
    val plan = df.queryExecution.executedPlan.toString
    // rewritten to raw-ns long bounds, visible as plain pushed long filters
    assert(plan.contains("GreaterThanOrEqual(ts,") && plan.contains("LessThan(ts,"),
      s"expected pushed raw-ns filters, plan:\n$plan")
    assert(df.count() == 24) // hours 24..47 from base
  }

  test("nanos predicate rule: ts range filter pushes to the parquet scan") {
    val df = Tables.load(spark, dir, "events")
      .where(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
             col("ts") <  lit("2024-01-17 00:00:00").cast("timestamp"))
      .select(col("event_id"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(ts,") && scan.contains("LessThan(ts,"),
      s"expected pushed raw-ns filters, plan:\n$scan")
  }

  test("nanos predicate rule: rewritten filter returns identical rows") {
    val base = Tables.load(spark, dir, "events")
    // compare against a filter shape the rule does NOT touch
    val expected = base
      .where(unix_micros(col("ts")).between(
        java.sql.Timestamp.valueOf("2024-01-10 00:00:00").getTime * 1000,
        java.sql.Timestamp.valueOf("2024-01-17 00:00:00").getTime * 1000 - 1))
      .select("event_id").orderBy("event_id").collect().map(_.getLong(0)).toSeq
    val got = base
      .where(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
             col("ts") <  lit("2024-01-17 00:00:00").cast("timestamp"))
      .select("event_id").orderBy("event_id").collect().map(_.getLong(0)).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("nanos predicate rule: boundary semantics (<=, >, =) stay exact") {
    val base = Tables.load(spark, dir, "events").limit(50).cache()
    val anyTs = base.select(col("ts")).collect().head.getTimestamp(0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id").collect().map(_.getLong(0)).toSet
    // equality must match exactly one known row's truncated-µs timestamp
    val eq = ids(base.where(col("ts") === lit(anyTs)))
    assert(eq.nonEmpty)
    val le = ids(base.where(col("ts") <= lit(anyTs)))
    val gt = ids(base.where(col("ts") > lit(anyTs)))
    assert((le & gt).isEmpty && (le | gt) == ids(base))
    base.unpersist()
  }

  test("i18n normalizers callable by SQL name, identical to the Column API") {
    import spark.implicits._
    val dec = "Jose\u0301"   // decomposed e + combining acute
    val comp = "Jos\u00e9"   // precomposed
    Seq(Tuple1(dec)).toDF("s").createOrReplaceTempView("i18n_v")
    val row = spark.sql("""
      SELECT graft_nfc(s) AS n, graft_strip_accents(s) AS t FROM i18n_v""")
      .head()
    assert(row.getString(0) == comp, "NFC did not compose")
    assert(row.getString(1) == "Jose", "accents not stripped")
    val exp = Seq(Tuple1(dec)).toDF("s").select(
      graft.expressions.NfcNormalize($"s"),
      graft.expressions.StripAccents($"s")).head()
    assert(row.getString(0) == exp.getString(0) &&
      row.getString(1) == exp.getString(1))
  }
}
