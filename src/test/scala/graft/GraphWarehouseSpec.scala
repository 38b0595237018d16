package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Cdc, PageRank, Scd2}

class GraphWarehouseSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- SCD2 ----------------------------------------------------------

  private def log = Seq(
    (1L, ts("2024-01-01 00:00:00"), "a"),
    (1L, ts("2024-01-05 00:00:00"), "b"),
    (1L, ts("2024-01-25 00:00:00"), "c"), // after cutoff: closes the open b
    (2L, ts("2024-01-03 00:00:00"), "x"), // untouched by the delta
    (3L, ts("2024-01-22 00:00:00"), "n"), // new key, delta only
    (3L, ts("2024-01-28 00:00:00"), "m")).toDF("k", "ts", "state")

  test("scd2: incremental apply ≡ one-shot build, at any cutoff") {
    val oneShot = Scd2.fromLog(log, "k", "ts", Seq("state"))
      .orderBy("k", "valid_from").collect().toSeq
    for (cut <- Seq("2024-01-02", "2024-01-10", "2024-01-26")) {
      val c = lit(cut).cast("timestamp")
      val inc = Scd2.applyChanges(
          Scd2.fromLog(log.where(col("ts") <= c), "k", "ts", Seq("state")),
          log.where(col("ts") > c), "k", "ts", Seq("state"))
        .orderBy("k", "valid_from").collect().toSeq
      assert(inc == oneShot, s"cutoff $cut diverged")
    }
  }

  test("scd2: delta closes the open row; untouched keys keep their rows") {
    val c = lit("2024-01-10").cast("timestamp")
    val applied = Scd2.applyChanges(
      Scd2.fromLog(log.where(col("ts") <= c), "k", "ts", Seq("state")),
      log.where(col("ts") > c), "k", "ts", Seq("state"))
    val k1 = applied.where(col("k") === 1).orderBy("valid_from")
      .select("state", "is_current").as[(String, Boolean)].collect().toSeq
    assert(k1 == Seq(("a", false), ("b", false), ("c", true)))
    val k2 = applied.where(col("k") === 2)
      .select("state", "is_current").as[(String, Boolean)].collect().toSeq
    assert(k2 == Seq(("x", true))) // no delta → open row untouched
    val k3 = applied.where(col("k") === 3).orderBy("valid_from")
      .select("state", "is_current").as[(String, Boolean)].collect().toSeq
    assert(k3 == Seq(("n", false), ("m", true))) // new key chains delta-only
  }

  test("scd2: apply ≡ one-shot on seeded-random logs and cutoffs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(20)
      // distinct (key, ts): sample ts without replacement per key
      val rows = Seq.tabulate(n) { i =>
        val k = 1L + rnd.nextInt(4)
        val t = ts("2024-01-01 00:00:00").getTime + i * 3600_000L +
          rnd.nextInt(3599) * 1000L
        (k, new Timestamp(t), "s" + rnd.nextInt(3))
      }.distinct
      val df = rows.toDF("k", "ts", "state")
      val cutMs = rows.map(_._2.getTime).sorted.apply(rnd.nextInt(rows.size))
      val c = lit(new Timestamp(cutMs))
      val oneShot = Scd2.fromLog(df, "k", "ts", Seq("state"))
        .orderBy("k", "valid_from").collect().toSeq
      val inc = Scd2.applyChanges(
          Scd2.fromLog(df.where(col("ts") <= c), "k", "ts", Seq("state")),
          df.where(col("ts") > c), "k", "ts", Seq("state"))
        .orderBy("k", "valid_from").collect().toSeq
      assert(inc == oneShot, s"trial $trial (n=$n, cut=$cutMs) diverged")
    }
  }

  test("scd2: snapshotAt returns exactly the version valid at the cutoff") {
    val iv = Scd2.fromLog(log, "k", "ts", Seq("state"))
    // 2024-01-10: k1 is in state b (from 01-05), k2 in x, k3 not yet born
    val snap = Scd2.snapshotAt(iv, lit("2024-01-10").cast("timestamp"))
      .select("k", "state").as[(Long, String)].collect().toSeq.sorted
    assert(snap == Seq((1L, "b"), (2L, "x")))
    // exactly at a change ts: the new version is already valid
    val atChange = Scd2.snapshotAt(iv, lit("2024-01-05 00:00:00").cast("timestamp"))
      .where(col("k") === 1).select("state").as[String].collect().toSeq
    assert(atChange == Seq("b"))
    // open intervals are current: far-future snapshot = latest state per key
    val now = Scd2.snapshotAt(iv, lit("2030-01-01").cast("timestamp"))
      .select("k", "state").as[(Long, String)].collect().toSeq.sorted
    assert(now == Seq((1L, "c"), (2L, "x"), (3L, "m")))
  }

  // ---- CDC -----------------------------------------------------------

  test("cdc: latest op wins and a winning delete removes the key") {
    val ops = Seq(
      (1L, 1L, "I", "a"), (1L, 3L, "U", "b"),   // key 1 → b
      (2L, 2L, "I", "x"), (2L, 5L, "D", "dead"), // key 2 deleted
      (3L, 4L, "D", "gone"), (3L, 6L, "I", "re") // key 3 re-inserted after D
    ).toDF("k", "seq", "op", "v")
    val out = Cdc.applyLatest(ops, "k", "seq", "op", Seq("v"))
      .select("k", "seq", "op", "v").as[(Long, Long, String, String)]
      .collect().toSeq.sorted
    assert(out == Seq((1L, 3L, "U", "b"), (3L, 6L, "I", "re")))
  }

  test("cdc: aggregation route ≡ window-argmax route on a seeded log") {
    val rnd = new scala.util.Random(7)
    val ops = Seq.tabulate(300) { i =>
      (rnd.nextInt(20).toLong, i.toLong,
        Seq("I", "U", "D")(rnd.nextInt(3)), "v" + rnd.nextInt(5))
    }.toDF("k", "seq", "op", "v")
    val agg = Cdc.applyLatest(ops, "k", "seq", "op", Seq("v"))
      .orderBy("k").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("seq").desc)
    val win = ops.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("op") =!= "D").drop("__rn")
      .select("k", "seq", "op", "v").orderBy("k").collect().toSeq
    assert(agg == win)
  }

  test("cdc: a winning NULL-op row survives (not three-valued out)") {
    val ops = Seq(
      (1L, 1L, Some("I"), "a"), (1L, 2L, None, "b"), // NULL op wins key 1
      (2L, 1L, Some("D"), "x")                        // delete wins key 2
    ).toDF("k", "seq", "op", "v")
    val out = Cdc.applyLatest(ops, "k", "seq", "op", Seq("v"))
      .select("k", "v").as[(Long, String)].collect().toSeq.sorted
    assert(out == Seq((1L, "b"))) // NULL op ≠ delete ⇒ key 1 kept
  }

  test("cdc: reserved working column name is rejected") {
    val bad = Seq((1L, 1L, "I", "a")).toDF("k", "seq", "op", "__last")
    intercept[IllegalArgumentException] {
      Cdc.applyLatest(bad, "k", "seq", "op", Seq("__last"))
    }
  }

  // ---- PageRank ------------------------------------------------------

  test("pagerank: symmetric 2-node graph holds rank exactly at Scale/2") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = PageRank.ranks(edges, "src", "dst", iters = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // N=2: init 5e11 each; each iteration 15%·5e11 + 85%·5e11 = 5e11 —
    // a fixed point, exactly (all divisions land on integers)
    assert(r == Seq((1L, 500000000000L), (2L, 500000000000L)))
  }

  test("pagerank: star center outranks leaves; total mass ≈ Scale") {
    // undirected star: 1 ↔ {2,3,4,5}
    val pairs = (2L to 5L).map(l => (1L, l))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val r = PageRank.ranks(edges, "src", "dst", iters = 5)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val center = r.head._2
    val leaves = r.tail.map(_._2)
    assert(leaves.distinct.size == 1, "leaves must tie exactly")
    assert(center > leaves.head * 2, s"center $center vs leaf ${leaves.head}")
    val mass = r.map(_._2).sum
    // floor divisions shed at most a few units per node per iteration
    assert(mass <= PageRank.Scale && mass > PageRank.Scale - 1000L)
  }

  test("pagerank: 20 iterations keep the plan bounded (lineage severed)") {
    // without per-iteration localCheckpoint the analyzed plan embeds every
    // prior iteration — geometric growth that stalls planning long before
    // real iteration counts. With it, the final plan hangs off one
    // LogicalRDD regardless of depth.
    val pairs = (2L to 6L).map(l => (1L, l))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val r20 = PageRank.ranks(edges, "src", "dst", iters = 20)
    val planLines = r20.queryExecution.analyzed.numberedTreeString.linesIterator.size
    assert(planLines < 50, s"analyzed plan grew with iterations: $planLines lines")
    // deterministic fixed point: symmetric graph ⇒ depth only tightens
    // values; ranks must still be the exact integer result
    val r5 = PageRank.ranks(edges, "src", "dst", iters = 5)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val r20v = r20.orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r20v.map(_._1) == r5.map(_._1))
    assert(r20v.head._2 > r20v.last._2 * 2) // center still dominates
  }
}
