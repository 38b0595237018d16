package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FrontStore

/** FrontStore laws (round-14 ask #3's "done" criteria): a NEW SESSION
  * hits the persisted front with ZERO recompute jobs (listener-counted —
  * the get is a lazy parquet read over the Warehouse snapshot); a
  * changed corpus directory invalidates the fingerprint and rebuilds;
  * rows stay identical to the from-scratch build either way; and with
  * no store configured every call falls back to the in-memory
  * FrontCache unchanged.
  */
class FrontStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def tmp(tag: String): String =
    Files.createTempDirectory(tag).toString

  private def newStoreSession(store: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set(FrontStore.PathConf, store)
    s
  }

  test("a new session reuses the persisted front with zero build jobs; a changed corpus rebuilds") {
    val store = tmp("front-store")
    val corpus = tmp("front-corpus")
    Files.writeString(Paths.get(corpus, "documents.parquet"), "corpus-v1")

    var builds = 0
    def get(s: SparkSession) =
      FrontStore.frame(s, s"spec-store-front:$corpus:L=8", corpus) {
        builds += 1
        s.range(5).select(col("id"), (col("id") * 2).as("v"))
      }

    val s1 = newStoreSession(store)
    val rows1 = get(s1).collect().map(_.toSeq).toSet
    assert(builds == 1 && rows1.size == 5)

    // "new session": a distinct SparkSession over the same context —
    // the in-memory FrontCache is session-scoped, so a hit here can
    // only come from the store. The get must launch NO job (the
    // listener sees only the sentinel, and listener-bus FIFO means any
    // job the get had launched would have arrived first).
    val s2 = newStoreSession(store)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.add(j.jobId)
    }
    spark.sparkContext.addSparkListener(listener)
    val df2 =
      try {
        val df = get(s2)
        // sentinel to flush the listener bus: an RDD count is EXACTLY
        // one job (an SQL count under AQE is two), so the assertion
        // below can pin "zero get jobs" as "only the sentinel arrived"
        spark.sparkContext.parallelize(Seq(1)).count()
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (jobs.isEmpty && System.nanoTime() < deadline)
          Thread.sleep(10)
        assert(jobs.size == 1,
          s"a fresh-store get must launch zero jobs; saw ${jobs.size}")
        df
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(builds == 1, "persisted front must not recompute")
    assert(df2.collect().map(_.toSeq).toSet == rows1)

    // corpus change (regenerated file → new length/mtime) → fingerprint
    // miss → rebuild into a new snapshot, rows still equal
    Files.writeString(Paths.get(corpus, "documents.parquet"),
      "corpus-v2-regenerated")
    val df3 = get(s2)
    assert(builds == 2, "changed corpus must rebuild the front")
    assert(df3.collect().map(_.toSeq).toSet == rows1)
  }

  test("driver-side values persist and reload across sessions; corpus change rebuilds") {
    val store = tmp("front-store-val")
    val corpus = tmp("front-corpus-val")
    Files.writeString(Paths.get(corpus, "embeddings.parquet"), "emb-v1")

    var builds = 0
    def get(s: SparkSession): Vector[Double] =
      FrontStore.value(s, s"spec-store-value:$corpus", corpus) {
        builds += 1
        Vector(1.5, 2.5, 3.5)
      }

    assert(get(newStoreSession(store)) == Vector(1.5, 2.5, 3.5))
    assert(builds == 1)
    assert(get(newStoreSession(store)) == Vector(1.5, 2.5, 3.5))
    assert(builds == 1, "persisted value must deserialize, not rebuild")
    Files.writeString(Paths.get(corpus, "embeddings.parquet"), "emb-v2!")
    assert(get(newStoreSession(store)) == Vector(1.5, 2.5, 3.5))
    assert(builds == 2, "changed corpus must retrain the value")
  }

  test("no store configured falls back to the session FrontCache") {
    val s = spark.newSession() // PathConf unset
    var builds = 0
    def get() = FrontStore.frame(s, "spec-fallback-front", "/nonexistent") {
      builds += 1
      s.range(3).toDF("id")
    }
    val a = get(); val b = get()
    assert(builds == 1, "fallback must memoize through FrontCache")
    assert(a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet)
  }

  test("table names stay distinct for keys that sanitize identically") {
    val a = FrontStore.tableName("front:a/b=1")
    val b = FrontStore.tableName("front:a/b=2")
    val c = FrontStore.tableName("front:a.b_1")
    assert(Set(a, b, c).size == 3)
    assert(Seq(a, b, c).forall(_.matches("[A-Za-z0-9._-]+")))
  }

  test("corpus fingerprint is order-stable and content-sensitive") {
    val d = tmp("fp-corpus")
    Files.writeString(Paths.get(d, "a.parquet"), "aaa")
    Files.writeString(Paths.get(d, "b.parquet"), "bbb")
    val fp1 = FrontStore.corpusFingerprint(d)
    assert(fp1 == FrontStore.corpusFingerprint(d), "stable across calls")
    Files.writeString(Paths.get(d, "b.parquet"), "bbbb")
    assert(fp1 != FrontStore.corpusFingerprint(d), "length change must move it")
    assert(FrontStore.corpusFingerprint(d) !=
      FrontStore.corpusFingerprint(tmp("fp-other")), "dir identity included")
  }
}
