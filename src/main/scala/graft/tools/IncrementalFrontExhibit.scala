package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two-batch incremental-front exhibit (round-15 VERDICT ask #5's
  * "done" criterion): the REAL BM25 posting front, maintained through
  * [[graft.operators.FrontStore.frameIncremental]] across an
  * additions-only corpus change, must (a) cost ~the delta on batch 2 —
  * not the corpus — and (b) serve scores hash-identical to the
  * full-rebuild control.
  *
  * Protocol, against a scratch corpus built from the given sf dir's
  * documents table (the testdata itself is never touched):
  *   1. corpus-v1 = 90% of documents (one parquet part);
  *      cold full build of the posting front → t_full_v1.
  *   2. corpus-v2 = v1 + a NEW part holding the remaining 10%;
  *      the same get now takes the incremental path (asserted via
  *      FrontStore.currentMode) → t_incremental.
  *   3. control: the identical v2 corpus through a FRESH store —
  *      cold full rebuild → t_full_v2.
  *   4. gate: the incremental snapshot's scored rows equal the
  *      control's exactly (sorted collect compare — the same rows the
  *      text_bm25/retrieval oracles hash).
  *
  * Every step is followed by a WARM re-get of the same front; the warm
  * figure is the pure serve cost (store hit, zero build jobs), so
  * `t_* − t_serve` isolates the BUILD cost the incremental path is
  * supposed to shrink. An optional `factor` arg (default 10) replicates
  * the documents table by id-shifted copies so tokenization dominates
  * the fixed session overheads at test scale.
  *
  * Prints one JSON line:
  * {"exhibit":"incremental_front","sf":...,"factor":N,"n_docs":...,
  *  "t_full_v1":...,"t_serve_v1":...,"t_incremental":...,
  *  "t_serve_v2":...,"t_full_v2":...,"delta_frac":0.1,
  *  "rows_equal":true,"mode_v2":"incremental"}
  *
  * Usage: runMain graft.tools.IncrementalFrontExhibit /root/testdata/sf0.1 10
  */
object IncrementalFrontExhibit {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val off = base.agg(max(col("doc_id"))).first().getLong(0) + 1L
    val docs = (0 until factor).map(i =>
        base.select((col("doc_id") + lit(i * off)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val cut = docs.selectExpr("percentile(doc_id, 0.9) AS c")
      .first().getDouble(0).toLong

    // the protocol runs TWICE against fresh work dirs; round 1 is the
    // JIT/codegen warmup (its control step otherwise runs warmest and
    // under-reads the full-rebuild cost), round 2 is the report
    var line = ""
    for (round <- 1 to 2) {
    val work = java.nio.file.Files.createTempDirectory("inc-front").toString
    val corpus = s"$work/corpus"

    // batch 1: 90% of docs as the corpus's only part file
    docs.where(col("doc_id") <= cut).coalesce(1)
      .write.mode("overwrite").parquet(s"$corpus/documents.parquet")

    def session(store: String): SparkSession = {
      val s = spark.newSession()
      s.conf.set(graft.operators.FrontStore.PathConf, store)
      s
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, math.rint((System.nanoTime() - t0) / 1e6) / 1e3)
    }
    def scores(s: SparkSession): DataFrame =
      graft.queries.RetrievalQueries.bm25ScoresCached(s, corpus)
    def collectSorted(df: DataFrame): Seq[(Long, Double)] =
      df.select(col("doc_id").cast("long"), col("score"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq

    val storeA = s"$work/storeA"
    val (_, tFullV1) = timed(collectSorted(scores(session(storeA))))
    // warm re-get in a FRESH session = pure serve cost (store hit)
    val (_, tServeV1) = timed(collectSorted(scores(session(storeA))))

    // batch 2: the remaining 10% lands as a NEW part — additions only
    docs.where(col("doc_id") > cut).coalesce(1)
      .write.mode("append").parquet(s"$corpus/documents.parquet")
    val sA2 = session(storeA)
    val (incRows, tIncremental) = timed(collectSorted(scores(sA2)))
    val modeV2 = graft.operators.FrontStore
      .currentMode(sA2, s"bm25-post:$corpus:terms=table,spark")
      .getOrElse("?")
    val (_, tServeV2) = timed(collectSorted(scores(session(storeA))))

    // control: identical v2 corpus, fresh store, cold full rebuild
    val (ctlRows, tFullV2) = timed(collectSorted(scores(session(s"$work/storeB"))))

    val equal = incRows == ctlRows
    line = s"""{"exhibit":"incremental_front","sf":"$sfDir",""" +
      s""""factor":$factor,"n_scored_v2":${ctlRows.size},""" +
      s""""t_full_v1":$tFullV1,"t_serve_v1":$tServeV1,""" +
      s""""t_incremental":$tIncremental,"t_serve_v2":$tServeV2,""" +
      s""""t_full_v2":$tFullV2,"round":$round,""" +
      s""""delta_frac":0.1,"rows_equal":$equal,"mode_v2":"$modeV2"}"""
    if (!equal || modeV2 != "incremental") {
      println(line); spark.stop(); sys.exit(1)
    }
    }
    println(line)
    spark.stop()
  }
}
