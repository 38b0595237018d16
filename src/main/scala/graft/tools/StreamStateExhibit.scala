package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming state-scale exhibit (round 10): drive the stateful streaming
  * twins over the sf1.0 events feed as a ≥10-micro-batch file stream on
  * the RocksDB state store, and record per batch: input rows, trigger
  * latency, state rows, and state bytes. The claim under test is that
  * per-key state is BOUNDED (TvDrift: counters per open window;
  * windowedTopK: ≤k entries per open window; novelTypes: one marker per
  * distinct type) and that watermark eviction keeps total state flat as
  * event time advances — state bytes must not trend with rows ingested.
  *
  * Usage: sbt "runMain graft.tools.StreamStateExhibit [sfDir] [slices]"
  * (defaults: target/sf1.0, 12). Prints one `[exhibit]` line per batch
  * and a `[exhibit-summary]` line per operator.
  */
object StreamStateExhibit {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1.0")
    val slices = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- stage the feed as `slices` time-ordered files (one per batch):
    // event time advances monotonically across batches, so the watermark
    // moves and closed windows are evicted — the production replay shape.
    val stage = "target/stream_exhibit/stage"
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val bounds = ev.agg(min(col("ts")).cast("long").as("lo"),
      max(col("ts")).cast("long").as("hi")).first()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val step = math.max(1L, (hi - lo) / slices + 1)
    val stageP = Paths.get(stage)
    if (Files.exists(stageP)) {
      Files.walk(stageP).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(stageP)
    (0 until slices).foreach { i =>
      val slice = ev.where(
        col("ts").cast("long").between(lo + i * step, lo + (i + 1) * step - 1))
      val tmp = s"target/stream_exhibit/tmp_$i"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, stageP.resolve(f"slice_$i%03d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      // mod-time order == slice order (file source processes oldest first)
      Files.setLastModifiedTime(stageP.resolve(f"slice_$i%03d.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val schema = spark.read.parquet(stage).schema
    val totalRows = spark.read.parquet(stage).count()
    println(s"[exhibit] staged $totalRows rows in $slices slices from $dir")

    def feed(): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)

    // static reference profile for the drift monitor: the sf0.1 standing
    // corpus distribution (bounded: one count per event type)
    val reference = graft.Tables.load(spark, "/root/testdata/sf0.1", "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    def drive(name: String, out: DataFrame, mode: String): Unit = {
      val ckpt = s"target/stream_exhibit/ckpt_$name"
      val ckptP = Paths.get(ckpt)
      if (Files.exists(ckptP)) {
        Files.walk(ckptP).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
      val q = out.writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      val lines = prog.map { p =>
        val so = p.stateOperators.headOption
        val stateRows = so.map(_.numRowsTotal).getOrElse(-1L)
        val stateBytes = so.map(_.memoryUsedBytes).getOrElse(-1L)
        // memoryUsedBytes on RocksDB includes block cache / retained
        // versions; the LIVE state is the loaded-version SST size
        def custom(k: String): Long = so.flatMap(s =>
          Option(s.customMetrics.get(k)).map(_.toLong)).getOrElse(-1L)
        (p.batchId, p.numInputRows,
          Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(-1L),
          stateRows, stateBytes, custom("rocksdbSstFileSize"),
          custom("rocksdbTotalCompactionLatencyMs"))
      }
      lines.foreach { case (b, rows, ms, sr, sb, sst, _) =>
        println(s"[exhibit] op=$name batch=$b rows=$rows ms=$ms " +
          s"stateRows=$sr stateBytes=$sb sstBytes=$sst")
      }
      val bytes = lines.map(_._5).filter(_ >= 0)
      val rows = lines.map(_._4).filter(_ >= 0)
      val sst = lines.map(_._6).filter(_ >= 0)
      println(s"[exhibit-summary] op=$name batches=${lines.size} " +
        s"stateRows(min=${rows.minOption.getOrElse(-1L)},max=${rows.maxOption.getOrElse(-1L)},last=${rows.lastOption.getOrElse(-1L)}) " +
        s"stateBytes(min=${bytes.minOption.getOrElse(-1L)},max=${bytes.maxOption.getOrElse(-1L)},last=${bytes.lastOption.getOrElse(-1L)}) " +
        s"sstBytes(min=${sst.minOption.getOrElse(-1L)},max=${sst.maxOption.getOrElse(-1L)},last=${sst.lastOption.getOrElse(-1L)}) " +
        s"totalMs=${lines.map(_._3).filter(_ >= 0).sum}")
    }

    drive("tv_drift",
      graft.streaming.Streams.streamTvDrift(feed(), reference), "append")
    drive("window_topk",
      graft.streaming.Streams.windowedTopK(feed(), k = 100), "append")
    drive("novel_types",
      graft.streaming.Streams.novelTypes(
        feed().as[graft.streaming.Streams.Event]).toDF(), "append")

    spark.stop()
  }
}
