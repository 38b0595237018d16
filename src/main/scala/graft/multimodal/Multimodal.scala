package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the Spark-side plumbing for decode / feature
  * extraction — schema, partitioning, batch shape.
  *
  * The actual media decode is STUBBED (this environment has no image/audio
  * libraries): `decodeStub` derives a deterministic fake feature vector
  * from the payload bytes. The plumbing around it — the schema contract,
  * size-aware repartitioning, mapPartitions batch shape — is real and
  * tested; swapping the stub for a JNI/FFmpeg decoder changes one
  * function.
  *
  * Scale design: media rows are heavily skewed by payload size, so the
  * partitioner is byte-budget-based (`repartitionByBytes`), not row-count
  * based — a 1000-executor job must not put ten 4K videos in one task.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  val FeatureDim = 16

  /** Deterministic stand-in for the media decoder: a 16-dim feature vector
    * derived from payload bytes (rolling byte hash per dimension). ??? —
    * replace with the real decode (image resize / audio frames / video
    * frame-sample) when the native libs exist; signature and batch shape
    * stay identical.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (payload == null) return out
    var i = 0
    while (i < payload.length) {
      val d = i % FeatureDim
      out(d) = out(d) * 31.0f + (payload(i) & 0xFF)
      out(d) = out(d) % 65521.0f
      i += 1
    }
    out
  }

  /** Feature extraction over the media table: typed Dataset mapPartitions
    * (one decoder init per partition — the expensive part with a real
    * codec), emitting (media_id, features, n_bytes). Stays in the
    * Dataset/Encoder world — no raw RDD hop.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: init decoder/codec once here, per partition
        it.map { case (id, payload) =>
          (id, decodeStub(payload),
            if (payload == null) 0L else payload.length.toLong)
        }
      }
      .toDF("media_id", "features", "n_bytes")
  }

  /** Byte-budget repartitioning: pack rows into partitions of roughly
    * `targetBytes` of payload — the size-skew answer for media tables (a
    * 4K video and a thumbnail must not count the same).
    *
    * Scale shape: the cumulative-sum window is PARTITIONED (hash of
    * media_id into `parallelism` groups), so no single task ever sees the
    * whole table — a global ORDER BY window would serialize 100 TB through
    * one task. Each group packs its own rows into `(group, localBucket)`
    * cells of ≤ targetBytes (+ one row of slack); the final repartition
    * hashes those cells across the cluster. Deterministic given media_id.
    */
  def repartitionByBytes(media: DataFrame, targetBytes: Long,
                         parallelism: Int = 64): DataFrame = {
    val sized = media.withColumn("__sz",
      coalesce(length(col("payload")).cast("long"), lit(0L)))
      .withColumn("__grp", pmod(hash(col("media_id")), lit(parallelism)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__grp")).orderBy(col("media_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val bucketed = sized
      .withColumn("__cum", sum(col("__sz")).over(w))
      .withColumn("__bucket",
        concat(col("__grp"), lit("#"), (col("__cum") / lit(targetBytes)).cast("long")))
    val n = math.max(1, bucketed.select(col("__bucket")).distinct().count().toInt)
    bucketed.repartition(n, col("__bucket")).drop("__sz", "__grp", "__cum", "__bucket")
  }
}
