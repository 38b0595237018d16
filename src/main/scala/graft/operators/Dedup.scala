package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{HashFns, SimFns, TextAnalysisFns}

/** Deduplication operator family for a training-data pipeline.
  *
  * Scale design: every variant avoids the O(N²) comparison by blocking —
  * exact dedup is a hash groupBy (one shuffle); MinHash-LSH and SimHash
  * shuffle on band keys so only same-bucket pairs are compared; the
  * verified-pair step is an equi-join, never a cross join. At 100 TB the
  * band-key shuffle is the only wide stage and AQE handles band skew
  * (popular buckets can additionally be salted/capped via `maxBucket`).
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct hash (keeper = min
    * id), with the duplicate count. Hash-groupBy — map-side partial agg,
    * single shuffle.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash + LSH near-dup candidate pairs, verified by true shingle
    * Jaccard ≥ `threshold`. Returns (id_a < id_b, jaccard).
    *
    * shingle → minhash → band → bucket-join: the self-join is on the band
    * key (equi-join, shuffled on band), then candidates are verified with
    * the exact Jaccard on the shingle arrays.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleWords: Int = 3, numHashes: Int = 8, bands: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val shingled = df.select(
        col(idCol).as("id"),
        SimFns.wordShingles(TextAnalysisFns.tokens(col(textCol)), shingleWords)
          .as("shingles"))
      .where(size(col("shingles")) > 0)
    val banded = shingled
      .withColumn("sig", HashFns.minhashSignature(col("shingles"), numHashes))
      .withColumn("band", explode(HashFns.lshBandKeys(col("sig"), bands, rows)))
      .select("id", "band", "shingles")
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        SimFns.jaccard(col("a.shingles"), col("b.shingles")).as("jaccard"))
      .distinct() // a pair can collide in multiple bands
      .where(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit simhash, banded into 4×16-bit blocks
    * (recall guarantee for hamming ≤ 3), verified by hamming ≤ maxHamming.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
        HashFns.simhash64(TextAnalysisFns.tokens(col(textCol))).as("simhash"))
      .withColumn("band", explode(HashFns.simhashBands(col("simhash"))))
    val a = hashed.alias("a")
    val b = hashed.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        HashFns.hammingDistance(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** N-gram Jaccard near-dup pairs within blocks. Blocking keys keep the
    * candidate set linear-ish; with `blockCols` empty this degrades to the
    * exact quadratic form (only for tiny inputs).
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String, n: Int,
                   blockCols: Seq[String], threshold: Double): DataFrame = {
    val grams = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
        SimFns.charNgrams(col(textCol), lit(n)).as("grams"): _*)
      .where(size(col("grams")) > 0)
    val a = grams.alias("a")
    val b = grams.alias("b")
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(col("a.id") < col("b.id"))(_ && _)
    a.join(b, blockCond)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        SimFns.jaccard(col("a.grams"), col("b.grams")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding cosine near-dup pairs within a hyperplane-LSH bucket.
    * `numPlanes` sign bits form the bucket; same-bucket pairs with cosine ≥
    * threshold are returned. For oracle-exact small-scale checks use
    * `Ann.bruteForcePairs` instead.
    */
  def embeddingCosine(df: DataFrame, idCol: String, vecCol: String,
                      planes: Seq[Seq[Double]], threshold: Double): DataFrame = {
    import graft.functions.VecFns
    val planeCols = planes.map(p => array(p.map(lit): _*))
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      VecFns.hyperplaneBucket(col(vecCol), planeCols).as("bucket"))
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        VecFns.cosine(col("a.vec"), col("b.vec")).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
