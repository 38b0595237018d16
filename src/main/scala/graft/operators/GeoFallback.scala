package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** X2 — the geocode HTTP fallback, split per SURVEY.md §4.3: the similarity
  * join resolves in-engine; addresses whose best score missed the threshold
  * go through a DRIVER-SIDE resolver (the unresolved remainder is tiny by
  * construction), rate-limited like the reference's Nominatim limiter
  * (min 1.25 s between calls, `core/Geocode.py:95-99`). A UDF-with-state
  * would serialize a rate limiter into executors and break its global
  * guarantee — driver-side is the correct Spark shape for a remainder set.
  */
trait GeoFallbackResolver extends Serializable {
  /** address → (matched_location, source) or None; source ∈ {osm, photon}. */
  def resolve(address: String): Option[(String, String)]
}

/** Deterministic mock for tests: resolves addresses containing a marker. */
final class MockGeoResolver(known: Map[String, String]) extends GeoFallbackResolver {
  override def resolve(address: String): Option[(String, String)] =
    known.get(address).map(loc => (loc, "osm"))
}

object GeoFallback {

  val MinIntervalMillis = 1250L // reference Nominatim limiter

  /** Resolve the unresolved remainder through the fallback:
    * `unresolved` rows (inputKey, addrCol) are collected (driver-side —
    * they are the post-join remainder, small by design), resolved
    * sequentially under the rate limit, and returned as
    * (inputKey, matched_location, source, score=0.0) — the reference
    * stamps fallback results with score 0.
    */
  def resolveRemainder(spark: SparkSession, unresolved: DataFrame,
                       inputKey: String, addrCol: String,
                       resolver: GeoFallbackResolver,
                       minIntervalMillis: Long = MinIntervalMillis): DataFrame = {
    val rows = unresolved.select(col(inputKey), col(addrCol)).collect()
    var last = 0L
    val out = rows.flatMap { r =>
      val wait = last + minIntervalMillis - System.currentTimeMillis()
      if (last != 0L && wait > 0) Thread.sleep(wait)
      last = System.currentTimeMillis()
      resolver.resolve(r.getString(1)).map { case (loc, source) =>
        Row(r.getString(0), loc, source, 0.0)
      }
    }
    val schema = StructType(Seq(
      StructField(inputKey, StringType),
      StructField("matched_location", StringType),
      StructField("source", StringType),
      StructField("score", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq), schema)
  }

  /** Full X2 composition: engine similarity best-match, then fallback for
    * inputs whose best score missed the threshold (or had no candidate),
    * results unioned with `source` ∈ {database, osm, photon}.
    */
  def geocodeWithFallback(inputs: DataFrame, refTable: DataFrame,
                          addrCol: String, refNameCol: String, inputKey: String,
                          resolver: GeoFallbackResolver,
                          threshold: Double = 0.1,
                          minIntervalMillis: Long = MinIntervalMillis): DataFrame = {
    val spark = inputs.sparkSession
    val best = GeocodeJoin.bestMatch(inputs, refTable, addrCol, refNameCol,
      inputKey, threshold)
    val accepted = best.where(col("accepted"))
      .select(col(inputKey).cast("string").as(inputKey),
        col(refNameCol).as("matched_location"), lit("database").as("source"),
        col("score"))
    val unresolvedKeys = inputs.select(col(inputKey).cast("string").as(inputKey),
        col(addrCol).as("__addr"))
      .join(accepted.select(col(inputKey)), Seq(inputKey), "left_anti")
    val fallback = resolveRemainder(spark, unresolvedKeys, inputKey, "__addr",
      resolver, minIntervalMillis)
    accepted.unionByName(fallback)
  }
}
