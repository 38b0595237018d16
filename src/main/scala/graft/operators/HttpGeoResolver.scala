package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** The real OSM/Photon HTTP geocoder behind [[GeoFallbackResolver]]
  * (`core/Geocode.py:91-157`): Nominatim first — under its own min-interval
  * (the reference sleeps `1.25 − (now − time_osm)` before each call and
  * stamps `time_osm` AFTER it, `Geocode.py:95-104`) — then Photon, no
  * spacing, as the chain's second leg. The query is the raw address with
  * ", Philippines" appended; a hit returns the full address and its
  * source, a miss falls through, total failure is None (the remainder
  * stays unresolved — never an exception).
  *
  * Base URLs are injectable so the spec drives a local stub server; the
  * default construction points at the public services. Engine code keeps
  * [[MockGeoResolver]] as the default wiring — this class is opt-in at
  * the call site (it performs real network I/O from the driver).
  */
final class HttpGeoResolver(
    osmBase: String = "https://nominatim.openstreetmap.org",
    photonBase: String = "https://photon.komoot.io",
    userAgent: String = "graft_geocoder",
    minOsmIntervalMillis: Long = GeoFallback.MinIntervalMillis,
    timeoutMillis: Int = 10000) extends GeoFallbackResolver {

  // driver-side only (resolveRemainder collects the remainder first);
  // guards the Nominatim usage-policy interval across resolve() calls
  @volatile private var lastOsmMillis = 0L

  private def get(url: String): Option[String] =
    try {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestProperty("User-Agent", userAgent) // Geocode.py:134
      conn.setConnectTimeout(timeoutMillis)
      conn.setReadTimeout(timeoutMillis)
      try {
        if (conn.getResponseCode / 100 == 2)
          Some(new String(conn.getInputStream.readAllBytes(), UTF_8))
        else None
      } finally conn.disconnect()
    } catch { case _: Exception => None }

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Nominatim response: JSON array, first element carries lat/lon. */
  private def osmHit(body: String): Boolean =
    try {
      val root = mapper.readTree(body)
      root.isArray && root.size() > 0 &&
        root.get(0).hasNonNull("lat") && root.get(0).hasNonNull("lon")
    } catch { case _: Exception => false }

  /** Photon response: GeoJSON FeatureCollection, coordinates [lng, lat]. */
  private def photonHit(body: String): Boolean =
    try {
      val feats = mapper.readTree(body).path("features")
      feats.isArray && feats.size() > 0 &&
        feats.get(0).path("geometry").path("coordinates").size() >= 2
    } catch { case _: Exception => false }

  override def resolve(address: String): Option[(String, String)] = {
    val full = s"$address, Philippines" // Geocode.py:92
    val q = java.net.URLEncoder.encode(full, "UTF-8")
    val wait = lastOsmMillis + minOsmIntervalMillis - System.currentTimeMillis()
    if (lastOsmMillis != 0L && wait > 0) Thread.sleep(wait)
    val osm = get(s"$osmBase/search?q=$q&format=json&limit=1")
    lastOsmMillis = System.currentTimeMillis()
    if (osm.exists(osmHit)) Some((full, "osm"))
    else if (get(s"$photonBase/api/?q=$q&limit=1").exists(photonHit))
      Some((full, "photon"))
    else None
  }
}
