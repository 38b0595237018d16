package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HttpGeoResolver

/** Drives [[HttpGeoResolver]] against a local stub HTTP server: fallback
  * order (OSM first, Photon only on an OSM miss), the Nominatim
  * min-interval spacing, and total-failure → None.
  */
class HttpGeoResolverSpec extends AnyFunSuite {

  /** Stub serving scripted bodies; records hit times per path. */
  private def withServer(osmBody: () => String, photonBody: () => String)
                        (run: (String, collection.mutable.Map[String, List[Long]]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = collection.mutable.Map[String, List[Long]]().withDefaultValue(Nil)
    def handler(body: () => String, name: String) =
      new com.sun.net.httpserver.HttpHandler {
        override def handle(x: com.sun.net.httpserver.HttpExchange): Unit = {
          hits.synchronized { hits(name) = hits(name) :+ System.currentTimeMillis() }
          val b = body().getBytes(UTF_8)
          x.sendResponseHeaders(200, b.length)
          x.getResponseBody.write(b); x.close()
        }
      }
    server.createContext("/search", handler(osmBody, "osm"))
    server.createContext("/api", handler(photonBody, "photon"))
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}", hits)
    finally server.stop(0)
  }

  private val osmHit = """[{"lat":"14.5995","lon":"120.9842"}]"""
  private val photonHit =
    """{"features":[{"geometry":{"coordinates":[120.98,14.59]}}]}"""

  test("OSM hit wins: Photon never called, source=osm, address suffixed") {
    withServer(() => osmHit, () => photonHit) { (base, hits) =>
      val r = new HttpGeoResolver(base, base, minOsmIntervalMillis = 0)
      assert(r.resolve("makati") == Some(("makati, Philippines", "osm")))
      assert(hits("osm").size == 1 && hits("photon").isEmpty)
    }
  }

  test("fallback order: empty OSM result falls through to Photon") {
    withServer(() => "[]", () => photonHit) { (base, hits) =>
      val r = new HttpGeoResolver(base, base, minOsmIntervalMillis = 0)
      assert(r.resolve("qc") == Some(("qc, Philippines", "photon")))
      assert(hits("osm").size == 1 && hits("photon").size == 1)
    }
  }

  test("total failure is None, not an exception") {
    withServer(() => "[]", () => """{"features":[]}""") { (base, _) =>
      val r = new HttpGeoResolver(base, base, minOsmIntervalMillis = 0)
      assert(r.resolve("nowhere").isEmpty)
    }
    // dead endpoints (connection refused) degrade the same way
    val dead = new HttpGeoResolver("http://127.0.0.1:9", "http://127.0.0.1:9",
      minOsmIntervalMillis = 0, timeoutMillis = 300)
    assert(dead.resolve("x").isEmpty)
  }

  test("Nominatim min-interval: consecutive OSM calls are spaced") {
    withServer(() => osmHit, () => photonHit) { (base, hits) =>
      val r = new HttpGeoResolver(base, base, minOsmIntervalMillis = 150)
      r.resolve("a"); r.resolve("b"); r.resolve("c")
      val t = hits("osm")
      assert(t.size == 3)
      val gaps = t.zip(t.tail).map { case (a, b) => b - a }
      assert(gaps.forall(_ >= 130), s"OSM calls not spaced: gaps=$gaps") // timer slack
    }
  }
}
