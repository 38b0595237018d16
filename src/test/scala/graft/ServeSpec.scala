package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import graft.serving.Serve

/** The runnable serving binary's composed stack ([[Serve.build]], the
  * engine twin of `uvicorn api.app:app`): offline demo mode (no
  * GRAFT_LIVEAGENT_URL / GRAFT_LLM_URL → FixtureApi + mock gateway) driven
  * over a real ephemeral port through the reference's scheduler order
  * (`main.py:1-24`: agents → tags → tickets-and-messages → convo), then
  * the fetch + monitoring surface. This is exactly what
  * `sbt "runMain graft.serving.Serve"` starts, minus the foreground join.
  */
class ServeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private def call(port: Int, method: String, path: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    val built = (if (method == "POST")
      req.POST(HttpRequest.BodyPublishers.noBody()) else req.GET()).build()
    val res = client.send(built, HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }
  private def json(body: String) = mapper.readTree(body)

  test("Serve.build demo stack: scheduler-order routes end-to-end + fetch + logs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-serve").toString
    val stack = Serve.build(spark, Map("GRAFT_WAREHOUSE_DIR" -> dir))
    val port = stack.serving.start() // ephemeral port, like main with port 0
    try {
      assert(call(port, "GET", "/health")._1 == 200)

      // scheduler order (api/app.py:45-58 route set, main.py order)
      val (s1, b1) = call(port, "POST", "/extract/process-agents")
      assert(s1 == 200 && json(b1).get("count").asText() == "1")
      val (s2, b2) = call(port, "POST", "/extract/process-tags")
      assert(s2 == 200 && json(b2).get("count").asText() == "1")
      // initial run: the demo tickets are dated 2025-01-02/03, after the
      // default initial date — both land, and the messages leg follows
      val (s3, b3) = call(port, "POST",
        "/extract/process-tickets-and-messages?is_initial=true")
      assert(s3 == 200 && json(b3).get("count").asText() == "2")
      assert(stack.wh.read("tickets").count() == 2)
      assert(stack.wh.read("messages").count() == 2)
      val (s4, b4) = call(port, "POST", "/extract/process-convo")
      assert(s4 == 200 && json(b4).get("count").asText() == "2")
      assert(stack.wh.read("convo_analysis").count() == 2)

      // fetch surface over what the run produced
      val (fs, fb) = call(port, "GET", "/fetch/convo_analysis?limit=10")
      assert(fs == 200 && json(fb).get("data").size() == 2)

      // /logs: all four extract routes completed
      val (ls, lb) = call(port, "GET", "/logs")
      assert(ls == 200 &&
        json(lb).get("summary").get("completed_routes").asInt() == 4)
    } finally stack.serving.stop()
  }
}
