package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.llm._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/** The production LLM transport against a local stub chat-completions
  * server: request shape (auth header, model/messages/temperature/
  * response_format body), per-model failure fallthrough, content-parse
  * failure fallthrough, and total-failure sentinel parity with
  * [[FallbackLlmGateway]] — the contract `core/LLMGateway.py:53-136`
  * implements against real providers.
  */
class HttpLlmGatewaySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  // (path, auth header, request body) per request, in order
  private val seen = mutable.ArrayBuffer.empty[(String, String, String)]

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def ok(content: String, model: String,
                 total: Int, prompt: Int, completion: Int): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val msg = root.putArray("choices").addObject().putObject("message")
    msg.put("role", "assistant"); msg.put("content", content)
    val u = root.putObject("usage")
    u.put("total_tokens", total); u.put("prompt_tokens", prompt)
    u.put("completion_tokens", completion)
    mapper.writeValueAsString(root)
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      seen.synchronized {
        seen += ((ex.getRequestURI.getPath,
          ex.getRequestHeaders.getFirst("Authorization"), body))
      }
      val model = mapper.readTree(body).path("model").asText("")
      model match {
        case "good-model" =>
          respond(ex, 200, ok(
            """{"service_category":"purchase","summary":"wants a car","engagement_rating":"4"}""",
            "good-model-2024-01", total = 123, prompt = 100, completion = 23))
        case "flaky-model" => // provider error → must fall through
          respond(ex, 500, """{"error":{"message":"overloaded"}}""")
        case "prose-model" => // 200 but content is NOT the requested JSON
          respond(ex, 200, ok("Sure! The category is purchase.", "prose-model",
            10, 8, 2))
        case "empty-model" => // 200 but no choices
          respond(ex, 200, """{"model":"empty-model","choices":[]}""")
        case _ =>
          respond(ex, 404, """{"error":{"message":"unknown model"}}""")
      }
    })
    server.start()
    base = s"http://localhost:${server.getAddress.getPort}/v1"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def gw(models: String*) =
    new HttpLlmGateway(base, apiKey = "sk-test", models = models)

  test("empty key and empty chain are rejected at construction") {
    intercept[IllegalArgumentException](gw())
    intercept[IllegalArgumentException](
      new HttpLlmGateway(base, apiKey = "", models = Seq("m")))
  }

  test("success: request shape and parsed completion envelope") {
    seen.synchronized(seen.clear())
    val res = gw("good-model").extract("customer wants to purchase a sedan")
    // parsed fields, stringly
    assert(res.fields("service_category") == "purchase")
    assert(res.fields("summary") == "wants a car")
    assert(res.fields("engagement_rating") == "4")
    // usage + ACTUAL model from the response body, not the requested name
    assert(res.tokens == 123L && res.model == "good-model-2024-01")
    val (path, auth, body) = seen.synchronized(seen.head)
    assert(path == "/v1/chat/completions")
    assert(auth == "Bearer sk-test")
    val req = mapper.readTree(body)
    assert(req.get("model").asText() == "good-model")
    assert(req.get("temperature").asDouble() == 0.8) // LLMGateway.py:28 default
    assert(req.path("response_format").path("type").asText() == "json_object")
    val msgs = req.get("messages")
    assert(msgs.size() == 2)
    assert(msgs.get(0).get("role").asText() == "system")
    assert(msgs.get(1).get("role").asText() == "user")
    assert(msgs.get(1).get("content").asText().contains("purchase a sedan"))
  }

  test("per-model failure falls through the chain in order") {
    seen.synchronized(seen.clear())
    val res = gw("flaky-model", "good-model").extract("hello")
    assert(res.model == "good-model-2024-01" && res.tokens == 123L)
    val models = seen.synchronized(seen.toSeq).map(r =>
      mapper.readTree(r._3).get("model").asText())
    assert(models == Seq("flaky-model", "good-model"), "chain order not honored")
  }

  test("unparseable structured content is a model failure, not a success") {
    // LLMGateway.py:96-101 — json.loads failure raises → next model
    val res = gw("prose-model", "good-model").extract("hello")
    assert(res.model == "good-model-2024-01")
    // and an empty choices array likewise
    val res2 = gw("empty-model", "good-model").extract("hello")
    assert(res2.model == "good-model-2024-01")
  }

  test("total failure: completion raises; extract returns the sentinel with FallbackLlmGateway parity") {
    val g = gw("flaky-model", "prose-model")
    val e = intercept[RuntimeException](
      g.completion(Seq(ChatMessage("user", "hi"))))
    assert(e.getMessage.contains("All LLM models failed"))
    val convo = "three  token   conversation"
    val got = g.extract(convo)
    // exact parity with the deterministic chain's total-failure row
    val want = new FallbackLlmGateway(Seq(new LlmGateway {
      override def extract(c: String): LlmResult = throw new RuntimeException("down")
    })).extract(convo)
    assert(got == want)
    assert(got.model == "fallback_error" && got.fields.isEmpty && got.tokens == 3L)
  }

  test("unreachable server degrades to the sentinel, never an exception") {
    val dead = new HttpLlmGateway("http://localhost:1", "k", Seq("m"),
      timeoutMillis = 300)
    val res = dead.extract("a b")
    assert(res.model == "fallback_error" && res.tokens == 2L)
  }

  test("model override skips the chain (LLMGateway.py:78)") {
    seen.synchronized(seen.clear())
    val c = gw("flaky-model", "good-model")
      .completion(Seq(ChatMessage("user", "hi")), model = Some("good-model"))
    assert(c.model == "good-model-2024-01")
    assert(seen.synchronized(seen.size) == 1, "override must not walk the chain")
    assert(c.promptTokens == 100L && c.completionTokens == 23L)
  }

  test("gateway drives LlmExtract end-to-end over the wire") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq(("T1", "please purchase"), ("T2", "hello there"))
      .toDF("ticket_id", "conversation")
    val out = LlmExtract.extract(df, "ticket_id", "conversation", gw("good-model"))
    val rows = out.select("ticket_id", "service_category", "tokens", "model")
      .as[(String, String, Long, String)].collect().sortBy(_._1)
    assert(rows.length == 2)
    assert(rows.forall(r => r._2 == "purchase" && r._3 == 123L &&
      r._4 == "good-model-2024-01"))
  }
}
