package graft.llm

/** X1 — the LLM structured-extraction operator's gateway boundary
  * (SURVEY.md §2.7; reference `core/LLMGateway.py:53-136`).
  *
  * The gateway is trait-injected so the engine stays deterministic and
  * testable: production would wire an HTTP client with the reference's
  * fallback chain (primary → fallback model, temperature 0.8); tests and
  * the correctness gate use the deterministic mock. The operator itself
  * (`LlmExtract`) never embeds a client in a plan — external calls happen
  * in `mapPartitions` with a per-partition bounded concurrency, mirroring
  * the reference's Semaphore(10).
  */
trait LlmGateway extends Serializable {
  /** Returns (fieldName → value) for the extraction schema, plus token
    * count and the model that answered. Total failure → all-null fields,
    * model = "fallback_error" (reference `ConvoDataExtract.py:163-187`).
    */
  def extract(conversation: String): LlmResult
}

final case class LlmResult(fields: Map[String, String], tokens: Long, model: String)

/** The reference's model-fallback chain (`core/LLMGateway.py:77-127` +
  * `core/extract/ConvoDataExtract.py:163-187`): try each delegate in
  * order, first success wins; a delegate failing (including returning
  * unparseable output — modeled here as a thrown exception) falls through
  * to the next. When EVERY delegate fails, the chain returns the
  * reference's sentinel row instead of raising: all extraction fields
  * null, `model = "fallback_error"`, tokens = token count of the prompt
  * side (whitespace-count stand-in for tiktoken).
  */
final class FallbackLlmGateway(delegates: Seq[LlmGateway]) extends LlmGateway {
  require(delegates.nonEmpty, "at least one delegate gateway required")

  override def extract(conversation: String): LlmResult = {
    val it = delegates.iterator
    while (it.hasNext) {
      try return it.next().extract(conversation)
      catch { case scala.util.control.NonFatal(_) => /* fall through */ }
    }
    val promptTokens = conversation.split("\\s+").count(_.nonEmpty).toLong
    LlmResult(Map.empty, promptTokens, "fallback_error")
  }
}

/** Deterministic mock: "extracts" by scanning the conversation text with
  * fixed rules — stable across runs, no I/O. Token count is the
  * whitespace-token count (the tiktoken stand-in).
  */
final class MockLlmGateway extends LlmGateway {
  override def extract(conversation: String): LlmResult = {
    val toks = conversation.split("\\s+").filter(_.nonEmpty)
    val intent = if (conversation.contains("purchase")) "purchase"
                 else if (conversation.contains("error")) "complaint"
                 else "inquiry"
    val fields = Map(
      "service_category"  -> intent,
      "summary"           -> toks.take(8).mkString(" "),
      "intent_rating"     -> intent,
      "engagement_rating" -> (toks.length % 5 + 1).toString,
      "clarity_rating"    -> (conversation.length % 5 + 1).toString,
      "resolution_rating" -> "3",
      "sentiment_rating"  -> (if (conversation.contains("error")) "negative" else "neutral"),
      "location"          -> toks.find(_.length > 6).getOrElse(""),
      "schedule_date"     -> "",
      "schedule_time"     -> "",
      "car"               -> "",
      "contact_num"       -> "",
      "payment"           -> "",
      "inspection"        -> "",
      "quotation"         -> "")
    LlmResult(fields, toks.length.toLong, "mock-model")
  }
}
