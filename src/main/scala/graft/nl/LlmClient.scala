package graft.nl

/** LLM client boundary (SURVEY.md §2.1 P10-P11). The reference calls
  * Gemini (OpenAI-compatible endpoint) or Mistral with temperature 0 and a
  * completion cap (query_llm.py:348-390); this port keeps the call behind
  * a trait so the pipeline is testable offline and the network client can
  * be injected by embedding applications.
  *
  * IMPORTANT (scale): the LLM call happens once per user question on the
  * driver — never on executors, never per row.
  */
trait LlmClient {
  /** Returns the raw model text for (system, user); may include markdown
    * fencing — the repair pipeline strips it.
    */
  def complete(system: String, user: String): String
}

/** Deterministic offline client for tests and air-gapped runs: replies
  * from a canned map keyed by exact user prompt, else a fallback.
  */
class MockLlmClient(
    canned: Map[String, String] = Map.empty,
    fallback: String = "SELECT 1 AS one") extends LlmClient {
  override def complete(system: String, user: String): String =
    canned.getOrElse(user, fallback)
}

/** Real chat-completions client over `java.net.http` (P10/P11). Both of
  * the reference's providers speak the same request shape
  * (query_llm.py:348-390): POST <endpoint> with a system+user message
  * pair, temperature 0 and a 5000-token completion cap; the reply text is
  * `choices[0].message.content`. Only the endpoint URL, bearer key, and
  * the name of the max-tokens field differ:
  *
  *   - Gemini: the OpenAI-compatible endpoint
  *     (generativelanguage.googleapis.com/v1beta/openai/), field
  *     `max_completion_tokens`
  *   - Mistral: api.mistral.ai/v1, field `max_tokens`
  *
  * JSON in/out via Jackson (already on Spark's classpath). The endpoint
  * is injectable so tests run against a local stub server.
  */
class HttpChatLlmClient(
    endpoint: java.net.URI,
    apiKey: String,
    model: String,
    maxTokensField: String = "max_tokens",
    timeout: java.time.Duration = java.time.Duration.ofSeconds(120))
    extends LlmClient {
  import com.fasterxml.jackson.databind.ObjectMapper

  private val mapper = new ObjectMapper()
  private val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(timeout)
    .build()

  override def complete(system: String, user: String): String = {
    val body = mapper.createObjectNode()
    body.put("model", model)
    body.put("temperature", 0)
    body.put(maxTokensField, 5000)
    val msgs = body.putArray("messages")
    msgs.addObject().put("role", "system").put("content", system)
    msgs.addObject().put("role", "user").put("content", user)

    val req = java.net.http.HttpRequest.newBuilder(endpoint)
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(body)))
      .build()
    val resp = http.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(
        s"LLM endpoint returned HTTP ${resp.statusCode()}: " +
          resp.body().take(500))
    val content = mapper.readTree(resp.body())
      .path("choices").path(0).path("message").path("content")
    if (content.isMissingNode || content.isNull)
      throw new RuntimeException("LLM returned no choices/message content.")
    content.asText()
  }
}

/** Provider selection mirroring the reference CLI (`--llm` / `--model`,
  * query_llm.py:427-428, 485-486): a real HTTP client is constructed only
  * when the provider's API-key env var is present, so air-gapped runs and
  * tests keep working without network access.
  */
object LlmClient {
  val GeminiBase = "https://generativelanguage.googleapis.com/v1beta/openai/chat/completions"
  val MistralBase = "https://api.mistral.ai/v1/chat/completions"

  /** Left(reason for mock fallback) or Right(real client). */
  def fromEnv(
      provider: String,
      model: Option[String],
      env: String => Option[String] = sys.env.get): Either[String, LlmClient] =
    provider match {
      case "gemini" =>
        env("GEMINI_API_KEY") match {
          case Some(k) => Right(new HttpChatLlmClient(
            java.net.URI.create(GeminiBase), k,
            model.getOrElse("gemini-2.5-pro"),
            maxTokensField = "max_completion_tokens"))
          case None => Left("GEMINI_API_KEY not set")
        }
      case "mistral" =>
        env("MISTRAL_API_KEY") match {
          case Some(k) => Right(new HttpChatLlmClient(
            java.net.URI.create(MistralBase), k,
            model.getOrElse("mistral-large-latest"),
            maxTokensField = "max_tokens"))
          case None => Left("MISTRAL_API_KEY not set")
        }
      case other => Left(s"unknown LLM provider: $other")
    }
}
