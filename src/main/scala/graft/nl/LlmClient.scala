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
