package graft.nl

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

/** HttpChatLlmClient against a local stub chat-completions server: request
  * shape (messages, temperature 0, 5000-token cap, bearer auth), response
  * parsing, and error paths. No external network.
  */
class LlmClientSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** Runs `f` against a one-shot stub server that replies with `status` /
    * `responseBody` and captures the request body + auth header.
    */
  private def withStub(status: Int, responseBody: String)(
      f: (java.net.URI, () => (String, String)) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var captured = ("", "")
    server.createContext("/v1/chat/completions", exchange => {
      val body = new String(exchange.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      captured = (body,
        Option(exchange.getRequestHeaders.getFirst("Authorization"))
          .getOrElse(""))
      val out = responseBody.getBytes(StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(status, out.length)
      exchange.getResponseBody.write(out)
      exchange.close()
    })
    server.start()
    try {
      val uri = java.net.URI.create(
        s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions")
      f(uri, () => captured)
    } finally server.stop(0)
  }

  private def ok(content: String): String =
    s"""{"choices":[{"message":{"role":"assistant","content":${mapper.writeValueAsString(content)}}}]}"""

  test("sends system+user messages, temp 0, token cap, bearer key") {
    withStub(200, ok("SELECT 1")) { (uri, captured) =>
      val c = new HttpChatLlmClient(uri, "sekret", "test-model",
        maxTokensField = "max_completion_tokens")
      assert(c.complete("you write sql", "count the rows") == "SELECT 1")
      val (body, auth) = captured()
      assert(auth == "Bearer sekret")
      val json = mapper.readTree(body)
      assert(json.get("model").asText == "test-model")
      assert(json.get("temperature").asInt == 0)
      assert(json.get("max_completion_tokens").asInt == 5000)
      assert(!json.has("max_tokens"))
      val msgs = json.get("messages")
      assert(msgs.size == 2)
      assert(msgs.get(0).get("role").asText == "system")
      assert(msgs.get(0).get("content").asText == "you write sql")
      assert(msgs.get(1).get("role").asText == "user")
      assert(msgs.get(1).get("content").asText == "count the rows")
    }
  }

  test("mistral-style max_tokens field") {
    withStub(200, ok("SELECT 2")) { (uri, captured) =>
      val c = new HttpChatLlmClient(uri, "k", "m", maxTokensField = "max_tokens")
      assert(c.complete("s", "u") == "SELECT 2")
      val json = mapper.readTree(captured()._1)
      assert(json.get("max_tokens").asInt == 5000)
    }
  }

  test("non-2xx status surfaces as error with body excerpt") {
    withStub(429, """{"error":"rate limited"}""") { (uri, _) =>
      val c = new HttpChatLlmClient(uri, "k", "m")
      val e = intercept[RuntimeException](c.complete("s", "u"))
      assert(e.getMessage.contains("429"))
      assert(e.getMessage.contains("rate limited"))
    }
  }

  test("missing content surfaces as error (reference parity)") {
    withStub(200, """{"choices":[]}""") { (uri, _) =>
      val c = new HttpChatLlmClient(uri, "k", "m")
      val e = intercept[RuntimeException](c.complete("s", "u"))
      assert(e.getMessage.contains("no choices"))
    }
  }

  test("fromEnv: real client only when the provider key is present") {
    assert(LlmClient.fromEnv("gemini", None, _ => None).isLeft)
    assert(LlmClient.fromEnv("mistral", None, _ => None).isLeft)
    assert(LlmClient.fromEnv("gemini", None,
      k => Option.when(k == "GEMINI_API_KEY")("x")).isRight)
    assert(LlmClient.fromEnv("mistral", None,
      k => Option.when(k == "MISTRAL_API_KEY")("x")).isRight)
    assert(LlmClient.fromEnv("claude", None, _ => Some("x")).isLeft)
  }
}
