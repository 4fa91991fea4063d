package graft.nl

import org.scalatest.funsuite.AnyFunSuite
import graft.meta._

class ContextSelectSpec extends AnyFunSuite {

  val dict: DataDictionary = DataDictionary(
    table = "queuedata",
    columns = Seq(
      ColumnMeta("queue", "STRING", importance = 10,
        aliases = Seq("name", "queuename")),
      ColumnMeta("status", "STRING", importance = 10,
        aliases = Seq("state")),
      ColumnMeta("corecount", "INT", importance = 7,
        aliases = Seq("cores", "cpu count")),
      ColumnMeta("maxrss", "BIGINT", importance = 3),
      ColumnMeta("country", "STRING", importance = 4,
        allowedValues = Some(AllowedValues.Enumeration(
          Seq("United States", "France")))),
      ColumnMeta("corepower", "DOUBLE", importance = 5,
        allowedValues = Some(AllowedValues.Range(0, 100))),
      ColumnMeta("fairshare", "STRING", importance = 2,
        allowedValues = Some(AllowedValues.Pattern("type=.*"))),
      ColumnMeta("hc_suite", "STRING", importance = 2,
        allowedValues = Some(AllowedValues.Examples(Seq("[\"x\"]"))))),
    rules = Seq("prefer lowercase literal comparisons"))

  test("P7: alias substring hit adds +100 over importance") {
    val c = dict.columns.find(_.name == "corecount").get
    assert(ContextSelect.score("how many cores does each queue have", c) == 107)
    assert(ContextSelect.score("what is the biggest queue", c) == 7)
  }

  test("P7: name substring also scores the bonus, question is lowercased") {
    val c = dict.columns.find(_.name == "status").get
    assert(ContextSelect.score("Which queues have STATUS online?", c) == 110)
  }

  test("P7: top-k keeps highest-scoring k columns and carries rules") {
    val ctx = ContextSelect.selectRelevantContext(
      "queues with cores above 8", dict, topK = 3)
    val names = ctx.columns.map(_.name)
    // 'queue' (name hit, 110) and 'corecount' (alias hit, 107) must lead
    assert(names.take(2) == Seq("queue", "corecount"))
    assert(names.size == 3)
    assert(ctx.rules == Seq("prefer lowercase literal comparisons"))
  }

  test("P7: equal-score columns keep dictionary order (reference parity)") {
    // two fresh columns with identical importance and no question hit:
    // whichever comes first in the dictionary must enter the context first
    // (stable sort on score only, query_llm.py:95)
    val tied = DataDictionary(
      table = "t",
      columns = Seq(
        ColumnMeta("zzz_first", "STRING", importance = 5),
        ColumnMeta("aaa_second", "STRING", importance = 5),
        ColumnMeta("mmm_third", "STRING", importance = 5)))
    val ctx = ContextSelect.selectRelevantContext("unrelated", tied, topK = 2)
    assert(ctx.columns.map(_.name) == Seq("zzz_first", "aaa_second"))
  }

  test("P8: render covers every allowed_values shape") {
    val ctx = ContextSelect.selectRelevantContext("anything", dict, topK = 12)
    val text = ContextSelect.render(ctx)
    assert(text.contains("- queue (STRING)"))
    assert(text.contains("Aliases: name, queuename."))
    assert(text.contains("Allowed: United States, France."))
    assert(text.contains("range [0.0, 100.0]"))
    assert(text.contains("pattern: type=.*"))
    assert(text.contains("examples: [\"x\"]"))
    assert(text.contains("Rules:"))
  }

  test("P9: prompt templates carry DDL, context and one-shot example") {
    val sys = Prompt.system("queuedata", "queue STRING, status STRING", "CTX")
    assert(sys.contains("CREATE TABLE queuedata (queue STRING, status STRING);"))
    assert(sys.contains("CTX"))
    assert(sys.contains("SELECT name FROM queuedata WHERE LOWER(status) = 'online';"))
    assert(Prompt.user("all online queues") ==
      "Write an SQL query that returns - all online queues")
  }
}
