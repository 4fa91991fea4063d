package graft.ops

import graft.Tables
import graft.meta._
import graft.repair.SqlRepair

/** The NL-bridge repair pipeline exercised inside the correctness gate:
  * a typical "LLM output" — fenced, alias'd, typo'd, wrong-case literal —
  * is repaired by SqlRepair against a testdata dictionary and executed via
  * spark.sql; the oracle is the hand-written repaired SQL. Proves the
  * text-level pipeline (SURVEY.md §4.1 R1-R5) produces exactly the SQL the
  * reference's semantics demand.
  */
object BridgeOps {

  /** Dictionary for the `customer` table. */
  val customerDict: DataDictionary = DataDictionary(
    table = "customer",
    columns = Seq(
      ColumnMeta("c_custkey", "BIGINT", importance = 10,
        aliases = Seq("customer id")),
      ColumnMeta("c_name", "STRING", aliases = Seq("customer name")),
      ColumnMeta("c_nationkey", "INT"),
      ColumnMeta("c_acctbal", "DOUBLE", aliases = Seq("balance")),
      ColumnMeta("c_mktsegment", "STRING",
        aliases = Seq("segment", "market segment"),
        allowedValues = Some(AllowedValues.Enumeration(Seq(
          "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))),
        canonicalization = Canonicalization(
          caseRule = Some("upper"),
          mapValues = Seq("bldg" -> Some("BUILDING"))))))

  /** The canned "model output" with the reference's classic mistakes. */
  val rawLlmOutput: String =
    "```sql\nSELECT c_custkey, segment, c_acctbl FROM customer " +
      "WHERE segment = 'bldg' ORDER BY c_custkey\n```"

  val queries: Seq[Q] = Seq(
    Q(
      "q54_bridge_repair",
      // the oracle IS the expected repaired SQL
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin
        .replace("\n", " ")) { (s, dir) =>
      Tables.registerAll(s, dir)
      val realCols = s.table("customer").columns.toSeq
      val repaired = SqlRepair.repair(rawLlmOutput, customerDict, realCols)
      val expected = "SELECT c_custkey, c_mktsegment, c_acctbal FROM customer " +
        "WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey"
      require(repaired == expected,
        s"repair drift: got <$repaired> expected <$expected>")
      s.sql(repaired)
    })
}
