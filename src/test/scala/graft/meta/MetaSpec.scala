package graft.meta

import org.scalatest.funsuite.AnyFunSuite

class MetaSpec extends AnyFunSuite {

  val json =
    """{
      |  "version": "2",
      |  "table": "queuedata",
      |  "notes": "test dictionary",
      |  "columns": [
      |    {"name": "queue", "type": "VARCHAR", "description": "queue name",
      |     "aliases": ["name"], "importance": 10,
      |     "allowed_values": null,
      |     "canonicalization": {"case": null}},
      |    {"name": "status", "type": "VARCHAR",
      |     "allowed_values": ["online", "offline"],
      |     "canonicalization": {"case": "lower",
      |       "map_values": {"ONLINE": "online", "unknown": null}}},
      |    {"name": "corecount", "type": "INTEGER",
      |     "allowed_values": {"range": [1, 256]}},
      |    {"name": "cloud", "type": "VARCHAR",
      |     "allowed_values": {"enumeration": ["EU", "US"]}},
      |    {"name": "fairshare", "type": "VARCHAR",
      |     "allowed_values": {"pattern": "type=.*"}},
      |    {"name": "hc_suite", "type": "JSON",
      |     "allowed_values": {"examples": ["[]"]},
      |     "access": ["json path: get_json_object(hc_suite, '$.x')"]}
      |  ],
      |  "rules": ["rule one"]
      |}""".stripMargin

  test("P6: dictionary decodes every allowed_values shape") {
    val d = DataDictionary.fromJson(json)
    assert(d.version == "2" && d.table == "queuedata")
    assert(d.columns.size == 6 && d.rules == Seq("rule one"))
    assert(d.byName("queue").aliases == Seq("name"))
    assert(d.byName("queue").importance == 10)
    assert(d.byName("status").allowedValues.contains(
      AllowedValues.Literals(Seq("online", "offline"))))
    assert(d.byName("status").canonicalization.caseRule.contains("lower"))
    assert(d.byName("status").canonicalization.mapValues ==
      Seq("ONLINE" -> Some("online"), "unknown" -> None))
    assert(d.byName("corecount").allowedValues.contains(
      AllowedValues.Range(1, 256)))
    assert(d.byName("cloud").allowedValues.contains(
      AllowedValues.Enumeration(Seq("EU", "US"))))
    assert(d.byName("fairshare").allowedValues.contains(
      AllowedValues.Pattern("type=.*")))
    assert(d.byName("hc_suite").allowedValues.contains(
      AllowedValues.Examples(Seq("[]"))))
    assert(d.byName("hc_suite").accessHints.nonEmpty)
  }

  test("P6: toJson -> fromJson round-trips the model") {
    val d = DataDictionary.fromJson(json)
    val d2 = DataDictionary.fromJson(DataDictionary.toJson(d))
    assert(d2 == d.copy()) // full structural equality
  }

  test("P19: skeleton access hints fire on json-ish, struct, map, array") {
    import org.apache.spark.sql.types._
    assert(SkeletonGen.accessHintsFor("copytools", StringType)
      .exists(_.contains("get_json_object")))
    assert(SkeletonGen.accessHintsFor("plain", StringType).isEmpty)
    assert(SkeletonGen.accessHintsFor("s",
      StructType(Seq(StructField("f", IntegerType))))
      .exists(_.contains("struct field")))
    assert(SkeletonGen.accessHintsFor("m",
      MapType(StringType, StringType)).exists(_.contains("map key")))
    assert(SkeletonGen.accessHintsFor("a",
      ArrayType(FloatType)).exists(_.contains("element_at")))
  }
}
