package graft.meta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Dictionary-skeleton generation (SURVEY.md §2.1 P19): introspect a table
  * and emit a starter data dictionary for humans to enrich — default
  * importance 5, canonicalization stub, and auto access hints for
  * JSON-documents-in-strings, STRUCT and MAP columns, mirroring the
  * reference's generator behavior (query_llm.py:164-218) with
  * Spark-flavored hint text (`get_json_object`, dot access, map keys).
  */
object SkeletonGen {

  private[meta] def accessHintsFor(name: String, dt: DataType): Seq[String] = dt match {
    case StringType if name.toLowerCase.matches(".*(json|props|config|tools|storages|suite).*") =>
      Seq(
        s"json path: get_json_object($name, '$$.path.to.field')",
        s"containment: $name LIKE '%needle%'")
    case _: StructType =>
      Seq(s"struct field: $name.fieldname")
    case _: MapType =>
      Seq(s"map key: $name['key']")
    case _: ArrayType =>
      Seq(s"element: element_at($name, 1); explode($name) for rows")
    case _ => Nil
  }

  /** Build a skeleton dictionary from a DataFrame's schema. */
  def skeleton(table: String, df: DataFrame): DataDictionary =
    DataDictionary(
      version = "1",
      table = table,
      notes = s"Auto-generated skeleton for $table; fill in descriptions, " +
        "aliases, importance, allowed_values, canonicalization.",
      columns = df.schema.fields.toSeq.map { f =>
        ColumnMeta(
          name = f.name,
          dataType = f.dataType.sql,
          description = "",
          aliases = Nil,
          importance = 5,
          allowedValues = None,
          canonicalization = Canonicalization(),
          accessHints = accessHintsFor(f.name, f.dataType))
      })

  /** Generate + write to a file, returning the JSON text. */
  def write(table: String, df: DataFrame, path: String): String = {
    val json = DataDictionary.toJson(skeleton(table, df))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
    json
  }
}
