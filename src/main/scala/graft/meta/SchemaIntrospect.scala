package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema introspection + identifier utilities (SURVEY.md §2.1 P1-P5).
  *
  * The reference introspects with `DESCRIBE SELECT * FROM tbl`
  * (query_llm.py:61-65) and renders `"name TYPE, name TYPE"` DDL strings
  * for its prompt (query_llm.py:68-71); here the session catalog plays the
  * database role and `df.schema` is the introspection source.
  */
object SchemaIntrospect {

  /** P1: column (name, type) pairs. Types use Spark SQL DDL spelling. */
  def describeColumns(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => (f.name, f.dataType.sql))

  def describeColumns(spark: SparkSession, table: String): Seq[(String, String)] =
    describeColumns(spark.table(table))

  /** P2: flattened DDL string for prompt templates. */
  def buildTableSchema(df: DataFrame): String =
    describeColumns(df).map { case (n, t) => s"$n $t" }.mkString(", ")

  /** P3: column names only. */
  def listColumns(df: DataFrame): Seq[String] = df.columns.toSeq

  /** P4: case-insensitive table existence probe — the reference checks
    * `information_schema.tables` with a lowercased compare
    * (query_db.py:9-18); Spark's catalog lookup is case-insensitive by
    * default and covers temp views the same way.
    */
  def tableExists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  /** P5: identifier quoting. The reference emits `"name"` with `""`
    * escaping (query_db.py:6-7); Spark SQL's quote character is the
    * backtick with doubling as escape.
    */
  def qident(name: String): String =
    "`" + name.replace("`", "``") + "`"
}
