package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Nested-type surface: array lambdas (SURVEY.md §2.3 E11), explode/unnest,
  * STRUCT/MAP field access (§2.2 S14 — the reference's skeleton generator
  * anticipates `col.field` and `col['key']`, query_llm.py:182-186),
  * parameterized SQL (S15), and schema introspection as a query (S16/S17).
  */
object Nested {

  val queries: Seq[Q] = Seq(
    // E11: array higher-order functions. The fold is sequential in both
    // engines (left-to-right over the list) so double math is identical.
    Q(
      "q35_array_lambda",
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  ROUND(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
        |  ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
        |  len(list_filter(embedding, x -> x > 0)) AS n_positive
        |FROM embeddings
        |WHERE vec_id < 50
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "embeddings")
        .filter(col("vec_id") < 50)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double")), 6)
            .as("sq_norm"),
          round(element_at(col("embedding"), 1).cast("double"), 6)
            .as("first_val"),
          size(filter(col("embedding"), _ > 0)).as("n_positive"))
        .orderBy(col("vec_id"))
    },

    // E11: posexplode / UNNEST with position (0-based in both).
    Q(
      "q36_explode",
      """SELECT vec_id,
        |  generate_subscripts(embedding, 1) - 1 AS pos,
        |  ROUND(CAST(unnest(embedding) AS DOUBLE), 6) AS val
        |FROM embeddings
        |WHERE vec_id < 3
        |ORDER BY vec_id, pos""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "embeddings")
        .filter(col("vec_id") < 3)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("vec_id"), col("pos"),
          round(col("v").cast("double"), 6).as("val"))
        .orderBy(col("vec_id"), col("pos"))
    },

    // S14: STRUCT construction + dot access, MAP construction + key access.
    // DuckDB map extraction yields a single-element list, hence [1].
    Q(
      "q37_struct_map",
      """SELECT c_custkey,
        |  struct_pack(nm := c_name, bal := c_acctbal).nm AS cust_name,
        |  MAP{'seg': c_mktsegment}['seg'][1] AS segment
        |FROM customer
        |WHERE c_custkey <= 50
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "customer")
        .filter(col("c_custkey") <= 50)
        .select(
          col("c_custkey"),
          struct(col("c_name").as("nm"), col("c_acctbal").as("bal"))
            .getField("nm").as("cust_name"),
          map(lit("seg"), col("c_mktsegment"))(lit("seg")).as("segment"))
        .orderBy(col("c_custkey"))
    },

    // S15: parameterized SQL — the reference binds `?` params
    // (query_db.py:11-17); Spark ≥3.5 supports named parameter markers.
    Q(
      "q38_parameterized_sql",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 400000.0 AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > :minPrice AND o_orderstatus = :status
          |ORDER BY o_orderkey""".stripMargin,
        Map("minPrice" -> 400000.0, "status" -> "O"))
    },

    // S16/S17: schema introspection surfaced as a relational result —
    // `DESCRIBE SELECT *` is how the reference reads schemas
    // (describe_table.py:36); both engines list the same column names.
    Q(
      "q39_introspect_columns",
      """SELECT column_name FROM information_schema.columns
        |WHERE table_name = 'lineitem'
        |ORDER BY column_name""".stripMargin) { (s, dir) =>
      import s.implicits._
      val cols = Tables.table(s, dir, "lineitem").schema.fieldNames.toSeq
      cols.toDF("column_name").orderBy(col("column_name"))
    })
}
