package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{ArrayDot, WeightedAvg}

/** UDF/UDAF/custom-Expression surface (SURVEY.md §2.3 E13 + §4.3):
  * a typed Aggregator registered for SQL, and the native codegen
  * `array_dot` Catalyst expression powering similarity search.
  */
object Extensibility {

  val queries: Seq[Q] = Seq(
    // E13: exact weighted average via typed Aggregator (integer-cents
    // buffer → order-independent partial merges).
    Q(
      "q58_udaf_weighted_avg",
      """SELECT l_returnflag,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE), 6)
        |    AS weighted_avg_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      WeightedAvg.register(s)
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag,
          |  wavg(l_extendedprice, l_quantity) AS weighted_avg_price
          |FROM lineitem
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },

    // §4.3 stretch: q50's top-k cosine, but through the native codegen
    // ArrayDot expression — same fold semantics, no HOF lambda overhead.
    Q(
      "q59_custom_expr_dot",
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  ROUND(list_reduce(list_transform(range(len(e.embedding)),
        |    i -> CAST(e.embedding[i+1] AS DOUBLE)
        |       * CAST(q.qe[i+1] AS DOUBLE)), (x, y) -> x + y), 6) AS cosine
        |FROM embeddings e, q
        |WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, vec_id ASC
        |LIMIT 10""".stripMargin) { (s, dir) =>
      ArrayDot.register(s)
      val e = Tables.table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(expr("array_dot(embedding, qe)"), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(10)
    })
}
