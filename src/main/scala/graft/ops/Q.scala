package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator-demonstration query.
  *
  * @param name   stable key, becomes the SparkEntry.queries key
  * @param fn     Spark-side implementation; `dir` is the scale-factor dir
  * @param oracle DuckDB-equivalent ANSI SQL over views named like the
  *               testdata tables; None for ops that are not SQL-expressible
  *               (driver then records a weaker rows-only check)
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  require(name.matches("[a-z0-9_]+"), s"query name must be stable key: $name")
}

object Q {
  /** Helper: query with a DuckDB oracle. */
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  /** Helper: rows-only query (no SQL-expressible oracle). */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
