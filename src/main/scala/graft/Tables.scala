package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata catalog: one parquet file per table under a scale-factor dir
  * (TESTDATA.md). Mirrors the reference's "open a read-only database and
  * address tables by name" model (query_llm.py:441-455) with the Spark
  * session catalog as the database.
  *
  * Views are registered once per (session, dir): at 100 TB each view is a
  * partitioned parquet dataset and re-resolving footers per query would be
  * pure overhead.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // session -> currently-registered dir. Temp views are session-GLOBAL,
  // so a plain (session, dir) seen-set would skip re-registration after
  // another dir re-pointed the views and silently serve the wrong data;
  // tracking the current dir re-registers on change. Weak identity keys
  // (SparkSession doesn't override equals) rather than identityHashCode:
  // identity hashes are not unique, so two live sessions — or a GC'd one
  // reincarnated at the same hash — could collide and skip registration.
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    readNormalized(spark, s"$dir/$name.parquet")

  /** Read a parquet path, tolerating TIMESTAMP(NANOS) columns Spark cannot
    * represent: `ts` nanos are read as long and floor-divided to
    * microseconds — exactly the ns→µs truncation DuckDB applies, so the
    * oracle agrees.
    */
  def readNormalized(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path)
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        // integer div, not double div: 2024 epoch-nanos exceed 2^53
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }

  /** Register all testdata tables as temp views (idempotent per session
    * while the dir is unchanged; re-points every view when a different dir
    * is requested).
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    if (registered.get(spark) != dir) {
      names.foreach { n =>
        load(spark, dir, n).createOrReplaceTempView(n)
      }
      registered.put(spark, dir) // only after full success
    }
  }

  /** Load + register one table and return it. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    registerAll(spark, dir)
    spark.table(name)
  }
}
