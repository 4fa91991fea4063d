package graft.ops

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Structured Streaming surface (SURVEY.md §2.3 E12): tumbling windows
  * with watermarks, session windows, and stateful streaming dedup, driven
  * by replaying the events parquet as a file stream.
  *
  * Each query runs a real streaming query to a memory sink synchronously
  * (`processAllAvailable`) and returns the sink table — so the driver's
  * batch-shaped Verify harness can hash it against a DuckDB batch oracle.
  * Watermark-0 append mode emits exactly the windows whose end has been
  * passed by the max event time; the oracle filters identically.
  *
  * Scale: windowed aggregation state is per (window, key) and evicted at
  * the watermark — bounded memory regardless of stream length; session
  * windows merge in-state; dedup state holds one entry per key within the
  * watermark horizon.
  */
object StreamOps {

  private val sinkId = new AtomicInteger(0)

  /** Streaming source over the events parquet with the same ns→µs
    * normalization as Tables.load (file streams need an explicit schema).
    */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val target = java.nio.file.Paths.get(path)
    // The file-stream source requires a DIRECTORY of data files. A
    // Spark-written dataset (e.g. the ScaleGen slope-measurement dirs) IS
    // one — stream it directly; the source does not recurse through a
    // symlinked subdirectory, so routing a dataset dir through the scratch
    // symlink below would silently stream ZERO files. The driver's dirs
    // ship events.parquet as a single FILE — expose that one through a
    // symlink in a scratch dir.
    val sourceDir =
      if (java.nio.file.Files.isDirectory(target)) path
      else {
        val streamDir = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"),
          s"graft_stream_src_${graft.ops.VecIndex.dirDigest(dir)}")
        java.nio.file.Files.createDirectories(streamDir)
        val link = streamDir.resolve("events.parquet")
        // NOFOLLOW: a broken symlink (testdata dir moved/recreated) reports
        // !exists under the default follow semantics, and createSymbolicLink
        // would then throw FileAlreadyExists. Also re-point a stale link
        // whose target differs (scratch dirs persist across runs and
        // hashCode keys can collide).
        if (java.nio.file.Files.exists(link,
            java.nio.file.LinkOption.NOFOLLOW_LINKS) &&
          (!java.nio.file.Files.isSymbolicLink(link) ||
            java.nio.file.Files.readSymbolicLink(link) != target))
          java.nio.file.Files.delete(link)
        if (!java.nio.file.Files.exists(link,
            java.nio.file.LinkOption.NOFOLLOW_LINKS))
          java.nio.file.Files.createSymbolicLink(link, target)
        streamDir.toString
      }
    val raw = spark.read.parquet(path).schema
    val st = spark.readStream.schema(raw).parquet(sourceDir)
    raw("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        st.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // µs-NTZ layout: watermarks reject TIMESTAMP_NTZ; UTC session tz
        // is pinned, so the cast re-labels the same micros value exactly
        st.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => st
    }
  }

  /** Shared with FinalOps.q91 (custom-state streaming). */
  private[ops] def eventsStreamFor(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)

  private[ops] def runToMemoryFor(
      spark: SparkSession, df: DataFrame, mode: String): DataFrame =
    runToMemory(spark, df, mode)

  /** Scope spark.sql.shuffle.partitions to the streaming state volume
    * for the duration of `body` (stream construction AND start — the
    * partitioning binds when the streaming frame is built, not at
    * start()). Every state store pays a per-batch commit per partition,
    * so sizing it to the keyed-state volume instead of the batch session
    * default is the state-store sizing knob at cluster scale too.
    */
  private[ops] def withStateParts[T](
      spark: SparkSession, n: Int)(body: => T): T = {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  /** Run a streaming DF to a memory sink until drained; return the sink. */
  private def runToMemory(
      spark: SparkSession, df: DataFrame, mode: String): DataFrame = {
    val name = s"graft_stream_${sinkId.incrementAndGet()}"
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  val queries: Seq[Q] = Seq(
    // E12: tumbling 1-hour windows + watermark, append mode. Only windows
    // fully passed by the watermark (max event time, delay 0) are emitted;
    // the oracle applies the same cutoff.
    Q(
      "q55_stream_tumbling",
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events
        |WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
        |      <= (SELECT MAX(ts) FROM events)
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      withStateParts(s, 8) {
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
      runToMemory(s, agg, "append")
        .orderBy(col("window_start"), col("event_type"))
      }
    },

    // E12: session windows (6-hour inactivity gap) per user — batch-mode
    // session_window vs DuckDB gaps-and-islands. Spark's session end is
    // last-event + gap; the oracle reproduces that.
    Q(
      "q56_session_window",
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w > INTERVAL '6 hours'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WHERE user_id < 20
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL '6 hours' AS session_end, COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "events")
        .filter(col("user_id") < 20)
        .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // E12: stateful streaming dedup — first occurrence per
    // (user_id, event_type) within the watermark horizon. Projecting only
    // the key makes the emitted set deterministic: exactly DISTINCT keys.
    Q(
      "q57_stream_dedup",
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      withStateParts(s, 8) {
      val dedup = eventsStream(s, dir)
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
      runToMemory(s, dedup, "append")
        .orderBy(col("user_id"), col("event_type"))
      }
    })
}
