package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** JSON document access (SURVEY.md §2.2 S13 — the reference's dictionary
  * drives `json_extract(col,'$.path')` access, queuedata.schema.json:31-33)
  * plus the temporal surface (§2.3 E10) and time-series joins (E5: range
  * join, as-of join) over the `events` table.
  *
  * As-of is implemented Spark-first as union+window (one shuffle on the
  * partition key, no per-row probing) — the pattern that scales to 100 TB;
  * the DuckDB oracle uses its native ASOF JOIN, proving semantics match.
  */
object JsonTime {

  val queries: Seq[Q] = Seq(
    // S13: JSON scalar extraction + integer aggregation (exact).
    Q(
      "q27_json_extract",
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |       AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast("bigint")
      Tables.table(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(sum(k).as("sum_k"), min(k).as("min_k"), max(k).as("max_k"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // S13: JSON predicate in WHERE — pushable filter over the raw column.
    Q(
      "q28_json_filter",
      """SELECT event_id, event_type, ts,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 95
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast("bigint")
      Tables.table(s, dir, "events")
        .filter(k > 95)
        .select(col("event_id"), col("event_type"), col("ts"), k.as("k"))
        .orderBy(col("event_id"))
    },

    // E10: date_trunc rollups (day + week level).
    Q(
      "q29_date_trunc",
      """SELECT date_trunc('day', ts) AS day, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY date_trunc('day', ts)
        |ORDER BY day""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("day"))
    },

    // E10: tumbling 10-minute buckets — Spark's `window()` vs DuckDB's
    // time_bucket. The struct's start field is the bucket key.
    Q(
      "q30_time_bucket",
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket_start,
        |  event_type, COUNT(*) AS n
        |FROM events
        |WHERE event_type IN ('click', 'purchase')
        |GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("bucket_start"), col("event_type"), col("n"))
        .orderBy(col("bucket_start"), col("event_type"))
    },

    // E5 range join: for each purchase, clicks by the same user in the
    // preceding hour. Equi key (user_id) carries the shuffle; the range
    // predicate filters within the hash bucket — scales as a normal
    // shuffle join, no broadcast-nested-loop.
    Q(
      "q31_range_join",
      """SELECT p.event_id, COUNT(c.user_id) AS n_recent_clicks
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, ts FROM events
        |           WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts > p.ts - INTERVAL 1 HOUR
        | AND c.ts <= p.ts
        |GROUP BY p.event_id
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.table(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      p.join(c,
          col("p_user") === col("c_user") &&
            col("c_ts") > col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"),
          "left_outer")
        .groupBy(col("event_id"))
        .agg(count(col("c_user")).as("n_recent_clicks"))
        .orderBy(col("event_id"))
    },

    // E5 as-of join: each purchase gets the user's latest prior (or
    // simultaneous) click value. Spark side: union + last(ignoreNulls)
    // window — one shuffle on user_id, linear scan per partition, the
    // 100 TB-safe as-of pattern. Clicks are deduped to one per (user, ts)
    // (max event_id wins) so both engines resolve ties identically.
    Q(
      "q32_asof_join",
      """WITH clicks AS (
        |  SELECT user_id, ts, value FROM (
        |    SELECT user_id, ts, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |                         ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'click')
        |  WHERE rn = 1),
        |purch AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  ROUND(c.value, 6) AS last_click_value
        |FROM purch p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.table(s, dir, "events")
      val dedupW = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("rn", row_number().over(dedupW))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts"),
          col("value").as("click_value"),
          lit(0).as("kind"), lit(null).cast("bigint").as("event_id"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          lit(null).cast("double").as("click_value"),
          lit(1).as("kind"), col("event_id"))
      // at equal ts the click (kind 0) sorts before the purchase, matching
      // ASOF's p.ts >= c.ts inclusivity
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("kind").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purch)
        .withColumn("last_click_value",
          round(last(col("click_value"), ignoreNulls = true).over(w), 6))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("last_click_value"))
        .orderBy(col("event_id"))
    },

    // E10: interval arithmetic inside a join predicate.
    Q(
      "q33_interval_arith",
      """SELECT l_returnflag, COUNT(*) AS n_shipped_30d
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        | AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val l = Tables.table(s, dir, "lineitem")
      val o = Tables.table(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 30 DAY"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_shipped_30d"))
        .orderBy(col("l_returnflag"))
    },

    // E10: EXTRACT field access (year/month/day as BIGINT in both).
    Q(
      "q34_extract_fields",
      """SELECT EXTRACT(year FROM o_orderdate) AS y,
        |  EXTRACT(month FROM o_orderdate) AS m,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY y, m""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("bigint").as("y"),
          month(col("o_orderdate")).cast("bigint").as("m"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("y"), col("m"))
    })
}
