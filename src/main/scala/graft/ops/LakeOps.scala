package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-lake maintenance operators: MERGE/upsert semantics expressed as a
  * full-outer join (the engine-neutral form of `MERGE INTO`), snapshot
  * diffing (the CDC primitive between two table versions), and the
  * positional-generator surface (posexplode). These are the table-
  * maintenance passes that keep a 100 TB corpus updatable without
  * rewriting it wholesale.
  */
object LakeOps {

  /** Morton (Z-order) interleave of two 8-bit keys, written with only
    * `%` / comparison / addition so the same text is valid Spark SQL and
    * DuckDB SQL (no dialect-specific bit operators).
    */
  private def mortonSql(x: String, y: String): String =
    (0 until 8).map { i =>
      val lo = 1L << i; val hi = 1L << (i + 1)
      val bx = 1L << (2 * i); val by = 1L << (2 * i + 1)
      s"(CASE WHEN $x % $hi >= $lo THEN $bx ELSE 0 END + " +
        s"CASE WHEN $y % $hi >= $lo THEN $by ELSE 0 END)"
    }.mkString(" + ")

  val queries: Seq[Q] = Seq(
    // MERGE/upsert: target ∪ source with source-wins conflict resolution,
    // expressed as one full-outer join on the key — the shape MERGE INTO
    // compiles to on any engine. At 100 TB the target is bucketed on the
    // key so only the (small) source shuffles; matched/inserted/unchanged
    // row classes come out of the same join, no second pass. Money sums go
    // through DECIMAL so partial-agg order can't perturb the total.
    Q(
      "q135_upsert_merge",
      """WITH t AS (
        |  SELECT c_custkey AS k, c_acctbal AS v
        |  FROM customer WHERE c_custkey <= 1400),
        |s AS (
        |  SELECT c_custkey AS k, ROUND(c_acctbal + 100, 2) AS v
        |  FROM customer WHERE c_custkey > 1300),
        |m AS (
        |  SELECT COALESCE(s.k, t.k) AS k, COALESCE(s.v, t.v) AS v,
        |    CASE WHEN s.k IS NOT NULL AND t.k IS NOT NULL THEN 'updated'
        |         WHEN s.k IS NOT NULL THEN 'inserted'
        |         ELSE 'unchanged' END AS action
        |  FROM t FULL OUTER JOIN s ON t.k = s.k)
        |SELECT action, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total_v
        |FROM m GROUP BY action
        |ORDER BY action""".stripMargin) { (s, dir) =>
      val cust = Tables.table(s, dir, "customer")
      val t = cust.filter(col("c_custkey") <= 1400)
        .select(col("c_custkey").as("tk"), col("c_acctbal").as("tv"))
      val src = cust.filter(col("c_custkey") > 1300)
        .select(col("c_custkey").as("sk"),
          round(col("c_acctbal") + 100, 2).as("sv"))
      t.join(src, col("tk") === col("sk"), "full_outer")
        .select(
          coalesce(col("sv"), col("tv")).as("v"),
          when(col("sk").isNotNull && col("tk").isNotNull, "updated")
            .when(col("sk").isNotNull, "inserted")
            .otherwise("unchanged").as("action"))
        .groupBy(col("action"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(18,2)")).cast("double").as("total_v"))
        .orderBy(col("action"))
    },

    // Snapshot diff: the CDC primitive — classify every key across two
    // table versions as added / removed / changed / same with ONE
    // full-outer join on the key. At 100 TB both snapshots are bucketed
    // on the key → zero-shuffle sort-merge; the diff is what an
    // incremental downstream consumes instead of the full snapshot.
    Q(
      "q136_snapshot_diff",
      """WITH v1 AS (
        |  SELECT o_orderkey AS k, o_totalprice AS p
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |v2 AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 3 = 0 THEN ROUND(o_totalprice * 1.1, 2)
        |         ELSE o_totalprice END AS p
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |d AS (
        |  SELECT CASE WHEN v1.k IS NULL THEN 'added'
        |              WHEN v2.k IS NULL THEN 'removed'
        |              WHEN v1.p <> v2.p THEN 'changed'
        |              ELSE 'same' END AS change
        |  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
        |SELECT change, CAST(COUNT(*) AS BIGINT) AS n
        |FROM d GROUP BY change
        |ORDER BY change""".stripMargin) { (s, dir) =>
      val o = Tables.table(s, dir, "orders")
      val v1 = o.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey").as("k1"), col("o_totalprice").as("p1"))
      val v2 = o.filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey").as("k2"),
          when(col("o_orderkey") % 3 === 0,
            round(col("o_totalprice") * 1.1, 2))
            .otherwise(col("o_totalprice")).as("p2"))
      v1.join(v2, col("k1") === col("k2"), "full_outer")
        .select(
          when(col("k1").isNull, "added")
            .when(col("k2").isNull, "removed")
            .when(col("p1") =!= col("p2"), "changed")
            .otherwise("same").as("change"))
        .groupBy(col("change"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("change"))
    },

    // SCD Type-2 dimension build: turn a change stream (each user's
    // click events carrying a value) into versioned dimension rows with
    // [valid_from, valid_to) ranges and a current flag — one lead()
    // window per key, no self-join. At 100 TB this is the incremental
    // dimension-maintenance pass: partition by key, order by event time,
    // ties broken by event_id so versioning is deterministic.
    Q(
      "q152_scd2_versions",
      """WITH ch AS (
        |  SELECT user_id, ts, event_id, ROUND(value, 6) AS v
        |  FROM events
        |  WHERE event_type = 'click' AND user_id < 10),
        |ver AS (
        |  SELECT user_id, v, ts AS valid_from, event_id,
        |    LEAD(ts) OVER (PARTITION BY user_id
        |                   ORDER BY ts, event_id) AS valid_to
        |  FROM ch)
        |SELECT user_id,
        |  ROW_NUMBER() OVER (PARTITION BY user_id
        |                     ORDER BY valid_from, event_id) AS version,
        |  v, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM ver
        |ORDER BY user_id, version""".stripMargin) { (s, dir) =>
      val ch = Tables.table(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 10)
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value"), 6).as("v"))
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ch.withColumn("valid_to", lead(col("ts"), 1).over(wOrd))
        .withColumn("version", row_number().over(wOrd))
        .select(col("user_id"), col("version"), col("v"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy(col("user_id"), col("version"))
    },

    // Conversion funnel: of the users who clicked, how many purchased
    // within 30 minutes of their FIRST click — the attribution rollup
    // (q115/q142's join, aggregated to rates). Two partial-agg group-bys
    // + one equi-join on user_id; no row-level fan-out survives to the
    // output.
    Q(
      "q153_conversion_funnel",
      """WITH fc AS (
        |  SELECT user_id, MIN(ts) AS first_click
        |  FROM events WHERE event_type = 'click' GROUP BY user_id),
        |conv AS (
        |  SELECT fc.user_id,
        |    MAX(CASE WHEN e.ts >= fc.first_click
        |             AND e.ts <= fc.first_click + INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END) AS converted
        |  FROM fc LEFT JOIN events e
        |    ON e.user_id = fc.user_id AND e.event_type = 'purchase'
        |  GROUP BY fc.user_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_clickers,
        |  CAST(SUM(converted) AS BIGINT) AS n_converted,
        |  ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6)
        |    AS conversion_rate
        |FROM conv""".stripMargin) { (s, dir) =>
      val ev = Tables.table(s, dir, "events")
      val fc = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("p_ts"))
      val conv = fc.join(p, col("user_id") === col("pu"), "left")
        .groupBy(col("user_id"))
        .agg(max(when(col("p_ts") >= col("first_click") &&
          col("p_ts") <= col("first_click") + expr("INTERVAL 30 MINUTE"),
          1).otherwise(0)).as("converted"))
      conv.agg(count(lit(1)).as("n_clickers"),
        sum(col("converted")).as("n_converted"),
        round(sum(col("converted")).cast("double") / count(lit(1)), 6)
          .as("conversion_rate"))
    },

    // Z-order layout quality: bucket lineitem 16 ways by the Morton
    // interleave of (l_partkey%256, l_suppkey%256) vs 16 ways by natural
    // l_orderkey ranges, and report each bucket's (x, y) bounding box.
    // Z-order buckets cover ~1/16 of the key plane each (bbox_area ~4k);
    // natural buckets span the whole plane (~65k) — exactly why a
    // Z-ordered table prunes file-level min/max stats on BOTH join keys
    // while a naturally-ordered one prunes neither. This is the layout
    // pass a 100 TB table gets before heavy multi-key scan workloads;
    // clustering = sort by the morton key, stats come free at write time.
    Q(
      "q155_zorder_layout", {
        val m = mortonSql("x", "y")
        s"""WITH base AS (
           |  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y, l_orderkey
           |  FROM lineitem),
           |mx AS (SELECT MAX(l_orderkey) AS maxk FROM base),
           |z AS (
           |  SELECT 'zorder' AS layout,
           |    CAST(FLOOR(CAST($m AS DOUBLE) / 4096) AS INT) AS bucket, x, y
           |  FROM base),
           |nat AS (
           |  SELECT 'natural' AS layout,
           |    CAST(FLOOR(CAST(l_orderkey AS DOUBLE) * 16 / (maxk + 1))
           |      AS INT) AS bucket, x, y
           |  FROM base CROSS JOIN mx),
           |u AS (SELECT * FROM z UNION ALL SELECT * FROM nat)
           |SELECT layout, bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  MIN(x) AS x_min, MAX(x) AS x_max,
           |  MIN(y) AS y_min, MAX(y) AS y_max,
           |  CAST((MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS BIGINT)
           |    AS bbox_area
           |FROM u GROUP BY layout, bucket
           |ORDER BY layout, bucket""".stripMargin
      }) { (s, dir) =>
      val base = Tables.table(s, dir, "lineitem")
        .select((col("l_partkey") % 256).as("x"),
          (col("l_suppkey") % 256).as("y"), col("l_orderkey"))
      val mx = base.agg(max(col("l_orderkey")).as("maxk"))
      val z = base.select(lit("zorder").as("layout"),
        expr(s"CAST(FLOOR(CAST(${mortonSql("x", "y")} AS DOUBLE) / 4096) " +
          "AS INT)").as("bucket"),
        col("x"), col("y"))
      val nat = base.crossJoin(broadcast(mx)).select(
        lit("natural").as("layout"),
        expr("CAST(FLOOR(CAST(l_orderkey AS DOUBLE) * 16 / (maxk + 1)) " +
          "AS INT)").as("bucket"),
        col("x"), col("y"))
      z.union(nat)
        .groupBy(col("layout"), col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"),
          ((max(col("x")) - min(col("x")) + 1) *
            (max(col("y")) - min(col("y")) + 1)).cast("long").as("bbox_area"))
        .orderBy(col("layout"), col("bucket"))
    },

    // Incremental aggregate maintenance (materialized-view algebra): the
    // already-materialized 90% of events and the 10% delta are aggregated
    // SEPARATELY to partials (n, DECIMAL sum), then merged by summing the
    // partials — never re-reading the base data. DECIMAL partials make
    // merge(base, delta) == full recompute EXACTLY, which is the whole
    // contract of incremental view maintenance; the oracle IS the full
    // recompute. At 100 TB this is the difference between touching the
    // delta and touching the lake.
    Q(
      "q162_incremental_agg",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables.table(s, dir, "events")
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("pn"),
            sum(col("value").cast("decimal(18,6)")).as("pv"))
      val base = partial(ev.filter(col("event_id") % 10 =!= 0))
      val delta = partial(ev.filter(col("event_id") % 10 === 0))
      base.union(delta)
        .groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n"),
          sum(col("pv")).cast("double").as("total_value"))
        .orderBy(col("event_type"))
    },

    // Positional generator surface: posexplode — the (pos, value) form
    // every token-position feature (positional n-grams, truncation,
    // attention-window slicing) builds on. Generate doesn't collapse into
    // its child, so the token array below it is computed once per row.
    Q(
      "q137_posexplode",
      """SELECT doc_id, u.i - 1 AS pos, string_split(text, ' ')[u.i] AS tok
        |FROM documents, LATERAL (
        |  SELECT unnest(generate_series(1,
        |    len(string_split(text, ' ')))) AS i) u
        |WHERE doc_id < 3 AND u.i <= 10
        |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "documents")
        .filter(col("doc_id") < 3)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
        .filter(col("pos") < 10)
        .orderBy(col("doc_id"), col("pos"))
    })
}
