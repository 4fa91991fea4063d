package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral / graph analytics over the event stream and the order graph:
  * gap-based sessionization (the batch twin of q117's streaming session
  * windows) and degree-ordered triangle counting (the co-occurrence-graph
  * primitive behind "users who bought X also bought Y" and community
  * detection).
  *
  * Scale shape: sessionization is one window pass partitioned by the
  * session key — no self-join, state bounded per user. Triangle counting
  * orients every edge from its (degree, id)-smaller endpoint to the larger
  * one, so each wedge is enumerated exactly once at its lowest-degree
  * vertex: intermediate size drops from sum(deg^2) (hub-quadratic) to
  * O(m^1.5), which is the difference between finishing and dying on a
  * power-law co-occurrence graph at 100 TB.
  */
object BehaviorOps {

  val queries: Seq[Q] = Seq(
    // Gap-based sessionization: a new session starts when a user's gap
    // since their previous event exceeds 30 minutes. LAG flags the break,
    // a running SUM numbers the sessions, one GROUP BY rolls them up —
    // single shuffle on user_id, state bounded per partition. Ties on ts
    // are broken by event_id so session numbering is deterministic.
    Q(
      "q154_sessionization",
      """WITH e AS (
        |  SELECT user_id, ts, event_id FROM events WHERE user_id < 12),
        |s AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |              OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM s)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  MIN(ts) AS first_ts, MAX(ts) AS last_ts
        |FROM g GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.table(s, dir, "events")
        .filter(col("user_id") < 12)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("new_s",
          when(lag(col("ts"), 1).over(wOrd).isNull ||
            col("ts") > lag(col("ts"), 1).over(wOrd) +
              expr("INTERVAL 30 MINUTE"), 1).otherwise(0))
        .withColumn("session_id", sum(col("new_s")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .orderBy(col("user_id"), col("session_id"))
    },

    // Degree-ordered triangle counting on the part co-purchase graph
    // (edge = two parts co-purchased in >= 2 distinct orders). The
    // support threshold is the a-priori pruning step every co-occurrence
    // graph needs at scale: per-order cliques make the unthresholded
    // graph quasi-regular with ~n*avgdeg^2/2 wedges (35M at sf0.1, 9 s;
    // signal edges only: ~4k, sub-second) — co-occurrence support is
    // computed with one partial-agg GROUP BY before anything quadratic
    // runs. Each surviving edge is then oriented from its (degree, id)-
    // smaller endpoint, so every wedge is enumerated exactly once at its
    // lowest-degree vertex: O(m^1.5) instead of hub-quadratic on
    // power-law graphs. Exact integer counts → hash-stable; the closure
    // rate is the single double division, rounded (NULLIF guards the
    // wedge-free degenerate graph).
    Q(
      "q158_triangle_count",
      """WITH pairs AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY a.l_partkey, b.l_partkey
        |  HAVING COUNT(*) >= 2),
        |deg AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        |  FROM (SELECT u AS node FROM pairs
        |        UNION ALL SELECT v AS node FROM pairs)
        |  GROUP BY node),
        |oriented AS (
        |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
        |              THEN u ELSE v END AS lo,
        |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
        |              THEN v ELSE u END AS hi,
        |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
        |              THEN dv.d ELSE du.d END AS hi_d
        |  FROM pairs
        |  JOIN deg du ON du.node = u
        |  JOIN deg dv ON dv.node = v),
        |wedges AS (
        |  SELECT e1.hi AS b, e1.hi_d AS b_d, e2.hi AS c, e2.hi_d AS c_d
        |  FROM oriented e1 JOIN oriented e2
        |    ON e1.lo = e2.lo
        |   AND (e1.hi_d < e2.hi_d OR (e1.hi_d = e2.hi_d AND e1.hi < e2.hi))),
        |tri AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_tri
        |  FROM wedges w JOIN oriented e ON e.lo = w.b AND e.hi = w.c),
        |stats AS (
        |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_edges,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges) AS n_wedges,
        |         (SELECT n_tri FROM tri) AS n_triangles)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  ROUND(CAST(n_triangles AS DOUBLE) / NULLIF(n_wedges, 0), 6)
        |    AS closure_rate
        |FROM stats""".stripMargin) { (s, dir) =>
      val li = Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val a = li.select(col("l_orderkey"), col("l_partkey").as("u"))
      val b = li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("v"))
      val pairs = a.join(b, col("l_orderkey") === col("ok2") &&
          col("u") < col("v"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select(col("u"), col("v"))
      val deg = pairs.select(col("u").as("node"))
        .union(pairs.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      val lower = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val oriented = pairs
        .join(deg.select(col("node").as("nu"), col("d").as("du")),
          col("nu") === col("u"))
        .join(deg.select(col("node").as("nv"), col("d").as("dv")),
          col("nv") === col("v"))
        .select(
          when(lower, col("u")).otherwise(col("v")).as("lo"),
          when(lower, col("v")).otherwise(col("u")).as("hi"),
          when(lower, col("dv")).otherwise(col("du")).as("hi_d"))
      val e1 = oriented.select(col("lo"), col("hi").as("b"),
        col("hi_d").as("b_d"))
      val e2 = oriented.select(col("lo").as("lo2"), col("hi").as("c"),
        col("hi_d").as("c_d"))
      val wedges = e1.join(e2, col("lo") === col("lo2") &&
          (col("b_d") < col("c_d") ||
            (col("b_d") === col("c_d") && col("b") < col("c"))))
        .select(col("b"), col("c"))
      val closing = oriented.select(col("lo").as("cb"), col("hi").as("cc"))
      val nTri = wedges.join(closing,
        col("cb") === col("b") && col("cc") === col("c"))
        .agg(count(lit(1)).as("n_triangles"))
      val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
      val nEdges = pairs.agg(count(lit(1)).as("n_edges"))
      val nWedges = wedges.agg(count(lit(1)).as("n_wedges"))
      nNodes.crossJoin(nEdges).crossJoin(nWedges).crossJoin(nTri)
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          round(col("n_triangles").cast("double") /
            nullif(col("n_wedges"), lit(0)), 6).as("closure_rate"))
    })
}
