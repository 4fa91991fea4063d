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
      // the stats branches below (nodes/edges/wedges/triangles) each walk
      // the full lineage; eager-checkpoint the ~4k-row thresholded edge
      // list so the lineitem self-join + support GROUP BY runs ONCE
      val pairs = a.join(b, col("l_orderkey") === col("ok2") &&
          col("u") < col("v"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select(col("u"), col("v"))
        .localCheckpoint(true)
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
      nNodes.crossJoin(broadcast(nEdges)).crossJoin(broadcast(nWedges))
        .crossJoin(broadcast(nTri))
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          round(col("n_triangles").cast("double") /
            nullif(col("n_wedges"), lit(0)), 6).as("closure_rate"))
    },

    // Association rules over the same co-purchase baskets: for every
    // directed pair with co-occurrence support >= 2, confidence =
    // c(x,y)/c(x) and lift = c(x,y)*N / (c(x)*c(y)); top-10 by lift.
    // Counts are exact BIGINTs (products stay far under 2^53), each
    // ratio is a single double division — deterministic without DECIMAL.
    // Scale shape: the classic a-priori cascade — item counts and pair
    // counts are two partial-agg GROUP BYs, the rule join broadcasts the
    // (tiny) item-count table; nothing ever materializes the unsupported
    // pair space.
    Q(
      "q160_association_rules",
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
        |  FROM lineitem),
        |n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders
        |      FROM baskets),
        |items AS (
        |  SELECT item, CAST(COUNT(*) AS BIGINT) AS ci
        |  FROM baskets GROUP BY item),
        |pairs AS (
        |  SELECT a.item AS x, b.item AS y, CAST(COUNT(*) AS BIGINT) AS cxy
        |  FROM baskets a JOIN baskets b
        |    ON a.ok = b.ok AND a.item < b.item
        |  GROUP BY a.item, b.item
        |  HAVING COUNT(*) >= 2),
        |rules AS (
        |  SELECT x AS antecedent, y AS consequent, cxy FROM pairs
        |  UNION ALL
        |  SELECT y AS antecedent, x AS consequent, cxy FROM pairs)
        |SELECT r.antecedent, r.consequent, r.cxy AS support,
        |  ROUND(CAST(r.cxy AS DOUBLE) / ia.ci, 6) AS confidence,
        |  ROUND(CAST(r.cxy * n.n_orders AS DOUBLE) / (ia.ci * ic.ci), 6)
        |    AS lift
        |FROM rules r
        |JOIN items ia ON ia.item = r.antecedent
        |JOIN items ic ON ic.item = r.consequent
        |CROSS JOIN n
        |ORDER BY lift DESC, antecedent, consequent
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val baskets = Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
        .distinct()
      val n = baskets.agg(count_distinct(col("ok")).as("n_orders"))
      val items = baskets.groupBy(col("item")).agg(count(lit(1)).as("ci"))
      val b2 = baskets.select(col("ok").as("ok2"), col("item").as("item2"))
      val pairs = baskets.join(b2,
          col("ok") === col("ok2") && col("item") < col("item2"))
        .groupBy(col("item").as("x"), col("item2").as("y"))
        .agg(count(lit(1)).as("cxy"))
        .filter(col("cxy") >= 2)
      val rules = pairs.select(col("x").as("antecedent"),
          col("y").as("consequent"), col("cxy"))
        .union(pairs.select(col("y").as("antecedent"),
          col("x").as("consequent"), col("cxy")))
      rules
        .join(broadcast(items.select(col("item").as("ia"), col("ci").as("ca"))),
          col("ia") === col("antecedent"))
        .join(broadcast(items.select(col("item").as("ic"), col("ci").as("cc"))),
          col("ic") === col("consequent"))
        .crossJoin(broadcast(n))
        .select(col("antecedent"), col("consequent"),
          col("cxy").as("support"),
          round(col("cxy").cast("double") / col("ca"), 6).as("confidence"),
          round((col("cxy") * col("n_orders")).cast("double") /
            (col("ca") * col("cc")), 6).as("lift"))
        .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
        .limit(10)
    },

    // First-order Markov transition matrix over each user's event-type
    // sequence: LAG gives the previous type (one window pass on the
    // user_id shuffle), exact transition counts, and the row-normalized
    // probability is count / window-SUM of counts — an integer-exact
    // numerator and denominator, one rounded division.
    Q(
      "q161_event_transitions",
      """WITH seq AS (
        |  SELECT event_type AS next_t,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev_t
        |  FROM events),
        |c AS (
        |  SELECT prev_t, next_t, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM seq WHERE prev_t IS NOT NULL
        |  GROUP BY prev_t, next_t)
        |SELECT prev_t, next_t, n,
        |  ROUND(CAST(n AS DOUBLE) /
        |    SUM(n) OVER (PARTITION BY prev_t), 6) AS p
        |FROM c
        |ORDER BY prev_t, next_t""".stripMargin) { (s, dir) =>
      val wSeq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRow = Window.partitionBy(col("prev_t"))
      Tables.table(s, dir, "events")
        .select(col("event_type").as("next_t"),
          lag(col("event_type"), 1).over(wSeq).as("prev_t"))
        .filter(col("prev_t").isNotNull)
        .groupBy(col("prev_t"), col("next_t"))
        .agg(count(lit(1)).as("n"))
        .select(col("prev_t"), col("next_t"), col("n"),
          round(col("n").cast("double") / sum(col("n")).over(wRow), 6)
            .as("p"))
        .orderBy(col("prev_t"), col("next_t"))
    },

    // Chi-square independence test on the event_type × hour-of-day
    // contingency table: observed counts are one partial-agg GROUP BY;
    // row/column totals re-aggregate those cells (never the raw events);
    // expected = r*c/N with exact BIGINT products. Per-cell contributions
    // are rounded then summed as DECIMAL — the usual defense against
    // partial-agg double ordering. Everything after the first GROUP BY is
    // O(cells), not O(rows).
    Q(
      "q166_chi_square",
      """WITH cells AS (
        |  SELECT event_type AS et, hour(ts) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS obs
        |  FROM events GROUP BY event_type, hour(ts)),
        |rt AS (SELECT et, CAST(SUM(obs) AS BIGINT) AS r
        |       FROM cells GROUP BY et),
        |ct AS (SELECT h, CAST(SUM(obs) AS BIGINT) AS c
        |       FROM cells GROUP BY h),
        |n AS (SELECT CAST(SUM(obs) AS BIGINT) AS nn FROM cells),
        |contrib AS (
        |  SELECT (obs - CAST(r * c AS DOUBLE) / nn) AS d,
        |    CAST(r * c AS DOUBLE) / nn AS e
        |  FROM cells JOIN rt USING (et) JOIN ct USING (h) CROSS JOIN n),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
        |    CAST(SUM(CAST(ROUND(d * d / e, 6) AS DECIMAL(18,6)))
        |      AS DOUBLE) AS chi2
        |  FROM contrib)
        |SELECT n_cells,
        |  (SELECT CAST((COUNT(*) - 1) AS BIGINT) FROM rt) *
        |  (SELECT CAST((COUNT(*) - 1) AS BIGINT) FROM ct) AS dof,
        |  chi2
        |FROM agg""".stripMargin) { (s, dir) =>
      val cells = Tables.table(s, dir, "events")
        .groupBy(col("event_type").as("et"), hour(col("ts")).as("h"))
        .agg(count(lit(1)).as("obs"))
      val rt = cells.groupBy(col("et")).agg(sum(col("obs")).as("r"))
      val ct = cells.groupBy(col("h").as("h2")).agg(sum(col("obs")).as("c"))
      val n = cells.agg(sum(col("obs")).as("nn"))
      val e = (col("r") * col("c")).cast("double") / col("nn")
      val d = col("obs") - e
      val agg = cells
        .join(broadcast(rt), Seq("et"))
        .join(broadcast(ct), col("h2") === col("h"))
        .crossJoin(broadcast(n))
        .select(round(d * d / e, 6).cast("decimal(18,6)").as("x"))
        .agg(count(lit(1)).as("n_cells"),
          sum(col("x")).cast("double").as("chi2"))
      val dof = rt.agg((count(lit(1)) - 1).as("rm1"))
        .crossJoin(broadcast(ct.agg((count(lit(1)) - 1).as("cm1"))))
        .select((col("rm1") * col("cm1")).as("dof"))
      agg.crossJoin(broadcast(dof))
        .select(col("n_cells"), col("dof"), col("chi2"))
    },

    // Cohort retention triangle: cohort = week of each user's first
    // event; cell (cohort_week, week_offset) counts distinct users active
    // that many weeks later. Two partial aggregations (first-event per
    // user, distinct user-weeks) and one equi-join on user_id — the whole
    // triangle is O(users × active-weeks), never O(events²). Week math is
    // FLOOR over epoch seconds of week-truncated stamps (exact multiples
    // of 604800 in UTC; both engines anchor Monday).
    Q(
      "q169_cohort_retention",
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', MIN(ts)) AS cw
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS aw
        |  FROM events),
        |j AS (
        |  SELECT f.cw,
        |    CAST(FLOOR((epoch(a.aw) - epoch(f.cw)) / 604800) AS BIGINT)
        |      AS week_offset,
        |    a.user_id
        |  FROM a JOIN f ON a.user_id = f.user_id)
        |SELECT cw AS cohort_week, week_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM j GROUP BY cw, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
      val ev = Tables.table(s, dir, "events")
      val f = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cw"))
      val a = ev.select(col("user_id").as("au"),
        date_trunc("week", col("ts")).as("aw")).distinct()
      a.join(f, col("au") === col("user_id"))
        .select(col("cw"),
          floor((col("aw").cast("double") - col("cw").cast("double")) /
            604800).cast("long").as("week_offset"),
          col("user_id"))
        .groupBy(col("cw").as("cohort_week"), col("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // Strictly-ordered 3-step funnel (signup → later click → later
    // purchase): each stage is a MIN-timestamp aggregate of the previous
    // stage's survivors — two equi-joins on user_id, partial aggs, no
    // event-level fan-out in the output. The strict ts ordering is the
    // part naive funnel counts get wrong (a purchase before the click
    // must not count).
    Q(
      "q170_funnel_ordered",
      """WITH s1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |  GROUP BY e.user_id)
        |SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_signup,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_click_after,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_purchase_after"""
        .stripMargin) { (s, dir) =>
      val ev = Tables.table(s, dir, "events")
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("u2"), col("ts"))
        .join(s1, col("u2") === col("user_id") && col("ts") > col("t1"))
        .groupBy(col("u2")).agg(min(col("ts")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("u3"), col("ts"))
        .join(s2, col("u3") === col("u2") && col("ts") > col("t2"))
        .groupBy(col("u3")).agg(min(col("ts")).as("t3"))
      s1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(broadcast(s2.agg(count(lit(1)).as("n_click_after"))))
        .crossJoin(broadcast(s3.agg(count(lit(1)).as("n_purchase_after"))))
    },

    // Time-series gap filling with linear interpolation: each user's
    // daily value series is re-gridded onto a per-user day spine
    // (sequence between that user's min/max day); missing days take
    // prev + (next - prev) * gap-fraction from IGNORE-NULLS window
    // lookups. One spine join + two window passes, all partitioned by
    // the series key — at 100 TB each series interpolates independently
    // inside its partition, no cross-key traffic. Daily sums go through
    // DECIMAL; the lerp is pure double arithmetic on exact inputs,
    // rounded once at the end.
    Q(
      "q163_gap_fill_interpolate",
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS d,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events WHERE user_id IN (3, 4)
        |  GROUP BY user_id, date_trunc('day', ts)),
        |bounds AS (
        |  SELECT user_id, MIN(d) AS d0, MAX(d) AS d1
        |  FROM daily GROUP BY user_id),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS d
        |  FROM bounds),
        |j AS (
        |  SELECT s.user_id, s.d, daily.v
        |  FROM spine s LEFT JOIN daily
        |    ON daily.user_id = s.user_id AND daily.d = s.d),
        |w AS (
        |  SELECT user_id, d, v,
        |    last_value(v IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |      OVER wp AS pd,
        |    first_value(v IGNORE NULLS) OVER wn AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |      OVER wn AS nd
        |  FROM j
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY d
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY user_id ORDER BY d
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, d,
        |  CASE WHEN v IS NOT NULL THEN 'actual' ELSE 'filled' END AS src,
        |  ROUND(CASE WHEN v IS NOT NULL THEN v
        |             WHEN pv IS NULL THEN nv
        |             WHEN nv IS NULL THEN pv
        |             ELSE pv + (nv - pv) * (epoch(d) - epoch(pd))
        |                                 / (epoch(nd) - epoch(pd)) END, 6)
        |    AS value
        |FROM w ORDER BY user_id, d""".stripMargin) { (s, dir) =>
      val daily = Tables.table(s, dir, "events")
        .filter(col("user_id").isin(3, 4))
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
      val bounds = daily.groupBy(col("user_id"))
        .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      val spine = bounds.select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      val j = spine.join(
        daily.select(col("user_id").as("du"), col("d").as("dd"), col("v")),
        col("du") === col("user_id") && col("dd") === col("d"), "left")
        .select(col("user_id"), col("d"), col("v"))
      val wp = Window.partitionBy(col("user_id")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy(col("user_id")).orderBy(col("d"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val (pv, nv) = (last(col("v"), ignoreNulls = true).over(wp),
        first(col("v"), ignoreNulls = true).over(wn))
      val pd = last(when(col("v").isNotNull, col("d")), ignoreNulls = true)
        .over(wp)
      val nd = first(when(col("v").isNotNull, col("d")), ignoreNulls = true)
        .over(wn)
      j.select(col("user_id"), col("d"), col("v"),
          pv.as("pv"), pd.as("pd"), nv.as("nv"), nd.as("nd"))
        .select(col("user_id"), col("d"),
          when(col("v").isNotNull, "actual").otherwise("filled").as("src"),
          round(
            when(col("v").isNotNull, col("v"))
              .when(col("pv").isNull, col("nv"))
              .when(col("nv").isNull, col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                (col("d").cast("double") - col("pd").cast("double")) /
                (col("nd").cast("double") - col("pd").cast("double"))), 6)
            .as("value"))
        .orderBy(col("user_id"), col("d"))
    })
}
