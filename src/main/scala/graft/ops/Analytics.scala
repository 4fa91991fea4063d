package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Analytic surface (SURVEY.md §2.3 E1-E4): window functions (ranking /
  * analytic / frames), set operations, ROLLUP / CUBE / GROUPING SETS, and
  * approximate aggregates.
  *
  * Windows partition by a key → one shuffle on the partition key, then
  * in-partition sort; no driver involvement. ROLLUP/CUBE expand in the
  * aggregate (Expand node) with partial aggregation map-side.
  */
object Analytics {
  import Det._

  val queries: Seq[Q] = Seq(
    // E1 ranking: row_number / rank / dense_rank / ntile. Top-3 customers
    // per nation by balance; total-order tiebreak on c_custkey keeps every
    // ranking function deterministic.
    Q(
      "q17_window_rank",
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey,
        |    ROW_NUMBER() OVER w AS rn,
        |    RANK() OVER w AS rnk,
        |    DENSE_RANK() OVER w AS drnk,
        |    NTILE(4) OVER w AS quartile
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey
        |               ORDER BY c_acctbal DESC, c_custkey ASC)
        |) WHERE rn <= 3
        |ORDER BY c_nationkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.table(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .filter(col("rn") <= 3)
        .orderBy(col("c_nationkey"), col("rn"))
    },

    // E1 analytic: lag / lead / first / last over per-customer order
    // history. (o_custkey, o_orderdate, o_orderkey) is a total order.
    Q(
      "q18_window_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_orderkey) OVER w AS prev_order,
        |  LEAD(o_orderkey) OVER w AS next_order,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
        |  DATE_DIFF('day',
        |    CAST(LAG(o_orderdate) OVER w AS DATE),
        |    CAST(o_orderdate AS DATE)) AS days_since_prev
        |FROM orders
        |WHERE o_custkey <= 20
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.table(s, dir, "orders")
        .filter(col("o_custkey") <= 20)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          first(col("o_orderkey")).over(w).as("first_order"),
          datediff(col("o_orderdate").cast("date"),
            lag(col("o_orderdate"), 1).over(w).cast("date"))
            .as("days_since_prev"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // E1 frames: running total (unbounded preceding) + 3-row moving
    // average per supplier. Decimal running sums stay exact, then cast.
    Q(
      "q19_window_frames",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_rev,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / COUNT(*) OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
        |    AS moving_avg
        |FROM lineitem
        |WHERE l_suppkey <= 2
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val order = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
          col("l_linenumber").asc)
      val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val moving = order.rowsBetween(-2, Window.currentRow)
      val price = col("l_extendedprice").cast(DecimalType(18, 2))
      Tables.table(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 2)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(price).over(running).cast("double").as("running_rev"),
          round(sum(price).over(moving).cast("double") /
            count(lit(1)).over(moving), 6).as("moving_avg"),
          col("l_shipdate"))
        .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"))
        .drop("l_shipdate")
    },

    // E2 set ops: EXCEPT / INTERSECT / UNION ALL over nation-key sets.
    Q(
      "q20_set_ops",
      """SELECT 'customer_only' AS tag, k FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  EXCEPT
        |  SELECT s_nationkey AS k FROM supplier)
        |UNION ALL
        |SELECT 'both' AS tag, k FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  INTERSECT
        |  SELECT s_nationkey AS k FROM supplier)
        |ORDER BY tag, k""".stripMargin) { (s, dir) =>
      val c = Tables.table(s, dir, "customer")
        .select(col("c_nationkey").as("k"))
      val sup = Tables.table(s, dir, "supplier")
        .select(col("s_nationkey").as("k"))
      val only = c.except(sup).select(lit("customer_only").as("tag"), col("k"))
      val both = c.intersect(sup).select(lit("both").as("tag"), col("k"))
      only.unionAll(both).orderBy(col("tag"), col("k"))
    },

    // E3 ROLLUP: order counts at (priority, status), (priority), ().
    // NULLS FIRST is explicit — Spark ASC defaults nulls-first, DuckDB
    // nulls-last (SURVEY.md §7.4 trap #1).
    Q(
      "q21_rollup",
      s"""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
         |  GROUPING(o_orderpriority) AS g_pri, GROUPING(o_orderstatus) AS g_st
         |FROM orders
         |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
         |ORDER BY o_orderpriority ASC NULLS FIRST,
         |         o_orderstatus ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderpriority")).as("g_pri"),
          grouping(col("o_orderstatus")).as("g_st"))
        .orderBy(col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    },

    // E3 CUBE: all 4 grouping combinations of returnflag × linestatus.
    Q(
      "q22_cube",
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${moneySumSql("l_quantity")} AS qty
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST,
         |         l_linestatus ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // E3 GROUPING SETS through the SQL front end (the bridge executes SQL
    // text — this is the spark.sql path the Runner uses).
    Q(
      "q23_grouping_sets",
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        |ORDER BY c_mktsegment ASC NULLS FIRST,
        |         c_nationkey ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
          |FROM customer
          |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
          |ORDER BY c_mktsegment ASC NULLS FIRST,
          |         c_nationkey ASC NULLS FIRST""".stripMargin)
    },

    // E4 approx distinct: HLL++ on low-cardinality keys is exact in both
    // engines, keeping the oracle hash-stable; the high-cardinality path is
    // covered exactly by q07's COUNT(DISTINCT).
    Q(
      "q24_approx_distinct",
      """SELECT approx_count_distinct(l_returnflag) AS n_flags,
        |       approx_count_distinct(l_linestatus) AS n_status,
        |       approx_count_distinct(l_returnflag || '|' || l_linestatus) AS n_combo
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "lineitem")
        .agg(
          approx_count_distinct(col("l_returnflag")).as("n_flags"),
          approx_count_distinct(col("l_linestatus")).as("n_status"),
          approx_count_distinct(
            concat(col("l_returnflag"), lit("|"), col("l_linestatus")))
            .as("n_combo"))
    },

    // E4 quantiles: exact interpolated percentiles (both engines use the
    // p*(n-1) linear-interpolation definition); rounded to kill last-bit
    // float divergence. percentile_approx is the 100 TB path — same API
    // shape, sketch-mergeable — but its sketch is not bit-compatible with
    // DuckDB's, so the oracle pins the exact variant.
    Q(
      "q25_quantiles",
      """SELECT o_orderpriority,
        |  ROUND(QUANTILE_CONT(o_totalprice, 0.25), 4) AS p25,
        |  ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50,
        |  ROUND(QUANTILE_CONT(o_totalprice, 0.95), 4) AS p95
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
        .orderBy(col("o_orderpriority"))
    },

    // E4 top-k heavy hitters: group-count + TakeOrderedAndProject — only k
    // rows leave each partition after partial agg.
    Q(
      "q26_topk_heavy_hitters",
      """SELECT p_brand, COUNT(*) AS n FROM part
        |GROUP BY p_brand
        |ORDER BY n DESC, p_brand ASC
        |LIMIT 5""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("p_brand").asc)
        .limit(5)
    },

    // Argmax aggregation surface: per nation, the supplier holding the
    // max/min account balance via max_by/min_by with a STRUCT ordering
    // key — (s_acctbal, s_suppkey) makes double-balance ties
    // deterministic. One partial-aggregable pass instead of a rank
    // window + filter (no per-group sort, no second shuffle). DuckDB's
    // arg_max can't take a composite key, so the oracle states the same
    // semantics with rank-1 windows.
    Q(
      "q164_argmax_surface",
      """WITH s AS (
        |  SELECT n.n_name, su.s_name, su.s_acctbal, su.s_suppkey,
        |    ROW_NUMBER() OVER (PARTITION BY n.n_name
        |      ORDER BY su.s_acctbal DESC, su.s_suppkey DESC) AS rhi,
        |    ROW_NUMBER() OVER (PARTITION BY n.n_name
        |      ORDER BY su.s_acctbal ASC, su.s_suppkey ASC) AS rlo
        |  FROM supplier su JOIN nation n ON n.n_nationkey = su.s_nationkey)
        |SELECT n_name,
        |  MAX(CASE WHEN rhi = 1 THEN s_name END) AS top_supplier,
        |  MAX(CASE WHEN rhi = 1 THEN s_acctbal END) AS top_bal,
        |  MAX(CASE WHEN rlo = 1 THEN s_name END) AS bottom_supplier,
        |  MAX(CASE WHEN rlo = 1 THEN s_acctbal END) AS bottom_bal
        |FROM s GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, dir) =>
      val su = Tables.table(s, dir, "supplier")
      val n = Tables.table(s, dir, "nation")
      su.join(broadcast(n), col("n_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          max_by(col("s_name"), struct(col("s_acctbal"), col("s_suppkey")))
            .as("top_supplier"),
          max(col("s_acctbal")).as("top_bal"),
          min_by(col("s_name"), struct(col("s_acctbal"), col("s_suppkey")))
            .as("bottom_supplier"),
          min(col("s_acctbal")).as("bottom_bal"))
        .orderBy(col("n_name"))
    },

    // E1 RANGE frames over event TIME (q19 covers ROWS frames): per user,
    // the trailing-1-hour event count and value sum — the frame bound is
    // a 3600-second range over the epoch-second ordering, so peers at the
    // same second share one frame in both engines. The windowed SUM runs
    // over DECIMAL (exact, order-free); one shuffle on user_id.
    Q(
      "q168_time_range_rolling",
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
        |    CAST(value AS DECIMAL(18,6)) AS dv
        |  FROM events WHERE user_id < 6)
        |SELECT user_id, event_id, es,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
        |  CAST(SUM(dv) OVER w AS DOUBLE) AS v_last_hour
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY es
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, es, event_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("es"))
        .rangeBetween(-3600L, 0L)
      Tables.table(s, dir, "events")
        .filter(col("user_id") < 6)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("es"),
          col("value").cast("decimal(18,6)").as("dv"))
        .select(col("user_id"), col("event_id"), col("es"),
          count(lit(1)).over(w).as("n_last_hour"),
          sum(col("dv")).over(w).cast("double").as("v_last_hour"))
        .orderBy(col("user_id"), col("es"), col("event_id"))
    },

    // 2D skyline (Pareto frontier, minimize price AND size): the naive
    // form is a quadratic self-anti-join; in 2D it collapses to a
    // running MIN over the price order. A GLOBAL window is the textbook
    // formulation (the oracle keeps it) but in Spark an unpartitioned
    // window is an Exchange SinglePartition — the whole table sorts in
    // ONE task. So the Spark side is the TWO-PHASE distributed skyline:
    //   1. bucket the price axis (fixed width ⇒ constant bucket count
    //      at any SF), per-bucket running min via a PARTITIONED window;
    //   2. cross-bucket dominance via a per-bucket min table — tiny
    //      (≤ ~#buckets rows), prefix-min'd by a broadcast self-join
    //      (no window ⇒ no single-partition exchange anywhere), then
    //      broadcast back onto the rows.
    // A part is strictly dominated by a cheaper one iff that part is in
    // the same bucket (phase-1 window sees it: within a bucket, lower
    // price10 ⇔ RANGE 1 PRECEDING) or a strictly lower bucket (phase-2
    // prefix min sees it: every price there is strictly cheaper). Price
    // is decimal-rescaled to an exact BIGINT so frames and tie groups
    // agree across engines. PlanAuditSpec asserts the no-SinglePartition
    // property stays true.
    Q(
      "q172_skyline",
      """WITH p AS (
        |  SELECT p_partkey,
        |    CAST(ROUND(p_retailprice * 10, 0) AS BIGINT) AS price10,
        |    CAST(p_size AS BIGINT) AS sz
        |  FROM part),
        |w AS (
        |  SELECT p_partkey, price10, sz,
        |    MIN(sz) OVER (ORDER BY price10
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS best_cheaper,
        |    MIN(sz) OVER (PARTITION BY price10) AS best_tie
        |  FROM p)
        |SELECT p_partkey, ROUND(price10 / 10.0, 1) AS price, sz AS size
        |FROM w
        |WHERE (best_cheaper IS NULL OR sz < best_cheaper)
        |  AND sz = best_tie
        |ORDER BY price10, p_partkey""".stripMargin) { (s, dir) =>
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("bkt"))
        .orderBy(col("price10"))
        .rangeBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("price10"))
      val p = Tables.table(s, dir, "part")
        .select(col("p_partkey"),
          round(col("p_retailprice") * 10, 0).cast("long").as("price10"),
          col("p_size").cast("long").as("sz"))
        .withColumn("bkt", expr("price10 div 100"))
      // per-bucket min, then prefix-min over strictly-lower buckets via
      // a broadcast non-equi self-join (bucket count is bounded by the
      // price domain / width, independent of row count)
      val bm = p.groupBy(col("bkt")).agg(min(col("sz")).as("bmin"))
      val prior = bm.join(
          broadcast(bm.select(col("bkt").as("bk2"), col("bmin").as("bm2"))),
          col("bk2") < col("bkt"), "left")
        .groupBy(col("bkt")).agg(min(col("bm2")).as("prior_min"))
      p.withColumn("local_cheaper", min(col("sz")).over(wb))
        .withColumn("best_tie", min(col("sz")).over(wt))
        .join(broadcast(prior), Seq("bkt"))
        // least() skips NULLs: min over whichever phases saw a cheaper part
        .withColumn("best_cheaper",
          least(col("local_cheaper"), col("prior_min")))
        .filter((col("best_cheaper").isNull ||
          col("sz") < col("best_cheaper")) && col("sz") === col("best_tie"))
        .select(col("p_partkey"), round(col("price10") / 10.0, 1).as("price"),
          col("sz").as("size"), col("price10"))
        .orderBy(col("price10"), col("p_partkey"))
        .drop("price10")
    },

    // Null-preserving generator surface (explode_outer): rows whose
    // array is empty must SURVIVE the flatten with a NULL element — the
    // difference between "document had no sections" disappearing from a
    // report vs showing as an explicit gap. Oracle shape: LEFT JOIN
    // LATERAL unnest.
    Q(
      "q173_generator_outer",
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN []
        |         ELSE string_split(text, ' ')[1:2] END AS toks
        |  FROM documents WHERE doc_id < 10)
        |SELECT doc_id, u.tok
        |FROM t LEFT JOIN LATERAL (SELECT unnest(toks) AS tok) u ON TRUE
        |ORDER BY doc_id, tok""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "documents")
        .filter(col("doc_id") < 10)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            array().cast("array<string>"))
            .otherwise(expr("slice(split(text, ' '), 1, 2)"))
            .as("toks"))
        .select(col("doc_id"), explode_outer(col("toks")).as("tok"))
        .orderBy(col("doc_id"), col("tok"))
    })
}
