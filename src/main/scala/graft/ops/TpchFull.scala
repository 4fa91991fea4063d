package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Remaining TPC-H query shapes, adapted to the driver's reduced schema
  * (no partsupp table — `lineitem (l_partkey, l_suppkey)` serves as the
  * part↔supplier bridge; no phone/comment/shipmode/receiptdate columns —
  * equivalent predicates re-expressed over the columns that exist).
  *
  * Shapes covered: Q2 (correlated min over a derived bridge), Q5 (local
  * supplier revenue), Q8 (market share, conditional-over-total), Q11
  * (HAVING vs scalar-subquery total), Q12 (conditional counts on a date
  * delta), Q13 (outer-join histogram), Q15 (argmax via exact-decimal
  * equality), Q16 (distinct-count with NOT IN), Q17 (correlated avg
  * threshold), Q20 (nested semi-join chain), Q21 (EXISTS + NOT EXISTS
  * decorrelation), Q22 (anti join + scalar subquery).
  *
  * 100 TB notes: every dim join below is broadcast; fact-fact joins
  * shuffle on their equi-keys; the Q2/Q11/Q15 "compare to aggregate"
  * shapes broadcast a 1-row (or per-key reduced) aggregate rather than
  * collecting to the driver; money math is exact DECIMAL then cast to
  * double once (ops.Det), so results are partition-order independent.
  */
object TpchFull {
  import Det._

  val queries: Seq[Q] = Seq(
    // Q2 shape: cheapest supplier per part within a region. The bridge
    // "supply cost" is min(extendedprice/quantity) per (part, supplier).
    // Decorrelated: per-part min over the region-filtered bridge, equality
    // join back. At scale: bridge agg shuffles on (part,supp); the
    // per-part min reuses the part-key partitioning.
    Q(
      "q94_tpch_q2_mincost",
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |         FLOOR(MIN(l_extendedprice / l_quantity) * 10000 + 0.5)
        |           / 10000 AS cost
        |  FROM lineitem GROUP BY 1, 2
        |), eps AS (
        |  SELECT ps.l_partkey, ps.cost, s.s_name, s.s_acctbal, n.n_name
        |  FROM ps
        |  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'
        |)
        |SELECT p.p_partkey, e.s_name, e.n_name, e.cost AS supply_cost
        |FROM part p
        |JOIN eps e ON e.l_partkey = p.p_partkey
        |WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
        |  AND e.cost = (SELECT MIN(e2.cost) FROM eps e2
        |                WHERE e2.l_partkey = p.p_partkey)
        |ORDER BY e.s_acctbal DESC, p.p_partkey, e.s_name
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val l = Tables.table(s, dir, "lineitem")
      val sup = Tables.table(s, dir, "supplier")
      val nat = Tables.table(s, dir, "nation")
      val reg = Tables.table(s, dir, "region").filter(col("r_name") === "EUROPE")
      val part = Tables.table(s, dir, "part")
        .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
      // The per-part min is only consumed for parts passing the filter, so
      // semi-join the bridge rows down to those parts BEFORE the
      // (partkey, suppkey) shuffle — at 100 TB this turns a full-lineitem
      // aggregation into one over the selected part family.
      val ps = l
        .join(broadcast(part.select(col("p_partkey").as("keep_key"))),
          col("l_partkey") === col("keep_key"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        // FLOOR(x*1e4 + 0.5)/1e4 instead of ROUND(x, 4): price/quantity
        // ratios terminate on decimal halves (…21375) where Spark's
        // exact-BigDecimal ROUND and DuckDB's multiply-round disagree by
        // one ulp of the 4th digit; the floor form is pure IEEE ops and
        // bit-identical in both engines (found by the sf0.1 sweep)
        .agg((floor(min(col("l_extendedprice") / col("l_quantity"))
          * 10000 + 0.5) / 10000).as("cost"))
      val eps = ps
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select(col("l_partkey"), col("cost"), col("s_name"),
          col("s_acctbal"), col("n_name"))
      val minc = eps.groupBy(col("l_partkey"))
        .agg(min(col("cost")).as("min_cost"))
      eps.join(minc, Seq("l_partkey"))
        .filter(col("cost") === col("min_cost"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_name"))
        .limit(100)
        .select(col("p_partkey"), col("s_name"), col("n_name"),
          col("cost").as("supply_cost"))
    },

    // Q5 shape: revenue from orders where customer and supplier share a
    // nation, within one region and a date window. The c↔s nation
    // equality rides along the lineitem-supplier join condition.
    Q(
      "q95_tpch_q5_local",
      s"""SELECT n.n_name,
         |  ${revenueSumSql("l.l_extendedprice", "l.l_discount")} AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |                AND c.c_nationkey = s.s_nationkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |WHERE r.r_name = 'ASIA'
         |  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n.n_name
         |ORDER BY revenue DESC, n.n_name""".stripMargin) { (s, dir) =>
      val c = Tables.table(s, dir, "customer")
      val o = Tables.table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      val l = Tables.table(s, dir, "lineitem")
      val sup = Tables.table(s, dir, "supplier")
      val n = Tables.table(s, dir, "nation")
      val r = Tables.table(s, dir, "region").filter(col("r_name") === "ASIA")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Q8 shape: one nation's share of a region's market by order year —
    // conditional exact-decimal sum over total, one pass.
    Q(
      "q96_tpch_q8_share",
      """SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
        |  ROUND(
        |    CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
        |      THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
        |  6) AS mkt_share
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |JOIN region r ON cn.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'AMERICA'
        |GROUP BY EXTRACT(year FROM o.o_orderdate)
        |ORDER BY o_year""".stripMargin) { (s, dir) =>
      val l = Tables.table(s, dir, "lineitem")
      val p = Tables.table(s, dir, "part").filter(col("p_type") === "ECONOMY")
      val sup = Tables.table(s, dir, "supplier")
      val sn = Tables.table(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))
      val o = Tables.table(s, dir, "orders")
      val c = Tables.table(s, dir, "customer")
      val cn = Tables.table(s, dir, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
      val r = Tables.table(s, dir, "region").filter(col("r_name") === "AMERICA")
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))
      l.join(broadcast(p), p("p_partkey") === l("l_partkey"))
        .join(broadcast(sup), sup("s_suppkey") === l("l_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
        .join(broadcast(r), col("cn_region") === col("r_regionkey"))
        .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
        .agg(round(
          sum(when(col("sn_name") === "NATION_5", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(rev).cast("double"), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // Q11 shape: per-part value from one nation's suppliers, kept when
    // above a fraction of the grand total. The 1-row total is broadcast
    // against the per-part aggregate — no driver collect.
    Q(
      "q97_tpch_q11_value_parts",
      """WITH pv AS (
        |  SELECT l.l_partkey,
        |         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS val
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_name = 'NATION_3'
        |  GROUP BY l.l_partkey)
        |SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
        |FROM pv
        |WHERE CAST(val AS DOUBLE) >
        |      (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM pv)
        |ORDER BY part_value DESC, l_partkey""".stripMargin) { (s, dir) =>
      val l = Tables.table(s, dir, "lineitem")
      val sup = Tables.table(s, dir, "supplier")
      val n = Tables.table(s, dir, "nation").filter(col("n_name") === "NATION_3")
      val pv = l
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("val"))
      val total = pv.agg((sum(col("val")).cast("double") * 0.001).as("threshold"))
      pv.crossJoin(broadcast(total))
        .filter(col("val").cast("double") > col("threshold"))
        .select(col("l_partkey"), col("val").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },

    // Q12 shape (no l_shipmode/receiptdate in schema): slow-vs-fast
    // shipping split by line status, priority-weighted conditional counts.
    Q(
      "q98_tpch_q12_priority",
      """SELECT l.l_linestatus,
        |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        |GROUP BY l.l_linestatus
        |ORDER BY l.l_linestatus""".stripMargin) { (s, dir) =>
      val o = Tables.table(s, dir, "orders")
      val l = Tables.table(s, dir, "lineitem")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(high, 1).otherwise(0)).as("high_line_count"),
          sum(when(!high, 1).otherwise(0)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },

    // Q13 shape: order-count histogram including zero-order customers —
    // the left outer join is the point (inner would drop the 0 bucket).
    Q(
      "q99_tpch_q13_custdist",
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
      val c = Tables.table(s, dir, "customer")
      val o = Tables.table(s, dir, "orders")
      // Aggregate below the join: per-customer counts reduce orders
      // map-side BEFORE the shuffle, and the outer join then moves one
      // row per customer instead of one per order.
      val cnt = o.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      c.join(cnt, c("c_custkey") === cnt("o_custkey"), "left_outer")
        .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q15 shape: top supplier(s) by quarterly revenue. The argmax
    // equality is on the EXACT decimal sum (cast to double only for
    // output), so ties and float drift cannot break the compare.
    Q(
      "q100_tpch_q15_top_supplier",
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
        |FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
        |WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin) { (s, dir) =>
      val l = Tables.table(s, dir, "lineitem")
      val sup = Tables.table(s, dir, "supplier")
      val rev = l
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("total_rev"))
      val top = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.crossJoin(broadcast(top))
        .filter(col("total_rev") === col("max_rev"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // Q16 shape: supplier diversity per (brand, size) with a NOT IN
    // subquery — Catalyst plans a null-aware anti join (suppkey is
    // non-null so it degenerates to a plain broadcast anti join).
    Q(
      "q101_tpch_q16_supplier_cnt",
      """SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 5, 9, 14, 23, 36, 45, 49)
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%00007')
        |GROUP BY p.p_brand, p.p_size
        |ORDER BY supplier_cnt DESC, p.p_brand, p.p_size""".stripMargin) { (s, dir) =>
      val l = Tables.table(s, dir, "lineitem")
      val p = Tables.table(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 9, 14, 23, 36, 45, 49))
      val excl = Tables.table(s, dir, "supplier")
        .filter(col("s_name").like("%00007")).select(col("s_suppkey"))
      l.join(broadcast(excl), l("l_suppkey") === excl("s_suppkey"), "left_anti")
        .join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    },

    // Q17 shape: revenue from small-quantity lines, threshold = 20% of
    // the part's own average quantity (correlated avg, decorrelated into
    // a per-part aggregate re-joined on the part key).
    Q(
      "q102_tpch_q17_small_qty",
      """SELECT ROUND(
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0,
        |  4) AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#3'
        |  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
        |                      FROM lineitem l2
        |                      WHERE l2.l_partkey = p.p_partkey)""".stripMargin) { (s, dir) =>
      val l = Tables.table(s, dir, "lineitem")
      val p = Tables.table(s, dir, "part").filter(col("p_brand") === "Brand#3")
      val avgq = l.groupBy(col("l_partkey").as("ap_key"))
        .agg((avg(col("l_quantity")) * 0.2).as("qty_threshold"))
      l.join(broadcast(p), p("p_partkey") === l("l_partkey"))
        .join(avgq, col("l_partkey") === col("ap_key"))
        .filter(col("l_quantity") < col("qty_threshold"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double") / 7.0, 4).as("avg_yearly"))
    },

    // Q20 shape: suppliers in one nation who moved serious volume of a
    // part family in one year — IN-subquery over a grouped bridge,
    // planned as semi join on the supplier key.
    Q(
      "q103_tpch_q20_volume_suppliers",
      """SELECT s.s_name, s.s_acctbal
        |FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE n.n_name = 'NATION_7' AND s.s_suppkey IN (
        |  SELECT l.l_suppkey
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_name LIKE '%widget%'
        |    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l.l_suppkey, l.l_partkey
        |  HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 50)
        |ORDER BY s.s_name""".stripMargin) { (s, dir) =>
      val sup = Tables.table(s, dir, "supplier")
      val n = Tables.table(s, dir, "nation").filter(col("n_name") === "NATION_7")
      val l = Tables.table(s, dir, "lineitem")
      val p = Tables.table(s, dir, "part").filter(col("p_name").like("%widget%"))
      val movers = l
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
        .filter(col("q") > 50)
        .select(col("l_suppkey"))
      sup.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(movers, sup("s_suppkey") === movers("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    },

    // Q21 shape (no receipt/commit dates): in multi-supplier finished
    // orders, count per supplier the orders where that supplier shipped
    // the last item. EXISTS + NOT EXISTS, decorrelated by Catalyst into
    // left-semi + left-anti joins (visible in .explain).
    Q(
      "q104_tpch_q21_last_shipper",
      """SELECT s.s_name, COUNT(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 20""".stripMargin) { (s, dir) =>
      // Hand-decorrelated: the EXISTS/NOT EXISTS pair over lineitem is
      // equivalent to "this supplier's row ships at-or-after every OTHER
      // supplier's max shipdate, in a multi-supplier order". One
      // (orderkey, suppkey) aggregate + windows over orderkey replace two
      // lineitem self-joins — a single shuffle partitioning (orderkey)
      // reused by agg, window, and the join back to row-level lineitem.
      val fOrders = Tables.table(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      // One explicit orderkey exchange feeds the (orderkey, suppkey) agg
      // (subset clustering), the orderkey windows, and the row-level join
      // back — EnsureRequirements inserts nothing further.
      val lf = Tables.table(s, dir, "lineitem")
        .join(broadcast(fOrders), col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .repartition(col("l_orderkey"))
      val ps = lf.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("smax"))
      val w = Window.partitionBy(col("l_orderkey"))
      val withM1 = ps
        .withColumn("nsupp", count(lit(1)).over(w))
        .withColumn("m1", max(col("smax")).over(w))
      val otherMax = withM1
        .withColumn("cnt_at_m1",
          sum(when(col("smax") === col("m1"), 1).otherwise(0)).over(w))
        .withColumn("m2", max(when(col("smax") < col("m1"), col("smax"))).over(w))
        .filter(col("nsupp") > 1)
        .select(col("l_orderkey").as("po_key"), col("l_suppkey").as("ps_key"),
          when(col("smax") < col("m1") || col("cnt_at_m1") > 1, col("m1"))
            .otherwise(col("m2")).as("other_max"))
      val sup = Tables.table(s, dir, "supplier")
      lf.join(otherMax, col("l_orderkey") === col("po_key") &&
          col("l_suppkey") === col("ps_key"))
        .filter(col("l_shipdate") >= col("other_max"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },

    // Q22 shape: rich-but-inactive customers per nation bucket — scalar
    // subquery threshold (exact decimal avg) + anti join against orders.
    Q(
      "q105_tpch_q22_inactive_rich",
      """SELECT c.c_nationkey AS cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        |  AND c.c_acctbal > (
        |    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |           / COUNT(*)
        |    FROM customer c2
        |    WHERE c2.c_acctbal > 0
        |      AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY c.c_nationkey
        |ORDER BY c.c_nationkey""".stripMargin) { (s, dir) =>
      val nations = Seq(1, 3, 5, 7, 9, 11, 13)
      val c = Tables.table(s, dir, "customer")
        .filter(col("c_nationkey").isin(nations: _*))
      val o = Tables.table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01 00:00:00").cast("timestamp"))
        .select(col("o_custkey"))
      val thr = c.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_bal"))
      c.crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          moneySum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("cntrycode"))
    },

    // Q4 shape: order-priority census over orders that had at least one
    // late-shipped line (EXISTS → left-semi join on the order key).
    Q(
      "q118_tpch_q4_priority",
      """SELECT o.o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin) { (s, dir) =>
      val o = Tables.table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01 00:00:00").cast("timestamp"))
      val l = Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAY"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // Q6 shape: the classic single-scan band-predicate revenue forecast —
    // everything pushes into the parquet scan; the agg is one exact sum.
    Q(
      "q119_tpch_q6_forecast",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue_delta,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)")).cast("double")
          .as("revenue_delta"), count(lit(1)).as("n"))
    },

    // Q9 shape: product-line profit by supplier nation and year. The
    // schema has no partsupp.ps_supplycost, so cost is proxied as 60% of
    // list price — the shape (5-way join + derived measure + two-level
    // group) is what matters.
    Q(
      "q120_tpch_q9_profit",
      """SELECT n.n_name AS nation,
        |  EXTRACT(year FROM o.o_orderdate) AS o_year,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |           - CAST(l.l_quantity AS DECIMAL(18,2))
        |             * (CAST(p.p_retailprice AS DECIMAL(18,2))
        |                * CAST(0.6 AS DECIMAL(3,1)))) AS DOUBLE) AS profit
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN supplier s2 ON s2.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s2.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE p.p_name LIKE '%bolt%'
        |GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
        |ORDER BY nation, o_year""".stripMargin) { (s, dir) =>
      val l = Tables.table(s, dir, "lineitem")
      val p = Tables.table(s, dir, "part").filter(col("p_name").like("%bolt%"))
      val sup = Tables.table(s, dir, "supplier")
      val n = Tables.table(s, dir, "nation")
      val o = Tables.table(s, dir, "orders")
      val profit = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)")) -
        col("l_quantity").cast("decimal(18,2)") *
          (col("p_retailprice").cast("decimal(18,2)") *
            lit(0.6).cast("decimal(3,1)"))
      l.join(broadcast(p), p("p_partkey") === l("l_partkey"))
        .join(broadcast(sup), sup("s_suppkey") === l("l_suppkey"))
        .join(broadcast(n), n("n_nationkey") === sup("s_nationkey"))
        .join(o, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("bigint").as("o_year"))
        .agg(sum(profit).cast("double").as("profit"))
        .orderBy(col("nation"), col("o_year"))
    })
}
