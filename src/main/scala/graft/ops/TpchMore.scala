package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Further TPC-H query shapes + statistical aggregates: promo-revenue
  * ratio (Q14), large-volume customers (Q18), OR-of-ANDs predicate
  * revenue (Q19), nation-pair volume (Q7), correlated scalar subquery,
  * statistical moments, and deterministic collect.
  */
object TpchMore {
  import Det._

  val queries: Seq[Q] = Seq(
    // Q14 shape: conditional revenue share (CASE inside exact decimal sum).
    Q(
      "q80_tpch_q14_promo",
      """SELECT ROUND(
        |  100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
        |    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
        |  6) AS promo_revenue_pct
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey""".stripMargin) { (s, dir) =>
      val l = Tables.table(s, dir, "lineitem")
      val p = Tables.table(s, dir, "part")
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(rev).cast("double"), 6).as("promo_revenue_pct"))
    },

    // Q18 shape: large-volume orders via HAVING subquery + re-join.
    Q(
      "q81_tpch_q18_bigorders",
      """SELECT c.c_custkey, o.o_orderkey,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |GROUP BY c.c_custkey, o.o_orderkey
        |ORDER BY total_qty DESC, o.o_orderkey ASC
        |LIMIT 25""".stripMargin) { (s, dir) =>
      val c = Tables.table(s, dir, "customer")
      val o = Tables.table(s, dir, "orders")
      val l = Tables.table(s, dir, "lineitem")
      val big = l.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
        .filter(col("q") > 300)
        .select(col("l_orderkey").as("big_orderkey"))
      l.join(big, l("l_orderkey") === col("big_orderkey"), "left_semi")
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(c("c_custkey"), o("o_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey").asc)
        .limit(25)
    },

    // Q19 shape: disjunction of conjunctive band predicates — Catalyst
    // pushes the common join key and evaluates the OR post-join.
    Q(
      "q82_tpch_q19_bands",
      s"""SELECT ${revenueSumSql("l.l_extendedprice", "l.l_discount")} AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
         |       AND l.l_quantity >= 10)
         |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
         |       AND l.l_quantity < 10)""".stripMargin) { (s, dir) =>
      val l = Tables.table(s, dir, "lineitem")
      val p = Tables.table(s, dir, "part")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 10) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity") < 10))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"), count(lit(1)).as("n"))
    },

    // Q7 shape: bidirectional nation-pair trade volume by year.
    Q(
      "q83_tpch_q7_flows",
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         |  EXTRACT(year FROM l.l_shipdate) AS ship_year,
         |  ${revenueSumSql("l.l_extendedprice", "l.l_discount")} AS volume
         |FROM lineitem l
         |JOIN supplier sup ON l.l_suppkey = sup.s_suppkey
         |JOIN nation sn ON sup.s_nationkey = sn.n_nationkey
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         |WHERE sn.n_name <> cn.n_name
         |GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l.l_shipdate)
         |HAVING COUNT(*) > 50
         |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin) { (s, dir) =>
      val l = Tables.table(s, dir, "lineitem")
      val sup = Tables.table(s, dir, "supplier")
      val sn = Tables.table(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val o = Tables.table(s, dir, "orders")
      val c = Tables.table(s, dir, "customer")
      val cn = Tables.table(s, dir, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("bigint").as("ship_year"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("volume"), count(lit(1)).as("cnt"))
        .filter(col("cnt") > 50)
        .drop("cnt")
        .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
    },

    // Correlated scalar subquery (decorrelated by Catalyst into a join):
    // customers above their own nation's average balance.
    Q(
      "q84_correlated_scalar",
      """SELECT c_custkey, c_nationkey FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         / COUNT(*)
        |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT c_custkey, c_nationkey FROM customer c
          |WHERE c_acctbal > (
          |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          |         / COUNT(*)
          |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
          |ORDER BY c_custkey""".stripMargin)
    },

    // Statistical moments — rounded to absorb accumulation-order noise in
    // the (mathematically identical) two engines.
    Q(
      "q85_stat_moments",
      """SELECT o_orderpriority,
        |  ROUND(STDDEV_SAMP(o_totalprice), 2) AS sd,
        |  ROUND(VAR_SAMP(o_totalprice), 0) AS vr,
        |  ROUND(CORR(o_totalprice, o_custkey), 4) AS price_cust_corr,
        |  ROUND(COVAR_SAMP(o_totalprice, o_custkey), 0) AS cv
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(stddev_samp(col("o_totalprice")), 2).as("sd"),
          round(var_samp(col("o_totalprice")), 0).as("vr"),
          round(corr(col("o_totalprice"), col("o_custkey")), 4)
            .as("price_cust_corr"),
          round(covar_samp(col("o_totalprice"), col("o_custkey")), 0).as("cv"))
        .orderBy(col("o_orderpriority"))
    },

    // Deterministic collect: array_sort(collect_list) — THE way to get a
    // reproducible list aggregate out of a distributed engine.
    Q(
      "q86_sorted_collect",
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(c_mktsegment)), ',') AS segments
        |FROM (SELECT c_nationkey, c_mktsegment FROM customer
        |      WHERE c_custkey <= 100)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "customer")
        .filter(col("c_custkey") <= 100)
        .groupBy(col("c_nationkey"))
        // gate projection joins the sorted list to one scalar — the
        // driver's pandas compare can't sort raw array cells
        .agg(array_join(array_sort(collect_list(col("c_mktsegment"))), ",")
          .as("segments"))
        .orderBy(col("c_nationkey"))
    })
}
