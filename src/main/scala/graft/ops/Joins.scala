package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Join surface (SURVEY.md §2.2 S7): the reference whitelists JOIN / LEFT /
  * RIGHT / INNER / OUTER / ON (query_llm.py:254-255) though its own single
  * table never exercises them; the harness proves them on the TPC-H-ish
  * star schema.
  *
  * Scale design: dimension tables (region/nation/customer/supplier/part)
  * are broadcast — no shuffle of the fact side; fact-fact joins
  * (lineitem⋈orders) shuffle on the join key once and AQE handles skew.
  * At 100 TB the only data movement is the one fact shuffle.
  */
object Joins {
  import Det._

  val queries: Seq[Q] = Seq(
    // Inner join chain through the dim hierarchy; every join broadcast.
    Q(
      "q10_join_inner_broadcast",
      s"""SELECT r.r_name AS region_name, COUNT(*) AS n_customers,
         |  ${moneySumSql("c.c_acctbal")} AS total_acctbal
         |FROM customer c
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY r.r_name
         |ORDER BY r.r_name""".stripMargin) { (s, dir) =>
      val c = Tables.table(s, dir, "customer")
      val n = Tables.table(s, dir, "nation")
      val r = Tables.table(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name").as("region_name"))
        .agg(count(lit(1)).as("n_customers"),
          moneySum(col("c_acctbal")).as("total_acctbal"))
        .orderBy(col("region_name"))
    },

    // LEFT OUTER: customers with zero orders are preserved (count = 0).
    Q(
      "q11_join_left_outer",
      """SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        |FROM customer c
        |LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey
        |ORDER BY c.c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.table(s, dir, "customer")
      val o = Tables.table(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },

    // LEFT SEMI = EXISTS: customers having at least one open order. The
    // semi join never materializes the right side's columns — at scale the
    // probe side streams and only a key set is kept.
    Q(
      "q12_join_semi",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.table(s, dir, "customer")
      val o = Tables.table(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // LEFT ANTI = NOT EXISTS: customers with no pending ('P') order.
    Q(
      "q13_join_anti",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.table(s, dir, "customer")
      val o = Tables.table(s, dir, "orders")
        .filter(col("o_orderstatus") === "P")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Theta (non-equi) self-join: unordered nation pairs within a region.
    // Tiny inputs → Catalyst picks broadcast-nested-loop, the right call;
    // a large theta join would need a range-bucketing rewrite (see
    // TimeSeries.q31 for the banded variant).
    Q(
      "q14_join_theta_pairs",
      """SELECT a.n_name AS nation_a, b.n_name AS nation_b
        |FROM nation a JOIN nation b
        |  ON a.n_regionkey = b.n_regionkey
        | AND a.n_nationkey < b.n_nationkey
        |ORDER BY nation_a, nation_b""".stripMargin) { (s, dir) =>
      val a = Tables.table(s, dir, "nation").alias("a")
      val b = Tables.table(s, dir, "nation").alias("b")
      a.join(b, col("a.n_regionkey") === col("b.n_regionkey") &&
          col("a.n_nationkey") < col("b.n_nationkey"))
        .select(col("a.n_name").as("nation_a"), col("b.n_name").as("nation_b"))
        .orderBy(col("nation_a"), col("nation_b"))
    },

    // Fact-fact shuffle join (lineitem⋈orders on orderkey) + dim broadcast:
    // the canonical big-data join shape. One shuffle on l_orderkey.
    Q(
      "q15_join_fact_fact",
      s"""SELECT o.o_orderpriority,
         |  ${revenueSumSql("l.l_extendedprice", "l.l_discount")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |WHERE o.o_orderstatus <> 'F'
         |GROUP BY o.o_orderpriority
         |ORDER BY o.o_orderpriority""".stripMargin) { (s, dir) =>
      val l = Tables.table(s, dir, "lineitem")
      val o = Tables.table(s, dir, "orders")
        .filter(col("o_orderstatus") =!= "F")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderpriority"))
        .agg(
          revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },

    // TPC-H Q5 shape: 5-way join, dims broadcast, one fact shuffle.
    Q(
      "q16_regional_volume",
      s"""SELECT n.n_name AS nation_name,
         |  ${revenueSumSql("l.l_extendedprice", "l.l_discount")} AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |WHERE r.r_name = 'ASIA'
         |GROUP BY n.n_name
         |ORDER BY nation_name""".stripMargin) { (s, dir) =>
      val c = Tables.table(s, dir, "customer")
      val o = Tables.table(s, dir, "orders")
      val l = Tables.table(s, dir, "lineitem")
      val n = Tables.table(s, dir, "nation")
      val r = Tables.table(s, dir, "region").filter(col("r_name") === "ASIA")
      // customer scales with the fact side (SF×150k) — shuffle it, do NOT
      // broadcast; only the constant-size dims (nation, region) broadcast.
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name").as("nation_name"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .orderBy(col("nation_name"))
    })
}
