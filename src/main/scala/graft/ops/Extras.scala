package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Depth batch: subqueries, string-function panel, conditionals, pivot,
  * TPC-H classic shapes, and Spark 4 VARIANT JSON access — rounding out
  * the SQL surface the reference's generated queries can reach.
  */
object Extras {
  import Det._

  val queries: Seq[Q] = Seq(
    // Scalar subquery (uncorrelated): exact decimal average so both
    // engines agree on the boundary.
    Q(
      "q66_scalar_subquery",
      """SELECT o_orderstatus, COUNT(*) AS n
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / COUNT(*) FROM orders)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus, COUNT(*) AS n
          |FROM orders
          |WHERE o_totalprice > (
          |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |         / COUNT(*) FROM orders)
          |GROUP BY o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin)
    },

    // IN subquery (rewritten by Catalyst to a semi join).
    Q(
      "q67_in_subquery",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_nationkey IN (
        |  SELECT s_nationkey FROM supplier WHERE s_acctbal > 3000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT c_custkey, c_name FROM customer
          |WHERE c_nationkey IN (
          |  SELECT s_nationkey FROM supplier WHERE s_acctbal > 3000)
          |ORDER BY c_custkey""".stripMargin)
    },

    // String-function panel (S12 extended).
    Q(
      "q68_string_panel",
      """SELECT p_partkey,
        |  substr(p_name, 1, 5) AS name5,
        |  replace(p_name, ' ', '_') AS snake,
        |  regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        |  levenshtein(p_name, 'small widget') AS lev,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  lpad(CAST(p_size AS VARCHAR), 3, '0') AS size3,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  reverse(p_name) AS rname
        |FROM part
        |WHERE p_partkey < 50
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "part")
        .filter(col("p_partkey") < 50)
        .select(col("p_partkey"),
          substring(col("p_name"), 1, 5).as("name5"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
          levenshtein(col("p_name"), lit("small widget")).as("lev"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          lpad(col("p_size").cast("string"), 3, "0").as("size3"),
          expr("split_part(p_type, ' ', 1)").as("type_head"),
          reverse(col("p_name")).as("rname"))
        .orderBy(col("p_partkey"))
    },

    // Conditionals: CASE / COALESCE / NULLIF / GREATEST / LEAST.
    Q(
      "q69_conditionals",
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'debtor'
        |       WHEN c_acctbal < 5000 THEN 'regular'
        |       ELSE 'premium' END AS tier,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULTED') AS seg_or_default,
        |  GREATEST(c_acctbal, 0.0) AS bal_floor,
        |  LEAST(CAST(c_nationkey AS BIGINT), 10) AS nation_cap
        |FROM customer
        |WHERE c_custkey <= 200
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "customer")
        .filter(col("c_custkey") <= 200)
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "debtor")
            .when(col("c_acctbal") < 5000, "regular")
            .otherwise("premium").as("tier"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
            lit("DEFAULTED")).as("seg_or_default"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
          least(col("c_nationkey").cast("bigint"), lit(10)).as("nation_cap"))
        .orderBy(col("c_custkey"))
    },

    // Pivot: segments → columns. Spark's pivot yields NULL for absent
    // combinations; both sides coalesce to 0 for hash-stability.
    Q(
      "q70_pivot",
      """SELECT c_nationkey,
        |  COALESCE(COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE'), 0) AS AUTOMOBILE,
        |  COALESCE(COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING'), 0) AS BUILDING,
        |  COALESCE(COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY'), 0) AS MACHINERY
        |FROM customer
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      val piv = Tables.table(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .pivot("c_mktsegment", Seq("AUTOMOBILE", "BUILDING", "MACHINERY"))
        .agg(count(lit(1)))
      piv.select(col("c_nationkey"),
          coalesce(col("AUTOMOBILE"), lit(0L)).as("AUTOMOBILE"),
          coalesce(col("BUILDING"), lit(0L)).as("BUILDING"),
          coalesce(col("MACHINERY"), lit(0L)).as("MACHINERY"))
        .orderBy(col("c_nationkey"))
    },

    // TPC-H Q3 shape (shipping priority): segment-filtered 3-way join,
    // revenue top-10. Date literals pin the unshipped window.
    Q(
      "q71_tpch_q3_shape",
      s"""SELECT l.l_orderkey,
         |  ${revenueSumSql("l.l_extendedprice", "l.l_discount")} AS revenue,
         |  o.o_orderdate
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
         |  AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
         |GROUP BY l.l_orderkey, o.o_orderdate
         |ORDER BY revenue DESC, l.l_orderkey ASC
         |LIMIT 10""".stripMargin) { (s, dir) =>
      val c = Tables.table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.table(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-03-15 00:00:00").cast("timestamp"))
      val l = Tables.table(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-03-15 00:00:00").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // TPC-H Q10 shape (returned items → top customers by lost revenue).
    Q(
      "q72_tpch_q10_shape",
      s"""SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
         |  ${revenueSumSql("l.l_extendedprice", "l.l_discount")} AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE l.l_returnflag = 'R'
         |GROUP BY c.c_custkey, c.c_name, n.n_name
         |ORDER BY revenue DESC, c.c_custkey ASC
         |LIMIT 20""".stripMargin) { (s, dir) =>
      val c = Tables.table(s, dir, "customer")
      val o = Tables.table(s, dir, "orders")
      val l = Tables.table(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
      val n = Tables.table(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(c("c_custkey"), c("c_name"), n("n_name").as("nation_name"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // Spark 4 VARIANT: parse_json + variant_get — the modern semi-
    // structured path (reference's json_extract world, S13, upgraded).
    Q(
      "q73_variant_json",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE event_id < 100
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT event_id,
          |  variant_get(parse_json(props), '$.k', 'bigint') AS k
          |FROM events
          |WHERE event_id < 100
          |ORDER BY event_id""".stripMargin)
    })
}
