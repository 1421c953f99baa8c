package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Analytical query shapes over the star schema (SURVEY §2.4 superset +
  * §2.6 capability superset: sort/limit/top-k, window functions).
  *
  * These are the bench-bearing queries: multi-way joins (broadcast small
  * dims, shuffle the facts), partial+final hash aggregation, window
  * evaluation. All double outputs are rounded to 2 decimals — the inputs
  * are 2-decimal money values, so the rounded sum is exact regardless of
  * float summation order (oracle-hash-stable by construction).
  */
object TpchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pricing-summary aggregation (partial+final HashAggregate over the
    // biggest fact table; the A1 rollup shape minus time).
    "q_agg_pricing" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          count(lit(1)).as("count_order"))
    }),

    // Multi-way join: facts shuffle-join, dims broadcast; revenue per nation.
    "q_join_revenue_nation" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .select("region_name", "nation_name", "revenue", "n")
    }),

    // §2.6 superset: global top-k (order by + limit) with deterministic
    // tie-break on the rounded measure.
    "q_topk_customers" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val rev = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      // Distributed top-k: orderBy+limit plans as TakeOrderedAndProject
      // (per-partition heaps + driver merge of k rows — no global sort, no
      // single-partition window over the full aggregate). The row_number
      // window then runs over just the k survivors.
      val top = rev.orderBy(col("revenue").desc, col("c_custkey")).limit(10)
      val w = Window.orderBy(col("revenue").desc, col("c_custkey"))
      top.withColumn("rnk", row_number().over(w).cast("long"))
        .select("rnk", "c_custkey", "c_name", "revenue")
    }),

    // §2.6 superset: partitioned window function — top-3 customers per
    // nation by account balance.
    "q_window_top3_per_nation" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val w = Window.partitionBy(col("n_name"))
        .orderBy(round(col("c_acctbal"), 2).desc, col("c_custkey"))
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("n_name").as("nation_name"), col("rnk").cast("long").as("rnk"),
          col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
    }),

    // §2.4 superset: multi-level ROLLUP (region -> nation -> total) in one
    // pass — Catalyst expands grouping sets before the single shuffle.
    "q_agg_rollup" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name").as("region_name"), col("n_name").as("nation_name"))
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("sum_bal"))
    }),

    // §2.4 superset: full CUBE over two dimensions (all 4 grouping sets in
    // one shuffle).
    "q_agg_cube" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
    }),

    // §2.4 superset: exact distinct aggregation (expands to two-phase
    // aggregate; the approx_count_distinct variant is engine-built-in).
    "q_agg_distinct" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"))
    }),

    // Semi-join shape on facts: orders that have at least one high-discount line.
    "q_semijoin_orders" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).filter(col("l_discount") >= 0.09)
      Tables.orders(s, dir)
        .join(li.select("l_orderkey").distinct(), col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)),2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)),2) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2""".stripMargin,

    "q_join_revenue_nation" ->
      """SELECT r.r_name AS region_name, n.n_name AS nation_name,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)),2) AS revenue,
        |  count(*) AS n
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    "q_topk_customers" ->
      """SELECT * FROM (
        |  SELECT row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rnk,
        |         c_custkey, c_name, revenue
        |  FROM (SELECT c.c_custkey, c.c_name,
        |          round(sum(l.l_extendedprice * (1 - l.l_discount)),2) AS revenue
        |        FROM lineitem l
        |        JOIN orders o ON l.l_orderkey = o.o_orderkey
        |        JOIN customer c ON o.o_custkey = c.c_custkey
        |        GROUP BY 1, 2) rev
        |) ranked WHERE rnk <= 10""".stripMargin,

    "q_window_top3_per_nation" ->
      """SELECT * FROM (
        |  SELECT n.n_name AS nation_name,
        |         row_number() OVER (PARTITION BY n.n_name ORDER BY round(c.c_acctbal,2) DESC, c.c_custkey) AS rnk,
        |         c.c_custkey, round(c.c_acctbal,2) AS acctbal
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |) ranked WHERE rnk <= 3""".stripMargin,

    "q_agg_rollup" ->
      """SELECT r.r_name AS region_name, n.n_name AS nation_name,
        |  count(*) AS n, round(sum(c.c_acctbal),2) AS sum_bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r.r_name, n.n_name)""".stripMargin,

    "q_agg_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,

    "q_agg_cube" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |  count(*) AS n, round(sum(o_totalprice),2) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "q_semijoin_orders" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.09)
        |GROUP BY 1""".stripMargin
  )
}
