package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import QueryUtils._

/** Relational query battery over the TPC-H-ish test tables.
  *
  * Every query is written Spark-first (DataFrame API → Catalyst), with an
  * equivalent DuckDB SQL oracle in [[graft.SparkEntry.oracleSql]]. Scale
  * design notes per query:
  *   - Dimension joins (`region`, `nation`, `supplier`, filtered `customer`)
  *     are explicitly `broadcast()` — at 100 TB the fact side never shuffles
  *     for those joins.
  *   - Aggregations are plain `groupBy.agg` so Catalyst plans partial
  *     (map-side) aggregation before the exchange.
  *   - Every query ends with a total order on a unique key so results are
  *     deterministic for the hash compare; top-k uses order+limit which Spark
  *     executes as TakeOrderedAndProject (no global sort materialization).
  *   - Filters/projections sit directly on the parquet read so they reach the
  *     scan as PushedFilters/ReadSchema.
  */
object Relational {

  /** TPC-H Q1: pricing summary report (filter → groupBy → exact-decimal aggs). */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(D2) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       ${sqlDsum("l_quantity")} AS sum_qty,
       ${sqlDsum("l_extendedprice")} AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       ${sqlDavg("l_quantity")} AS avg_qty,
       ${sqlDavg("l_discount")} AS avg_disc,
       COUNT(*) AS count_order
       FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""

  /** Selective scan: filter + projection pushed into the parquet read. */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45 && to_date(col("l_shipdate")) >= lit("2000-01-01"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem WHERE l_quantity > 45 AND CAST(l_shipdate AS DATE) >= DATE '2000-01-01'
       ORDER BY l_orderkey, l_linenumber"""

  /** TPC-H Q3: shipping priority — 3-way join. NO forced broadcast
    * anywhere: the segment-filtered customer key set is ~1/5 of
    * `customer`, which grows linearly with SF (~3B keys at sf100k), so a
    * baked-in hint would OOM the build side at scale. AQE broadcasts it
    * wherever it measures under the threshold (it does at bench SF) and
    * falls back to a shuffle join when it doesn't — the right call both
    * times. orders⋈lineitem shuffles on the join key. */
  def q03TopOrders(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, d)
      .filter(to_date(col("o_orderdate")) < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(D2) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING' AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
       GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** TPC-H Q4-ish: order priority checking via left-semi join (EXISTS). */
  def q04OrderPriority(s: SparkSession, d: String): DataFrame = {
    val bigLines = Tables.lineitem(s, d).filter(col("l_quantity") >= 48)
      .select("l_orderkey")
    Tables.orders(s, d)
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** TPC-H Q5: local supplier volume — 6-table star join. Only the
    * CONSTANT-size dims (nation: 25 rows, region: 5 rows at any SF) carry
    * broadcast hints; customer and supplier grow with the table, so their
    * joins are left to stats/AQE — which still broadcasts them wherever
    * they measure small, without baking an OOM into the plan at 100×. */
  def q05LocalSupplier(s: SparkSession, d: String): DataFrame = {
    val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, d)
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(s, d)
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
        to_date(col("o_orderdate")) < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(D2) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q05Sql: String =
    """SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA' AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
         AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
       GROUP BY n_name ORDER BY revenue DESC, n_name"""

  /** TPC-H Q6: forecasting revenue change — pure scan-side filter + one agg. */
  def q06ForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
        to_date(col("l_shipdate")) < lit("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"))

  val q06Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
         AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"""

  /** Window function: top-3 orders per customer by total price. */
  def q07WindowTopN(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  val q07Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) t
       WHERE rn <= 3 ORDER BY o_custkey, rn"""

  /** Set operation: customers with open orders but no finished orders. */
  def q08SetOp(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    ord.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .except(ord.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  val q08Sql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       ORDER BY o_custkey"""

  /** Distinct aggregation: per-segment distinct nation + customer counts. */
  def q09DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(
        countDistinct(col("c_nationkey")).as("nations"),
        count(lit(1)).as("customers"),
        dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")

  val q09Sql: String =
    s"""SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS nations,
       COUNT(*) AS customers, ${sqlDsum("c_acctbal")} AS sum_bal
       FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Anti join: customers with no urgent finished orders (NOT EXISTS). */
  def q10AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  val q10Sql: String =
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                         AND o_orderstatus = 'F' AND o_orderpriority = '1-URGENT')
       ORDER BY c_custkey"""

  /** Conditional aggregation over the events stream table. */
  def q11EventsByType(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("users"),
        max(col("value")).as("max_value"))
      .orderBy("event_type")

  val q11Sql: String =
    s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value,
       COUNT(DISTINCT user_id) AS users, MAX(value) AS max_value
       FROM events GROUP BY event_type ORDER BY event_type"""

  /** Time-bucketed aggregation: daily event rollup (streaming-style tumbling
    * window semantics expressed as a batch groupBy on the truncated key). */
  def q12EventsDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("users"))
      .orderBy("day")

  val q12Sql: String =
    s"""SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
       ${sqlDsum("value")} AS sum_value, COUNT(DISTINCT user_id) AS users
       FROM events GROUP BY CAST(ts AS DATE) ORDER BY day"""

  /** Rollup: hierarchical aggregate over region→nation (grouping sets). */
  def q13Rollup(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("customers"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  val q13Sql: String =
    s"""SELECT r_name, n_name, COUNT(*) AS customers, ${sqlDsum("c_acctbal")} AS sum_bal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (r_name, n_name)
       ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""

  /** Cube: all grouping-set combinations over two dimensions. */
  def q19Cube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val q19Sql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       ${sqlDsum("o_totalprice")} AS sum_price
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""

  /** Explicit GROUPING SETS — the shape rollup/cube cannot express: each
    * dimension aggregated SEPARATELY plus the grand total, in one pass
    * (one shuffle; Spark expands the sets map-side, same as rollup). */
  def q27GroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val q27Sql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       ${sqlDsum("o_totalprice")} AS sum_price
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT — "top-2
    * nations by customers, per region", the shape where the inner query's
    * result depends on the outer row and a window-rank rewrite is the
    * plan Catalyst decorrelates it into (rank ≤ 2 over a single shuffle —
    * no per-row re-execution at any scale). Exercises Spark's SQL LATERAL
    * surface end-to-end against DuckDB's. */
  def q28Lateral(s: SparkSession, d: String): DataFrame = {
    Tables.region(s, d).createOrReplaceTempView("q28_region")
    Tables.nation(s, d).createOrReplaceTempView("q28_nation")
    Tables.customer(s, d).createOrReplaceTempView("q28_customer")
    s.sql("""SELECT r.r_name, l.n_name, l.n_customers
      FROM q28_region r,
      LATERAL (SELECT n.n_name, COUNT(*) AS n_customers
        FROM q28_nation n JOIN q28_customer c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY n_customers DESC, n.n_name
        LIMIT 2) l
      ORDER BY r.r_name, l.n_customers DESC, l.n_name""")
  }

  val q28Sql: String =
    """SELECT r.r_name, l.n_name, l.n_customers
       FROM region r, LATERAL (
         SELECT n.n_name, COUNT(*) AS n_customers
         FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
         WHERE n.n_regionkey = r.r_regionkey
         GROUP BY n.n_name
         ORDER BY n_customers DESC, n.n_name
         LIMIT 2) l
       ORDER BY r.r_name, l.n_customers DESC, l.n_name"""

  /** Scalar function battery: string/math/date functions row-wise. */
  def q14Scalar(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_pfx"),
        round(col("p_retailprice"), 1).as("price_r"),
        (col("p_size") % 7).as("size_mod"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  val q14Sql: String =
    """SELECT p_partkey, UPPER(p_brand) AS brand_u, LENGTH(p_name) AS name_len,
       SUBSTRING(p_type, 1, 5) AS type_pfx, ROUND(p_retailprice, 1) AS price_r,
       p_size % 7 AS size_mod, CONCAT_WS('-', p_brand, p_type) AS brand_type
       FROM part ORDER BY p_partkey"""

  /** IN-subquery semi join: orders from customers in big segments. No
    * broadcast hint on the probe side — two of five market segments is
    * ~40% of `customer`, unbounded in table size; AQE picks broadcast
    * where it actually measures small. */
  def q16InSubquery(s: SparkSession, d: String): DataFrame = {
    val bigSegCust = Tables.customer(s, d)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select("c_custkey")
    Tables.orders(s, d)
      .join(bigSegCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  val q16Sql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
       FROM orders WHERE o_custkey IN (
         SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY'))
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Correlated-aggregate comparison (TPC-H Q17 shape): lineitems under 30%
    * of their part's average quantity. Computed as a WINDOW over
    * l_partkey (r18, guide §2.4): the per-part average is an unbounded
    * whole-partition frame, so lineitem crosses ONE exchange — the former
    * agg + re-join shape shuffled lineitem twice (partial agg + join
    * probe side) and paid a sort-merge join. The average is the same
    * exact-decimal sum / count in both shapes, so the filter decisions —
    * and the result — are bit-identical. */
  def q17AvgCompare(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .withColumn("avg_qty",
        sum(dec(col("l_quantity"))).over(w).cast("double") /
          count(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(0.3) * col("avg_qty"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
  }

  val q17Sql: String =
    s"""SELECT COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS sum_price
       FROM lineitem l1 WHERE l_quantity < 0.3 * (
         SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity)
         FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)"""

  /** GROUP BY ... HAVING: large-volume customers (TPC-H Q18 shape). */
  def q18Having(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 230)
      .orderBy(col("sum_qty").desc, col("l_orderkey"))

  val q18Sql: String =
    s"""SELECT l_orderkey, ${sqlDsum("l_quantity")} AS sum_qty FROM lineitem
       GROUP BY l_orderkey HAVING ${sqlDsum("l_quantity")} > 230
       ORDER BY sum_qty DESC, l_orderkey"""

  /** Min/max/count summary stats (order-independent, exact on doubles). */
  def q15MinMax(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        min(to_date(col("l_shipdate"))).as("min_ship"),
        max(to_date(col("l_shipdate"))).as("max_ship"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val q15Sql: String =
    """SELECT l_returnflag, MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price, MIN(CAST(l_shipdate AS DATE)) AS min_ship,
       MAX(CAST(l_shipdate AS DATE)) AS max_ship, COUNT(*) AS n
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Batch sessionization over the event stream: a session break is a
    * >30-minute gap between a user's consecutive events (lag window),
    * session ids are the running sum of breaks, then a two-level rollup to
    * per-user session stats. The batch twin of the
    * mapGroupsWithState streaming sessionizer (EventStreams).
    *
    * Scale shape: ONE shuffle on user_id; both windows and the first
    * rollup run inside that partitioning (Catalyst reuses the exchange),
    * and all outputs are exact integers. */
  def q20Sessionization(s: SparkSession, d: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy("user_id").orderBy("tu", "event_id")
    val marked = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tu"))
      .withColumn("new_s",
        when(lag(col("tu"), 1).over(w).isNull ||
          col("tu") - lag(col("tu"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy("user_id", "sess").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(sum("n").as("n_events"), count(lit(1)).as("n_sessions"),
        max("n").as("max_session_events"))
      .orderBy("user_id")
  }

  /** Semi-structured extraction: pull a typed field out of the JSON props
    * column and aggregate it per event type — the JSON-sidecar pattern of
    * event pipelines. `get_json_object` is codegen'd; the aggregation is
    * map-side combined on a low-cardinality key. */
  def q21JsonExtract(s: SparkSession, d: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, d)
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")
  }

  val q21Sql: String =
    """SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
       FROM events GROUP BY event_type ORDER BY event_type"""

  val q20Sql: String =
    """WITH m AS (
         SELECT user_id, event_id, epoch_us(ts) AS tu,
           CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) > 1800000000
                THEN 1 ELSE 0 END AS new_s
         FROM events),
       s AS (
         SELECT user_id,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY tu, event_id
             ROWS UNBOUNDED PRECEDING) AS sess
         FROM m),
       c AS (SELECT user_id, sess, COUNT(*) AS n FROM s GROUP BY user_id, sess)
       SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
              COUNT(*) AS n_sessions, CAST(MAX(n) AS BIGINT) AS max_session_events
       FROM c GROUP BY user_id ORDER BY user_id"""

  /** As-of join — the operator Spark lacks natively (attribution: each
    * purchase matched to the user's most recent click at or before it).
    *
    * Spark-first shape: instead of a per-purchase subquery or a range
    * join, clicks and purchases are UNIONED and sorted once per user —
    * `last(ignoreNulls)` over the running window carries the latest click
    * timestamp forward to each purchase. ONE shuffle on user_id total,
    * O(n log n) in each user's events, no join explosion; at 100× the
    * window state is still one row. Ties (click at the purchase's exact
    * timestamp) sort before the purchase, matching the oracle's `>=`.
    * The gap — not the click id — is emitted so equal-timestamp click
    * ties cannot make the result engine-dependent. */
  def q22AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"))
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("kind", when(col("event_type") === "click", 0).otherwise(1))
    val w = Window.partitionBy("user_id").orderBy("tu", "kind", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_click_tu",
        last(when(col("kind") === 0, col("tu")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"),
        col("last_click_tu").isNotNull.as("attributed"),
        (col("tu") - col("last_click_tu")).as("gap_us"))
      .orderBy("event_id")
  }

  val q22Sql: String =
    """SELECT p.event_id, p.user_id,
              (c.event_id IS NOT NULL) AS attributed,
              epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
         ON p.user_id = c.user_id AND p.ts >= c.ts
       ORDER BY p.event_id"""

  /** Range (band) join: each event matched to the value band containing
    * it — the canonical interval-dimension join (rate tables, SLA tiers,
    * histogram bands). The band table is generated, tiny, and BROADCAST:
    * the fact side streams through a nested-loop probe of k intervals
    * map-only, no shuffle, no cartesian blowup — the right plan at any
    * fact scale while bands stay O(k). */
  def q23RangeJoin(s: SparkSession, d: String): DataFrame = {
    val bands = s.range(0, 20).select(col("id").as("band_id"),
      (col("id") * 50.0).as("lo"), ((col("id") + 1) * 50.0).as("hi"))
    Tables.events(s, d)
      .join(broadcast(bands),
        col("value") >= col("lo") && col("value") < col("hi"), "inner")
      .groupBy("band_id")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("band_id")
  }

  val q23Sql: String =
    s"""SELECT b.band_id, COUNT(*) AS n, ${sqlDsum("e.value")} AS sum_value
       FROM events e
       JOIN (SELECT range AS band_id, range * 50.0 AS lo,
                    (range + 1) * 50.0 AS hi FROM range(0, 20)) b
         ON e.value >= b.lo AND e.value < b.hi
       GROUP BY b.band_id ORDER BY b.band_id"""

  /** Exact interpolated percentiles per event type (Spark's `percentile`
    * and SQL's `percentile_cont` share the same linear-interpolation
    * definition, so the values are engine-identical on identical data —
    * no sketch divergence). One shuffle on the low-cardinality group key;
    * per-group work is the sort Spark's aggregate does internally. */
  def q24Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"))
      .orderBy("event_type")

  val q24Sql: String =
    """SELECT event_type, COUNT(*) AS n,
              ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS p50,
              ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY value), 6) AS p95
       FROM events GROUP BY event_type ORDER BY event_type"""

  /** Frame-window time-series analytics: per-user 5-row moving average and
    * row-to-row delta over the purchase stream (lag + ROWS frame — the
    * window shapes q07/q20/q22 don't cover). Sums run in exact decimal
    * space inside the frame, so the moving average is engine-identical.
    *
    * Scale shape: ONE shuffle on user_id; the frame window and the lag
    * window share the same partitioning+ordering, so Catalyst evaluates
    * both in a single Window node over a single sort — no second
    * exchange. */
  def q25MovingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tu", "event_id")
    val wf = w.rowsBetween(-4, Window.currentRow)
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tu"), dec(col("value")).as("v"))
      .withColumn("mov_avg",
        sum(col("v")).over(wf).cast("double") / count(lit(1)).over(wf))
      .withColumn("delta", (col("v") - lag(col("v"), 1).over(w)).cast("double"))
      .select(col("event_id"), col("user_id"),
        col("v").cast("double").as("value"), col("mov_avg"), col("delta"))
      .orderBy("event_id")
  }

  val q25Sql: String =
    """SELECT event_id, user_id, CAST(v AS DOUBLE) AS value,
              CAST(SUM(v) OVER wf AS DOUBLE) / COUNT(*) OVER wf AS mov_avg,
              CAST(v - LAG(v) OVER w AS DOUBLE) AS delta
       FROM (SELECT event_id, user_id, epoch_us(ts) AS tu,
                    CAST(value AS DECIMAL(18,2)) AS v
             FROM events WHERE event_type = 'purchase')
       WINDOW w  AS (PARTITION BY user_id ORDER BY tu, event_id),
              wf AS (PARTITION BY user_id ORDER BY tu, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
       ORDER BY event_id"""

  /** Correlated existence predicates: customers with at least one
    * high-value order (EXISTS) and no 'F'-status order (NOT EXISTS) —
    * the classic correlated-subquery pair, planned Spark-first as a
    * left-semi join chained with a left-anti join (what Catalyst's
    * RewritePredicateSubquery produces for EXISTS/NOT EXISTS).
    *
    * Scale shape: both joins shuffle on o_custkey/c_custkey with the
    * order-side filters pushed to the scans; each order side is
    * key-only (one column) by the time it reaches its exchange. */
  def q26Exists(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val orders = Tables.orders(s, d)
    val bigSpenders = orders.filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey"))
    val fStatus = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    c.join(bigSpenders, c("c_custkey") === bigSpenders("o_custkey"), "left_semi")
      .join(fStatus, c("c_custkey") === fStatus("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment", "c_nationkey")
      .orderBy("c_custkey")
  }

  val q26Sql: String =
    """SELECT c_custkey, c_mktsegment, c_nationkey
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
       ORDER BY c_custkey"""

  /** PIVOT: daily event counts spread into one column per event type.
    * The pivot values are EXPLICIT — with an inferred value list Spark runs
    * an extra distinct-collect job over the fact table before planning; the
    * explicit list keeps this a single pass (one partial-agg shuffle on the
    * day key, then a map-side conditional projection — same cost as a plain
    * groupBy at any scale). */
  def q29Pivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map("click" -> "n_click", "error" -> "n_error",
        "purchase" -> "n_purchase", "signup" -> "n_signup", "view" -> "n_view"))
      .orderBy("day")

  val q29Sql: String =
    """SELECT CAST(ts AS DATE) AS day,
       COUNT(*) FILTER (event_type = 'click') AS n_click,
       COUNT(*) FILTER (event_type = 'error') AS n_error,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (event_type = 'view') AS n_view
       FROM events GROUP BY CAST(ts AS DATE) ORDER BY day"""

  /** UNPIVOT (melt): wide lineitem measures to long (measure, value) rows,
    * then aggregate per measure. The unpivot itself is a row-local Expand —
    * zero shuffle, output rows = input × measures — so the only exchange is
    * the 3-group aggregate after it; at 100 TB the Expand never
    * materializes (it feeds the partial agg inside the same codegen stage). */
  def q30Unpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "value")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"),
        max(col("value")).as("max_value"))
      .orderBy("measure")

  val q30Sql: String =
    s"""WITH melted AS (
         SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
         UNION ALL
         SELECT l_orderkey, 'l_discount', l_discount FROM lineitem)
       SELECT measure, COUNT(*) AS n, ${sqlDsum("value")} AS total,
              MAX(value) AS max_value
       FROM melted GROUP BY measure ORDER BY measure"""
}
