package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.3 declared query inventory (Q01–Q20), expressed Spark-first
  * with the DataFrame API. Each query has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]] with identical column names and ordering.
  *
  * The reference delegates this entire surface to the host executor
  * (`/root/reference/cstore_fdw.c:1743-1750`); Spark SQL is the host
  * executor here, so these all compile to built-in, codegen'd operators.
  * Scale notes per query are inline: filters/projections push to the
  * parquet scan, small dimension tables are broadcast, aggregations use
  * partial (map-side) combine by construction.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Q01 scan + count (reference `sql/query.sql:9`). Metadata-only at scan:
    * parquet footers supply row counts, mirroring CStoreTableRowCount
    * (`cstore_reader.c:401-434`). */
  def q01Count(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  /** Q02 avg/stddev aggregate (`sql/query.sql:10`). */
  def q02AvgStddev(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      round(avg("l_quantity"), 4).as("avg_qty"),
      round(stddev_samp("l_quantity"), 4).as("std_qty"))

  /** Q03 filter + group + order (`sql/query.sql:11-12`). Filter is pushed to
    * the scan; hash aggregate does partial combine before the 1-column
    * shuffle (3 distinct keys → tiny exchange at any scale). */
  def q03FilterGroup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 25)
      .groupBy("l_returnflag")
      .agg(round(avg("l_extendedprice"), 4).as("avg_price"), count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** Q04 full-row sort + limit (`sql/query.sql:13`). Spark plans
    * TakeOrderedAndProject: per-partition top-100 then merge — no global
    * sort shuffle, scales to any row count. */
  def q04SortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
      .limit(100)

  /** Q05 top-k (`sql/query.sql:23`). */
  def q05TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Q06 range filter → block skipping (`input/block_filtering.source:40-51`).
    * The BETWEEN lands in parquet PushedFilters and prunes row groups via
    * min/max stats — the reference's zone-map skip (`cstore_reader.c:744-806`). */
  def q06RangeFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey").between(1000, 2000))
      .agg(count(lit(1)).as("cnt"))

  /** Q07 equality + LIKE + date range conjunction (reference README.md:238-247). */
  def q07LikeDateRange(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderpriority").like("1-%") &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .agg(count(lit(1)).as("cnt"))

  /** Q08 bucketized group (reference README.md:249-261, width_bucket). */
  def q08WidthBucket(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(width_bucket(length(col("p_name")), lit(1), lit(50), lit(5)).as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("b")

  /** Q09 UNION ALL of two scans (`sql/query.sql:26-34`). */
  def q09UnionAll(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
      .select((col("n_nationkey") * 1).as("x"), col("n_regionkey").as("y"))
    val r = t(s, dir, "region")
      .select((col("r_regionkey") + 100).as("x"), col("r_regionkey").as("y"))
    n.unionAll(r).orderBy("x", "y")
  }

  /** Q10 inner equi-join + agg (`sql/insert.sql:51-53`). orders⋈customer on
    * custkey: at 100 TB both sides are large → sort-merge/shuffled-hash on
    * the join key is correct; AQE picks broadcast when customer is small. */
  def q10Join(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").as("c")
      .join(t(s, dir, "orders").as("o"), col("c.c_custkey") === col("o.o_custkey"))
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("n_orders").desc, col("c_custkey"))
      .limit(20)

  /** Q11 multi-way join + agg — the flagship (reference README.md:48 Citus
    * analytics pattern). nation (25 rows) is broadcast explicitly; the
    * orders filter pushes to the scan before the big lineitem join. */
  def q11MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = t(s, dir, "lineitem")
    val n = t(s, dir, "nation")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      // revenue summed in exact integer cents: a raw double sum diverges
      // from the oracle in the ~10th significant digit at sf0.1 (addend
      // order), and round(...,2) exposes it
      .agg(round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")) / 100.0, 2).as("rev"))
      .orderBy(col("rev").desc, col("n_name"))
  }

  /** Q12 whole-row projection (`sql/query.sql:23` to_json analog; fields
    * hashed instead of engine-specific JSON text, per SURVEY §2.3). */
  def q12WholeRow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region").select("r_regionkey", "r_name").orderBy("r_regionkey")

  /** Q13 CTE + VALUES (`sql/alter.sql:7-12`). */
  def q13CteValues(s: SparkSession, dir: String): DataFrame =
    s.sql("WITH v AS (SELECT * FROM VALUES (1,2),(3,4) AS t(a,b)) " +
      "SELECT a+b AS sm FROM v ORDER BY sm")

  /** Q14 distinct (host surface). Partial distinct before the shuffle. */
  def q14Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** Q15a EXISTS → left-semi join (host surface). */
  def q15Semi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("cnt"))

  /** Q15b NOT EXISTS → left-anti join (host surface). */
  def q15Anti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt"))

  /** Q16 CASE expression + sum (host surface). */
  def q16CaseSum(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("n_disc"))

  /** Q17 window ranking (host surface). Window partitions by o_custkey —
    * one shuffle on the partition key, state bounded per key. */
  def q17WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey", "rn")
      .orderBy("o_custkey", "rn")
      .limit(50)
  }

  /** Q18 ROLLUP grouping sets (host surface). */
  def q18Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)

  /** Q19 INTERSECT (host surface). */
  def q19Intersect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select("o_custkey")
      .intersect(t(s, dir, "customer").select(col("c_custkey").as("o_custkey")))
      .orderBy("o_custkey")
      .limit(10)

  /** Q20 array functions (`input/data_types.source:12-19` analog). */
  def q20Array(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(size(array(col("l_orderkey"), col("l_partkey"))).cast("long").as("sz"))
      .groupBy("sz")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("sz")

  /** All core queries, keyed as they appear in SparkEntry. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_count" -> q01Count _,
    "q02_avg_stddev" -> q02AvgStddev _,
    "q03_filter_group" -> q03FilterGroup _,
    "q04_sort_limit" -> q04SortLimit _,
    "q05_topk" -> q05TopK _,
    "q06_range_filter" -> q06RangeFilter _,
    "q07_like_daterange" -> q07LikeDateRange _,
    "q08_width_bucket" -> q08WidthBucket _,
    "q09_union_all" -> q09UnionAll _,
    "q10_join_agg" -> q10Join _,
    "q11_multi_join" -> q11MultiJoin _,
    "q12_whole_row" -> q12WholeRow _,
    "q13_cte_values" -> q13CteValues _,
    "q14_distinct" -> q14Distinct _,
    "q15_semi_join" -> q15Semi _,
    "q15_anti_join" -> q15Anti _,
    "q16_case_sum" -> q16CaseSum _,
    "q17_window_rank" -> q17WindowRank _,
    "q18_rollup" -> q18Rollup _,
    "q19_intersect" -> q19Intersect _,
    "q20_array" -> q20Array _,
  )

  /** DuckDB oracle SQL — column names/aliases match the Spark results
    * exactly (the driver's compare sorts columns by name before hashing). */
  val oracles: Map[String, String] = Map(
    "q01_count" -> "SELECT count(*) AS cnt FROM lineitem",
    "q02_avg_stddev" ->
      ("SELECT round(avg(l_quantity),4) AS avg_qty, " +
        "round(stddev_samp(l_quantity),4) AS std_qty FROM lineitem"),
    "q03_filter_group" ->
      ("SELECT l_returnflag, round(avg(l_extendedprice),4) AS avg_price, " +
        "count(*) AS cnt FROM lineitem WHERE l_quantity > 25 " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q04_sort_limit" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_orderkey LIMIT 100"),
    "q05_topk" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
    "q06_range_filter" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2000",
    "q07_like_daterange" ->
      ("SELECT count(*) AS cnt FROM orders WHERE o_orderpriority LIKE '1-%' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01'"),
    "q08_width_bucket" ->
      ("SELECT CAST(CASE WHEN length(p_name) < 1 THEN 0 " +
        "WHEN length(p_name) >= 50 THEN 6 " +
        "ELSE (length(p_name)-1)*5//49 + 1 END AS INT) AS b, " +
        "count(*) AS cnt FROM part GROUP BY b ORDER BY b"),
    "q09_union_all" ->
      ("SELECT x, y FROM (" +
        "SELECT n_nationkey * 1 AS x, n_regionkey AS y FROM nation " +
        "UNION ALL " +
        "SELECT r_regionkey + 100 AS x, r_regionkey AS y FROM region) t " +
        "ORDER BY x, y"),
    "q10_join_agg" ->
      ("SELECT c.c_custkey, count(o.o_orderkey) AS n_orders " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "GROUP BY c.c_custkey ORDER BY n_orders DESC, c.c_custkey LIMIT 20"),
    "q11_multi_join" ->
      ("SELECT n.n_name, round(CAST(sum(CAST(round(l.l_extendedprice * " +
        "(1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0, 2) AS rev " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
        "JOIN nation n ON c.c_nationkey = n.n_nationkey " +
        "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o.o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY n.n_name ORDER BY rev DESC, n.n_name"),
    "q12_whole_row" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q13_cte_values" ->
      "WITH v(a,b) AS (VALUES (1,2),(3,4)) SELECT a+b AS sm FROM v ORDER BY sm",
    "q14_distinct" ->
      ("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem " +
        "ORDER BY l_returnflag, l_linestatus"),
    "q15_semi_join" ->
      ("SELECT count(*) AS cnt FROM customer c WHERE EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"),
    "q15_anti_join" ->
      ("SELECT count(*) AS cnt FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"),
    "q16_case_sum" ->
      ("SELECT CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_disc FROM lineitem"),
    "q17_window_rank" ->
      ("SELECT o_custkey, o_orderkey, rn FROM (" +
        "SELECT o_custkey, o_orderkey, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn " +
        "FROM orders) t WHERE rn <= 2 ORDER BY o_custkey, rn LIMIT 50"),
    "q18_rollup" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem " +
        "GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST"),
    "q19_intersect" ->
      ("SELECT o_custkey FROM (" +
        "SELECT o_custkey FROM orders INTERSECT " +
        "SELECT c_custkey AS o_custkey FROM customer) t " +
        "ORDER BY o_custkey LIMIT 10"),
    "q20_array" ->
      ("SELECT CAST(len([l_orderkey, l_partkey]) AS BIGINT) AS sz, count(*) AS cnt " +
        "FROM lineitem GROUP BY sz ORDER BY sz"),
  )
}
