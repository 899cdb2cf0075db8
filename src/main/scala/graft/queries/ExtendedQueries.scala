package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Extended host-executor surface (SURVEY.md §2.2 closing paragraph):
  * outer/semi/anti joins beyond Q15, grouping sets/cube, window frames,
  * EXCEPT, string/date/math/array/JSON scalar functions, conditionals.
  * All delegated surface in the reference (host executor's job,
  * `/root/reference/cstore_fdw.c:1743-1750`) — Spark built-ins here, each
  * with a DuckDB oracle. Double-typed running sums are integer-quantized
  * (x100) so results are exact under any execution order. */
object ExtendedQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q21: left outer join — customers with no orders per market segment. */
  def q21LeftJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .filter(col("o_orderkey").isNull)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("c_mktsegment")

  /** q22: full outer join of nation keys present in customers/suppliers. */
  def q22FullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
    val su = t(s, dir, "supplier").select(col("s_nationkey").as("nk2")).distinct()
    c.join(su, col("nk") === col("nk2"), "full_outer")
      .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
        col("nk").isNotNull.as("has_cust"), col("nk2").isNotNull.as("has_supp"))
      .orderBy("nationkey")
  }

  /** q23: CUBE over returnflag × linestatus. */
  def q23Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)

  /** q41: explicit GROUPING SETS — an asymmetric set list
    * ((returnflag, linestatus), (linestatus)) that neither ROLLUP (q18)
    * nor CUBE (q23) can express; the host executor's `Expand`-based
    * grouping-set machinery, one scan for both groupings. */
  def q41GroupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").cast("long").as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)

  /** q24: EXCEPT — customers that never ordered. */
  def q24Except(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey"))
      .except(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")
      .limit(20)

  /** q25: window frame — running order-value sum per customer (quantized). */
  def q25WindowFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("run_x100",
        sum(round(col("o_totalprice") * 100).cast("long")).over(w))
      .filter(col("o_custkey") <= 20)
      .select("o_custkey", "o_orderkey", "run_x100")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q26: string functions — upper/substr/replace/lpad/concat/trim. */
  def q26StringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        substring(col("p_name"), 1, 4).as("pre"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        lpad(col("p_brand"), 10, "#").as("pad"),
        concat_ws("|", col("p_type"), trim(col("p_brand"))).as("cat"),
        length(col("p_name")).cast("long").as("len"))
      .orderBy("p_partkey")
      .limit(100)

  /** q27: date functions — year/month/trunc-to-month bucket counts. */
  def q27DateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        date_trunc("month", col("o_orderdate")).cast("long").as("month_epoch"))
      .groupBy("y", "m", "month_epoch")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("y", "m")

  /** q28: math functions — abs/ceil/floor/sqrt (IEEE-exact set only). */
  def q28MathFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        abs(col("l_discount") - 0.05).as("ad"),
        ceil(col("l_extendedprice")).cast("long").as("cp"),
        floor(col("l_extendedprice")).cast("long").as("fp"),
        round(sqrt(col("l_quantity")), 6).as("sq"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .limit(200)

  /** q29: JSON extraction from the events props column. */
  def q29Json(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("k")

  /** q30: array functions — sort/join/contains over document tokens. */
  def q30ArrayFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        array_join(array_sort(slice(split(col("text"), " "), 1, 3)), "-").as("first3"),
        array_contains(split(col("text"), " "), "spark").as("has_spark"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("n_uniq"))
      .orderBy("doc_id")
      .limit(200)

  /** q31: conditionals — coalesce/nullif/greatest/least. */
  def q31Conditionals(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag"),
        greatest(col("l_tax"), col("l_discount")).as("g"),
        least(col("l_tax"), col("l_discount")).as("l"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .limit(200)

  /** q32: TPC-H Q1 pricing summary (quantized sums — exact). */
  def q32TpchQ1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_x100"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_x100"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q33: string aggregation (reference `sql/insert.sql:31-33` uses
    * string_agg) — order-pinned via sorted collect. */
  def q33StringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .groupBy("n_regionkey")
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("names"))
      .orderBy("n_regionkey")

  /** q34: md5-compare equi-join (reference `sql/insert.sql:51-53` joins
    * via md5(text)). */
  def q34Md5Join(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"),
      md5(col("text").cast("binary")).as("h"))
    d.as("a").join(d.as("b"),
      col("a.h") === col("b.h") && col("a.doc_id") <= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("matches"))
      .orderBy("doc_id")
      .limit(100)
  }

  /** q35: generated-series source (reference `sql/insert.sql:29`
    * generate_series) — sequence + explode. */
  def q35GenerateSeries(s: SparkSession, dir: String): DataFrame =
    s.range(1)
      .select(explode(sequence(lit(1), lit(100))).as("i"))
      .select(col("i").cast("long").as("i"), (col("i") % 7).cast("long").as("m"))
      .groupBy("m")
      .agg(count(lit(1)).as("cnt"), sum("i").as("sm"))
      .orderBy("m")

  /** q36: exact interpolated percentiles (linear interpolation in both
    * engines — identical double arithmetic). */
  def q36Percentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
      .orderBy("o_orderstatus")

  /** q37: approximate distinct (HLL sketch). Sketches differ across
    * engines, so there is deliberately no oracle (driver records a
    * rows-only check); the spec asserts the estimate's error bound. */
  def q37ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"))

  /** q38: whole-row serialization — `to_json` of the ENTIRE row via
    * `struct("*")`, the reference's `select to_json(v) from collation_block_filtering v`
    * pattern (`sql/query.sql:23`, `cstore_fdw.c:1921-1929`: a whole-row
    * reference forces the scan to emit every column). Restricted to an
    * int+string table because both engines print those JSON-identically;
    * doubles/timestamps have engine-specific text forms. */
  def q38RowJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .select(col("n_nationkey"), to_json(struct(col("*"))).as("row_json"))
      .orderBy("n_nationkey")

  /** q39: correlated aggregate subquery — customers above their own
    * nation's average balance, counted per nation. Spark decorrelates
    * this into a join against the per-nation aggregate; cents-integer
    * comparison keeps the predicate engine-exact. */
  def q39Correlated(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .select(col("c_nationkey"), round(col("c_acctbal") * 100).cast("long").as("bal_c"))
    val avgBal = cust.groupBy("c_nationkey")
      .agg((sum("bal_c").cast("double") / count(lit(1)).cast("double")).as("avg_c"))
    cust.join(avgBal, "c_nationkey")
      .filter(col("bal_c").cast("double") > col("avg_c"))
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_above"))
      .orderBy("c_nationkey")
  }

  /** q40: LATERAL join — per-nation top-2 customers by balance, the
    * top-k-per-group shape written as a correlated lateral subquery
    * (Spark plans the correlated LIMIT as a ranked window under the
    * hood; the SQL surface is what the reference's host executor offers
    * for iterate-per-row queries). Views are registered idempotently
    * with query-scoped names so concurrent bench queries can't collide. */
  def q40Lateral(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("q40_nation")
    t(s, dir, "customer").createOrReplaceTempView("q40_customer")
    s.sql(
      """SELECT n.n_nationkey, t.c_custkey, t.bal
        |FROM q40_nation n,
        |LATERAL (
        |  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) bal
        |  FROM q40_customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY bal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_nationkey, t.bal DESC, t.c_custkey""".stripMargin)
  }

  /** q42: PIVOT — quantity totals per linestatus pivoted by return flag.
    * The pivot value list is declared (A/N/R), so the plan is ONE scan +
    * one aggregation with conditional sums — no per-value scan fan-out,
    * the shape that survives 100 TB (an undeclared value list would need
    * a distinct-values pre-pass). */
  def q42Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity")).cast("long"))
      .orderBy("l_linestatus")

  /** q43: WITH RECURSIVE — per-root chain walk over nation keys (roots
    * are the multiples of 5; each chain follows key+1 until the next
    * root). Exercises Spark 4's recursive-CTE operator (`UnionLoop`):
    * the anchor seeds the loop, each iteration joins the working set
    * back to the base table, and the aggregate folds the closure —
    * the one delegated-surface shape (PG serves recursive CTEs above
    * the reference FDW) that had no entry here. */
  def q43RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("q43_nation")
    s.sql("""
      WITH RECURSIVE chain AS (
        SELECT n_nationkey AS root, n_nationkey AS node, 0 AS depth
        FROM q43_nation WHERE n_nationkey % 5 = 0
        UNION ALL
        SELECT c.root, n.n_nationkey, c.depth + 1
        FROM chain c JOIN q43_nation n ON n.n_nationkey = c.node + 1
        WHERE n.n_nationkey % 5 <> 0
      )
      SELECT root, max(depth) AS chain_len, count(*) AS nodes
      FROM chain GROUP BY root ORDER BY root""")
  }

  /** Integer-cents line revenue `round(extprice·(1−disc)·100)` — ONE
    * definition shared by q44 and q50 (and [[RevenueCentsSql]], its
    * oracle twin), so the cents convention cannot drift between the
    * revenue queries. */
  private def revenueCents: org.apache.spark.sql.Column =
    round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
      .cast("long")

  private val RevenueCentsSql =
    "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"

  /** q44: TPC-H Q3 shape — top-k join-aggregate with date filters on
    * both fact sides. Catalyst pushes the segment/date predicates into
    * all three scans, broadcasts nothing it shouldn't (customer filters
    * to one segment; orders/lineitem shuffle on the join keys), and AQE
    * plans the top-k as a TakeOrderedAndProject, never a full sort.
    * Revenue is per-row integer cents summed as BIGINT — exact under
    * any execution order — and the top-10 tie-breaks on l_orderkey so
    * the result set is deterministic. */
  def q44TopkRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t(s, dir, "orders").filter(col("o_orderdate") < lit("1996-03-15")),
        col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1996-03-15")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(sum(revenueCents).as("revenue_c"))
      .orderBy(col("revenue_c").desc, col("l_orderkey"))
      .limit(10)

  /** q45: TPC-H Q18 shape — HAVING over a three-way join (large-volume
    * orders). The quantity aggregate + HAVING runs on lineitem ALONE
    * first (the TPC-H-prescribed decomposition: the filter drops ~99.8%
    * of orders), and the JOIN ORDER follows that selectivity: orders
    * joins the filtered aggregate FIRST — the result is
    * ~0.2% of orders — and only those survivors join customer. The old
    * left-deep `customer ⋈ orders` order ran the two largest non-fact
    * tables at full cardinality before the selective filter landed; it
    * was invisible at sf0.1 (customer broadcasts) but becomes a full
    * shuffle join at 100×. With this order the expensive side is gone
    * BY CONSTRUCTION: the first join's small side is the qty-filtered
    * aggregate, and the customer join's probe side is the surviving
    * ~0.2 % of orders. NEITHER join is broadcast-hinted (ADVICE r10):
    * both small sides are fixed FRACTIONS of their input — the HAVING
    * survivors grow linearly with SF exactly like the customer side —
    * so a forced broadcast would trade a cheap tiny-side shuffle at
    * extreme scale for a driver OOM; the planner/AQE picks broadcast
    * whenever a side actually fits. Deterministic: quantities are integral doubles
    * summed to BIGINT, total price in cents, tie-break on o_orderkey. */
  def q45HavingJoin(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").cast("long").as("qty"))
      .filter(col("qty") > 300)
    t(s, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("totalprice_c"),
        col("qty"))
      .orderBy(col("totalprice_c").desc, col("o_orderkey"))
      .limit(100)
  }

  /** q46: the reference's Danish-collation filter over a COLLATED graft
    * column (`input/block_filtering.source:61-71`): `A > 'B'` under
    * da_DK returns Å (the Danish alphabet ends …X Y Z Æ Ø Å, so Å sorts
    * AFTER B — binary order disagrees for the multigraph 'AA', which
    * Danish treats as Å). The probe rows ride on a graft table built
    * from the round's nation names, stored sort_by the collated column:
    * the table's zone maps hold BINARY min/max, so the collated
    * predicate must bypass file pruning (pruning with binary bounds
    * under Danish rules would wrongly drop the 'Aa…' rows) and must not
    * push down as a binary filter — CollationSpec pins both properties
    * on this exact entry. Oracle-free by documented design, like
    * q37/t11: DuckDB's ICU collation versions order the probe set
    * differently across builds, so the driver records the rows-only
    * check and the ordering itself is spec-bound. */
  // q46's collated table is a once-per-(session, input) artifact, like
  // the ANN indexes: repeated invocations (bench runs twice + solo +
  // verify pools) must time the collated SCAN, not a rebuild, and must
  // not leak a temp table per call
  private val collationTableCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  def q46CollationFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val loc = collationTableCache.computeIfAbsent((s, dir), { _ =>
      val probes = Seq("A", "Å", "B", "Aarhus", "Aardvark", "Zebra").toDF("s")
      val base = t(s, dir, "nation").select(col("n_name").as("s")).union(probes)
      // under the engine scratch root: reaped on JVM exit (ADVICE r10)
      val l = graft.operators.Dedup.scratchRoot(s) +
        s"/coll-${java.util.UUID.randomUUID().toString.take(8)}/t"
      val gt = graft.storage.GraftTable.create(s, l, base.schema,
        graft.storage.GraftTableOptions(sortBy = Seq("s")))
      gt.append(base.repartition(1))
      l
    })
    // read through the DSv2 graft source: the zone-map pruner is in the
    // loop (and CollationSpec asserts it pruned NOTHING here)
    s.read.format("graft").load(loc)
      .filter(expr("collate(s, 'da') > collate('B', 'da')"))
      .orderBy(expr("collate(s, 'da')"), col("s"))
      .select(col("s"))
  }

  /** q47: TPC-H Q4 shape — priority counts over an EXISTS-correlated
    * order/lineitem probe. Catalyst rewrites the EXISTS to a LEFT SEMI
    * join (one keyed shuffle of the date-windowed orders against the
    * flag-filtered lineitem; the date filter pushes into the orders
    * scan), then one tiny groupBy on priority. Counts are exact. */
  def q47ExistsPriority(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01") &&
        col("o_orderdate") < lit("1996-10-01"))
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select("l_orderkey")
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** q48: TPC-H Q12 shape — dual conditional aggregation over an
    * order/lineitem join, split by line status (the schema's stand-in
    * for shipmode). One keyed join shuffle + one tiny groupBy; the
    * CASE arithmetic is integer-exact. */
  def q48CaseAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")

  /** q49: TPC-H Q22 shape — customers with above-average balance and no
    * RECENT URGENT order (anti join against a filtered orders subset;
    * this corpus gives every customer at least one order, so the
    * unfiltered Q22 anti join would be vacuous), grouped by segment.
    * The average comparison is CROSS-MULTIPLIED to integers
    * (cents·n > Σcents) so the result cannot flip on shuffle-order
    * double summation — the one-row aggregate broadcasts, the anti
    * join is one keyed shuffle, and the orders-side predicates push
    * into its scan. */
  def q49AntiAvg(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("bal_c"))
    val thr = c.filter(col("bal_c") > 0)
      .agg(sum("bal_c").as("sum_c"), count(lit(1)).as("n_pos"))
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1998-01-01"))
      .select("o_custkey")
    c.crossJoin(broadcast(thr))
      .filter(col("bal_c") * col("n_pos") > col("sum_c"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), sum("bal_c").as("totacctbal_c"))
      .orderBy("c_mktsegment")
  }

  /** q50: TPC-H Q14 shape — a GLOBAL conditional-aggregate ratio (no
    * grouping): the share of one month's revenue from ECONOMY-type
    * parts. One keyed join shuffle (date window pushed into the
    * lineitem scan; part is the broadcast side) into a single-row
    * aggregate. Both sums are integer cents (BIGINT-exact under any
    * execution order); only the final share is one double division. */
  def q50RevenueShare(s: SparkSession, dir: String): DataFrame = {
    val rev = revenueCents
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-03-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
      .agg(
        sum(when(col("p_type") === "ECONOMY", rev).otherwise(0L))
          .as("economy_revenue_c"),
        sum(rev).as("total_revenue_c"))
      .select(col("economy_revenue_c"), col("total_revenue_c"),
        round(col("economy_revenue_c").cast("double") /
          col("total_revenue_c").cast("double"), 6).as("economy_share"))
  }

  /** q51: TPC-H Q21 shape — suppliers who were the SOLE problem supplier
    * on a finished multi-supplier order (this schema lacks
    * commit/receipt dates, so `l_returnflag = 'R'` is the problem-line
    * marker). The textbook form is a double SELF-join (EXISTS another
    * supplier's line + NOT EXISTS another supplier's problem line) —
    * three lineitem shuffles at scale. Here both correlated tests
    * collapse into ONE per-order aggregate: EXISTS(other supplier)
    * ⇔ countDistinct(supplier) ≥ 2, and NOT EXISTS(other supplier's
    * problem line) ⇔ the order's distinct PROBLEM suppliers == 1 (the
    * probe line itself is one). Two keyed lineitem shuffles on
    * l_orderkey total, supplier broadcast; the oracle runs the literal
    * EXISTS/NOT-EXISTS form, proving the rewrite. */
  def q51WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    // One hash exchange on l_orderkey up front (optimization round 17,
    // guide §2.5): the single-row-group lineitem file scans as ONE task,
    // so the (order, supplier) aggregate hashed 600 k rows serially —
    // and partial aggregation buys nothing here (≈1 row per group), so
    // pre-partitioning the raw rows costs the same shuffle bytes the
    // partial-agg output would. HashPartitioning(l_orderkey) satisfies
    // every downstream clustering (both aggregate levels and the join),
    // so no further Exchange appears on this side.
    val l = graft.Tables.fanned(t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_returnflag"), "l_orderkey")
    // Two countDistincts with different children cost an Expand (×2 the
    // lineitem rows into the shuffle) plus a distinct-then-merge
    // aggregate; the same quantities fall out of a two-level exact
    // aggregate over (order, supplier) — n_supp = distinct suppliers =
    // count of the first level's groups, n_ret_supp = distinct RETURN
    // suppliers = sum of the per-supplier has-R flag — with plain
    // codegen'd hash aggregates and no row multiplication
    // (optimization round 17, guide §2.3 "shuffle fewer bytes").
    // Equivalence assumes l_suppkey IS NOT NULL (ADVICE r17): the
    // original countDistinct(l_suppkey) ignored NULL suppliers, while a
    // NULL-supplier group would count toward n_supp here. TPC-H-shaped
    // lineitem declares l_suppkey non-null (the generator never emits
    // one), and the oracle runs the literal EXISTS form — a NULL would
    // flip the hash, so the assumption is continuously checked.
    val perOrder = l
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("ret"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"), sum(col("ret")).as("n_ret_supp"))
    val finished = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    l.filter(col("l_returnflag") === "R")
      .join(finished, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(perOrder.filter(col("n_supp") >= 2 && col("n_ret_supp") === 1),
        Seq("l_orderkey"))
      .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name")).limit(20)
  }

  /** q52: TPC-H Q19 shape — revenue under a DISJUNCTION of conjunctive
    * brand/type × quantity × size bands (the classic OR-of-ANDs
    * predicate that defeats naive single-range pushdown). The join key
    * (`p_partkey = l_partkey`) is hoisted OUT of the disjunction so the
    * plan is one keyed join (part broadcast) with the DNF as a residual
    * filter; the per-disjunct lineitem ranges still reach the scan
    * because each disjunct bounds `l_quantity` — their union
    * (1 ≤ q ≤ 30) is a pushable necessary condition Catalyst derives,
    * and the file pruner refutes an OR only when EVERY disjunct
    * refutes. Revenue is integer cents (order-insensitive). */
  def q52DisjunctBands(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    val joined = l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
    val band1 = col("p_type") === "ECONOMY" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
    val band2 = col("p_type") === "STANDARD" &&
      col("p_size").between(1, 25) && col("l_quantity").between(10, 20)
    val band3 = col("p_type") === "PROMO" &&
      col("p_size").between(1, 35) && col("l_quantity").between(20, 30)
    joined.filter(band1 || band2 || band3)
      .agg(sum(revenueCents).as("revenue_c"),
        count(lit(1)).as("n_lines"))
  }

  /** q53: TPC-H Q13 shape — the customer order-COUNT DISTRIBUTION: a
    * LEFT OUTER join whose right side carries a predicate (TPC-H puts a
    * comment exclusion in the ON clause; this schema's stand-in drops
    * low-priority orders — a right-side-only predicate, so pre-filter
    * before the outer join is equivalent), counted per customer WITH
    * zeros kept, then a count-of-counts. Two keyed shuffles (custkey,
    * then the tiny c_count regroup); the priority filter pushes into
    * the orders scan. `count(col)` skips the outer join's nulls, so
    * no-order customers land in the 0 bucket exactly. */
  def q53CustDistribution(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** q54: TPC-H Q17 shape — lines ordering LESS than a fifth of their
    * part's average quantity. The textbook correlated scalar
    * (`l_quantity < 0.2 · avg per part`) decorrelates into a per-part
    * WINDOW aggregate — ONE keyed shuffle on l_partkey, no self-join —
    * and the comparison is cross-multiplied to integers
    * (5·qty·n < Σqty) so it cannot flip on double rounding. The brand
    * filter broadcasts and restricts BEFORE the window (a part-level
    * predicate keeps whole parts, so the per-part average over the
    * filtered lines is the part's true average). The oracle runs the
    * literal correlated form, proving the rewrite. */
  def q54SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").filter(col("p_brand") === "Brand#12")
      .select("p_partkey")
    val lp = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .join(broadcast(p), col("p_partkey") === col("l_partkey"))
    val w = Window.partitionBy("l_partkey")
    lp.withColumn("sum_qty", sum("qty").over(w))
      .withColumn("n_part_lines", count(lit(1)).over(w))
      .filter(col("qty") * lit(5L) * col("n_part_lines") < col("sum_qty"))
      .agg(sum("price_c").as("total_price_c"),
        count(lit(1)).as("n_small_lines"))
  }

  /** q55: TPC-H Q15 shape — the top-revenue supplier(s) over a quarter:
    * a per-supplier revenue aggregate (one keyed shuffle, date window
    * pushed into the scan), its ONE-row max broadcast-crossed back as
    * the selection (the q49 broadcast-scalar pattern — ties all
    * surface, as Q15's view formulation requires), supplier broadcast
    * for the name. Revenue is integer cents, so the max-equality
    * selection cannot miss on double rounding. */
  def q55TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(sum(revenueCents).as("total_revenue_c"))
    val maxRev = rev.agg(max("total_revenue_c").as("max_rev"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue_c") === col("max_rev"))
      .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue_c")
      .orderBy("s_suppkey")
  }

  /** q56: TPC-H Q5 shape — revenue by nation where customer and
    * supplier are LOCAL to each other (`c_nationkey = s_nationkey`, the
    * constraint that makes Q5 a 6-way join rather than a star): region
    * restricts nation (both broadcast), orders date-windowed (pushed
    * into its scan), two keyed fact shuffles (orders⋈customer on
    * custkey, ⋈lineitem on orderkey), and the supplier match is a
    * BROADCAST hash join carrying the two-column equality — the
    * locality constraint rides the small side, never a fact shuffle. */
  def q56LocalRevenue(s: SparkSession, dir: String): DataFrame = {
    val n = regionNations(s, dir, "ASIA")
    val c = t(s, dir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey", "n_name")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), revenueCents.as("rev_c"))
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum("rev_c").as("revenue_c"))
      .orderBy(desc("revenue_c"), col("n_name"))
  }

  /** Suppliers labeled with their nation name — the broadcast-sized
    * dimension q58 and q59 share (one definition, the revenueCents
    * discipline). */
  private def supplierNations(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))

  /** Nation keys (and names) of one region — shared by q56 and q58. */
  private def regionNations(s: SparkSession, dir: String,
      region: String): DataFrame =
    t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")

  /** q57: TPC-H Q7 shape — VOLUME SHIPPING between two nations: revenue
    * by (supplier nation, customer nation, ship year) where the pair is
    * one of the two DIRECTIONS between the named nations. The nation
    * filter lands on customer and supplier BEFORE any fact join
    * (customers shrink ~2/25 first, then orders semi-reduce through the
    * keyed custkey join, then lineitem through orderkey — the
    * TPC-H-prescribed reduction order); the two-sided direction
    * disjunction is a residual over two broadcast-joined label columns.
    * Two keyed fact shuffles total. */
  def q57VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val names = Seq("NATION_3", "NATION_7")
    val n = t(s, dir, "nation")
      .filter(col("n_name").isin(names: _*))
      .select(col("n_nationkey"), col("n_name"))
    val cust = t(s, dir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val sup = t(s, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      .join(cust, col("o_custkey") === col("c_custkey"))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"), revenueCents.as("rev_c"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_nation") === names(0) &&
          col("cust_nation") === names(1)) ||
        (col("supp_nation") === names(1) && col("cust_nation") === names(0)))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum("rev_c").as("revenue_c"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** q58: TPC-H Q8 shape — NATIONAL MARKET SHARE: within one customer
    * region and one part type, the share of revenue supplied by one
    * nation, per order year. The numerator is a conditional sum over
    * the supplier-nation label (both sums integer cents — exact under
    * any order; only the final share divides). Part/supplier/nation/
    * region all broadcast; orders⋈customer and lineitem⋈orders are the
    * two keyed fact shuffles. */
  def q58MarketShare(s: SparkSession, dir: String): DataFrame = {
    val nr = regionNations(s, dir, "ASIA").select("n_nationkey")
    val cust = t(s, dir, "customer")
      .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
      .join(cust, col("o_custkey") === col("c_custkey"))
    val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
      .select("p_partkey")
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revenueCents.as("rev_c"))
      .join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplierNations(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === "NATION_5", col("rev_c"))
          .otherwise(0L)).as("nation_revenue_c"),
        sum(col("rev_c")).as("total_revenue_c"))
      .select(col("o_year"), col("nation_revenue_c"),
        col("total_revenue_c"),
        round(col("nation_revenue_c").cast("double") /
          col("total_revenue_c").cast("double"), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** q59: TPC-H Q9 shape — PRODUCT-LINE PROFIT by supplier nation and
    * order year, over parts selected by a substring LIKE (the
    * non-prefix `%bolt%` cannot prune, so it runs as a residual on the
    * broadcast part side — the schema has no supplycost, so profit is
    * revenue cents, the documented adaptation). Lineitem shuffles once
    * on orderkey for the order-year join; part/supplier/nation
    * broadcast. */
  def q59ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").filter(col("p_name").like("%bolt%"))
      .select("p_partkey")
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revenueCents.as("rev_c"))
      .join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplierNations(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("supp_nation", "o_year")
      .agg(sum("rev_c").as("profit_c"))
      .orderBy(col("supp_nation"), desc("o_year"))
  }

  /** q60: TPC-H Q10 shape — RETURNED-ITEM reporting: the top 20
    * customers by revenue lost to returns in a quarter's orders. The
    * date window pushes into the orders scan and the return flag into
    * lineitem's; orders⋈lineitem and ⋈customer are the two keyed
    * shuffles (customer grain carries the wide output columns through
    * the aggregate); nation broadcasts; top-20 is a TakeOrdered, never
    * a global sort. */
  def q60ReturnedCustomers(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-10-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey")
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revenueCents.as("rev_c"))
    val c = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .withColumn("acctbal_c", round(col("c_acctbal") * 100).cast("long"))
      .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment", "acctbal_c")
      .agg(sum("rev_c").as("revenue_c"))
      .orderBy(desc("revenue_c"), col("c_custkey"))
      .limit(20)
  }

  /** q61: monthly-rollup equality filter — the dashboard predicate
    * shape `date_trunc('month', ts) = <month>`. Semantically trivial;
    * the POINT is the plan: [[graft.sources.GraftTruncRangeRule]]
    * (installed via GraftExtensions in every engine session) rewrites
    * the aligned-literal equality into `o_orderdate >= lo AND < hi`,
    * which translates to source filters and reaches the zone maps /
    * row-group stats — without the rule the trunc is an untranslatable
    * black box and the scan reads every file. PushdownSpec pins the
    * pruning (2 of 3 month-files dropped) and the unaligned-literal
    * safety; this entry hash-checks the semantics end to end. */
  def q61TruncMonth(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(expr("date_trunc('month', o_orderdate) = " +
        "timestamp'1995-03-01 00:00:00'"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))

  /** q66: daily-rollup CAST filter — the dashboard predicate's OTHER
    * spelling, `CAST(ts AS DATE) = <day>` (and `to_date(ts)`, which
    * analyzes to the same Cast). Semantically trivial; the POINT is
    * the plan: [[graft.sources.GraftTruncRangeRule]]'s Cast case
    * rewrites it to `ts >= startOfDay AND < nextStartOfDay`, which
    * reaches zone maps and row-group stats — and unlike
    * `date_trunc('day', …)` the rewrite is EXACT on DST days too
    * (local date is monotone in the instant), so it never declines.
    * PushdownSpec pins the pruning; this entry hash-checks the
    * semantics end to end on the events table. */
  def q66CastDatePrune(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(expr("CAST(ts AS DATE) = date'2024-01-15'"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))

  /** Synthesized PARTSUPP — the one TPC-H table `TESTDATA.md` lacks,
    * derived DETERMINISTICALLY from part × supplier so the q62–q65
    * quartet (Q2/Q11/Q16/Q20 shapes) is oracle-checkable: 4 suppliers
    * per part in the TPC-H spec's shape (§4.2.3, adapted to 0-based
    * keys), suppkey_i = (partkey + partkey/S + i·(S/4)) mod S — the
    * partkey-dependent skew rides as an additive rotation rather than
    * the spec's per-i multiplier so the four offsets i·(S/4) are
    * PROVABLY distinct mod S for any S ≥ 4 (the spec's own form
    * cycles when partkey/S grows to a divisor of S, which the tiny
    * test SFs actually hit — review r13), supplycost and
    * availqty from md5 draws of the (partkey, suppkey) pair — the
    * c12/c13 seed-keyed-hash discipline, integer-exact in both
    * engines (48-bit hex prefix, BIGINT arithmetic only). The frame is
    * built in-entry (part × 4 rows: one broadcast-scalar cross join +
    * explode, no shuffle); at 100 TB partsupp would be a real fact
    * table and every consumer below already treats it as one — keyed
    * aggregates and joins on (ps_partkey, ps_suppkey), never a
    * correlated re-aggregation. */
  private def partsupp(s: SparkSession, dir: String): DataFrame = {
    val sCnt = t(s, dir, "supplier").agg(count(lit(1)).as("s_cnt"))
    def draw(salt: Column): Column =
      conv(substring(md5(salt.cast("binary")), 1, 12), 16, 10).cast("long")
    val pairKey = concat_ws("-",
      col("ps_partkey").cast("string"), col("ps_suppkey").cast("string"))
    t(s, dir, "part").select(col("p_partkey").as("ps_partkey"))
      .crossJoin(broadcast(sCnt))
      .select(col("ps_partkey"), col("s_cnt"),
        explode(sequence(lit(0L), lit(3L))).as("i"))
      .withColumn("ps_suppkey", expr(
        "(ps_partkey + ps_partkey div s_cnt + i * (s_cnt div 4)) % s_cnt"))
      .withColumn("ps_supplycost_c", draw(pairKey) % 100000L + 100L)
      .withColumn("ps_availqty",
        draw(concat_ws("-", lit("aq"), col("ps_partkey").cast("string"),
          col("ps_suppkey").cast("string"))) % 9999L + 1L)
      .select("ps_partkey", "ps_suppkey", "ps_supplycost_c", "ps_availqty")
  }

  /** q62: TPC-H Q2 shape — the MIN-COST supplier per part within a
    * region: for each STANDARD small-size part, the European
    * supplier(s) offering it at the regional minimum supplycost. The
    * correlated `ps_supplycost = (SELECT min(...))` subquery is
    * DECORRELATED into one keyed min aggregate over the
    * region-filtered partsupp plus an equality join back on
    * (partkey, cost) — the q55 broadcast-scalar discipline at per-part
    * grain, no per-row re-aggregation. Part filter and the
    * region-supplier dimension both broadcast; cost is integer cents
    * so the min-equality join cannot miss on rounding; ties (two
    * suppliers at the min) all surface, as Q2's semantics require. */
  def q62MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val rn = regionNations(s, dir, "EUROPE")
    val sup = t(s, dir, "supplier")
      .join(broadcast(rn), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        round(col("s_acctbal") * 100).cast("long").as("s_acctbal_c"))
    val pf = t(s, dir, "part")
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 5)
      .select("p_partkey")
    val psr = partsupp(s, dir)
      .join(broadcast(pf), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("ps_suppkey") === col("s_suppkey"))
      .select("ps_partkey", "ps_supplycost_c", "s_name", "n_name", "s_acctbal_c")
    val minc = psr.groupBy("ps_partkey")
      .agg(min("ps_supplycost_c").as("min_cost_c"))
      .withColumnRenamed("ps_partkey", "m_partkey")
    psr.join(minc, col("ps_partkey") === col("m_partkey") &&
        col("ps_supplycost_c") === col("min_cost_c"))
      .select(col("s_acctbal_c"), col("s_name"), col("n_name"),
        col("ps_partkey"), col("min_cost_c"))
      .orderBy(desc("s_acctbal_c"), col("n_name"), col("s_name"),
        col("ps_partkey"))
  }

  /** q63: TPC-H Q11 shape — IMPORTANT STOCK: per-part inventory value
    * (supplycost × availqty, BIGINT) over one nation's suppliers,
    * keeping parts whose value exceeds TWICE the nation's mean
    * per-part value. TPC-H's own fraction is SF-scaled (0.0001/SF)
    * precisely because a fixed share of the TOTAL empties as the part
    * count grows — the mean-relative form keeps the HAVING selective
    * at every SF with ONE fixed query and oracle (round 13: the /400
    * literal returned zero rows at sf0.1). The global-scalar HAVING
    * decorrelates into ONE extra one-row (total, n_parts) aggregate
    * broadcast-crossed back (the q49/q55 pattern); the comparison is
    * `value·n_parts > 2·total` in pure BIGINT — no float division
    * anywhere, so the threshold cannot flake. One keyed shuffle (the
    * per-part sum); the nation's supplier set broadcasts. */
  def q63ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val natSup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_9")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val pn = partsupp(s, dir)
      .join(broadcast(natSup), col("ps_suppkey") === col("s_suppkey"))
      .select(col("ps_partkey"),
        (col("ps_supplycost_c") * col("ps_availqty")).as("v"))
    val byPart = pn.groupBy("ps_partkey").agg(sum("v").as("value_c"))
    val total = byPart.agg(sum("value_c").as("total_c"),
      count(lit(1)).as("n_parts"))
    byPart.crossJoin(broadcast(total))
      .filter(col("value_c") * col("n_parts") > col("total_c") * 2L)
      .select("ps_partkey", "value_c")
      .orderBy(desc("value_c"), col("ps_partkey"))
  }

  /** q64: TPC-H Q16 shape — SUPPLIER COUNT by part descriptor: distinct
    * suppliers per (brand, type, size) over a brand/type/size-screened
    * part set, excluding suppliers on a complaint list (adapted to the
    * schema: the testdata's supplier has no comment column, so the
    * exclusion set is suppliers in arrears, `s_acctbal < 0` — same NOT
    * IN shape). The NOT IN runs as a broadcast LEFT ANTI join
    * (equivalent here: s_suppkey is never null), the part screen
    * broadcasts onto the partsupp build, and the countDistinct is the
    * one keyed shuffle. */
  def q64SupplierCount(s: SparkSession, dir: String): DataFrame = {
    val excl = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
      .select("s_suppkey")
    val pf = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#45" &&
        !col("p_type").startsWith("MEDIUM") &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    partsupp(s, dir)
      .join(broadcast(pf), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(excl), col("ps_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** q65: TPC-H Q20 shape — the NESTED SEMI CHAIN: suppliers in one
    * nation holding EXCESS STOCK of name-screened parts — availqty
    * exceeding half of what that (part, supplier) pair actually
    * shipped in 1996. Innermost: the name screen broadcasts onto
    * lineitem; the per-(partkey, suppkey) shipped-quantity aggregate
    * is the one fact shuffle; partsupp joins it on BOTH keys (an
    * inner join: a pair with no 1996 shipments compares against NULL
    * in Q20 and drops — same semantics); the `availqty > 0.5·sum`
    * comparison is `availqty·2 > qty` in BIGINT; the qualifying
    * supplier set then lands as a LEFT SEMI on the nation's suppliers.
    * No correlated subquery survives: three joins, each keyed or
    * broadcast. */
  def q65ExcessStock(s: SparkSession, dir: String): DataFrame = {
    val pf = t(s, dir, "part").filter(col("p_name").like("small%"))
      .select("p_partkey")
    val shipped = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
    val qualified = partsupp(s, dir)
      .join(shipped, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") * 2L > col("sum_qty"))
      .select("ps_suppkey").distinct()
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_9")),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualified, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_name")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_cast_date_prune" -> q66CastDatePrune _,
    "q65_excess_stock" -> q65ExcessStock _,
    "q64_supplier_count" -> q64SupplierCount _,
    "q63_important_stock" -> q63ImportantStock _,
    "q62_mincost_supplier" -> q62MinCostSupplier _,
    "q61_trunc_prune" -> q61TruncMonth _,
    "q60_returned_customers" -> q60ReturnedCustomers _,
    "q59_product_profit" -> q59ProductProfit _,
    "q58_market_share" -> q58MarketShare _,
    "q57_volume_shipping" -> q57VolumeShipping _,
    "q56_local_revenue" -> q56LocalRevenue _,
    "q55_top_supplier" -> q55TopSupplier _,
    "q54_small_qty" -> q54SmallQtyRevenue _,
    "q53_cust_distribution" -> q53CustDistribution _,
    "q52_disjunct_bands" -> q52DisjunctBands _,
    "q51_waiting_supplier" -> q51WaitingSupplier _,
    "q50_revenue_share" -> q50RevenueShare _,
    "q47_exists_priority" -> q47ExistsPriority _,
    "q48_case_agg" -> q48CaseAgg _,
    "q49_anti_avg" -> q49AntiAvg _,
    "q46_collation_filter" -> q46CollationFilter _,
    "q45_having_join" -> q45HavingJoin _,
    "q44_topk_revenue" -> q44TopkRevenue _,
    "q43_recursive_cte" -> q43RecursiveCte _,
    "q42_pivot" -> q42Pivot _,
    "q40_lateral" -> q40Lateral _,
    "q41_grouping_sets" -> q41GroupingSets _,
    "q39_correlated" -> q39Correlated _,
    "q33_string_agg" -> q33StringAgg _,
    "q34_md5_join" -> q34Md5Join _,
    "q35_generate_series" -> q35GenerateSeries _,
    "q36_percentile" -> q36Percentile _,
    "q37_approx_distinct" -> q37ApproxDistinct _,
    "q38_row_json" -> q38RowJson _,
    "q21_left_join" -> q21LeftJoin _,
    "q22_full_outer" -> q22FullOuter _,
    "q23_cube" -> q23Cube _,
    "q24_except" -> q24Except _,
    "q25_window_frame" -> q25WindowFrame _,
    "q26_string_funcs" -> q26StringFuncs _,
    "q27_date_funcs" -> q27DateFuncs _,
    "q28_math_funcs" -> q28MathFuncs _,
    "q29_json" -> q29Json _,
    "q30_array_funcs" -> q30ArrayFuncs _,
    "q31_conditionals" -> q31Conditionals _,
    "q32_tpch_q1" -> q32TpchQ1 _,
  )

  /** The synthesized-partsupp CTE chain — ONE definition string shared
    * by all four quartet oracles, mirroring [[partsupp]] expression for
    * expression (TPC-H suppkey formula, 48-bit md5 draws, BIGINT
    * arithmetic), so the Spark build and the oracle replay cannot
    * drift. DuckDB `//` floors and Spark `div` truncates — identical
    * on these all-nonnegative operands. */
  private val PartsuppCte: String =
    """sc AS (SELECT count(*) s_cnt FROM supplier),
      |ps0 AS (
      |  SELECT p_partkey ps_partkey,
      |    (p_partkey + p_partkey // s_cnt + i * (s_cnt // 4)) % s_cnt
      |      ps_suppkey
      |  FROM part, sc, range(0, 4) r(i)),
      |ps AS (
      |  SELECT ps_partkey, ps_suppkey,
      |    CAST(('0x' || substr(md5(concat(CAST(ps_partkey AS VARCHAR), '-',
      |      CAST(ps_suppkey AS VARCHAR))), 1, 12)) AS BIGINT) % 100000 + 100
      |      ps_supplycost_c,
      |    CAST(('0x' || substr(md5(concat('aq-', CAST(ps_partkey AS VARCHAR),
      |      '-', CAST(ps_suppkey AS VARCHAR))), 1, 12)) AS BIGINT) % 9999 + 1
      |      ps_availqty
      |  FROM ps0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q66_cast_date_prune" ->
      ("""SELECT count(*) n_events,
         |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) value_c
         |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'""".stripMargin),
    "q62_mincost_supplier" ->
      (s"""WITH $PartsuppCte,
         |rn AS (SELECT n_nationkey, n_name FROM nation JOIN region
         |       ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
         |sup AS (SELECT s_suppkey, s_name, n_name,
         |    CAST(round(s_acctbal * 100) AS BIGINT) s_acctbal_c
         |  FROM supplier JOIN rn ON s_nationkey = n_nationkey),
         |pf AS (SELECT p_partkey FROM part
         |       WHERE p_type = 'STANDARD' AND p_size <= 5),
         |psr AS (SELECT ps_partkey, ps_supplycost_c, s_name, n_name,
         |    s_acctbal_c
         |  FROM ps JOIN pf ON ps_partkey = p_partkey
         |  JOIN sup ON ps_suppkey = s_suppkey),
         |minc AS (SELECT ps_partkey m_partkey,
         |    min(ps_supplycost_c) min_cost_c FROM psr GROUP BY 1)
         |SELECT s_acctbal_c, s_name, n_name, ps_partkey, min_cost_c
         |FROM psr JOIN minc ON ps_partkey = m_partkey
         |  AND ps_supplycost_c = min_cost_c
         |ORDER BY s_acctbal_c DESC, n_name, s_name, ps_partkey""".stripMargin),
    "q63_important_stock" ->
      (s"""WITH $PartsuppCte,
         |ns AS (SELECT s_suppkey FROM supplier JOIN nation
         |       ON s_nationkey = n_nationkey WHERE n_name = 'NATION_9'),
         |pn AS (SELECT ps_partkey, ps_supplycost_c * ps_availqty v
         |       FROM ps JOIN ns ON ps_suppkey = s_suppkey),
         |byp AS (SELECT ps_partkey, CAST(sum(v) AS BIGINT) value_c
         |        FROM pn GROUP BY 1),
         |tot AS (SELECT CAST(sum(value_c) AS BIGINT) total_c,
         |        count(*) n_parts FROM byp)
         |SELECT ps_partkey, value_c FROM byp, tot
         |WHERE value_c * n_parts > total_c * 2
         |ORDER BY value_c DESC, ps_partkey""".stripMargin),
    "q64_supplier_count" ->
      (s"""WITH $PartsuppCte,
         |pf AS (SELECT p_partkey, p_brand, p_type, p_size FROM part
         |  WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
         |    AND p_size IN (1, 4, 9, 16, 25, 36, 49))
         |SELECT p_brand, p_type, p_size,
         |  count(DISTINCT ps_suppkey) supplier_cnt
         |FROM ps JOIN pf ON ps_partkey = p_partkey
         |WHERE ps_suppkey NOT IN
         |  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
    "q65_excess_stock" ->
      (s"""WITH $PartsuppCte,
         |pf AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
         |shipped AS (SELECT l_partkey, l_suppkey,
         |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) sum_qty
         |  FROM lineitem JOIN pf ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-01-01'
         |  GROUP BY 1, 2),
         |qual AS (SELECT DISTINCT ps_suppkey FROM ps
         |  JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |  WHERE ps_availqty * 2 > sum_qty)
         |SELECT s_suppkey, s_name FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_9'
         |  AND s_suppkey IN (SELECT ps_suppkey FROM qual)
         |ORDER BY s_name""".stripMargin),
    "q57_volume_shipping" ->
      (s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
         |  CAST(sum($RevenueCentsSql) AS BIGINT) AS revenue_c
         |FROM lineitem, orders, customer, supplier, nation n1, nation n2
         |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |  AND l_suppkey = s_suppkey
         |  AND s_nationkey = n1.n_nationkey
         |  AND c_nationkey = n2.n_nationkey
         |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |  AND l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
    "q58_market_share" ->
      (s"""WITH j AS (
         |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |    $RevenueCentsSql AS rev_c, n2.n_name AS supp_nation
         |  FROM lineitem, orders, customer, supplier, part,
         |    nation n1, region, nation n2
         |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |    AND l_partkey = p_partkey AND l_suppkey = s_suppkey
         |    AND c_nationkey = n1.n_nationkey
         |    AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
         |    AND s_nationkey = n2.n_nationkey
         |    AND p_type = 'ECONOMY'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1998-01-01')
         |SELECT o_year,
         |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev_c
         |    ELSE 0 END) AS BIGINT) AS nation_revenue_c,
         |  CAST(sum(rev_c) AS BIGINT) AS total_revenue_c,
         |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev_c
         |      ELSE 0 END) AS DOUBLE) / CAST(sum(rev_c) AS DOUBLE), 6)
         |    AS mkt_share
         |FROM j GROUP BY o_year ORDER BY o_year""".stripMargin),
    "q59_product_profit" ->
      (s"""SELECT n_name AS supp_nation,
         |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  CAST(sum($RevenueCentsSql) AS BIGINT) AS profit_c
         |FROM lineitem, orders, supplier, part, nation
         |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
         |  AND l_partkey = p_partkey AND s_nationkey = n_nationkey
         |  AND p_name LIKE '%bolt%'
         |GROUP BY 1, 2 ORDER BY supp_nation, o_year DESC""".stripMargin),
    "q61_trunc_prune" ->
      ("SELECT count(*) AS n_orders, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c " +
        "FROM orders " +
        "WHERE date_trunc('month', o_orderdate) = TIMESTAMP '1995-03-01 00:00:00'"),
    "q60_returned_customers" ->
      (s"""SELECT c_custkey, c_name, n_name, c_mktsegment,
         |  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
         |  CAST(sum($RevenueCentsSql) AS BIGINT) AS revenue_c
         |FROM lineitem, orders, customer, nation
         |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-10-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3, 4, 5
         |ORDER BY revenue_c DESC, c_custkey LIMIT 20""".stripMargin),
    "q53_cust_distribution" ->
      ("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
         |FROM (SELECT c_custkey,
         |    CAST(count(o_orderkey) AS BIGINT) AS c_count
         |  FROM customer LEFT OUTER JOIN orders
         |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
         |  GROUP BY c_custkey) co
         |GROUP BY c_count
         |ORDER BY custdist DESC, c_count DESC""".stripMargin),
    // the literal CORRELATED form (DuckDB decorrelates it into the same
    // per-part-aggregate shape the Spark side declares as a window)
    "q54_small_qty" ->
      ("""SELECT CAST(sum(CAST(round(l1.l_extendedprice * 100) AS BIGINT))
         |    AS BIGINT) AS total_price_c,
         |  CAST(count(*) AS BIGINT) AS n_small_lines
         |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
         |WHERE p_brand = 'Brand#12'
         |  AND 5 * CAST(l1.l_quantity AS BIGINT) *
         |    (SELECT count(*) FROM lineitem l2
         |     WHERE l2.l_partkey = l1.l_partkey)
         |  < (SELECT CAST(sum(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
         |     FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin),
    "q55_top_supplier" ->
      (s"""WITH r AS (SELECT l_suppkey,
         |    CAST(sum($RevenueCentsSql) AS BIGINT) AS total_revenue_c
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue_c
         |FROM supplier JOIN r ON s_suppkey = l_suppkey
         |WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM r)
         |ORDER BY s_suppkey""".stripMargin),
    "q56_local_revenue" ->
      (s"""SELECT n_name, CAST(sum($RevenueCentsSql) AS BIGINT) AS revenue_c
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue_c DESC, n_name""".stripMargin),
    "q52_disjunct_bands" ->
      (s"""SELECT CAST(sum($RevenueCentsSql) AS BIGINT) AS revenue_c,
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_type = 'ECONOMY' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_type = 'STANDARD' AND p_size BETWEEN 1 AND 25
         |    AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_type = 'PROMO' AND p_size BETWEEN 1 AND 35
         |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin),
    "q51_waiting_supplier" ->
      ("""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
         |FROM lineitem l1
         |JOIN orders ON o_orderkey = l1.l_orderkey
         |JOIN supplier ON s_suppkey = l1.l_suppkey
         |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
         |  AND EXISTS (SELECT 1 FROM lineitem l2
         |    WHERE l2.l_orderkey = l1.l_orderkey
         |      AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
         |    WHERE l3.l_orderkey = l1.l_orderkey
         |      AND l3.l_suppkey <> l1.l_suppkey
         |      AND l3.l_returnflag = 'R')
         |GROUP BY s_name
         |ORDER BY numwait DESC, s_name
         |LIMIT 20""".stripMargin),
    "q50_revenue_share" ->
      (s"""WITH r AS (SELECT p_type,
         |    $RevenueCentsSql rev
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1997-03-01'
         |    AND l_shipdate < TIMESTAMP '1997-04-01')
         |SELECT CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN rev ELSE 0 END)
         |    AS BIGINT) AS economy_revenue_c,
         |  CAST(sum(rev) AS BIGINT) AS total_revenue_c,
         |  round(CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN rev ELSE 0 END)
         |      AS DOUBLE) / CAST(sum(rev) AS DOUBLE), 6) AS economy_share
         |FROM r""".stripMargin),
    "q47_exists_priority" ->
      ("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
         |  AND o_orderdate < TIMESTAMP '1996-10-01'
         |  AND EXISTS (SELECT 1 FROM lineitem
         |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    "q48_case_agg" ->
      ("""SELECT l_linestatus,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),
    "q49_anti_avg" ->
      ("""WITH c AS (SELECT c_custkey, c_mktsegment,
         |    CAST(round(c_acctbal * 100) AS BIGINT) bal_c FROM customer),
         |thr AS (SELECT CAST(sum(bal_c) AS BIGINT) sum_c,
         |    CAST(count(*) AS BIGINT) n_pos FROM c WHERE bal_c > 0)
         |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
         |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
         |FROM c, thr
         |WHERE bal_c * n_pos > sum_c
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
         |      AND o_orderdate >= TIMESTAMP '1998-01-01')
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    "q44_topk_revenue" ->
      (s"""SELECT l_orderkey, o_orderdate,
         |  CAST(sum($RevenueCentsSql) AS BIGINT) AS revenue_c
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING'
         |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1996-03-15'
         |  AND l_shipdate > TIMESTAMP '1996-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue_c DESC, l_orderkey LIMIT 10""".stripMargin),
    "q45_having_join" ->
      ("""WITH big AS (
         |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING CAST(sum(l_quantity) AS BIGINT) > 300
         |)
         |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
         |  CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c, qty
         |FROM customer, orders, big
         |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
         |ORDER BY totalprice_c DESC, o_orderkey LIMIT 100""".stripMargin),
    // PIVOT == conditional aggregation; spelled as such for the oracle
    // (DuckDB's own PIVOT syntax reorders output columns differently)
    "q43_recursive_cte" ->
      ("""WITH RECURSIVE chain AS (
         |  SELECT n_nationkey AS root, n_nationkey AS node, 0 AS depth
         |  FROM nation WHERE n_nationkey % 5 = 0
         |  UNION ALL
         |  SELECT c.root, n.n_nationkey, c.depth + 1
         |  FROM chain c JOIN nation n ON n.n_nationkey = c.node + 1
         |  WHERE n.n_nationkey % 5 <> 0
         |)
         |SELECT root, max(depth) AS chain_len, count(*) AS nodes
         |FROM chain GROUP BY root ORDER BY root""".stripMargin),
    "q42_pivot" ->
      ("""SELECT l_linestatus,
         |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS BIGINT) AS A,
         |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS BIGINT) AS N,
         |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS BIGINT) AS R
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),
    // the GENUINELY correlated form: DuckDB decorrelates the scalar
    // subquery into the same per-nation-aggregate join shape the Spark
    // side declares directly, so a hash-match covers both formulations
    "q41_grouping_sets" ->
      ("""SELECT l_returnflag, l_linestatus, count(*) cnt,
         |  CAST(sum(l_quantity) AS BIGINT) qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus))
         |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin),
    "q40_lateral" ->
      ("""SELECT n.n_nationkey, t.c_custkey, t.bal
         |FROM nation n,
         |LATERAL (
         |  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) bal
         |  FROM customer c
         |  WHERE c.c_nationkey = n.n_nationkey
         |  ORDER BY bal DESC, c_custkey LIMIT 2) t
         |ORDER BY n.n_nationkey, t.bal DESC, t.c_custkey""".stripMargin),
    "q39_correlated" ->
      ("""WITH c AS (SELECT c_nationkey,
         |    CAST(round(c_acctbal * 100) AS BIGINT) bal_c FROM customer)
         |SELECT c1.c_nationkey, count(*) n_above
         |FROM c c1
         |WHERE CAST(c1.bal_c AS DOUBLE) >
         |  (SELECT CAST(sum(c2.bal_c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |   FROM c c2 WHERE c2.c_nationkey = c1.c_nationkey)
         |GROUP BY c1.c_nationkey ORDER BY c1.c_nationkey""".stripMargin),
    "q33_string_agg" ->
      ("SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names " +
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"),
    "q34_md5_join" ->
      ("SELECT a.doc_id, count(*) AS matches FROM " +
        "(SELECT doc_id, md5(text) h FROM documents) a JOIN " +
        "(SELECT doc_id, md5(text) h FROM documents) b " +
        "ON a.h = b.h AND a.doc_id <= b.doc_id " +
        "GROUP BY a.doc_id ORDER BY a.doc_id LIMIT 100"),
    "q35_generate_series" ->
      ("SELECT CAST(i % 7 AS BIGINT) AS m, count(*) AS cnt, " +
        "CAST(sum(i) AS BIGINT) AS sm FROM generate_series(1, 100) t(i) " +
        "GROUP BY m ORDER BY m"),
    "q36_percentile" ->
      ("SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 4) AS p50, " +
        "round(quantile_cont(o_totalprice, 0.9), 4) AS p90 " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    // q37_approx_distinct: intentionally no oracle (engine-specific HLL)
    // q46_collation_filter: intentionally no oracle (ICU collation
    // versions order the Danish probe set differently across DuckDB
    // builds; ordering + no-binary-prune are spec-bound in CollationSpec)
    "q38_row_json" ->
      ("SELECT n_nationkey, to_json(struct_pack(n_nationkey := n_nationkey, " +
        "n_name := n_name, n_regionkey := n_regionkey)) AS row_json " +
        "FROM nation ORDER BY n_nationkey"),
    "q21_left_join" ->
      ("SELECT c_mktsegment, count(*) AS cnt FROM customer c " +
        "LEFT JOIN orders o ON c.c_custkey = o.o_custkey " +
        "WHERE o.o_orderkey IS NULL GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q22_full_outer" ->
      ("SELECT coalesce(nk, nk2) AS nationkey, nk IS NOT NULL AS has_cust, " +
        "nk2 IS NOT NULL AS has_supp FROM " +
        "(SELECT DISTINCT c_nationkey nk FROM customer) c FULL OUTER JOIN " +
        "(SELECT DISTINCT s_nationkey nk2 FROM supplier) s ON nk = nk2 " +
        "ORDER BY nationkey"),
    "q23_cube" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem " +
        "GROUP BY CUBE(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST"),
    "q24_except" ->
      ("SELECT c_custkey FROM (" +
        "SELECT c_custkey FROM customer EXCEPT " +
        "SELECT o_custkey AS c_custkey FROM orders) t " +
        "ORDER BY c_custkey LIMIT 20"),
    "q25_window_frame" ->
      ("SELECT o_custkey, o_orderkey, CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) " +
        "OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_x100 " +
        "FROM orders QUALIFY o_custkey <= 20 ORDER BY o_custkey, o_orderkey"),
    "q26_string_funcs" ->
      ("SELECT p_partkey, upper(p_name) AS up, substr(p_name, 1, 4) AS pre, " +
        "replace(p_name, ' ', '_') AS snake, lpad(p_brand, 10, '#') AS pad, " +
        "concat_ws('|', p_type, trim(p_brand)) AS cat, " +
        "length(p_name) AS len FROM part ORDER BY p_partkey LIMIT 100"),
    "q27_date_funcs" ->
      ("SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m, " +
        "CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_epoch, " +
        "count(*) AS cnt FROM orders GROUP BY 1, 2, 3 ORDER BY y, m"),
    "q28_math_funcs" ->
      ("SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, abs(l_discount - 0.05) AS ad, " +
        "CAST(ceil(l_extendedprice) AS BIGINT) AS cp, " +
        "CAST(floor(l_extendedprice) AS BIGINT) AS fp, " +
        "round(sqrt(l_quantity), 6) AS sq FROM lineitem " +
        "ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 200"),
    "q29_json" ->
      ("SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, " +
        "count(*) AS cnt FROM events GROUP BY k ORDER BY k"),
    "q30_array_funcs" ->
      ("SELECT doc_id, " +
        "array_to_string(list_sort(string_split(text, ' ')[1:3]), '-') AS first3, " +
        "list_contains(string_split(text, ' '), 'spark') AS has_spark, " +
        "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq " +
        "FROM documents ORDER BY doc_id LIMIT 200"),
    "q31_conditionals" ->
      ("SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
        "coalesce(nullif(l_returnflag, 'N'), 'none') AS flag, " +
        "greatest(l_tax, l_discount) AS g, least(l_tax, l_discount) AS l " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 200"),
    "q32_tpch_q1" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_x100, " +
        "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_x100, " +
        "count(*) AS count_order FROM lineitem " +
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
  )
}
