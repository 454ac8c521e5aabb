package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator coverage over the driver's TPC-H-ish testdata.
  *
  * The reference has no relational layer at all (SURVEY.md §2 "explicitly
  * absent": joins, windows, sorts, set ops, subqueries) — its only query
  * surface is arbitrary map/reduce code. These queries prove the new
  * engine subsumes that surface with a full declarative operator set:
  * scan+pushdown, projection, filter, hash aggregation (partial+final),
  * distinct aggregation, HAVING, broadcast/shuffle joins, semi/anti joins,
  * union, rollup, window functions, top-k, and generator (sequence) ops.
  *
  * Numeric discipline for oracle hash-parity: monetary doubles are cast to
  * DECIMAL(18,2) before SUM (exact, order-insensitive), and the final
  * aggregate is cast back to DOUBLE so both engines emit bit-identical
  * values. Raw pass-through doubles are untouched. Every query ends in a
  * deterministic ORDER BY with a unique tie-break key.
  */
object Relational {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** TPC-H Q1-shaped pricing summary: filter + multi-aggregate groupBy.
    * Exercises partial/final HashAggregate with map-side combine — the
    * Spark replacement for the reference's hand-written in-mapper
    * combiners (`word_count/mapper.cpp:24`). */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q6-shaped selective filter + global aggregate: predicate
    * pushdown into the parquet scan, then a single partial+final agg
    * with no shuffle key (one row out). */
  def q6RevenueFilter(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
        col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Top-k by sort: global ORDER BY + LIMIT compiles to TakeOrderedAndProject
    * (per-partition heap + driver merge) — no full sort at scale. */
  def qTopkOrders(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Broadcast hash join: orders (fact) ⋈ customer (dim). The dim side is
    * explicitly broadcast — at 100 TB the fact table never shuffles for
    * this join. */
  def qJoinBroadcastSegments(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val customer = Tables(s, dir, "customer")
    orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_rev"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q5-shaped multi-join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
    * region, dims broadcast, revenue per nation in one region. */
  def q5RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val orders = Tables(s, dir, "orders")
    val customer = Tables(s, dir, "customer")
    val nation = Tables(s, dir, "nation")
    val region = Tables(s, dir, "region")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Left-semi join (EXISTS): customers with at least one order in 2001. */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables(s, dir, "customer")
    val recent = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    customer.join(recent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS): customers with no order in 2001. */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables(s, dir, "customer")
    val recent = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    customer.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Set op: UNION + DISTINCT over two inputs — the keyed generalization of
    * the reference's blind concat-union merge (`Master.java:173-178`). */
  def qUnionDistinct(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer").select(col("c_nationkey").cast("long").as("nk"))
      .union(Tables(s, dir, "supplier").select(col("s_nationkey").cast("long")))
      .distinct()
      .orderBy(col("nk"))

  /** Window function: top-3 customers per market segment by balance. */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(s, dir, "customer")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  /** Grouping sets via ROLLUP: subtotals + grand total in one pass. */
  def qRollupAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** CUBE: all 2ⁿ grouping-set marginals — including the cross-marginals
    * (NULL, l_linestatus) that ROLLUP's prefix hierarchy omits. */
  def qCubeAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Explicit GROUPING SETS — the general form ROLLUP/CUBE specialize,
    * with an asymmetric set list neither shorthand expresses, plus
    * grouping() flags disambiguating a NULL group value from a
    * super-aggregate row (the reason ORDER BY the bare keys is not
    * enough). One ExpandExec feeding a single hash aggregate — never a
    * union of per-set scans. */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    s.sql(
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
         |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
         |  count(*) AS n_rows,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         |FROM parquet.`$dir/lineitem.parquet`
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
         |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin)

  /** Fixed-bound value histogram via width_bucket — the numeric
    * data-profiling primitive (20 bins over [0, 500), plus the engine-
    * defined overflow bins 0 and 21 for out-of-range values). Integer
    * bucket arithmetic is engine-portable where float binning is not. */
  def evValueHistogram(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(width_bucket(col("value"), lit(0.0), lit(500.0), lit(20)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_events"))
      .orderBy(col("bucket"))

  /** Exact distinct aggregation (expand + two-phase agg under the hood). */
  def qDistinctCounts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"))

  /** HAVING: post-aggregation filter on the aggregate value. */
  def qHavingOrders(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
      .filter(col("n_orders") >= 18)
      .orderBy(col("o_custkey"))

  /** Generator: explode(sequence(...)) — the Spark form of the reference's
    * interval→seconds expansion (`finding_peek_numbers/mapper.cpp:26-30`). */
  def qSequenceExplode(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .select(explode(sequence(lit(1L), col("o_orderkey") % 5 + 1)).as("n"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("n"))

  /** Semi-structured: extract a field from the JSON `props` column and
    * aggregate it. Spark side uses native get_json_object; try_cast keeps
    * malformed / missing / non-integer values as NULL instead of an ANSI
    * cast error (and the oracle's regexp + TRY_CAST mirrors that —
    * signed integers only, anything else NULL, aggregates skip NULLs). */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .withColumn("raw", get_json_object(col("props"), "$.k"))
      .withColumn("k",
        when(col("raw").rlike("^-?[0-9]+$"), expr("try_cast(raw AS BIGINT)")))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Approximate distinct counting (HyperLogLog++) — the 100 TB form of
    * q_distinct_counts: sketches merge associatively, so no expand and a
    * bounded-memory two-phase aggregate. Rows-only (no oracle: DuckDB's
    * approx sketch differs); accuracy vs exact is asserted in tests. */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    // bounds-check oracle form (round 7): Spark's HLL++ values are not
    // reproducible in another engine, but the accuracy CONTRACT is —
    // emit the exact counts plus a per-sketch in-bounds flag (0.15
    // relative = 7+ sigma at rsd 0.02, so a false flag means the
    // sketch is broken, not unlucky) and let the DuckDB oracle pin
    // exact counts and all-TRUE flags. The HLL path still runs and is
    // now gated by the driver's compare instead of a weaker self-check.
    //
    // Shape note: the exact side deliberately AVOIDS multi-distinct in
    // one aggregate — three countDistinct columns make Catalyst expand
    // every row once per distinct set (measured 8.2 s vs 1.1 s at
    // sf0.1). Instead each column gets its own pruned-scan
    // distinct+count (narrow two-stage shuffles), joined back on the
    // 3-row group key; the HLL aggregate stays a single expand-free
    // pass — the shape that survives scale on BOTH sides.
    val li = Tables(s, dir, "lineitem")
    def exactOf(c: String, as: String) =
      li.select(col("l_returnflag"), col(c)).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
    def ok(approx: String, exact: String) =
      (abs(col(approx).cast("double") - col(exact).cast("double")) /
        greatest(col(exact), lit(1L)).cast("double") <= 0.15)
    li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_suppkey"), 0.02).as("approx_supp"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_part"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
      .join(exactOf("l_suppkey", "exact_supp"), "l_returnflag")
      .join(exactOf("l_partkey", "exact_part"), "l_returnflag")
      .join(exactOf("l_orderkey", "exact_orders"), "l_returnflag")
      .select(col("l_returnflag"),
        col("exact_supp"), ok("approx_supp", "exact_supp").as("ok_supp"),
        col("exact_part"), ok("approx_part", "exact_part").as("ok_part"),
        col("exact_orders"), ok("approx_orders", "exact_orders").as("ok_orders"))
      .orderBy(col("l_returnflag"))
  }

  /** Two-level salted aggregation — the skew-mitigation pattern for hot
    * keys at 100 TB. lineitem has only 3 return-flag values, so a naive
    * groupBy sends a third of the table to one reducer; salting fans each
    * hot key over 16 sub-keys (cheap partial sums), then merges the 48
    * partials. The result is identical to the plain aggregate, which is
    * exactly what the oracle checks. */
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(dec(col("l_quantity"))).as("partial_qty"), count(lit(1)).as("partial_cnt"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("partial_qty")).cast("double").as("sum_qty"),
        sum(col("partial_cnt")).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Skewed shuffle join — the AQE-side complement to qSaltedAgg's
    * manual salting. 30% of lineitem rows are remapped to ONE hot part
    * key, then merge-hint-joined (sort-merge, broadcast disabled by the
    * hint) against the unique-keyed part table: the hot key lands in a
    * single shuffle partition that dwarfs the median — exactly the
    * straggler AQE's skew-join handling exists to split at runtime
    * (hot-partition split on the fact side, dim rows replicated to each
    * split). The query itself is config-free and oracle-checked; the
    * runtime split (`skew=true` in the executed plan) is pinned by
    * AqeSkewSpec with the skew thresholds scaled to test data, and the
    * resulting plan is dumped in PLANS.md. */
  def qSkewJoin(s: SparkSession, dir: String): DataFrame = {
    // The hash-repartition gives the join shuffle a MULTI-TASK map side,
    // which any real corpus has (thousands of scan tasks at 100 TB) but a
    // one-row-group test parquet does not. AQE's skew split works at map-
    // output granularity — a hot reduce partition fed by ONE mapper is a
    // single indivisible chunk and is not even counted as skewed.
    val li = Tables(s, dir, "lineitem")
      .repartition(col("l_orderkey"))
      .withColumn("skew_key",
        when(col("l_partkey") % 10 < 3, lit(1L)).otherwise(col("l_partkey").cast("long")))
    val p = Tables(s, dir, "part")
      .select(col("p_partkey").cast("long").as("skew_key"), col("p_brand"))
    li.hint("merge").join(p, "skew_key")
      .groupBy(col("p_brand"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast("double").as("revenue"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("p_brand"))
  }

  /** The batch boundary for the MERGE demo: orders before it are the
    * standing snapshot, orders on/after it are the arriving batch. */
  val mergeCutoff = "1999-01-01"

  /** MERGE / upsert semantics — the incremental-refresh pattern every
    * warehouse runs nightly: a per-customer revenue snapshot (target)
    * absorbs an arriving order batch (source). Matched keys update
    * (counts and totals add), unmatched source keys insert, unmatched
    * target keys carry through — expressed as ONE full-outer join on the
    * aggregate key plus coalesce arithmetic, which is exactly how a
    * lakehouse MERGE INTO executes under the hood. Both sides aggregate
    * BEFORE the join, so the shuffle carries one row per customer, not
    * per order, and the join key equals the aggregation key — at 100 TB
    * the partitioning from the two groupBys is reused by the join with
    * no extra exchange. Decimal sums keep the addition exact and
    * order-insensitive. */
  def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val cutoff = lit(mergeCutoff).cast("timestamp")
    def rollup(df: DataFrame): DataFrame =
      df.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("t"))
    val target = rollup(o.filter(col("o_orderdate") < cutoff))
      .select(col("o_custkey"), col("n").as("t_n"), col("t").as("t_t"))
    val source = rollup(o.filter(col("o_orderdate") >= cutoff))
      .select(col("o_custkey"), col("n").as("s_n"), col("t").as("s_t"))
    target.join(source, Seq("o_custkey"), "full_outer")
      .select(
        col("o_custkey"),
        (coalesce(col("t_n"), lit(0L)) + coalesce(col("s_n"), lit(0L))).as("n_orders"),
        (coalesce(col("t_t"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("s_t"), lit(0).cast("decimal(18,2)"))).cast("double").as("total_spent"),
        when(col("t_n").isNotNull && col("s_n").isNotNull, "update")
          .when(col("s_n").isNotNull, "insert")
          .otherwise("keep").as("action"))
      .orderBy(col("o_custkey"))
  }

  /** Set operations beyond union: INTERSECT / EXCEPT (distinct set
    * semantics in both engines). */
  def qIntersectExcept(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer").select(col("c_nationkey").cast("long").as("nk"))
    val su = Tables(s, dir, "supplier").select(col("s_nationkey").cast("long").as("nk"))
    c.intersect(su).withColumn("tag", lit("both"))
      .union(c.except(su).withColumn("tag", lit("customer_only")))
      .orderBy(col("tag"), col("nk"))
  }

  /** Scalar subquery: customers above the global average balance. The
    * average goes through an exact decimal sum so both engines compare
    * against the identical double. */
  def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val avg = c.agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    c.join(broadcast(avg))
      .filter(col("c_acctbal") > col("avg_bal"))
      .select(col("c_custkey"), col("c_acctbal"), col("avg_bal"))
      .orderBy(col("c_custkey"))
  }

  /** Date/time parts: orders per (year, month). */
  def qDateParts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("y"), col("m"))

  /** Row-level string function battery (projection-only — stays entirely
    * inside whole-stage codegen, no shuffle). */
  def qStringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).cast("long").as("name_len"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"))
      .orderBy(col("c_custkey"))

  /** Math function battery on IEEE-deterministic ops (sqrt/abs/floor/
    * ceil — no libm-dependent transcendentals, which can differ across
    * engines in the last ulp). */
  def qMathFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Pivot: one column per l_linestatus value, sums as cells. */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(dec(col("l_quantity"))).cast("double"))
      .orderBy(col("l_returnflag"))

  /** Full outer join: per-nation customer and supplier counts, nations
    * missing on either side kept with zero counts. */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer").groupBy(col("c_nationkey").cast("long").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val su = Tables(s, dir, "supplier").groupBy(col("s_nationkey").cast("long").as("nk"))
      .agg(count(lit(1)).as("n_supp"))
    c.withColumnRenamed("nk", "c_nk")
      .join(su.withColumnRenamed("nk", "s_nk"), col("c_nk") === col("s_nk"), "full_outer")
      .select(coalesce(col("c_nk"), col("s_nk")).as("nk"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nk"))
  }

  /** Array/struct construction + manipulation ops, reduced to scalar
    * outputs for oracle comparison. */
  def qStructArrayOps(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .select(
        col("c_custkey"),
        array(col("c_nationkey").cast("long"), col("c_custkey") % 10,
          length(col("c_name")).cast("long")).as("arr"))
      .select(
        col("c_custkey"),
        element_at(col("arr"), 1).as("first_el"),
        sort_array(col("arr")).getItem(0).as("min_el"),
        array_contains(col("arr"), 3L).cast("boolean").as("has_three"),
        aggregate(col("arr"), lit(0L), (a, b) => a + b).as("arr_sum"))
      .orderBy(col("c_custkey"))

  /** Top-2 customers per nation through a correlated LATERAL subquery
    * with ORDER BY + LIMIT — per-group top-k expressed as the inner
    * query the user actually thinks in, decorrelated by Catalyst rather
    * than hand-rewritten to a window. Exercises the `spark.sql` entry
    * path (reading the parquet directly via the `parquet.` catalog); the
    * DataFrame spelling of the same operator is `Dataset.lateralJoin`.
    * The doubles compared/ordered come straight from parquet, so
    * cross-engine hash parity holds bit-for-bit. */
  def qLateralTopk(s: SparkSession, dir: String): DataFrame =
    s.sql(
      s"""SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
         |FROM parquet.`$dir/nation.parquet` n,
         |LATERAL (SELECT c_custkey, c_name, c_acctbal
         |         FROM parquet.`$dir/customer.parquet` c
         |         WHERE c.c_nationkey = n.n_nationkey
         |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
         |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin)

  /** Iterative SQL without a driver loop: a recursive CTE (new in Spark 4)
    * walks each region's nation chain from its minimum key, labeling every
    * node with the chain root — the transitive-closure shape that
    * previously required the hand-rolled loop in `Dedup`'s clustering.
    * The recursion is a DAG walk (strictly increasing keys), so UNION ALL
    * terminates; DuckDB executes the identical statement as the oracle. */
  def qRecursiveChain(s: SparkSession, dir: String): DataFrame =
    s.sql(
      s"""WITH RECURSIVE
         |succ AS (
         |  SELECT n_nationkey AS src,
         |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
         |  FROM parquet.`$dir/nation.parquet`),
         |roots AS (
         |  SELECT min(n_nationkey) AS node FROM parquet.`$dir/nation.parquet`
         |  GROUP BY n_regionkey),
         |chain AS (
         |  SELECT node, node AS lab FROM roots
         |  UNION ALL
         |  SELECT s.dst AS node, c.lab FROM chain c JOIN succ s ON s.src = c.node
         |  WHERE s.dst IS NOT NULL)
         |SELECT node AS n_nationkey, lab AS chain_root FROM chain ORDER BY node""".stripMargin)

  /** UNPIVOT (wide → long): per-returnflag measures stacked into
    * (measure, value) rows via the `stack` generator — the inverse of
    * q_pivot. The oracle spells it as the portable UNION ALL. */
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
      .select(col("l_returnflag"),
        expr("stack(2, 'sum_price', sum_price, 'sum_qty', sum_qty) AS (measure, value)"))
      .orderBy(col("l_returnflag"), col("measure"))

  /** Null semantics pinned cross-engine: a derived nullable group key,
    * the null group counted like any other by count(*) but skipped by
    * count(col), and explicit NULLS FIRST ordering (Spark's ASC default —
    * DuckDB defaults NULLS LAST, the classic silent divergence). */
  def qNullSemantics(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .select(expr("nullif(c_nationkey % 5, 0)").cast("long").as("grp"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), count(col("grp")).as("n_nonnull"))
      .orderBy(asc_nulls_first("grp"))

  /** Second-moment aggregate family (correlation / covariance / stddev)
    * per group — the statistics pass a feature-engineering pipeline runs
    * over numeric columns. One hash aggregate: Spark's central-moment
    * aggregates merge associatively, so this is map-side-combined like
    * any sum. Float parity: the moment sums accumulate in
    * engine-specific orders, so outputs are quantized (6 decimals for
    * the dimensionless ratios, 3 for the covariance whose magnitude is
    * ~1e4) — the accumulated rounding error at these group sizes is
    * orders of magnitude inside that tolerance. */
  def qCorrStats(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 3).as("covar_qty_price"),
        round(stddev_pop(col("l_quantity")), 6).as("stddev_qty"),
        round(avg(col("l_quantity")), 6).as("avg_qty"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unpivot" -> qUnpivot _,
    "q_null_semantics" -> qNullSemantics _,
    "q_cube_agg" -> qCubeAgg _,
    "q_grouping_sets" -> qGroupingSets _,
    "ev_value_histogram" -> evValueHistogram _,
    "q_recursive_chain" -> qRecursiveChain _,
    "q_lateral_topk" -> qLateralTopk _,
    "q_pivot" -> qPivot _,
    "q_full_outer" -> qFullOuter _,
    "q_struct_array_ops" -> qStructArrayOps _,
    "q_intersect_except" -> qIntersectExcept _,
    "q_scalar_subquery" -> qScalarSubquery _,
    "q_date_parts" -> qDateParts _,
    "q_string_funcs" -> qStringFuncs _,
    "q_math_funcs" -> qMathFuncs _,
    "q_salted_agg" -> qSaltedAgg _,
    "q_corr_stats" -> qCorrStats _,
    "q_skew_join" -> qSkewJoin _,
    "q_merge_upsert" -> qMergeUpsert _,
    "q_approx_distinct" -> qApproxDistinct _,
    "q1_pricing_summary" -> q1PricingSummary _,
    "q6_revenue_filter" -> q6RevenueFilter _,
    "q_topk_orders" -> qTopkOrders _,
    "q_join_broadcast_segments" -> qJoinBroadcastSegments _,
    "q5_region_revenue" -> q5RegionRevenue _,
    "q_semi_join" -> qSemiJoin _,
    "q_anti_join" -> qAntiJoin _,
    "q_union_distinct" -> qUnionDistinct _,
    "q_window_rank" -> qWindowRank _,
    "q_rollup_agg" -> qRollupAgg _,
    "q_distinct_counts" -> qDistinctCounts _,
    "q_having_orders" -> qHavingOrders _,
    "q_sequence_explode" -> qSequenceExplode _,
    "q_json_extract" -> qJsonExtract _,
  )

  val oracles: Map[String, String] = Map(
    "q_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
        |ORDER BY l_returnflag, measure""".stripMargin,
    "q_null_semantics" ->
      """SELECT grp, count(*) AS n_rows, count(grp) AS n_nonnull
        |FROM (SELECT CAST(nullif(c_nationkey % 5, 0) AS BIGINT) AS grp FROM customer)
        |GROUP BY grp ORDER BY grp ASC NULLS FIRST""".stripMargin,
    "q_recursive_chain" ->
      """WITH RECURSIVE
        |succ AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |roots AS (SELECT min(n_nationkey) AS node FROM nation GROUP BY n_regionkey),
        |chain AS (
        |  SELECT node, node AS lab FROM roots
        |  UNION ALL
        |  SELECT s.dst AS node, c.lab FROM chain c JOIN succ s ON s.src = c.node
        |  WHERE s.dst IS NOT NULL)
        |SELECT node AS n_nationkey, lab AS chain_root FROM chain ORDER BY node""".stripMargin,
    "q_lateral_topk" ->
      """SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_name, c_acctbal
        |         FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_full_outer" ->
      """SELECT coalesce(c.nk, s.nk) AS nk,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT CAST(c_nationkey AS BIGINT) AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT CAST(s_nationkey AS BIGINT) AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON c.nk = s.nk
        |ORDER BY nk""".stripMargin,
    "q_struct_array_ops" ->
      """SELECT c_custkey, arr[1] AS first_el, list_sort(arr)[1] AS min_el,
        |  list_contains(arr, 3) AS has_three,
        |  CAST(list_sum(arr) AS BIGINT) AS arr_sum
        |FROM (
        |  SELECT c_custkey,
        |    [CAST(c_nationkey AS BIGINT), c_custkey % 10, CAST(length(c_name) AS BIGINT)] AS arr
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q_intersect_except" ->
      """SELECT nk, 'both' AS tag FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |  INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
        |UNION ALL
        |SELECT nk, 'customer_only' AS tag FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |  EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
        |ORDER BY tag, nk""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, c_acctbal,
        |  (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM customer) AS avg_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q_date_parts" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
        |  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey, upper(c_mktsegment) AS seg_upper, lower(c_name) AS name_lower,
        |  substr(c_name, 1, 8) AS name_prefix, CAST(length(c_name) AS BIGINT) AS name_len,
        |  concat_ws('|', c_mktsegment, c_name) AS joined
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  sqrt(l_quantity) AS qty_sqrt, abs(l_discount - 0.05) AS disc_dev,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_skew_join" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM (SELECT CASE WHEN l_partkey % 10 < 3 THEN 1 ELSE l_partkey END AS skew_key,
        |             l_extendedprice, l_discount, l_quantity
        |      FROM lineitem) li
        |JOIN (SELECT p_partkey AS skew_key, p_brand FROM part) p USING (skew_key)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_merge_upsert" ->
      s"""WITH target AS (
         |  SELECT o_custkey, count(*) AS t_n,
         |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t_t
         |  FROM orders WHERE o_orderdate < TIMESTAMP '$mergeCutoff'
         |  GROUP BY o_custkey),
         |source AS (
         |  SELECT o_custkey, count(*) AS s_n,
         |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s_t
         |  FROM orders WHERE o_orderdate >= TIMESTAMP '$mergeCutoff'
         |  GROUP BY o_custkey)
         |SELECT COALESCE(t.o_custkey, s.o_custkey) AS o_custkey,
         |  COALESCE(t.t_n, 0) + COALESCE(s.s_n, 0) AS n_orders,
         |  CAST(COALESCE(t.t_t, 0) + COALESCE(s.s_t, 0) AS DOUBLE) AS total_spent,
         |  CASE WHEN t.t_n IS NOT NULL AND s.s_n IS NOT NULL THEN 'update'
         |       WHEN s.s_n IS NOT NULL THEN 'insert'
         |       ELSE 'keep' END AS action
         |FROM target t FULL OUTER JOIN source s ON t.o_custkey = s.o_custkey
         |ORDER BY o_custkey""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the HLL values themselves are engine-specific; the oracle pins
    // the exact counts and demands every in-bounds flag be TRUE
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supp, TRUE AS ok_supp,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_part, TRUE AS ok_part,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders, TRUE AS ok_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_corr_stats" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_pop(l_quantity, l_extendedprice), 3) AS covar_qty_price,
        |  round(stddev_pop(l_quantity), 6) AS stddev_qty,
        |  round(avg(l_quantity), 6) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_revenue_filter" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.04 AND l_discount <= 0.06 AND l_quantity < 24""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_join_broadcast_segments" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q_union_distinct" ->
      """SELECT DISTINCT nk FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |  UNION ALL SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
        |ORDER BY nk""".stripMargin,
    "q_window_rank" ->
      """SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer)
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
    "q_rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_cube_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin,
    // DuckDB 1.0 has no width_bucket; this CASE is arithmetically
    // identical to Spark's implementation for these bounds
    // ((500-0)/20 = 25.0 exactly, so both engines floor(value/25.0)+1
    // on the same double) including the PostgreSQL overflow buckets
    "ev_value_histogram" ->
      """SELECT bucket, count(*) AS n_events FROM (
        |  SELECT CASE WHEN value < 0.0 THEN 0
        |              WHEN value >= 500.0 THEN 21
        |              ELSE CAST(floor(value / 25.0) AS BIGINT) + 1 END AS bucket
        |  FROM events)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_distinct_counts" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_having_orders" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 18 ORDER BY o_custkey""".stripMargin,
    "q_sequence_explode" ->
      """SELECT n, count(*) AS cnt
        |FROM (SELECT unnest(generate_series(1, o_orderkey % 5 + 1)) AS n FROM orders)
        |GROUP BY n ORDER BY n""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k, count(*) AS n
        |FROM (
        |  SELECT event_type,
        |    CASE WHEN raw IS NOT NULL AND regexp_matches(raw, '^-?[0-9]+$')
        |         THEN CAST(raw AS BIGINT) END AS k
        |  FROM (
        |    SELECT event_type,
        |      CASE WHEN props IS NOT NULL AND json_valid(props)
        |           THEN json_extract_string(props, '$.k') END AS raw
        |    FROM events))
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
