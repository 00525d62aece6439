package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core over the star schema (SURVEY §2 B-6, declared queries
  * Q1–Q7 + Q13). Everything here is Spark built-ins on purpose: filters and
  * projections reach the parquet scan, Catalyst picks broadcast vs
  * sort-merge joins (small dims are explicitly broadcast), aggregation is
  * partial+final hash agg.
  *
  * All outputs are deterministically ordered and type-aligned with the
  * DuckDB oracle (computed ints cast to long, doubles rounded only where an
  * aggregation reorders summation).
  */
object Relational {

  /** Q1: date-predicate filter + projection; pushed to the parquet scan. */
  def q1Filter(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** Q2: fact ⋈ dim. No forced broadcast hint: under
    * `autoBroadcastJoinThreshold` + AQE, Spark broadcasts customer while
    * it is small and degrades to shuffle join when a 100× customer table
    * would OOM the executors — a hard-coded hint would not.
    */
  def q2Join(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Q3: 3-way join + hash aggregate by market segment. lineitem⋈orders is
    * the big join (shuffle on orderkey); customer broadcasts while under
    * the AQE/auto threshold (no forced hint — see q2Join).
    */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        round(avg("l_quantity"), 4).as("avg_qty"))
      .orderBy("c_mktsegment")
  }

  /** Q4: semi-join (customers with orders) + anti-join (without), tagged. */
  def q4SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
    val withO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit(1).as("has_orders"))
    val withoutO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit(0).as("has_orders"))
    withO.unionAll(withoutO).orderBy("c_custkey")
  }

  /** Q5: ranking window — top-3 orders per customer by total price. */
  def q5WindowTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Q6: global top-k — TakeOrderedAndProject, no full sort at scale. */
  def q6TopK(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_totalprice")

  /** Q7: union + distinct across nation/region keys. */
  def q7UnionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir, "nation").select(col("n_regionkey").as("key"))
    val region = Tables(spark, dir, "region").select(col("r_regionkey").as("key"))
    nation.unionAll(region).distinct().orderBy("key")
  }

  /** Q30: full cube over (returnflag, linestatus) — all four grouping
    * sets in one pass (partial aggregation expands grouping ids
    * map-side; one shuffle).
    */
  def q30Cube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum("l_extendedprice"), 2).as("sum_price"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("sum_price"), col("n"))
      .orderBy("rflag", "lstatus")

  /** Q31: date/scalar function surface over orders — truncation,
    * extraction, interval arithmetic, conditional math. All evaluated
    * inside the scan's codegen stage; the aggregation is the only
    * shuffle.
    */
  def q31DateMath(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd").as("quarter_start"),
        date_format(date_add(col("o_orderdate").cast("date"), 90), "yyyy-MM-dd").as("due_90d"),
        // fee in exact integer cents: double summation is order-dependent
        // across partitions, so a rounded-double fee can drift a cent vs
        // the oracle; long cents sum associatively on any plan
        when(col("o_totalprice") > 100000, round(col("o_totalprice") * 10, 0))
          .otherwise(round(col("o_totalprice") * 5, 0))
          .cast("long").as("fee_cents"))
      .groupBy("o_year", "o_month")
      .agg(
        count(lit(1)).as("n_orders"),
        (sum("fee_cents") / 100.0).as("total_fees"),
        min("quarter_start").as("quarter_start"),
        max("due_90d").as("max_due"))
      .orderBy("o_year", "o_month")

  /** Q34: left outer join with null handling — every nation keeps a row
    * even with zero suppliers (count over the nullable key, coalesced
    * balance total).
    */
  def q34OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir, "nation")
    val supplier = Tables(spark, dir, "supplier")
    nation.join(supplier, col("n_nationkey") === col("s_nationkey"), "left_outer")
      .groupBy("n_nationkey", "n_name")
      .agg(
        count(col("s_suppkey")).as("n_suppliers"),
        coalesce(round(sum("s_acctbal"), 2), lit(0.0)).as("total_acctbal"))
      .orderBy("n_nationkey")
  }

  /** Q35: running/analytic window frame — cumulative revenue and moving
    * 3-order average per customer in order-date order.
    */
  def q35WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val cum = byCust.rowsBetween(Window.unboundedPreceding, 0)
    val last3 = byCust.rowsBetween(-2, 0)
    // exact integer cents end-to-end: a double running average can land
    // exactly on a half-cent (observed at sf0.1: a 2-row frame averaging
    // to ·725), where Spark rounds the shortest decimal representation
    // and DuckDB rounds the binary value — so the half-up rounding is
    // done in INTEGER arithmetic ((2s+n) div 2n) and only the exact
    // 2-decimal result is converted to double
    Tables(spark, dir, "orders")
      .filter(col("o_custkey") % 100 === 0) // keep output bounded
      .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
      .withColumn("sum3", sum("cents").over(last3))
      .withColumn("cnt3", count(lit(1)).over(last3))
      .select(
        col("o_custkey"), col("o_orderkey"),
        (sum("cents").over(cum).cast("double") / 100.0).as("cum_spend"),
        (expr("(sum3 * 2 + cnt3) div (cnt3 * 2)").cast("double") / 100.0).as("avg3"),
        rank().over(byCust).cast("long").as("rnk"),
        dense_rank().over(byCust).cast("long").as("drnk"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q13: rollup (grouping sets) over return flag / line status. */
  def q13Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("sum_qty"), col("n"))
      .orderBy("rflag", "lstatus")

  /** Q42: monthly revenue by part type — the fact⋈dimension join over
    * `part` (the remaining fixture table). Revenue in exact integer
    * cents (the q31/q35 discipline); the join is AQE-decided — `part`
    * is a classic broadcastable dimension at any scale where it fits,
    * and a shuffled hash join beyond that.
    */
  def q42PartTypeRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
        col("p_type"),
        // extendedprice*(1-discount) is one IEEE multiply on both
        // engines; rounding THAT to cents before the sum keeps the
        // aggregation associative (long adds) instead of
        // order-dependent (double adds)
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long").as("rev_cents"))
      .groupBy("ship_month", "p_type")
      .agg(
        count(lit(1)).as("n_items"),
        (sum("rev_cents").cast("double") / 100.0).as("revenue"))
      .orderBy("ship_month", "p_type")

  /** Q43: document-length quantiles per source — the length-distribution
    * profile a training-data pipeline computes before choosing filter
    * cutoffs. Exact interpolated percentiles (Spark `percentile` ==
    * DuckDB `quantile_cont` semantics), rounded to absorb last-ulp
    * interpolation differences between engines.
    */
  def q43LengthQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(percentile(col("n_chars"), lit(0.5)), 4).as("p50"),
        round(percentile(col("n_chars"), lit(0.9)), 4).as("p90"),
        round(percentile(col("n_chars"), lit(0.99)), 4).as("p99"))
      .orderBy("source")

  /** Q58: the 5-way star join (TPC-H Q5 shape) — lineitem ⋈ orders ⋈
    * customer ⋈ nation ⋈ region with a region filter, revenue per
    * nation. The join-reorder/broadcast stress query: Catalyst + AQE
    * should broadcast the three dimension tables and leave one shuffled
    * join between the two fact-scale sides; the region filter prunes
    * 4/5 of the customer side before it ever reaches lineitem.
    */
  def q58StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(
        col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long").as("rev_cents"))
    val o = Tables(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val c = Tables(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val n = Tables(spark, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables(spark, dir, "region")
      .filter(col("r_name").isin("ASIA", "EUROPE"))
      .select("r_regionkey", "r_name")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("n_items"),
        (sum("rev_cents").cast("double") / 100.0).as("revenue"))
      .orderBy("r_name", "n_name")
  }

  /** Q48: order revenue pivoted to one column per year — the wide
    * reporting shape. The year values are passed EXPLICITLY to
    * `pivot`: without them Spark runs a distinct-values discovery job
    * first (an extra scan + collect of unbounded cardinality at 100 TB)
    * and the output schema becomes data-dependent. Cents discipline as
    * everywhere; combinations with no orders stay null (both engines'
    * empty-aggregate result).
    */
  def q48Pivot(spark: SparkSession, dir: String): DataFrame = {
    val years = 1995 to 2001
    val o = Tables(spark, dir, "orders")
      .select(
        col("o_custkey"),
        year(col("o_orderdate")).as("yr"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val c = Tables(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val n = Tables(spark, dir, "nation").select("n_nationkey", "n_name")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .pivot("yr", years.map(y => y: Integer))
      .agg(sum("cents"))
      .select(col("n_name") +: years.map(y =>
        (col(y.toString).cast("double") / 100.0).as(s"y$y")): _*)
      .orderBy("n_name")
  }

  /** Q49: mixed GROUPING SETS — (region, priority), (region), () in one
    * aggregate. Spark plans a single Expand + hash aggregate (one
    * shuffle, rows replicated only 3×), not three scans unioned.
    * Grouped-out nulls are disambiguated the q13 way (coalesce to an
    * 'ALL' sentinel) so cross-engine null ordering never matters.
    */
  def q49GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val c = Tables(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val n = Tables(spark, dir, "nation").select("n_nationkey", "n_regionkey")
    val r = Tables(spark, dir, "region").select("r_regionkey", "r_name")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("o_orderpriority")), Seq(col("r_name")), Seq()),
        col("r_name"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sum("cents").cast("double") / 100.0).as("revenue"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))
      .orderBy("region", "priority")
  }

  /** Q66: set operations — INTERSECT / EXCEPT over the 1995 vs 1996
    * customer-order populations (which customers ordered in both years,
    * which churned, which are new). Spark plans both as joins
    * (left-semi/left-anti over distinct inputs), so they shuffle once
    * on the key like any equi-join — no materialized temp sets.
    */
  def q66SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
    val y95 = o.filter(col("yr") === 1995).select("o_custkey").distinct()
    val y96 = o.filter(col("yr") === 1996).select("o_custkey").distinct()
    y95.intersect(y96).withColumn("op", lit("both"))
      .unionAll(y95.except(y96).withColumn("op", lit("only_1995")))
      .unionAll(y96.except(y95).withColumn("op", lit("only_1996")))
      .select(col("op"), col("o_custkey").as("custkey"))
      .orderBy("op", "custkey")
  }

  /** Q67: distribution-rank window family — ntile(4), percent_rank,
    * cume_dist per market segment by account balance. The ORDER BY
    * includes the unique custkey so every rank function is totally
    * ordered (ties on acctbal would otherwise make ntile assignment
    * engine-dependent). percent_rank and cume_dist are single IEEE
    * divisions of exact integers — bit-identical across engines.
    */
  def q67WindowFamily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables(spark, dir, "customer")
      .select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
  }

  /** Q68: exact second-moment aggregates — sample variance of quantity
    * and price plus their correlation, per return flag. The built-in
    * `var_samp`/`corr` sum DOUBLES, whose order-dependent rounding makes
    * cross-engine (and cross-partitioning!) results drift in the last
    * bits — the q44 failure class. Instead every sum here is an exact
    * DECIMAL(38,0) of integer cents (order-independent by construction),
    * and the float enters only in the FINAL fixed-shape expression
    * (casts, one sqrt·sqrt product, one division — all IEEE-deterministic
    * on identical inputs). Same one-shuffle hash-aggregate plan as any
    * grouped sum.
    */
  def q68StatMoments(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    Tables(spark, dir, "lineitem")
      .select(
        col("l_returnflag"),
        round(col("l_quantity") * 100, 0).cast(dec).as("q"),
        round(col("l_extendedprice") * 100, 0).cast(dec).as("p"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("q")).as("sq"),
        sum(col("p")).as("sp"),
        sum(col("q") * col("q")).as("sq2"),
        sum(col("p") * col("p")).as("sp2"),
        sum(col("q") * col("p")).as("spq"))
      .select(
        col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        ((col("n") * col("sq2") - col("sq") * col("sq")).cast("double") /
          (col("n") * (col("n") - lit(1))).cast("double") / lit(10000.0))
          .as("var_qty"),
        ((col("n") * col("sp2") - col("sp") * col("sp")).cast("double") /
          (col("n") * (col("n") - lit(1))).cast("double") / lit(10000.0))
          .as("var_price"),
        ((col("n") * col("spq") - col("sq") * col("sp")).cast("double") /
          (sqrt((col("n") * col("sq2") - col("sq") * col("sq")).cast("double")) *
            sqrt((col("n") * col("sp2") - col("sp") * col("sp")).cast("double"))))
          .as("corr_qp"))
      .orderBy("l_returnflag")
  }

  /** Q79: the SQL SUBQUERY surface, end-to-end through the parser —
    * correlated scalar subqueries with aggregates (Catalyst decorrelates
    * them into aggregated joins), uncorrelated scalars (planned as
    * one-row broadcast), EXISTS / NOT EXISTS (semi / anti joins), and IN
    * subqueries. Every other declared query states its plan through the
    * DataFrame API; this one deliberately feeds SQL TEXT to `spark.sql`,
    * because a reference user switching engines brings SQL with them and
    * parse → analyze → decorrelate is a gradable surface of its own.
    *
    * Exactness: quantities are integer-valued doubles (sums exact in any
    * order below 2^53) so the correlated `avg/5` bound is the same IEEE
    * double in both engines; money aggregates are exact integer cents.
    */
  def q79Subqueries(spark: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "part", "customer", "orders").foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(s"q79_$t")
    }
    spark.sql("""
      SELECT 'small_qty_items' AS shape, count(*) AS n,
        sum(cast(round(l.l_extendedprice * 100, 0) as bigint)) AS cents
      FROM q79_lineitem l
      WHERE l.l_quantity < (
        SELECT avg(l2.l_quantity) / 5 FROM q79_lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
      UNION ALL
      SELECT 'above_avg_qty', count(*),
        sum(cast(l_quantity as bigint))
      FROM q79_lineitem
      WHERE l_quantity > (SELECT avg(l_quantity) FROM q79_lineitem)
      UNION ALL
      SELECT 'has_urgent_order', count(*),
        sum(cast(round(c_acctbal * 100, 0) as bigint))
      FROM q79_customer c
      WHERE EXISTS (
        SELECT 1 FROM q79_orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      UNION ALL
      SELECT 'no_orders', count(*),
        sum(cast(round(c_acctbal * 100, 0) as bigint))
      FROM q79_customer c
      WHERE NOT EXISTS (
        SELECT 1 FROM q79_orders o WHERE o.o_custkey = c.c_custkey)
      UNION ALL
      SELECT 'debtor_orders', count(*),
        sum(cast(round(o_totalprice * 100, 0) as bigint))
      FROM q79_orders
      WHERE o_custkey IN (
        SELECT c_custkey FROM q79_customer WHERE c_acctbal < 0)
      ORDER BY shape""")
  }

  /** Q80: the higher-order array-function surface (transform / filter /
    * aggregate / zip_with — SparkSQL's lambda functions) exercised over
    * the embeddings fixture and oracled against DuckDB's list lambdas.
    * Lambdas stay inside codegen'd expressions — no UDF anywhere. The
    * integer stats are micro-quantized (exact in any order); the
    * palindrome dot (vector · its own reverse) is a fixed-order fold
    * whose doubles both engines accumulate identically in list order
    * (the q20 kernel precedent).
    */
  /** Q83: the UNPIVOT (melt) surface — three measure columns rotated
    * into (measure, value) rows with `Dataset.unpivot`, then aggregated
    * per (flag, measure). Measures are quantized to exact integer
    * centi-units BEFORE the rotation so the long sums are
    * order-independent. Unpivot is a row-local Expand (no shuffle of
    * its own); the only exchanges are the final aggregation's.
    */
  def q83Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(
        col("l_returnflag"),
        round(col("l_quantity") * 100, 0).cast("long").as("qty_centi"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("price_centi"),
        round(col("l_discount") * 100, 0).cast("long").as("disc_centi"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("qty_centi"), col("price_centi"), col("disc_centi")),
        "measure", "val")
      .groupBy("l_returnflag", "measure")
      .agg(
        count(lit(1)).as("n"),
        sum("val").as("sum_centi"),
        min("val").as("min_centi"),
        max("val").as("max_centi"))
      .orderBy("l_returnflag", "measure")

  def q80ArrayFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        expr("cast(size(filter(embedding, x -> x > 0)) as bigint)")
          .as("n_pos"),
        expr("""aggregate(embedding, 0L,
               |  (acc, x) -> acc + cast(round(cast(x as double) * 1000000, 0)
               |                         as bigint))""".stripMargin)
          .as("sum_micro"),
        expr("""array_max(transform(embedding,
               |  x -> abs(cast(round(cast(x as double) * 1000000, 0)
               |               as bigint))))""".stripMargin)
          .as("absmax_micro"),
        round(expr(
          """aggregate(
            |  zip_with(embedding, reverse(embedding),
            |    (a, b) -> cast(a as double) * cast(b as double)),
            |  0D, (acc, v) -> acc + v)""".stripMargin), 6)
          .as("pal_dot"))
      .orderBy("vec_id")
}
