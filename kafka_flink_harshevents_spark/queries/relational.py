"""Relational operator coverage over the TPC-H-ish star schema.

The reference performs no dataset-to-dataset joins (SURVEY.md §2.7) — it
gets its keying from Kafka and its lookups from Redis — but capability
parity for an engine means the full relational algebra. These queries
exercise every join strategy and aggregation shape Spark offers, with the
physical plan the 100 TB deployment wants:

- dimension joins (region/nation) are explicitly ``broadcast()`` — they are
  tiny at every scale factor, so no shuffle ever;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once and AQE
  (enabled in session.py) coalesces/skew-splits at runtime;
- aggregates are partial (map-side) + final by construction — Catalyst's
  HashAggregateExec does this for every ``groupBy().agg()`` here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.queries._util import (
    det_avg,
    det_avg_sql,
    det_sum,
    det_sum_sql,
    det_total,
    det_total_sql,
    load,
    ts_millis,
)

# Revenue expression used across TPC-H-style queries (built lazily:
# Column construction needs an active SparkContext in classic PySpark).
def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full-scan grouped aggregation on the fact table.

    Map-side partial agg on 2 low-cardinality keys → 4-group final agg:
    the shuffle moves O(groups), not O(rows), at any scale.
    """
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            det_sum("l_quantity", 2).alias("sum_qty"),
            det_sum("l_extendedprice", 2).alias("sum_base_price"),
            det_sum(_revenue(), 2).alias("sum_disc_price"),
            det_sum(_revenue() * (1 + F.col("l_tax")), 2).alias("sum_charge"),
            det_avg("l_quantity", 4).alias("avg_qty"),
            det_avg("l_extendedprice", 4).alias("avg_price"),
            det_avg("l_discount", 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two-step join → top-10.

    customer (filtered) is small → AQE converts its join to broadcast at
    runtime; the orders⋈lineitem join shuffles on orderkey. The top-k is
    TakeOrderedAndProject: only 10 rows cross to the driver.
    """
    cutoff = F.lit("1997-06-30").cast("timestamp")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(det_sum(_revenue(), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with co-location predicate.

    region/nation are broadcast explicitly (5 and 25 rows at ANY scale
    factor — broadcasting them is free and removes two shuffles).
    """
    r = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        r.join(n, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(det_sum(_revenue(), 2).alias("revenue"))
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, then count by priority.

    The semi-join needs only orderkey+shipdate from lineitem — column
    pruning reaches the scan; the non-equi part of the predicate is
    evaluated post-probe without widening the shuffle.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window function: top-3 orders by value per customer.

    One shuffle on c_custkey shared by the join and the window (Catalyst
    reuses the partitioning). Tie-break on o_orderkey → deterministic.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("c_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface in one entry: percent_rank, cume_dist,
    ntile, nth_value and last over the per-customer order history. The
    partition key is ``o_custkey`` — cardinality grows with the data,
    so partitions stay balanced at any scale (an enum-valued partition
    key would funnel the table into a handful of partitions, the
    anti-pattern the percentile queries rewrote away). ORDER BY
    includes the key tie-break, so every rank-based value is
    deterministic; one shuffle, one Window operator.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.nth_value("o_orderkey", 3).over(wf).alias("third_key"),
        F.last("o_orderkey").over(wf).alias("last_key"),
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join: customers with no large order
    (> 400k; every synthetic customer has SOME order, so the unfiltered
    anti-join would be trivially empty). The filter lands on the orders
    scan before the join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400_000)
    return c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


def q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event enriched with the user's most recent order
    at-or-before the event time (operators.joins.asof_join — union-sort,
    one shuffle, no range-join blowup)."""
    from kafka_flink_harshevents_spark.operators.joins import asof_join

    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", ts_millis("ts").alias("ts_ms")
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        ts_millis("o_orderdate").alias("odate_ms"),
        "o_orderkey",
        "o_totalprice",
    )
    joined = asof_join(
        e,
        o,
        on="user_id",
        left_ts="ts_ms",
        right_ts="odate_ms",
        payload_cols=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
    )
    return joined.select(
        "event_id", "user_id", "ts_ms", "o_orderkey", "o_totalprice"
    )


def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) over order totals — grouping-sets coverage.

    Dim names are never null in the data, so coalescing the rollup nulls
    to 'ALL' is unambiguous and keeps the output hash-comparable.
    """
    r = F.broadcast(load(spark, sf_dir, "region"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    joined = (
        r.join(n, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            det_sum("o_totalprice", 2).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "total_revenue",
            "n_orders",
        )
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with per-column grouping flags — the one
    grouping surface CUBE (`ev_cube`) and ROLLUP (`q_revenue_rollup`)
    don't cover: an arbitrary, non-hierarchical set list
    ((priority, status), (status), ()). Answered through the literal
    SQL front-end (the DataFrame API exposes only cube/rollup —
    grouping sets are a first-class SQL feature on the same engine);
    `grouping()` flags disambiguate grouped-out NULLs. Physically one
    Expand + partial/final HashAggregate — each input row fans out to
    its grouping sets map-side, one shuffle total.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    return spark.sql(
        f"""
        SELECT o_orderpriority,
               o_orderstatus,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               count(*) AS n_orders,
               {det_sum_sql("o_totalprice", 2)} AS total_revenue
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderstatus), ())
        """
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar aggregate subquery, decorrelated
    into a per-partkey aggregate joined back to the fact table (what
    Catalyst's RewriteCorrelatedScalarSubquery produces) — the per-part
    averages table is orders of magnitude smaller than lineitem, so AQE
    broadcasts it."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            # exact hi/lo long total (per-row long codegen, not
            # BigDecimal); /1e6 unscales, /7.0 is the Q17 divisor
            F.round(
                det_total("l_extendedprice", 6).cast("double") / 1e6 / 7.0,
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: exact count(DISTINCT) per group (expand +
    two-phase agg under the hood) alongside a plain count."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: customers ordering in BOTH 1996 and 1997
    (INTERSECT) minus those with any F-status order (EXCEPT)."""
    o = load(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    failed = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        y96.intersect(y97).exceptAll(failed.distinct()).select(
            F.col("o_custkey").alias("custkey")
        )
    )


def q_customer_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime value with GLOBAL spend deciles — the ranking
    reuses `operators/ranking.py::with_exact_rank`, so the decile cut
    needs no unpartitioned Window at any table size (the shape ntile()
    would single-partition).

    Spend is ranked as integer CENTS (`round(sum × 100)` → long):
    partial-sum order differs between engines at the ~1e-11 level, and
    two customers with equal true totals would otherwise be ordered by
    that noise in one engine and by the tie-break in the other; rounding
    to the business grain absorbs the noise, then (cents, custkey) is a
    total order both engines agree on bit-for-bit.
    """
    from kafka_flink_harshevents_spark.operators.ranking import with_exact_rank

    c = load(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("spend_cents"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )
    r = with_exact_rank(c, "spend_cents", "o_custkey")
    return r.select(
        "o_custkey",
        "n_orders",
        F.round(F.col("spend_cents") / 100.0, 2).alias("total_spend"),
        F.datediff("last_order", "first_order").cast("long").alias("active_days"),
        F.floor(F.lit(10.0) * (F.col("rn") - 1) / F.col("n"))
        .cast("long")
        .alias("spend_decile"),
    )


def q_yearly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per customer nation — the
    time-series-over-aggregates shape: the heavy fact scan collapses to
    (nation × year) BEFORE any window touches it, so the `lag` runs on a
    dimension-sized series (the right place for a Window at 100 TB —
    after aggregation, never on the fact). Growth divides integer-cent
    totals, sidestepping fp summation-order noise entirely.
    """
    n = F.broadcast(load(spark, sf_dir, "nation"))
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    yearly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents")
        )
    )
    w = Window.partitionBy("nation").orderBy("o_year")
    prev = F.lag("rev_cents").over(w)
    return yearly.select(
        "nation",
        "o_year",
        F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
        F.when(prev.isNotNull(), F.round((F.col("rev_cents") - prev) / prev, 4)).alias(
            "yoy_growth"
        ),
    )


ANALYZE_COLS = (
    # (column, kind) — kind picks the engine-portable min/max repr:
    # 'int' → BIGINT, 'num' → DECIMAL(18,2) string, 'date'/'str' → text
    ("l_orderkey", "int"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_shipdate", "date"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
)


def q_analyze_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE — the statistics-collection pass a cost-based
    optimizer (and every data-quality monitor) runs per column: row
    count, exact distinct count, null count, min/max — here over six
    mixed-type lineitem columns in ONE scan. This is the operational
    query behind Spark's `ANALYZE TABLE ... COMPUTE STATISTICS FOR
    COLUMNS`, emitted as data so the driver can hash it.

    Plan: one COLUMN-PRUNED branch per column (ReadSchema = that single
    column), each an exact count-distinct two-phase aggregate with
    min/max/null counts riding the same pass, unioned. On columnar
    storage this beats the single multi-distinct aggregate by a large
    margin: Catalyst plans N distincts in one aggregate via Expand —
    every full-width row duplicated N times before the shuffle —
    whereas N pruned branches each scan 1/N of the bytes and shuffle
    only their own column's distinct values (measured 11.8 s → 1.7 s
    at sf0.1, local[32]). Numeric min/max are emitted as DECIMAL(18,2)
    strings — double→text formatting is engine-specific, decimal→text
    is not.
    """
    li = load(spark, sf_dir, "lineitem")

    parts: list[DataFrame] = []
    for c, kind in ANALYZE_COLS:
        col = F.col(c)
        rep = col.cast("decimal(18,2)") if kind == "num" else col
        parts.append(
            li.select(c)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.count_distinct(col).cast("long").alias("ndv"),
                F.sum(col.isNull().cast("int")).cast("long").alias("n_nulls"),
                F.min(rep).cast("string").alias("min_repr"),
                F.max(rep).cast("string").alias("max_repr"),
            )
            .select(
                F.lit(c).alias("column_name"),
                "n_rows", "ndv", "n_nulls", "min_repr", "max_repr",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


HIST_BUCKETS = 16  # equi-height histogram buckets


def q_histogram_equiheight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-height histogram over ``l_extendedprice`` — the other half
    of CBO statistics next to `q_analyze_table` (Spark's ANALYZE ...
    FOR COLUMNS builds exactly this for selectivity estimation; an
    equi-WIDTH histogram like `ev_histogram` mis-sizes skewed columns,
    equi-height by construction cannot): split the sorted column into
    HIST_BUCKETS runs of (near-)equal row count and emit each bucket's
    row count, distinct count and min/max bounds.

    Bucket rule: ``floor((rn−1)·K/n)`` over the exact global rank —
    pure integer arithmetic on the same total order (value, orderkey
    tie-break) in both engines, so bucket membership is deterministic
    even across duplicate values. The rank comes from the distributed
    bucketed rank (`operators/ranking.py`) — no global-sort window, no
    ntile over a single partition (the plan Spark's own ntile(K) would
    produce here).

    Scale shape: rank pass (value-range-keyed shuffles) + ONE keyed
    aggregate over bucket ids; min/max emit as DECIMAL strings (the
    `q_analyze_table` portability convention).
    """
    from kafka_flink_harshevents_spark.operators.ranking import (
        with_exact_rank,
    )

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        F.col("l_orderkey") * 10 + F.col("l_linenumber").cast("long"),
    )
    li = li.toDF("v", "rid")
    ranked = with_exact_rank(li, "v", "rid")
    # pure INTEGER division — no float enters bucket assignment
    bucket = F.expr(f"((rn - 1) * {HIST_BUCKETS}) div n").cast("long")
    return (
        ranked.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct("v").cast("long").alias("ndv"),
            F.min(F.col("v").cast("decimal(18,2)")).cast("string").alias(
                "lo_repr"
            ),
            F.max(F.col("v").cast("decimal(18,2)")).cast("string").alias(
                "hi_repr"
            ),
        )
    )


IVM_DELTA_PCT = 10  # ~10% of lineitem plays the "newly arrived" delta

Q1_KEYS = ("l_returnflag", "l_linestatus")
Q1_TOTALS = ("t_qty", "t_price", "t_disc", "t_charge", "t_dcnt", "n")


def q1_partial_state(df: DataFrame, sign: F.Column | None = None) -> DataFrame:
    """Per-group Q1 view state: det-sum hi/lo integer partials + count.
    Associative and SIGNED-capable: with ``sign`` (+1/−1 per row) each
    contribution is added or retracted — the form a change-data-feed
    consumer needs (insert/update_postimage = +1,
    delete/update_preimage = −1; see ``operators/ivm.py``). The hi/lo
    decomposition is exact for negative quantities too
    (hi·2^20 + pmod-lo ≡ q for any sign), so retraction is exact."""
    from kafka_flink_harshevents_spark.queries._util import (
        _hilo_total,
        _quantize,
    )

    rev = _revenue()
    charge = rev * (1 + F.col("l_tax"))
    s = F.lit(1) if sign is None else sign

    def q(c: F.Column) -> F.Column:
        return _quantize(c, 6) * s

    return df.groupBy(*Q1_KEYS).agg(
        _hilo_total(q(F.col("l_quantity"))).alias("t_qty"),
        _hilo_total(q(F.col("l_extendedprice"))).alias("t_price"),
        _hilo_total(q(rev)).alias("t_disc"),
        _hilo_total(q(charge)).alias("t_charge"),
        _hilo_total(q(F.col("l_discount"))).alias("t_dcnt"),
        F.sum(s).alias("n"),
    )


def q1_merge_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """base ⊕ delta: |groups|-sized full-outer join + integer adds —
    exact because every total is an associative integer partial."""
    return (
        a.alias("b")
        .join(b.alias("d"), list(Q1_KEYS), "full_outer")
        .select(
            *Q1_KEYS,
            *[
                (
                    F.coalesce(F.col(f"b.{t}"), F.lit(0))
                    + F.coalesce(F.col(f"d.{t}"), F.lit(0))
                ).alias(t)
                for t in Q1_TOTALS
            ],
        )
    )


def q1_finalize(state: DataFrame) -> DataFrame:
    """The det_sum/det_avg finalize tail over stored partials — emits
    the public Q1 summary schema. Groups whose count retracted to zero
    (every contributing row deleted) drop out, matching a recompute."""
    fin = lambda t, dp: F.round(  # noqa: E731 — det_sum's finalize tail
        F.col(t).cast("double") / F.lit(1e6), dp
    )
    fina = lambda t, dp: F.round(  # noqa: E731 — det_avg's finalize tail
        F.col(t).cast("double") / F.lit(1e6) / F.col("n"), dp
    )
    return state.filter(F.col("n") != 0).select(
        *Q1_KEYS,
        fin("t_qty", 2).alias("sum_qty"),
        fin("t_price", 2).alias("sum_base_price"),
        fin("t_disc", 2).alias("sum_disc_price"),
        fin("t_charge", 2).alias("sum_charge"),
        fina("t_qty", 4).alias("avg_qty"),
        fina("t_price", 4).alias("avg_price"),
        fina("t_dcnt", 4).alias("avg_disc"),
        F.col("n").cast("long").alias("count_order"),
    )


def q1_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (IVM) — refresh the Q1
    pricing-summary view with a delta batch WITHOUT recomputing the
    base: the view's stored state is the det-sum PARTIALS (hi/lo
    quantized integer totals + counts), which are associative, so
    base ⊕ delta = full recompute EXACTLY — not approximately. That
    associativity is the same property that makes the det_* convention
    partitioning-independent; here it buys exact view maintenance: the
    oracle for this entry IS the plain full-table Q1 SQL.

    A deterministic md5 hash-split carves ~IVM_DELTA_PCT% of lineitem
    into the "newly arrived" batch (the `doc_incremental_dedup`
    convention). Base and delta each produce per-group partial states
    (one aggregate each — at a real deployment the base state is a
    stored table, so only the delta aggregate runs per refresh); the
    merge is a |groups|-sized full-outer join + integer adds; the
    finalize step is the identical round/divide tail `det_sum`/
    `det_avg` apply.

    Scale shape: the per-refresh cost is the DELTA scan plus a
    groups-sized merge — the whole point of IVM at 100 TB; no window,
    no recompute of the base scan in steady state.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    unit = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("l_orderkey"), F.col("l_linenumber")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(100),
    )
    base = li.filter(unit >= IVM_DELTA_PCT)
    delta = li.filter(unit < IVM_DELTA_PCT)
    merged = q1_merge_states(q1_partial_state(base), q1_partial_state(delta))
    return q1_finalize(merged)


def _analyze_sql() -> str:
    parts = []
    for c, kind in ANALYZE_COLS:
        expr = f"CAST({c} AS DECIMAL(18,2))" if kind == "num" else c
        parts.append(f"""
            SELECT '{c}' AS column_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT {c}) AS BIGINT) AS ndv,
                   CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   CAST(min({expr}) AS STRING) AS min_repr,
                   CAST(max({expr}) AS STRING) AS max_repr
            FROM lineitem""")
    return " UNION ALL ".join(parts)


QUERIES = {
    "q_analyze_table": q_analyze_table,
    "q1_incremental_refresh": q1_incremental_refresh,
    "q_histogram_equiheight": q_histogram_equiheight,
    "q_customer_ltv": q_customer_ltv,
    "q_yearly_growth": q_yearly_growth,
    "q1_pricing_summary": q1_pricing_summary,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q_distinct_agg": q_distinct_agg,
    "q_set_ops": q_set_ops,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q4_order_priority": q4_order_priority,
    "q_top_orders_per_customer": q_top_orders_per_customer,
    "q_window_suite": q_window_suite,
    "q_customers_without_orders": q_customers_without_orders,
    "q_asof_latest_order": q_asof_latest_order,
    "q_revenue_rollup": q_revenue_rollup,
    "q_grouping_sets": q_grouping_sets,
}

ORACLES = {
    "q_analyze_table": _analyze_sql(),
    "q_grouping_sets": f"""
        SELECT o_orderpriority,
               o_orderstatus,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               count(*) AS n_orders,
               {det_sum_sql("o_totalprice", 2)} AS total_revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderstatus), ())
    """,
    "q_yearly_growth": """
        WITH y AS (
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2
        )
        SELECT nation, o_year,
               round(rev_cents / 100.0, 2) AS revenue,
               CASE WHEN lag(rev_cents) OVER w IS NOT NULL
                    THEN round((rev_cents - lag(rev_cents) OVER w) * 1.0
                               / lag(rev_cents) OVER w, 4)
               END AS yoy_growth
        FROM y
        WINDOW w AS (PARTITION BY nation ORDER BY o_year)
    """,
    "q_customer_ltv": """
        WITH c AS (
            SELECT o_custkey,
                   count(*) AS n_orders,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
                   min(o_orderdate) AS f,
                   max(o_orderdate) AS l
            FROM orders GROUP BY 1
        ),
        r AS (
            SELECT *,
                   CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS rn,
                   count(*) OVER () AS n
            FROM c
        )
        SELECT o_custkey, n_orders,
               round(cents / 100.0, 2) AS total_spend,
               CAST(date_diff('day', f, l) AS BIGINT) AS active_days,
               CAST(floor(10.0 * (rn - 1) / n) AS BIGINT) AS spend_decile
        FROM r
    """,
    "q17_small_quantity_revenue": f"""
        WITH half AS (
            SELECT l_partkey AS ak, avg(l_quantity) * 0.5 AS half_avg
            FROM lineitem GROUP BY l_partkey
        )
        SELECT round(CAST({det_total_sql("l_extendedprice", 6)} AS DOUBLE)
                     / 1000000.0 / 7.0, 2) AS avg_yearly,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN half ON l_partkey = ak
        WHERE p_brand = 'Brand#1' AND l_quantity < half_avg
    """,
    "q_distinct_agg": """
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
    "q_set_ops": """
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        EXCEPT ALL
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {det_sum_sql("l_quantity", 2)}                                        AS sum_qty,
               {det_sum_sql("l_extendedprice", 2)}                                   AS sum_base_price,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)}                AS sum_disc_price,
               {det_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 2)}  AS sum_charge,
               {det_avg_sql("l_quantity", 4)}                                        AS avg_qty,
               {det_avg_sql("l_extendedprice", 4)}                                   AS avg_price,
               {det_avg_sql("l_discount", 4)}                                        AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-06-30'
          AND l_shipdate  > TIMESTAMP '1997-06-30'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5_local_supplier_volume": f"""
        SELECT n_name,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    "q_window_suite": """
        SELECT o_orderkey, o_custkey,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               nth_value(o_orderkey, 3) OVER wf AS third_key,
               last_value(o_orderkey) OVER wf AS last_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey),
               wf AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
    """,
    "q_top_orders_per_customer": """
        SELECT c_custkey, c_name, o_orderkey, o_totalprice, rn
        FROM (
            SELECT c_custkey, c_name, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY c_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS BIGINT) AS rn
            FROM customer JOIN orders ON o_custkey = c_custkey
        )
        WHERE rn <= 3
    """,
    "q_customers_without_orders": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 400000
        )
    """,
    "q_asof_latest_order": """
        WITH o AS (
            SELECT o_custkey AS user_id, epoch_ms(o_orderdate) AS odate_ms,
                   o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey, o_orderdate
                       ORDER BY o_orderkey DESC
                   ) AS rd
            FROM orders
        ), od AS (SELECT * FROM o WHERE rd = 1),
        e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events)
        SELECT e.event_id, e.user_id, e.ts_ms, od.o_orderkey, od.o_totalprice
        FROM e ASOF LEFT JOIN od
          ON e.user_id = od.user_id AND od.odate_ms <= e.ts_ms
    """,
    "q_revenue_rollup": f"""
        SELECT coalesce(r_name, 'ALL') AS region_name,
               coalesce(n_name, 'ALL') AS nation_name,
               {det_sum_sql("o_totalprice", 2)} AS total_revenue,
               count(*) AS n_orders
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
}


# IVM correctness property: refresh output == full recompute.
ORACLES["q1_incremental_refresh"] = ORACLES["q1_pricing_summary"]

ORACLES["q_histogram_equiheight"] = f"""
    WITH r AS (
        SELECT l_extendedprice AS v,
               row_number() OVER (
                   ORDER BY l_extendedprice,
                            l_orderkey * 10 + l_linenumber) AS rn,
               count(*) OVER () AS n
        FROM lineitem
    )
    SELECT CAST(((rn - 1) * {HIST_BUCKETS}) // n AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT v) AS BIGINT) AS ndv,
           CAST(min(CAST(v AS DECIMAL(18,2))) AS STRING) AS lo_repr,
           CAST(max(CAST(v AS DECIMAL(18,2))) AS STRING) AS hi_repr
    FROM r GROUP BY 1
"""
