"""Extended relational coverage: the remaining TPC-H query shapes the
testdata schema supports. There is no ``partsupp`` table and no
commit/receipt-date, ship-mode, phone, or container columns; Q2, Q11,
Q16 and Q20 are adapted over `_partsupp_lite` (the supplier-part
relation derived from lineitem) and Q9, Q12, Q19, Q21, Q22 to the
columns that exist — each docstring notes its adaptation. With these,
all 22 TPC-H shapes are exercised.

Together with ``queries/relational.py`` this exercises every remaining
textbook shape: scan-only aggregation (Q6), multi-way join with
disjunctive nation pairing (Q7), market-share case-ratio (Q8), LIKE-driven
profit rollup (Q9), top-k after a 4-way join (Q10), outer-join histogram
(Q13), conditional-ratio aggregate (Q14), scalar-max subquery (Q15),
HAVING + IN-subquery (Q18), disjunction-of-conjunctions join (Q19),
EXISTS / NOT-EXISTS self-correlation (Q21), and anti-join + scalar-avg
subquery (Q22).

Scale notes follow the same discipline as ``relational.py``: dims are
broadcast, fact-fact joins shuffle once on their key, every aggregate is
partial+final via HashAggregate, and every top-k is a
TakeOrderedAndProject (only k rows reach the driver). No query here
collects, and none uses an unpartitioned Window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.queries._util import (
    det_sum,
    det_sum_sql,
    det_total,
    det_total_sql,
    load,
)


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + aggregate — the predicate-pushdown showcase.

    All three filters and the 2-column projection reach the parquet
    reader (``PushedFilters`` in the explain); the aggregate is a single
    partial+final pair moving one row per partition. At 100 TB this is
    I/O-bound and embarrassingly parallel — the ideal shape.
    """
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            det_sum(F.col("l_extendedprice") * F.col("l_discount"), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: supplier-nation x customer-nation volume for one nation
    pair, by ship year.

    nation is broadcast twice (25 rows); the disjunctive pair predicate
    is applied AFTER the cheap dimension joins, so the two fact joins
    (lineitem⋈orders, ⋈customer) stay plain equi-joins on their keys.
    """
    n1 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ))
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(det_sum(_revenue(), 2).alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of ECONOMY-part revenue inside ASIA,
    by order year — conditional-sum ratio over a 7-table join.

    region/nation broadcast; part is filtered to one p_type before its
    join (selective → AQE broadcasts the survivors); the ratio is
    computed from two partial sums in one aggregate pass.
    """
    r = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    n_cust = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    ))
    n_supp = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ))
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    l = load(spark, sf_dir, "lineitem")
    rev = _revenue()
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n_cust, F.col("c_nationkey") == F.col("c_nk"))
        .join(r, F.col("c_rk") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            # exact hi/lo long totals (scale cancels in the ratio): per-
            # row work stays in long codegen instead of BigDecimal sums
            F.round(
                det_total(
                    F.when(F.col("supp_nation") == "NATION_5", rev)
                    .otherwise(0.0),
                    6,
                ).cast("double")
                / det_total(rev, 6).cast("double"),
                4,
            ).alias("mkt_share"),
            det_sum(rev, 2).alias("total_revenue"),
        )
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: profit by supplier nation and order year for
    parts whose name contains 'red'. The schema has no partsupp, so
    profit is discounted revenue alone (no supplycost term) — the shape
    under test is the LIKE-filtered part join + two-key rollup.
    """
    n = F.broadcast(load(spark, sf_dir, "nation"))
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(det_sum(_revenue(), 2).alias("sum_profit"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter. 4-way join → groupBy customer → TakeOrderedAndProject.
    """
    n = F.broadcast(load(spark, sf_dir, "nation"))
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(det_sum(_revenue(), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over a LEFT OUTER join (customers
    with zero qualifying orders land in the c_count=0 bucket).

    Two aggregations: per-customer count (shuffle on custkey), then the
    tiny distribution over counts. The orders-side filter (non-urgent)
    is pushed below the join.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO-part share of one month's revenue — a
    conditional-sum ratio over the lineitem⋈part join.
    """
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    rev = _revenue()
    # both totals as exact hi/lo long sums so the ratio is combine-order
    # independent (the ev_props_variant flake class) with per-row long
    # arithmetic; ONE double division + ONE round at emit
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * det_total(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0),
                    6,
                ).cast("double")
                / det_total(rev, 6).cast("double"),
                4,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum quarterly revenue —
    scalar-max subquery decorrelated to an aggregate cross-joined back.

    The per-supplier revenue table is tiny (one row per supplier); the
    1-row max is broadcast into the equality filter. The per-supplier
    sum runs in exact DECIMAL, so both the max-equality pick and the
    emitted round are combine-order independent and engine-exact.
    """
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    rev = (
        l.groupBy(F.col("l_suppkey").alias("rk"))
        .agg(det_total(_revenue(), 6).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("rk") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(
                F.col("total_rev").cast("double") / 1e6, 2
            ).alias("total_revenue"),
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with any order whose line quantities sum past
    a threshold — HAVING on a fact aggregate, then the survivors (a tiny
    set) drive semi-ish joins back to orders/customer.

    The big-order key set is orders-of-magnitude smaller than lineitem,
    so AQE broadcasts it into both subsequent joins; the second lineitem
    pass aggregates only matching orders.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("bk"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.round(F.col("sum_qty"), 2).alias("sum_qty"),
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 adapted: disjunction-of-conjunctions over the
    lineitem⋈part equi-join (brand/size/quantity brackets stand in for
    the missing container/shipmode columns).

    The OR-of-ANDs cannot prune the join, but each disjunct's part-side
    half (brand+size) filters the broadcastable side before the join;
    the residual quantity predicate evaluates post-probe.
    """
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    bracket = (
        (
            (F.col("p_brand") == "Brand#11")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1, 15))
        )
        | (
            (F.col("p_brand") == "Brand#16")
            & (F.col("p_size").between(1, 20))
            & (F.col("l_quantity").between(10, 25))
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & (F.col("p_size").between(1, 30))
            & (F.col("l_quantity").between(20, 35))
        )
    )
    part_side = (
        (F.col("p_brand") == "Brand#11")
        | (F.col("p_brand") == "Brand#16")
        | (F.col("p_brand") == "Brand#22")
    )
    return (
        l.join(p.filter(part_side), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(
            det_sum(_revenue(), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted: suppliers who were the SOLE late shipper on a
    multi-supplier failed order. "Late" is l_shipdate > o_orderdate + 60
    days (the schema has no commit/receipt dates).

    The textbook plan (EXISTS → left-semi, NOT EXISTS → left-anti)
    re-joins lineitem against itself twice; both quantifiers are
    order-local, so they collapse into ONE per-order aggregate instead:
    EXISTS other-supplier ⇔ countDistinct(supplier) ≥ 2, NOT EXISTS
    other-late-supplier ⇔ countDistinct(late supplier) = 1 (the probe
    row is itself late, so "no other late" means the late set is
    exactly {this supplier}), and the original per-late-lineitem
    multiplicity is count(late rows), all of which belong to the sole
    late supplier. lineitem⋈orders shuffles on orderkey once and the
    per-order aggregate REUSES that partitioning — zero additional
    data-sized exchanges, ~2× over the three-join form at sf0.1. The
    oracle keeps the literal EXISTS/NOT-EXISTS SQL, so the rewrite is
    equivalence-checked on every run; the top-20 is
    TakeOrderedAndProject with a name tie-break.
    """
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # Two cascaded aggregates instead of countDistinct: both group on an
    # l_orderkey prefix, so the join's hash partitioning satisfies both
    # (no Expand, no second exchange).
    per_supp = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderstatus", "l_suppkey")
        .agg(F.sum(F.when(late, F.lit(1)).otherwise(F.lit(0))).alias("n_late"))
    )
    per_order = per_supp.groupBy("l_orderkey", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum((F.col("n_late") > 0).cast("int")).alias("n_late_supp"),
        F.max(F.when(F.col("n_late") > 0, F.col("l_suppkey"))).alias(
            "sole_supp"
        ),
        F.sum("n_late").alias("n_late_rows"),
    )
    qualifying = per_order.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("n_supp") >= 2)
        & (F.col("n_late_supp") == 1)
    )
    return (
        qualifying.join(F.broadcast(s), F.col("sole_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: well-funded customers (balance above the
    positive-balance average) in selected "country codes" who have never
    ordered. The schema has no phone column, so the country code is
    ``c_custkey % 10`` — same shape: scalar-avg subquery + anti-join.
    Every synthetic customer has SOME order, so "never ordered" is scoped
    to "no order since 2000-01-01" (lapsed customers) to keep the
    anti-join non-vacuous; the date filter lands on the orders scan.

    The 1-row average broadcasts into the filter; the anti-join shuffles
    on custkey once; the final rollup is over ≤10 groups.
    """
    codes = ["1", "3", "5", "7", "9"]
    c = load(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_custkey") % 10).cast("string")
    )
    in_codes = c.filter(F.col("cntrycode").isin(codes))
    avg_bal = in_codes.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01"))
        .select("o_custkey")
    )
    return (
        in_codes.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            det_sum("c_acctbal", 2).alias("totacctbal"),
        )
    )


def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of total order revenue, with
    a dense rank. The share/rank run over the ALREADY AGGREGATED 25-row
    nation table; rather than an unpartitioned Window (correct here but
    it emits the single-partition WindowExec warning the bench log is
    audited for), the total is a broadcast 1-row aggregate and the dense
    rank is a broadcast triangular count over the dimension-sized
    table — zero warnings, identical result."""
    n = F.broadcast(load(spark, sf_dir, "nation"))
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    # exact integer totals end to end (hi/lo long sums recombined in
    # DECIMAL): the rank comparisons, the share ratio, and the emitted
    # round are combine-order independent (double sums could mis-rank a
    # near-tie run-to-run) with per-row long arithmetic, not BigDecimal
    per_nation = (
        n.join(c, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(det_total("o_totalprice", 6).alias("rev"))
    )
    total = per_nation.agg(F.sum("rev").alias("tot"))
    higher = per_nation.select(F.col("rev").alias("rev2")).distinct()
    ranked = (
        per_nation.join(F.broadcast(higher), F.col("rev2") > F.col("rev"), "left")
        .groupBy("n_name", "rev")
        .agg((F.count("rev2") + 1).cast("long").alias("rev_rank"))
    )
    return ranked.join(F.broadcast(total)).select(
        "n_name",
        F.round(F.col("rev").cast("double") / 1e6, 2).alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.col("tot").cast("double"), 6
        ).alias("rev_share"),
        "rev_rank",
    )


def q_priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts as priority × status cross-tab. The explicit
    value list keeps the plan a single groupBy with conditional
    aggregates (no extra distinct-values job) and pins the output
    schema — same shape at any scale."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["P", "O", "F"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("P", F.lit(0)).cast("long").alias("n_p"),
            F.coalesce("O", F.lit(0)).cast("long").alias("n_o"),
            F.coalesce("F", F.lit(0)).cast("long").alias("n_f"),
        )
    )


def _partsupp_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier-part relation the schema lacks, derived: distinct
    ``(l_partkey, l_suppkey)`` from lineitem — every pair that actually
    traded. One distinct aggregation, co-partitioned with later
    part-keyed joins. Enables shape-faithful Q2/Q16/Q20 adaptations."""
    return (
        load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adaptation: partsupp := `_partsupp_lite`; the
    complaint-supplier exclusion, originally a LIKE on s_comment,
    becomes ``s_acctbal < 0`` — same NOT-IN structure). Preserved
    structure: anti-join on a subquery, three-column group,
    COUNT DISTINCT suppliers. The part filter broadcasts; the
    distinct-pair relation shuffles once on partkey; the tiny excluded
    set anti-joins broadcast-side. Output unordered — Q16's ORDER BY is
    presentation-only and a global sort would be pure waste at scale.
    """
    ps = _partsupp_lite(spark, sf_dir)
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 25)
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adaptation: ps_supplycost := the pair's minimum
    traded unit price ``min(l_extendedprice / l_quantity)``; the
    size/type filter keeps ``p_size = 15``). Preserved structure: a
    correlated MIN subquery per part, decorrelated into a per-part
    aggregate joined back on (part, cost) equality; supplier → nation →
    region join chain (EUROPE); top-100 by account balance. Double
    equality on the cost join is engine-safe: min() is order-independent
    and both sides evaluate the identical expression tree.
    """
    li = load(spark, sf_dir, "lineitem")
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        cost.join(p, cost.l_partkey == p.p_partkey)
        .join(s, cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    min_cost = eligible.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        eligible.join(
            min_cost,
            (F.col("l_partkey") == F.col("mk"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "l_partkey",
            "l_suppkey",
            # floor-scaled, not round(): the min unit price can land on a
            # .5 ULP boundary where HALF_UP (Spark) and DuckDB disagree;
            # floor of the identical double is engine-exact
            F.floor(F.col("cost") * 10000).cast("long").alias("cost_e4"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("l_partkey"), F.asc("l_suppkey"))
        .limit(100)
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adaptation: the availqty > half-of-shipped test
    becomes total 1996 shipped quantity of a ``red%`` part above a fixed
    threshold — no partsupp availqty exists). Preserved structure: the
    nested IN chain (parts by name prefix → per-(supp, part) correlated
    quantity aggregate → threshold → suppliers), executed as semi-joins;
    the part-name filter broadcasts into the lineitem scan year-slice.
    """
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adaptation: ps_supplycost*ps_availqty := the
    pair's total traded value ``sum(l_extendedprice)``; the nation
    filter keeps one supplier nation). Preserved structure: a grouped
    value aggregate filtered by a scalar subquery over the SAME
    aggregate (HAVING sum > fraction * total) — the classic
    decorrelation-into-cross-join shape.

    Determinism: the HAVING comparison is a floating-boundary hazard —
    a part sitting exactly at ``fraction * total`` flips with double
    combine order. Both sides therefore stay in exact DECIMAL end to
    end, and the predicate is the INTEGER form ``val·1000 > total``
    (scaled per row, before aggregation) — engine- and
    partitioning-exact in both dialects, with no post-aggregate decimal
    multiply that either engine would precision-cap or width-overflow.
    The double cast happens only in the final emit.

    Scale: the naive decorrelation evaluates the grouped-value subtree
    twice (once for the rows, once inside the scalar total) — a double
    fact-table scan. The per-part aggregate is tiny (one row per
    part), so it is localCheckpoint-ed once and BOTH consumers read
    the materialized rows: one lineitem scan total, then a 1-row
    broadcast for the threshold. Verified in the explain — a single
    parquet scan of lineitem.

    Reference parity anchor: the engine-general grouped-aggregate +
    scalar-subquery threshold family (SURVEY.md §2.7 note on engine
    joins; reference has no relational surface of its own).
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    # The comparison is kept in INTEGER form: val·1000 > total is the
    # same predicate as val > total·0.001, but a post-aggregate ·0.001
    # would precision-cap in Spark (HALF_UP at the 6th decimal —
    # exactly the boundary flip this entry exists to kill). `val` is
    # the exact hi/lo long total (scale-0 DECIMAL); the ·1000 runs
    # post-aggregate at pinned widths — DECIMAL(34,0)·DECIMAL(4,0) →
    # DECIMAL(38,0) in BOTH dialects, no width-overflow-to-DOUBLE.
    value = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey, "semi")
        .groupBy("l_partkey")
        .agg(det_total("l_extendedprice", 6).alias("val"))
        .localCheckpoint()
    )
    val1000 = F.col("val").cast("decimal(34,0)") * F.lit(1000).cast(
        "decimal(4,0)"
    )
    total = value.agg(F.sum("val").alias("total"))
    return (
        value.join(F.broadcast(total))
        .filter(val1000 > F.col("total"))
        .select(
            "l_partkey",
            F.round(F.col("val").cast("double") / 1e6, 2).alias("part_value"),
        )
    )


def q12_shipping_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adaptation: l_shipmode := ``l_returnflag`` with
    a two-value IN list, the late-receipt predicate := shipped more
    than 90 days after the order date — the schema has no
    ship-mode/commit/receipt columns). Preserved structure: fact-fact
    equi-join, IN-list filter, date-window filter, CASE-conditional
    counts split on high (URGENT/HIGH) vs low order priority, grouped
    by the mode stand-in.

    One shuffle (lineitem⋈orders on orderkey); both conditional counts
    come from a single partial+final aggregate pass. Counts are exact
    integers — no float hazard.
    """
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "N")
        & (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


BLOOM_M = 1 << 16  # bloom filter bits (8 KiB bitmap — broadcasts anywhere)
_BLOOM_SEEDS = (1, 2, 3, 5)  # k=4 hash functions via seeded xxhash64


def bloom_prefilter(fact: DataFrame, fact_key: str, keys: DataFrame) -> DataFrame:
    """Filter `fact` to rows whose `fact_key` MIGHT be in `keys` (one
    column) using a distributed-built Bloom filter folded into the scan
    as a constant bitmap. Guarantees: never drops a true match (no
    false negatives); passes a false-positive fraction ≈
    (1-e^(-kn/m))^k of the non-matching rows. Deterministic: seeded
    xxhash64 positions, so the same inputs prune identically on any
    cluster."""
    kcol = keys.columns[0]
    pos = keys.select(
        F.explode(
            F.array(*[
                # seed cast to bigint: xxhash64 is type-sensitive and the
                # probe side writes the seed as a long literal ({s}L)
                F.pmod(F.xxhash64(F.lit(s).cast("bigint"), F.col(kcol)), F.lit(BLOOM_M))
                for s in _BLOOM_SEEDS
            ])
        ).alias("pos")
    ).distinct()
    words = (
        pos.select(
            F.expr("pos DIV 64").alias("w"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("word"))
        .collect()
    )
    wmap = {int(r["w"]): int(r["word"]) for r in words}
    bitmap = F.array(*[F.lit(wmap.get(i, 0)) for i in range(BLOOM_M // 64)])

    might_contain = None
    for s in _BLOOM_SEEDS:
        p = f"pmod(xxhash64({s}L, {fact_key}), {BLOOM_M})"
        hit = F.expr(
            f"(element_at(_bm, CAST({p} DIV 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST({p} % 64 AS INT))) != 0"
        )
        might_contain = hit if might_contain is None else (might_contain & hit)
    return fact.withColumn("_bm", bitmap).filter(might_contain).drop("_bm")


def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning — the explicit form of the
    runtime filters engines inject when a selective dim side can prune
    a fact scan before the shuffle (Spark's
    ``spark.sql.optimizer.runtime.bloomFilter.enabled``, Trino's
    dynamic filtering). Emits exact revenue per order priority for
    BUILDING-segment customers; the bloom stage only REDUCES the fact
    rows that reach the join, never changes the answer (no false
    negatives by construction, false positives killed by the exact
    semi-join that follows).

    Build: dim keys explode to k=4 seeded-xxhash64 bit positions →
    distinct → bitwise-OR per 64-bit word (partial agg; at most
    m/64 = 1024 rows ever reach the driver, regardless of dim size).
    Probe: the 8 KiB bitmap folds into the scan as a constant array
    literal — membership is four element_at + AND ops inside
    WholeStageCodegen, no join, no broadcast exchange. This is the
    pattern for dims too big to broadcast-join raw but whose key
    signature fits anywhere: at 100 TB the fact side drops ~selectivity
    × volume before the one real shuffle.
    """
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    keys = cust.select(F.col("c_custkey").alias("k"))
    pruned = bloom_prefilter(load(spark, sf_dir, "orders"), "o_custkey", keys)
    return (
        pruned.join(keys, pruned["o_custkey"] == keys["k"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            det_sum("o_totalprice", 2).alias("revenue"),
        )
    )


def lineitem_row_checks() -> tuple[tuple[str, F.Column], ...]:
    """Row-level lineitem constraints — ONE shared definition consumed
    by the batch audit entry below AND the streaming monitor
    (streaming/audit.py), so the two surfaces cannot drift. A factory,
    not a constant: classic PySpark refuses to build Column expressions
    before a SparkContext exists, and the catalog modules import at
    process start."""
    return (
        ("lineitem_qty_range",
         (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
        ("lineitem_price_positive", F.col("l_extendedprice") <= 0),
        ("lineitem_discount_range",
         (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
    )


def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint audit (the Deequ/Great-Expectations
    verification pass every production pipeline runs before publishing
    a table): PK uniqueness, two referential-integrity checks, value
    ranges, and completeness — each emitted as
    (check_name, n_checked, n_violations, passed).

    Plan shape: the three lineitem row-level checks ride ONE scan (a
    single aggregate computing all conditional sums, unpivoted
    scan-local); each FK check is a left join + null-count aggregate
    (AQE broadcasts the smaller key side); PK uniqueness is one
    count-distinct aggregate. Nothing collects beyond the handful of
    one-row results being unioned.
    """
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")

    pk = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("n_violations"),
    ).select(F.lit("orders_pk_unique").alias("check_name"), "n_checked", "n_violations")

    def fk(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str,
           name: str) -> DataFrame:
        return (
            child.select(F.col(child_key))
            .join(
                parent.select(F.col(parent_key).alias("__pk")),
                F.col(child_key) == F.col("__pk"),
                "left",
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_checked"),
                F.sum(F.col("__pk").isNull().cast("int"))
                .cast("long")
                .alias("n_violations"),
            )
            .select(F.lit(name).alias("check_name"), "n_checked", "n_violations")
        )

    fk_li = fk(lineitem, "l_orderkey", orders, "o_orderkey", "lineitem_fk_orders")
    fk_or = fk(orders, "o_custkey", customer, "c_custkey", "orders_fk_customer")

    row_checks = lineitem_row_checks()
    one = lineitem.agg(
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        *[
            F.sum(cond.cast("int")).cast("long").alias(f"v_{i}")
            for i, (_, cond) in enumerate(row_checks)
        ],
    )
    li_rows = one.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(name).alias("check_name"),
                    F.col("n_checked"),
                    F.col(f"v_{i}").alias("n_violations"),
                )
                for i, (name, _) in enumerate(row_checks)
            ])
        ).alias("s")
    ).select("s.check_name", "s.n_checked", "s.n_violations")

    complete = customer.agg(
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.sum(F.col("c_name").isNull().cast("int")).cast("long").alias("n_violations"),
    ).select(
        F.lit("customer_name_complete").alias("check_name"), "n_checked", "n_violations"
    )

    audit = pk.unionByName(fk_li).unionByName(fk_or).unionByName(li_rows).unionByName(
        complete
    )
    return audit.withColumn(
        "passed", F.when(F.col("n_violations") == 0, 1).otherwise(0).cast("long")
    )


QUERIES = {
    "q_bloom_prune": q_bloom_prune,
    "q_constraint_audit": q_constraint_audit,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q12_shipping_priority_split": q12_shipping_priority_split,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q6_revenue_change": q6_revenue_change,
    "q_nation_revenue_share": q_nation_revenue_share,
    "q_priority_status_pivot": q_priority_status_pivot,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_type_profit": q9_product_type_profit,
    "q10_returned_items": q10_returned_items,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
}

ORACLES = {
    # The bloom stage is a pure reduction: the answer is the plain
    # dim-filtered join. (The no-false-negative and FP-rate properties
    # are pinned in tests/test_queries.py.)
    "q_bloom_prune": f"""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               {det_sum_sql("o_totalprice", 2)} AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderpriority
    """,
    "q_constraint_audit": """
        SELECT check_name, n_checked, n_violations,
               CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
                   AS passed
        FROM (
            SELECT 'orders_pk_unique' AS check_name,
                   CAST(count(*) AS BIGINT) AS n_checked,
                   CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                       AS n_violations
            FROM orders
            UNION ALL
            SELECT 'lineitem_fk_orders',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
            UNION ALL
            SELECT 'orders_fk_customer',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            UNION ALL
            SELECT 'lineitem_qty_range',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'lineitem_price_positive',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN l_extendedprice <= 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'lineitem_discount_range',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'customer_name_complete',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM customer
        )
    """,
    "q11_important_parts": f"""
        WITH value AS (
            SELECT l_partkey,
                   {det_total_sql("l_extendedprice", 6)} AS val
            FROM lineitem
            WHERE l_suppkey IN
                  (SELECT s_suppkey FROM supplier WHERE s_nationkey = 3)
            GROUP BY l_partkey
        )
        SELECT l_partkey,
               round(CAST(val AS DOUBLE) / 1000000.0, 2) AS part_value
        FROM value
        WHERE CAST(val AS DECIMAL(34,0)) * CAST(1000 AS DECIMAL(4,0))
              > (SELECT sum(val) FROM value)
    """,
    "q12_shipping_priority_split": """
        SELECT l_returnflag AS ship_class,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag IN ('A','N')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY l_returnflag
    """,
    "q16_supplier_part_counts": """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM ps JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1' AND p_size <= 25
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "q2_min_cost_supplier": """
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS cost
            FROM lineitem GROUP BY 1, 2
        ),
        eligible AS (
            SELECT c.l_partkey, c.l_suppkey, c.cost,
                   s.s_acctbal, s.s_name, n.n_name
            FROM cost c
            JOIN part p ON c.l_partkey = p.p_partkey AND p.p_size = 15
            JOIN supplier s ON c.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
        )
        SELECT round(e.s_acctbal, 2) AS s_acctbal, e.s_name, e.n_name,
               e.l_partkey, e.l_suppkey,
               CAST(floor(e.cost * 10000) AS BIGINT) AS cost_e4
        FROM eligible e
        JOIN (SELECT l_partkey AS mk, min(cost) AS min_cost
              FROM eligible GROUP BY 1) m
          ON e.l_partkey = m.mk AND e.cost = m.min_cost
        ORDER BY s_acctbal DESC, e.l_partkey ASC, e.l_suppkey ASC
        LIMIT 100
    """,
    "q20_excess_suppliers": """
        SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'red%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING sum(l_quantity) > 50
        )
    """,
    "q_nation_revenue_share": f"""
        WITH per_nation AS (
            SELECT n_name,
                   {det_total_sql("o_totalprice", 6)} AS rev
            FROM nation
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders   ON o_custkey = c_custkey
            GROUP BY n_name
        )
        SELECT n_name,
               round(CAST(rev AS DOUBLE) / 1000000.0, 2) AS revenue,
               round(CAST(rev AS DOUBLE)
                     / CAST(sum(rev) OVER () AS DOUBLE), 6) AS rev_share,
               CAST(dense_rank() OVER (ORDER BY rev DESC) AS BIGINT) AS rev_rank
        FROM per_nation
    """,
    "q_priority_status_pivot": """
        SELECT o_orderpriority,
               CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p,
               CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
               CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f
        FROM orders GROUP BY o_orderpriority
    """,
    "q6_revenue_change": f"""
        SELECT {det_sum_sql("l_extendedprice * l_discount", 2)} AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": f"""
        SELECT year(o_orderdate) AS o_year,
               round(CAST({det_total_sql(
                   "CASE WHEN ns.n_name = 'NATION_5' "
                   "THEN l_extendedprice * (1 - l_discount) "
                   "ELSE 0.0 END", 6)} AS DOUBLE)
                     / CAST({det_total_sql(
                         "l_extendedprice * (1 - l_discount)", 6
                     )} AS DOUBLE), 4) AS mkt_share,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS total_revenue
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region   ON nc.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY o_year
    """,
    "q9_product_type_profit": f"""
        SELECT n_name AS nation,
               year(o_orderdate) AS o_year,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate)
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "q14_promo_revenue": f"""
        SELECT round(100.0 * CAST({det_total_sql(
                   "CASE WHEN p_type = 'PROMO' "
                   "THEN l_extendedprice * (1 - l_discount) "
                   "ELSE 0.0 END", 6)} AS DOUBLE)
                     / CAST({det_total_sql(
                         "l_extendedprice * (1 - l_discount)", 6
                     )} AS DOUBLE), 4)
                   AS promo_revenue_pct,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey AS rk,
                   {det_total_sql("l_extendedprice * (1 - l_discount)", 6)}
                       AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               round(CAST(total_rev AS DOUBLE) / 1000000.0, 2)
                   AS total_revenue
        FROM rev JOIN supplier ON rk = s_suppkey
        WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
    "q18_large_volume_customers": """
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_totalprice,
               round(sum_qty, 2) AS sum_qty
        FROM orders
        JOIN (
            SELECT l_orderkey AS bk, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
        ) ON o_orderkey = bk
        JOIN customer ON o_custkey = c_custkey
    """,
    "q19_disjunctive_revenue": f"""
        SELECT {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#16' AND p_size BETWEEN 1 AND 20
               AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 30
               AND l_quantity BETWEEN 20 AND 35)
    """,
    "q21_waiting_supplier": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders   ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "q22_global_sales_opportunity": f"""
        WITH in_codes AS (
            SELECT *, CAST(c_custkey % 10 AS VARCHAR) AS cntrycode
            FROM customer
            WHERE CAST(c_custkey % 10 AS VARCHAR) IN ('1','3','5','7','9')
        )
        SELECT cntrycode,
               count(*) AS numcust,
               {det_sum_sql("c_acctbal", 2)} AS totacctbal
        FROM in_codes
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM in_codes WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01'
        )
        GROUP BY cntrycode
    """,
}
