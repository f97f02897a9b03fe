"""Relational core queries (SURVEY.md SS2.2-SS2.6): joins, aggregations,
windows, sorts, set ops — all built-in Catalyst operators, broadcast hints on
dimension tables, filters written to push into the parquet scan.

Reference provenance: the reference repo is spec-only (0 code); this surface
is the S-tier standard-analytics inventory of SURVEY.md SS2 exercised on the
driver fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, ts_lit
from .registry import query

# --------------------------------------------------------------------------
# M0 flagship — scan -> filter -> project -> agg -> sort (TPC-H Q1 shape)
# --------------------------------------------------------------------------


@query(
    "pricing_summary",
    tags=("S5", "P1", "P2", "A1", "O1"),
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: single scan, partial->final hash aggregate;
    the shipdate filter pushes into the parquet scan."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.where(F.col("l_shipdate") <= ts_lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Joins (J1-J8)
# --------------------------------------------------------------------------


@query(
    "join_inner_segment_revenue",
    tags=("J1", "A1"),
    oracle="""
    SELECT c_mktsegment,
           COUNT(*)                     AS order_cnt,
           ROUND(SUM(o_totalprice), 2)  AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact->dim; at scale customer is the smaller side and
    AQE picks broadcast/shuffled-hash — we hint broadcast explicitly."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "join_left_outer_order_histogram",
    tags=("J2", "A1"),
    oracle="""
    SELECT order_cnt, COUNT(*) AS num_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY order_cnt
    """,
)
def join_left_outer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (TPC-H Q13 shape)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("order_cnt"))
    )
    return per_cust.groupBy("order_cnt").agg(F.count(F.lit(1)).alias("num_customers"))


@query(
    "join_right_outer_nation_coverage",
    tags=("J2", "A1", "F4"),
    oracle="""
    SELECT n_name, COUNT(c_custkey) AS cust_cnt,
           COALESCE(ROUND(SUM(c_acctbal), 2), 0.0) AS total_bal
    FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
                                   AND c_acctbal > 9000
    GROUP BY n_name
    """,
)
def join_right_outer_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every nation preserved even with zero qualifying
    customers (the join predicate filters the left side, not a WHERE)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cond = (c.c_nationkey == n.n_nationkey) & (c.c_acctbal > 9000)
    return (
        c.join(n, cond, "right")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("cust_cnt"),
            F.coalesce(F.round(F.sum("c_acctbal"), 2), F.lit(0.0)).alias("total_bal"),
        )
    )


@query(
    "join_full_outer_nation_balance",
    tags=("J2", "A1", "F4"),
    oracle="""
    WITH ca AS (
        SELECT c_nationkey AS nationkey, ROUND(SUM(c_acctbal), 2) AS cust_bal,
               COUNT(*) AS cust_cnt
        FROM customer WHERE c_acctbal < -500 GROUP BY c_nationkey
    ), su AS (
        SELECT s_nationkey AS nationkey, ROUND(SUM(s_acctbal), 2) AS supp_bal,
               COUNT(*) AS supp_cnt
        FROM supplier WHERE s_acctbal > 500 GROUP BY s_nationkey
    )
    SELECT COALESCE(ca.nationkey, su.nationkey) AS nationkey,
           cust_bal, cust_cnt, supp_bal, supp_cnt
    FROM ca FULL OUTER JOIN su ON ca.nationkey = su.nationkey
    """,
)
def join_full_outer_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two sparse aggregates (null-filling both sides)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    ca = (
        c.where(F.col("c_acctbal") < -500)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_bal"), F.count(F.lit(1)).alias("cust_cnt"))
    )
    su = (
        s.where(F.col("s_acctbal") > 500)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp_bal"), F.count(F.lit(1)).alias("supp_cnt"))
    )
    return ca.join(su, "nationkey", "full").select(
        "nationkey", "cust_bal", "cust_cnt", "supp_bal", "supp_cnt"
    )


@query(
    "join_broadcast_region_revenue",
    tags=("J3", "J1", "A1"),
    oracle="""
    SELECT r_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS line_cnt
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY r_name
    """,
)
def join_broadcast_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with broadcast dims (TPC-H Q5 shape): lineitem never
    shuffles for the dim joins — only the fact->orders equi-join and the
    final aggregate shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1997-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


@query(
    "join_semi_urgent_customers",
    tags=("J4", "A1"),
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS cust_cnt
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def join_semi_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: existence test without duplicating rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
    )


@query(
    "join_anti_customers_without_orders",
    tags=("J4", "A1"),
    oracle="""
    SELECT c_nationkey, COUNT(*) AS cust_cnt
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no urgent orders (the unfiltered
    variant is empty on this fixture — every customer has some order)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
    )


@query(
    "join_range_price_bands",
    tags=("J5", "A1"),
    oracle="""
    SELECT band, COUNT(*) AS order_cnt, ROUND(SUM(o_totalprice), 2) AS band_total
    FROM orders
    JOIN (VALUES ('small', 0.0, 50000.0),
                 ('medium', 50000.0, 150000.0),
                 ('large', 150000.0, 300000.0),
                 ('jumbo', 300000.0, 1000000000.0)) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join against a tiny broadcast band table — the scale
    path for non-equi joins is always broadcast-nested-loop with a small side."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("small", 0.0, 50_000.0),
            ("medium", 50_000.0, 150_000.0),
            ("large", 150_000.0, 300_000.0),
            ("jumbo", 300_000.0, 1_000_000_000.0),
        ],
        "band string, lo double, hi double",
    )
    return (
        o.join(F.broadcast(bands), (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("band_total"),
        )
    )


@query(
    "join_interval_ship_window",
    tags=("J6", "A1", "F2"),
    oracle="""
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS order_month,
           COUNT(*) AS line_cnt,
           ROUND(SUM(l_extendedprice), 2) AS month_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL 90 DAY
    GROUP BY order_month
    """,
)
def join_interval_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: equi key + time-range predicate => sort-merge join with
    a residual range filter (no cartesian blow-up)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        l.join(o, cond)
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int").alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            F.round(F.sum("l_extendedprice"), 2).alias("month_price"),
        )
    )


@query(
    "join_cross_region_segment",
    tags=("J8", "A1"),
    oracle="""
    SELECT r_name, seg.c_mktsegment AS mktsegment
    FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
    """,
)
def join_cross_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny deduplicated sides (the only safe cartesian)."""
    r = load_table(spark, sf_dir, "region")
    seg = load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    return r.crossJoin(seg).select("r_name", F.col("c_mktsegment").alias("mktsegment"))


# --------------------------------------------------------------------------
# Aggregations (A1-A7)
# --------------------------------------------------------------------------


@query(
    "agg_distinct_customers_per_status",
    tags=("A2",),
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS uniq_customers,
           COUNT(*) AS order_cnt
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) — Catalyst expands to a two-phase aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("uniq_customers"),
        F.count(F.lit(1)).alias("order_cnt"),
    )


@query(
    "agg_rollup_pricing",
    tags=("A4",),
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup (multi-granularity aggregate via Expand)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty", "cnt")


@query(
    "agg_conditional_revenue",
    tags=("A5", "F4"),
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_discount > 0.05
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
               AS high_disc_revenue,
           ROUND(SUM(CASE WHEN l_discount <= 0.05
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
               AS low_disc_revenue,
           COUNT(CASE WHEN l_quantity >= 25 THEN 1 END) AS bulk_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_conditional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (sum-case pattern)."""
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag").agg(
        F.round(F.sum(F.when(F.col("l_discount") > 0.05, rev).otherwise(0.0)), 2).alias(
            "high_disc_revenue"
        ),
        F.round(F.sum(F.when(F.col("l_discount") <= 0.05, rev).otherwise(0.0)), 2).alias(
            "low_disc_revenue"
        ),
        F.count(F.when(F.col("l_quantity") >= 25, F.lit(1))).alias("bulk_lines"),
    )


@query(
    "agg_stats_percentiles",
    tags=("A6",),
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 2)  AS median_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 2)  AS p90_price,
           ROUND(stddev_samp(l_extendedprice), 2)         AS sd_price,
           ROUND(corr(l_quantity, l_extendedprice), 6)    AS qty_price_corr,
           ROUND(MIN(l_extendedprice), 2)                 AS min_price,
           ROUND(MAX(l_extendedprice), 2)                 AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles + dispersion stats (at 100 TB swap percentile ->
    approx_percentile; exact kept here for oracle parity)."""
    l = load_table(spark, sf_dir, "lineitem")
    # both quantiles from ONE percentile buffer (one sort per group, not two)
    pcs = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        l.groupBy("l_returnflag")
        .agg(
            pcs.alias("__pcs"),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("__pcs", 1), 2).alias("median_price"),
            F.round(F.element_at("__pcs", 2), 2).alias("p90_price"),
            "sd_price",
            "qty_price_corr",
            "min_price",
            "max_price",
        )
    )


@query(
    "agg_approx_percentiles",
    tags=("A6",),
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS median_exact,
           ROUND(quantile_cont(l_extendedprice, 0.9), 2) AS p90_exact,
           TRUE AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 scale path — approx_percentile (mergeable sketch, bounded memory)
    — in invariant form: the sketch is engine-specific, so the emitted row
    is the exact percentile (oracle-pinned via quantile_cont) plus a
    boolean asserting the approximation lands within 5% of it. At 100 TB
    only the sketch runs (one pass, no per-group sort buffer); the exact
    side here is the verification harness. tests/test_llm_ops.py
    additionally bounds the error at the declared accuracy."""
    l = load_table(spark, sf_dir, "lineitem")
    apx = F.approx_percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
    )
    ext = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        l.groupBy("l_returnflag")
        .agg(apx.alias("__a"), ext.alias("__e"))
        .select(
            "l_returnflag",
            F.round(F.element_at("__e", 1), 2).alias("median_exact"),
            F.round(F.element_at("__e", 2), 2).alias("p90_exact"),
            (
                (
                    F.abs(F.element_at("__a", 1) - F.element_at("__e", 1))
                    <= F.element_at("__e", 1) * 0.05
                )
                & (
                    F.abs(F.element_at("__a", 2) - F.element_at("__e", 2))
                    <= F.element_at("__e", 2) * 0.05
                )
            ).alias("approx_ok"),
        )
    )


@query(
    "agg_histogram_quantiles",
    tags=("A6", "A1", "W3"),
    oracle="""
    WITH cents AS (
        SELECT l_returnflag AS flag,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        FROM lineitem
    ),
    hist AS (
        SELECT flag, v, COUNT(*) AS c FROM cents GROUP BY flag, v
    ),
    cum AS (
        SELECT flag, v,
               SUM(c) OVER (PARTITION BY flag ORDER BY v) AS cm,
               SUM(c) OVER (PARTITION BY flag) AS n
        FROM hist
    )
    SELECT flag AS l_returnflag,
           CAST(MIN(n) AS BIGINT) AS n_rows,
           MIN(CASE WHEN cm * 2 >= n THEN v END)        AS median_cents,
           MIN(CASE WHEN cm * 10 >= 9 * n THEN v END)   AS p90_cents,
           MIN(CASE WHEN cm * 100 >= 99 * n THEN v END) AS p99_cents
    FROM cum
    GROUP BY flag
    """,
)
def agg_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable quantiles for bounded integer domains — the third
    mergeable summary next to HLL (cardinality) and Count-Min (frequency):
    a value-histogram is perfectly mergeable state (cell addition, the
    same linearity as CMS), and for integer-cent prices the histogram's
    CDF walk returns the EXACT discrete percentile, not an approximation.
    The plan is the scale shape: one partial-aggregating groupBy builds
    per-(group, value) counts — shuffle volume tracks DISTINCT VALUES,
    never rows — and the cumulative window then runs over the histogram
    (|distinct| rows), not the fact table. At 100 TB this is how exact
    p50/p90/p99 SLO reporting works when the domain is bounded (latencies
    in ms, prices in cents); t-digest (`agg_approx_percentiles`) remains
    the path for unbounded/continuous domains. All rank arithmetic is
    integer (cm·k >= q·k·n), so the discrete-quantile definition — the
    smallest value whose CDF reaches q — crosses the oracle boundary with
    no float rank ambiguity."""
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("v"),
    )
    hist = l.groupBy("flag", "v").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.partitionBy("flag").orderBy("v")
    w_all = Window.partitionBy("flag")
    cum = hist.select(
        "flag",
        "v",
        F.sum("c").over(w_cum).alias("cm"),
        F.sum("c").over(w_all).alias("n"),
    )
    return cum.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.min("n").cast("bigint").alias("n_rows"),
        F.min(F.when(F.col("cm") * 2 >= F.col("n"), F.col("v"))).alias(
            "median_cents"
        ),
        F.min(F.when(F.col("cm") * 10 >= 9 * F.col("n"), F.col("v"))).alias(
            "p90_cents"
        ),
        F.min(F.when(F.col("cm") * 100 >= 99 * F.col("n"), F.col("v"))).alias(
            "p99_cents"
        ),
    )


@query(
    "agg_approx_distinct_parts",
    tags=("A3",),
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(*) AS cnt,
           TRUE AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HLL++) — the 100 TB cardinality path —
    in invariant form: the HLL sketch is engine-specific, so the
    driver-checkable output is the exact distinct count (oracle-pinned)
    plus a per-group boolean asserting the estimate lands within 3x the
    declared rsd (|approx - exact| <= 0.06 * exact, i.e. diff*50 <= 3*exact
    in engine-exact integer arithmetic). At 100 TB only the sketch runs;
    the exact count here is the verification harness, not the plan.

    The exact side runs as distinct -> count, NOT count_distinct inside the
    sketch aggregate: mixing distinct and non-distinct aggregates makes
    Spark plan an Expand (row-tripling) before the shuffle, measured ~3x
    slower than two lean hash aggregates joined on the 3-row result."""
    l = load_table(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_partkey", 0.02)
    base = l.groupBy("l_returnflag").agg(
        approx.alias("__approx"), F.count(F.lit(1)).alias("cnt")
    )
    ex = (
        l.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    return base.join(ex, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        "cnt",
        (
            (F.abs(F.col("__approx") - F.col("exact_parts")) * 50)
            <= F.col("exact_parts") * 3
        ).alias("approx_ok"),
    )


# --------------------------------------------------------------------------
# Windows (W1-W4)
# --------------------------------------------------------------------------


@query(
    "window_rank_customers_by_balance",
    tags=("W1",),
    oracle="""
    SELECT * FROM (
        SELECT c_nationkey, c_custkey,
               ROUND(c_acctbal, -2) AS bal_bucket,
               RANK()       OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY ROUND(c_acctbal, -2) DESC)
    ) WHERE rnk <= 3
    """,
)
def window_rank_customers_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions with genuine ties (bucketed balance), rank<=k
    keeps all tied rows so the output set is deterministic."""
    c = load_table(spark, sf_dir, "customer")
    bucket = F.round(F.col("c_acctbal"), -2)
    w = Window.partitionBy("c_nationkey").orderBy(bucket.desc())
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            bucket.alias("bal_bucket"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rnk") <= 3)
    )


@query(
    "window_event_gaps",
    tags=("W2", "F2"),
    oracle="""
    SELECT event_type,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           COUNT(*) AS gap_cnt
    FROM (
        SELECT event_type,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def window_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() sequencing per user: inter-event gap, exact integer microseconds
    (no float drift between engines)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.sum("gap_us").cast("bigint").alias("total_gap_us"),
        F.count(F.lit(1)).alias("gap_cnt"),
    )


@query(
    "window_running_revenue",
    tags=("W3",),
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed running aggregate per customer (deterministic frame order)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "window_topk_orders_per_segment",
    tags=("W4", "O2"),
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 5
    """,
)
def window_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number (the distributed top-k reducer; at
    scale Spark runs a partial window per partition before the shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
    )


# --------------------------------------------------------------------------
# Sorts / limits / set ops (O1-O5)
# --------------------------------------------------------------------------


@query(
    "sort_top100_lineitems",
    tags=("O1", "O2"),
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_top100_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject (per-
    partition heap + single merge; never a full global sort)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "setop_union_priority_extremes",
    tags=("O3", "A1"),
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
    FROM (
        SELECT o_orderpriority, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderpriority, o_orderstatus FROM orders WHERE o_orderpriority = '5-LOW'
    )
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def setop_union_priority_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two filtered scans then aggregate."""
    o = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT")
    low = o.where(F.col("o_orderpriority") == "5-LOW")
    return (
        urgent.unionByName(low)
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "setop_intersect_repeat_customers",
    tags=("O4",),
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def setop_intersect_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers ordering in both 1995 and 1996."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(
        (F.col("o_orderdate") >= ts_lit("1995-01-01"))
        & (F.col("o_orderdate") < ts_lit("1996-01-01"))
    ).select("o_custkey")
    y96 = o.where(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1997-01-01"))
    ).select("o_custkey")
    return y95.intersect(y96)


@query(
    "setop_except_lapsed_customers",
    tags=("O4",),
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def setop_except_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers who ordered in 1995 but not in 1996."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(
        (F.col("o_orderdate") >= ts_lit("1995-01-01"))
        & (F.col("o_orderdate") < ts_lit("1996-01-01"))
    ).select("o_custkey")
    y96 = o.where(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1997-01-01"))
    ).select("o_custkey")
    # subtract == EXCEPT DISTINCT (SQL set semantics); exceptAll would keep
    # per-occurrence multiplicity and diverge from the oracle.
    return y95.subtract(y96)


@query(
    "dedup_exact_status_pairs",
    tags=("O5",),
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def dedup_exact_status_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via dropDuplicates (aggregate-based, map-side partials)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").dropDuplicates()


@query(
    "join_null_safe_event_buckets",
    tags=("J1", "F4", "A1"),
    oracle="""
    SELECT lab,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents_total
    FROM (SELECT NULLIF(user_id % 5, 0) AS k, value FROM events) e
    JOIN (
        VALUES (CAST(NULL AS BIGINT), 'zeroish'),
               (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')
    ) AS dim(k, lab)
      ON e.k IS NOT DISTINCT FROM dim.k
    GROUP BY lab
    """,
)
def join_null_safe_event_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equi-join (``<=>`` / IS NOT DISTINCT FROM): the join
    variant every dimension-conforming pipeline eventually needs — an
    unknown/NULL bucket key must match the dimension's NULL row instead
    of silently dropping a fifth of the fact table (what a plain inner
    join does with NULL keys). Spark's ``eqNullSafe`` plans this as a
    regular hash join on a null-safe key (knownfloatingpointnormalized
    coalesce under the hood) — NOT a nested loop — so it broadcasts and
    scales exactly like J1; the oracle's IS NOT DISTINCT FROM is the
    ANSI spelling of the same predicate. The NULLIF derivation plants
    NULLs on both sides (the fixture has none), making the NULL-matches
    -NULL row a fifth of the output mass — dropping it breaks rows AND
    hash."""
    e = load_table(spark, sf_dir, "events").select(
        F.nullif(F.col("user_id") % 5, F.lit(0)).alias("k"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    dim = spark.createDataFrame(
        [(None, "zeroish"), (1, "a"), (2, "b"), (3, "c"), (4, "d")],
        "k bigint, lab string",
    )
    return (
        e.join(F.broadcast(dim), e["k"].eqNullSafe(dim["k"]))
        .groupBy("lab")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum("cents").cast("bigint").alias("cents_total"),
        )
    )
