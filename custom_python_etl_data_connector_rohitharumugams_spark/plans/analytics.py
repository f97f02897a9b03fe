"""Composite analytics queries in classic decision-support shapes (TPC-H
style, adapted to the fixture schema): multi-join + aggregate + top-k
pipelines that exercise the operator families together the way real
workloads do. All joins follow the DESIGN.md broadcast/star discipline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, ts_lit
from ..operators.skew import (
    BROADCAST_KEY_CEILING,
    SALT_CAP,
    SALT_SKEW_FACTOR,
    salted_join,
)
from .registry import query

_TS = ts_lit  # shared engine-standard timestamp literal (catalog.ts_lit)


@query(
    "analytics_unshipped_revenue_top10",
    tags=("J1", "J3", "A1", "O2", "W4"),
    oracle="""
    SELECT o_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS orderdate_sec
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def analytics_unshipped_revenue_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority shape (TPC-H Q3): segment filter pushed to the
    customer scan, broadcast to orders, revenue top-10 without global sort."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < _TS("1998-03-15"))
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > _TS("1998-03-15"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            # NTZ -> LTZ -> epoch (NTZ has no direct bigint cast; session TZ
            # is pinned UTC so the conversion is the identity)
            F.col("o_orderdate").cast("timestamp").cast("long").alias("orderdate_sec"),
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "analytics_nation_trade_volume",
    tags=("J1", "J3", "A1", "F2"),
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS volume
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2') AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def analytics_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume (TPC-H Q7 shape): fact joined to two
    differently-filtered copies of the nation dim."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin("NATION_1", "NATION_2"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("volume"))
    )


@query(
    "analytics_region_market_share",
    tags=("J3", "A5", "F2"),
    oracle="""
    SELECT order_year,
           ROUND(SUM(CASE WHEN supp_region = 'ASIA' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS asia_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               r_name AS supp_region,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        JOIN orders   ON l_orderkey = o_orderkey
    )
    GROUP BY order_year
    """,
)
def analytics_region_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share shape (TPC-H Q8): conditional share of one supplier
    region per order year."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("r_name") == "ASIA", vol).otherwise(0.0)) / F.sum(vol), 6
            ).alias("asia_share")
        )
    )


@query(
    "analytics_returned_item_losses",
    tags=("J1", "J3", "A1", "O2"),
    oracle="""
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
)
def analytics_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-items shape (TPC-H Q10): revenue at risk per customer,
    top 20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "analytics_promo_revenue_share",
    tags=("J3", "A5", "F2"),
    oracle="""
    SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ship_month,
           ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY ship_month
    """,
)
def analytics_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect shape (TPC-H Q14): promo revenue percentage per
    ship month (broadcast part dim)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("int").alias("ship_month")
        )
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "analytics_daily_order_gapfill",
    tags=("F5", "F2", "J2", "F4"),
    oracle="""
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           COALESCE(oc.cnt, 0) AS order_cnt
    FROM (SELECT CAST(unnest(generate_series(DATE '1996-01-01',
                                             DATE '1996-03-31',
                                             INTERVAL 1 DAY)) AS DATE) AS day) d
    LEFT JOIN (
        SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS cnt
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY day
    ) oc ON d.day = oc.day
    """,
)
def analytics_daily_order_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a generated calendar (sequence + explode)
    left-joined to daily order counts, missing days filled with zero — the
    standard densification step before any rolling/seasonal analysis."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _TS("1996-01-01")) & (F.col("o_orderdate") < _TS("1996-04-01"))
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    calendar = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    return (
        calendar.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("order_cnt"),
        )
    )


@query(
    "window_rolling_30d_spend",
    tags=("W3", "F2"),
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY day_no
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_no
        FROM orders
    )
    """,
)
def window_rolling_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: rolling 30-day spend per customer — the frame is
    value-based (days), not row-based, so same-day orders share a frame."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "day_no",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")),
    )
    w = Window.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-30, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@query(
    "skew_salted_join_enrichment",
    tags=("J1", "A1"),
    oracle="""
    SELECT label, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS total_value
    FROM (SELECT user_id % 3 AS hot_key, value FROM events) e
    JOIN (VALUES (0, 'low'), (1, 'mid'), (2, 'high')) AS dim(hot_key, label)
      ON e.hot_key = dim.hot_key
    GROUP BY label
    """,
)
def skew_salted_join_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join on a pathologically hot key (3 distinct values across the
    whole fact side): each left row is deterministically salted, the dim is
    replicated per salt, so the hot key spreads over `salt` reducers. The
    oracle is the plain unsalted join — salting must be result-invariant."""
    e = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 3).alias("hot_key"), "value"
    )
    dim = spark.createDataFrame(
        [(0, "low"), (1, "mid"), (2, "high")], "hot_key bigint, label string"
    ).hint("shuffle_hash")  # keep it off the broadcast path so salting matters
    return (
        salted_join(e, dim, on="hot_key", salt=8)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@query(
    "skew_salted_aggregation",
    tags=("A1",),
    oracle="""
    SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS total
    FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over 3 hot group keys; exact because
    l_quantity is integer-valued (double addition stays associative below
    2^53), so the re-grouped sum is bit-identical to the direct one."""
    from ..operators.skew import salted_agg_sum

    l = load_table(spark, sf_dir, "lineitem")
    return salted_agg_sum(l, key="l_returnflag", value="l_quantity", salt=16, out="__sum").select(
        "l_returnflag", F.round("__sum", 2).alias("total")
    )


@query(
    "skew_profile_routed_join",
    tags=("J1", "J3", "A1"),
    oracle="""
    WITH per_key AS (
        SELECT o_custkey, COUNT(*) AS m FROM orders GROUP BY o_custkey
    ),
    stats AS (
        SELECT CAST(SUM(m) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(m) AS BIGINT) AS max_mult,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS dim_rows
        FROM per_key
    ),
    dec AS (
        SELECT dim_rows,
               CASE WHEN dim_rows <= {BKC} THEN 'broadcast_dim'
                    WHEN max_mult * n_keys > {SSF} * n_rows THEN 'salt'
                    ELSE 'hash_ok' END AS route,
               CAST(CASE WHEN dim_rows <= {BKC}
                           OR max_mult * n_keys <= {SSF} * n_rows THEN 0
                         ELSE LEAST({CAP}, GREATEST(2,
                             (max_mult * 32 + n_rows - 1) // n_rows))
                    END AS BIGINT) AS salt
        FROM stats
    )
    SELECT dec.route, dec.salt, dec.dim_rows,
           j.c_mktsegment, j.cnt, j.total_price
    FROM dec CROSS JOIN (
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    ) j
    """.format(
        BKC=BROADCAST_KEY_CEILING, SSF=SALT_SKEW_FACTOR, CAP=SALT_CAP
    ),
)
def skew_profile_routed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew playbook's DETECT -> MITIGATE wiring, end to end
    (operators/skew.route_join): profile the fact side's join-key
    distribution (per-key counts reduced to three scalars — the same
    statistics dq_join_skew_profile reports) AND the dimension's
    MEASURED row count (the broadcast decision sees the frame it would
    ship — a fact with few distinct keys must not broadcast a dim that
    carries millions of unreferenced rows), feed both through the SHARED
    choose_route decision (imported constants, so profiler advice and
    runtime routing cannot drift), and execute the plan the profile asks
    for — broadcast for a small dim, a salted join with the COMPUTED
    factor for a pathological key, plain hash otherwise. The decision
    itself is emitted as data (route, salt, dim_rows), and the oracle
    recomputes both the decision CASE and the join aggregates from
    scratch — so a wrong route, a mis-computed salt factor, OR any
    result deviation of the routed plan from the plain join breaks the
    hash. Which branch fires is scale-dependent by design (customer is
    <=1000 rows at sf0.001 -> broadcast; bigger and uniform -> hash_ok);
    the salt branch's win is measured on the planted power-law key in
    BENCH_SKEW.md's "routed" row and its byte-identity is pytest-pinned."""
    from ..operators.skew import route_join

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined, dec = route_join(o, c, on="o_custkey", parallelism=32)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.lit(dec["route"]).alias("route"),
            F.lit(dec["salt"]).cast("bigint").alias("salt"),
            F.lit(dec["dim_rows"]).cast("bigint").alias("dim_rows"),
            "c_mktsegment",
            "cnt",
            "total_price",
        )
    )


@query(
    "analytics_large_volume_customers",
    tags=("J1", "A1", "J4"),
    oracle="""
    SELECT c_custkey, o_orderkey,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c_custkey, o_orderkey
    """,
)
def analytics_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): IN over a HAVING-filtered
    aggregate subquery => left-semi join against the pre-aggregated keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        l.join(big.withColumnRenamed("l_orderkey", "__big_key"),
               F.col("l_orderkey") == F.col("__big_key"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@query(
    "analytics_idle_supplier_parts",
    tags=("J4", "A2"),
    oracle="""
    SELECT p_brand, p_type, COUNT(DISTINCT s_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_suppkey NOT IN (
        SELECT s2.s_suppkey FROM supplier s2 WHERE s2.s_acctbal < 0
    )
    GROUP BY p_brand, p_type
    """,
)
def analytics_idle_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-part distribution excluding a NOT-IN subquery set (TPC-H Q16
    shape), compiled as a PLAIN left_anti join on the excluded suppliers —
    correct here because s_suppkey is non-null by the pinned schema. This
    is NOT SQL's null-aware NOT IN (a NULL in the excluded set would empty
    the SQL result while left_anti keeps non-matching rows); if the key
    ever became nullable the oracle and this plan would both need the
    null-aware form."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.where(F.col("s_acctbal") < 0).select(F.col("s_suppkey").alias("__bad"))
    good = s.join(bad, s.s_suppkey == F.col("__bad"), "left_anti")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(good), l.l_suppkey == good.s_suppkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("s_suppkey").alias("supplier_cnt"))
    )


@query(
    "analytics_rich_inactive_customers",
    tags=("J4", "A1", "A6"),
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS cust_cnt, ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_mktsegment
    """,
)
def analytics_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average balances with no recent orders (TPC-H Q22 shape):
    uncorrelated scalar subquery threshold + anti join on recent activity."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _TS("2000-01-01")
    )
    # scalar threshold as a broadcast 1-row crossJoin: stays lazy (no
    # driver-side collect at plan-build time), same plan Spark SQL produces
    # for an uncorrelated scalar subquery
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("__avg"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .drop("__avg")
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cust_cnt"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "analytics_brand_quantity_bands",
    tags=("J3", "P2", "A1"),
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS line_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30)
    """,
)
def analytics_brand_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive predicate join (TPC-H Q19 shape): OR-of-conjunctions
    across both sides — Catalyst extracts the common join key and keeps the
    residual disjunction as a post-join filter."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (p.p_brand == "Brand#1") & p.p_size.between(1, 15) & (l.l_quantity >= 10)
    ) | (
        (p.p_brand == "Brand#3") & p.p_size.between(10, 30) & (l.l_quantity >= 20)
    ) | (
        (p.p_brand == "Brand#5") & p.p_size.between(20, 50) & (l.l_quantity >= 30)
    )
    return (
        l.join(F.broadcast(p), (l.l_partkey == p.p_partkey) & cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


@query(
    "analytics_conversion_funnel",
    tags=("A1", "A5", "W2"),
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT v.user_id % 10 AS cohort,
           COUNT(*)            AS n_viewed,
           COUNT(c.user_id)    AS n_clicked,
           COUNT(p.user_id)    AS n_converted
    FROM v
    LEFT JOIN c USING (user_id)
    LEFT JOIN p USING (user_id)
    GROUP BY cohort
    """,
)
def analytics_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel: first view -> first LATER click ->
    first later-still purchase, per user, rolled up into 10 cohorts. Three
    filtered min-aggregates chained by semi-equi joins on user_id — every
    stage shuffles on the SAME key, so at cluster scale the exchanges
    reuse one partitioning (and co-bucketing events by user_id makes the
    whole funnel shuffle-free; see operators/bucketing.py)."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_viewed"),
            F.count("t_click").alias("n_clicked"),
            F.count("t_purchase").alias("n_converted"),
        )
    )


@query(
    "scd2_user_event_intervals",
    tags=("W2", "F2", "A1"),
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, event_type, ts,
               CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
        SELECT user_id, event_type, ts,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS version
        FROM ordered
    ),
    iv AS (
        SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
               MIN(ts) AS vf, COUNT(*) AS n_events
        FROM islands GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, event_type,
           CAST(floor(epoch(vf)) AS BIGINT) AS valid_from_sec,
           CAST(floor(epoch(LEAD(vf) OVER (PARTITION BY user_id ORDER BY version)))
                AS BIGINT) AS valid_to_sec,
           n_events
    FROM iv
    """,
)
def scd2_user_event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build (gaps-and-islands): collapse each user's
    consecutive same-type events into validity intervals
    [valid_from, valid_to), open-ended (NULL) for the current state — the
    standard change-history table a warehouse maintains per dimension key.

    Scale shape: two stacked windows and one aggregate, ALL partitioned by
    user_id — one shuffle total (the island window, the group-by, and the
    lead window reuse the same hash partitioning, and AQE plans them into
    one exchange). No self-join: the naive SCD2 build joins each row to its
    successor, doubling the shuffle; lag/lead does it within the partition."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = F.lag("event_type").over(w)
    # null-safe inequality (NOT eqNullSafe == IS DISTINCT FROM): a NULL
    # event_type adjacent to a non-null one must open a new island exactly
    # as the oracle's IS DISTINCT FROM does; plain != returns NULL there
    # and the when() would silently emit 0
    flagged = e.withColumn(
        "__chg",
        F.when(~lagged.eqNullSafe(F.col("event_type")), 1).otherwise(0),
    )
    islands = flagged.withColumn("version", F.sum("__chg").over(w))
    iv = islands.groupBy("user_id", "version", "event_type").agg(
        F.min("ts").alias("vf"), F.count(F.lit(1)).alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    return iv.select(
        "user_id",
        "version",
        "event_type",
        F.unix_timestamp("vf").alias("valid_from_sec"),
        F.lead(F.unix_timestamp("vf")).over(w2).alias("valid_to_sec"),
        "n_events",
    )


@query(
    "cdc_log_compaction_orders",
    tags=("W4", "O5", "O3"),
    oracle="""
    WITH changes AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               ROUND(o_totalprice, 2) AS price, 0 AS v, 'U' AS op FROM orders
        UNION ALL
        SELECT o_orderkey, 'P', ROUND(o_totalprice, 2), 1, 'U'
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2), 2, 'D'
        FROM orders WHERE o_orderkey % 11 = 0
        UNION ALL
        SELECT -(o_orderkey + 1), 'N', ROUND(o_totalprice, 2), 1, 'U'
        FROM orders WHERE o_orderkey % 13 = 0
    ),
    latest AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) AS rn
        FROM changes
    )
    SELECT k AS o_orderkey, status AS o_orderstatus, price AS total_price
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_log_compaction_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction (the batch form of MERGE INTO): apply a
    versioned change batch — updates, deletes, inserts, here derived
    deterministically from the snapshot itself — to a snapshot by
    last-write-wins per key. This is how a lake table ingests a CDC stream
    without row-level RPCs: union the snapshot with the change log, keep
    the max-version row per key, drop tombstones.

    Scale shape: union is free (no shuffle); the only exchange is the
    per-key window, which at 100 TB is a hash partition by primary key —
    the same partitioning the compacted table is then written in, so the
    shuffle does double duty as the layout step. row_number+filter beats a
    full-outer-join MERGE when the change batch is comparable in size to
    the snapshot (joins shuffle BOTH sides too, then pay coalesce logic)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
    )
    k = F.col("o_orderkey")
    base = o.select(k, "o_orderstatus", "price", F.lit(0).alias("__v"), F.lit("U").alias("op"))
    # status-only update: price arithmetic here (e.g. *1.1) would hit the
    # cross-engine ROUND divergence on exact .xx5 doubles — a CDC update
    # that flips a status is the realistic shape anyway
    upd = o.where(k % 7 == 0).select(
        k,
        F.lit("P").alias("o_orderstatus"),
        "price",
        F.lit(1).alias("__v"),
        F.lit("U").alias("op"),
    )
    dele = o.where(k % 11 == 0).select(
        k, "o_orderstatus", "price", F.lit(2).alias("__v"), F.lit("D").alias("op")
    )
    # inserts are keyed STRICTLY NEGATIVELY (-(k+1)): a fixed positive
    # offset collides with real orderkeys at large scale factors (TPC-H
    # keys reach 6M x SF), and plain -k maps key 0 onto itself; a collision
    # with an update row would tie on __v and make the row_number winner
    # nondeterministic
    ins = o.where(k % 13 == 0).select(
        (-k - 1).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        "price",
        F.lit(1).alias("__v"),
        F.lit("U").alias("op"),
    )
    log = base.unionByName(upd).unionByName(dele).unionByName(ins)
    w = Window.partitionBy("o_orderkey").orderBy(F.col("__v").desc())
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("op") != "D"))
        .select("o_orderkey", "o_orderstatus", F.col("price").alias("total_price"))
    )


@query(
    "profile_lineitem_columns",
    tags=("A1", "A2", "O3"),
    oracle="""
    SELECT 'l_quantity' AS col_name, COUNT(*) - COUNT(l_quantity) AS n_nulls,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_val,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*) - COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice),
           CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount),
           CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*) - COUNT(l_tax), COUNT(DISTINCT l_tax),
           CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_partkey', COUNT(*) - COUNT(l_partkey), COUNT(DISTINCT l_partkey),
           CAST(MIN(l_partkey) AS DOUBLE), CAST(MAX(l_partkey) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_suppkey', COUNT(*) - COUNT(l_suppkey), COUNT(DISTINCT l_suppkey),
           CAST(MIN(l_suppkey) AS DOUBLE), CAST(MAX(l_suppkey) AS DOUBLE)
    FROM lineitem
    """,
)
def profile_lineitem_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiler (ANALYZE-style column statistics): null count, exact
    distinct count, min and max for each numeric fact column — the stats a
    cost-based optimizer and a data-quality monitor both consume.

    Scale shape: ONE scan computes every column's aggregates side by side
    (multi-aggregate, map-side partial); the per-column layout is produced
    by unpivoting the single 1-row result — against a naive per-column
    UNION ALL of scans (the oracle's readable form), that is a 6x scan
    saving, and the count_distincts share one Expand of the same pass."""
    cols = [
        "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_partkey", "l_suppkey",
    ]
    l = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_nulls"),
            F.count_distinct(c).alias(f"{c}__n_distinct"),
            F.min(c).cast("double").alias(f"{c}__min_val"),
            F.max(c).cast("double").alias(f"{c}__max_val"),
        ]
    one = l.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__n_nulls").alias("n_nulls"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min_val").alias("min_val"),
                F.col(f"{c}__max_val").alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


@query(
    "analytics_cohort_retention",
    tags=("A1", "A2", "J1", "F2"),
    oracle="""
    WITH f AS (
        SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort_month
        FROM orders GROUP BY o_custkey
    )
    SELECT CAST(floor(epoch(f.cohort_month)) AS BIGINT) AS cohort_month_sec,
           CAST(datediff('month', f.cohort_month,
                         date_trunc('month', o.o_orderdate)) AS BIGINT)
               AS months_since,
           COUNT(DISTINCT o.o_custkey) AS n_active,
           COUNT(*) AS n_orders
    FROM orders o JOIN f ON o.o_custkey = f.o_custkey
    WHERE datediff('month', f.cohort_month,
                   date_trunc('month', o.o_orderdate)) <= 6
    GROUP BY f.cohort_month, months_since
    """,
)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers grouped by the month of their
    FIRST order; for each (cohort month, months-since-acquisition <= 6)
    cell, how many of them are still ordering and how often — the classic
    product-analytics retention triangle.

    Scale shape: the first-order aggregate and the activity join both hash
    on o_custkey, so the two exchanges share one partitioning (AQE reuses
    it); the final (cohort, offset) roll-up is a small-cardinality
    re-shuffle of pre-combined partials. No window function needed — the
    min-agg + self-join form beats a per-customer window here because the
    retention cells, not the per-row first dates, are the output."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    first = o.groupBy("o_custkey").agg(F.min(month).alias("cohort_month"))
    months_since = F.months_between(month, F.col("cohort_month")).cast("long")
    return (
        o.join(first, "o_custkey")
        .withColumn("months_since", months_since)
        .where(F.col("months_since") <= 6)
        .groupBy("cohort_month", "months_since")
        .agg(
            F.count_distinct("o_custkey").alias("n_active"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.unix_timestamp("cohort_month").alias("cohort_month_sec"),
            "months_since",
            "n_active",
            "n_orders",
        )
    )


@query(
    "analytics_event_type_transitions",
    tags=("W2", "A1", "F3"),
    oracle="""
    WITH t AS (
        SELECT event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    m AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
        FROM t WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n_transitions,
           ROUND(n_transitions * 1.0 /
                 SUM(n_transitions) OVER (PARTITION BY prev_type), 6) AS p_next
    FROM m
    """,
)
def analytics_event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event stream:
    count (previous event type -> next event type) adjacencies in timestamp
    order, then normalize each row of the matrix into a conditional
    probability — the standard behavioral-model / anomaly-baseline build.

    Scale shape: ONE shuffle on user_id feeds the lag window (sequence
    adjacency stays inside the partition — no self-join on event index);
    the transition-count aggregate then reduces billions of adjacencies to
    |types|^2 rows, and the probability window runs on that tiny matrix."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    m = t.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_row = Window.partitionBy("prev_type")
    return m.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(w_row), 6
        ).alias("p_next"),
    )


@query(
    "agg_heavy_hitters_event_types",
    tags=("A1", "U3"),
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    HAVING COUNT(*) * 64 > (SELECT COUNT(*) FROM events)
    """,
)
def agg_heavy_hitters_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed heavy hitters: per-partition Misra-Gries summaries with
    C=64 counters (mergeable-summaries trim: Agarwal et al., PODS'12),
    candidate union, then an EXACT recount of candidates only. Emits every
    key whose exact frequency exceeds n/C — the MG deficit bound
    (total decrement <= n_partition/(C+1) per partition) guarantees no such
    key can be missed, so the sketch pass is a pure candidate pruner and
    the output is exactly the oracle's GROUP BY ... HAVING.

    Scale shape: this is the pattern for frequency queries over key spaces
    too large to shuffle (URLs, shingles, IPs at 100 TB): the sketch pass
    reduces each partition to <= C+1 rows with NO shuffle of the raw keys,
    the recount groups only rows matching <= C broadcast candidates (the
    full key space is never shuffled), and the total-row count rides the
    sketch pass (one sentinel row per partition) so the input is scanned
    exactly twice."""
    from ..operators.frequent import mg_partition_summary

    C = 64

    def mg_summaries(batches):
        yield from mg_partition_summary(batches, "event_type", C)

    e = load_table(spark, sf_dir, "events")
    summ = e.select("event_type").mapInPandas(
        mg_summaries, "event_type string, est bigint, is_meta boolean"
    )
    # Candidate set AND total row count folded into ONE 1-row aggregate so
    # the sketch subtree is evaluated once (two separate consumers would
    # re-run the sketch scan — Spark shares no subtrees across branches).
    # NULL candidacy travels as its own flag: collect_set drops NULLs, but
    # SQL's GROUP BY forms a NULL group that CAN pass HAVING, and the
    # recount below must include it for the oracle to match on null-heavy
    # key columns.
    sketch = summ.agg(
        F.sum(F.when(F.col("is_meta"), F.col("est"))).alias("n_total"),
        F.collect_set(
            F.when(~F.col("is_meta"), F.col("event_type"))
        ).alias("cands"),
        F.coalesce(
            F.max(
                F.when(
                    ~F.col("is_meta") & F.col("event_type").isNull(), F.lit(True)
                )
            ),
            F.lit(False),
        ).alias("null_cand"),
    )
    return (
        e.crossJoin(F.broadcast(sketch))
        .where(
            F.array_contains("cands", F.col("event_type"))
            | (F.col("null_cand") & F.col("event_type").isNull())
        )
        .groupBy("event_type", "n_total")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .where(F.col("n_events") * C > F.col("n_total"))
        .select("event_type", "n_events")
    )


@query(
    "window_ewma_daily_revenue",
    tags=("W3", "F5", "F2", "A1"),
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(FLOOR(SUM(o_totalprice) * 100 + 0.5) AS BIGINT)
                   AS rev_cents
        FROM orders GROUP BY day
    ),
    v AS (
        SELECT day, rev_cents,
               list(rev_cents / 100.0) OVER (ORDER BY day
                   ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS vals
        FROM daily
    )
    SELECT CAST(floor(epoch(day)) AS BIGINT) AS day_sec,
           ROUND(rev_cents / 100.0, 2) AS revenue,
           ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(range(1, len(vals) + 1),
                         i -> vals[i] * POWER(0.9, len(vals) - i))),
                     (a, b) -> a + b)
                 / ((1 - POWER(0.9, len(vals))) / 0.1), 2) AS ewma_30d
    FROM v
    """,
)
def window_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha decay 0.9, 30-day
    trailing frame) of daily order revenue — the standard smoothed-trend /
    anomaly-baseline series for monitoring dashboards.

    Scale shape: the distributed work is the daily roll-up (fact scan +
    grouped partial agg down to one row per day); the EWMA itself runs on
    that reduced series — at most ~36.5k rows per century — so a single
    ordered window (single-partition over the day-sized series, acceptable
    at that cardinality) with a collect_list frame + higher-order fold:
    the frame weights (0.9^k) are recomputed per row from the frame
    itself, never carried as running state.

    Parity discipline: daily totals are quantized to INTEGER CENTS via
    ``floor(x*100 + 0.5)`` in BOTH engines (o_totalprice is double, so the
    pre-quantization sum is order-sensitive and plain ROUND diverges
    between Spark and DuckDB on half-cent boundaries — same hazard as
    analytics_abc_pareto_parts) and divided by 100 only at emission; the
    oracle's weighted fold mirrors the Spark fold element-for-element
    (ordered list frame, weight 0.9^(n-i), left fold from 0) so the EWMA
    is bit-identical before the final round. The geometric normalizer
    uses the closed form (1 - 0.9^n)/0.1 rather than a second fold.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.floor(F.sum("o_totalprice") * 100 + 0.5))
        .cast("long")
        .alias("rev_cents")
    )
    w = Window.orderBy("day").rowsBetween(-29, 0)
    return (
        daily.withColumn(
            "vals", F.collect_list(F.col("rev_cents") / 100.0).over(w)
        )
        .select(
            F.unix_timestamp(F.col("day").cast("timestamp")).alias("day_sec"),
            F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
            F.round(
                F.expr(
                    """
                    aggregate(
                        zip_with(vals, sequence(size(vals) - 1, 0, -1),
                                 (v, k) -> v * power(0.9D, k)),
                        0D, (acc, x) -> acc + x)
                    / ((1 - power(0.9D, size(vals))) / 0.1D)
                    """
                ),
                2,
            ).alias("ewma_30d"),
        )
    )


@query(
    "analytics_abc_pareto_parts",
    tags=("W3", "A1", "F4", "O1"),
    oracle="""
    WITH pr AS (
        SELECT l_partkey,
               CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5)
                    AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY l_partkey
    ),
    c AS (
        SELECT l_partkey, rev_cents,
               ROUND(CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC,
                                               l_partkey
                                               ROWS UNBOUNDED PRECEDING)
                          AS DOUBLE)
                     / (SELECT SUM(rev_cents) FROM pr), 6) AS cum_share
        FROM pr
    )
    SELECT CASE WHEN cum_share <= 0.5 THEN 'A'
                WHEN cum_share <= 0.8 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_cents) AS BIGINT) AS class_revenue_cents
    FROM c GROUP BY abc_class
    """,
)
def analytics_abc_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: rank parts by revenue, take the
    running share of total revenue, and bucket parts into A (first 50% of
    revenue), B (next 30%), C (tail) — the classic inventory-analysis cut.

    Scale shape: the fact scan reduces to one row per part BEFORE any
    ordering (partial-aggregated groupBy); the cumulative window then runs
    on the dimension-sized table. A window with no partitionBy collapses
    to ONE task (WindowExec's "No Partition Defined" path), so the ordered
    cumsum is single-partition — acceptable because |parts| is a
    dimension-table cardinality (~200M rows at 100 TB would still need a
    two-pass prefix-sum; at |parts| scale the single task is the honest,
    simpler plan).

    Parity discipline: per-part revenue is quantized to INTEGER CENTS via
    ``floor(x*100 + 0.5)`` — explicit half-up on the double value itself,
    bit-deterministic in both engines. Plain ``ROUND(sum, 2)`` is NOT:
    Spark rounds the double's shortest decimal representation (BigDecimal
    HALF_UP, .775 -> .78) while DuckDB rounds the true binary value (just
    below .775 -> .77), and 4-decimal-structured money sums land exactly
    on half-cent boundaries often enough to bite (3 of ~2000 parts at
    sf0.01). Downstream the cumsum/total/class sums are exact integer
    arithmetic; the only float is the share ratio of two exact ints.
    """
    l = load_table(spark, sf_dir, "lineitem")
    pr = l.groupBy("l_partkey").agg(
        F.floor(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
            + 0.5
        )
        .cast("long")
        .alias("rev_cents")
    )
    total = pr.agg(F.sum("rev_cents").alias("__total"))
    w = (
        Window.orderBy(F.col("rev_cents").desc(), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = (
        pr.crossJoin(F.broadcast(total))
        .withColumn(
            "cum_share",
            F.round(
                F.sum("rev_cents").over(w).cast("double") / F.col("__total"),
                6,
            ),
        )
        .withColumn(
            "abc_class",
            F.when(F.col("cum_share") <= 0.5, "A")
            .when(F.col("cum_share") <= 0.8, "B")
            .otherwise("C"),
        )
    )
    return c.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev_cents").cast("bigint").alias("class_revenue_cents"),
    )


@query(
    "window_time_weighted_value",
    tags=("W2", "F2", "A1"),
    oracle="""
    WITH t AS (
        SELECT user_id, value,
               epoch(LEAD(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)) - epoch(ts)
                   AS dur
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           ROUND(SUM(dur), 6) AS total_sec,
           ROUND(SUM(value * dur) / SUM(dur), 6) AS twa_value
    FROM t WHERE dur IS NOT NULL
    GROUP BY user_id
    """,
)
def window_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (the TimescaleDB ``time_weight`` shape): each
    event's value is weighted by how long it was current — the duration
    until the user's NEXT event — then averaged per user. The plain mean
    over-counts bursts; the time-weighted mean is the honest "average
    state" of an irregularly-sampled series.

    Scale shape: ONE shuffle on user_id feeds the lead window (interval
    construction stays inside the partition — no self-join on event
    order), and the weighted aggregate folds map-side into per-user
    partials. Durations use full-precision epoch seconds: Spark's
    timestamp->double cast and DuckDB's epoch() both divide the same
    microsecond integer by 1e6, so the weights are bit-identical."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        "user_id",
        "value",
        (
            F.lead(F.col("ts").cast("double")).over(w)
            - F.col("ts").cast("double")
        ).alias("dur"),
    ).where(F.col("dur").isNotNull())
    return t.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.sum("dur"), 6).alias("total_sec"),
        F.round(F.sum(F.col("value") * F.col("dur")) / F.sum("dur"), 6).alias(
            "twa_value"
        ),
    )
