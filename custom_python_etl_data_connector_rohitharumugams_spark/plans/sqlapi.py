"""SQL-string entry point queries (SURVEY.md SS3.2 entry 3): the same engine
driven through ``spark.sql`` over registered views — parse -> analyze ->
optimize is identical to the DataFrame path, so these also pick up cube /
grouping-sets coverage (A4) and window-function SQL syntax."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from .registry import query


@query(
    "sql_grouping_sets_revenue",
    tags=("A4", "A1"),
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def sql_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL entry point (text -> ANTLR -> same Catalyst
    pipeline as the DataFrame API)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping_id(o_orderstatus, o_orderpriority) AS gid,
               COUNT(*) AS cnt,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


@query(
    "sql_cube_lineitem_volume",
    tags=("A4",),
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping_id(l_returnflag, l_linestatus) AS gid,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def sql_cube_lineitem_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all 4 grouping combinations) through the SQL entry point."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping_id(l_returnflag, l_linestatus) AS gid,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        """
    )


@query(
    "sql_window_distribution",
    tags=("W1",),
    oracle="""
    SELECT c_custkey, c_nationkey,
           ntile(4)       OVER w AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist()    OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def sql_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile/percent_rank/cume_dist) with a
    fully deterministic ordering (custkey tiebreak)."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey,
               ntile(4)       OVER w AS quartile,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist()    OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        """
    )


@query(
    "sql_collect_set_statuses",
    tags=("A2", "F5"),
    oracle="""
    SELECT o_custkey % 100 AS cust_bucket,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), '|')
               AS statuses,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY cust_bucket
    """,
)
def sql_collect_set_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set aggregated to a canonical string (arrays hash differently
    across engines; the sorted join-string is engine-neutral)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_custkey % 100 AS cust_bucket,
               concat_ws('|', sort_array(collect_set(o_orderstatus))) AS statuses,
               COUNT(*) AS cnt
        FROM orders
        GROUP BY cust_bucket
        """
    )


@query(
    "sql_correlated_small_quantity_revenue",
    tags=("A1", "J1"),
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def sql_correlated_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): Catalyst decorrelates
    it into an aggregate + join — no per-row re-execution."""
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    )


@query(
    "sql_pivot_status_by_priority",
    tags=("A1", "A4"),
    oracle="""
    SELECT o_orderstatus,
           COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
           COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium,
           COUNT(CASE WHEN o_orderpriority = '5-LOW'    THEN 1 END) AS low
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def sql_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native SQL PIVOT (this module's purpose is the spark.sql surface —
    the DataFrame .pivot form lives in the API family), compiled to the
    same conditional aggregation the oracle spells out. COALESCE(0): an
    empty (status, priority) cell pivots to NULL in Spark while the
    oracle's COUNT(CASE...) yields 0 — every cell is populated in the
    frozen fixtures, but a regenerated/filtered fixture must not turn
    that accident into a hash mismatch."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus,
               COALESCE(urgent, 0) AS urgent,
               COALESCE(medium, 0) AS medium,
               COALESCE(low, 0)    AS low
        FROM (SELECT o_orderstatus, o_orderpriority FROM orders)
        PIVOT (COUNT(1) FOR o_orderpriority IN
               ('1-URGENT' AS urgent, '3-MEDIUM' AS medium, '5-LOW' AS low))
        """
    )


@query(
    "sql_unpivot_customer_metrics",
    tags=("F6", "O3"),
    oracle="""
    SELECT metric, ROUND(SUM(v), 2) AS total, COUNT(*) AS cnt
    FROM (
        SELECT 'acctbal' AS metric, c_acctbal AS v FROM customer
        UNION ALL
        SELECT 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS v FROM customer
    )
    GROUP BY metric
    """,
)
def sql_unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native SQL UNPIVOT (melt): wide numeric columns to (metric, value)
    rows — the spark.sql surface, per this module's charter."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT metric, ROUND(SUM(v), 2) AS total, COUNT(*) AS cnt
        FROM (
            SELECT c_acctbal AS acctbal,
                   CAST(c_nationkey AS DOUBLE) AS nationkey
            FROM customer
        )
        UNPIVOT INCLUDE NULLS (v FOR metric IN (acctbal, nationkey))
        GROUP BY metric
        """
    )


@query(
    "sql_first_last_event_values",
    tags=("W2",),
    oracle="""
    SELECT user_id,
           ROUND(first_value(value) OVER w, 2) AS first_val,
           ROUND(last_value(value)  OVER w, 2) AS last_val,
           ROUND(nth_value(value, 2) OVER w, 2) AS second_val,
           event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def sql_first_last_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth analytic functions over a full-partition frame."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT user_id,
               ROUND(first_value(value) OVER w, 2) AS first_val,
               ROUND(last_value(value)  OVER w, 2) AS last_val,
               ROUND(nth_value(value, 2) OVER w, 2) AS second_val,
               event_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """
    )


@query(
    "sql_recursive_month_series",
    tags=("F2", "J2", "A1"),
    oracle="""
    WITH RECURSIVE months(m, hi) AS (
        SELECT date_trunc('month', MIN(o_orderdate)),
               date_trunc('month', MAX(o_orderdate))
        FROM orders
        UNION ALL
        SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
    ),
    mc AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY m
    )
    SELECT CAST(floor(epoch(months.m)) AS BIGINT) AS month_sec,
           COALESCE(mc.n_orders, 0) AS n_orders,
           CAST(COALESCE(mc.total, 0) AS DOUBLE) AS total
    FROM months LEFT JOIN mc ON months.m = mc.m
    """,
)
def sql_recursive_month_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): generate the complete
    month ladder between the first and last order date, then left-join the
    per-month order aggregate so empty months surface as explicit zeros —
    the calendar-spine gap-fill, this time via the engine's native SQL
    recursion instead of ``sequence()``/explode
    (cf. analytics_daily_order_gapfill, the array form).

    Scale note: the recursion generates ONE row per step off a 1-row
    anchor — depth = number of months, data volume trivial; the heavy side
    (the per-month aggregate) is non-recursive and partial-aggregates
    map-side. The month bound rides ALONG the recursion as a carried
    column: Spark executes each recursive step as its own micro-plan and
    re-evaluates every CTE the step references, so an earlier shape that
    cross-joined the bounds CTE re-ran the orders MIN/MAX scan once per
    month (measured 11.2 s at sf0.1 vs ~0.5 s for this form — the base
    table is now scanned exactly twice regardless of depth). The
    recursion-depth limit is raised explicitly so a wider date range
    cannot silently truncate the spine (it errors instead). The set is
    session-sticky BY NECESSITY: the returned frame is lazy, so the limit
    must still hold whenever a vanilla (driver) session executes it —
    engine sessions get the same value from session.ENGINE_CONF, keeping
    behavior order-independent there."""
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "1000")
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH RECURSIVE months(m, hi) AS (
            SELECT date_trunc('month', MIN(o_orderdate)),
                   date_trunc('month', MAX(o_orderdate))
            FROM orders
            UNION ALL
            SELECT m + INTERVAL '1' MONTH, hi FROM months WHERE m < hi
        ),
        mc AS (
            SELECT date_trunc('month', o_orderdate) AS m,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY m
        )
        SELECT CAST(unix_timestamp(months.m) AS BIGINT) AS month_sec,
               COALESCE(mc.n_orders, 0) AS n_orders,
               CAST(COALESCE(mc.total, 0) AS DOUBLE) AS total
        FROM months LEFT JOIN mc ON months.m = mc.m
        """
    )


@query(
    "sql_approx_topk_brands",
    tags=("A3", "O2"),
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part GROUP BY p_brand
    ORDER BY n_parts DESC, p_brand LIMIT 5
    """,
)
def sql_approx_topk_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch via the built-in ``approx_top_k`` aggregate
    (Spark 4.1): single-pass mergeable sketch per partition, combined on
    the reducer — the engine-native counterpart of the hand-rolled
    Misra-Gries in agg_heavy_hitters_event_types.

    INVARIANT FORM: with maxItemsTracked (10000) >= the column's distinct
    count (25 brands), the sketch degrades to exact counting — every count
    it reports is exact, so the oracle states the ground truth a priori as
    a plain GROUP BY with a deterministic (count DESC, brand ASC)
    tiebreak applied on BOTH sides. At real scale one lowers
    maxItemsTracked and accepts the epsilon — the plan shape is identical."""
    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        SELECT t.item AS p_brand, t.count AS n_parts
        FROM (
            SELECT explode(approx_top_k(p_brand, 30, 10000)) AS t FROM part
        )
        ORDER BY n_parts DESC, p_brand LIMIT 5
        """
    )


@query(
    "sql_top_revenue_supplier",
    tags=("A1", "J1", "O1", "F3"),
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5)
                    AS BIGINT) AS total_rev_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev_cents
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev_cents = (SELECT MAX(total_rev_cents) FROM rev)
    """,
)
def sql_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly per-supplier revenue, then the
    supplier(s) achieving the global maximum via a scalar subquery against
    the same aggregate — the classic view + self-referencing-max pattern.

    Scale shape: Catalyst evaluates the rev aggregate once per reference
    but both sides reduce to |suppliers| rows before the max/join; the
    scalar max is a 1-row broadcast back onto the dim-sized rev table, and
    the ship-date filter pushes down into the parquet scan. Revenue is
    quantized to INTEGER CENTS via floor(x*100 + 0.5) in BOTH engines
    before the max/equality — plain ROUND(sum, 2) diverges on half-cent
    boundaries (Spark rounds the shortest decimal repr, DuckDB the binary
    value; see analytics_abc_pareto_parts), and a one-cent disagreement
    here would flip max-tie membership."""
    register_views(spark, sf_dir, ("lineitem", "supplier"))
    return spark.sql(
        """
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100
                              + 0.5) AS BIGINT) AS total_rev_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_rev_cents
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_rev_cents = (SELECT MAX(total_rev_cents) FROM rev)
        """
    )


@query(
    "sql_waiting_suppliers",
    tags=("J4", "J1", "A1", "F2", "O2"),
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def sql_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to the fixture's columns: 'late' =
    shipped more than 60 days after the order date): suppliers who were
    the SOLE late shipper on a finished multi-supplier order — one
    correlated EXISTS plus one correlated NOT EXISTS whose predicate
    references the OUTER query's order date.

    Scale shape: the decorrelation stress test — Catalyst rewrites both
    correlated subqueries into semi/anti joins on l_orderkey (no per-row
    re-execution), all three lineitem references hash on the same
    l_orderkey key so AQE shares the exchange layout, and the final
    top-10 is a TakeOrderedAndProject. The NOT EXISTS carrying an outer
    column (o_orderdate) in its predicate is exactly the rewrite
    single-pass engines get wrong — the oracle pins the semantics."""
    register_views(spark, sf_dir, ("lineitem", "orders", "supplier"))
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o_orderdate + INTERVAL '60' DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
        """
    )
