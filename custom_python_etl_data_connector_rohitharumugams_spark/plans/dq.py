"""Data-quality queries: Deequ-style constraint verification and
IQR-fence outlier detection.

The reference's validation story is a manual checklist ("test for invalid
responses, empty payloads ... ensure consistent insertion",
/root/reference/README.md:32-34); these queries are its engine-grade
replacement: declarative constraints evaluated in ONE fused scan, and a
statistical outlier screen over the landed facts. Both are driver-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.skew import BROADCAST_KEY_CEILING, SALT_SKEW_FACTOR
from .registry import query


@query(
    "dq_constraint_report",
    tags=("P4", "A5", "F4", "A2"),
    oracle="""
    WITH m AS (
        SELECT
            COUNT(*)                                   AS n_rows,
            COUNT(o_custkey)                           AS n_custkey,
            COUNT(DISTINCT o_orderkey)                 AS n_distinct_key,
            SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)   AS n_nonpos_price,
            SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                     THEN 1 ELSE 0 END)                AS n_bad_status,
            SUM(CASE WHEN o_orderdate <  DATE '1990-01-01'
                      OR  o_orderdate >= DATE '2030-01-01'
                     THEN 1 ELSE 0 END)                AS n_bad_date
        FROM orders
    )
    SELECT c.constraint_name, c.metric, c.passed FROM m, LATERAL (VALUES
        -- CAST AS DOUBLE before dividing: DuckDB's * 1.0 is DECIMAL
        -- arithmetic (exact decimal rounding), Spark's side divides
        -- binary doubles — the two can differ in the 6th digit on any
        -- non-exact ratio (house parity rule; passes today only because
        -- the fixture ratios are exactly 1.0)
        ('completeness_o_custkey',
         ROUND(CAST(n_custkey AS DOUBLE) / n_rows, 6), n_custkey = n_rows),
        ('uniqueness_o_orderkey',
         ROUND(CAST(n_distinct_key AS DOUBLE) / n_rows, 6), n_distinct_key = n_rows),
        ('positive_o_totalprice',
         CAST(n_nonpos_price AS DOUBLE), n_nonpos_price = 0),
        ('domain_o_orderstatus',
         CAST(n_bad_status AS DOUBLE), n_bad_status = 0),
        ('range_o_orderdate',
         CAST(n_bad_date AS DOUBLE), n_bad_date = 0)
    ) AS c(constraint_name, metric, passed)
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over the landed `orders` collection:
    completeness, key uniqueness, value positivity, domain membership, and
    date-range sanity — one row per constraint with its measured metric and
    a pass/fail verdict.

    Scale shape: ALL five constraints are fused into a single aggregate
    pass (Deequ's shared-scan trick) — one table scan, one partial->final
    HashAggregate, then a 1-row explode into the report. The only exact
    count-distinct is on the primary key; at 100 TB the same report would
    swap it for approx_count_distinct + a targeted duplicate probe, traded
    here for oracle-exact parity.
    """
    o = load_table(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.count_distinct("o_orderkey").alias("n_distinct_key"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "n_nonpos_price"
        ),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("n_bad_status"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("date"))
                | (F.col("o_orderdate") >= F.lit("2030-01-01").cast("date")),
                1,
            ).otherwise(0)
        ).alias("n_bad_date"),
    )
    report = F.array(
        F.struct(
            F.lit("completeness_o_custkey").alias("constraint_name"),
            F.round(F.col("n_custkey") / F.col("n_rows"), 6).alias("metric"),
            (F.col("n_custkey") == F.col("n_rows")).alias("passed"),
        ),
        F.struct(
            F.lit("uniqueness_o_orderkey").alias("constraint_name"),
            F.round(F.col("n_distinct_key") / F.col("n_rows"), 6).alias("metric"),
            (F.col("n_distinct_key") == F.col("n_rows")).alias("passed"),
        ),
        F.struct(
            F.lit("positive_o_totalprice").alias("constraint_name"),
            F.col("n_nonpos_price").cast("double").alias("metric"),
            (F.col("n_nonpos_price") == 0).alias("passed"),
        ),
        F.struct(
            F.lit("domain_o_orderstatus").alias("constraint_name"),
            F.col("n_bad_status").cast("double").alias("metric"),
            (F.col("n_bad_status") == 0).alias("passed"),
        ),
        F.struct(
            F.lit("range_o_orderdate").alias("constraint_name"),
            F.col("n_bad_date").cast("double").alias("metric"),
            (F.col("n_bad_date") == 0).alias("passed"),
        ),
    )
    return m.select(F.explode(report).alias("c")).select("c.*")


@query(
    "analytics_value_outliers_iqr",
    tags=("A6", "J3", "P2", "A5"),
    oracle="""
    WITH fences AS (
        SELECT event_type,
               ROUND(quantile_cont(value, 0.25)
                     - 1.5 * (quantile_cont(value, 0.75)
                              - quantile_cont(value, 0.25)), 4) AS lo_fence,
               ROUND(quantile_cont(value, 0.75)
                     + 1.5 * (quantile_cont(value, 0.75)
                              - quantile_cont(value, 0.25)), 4) AS hi_fence
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, f.lo_fence, f.hi_fence,
           CAST(SUM(CASE WHEN e.value < f.lo_fence
                          OR e.value > f.hi_fence
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(MAX(CASE WHEN e.value > f.hi_fence
                          THEN e.value END), 2) AS max_outlier
    FROM events e JOIN fences f USING (event_type)
    GROUP BY e.event_type, f.lo_fence, f.hi_fence
    """,
)
def analytics_value_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence anomaly screen: per event type, flag event values
    outside [Q1 - 1.5*IQR, Q3 + 1.5*IQR] using EXACT interpolated
    quartiles, and report the fences, outlier count, and worst high
    outlier. The `events.value` distribution is right-skewed, so the upper
    fence catches a real tail (~1% of rows) — the classic telemetry
    anomaly gate.

    Scale shape: two passes by design — a per-group quantile aggregate
    produces a |event types|-row fence table, which broadcasts back onto
    the fact scan (the second pass is a broadcast hash join + partial agg,
    no fact shuffle). At 100 TB the exact `percentile` would become
    `percentile_approx` (t-digest merge, one pass); exact is kept here
    because the oracle compares interpolated values. Fences are rounded to
    4 decimals on BOTH engines before the comparison predicate so the
    outlier count never depends on last-ulp interpolation drift.
    """
    e = load_table(spark, sf_dir, "events")
    q1 = F.percentile("value", F.lit(0.25))
    q3 = F.percentile("value", F.lit(0.75))
    fences = e.groupBy("event_type").agg(
        F.round(q1 - 1.5 * (q3 - q1), 4).alias("lo_fence"),
        F.round(q3 + 1.5 * (q3 - q1), 4).alias("hi_fence"),
    )
    is_out = (F.col("value") < F.col("lo_fence")) | (
        F.col("value") > F.col("hi_fence")
    )
    return (
        e.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "lo_fence", "hi_fence")
        .agg(
            F.sum(is_out.cast("long")).alias("n_outliers"),
            F.round(
                F.max(F.when(F.col("value") > F.col("hi_fence"), F.col("value"))),
                2,
            ).alias("max_outlier"),
        )
    )


@query(
    "dq_distribution_drift",
    tags=("A1", "F3", "J2"),
    oracle="""
    WITH binned AS (
        SELECT year(o_orderdate) AS yr,
               LEAST(9, CAST(FLOOR(o_totalprice / 50000) AS INT)) AS bin
        FROM orders
    ), counts AS (
        SELECT yr, bin, COUNT(*) AS cnt FROM binned GROUP BY yr, bin
    ), grid AS (
        SELECT y.yr, b.bin
        FROM (SELECT DISTINCT yr FROM binned) y
        CROSS JOIN (SELECT UNNEST(generate_series(0, 9)) AS bin) b
    ), filled AS (
        SELECT g.yr, g.bin, COALESCE(c.cnt, 0) AS cnt
        FROM grid g LEFT JOIN counts c ON g.yr = c.yr AND g.bin = c.bin
    ), ref AS (
        SELECT bin, cnt AS ref_cnt FROM filled WHERE yr = 1995
    ), tot AS (
        SELECT yr, SUM(cnt) AS n FROM filled GROUP BY yr
    ), m AS (
        SELECT SUM(cnt) AS m FROM filled WHERE yr = 1995
    )
    SELECT f.yr,
           CAST(t.n AS BIGINT) AS n_rows,
           CAST(SUM(ABS(f.cnt * 1000000 // t.n - r.ref_cnt * 1000000 // m.m))
                AS BIGINT) AS tv_ppm,
           SUM(ABS(f.cnt * 1000000 // t.n - r.ref_cnt * 1000000 // m.m))
               > 200000 AS drift
    FROM filled f
    JOIN ref r USING (bin)
    JOIN tot t USING (yr)
    CROSS JOIN m
    GROUP BY f.yr, t.n, m.m
    """,
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion drift monitor: per-year order-price histograms compared
    to the 1995 reference slice by TOTAL-VARIATION distance — the
    continuous-monitoring half of data quality (dq_constraint_report
    gates point-in-time validity; this catches a distribution that is
    individually valid but has silently shifted, the failure mode that
    poisons a training corpus without tripping any constraint).

    Parity discipline — drift metrics are usually transcendental (PSI/KL
    need ln, whose last ulp differs across libm builds and would break
    the driver's exact hash), so the metric is EXACT-INTEGER L1 in parts
    per million: each bin's share is the integer ``cnt * 1_000_000 div
    N`` and ``tv_ppm = sum_i |share_i - ref_share_i|`` (= 10^6 * L1 up
    to the floor, which both engines take identically); the drift flag
    is ``tv_ppm > 200_000`` (L1 > 0.2). Normalizing BEFORE the
    difference keeps every intermediate <= 10^6 * 10 bins regardless of
    corpus size — the naive cross-multiplied form ``|n_i*M - m_i*N|``
    overflows int64 near ~10^10 rows per slice, silently in non-ANSI
    Spark while DuckDB promotes to int128, which is exactly the parity
    break this query exists to rule out (the ppm form is safe to ~9e12
    rows per slice, and overflow past that is an error in BOTH engines,
    never a silent disagreement). The reference year rides along as the
    tv_ppm = 0 self-check.

    Scale shape: ONE scan of orders into a (year, bin) count aggregate
    (10 fixed price bins — bin width is part of the monitor's contract,
    so the histogram needs no data-dependent quantile pass); everything
    after operates on |years| x 10 rows — grid fill, reference join, and
    totals are broadcast-sized metadata joins. At 100 TB the fact scan
    is the whole cost and it is one pass; per-slice monitors (by source,
    by language) just add grouping columns to the same aggregate.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.least(F.lit(9), F.floor(F.col("o_totalprice") / 50000))
        .cast("int")
        .alias("bin"),
    )
    counts = o.groupBy("yr", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    years = counts.select("yr").distinct()
    bins = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    filled = (
        years.crossJoin(F.broadcast(bins))
        .join(counts, ["yr", "bin"], "left")
        .select("yr", "bin", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
    )
    ref = filled.where(F.col("yr") == 1995).select(
        "bin", F.col("cnt").alias("ref_cnt")
    )
    m = filled.where(F.col("yr") == 1995).agg(F.sum("cnt").alias("m"))
    # integer div (not /): floor(double division) could disagree with the
    # oracle's // in the last bit on huge counts; DIV is exact in both
    term = F.abs(
        F.expr("cnt * 1000000 DIV n") - F.expr("ref_cnt * 1000000 DIV m")
    )
    return (
        filled.withColumn("n", F.sum("cnt").over(Window.partitionBy("yr")))
        .join(F.broadcast(ref), "bin")
        .crossJoin(F.broadcast(m))
        .groupBy("yr")
        .agg(
            F.first("n").cast("bigint").alias("n_rows"),
            F.sum(term).cast("bigint").alias("tv_ppm"),
            (F.sum(term) > 200000).alias("drift"),
        )
    )


def _key_profile(df: DataFrame, rel: str, key: str) -> DataFrame:
    """One skew-profile row for ``df[key]``: multiplicity histogram ->
    exact integer stats. Shuffle volume is |distinct keys| (the groupBy),
    then the p99 rank walk runs over the MULTIPLICITY histogram — at most
    |distinct multiplicities| rows, the same distinct-domain trick as
    agg_histogram_quantiles."""
    mult = df.groupBy(F.col(key).alias("k")).agg(F.count(F.lit(1)).alias("m"))
    hist = mult.groupBy("m").agg(F.count(F.lit(1)).alias("keys_at_m"))
    w_cum = Window.orderBy("m")
    cum = hist.select(
        "m",
        F.sum("keys_at_m").over(w_cum).alias("cm"),
        F.sum("keys_at_m").over(Window.partitionBy()).alias("n_keys"),
        (F.col("m") * F.col("keys_at_m")).alias("rows_at_m"),
    )
    return cum.agg(
        F.lit(rel).alias("relation"),
        F.lit(key).alias("key_col"),
        F.sum("rows_at_m").cast("bigint").alias("n_rows"),
        F.min("n_keys").cast("bigint").alias("n_keys"),
        F.max("m").cast("bigint").alias("max_mult"),
        F.min(F.when(F.col("cm") * 100 >= 99 * F.col("n_keys"), F.col("m")))
        .cast("bigint")
        .alias("p99_mult"),
    ).select(
        "relation",
        "key_col",
        "n_rows",
        "n_keys",
        "max_mult",
        "p99_mult",
        F.floor(F.col("max_mult") * 1_000_000 / F.col("n_rows"))
        .cast("bigint")
        .alias("top1_share_ppm"),
        F.floor(F.col("max_mult") * F.col("n_keys") * 100 / F.col("n_rows"))
        .cast("bigint")
        .alias("skew_x100"),
        F.when(F.col("n_keys") <= BROADCAST_KEY_CEILING, F.lit("broadcast_dim"))
        .when(
            F.col("max_mult") * F.col("n_keys")
            > SALT_SKEW_FACTOR * F.col("n_rows"),
            F.lit("salt"),
        )
        .otherwise(F.lit("hash_ok"))
        .alias("recommendation"),
    )


@query(
    "dq_join_skew_profile",
    tags=("A1", "A6", "O3"),
    oracle="""
    WITH profile AS (
        SELECT 'lineitem' AS relation, 'l_orderkey' AS key_col, l_orderkey AS k
        FROM lineitem
        UNION ALL
        SELECT 'orders', 'o_custkey', o_custkey FROM orders
        UNION ALL
        SELECT 'events', 'user_id', user_id FROM events
    ),
    mult AS (
        SELECT relation, key_col, k, COUNT(*) AS m
        FROM profile GROUP BY relation, key_col, k
    ),
    hist AS (
        SELECT relation, key_col, m, COUNT(*) AS keys_at_m
        FROM mult GROUP BY relation, key_col, m
    ),
    cum AS (
        SELECT relation, key_col, m, m * keys_at_m AS rows_at_m,
               SUM(keys_at_m) OVER (PARTITION BY relation, key_col ORDER BY m) AS cm,
               SUM(keys_at_m) OVER (PARTITION BY relation, key_col) AS n_keys
        FROM hist
    ),
    stats AS (
        SELECT relation, key_col,
               CAST(SUM(rows_at_m) AS BIGINT) AS n_rows,
               CAST(MIN(n_keys) AS BIGINT) AS n_keys,
               CAST(MAX(m) AS BIGINT) AS max_mult,
               CAST(MIN(CASE WHEN cm * 100 >= 99 * n_keys THEN m END) AS BIGINT)
                   AS p99_mult
        FROM cum GROUP BY relation, key_col
    )
    SELECT relation, key_col, n_rows, n_keys, max_mult, p99_mult,
           CAST(FLOOR(max_mult * 1000000 / n_rows) AS BIGINT) AS top1_share_ppm,
           CAST(FLOOR(max_mult * n_keys * 100 / n_rows) AS BIGINT) AS skew_x100,
           CASE WHEN n_keys <= {BROADCAST_KEY_CEILING} THEN 'broadcast_dim'
                WHEN max_mult * n_keys > {SALT_SKEW_FACTOR} * n_rows THEN 'salt'
                ELSE 'hash_ok' END AS recommendation
    FROM stats
    """.format(
        BROADCAST_KEY_CEILING=BROADCAST_KEY_CEILING,
        SALT_SKEW_FACTOR=SALT_SKEW_FACTOR,
    ),
)
def dq_join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DETECT side of the skew playbook (the MITIGATE side is
    skew_salted_join_enrichment / skew_salted_aggregation): exact
    multiplicity statistics for the three join keys the workload shuffles
    on, plus a deterministic routing recommendation. Everything is
    integer arithmetic over two nested histograms — per-key counts
    (shuffle = |distinct keys|), then counts-of-counts (|distinct
    multiplicities| rows) — so profiling a 100 TB fact costs one
    partial-aggregated pass, and the p99 multiplicity comes from the same
    integer CDF walk as agg_histogram_quantiles, never a per-key sort.
    The recommendation thresholds are plan policy, stated in the output:
    a <=1000-key dimension broadcasts; max/avg multiplicity >10x flags
    salting; otherwise plain hash partitioning is fine. skew_x100 IS
    max/avg x100 (max_mult * n_keys / n_rows), the number AQE's skew-join
    heuristic approximates from runtime map statistics."""
    parts = [
        _key_profile(
            load_table(spark, sf_dir, "lineitem").select("l_orderkey"),
            "lineitem",
            "l_orderkey",
        ),
        _key_profile(
            load_table(spark, sf_dir, "orders").select("o_custkey"),
            "orders",
            "o_custkey",
        ),
        _key_profile(
            load_table(spark, sf_dir, "events").select("user_id"),
            "events",
            "user_id",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "dq_observed_pipeline_metrics",
    tags=("P2", "A1", "F3"),
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_in,
           CAST(SUM(CASE WHEN l_shipdate >= DATE '1995-01-01'
                          AND l_quantity < 25 THEN 1 ELSE 0 END) AS BIGINT)
               AS rows_out,
           CAST(SUM(CASE WHEN l_shipdate >= DATE '1995-01-01'
                          AND l_quantity < 25
                         THEN CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS revenue_cents_out,
           CAST(SUM(CASE WHEN l_shipdate >= DATE '1995-01-01'
                          AND l_quantity < 25 THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS selectivity_ppm
    FROM lineitem
    """,
)
def dq_observed_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability through Spark's Observation API
    (``df.observe``): named metrics ride INSIDE the executing plan as
    aggregate expressions — rows-in before the filter, rows-out and
    integer-cents revenue after it — so the pipeline gets its SLO counters
    for free, with ZERO extra scans, exactly the mechanism a 100 TB
    ingest uses to alert on selectivity drift without paying a second
    pass (the alternative — re-aggregating the input — doubles the scan).
    One noop-sink action materializes the stream once; the observed
    values ARE the result row, so the DuckDB oracle recomputing them from
    the raw table pins the Observation machinery end to end. The
    selectivity ratio is integer ppm arithmetic on the observed counts,
    matching the exact SQL form."""
    from pyspark.sql import Observation

    l = load_table(spark, sf_dir, "lineitem")
    obs_in = Observation()
    obs_out = Observation()
    staged = l.observe(obs_in, F.count(F.lit(1)).alias("rows_in"))
    out = staged.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_quantity") < 25)
    ).observe(
        obs_out,
        F.count(F.lit(1)).alias("rows_out"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")).alias(
            "revenue_cents_out"
        ),
    )
    out.write.mode("overwrite").format("noop").save()  # ONE pass, metrics ride it
    # SUM over zero matched rows observes as None, and an empty input
    # would zero the ppm denominator — both must degrade to a contained
    # 0-row report, not a driver-side TypeError/ZeroDivisionError.
    rows_in = int(obs_in.get["rows_in"] or 0)
    rows_out = int(obs_out.get["rows_out"] or 0)
    cents = int(obs_out.get["revenue_cents_out"] or 0)
    ppm = rows_out * 1_000_000 // rows_in if rows_in else 0
    return spark.createDataFrame(
        [(rows_in, rows_out, cents, ppm)],
        "rows_in long, rows_out long, revenue_cents_out long, selectivity_ppm long",
    )
