"""Scalar-function family queries (SURVEY.md SS2.7, F1-F8).

One named query per family, written to stay entirely inside whole-stage
codegen (no UDFs). Cross-engine parity traps handled per family:

- math: JVM libm vs C libm can differ in the last ulp -> round transcendental
  results to 6 decimals on both sides;
- double->int casts: Spark truncates, DuckDB rounds -> always FLOOR first;
- weekday: Spark ``weekday()`` is Mon=0, DuckDB ``isodow`` is Mon=1 -> +1;
- BIGINT sums: DuckDB widens to HUGEINT -> CAST back to BIGINT in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


@query(
    "scalar_string_part_report",
    tags=("F1",),
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                                   AS name_upper,
           LENGTH(p_name)                                  AS name_len,
           SUBSTRING(p_name, 1, 4)                         AS name_prefix,
           string_split(p_name, ' ')[1]                    AS first_word,
           concat_ws('|', p_brand, p_type)                 AS brand_type,
           LPAD(p_brand, 10, '_')                          AS brand_padded,
           regexp_extract(p_brand, '([0-9]+)', 1)          AS brand_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g')     AS name_devoweled,
           (p_name LIKE '%widget%')                        AS is_widget
    FROM part
    """,
)
def scalar_string_part_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, slicing, split, concat, pad, regex, LIKE."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad("p_brand", 10, "_").alias("brand_padded"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_devoweled"),
        F.col("p_name").like("%widget%").alias("is_widget"),
    )


@query(
    "scalar_date_order_report",
    tags=("F2",),
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                          AS order_year,
           CAST(month(o_orderdate) AS INT)                         AS order_month,
           CAST(quarter(o_orderdate) AS INT)                       AS order_quarter,
           CAST(isodow(o_orderdate) AS INT)                        AS order_isodow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')  AS month_start,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INT)       AS days_since_epoch95,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY,
                    '%Y-%m-%d')                                    AS due_date,
           CAST(floor(epoch(o_orderdate)) AS BIGINT)               AS order_unix
    FROM orders
    """,
)
def scalar_date_order_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract, trunc, diff, add, epoch."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        (F.weekday("o_orderdate") + F.lit(1)).alias("order_isodow"),
        # dates emitted as ISO strings: pandas/arrow represent DATE columns
        # differently per engine (date objects vs midnight timestamps), which
        # breaks the driver's value hash even when the dates are equal.
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch95"
        ),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.unix_timestamp("o_orderdate").alias("order_unix"),
    )


@query(
    "scalar_math_lineitem_report",
    tags=("F3",),
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(sqrt(l_extendedprice), 6)        AS price_sqrt,
           ROUND(pow(l_quantity, 2.0), 4)         AS qty_sq,
           ROUND(abs(l_discount - 0.05), 4)       AS disc_dev,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT)  AS price_ceil,
           ROUND(ln(l_extendedprice), 6)          AS price_ln,
           ROUND(log10(l_extendedprice), 6)       AS price_log10,
           l_orderkey % 7                         AS okey_mod7,
           CAST(sign(l_discount - 0.05) AS INT)   AS disc_sign
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
)
def scalar_math_lineitem_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family on a modulo-sampled slice (transcendentals rounded:
    JVM vs C libm differ in the last ulp)."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 97 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.pow("l_quantity", F.lit(2.0)), 4).alias("qty_sq"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        # pmod == % here: both operands non-negative
        (F.col("l_orderkey") % 7).alias("okey_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@query(
    "scalar_conditional_customer_report",
    tags=("F4",),
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 1000 THEN 'low'
                ELSE 'healthy' END                      AS bal_class,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
           ROUND(GREATEST(c_acctbal, 0.0), 2)           AS bal_floor0,
           ROUND(LEAST(c_acctbal, 5000.0), 2)           AS bal_cap5k,
           (c_acctbal IS NOT NULL)                      AS has_bal
    FROM customer
    """,
)
def scalar_conditional_customer_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family: CASE, NULLIF/COALESCE, GREATEST/LEAST."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("healthy")
        .alias("bal_class"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("bal_floor0"),
        F.round(F.least(F.col("c_acctbal"), F.lit(5000.0)), 2).alias("bal_cap5k"),
        F.col("c_acctbal").isNotNull().alias("has_bal"),
    )


@query(
    "scalar_array_embedding_report",
    tags=("F5",),
    oracle="""
    SELECT vec_id,
           len(embedding)                                            AS dim,
           ROUND(list_reduce(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), (a, b) -> a + b), 4)       AS vec_sum,
           ROUND(sqrt(list_reduce(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 (a, b) -> a + b)), 4)                               AS vec_norm,
           len(list_filter(embedding, x -> x > 0))                   AS pos_cnt,
           ROUND(CAST(embedding[1] AS DOUBLE), 4)                    AS first_dim,
           ROUND(CAST(list_sort(embedding)[1] AS DOUBLE), 4)         AS min_dim
    FROM embeddings
    """,
)
def scalar_array_embedding_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order functions (transform/filter/aggregate)
    — the JVM-side vector-math surface used by similarity search (L3)."""
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x), 4).alias("vec_sum"),
        F.round(F.sqrt(F.aggregate(sq, F.lit(0.0), lambda a, x: a + x)), 4).alias("vec_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("pos_cnt"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_dim"),
        F.round(F.element_at(F.sort_array("embedding"), 1).cast("double"), 4).alias("min_dim"),
    )


@query(
    "scalar_map_event_totals",
    tags=("F6", "F7"),
    oracle="""
    SELECT key, CAST(SUM(v) AS BIGINT) AS total, COUNT(*) AS cnt
    FROM (
        SELECT 'k' AS key,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS v
        FROM events
        UNION ALL
        SELECT event_type AS key, CAST(FLOOR(value) AS BIGINT) AS v FROM events
    )
    GROUP BY key
    """,
)
def scalar_map_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: parse JSON props into map<string,bigint>, build a map from
    columns, explode both, aggregate per key."""
    e = load_table(spark, sf_dir, "events")
    from_props = e.select(
        F.explode(F.from_json("props", "map<string,bigint>")).alias("key", "v")
    )
    from_cols = e.select(
        F.explode(
            F.create_map(F.col("event_type"), F.floor("value").cast("bigint"))
        ).alias("key", "v")
    )
    return (
        from_props.unionByName(from_cols)
        .groupBy("key")
        .agg(F.sum("v").cast("bigint").alias("total"), F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "scalar_json_event_stats",
    tags=("F7",),
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))                 AS k_min,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))                 AS k_max,
           COUNT(*)                                                              AS cnt
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object / from_json over the props payload
    (the reference's raw-API-JSON surface, README.md:22)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("k_total"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "scalar_hash_customer_keys",
    tags=("F8",),
    oracle="""
    SELECT c_custkey,
           md5(c_name)    AS name_md5,
           sha256(c_name) AS name_sha256
    FROM customer
    """,
)
def scalar_hash_customer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: stable content hashes (the doc-sink upsert key basis,
    README.md:29). md5/sha256 are bit-identical across engines."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


@query(
    "scalar_null_handling_report",
    tags=("P4", "F4"),
    oracle="""
    SELECT bal_bucket,
           COUNT(*) AS cnt,
           ROUND(SUM(filled_bal), 2) AS total_filled
    FROM (
        SELECT CASE WHEN c_acctbal < 0 THEN NULL
                    ELSE CAST(floor(c_acctbal / 1000) AS BIGINT) END AS bal_bucket,
               COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END,
                        0.0) AS filled_bal
        FROM customer
    )
    WHERE bal_bucket IS NOT NULL
    GROUP BY bal_bucket
    """,
)
def scalar_null_handling_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameNaFunctions surface (P4): synthesize nulls from overdrawn
    balances, na.fill one column, na.drop on the other — the empty/invalid-
    payload handling idiom from the reference's validation contract."""
    c = load_table(spark, sf_dir, "customer")
    masked = c.select(
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.floor(F.col("c_acctbal") / 1000).cast("bigint"))
        .alias("bal_bucket"),
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("filled_bal"),
    )
    cleaned = masked.na.fill({"filled_bal": 0.0}).na.drop(subset=["bal_bucket"])
    return cleaned.groupBy("bal_bucket").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("filled_bal"), 2).alias("total_filled"),
    )


@query(
    "scalar_variant_event_payloads",
    tags=("F7",),
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_total,
           COUNT(*) AS cnt
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 1
    GROUP BY event_type
    """,
)
def scalar_variant_event_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path for open JSON payloads: parse_json once,
    typed variant_get extraction — the schemaless-document alternative to
    from_json when a connector's payload shape is not pinned yet."""
    e = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .where(F.col("k") % 2 == 1)
        .groupBy("event_type")
        .agg(F.sum("k").cast("bigint").alias("k_total"), F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "scalar_id_generation",
    tags=("F8",),
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT c_name) AS n_distinct_hashes,
           TRUE AS ids_unique
    FROM customer
    """,
)
def scalar_id_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 + monotonically_increasing_id surface in invariant form:
    the raw values are engine-specific, but their contracts are not —
    xxhash64 must be injective on the fixture's distinct names (distinct
    hash count equals the oracle's distinct name count) and generated row
    ids must be globally unique (distinct id count equals the row count,
    folded into the ids_unique boolean). pytest additionally asserts
    per-value stability across runs."""
    c = load_table(spark, sf_dir, "customer")
    ids = c.select(
        F.xxhash64("c_name").alias("__h"),
        F.monotonically_increasing_id().alias("__id"),
    )
    return ids.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("__h").alias("n_distinct_hashes"),
        (F.count_distinct("__id") == F.count(F.lit(1))).alias("ids_unique"),
    )
