"""UDF/UDAF/UDTF surface (SURVEY.md SS2.9 U1-U4, A7).

Every Python-executed operator here is deliberately oracle-checked against a
pure-SQL formulation: the comparison proves the Arrow exchange, batch
iteration, and group partitioning deliver exactly the rows a JVM plan would.
UDFs remain the slow path (use built-ins when they exist) — these queries
exercise the *mechanism* the engine offers for logic built-ins can't cover.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from ..catalog import load_table
from .registry import query


@query(
    "udf_scalar_name_clean",
    tags=("U1",),
    oracle="""
    SELECT p_partkey, UPPER(REVERSE(p_name)) AS cleaned
    FROM part WHERE p_partkey % 10 = 0
    """,
)
def udf_scalar_name_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise Python UDF (U1) — the connector-specific-cleaning fallback.
    Arrow-batched under spark.sql.execution.pythonUDF.arrow.enabled, but
    still a per-row Python call: keep off the hot path."""

    @udf("string")
    def clean(name: str) -> str:
        return name[::-1].upper()

    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 10 == 0)
    return p.select("p_partkey", clean("p_name").alias("cleaned"))


@query(
    "udaf_weighted_avg_price",
    tags=("A7", "U2"),
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
               AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via GROUPED_AGG pandas_udf (A7): quantity-weighted
    mean price. Arrow ships each group's columns once; numpy does the math."""

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(weighted_avg("l_extendedprice", "l_quantity"), 4).alias("weighted_avg_price")
    )


@query(
    "udf_grouped_zscore",
    tags=("U3",),
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND((l_extendedprice - AVG(l_extendedprice) OVER w)
                 / stddev_samp(l_extendedprice) OVER w, 4) AS price_z
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag)
    """,
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (U3): per-group standardization. The oracle
    is the pure-window formulation — proving the pandas path partitions
    groups exactly like the JVM plan.

    Cost model (the documented grouped-map bound, measured at the 10x/30x
    tiers): applyInPandas materializes EACH GROUP as one pandas frame in
    one Python worker, so parallelism == group cardinality (3 here —
    the 30x run schedules a 3-task stage on 32 cores) and worker memory
    is O(largest group). Measured min-of-3: 5.6 s at 6 M rows -> 14.4 s
    at 18 M rows (exponent ~0.86 — linear work, zero added parallelism;
    the SCALING.md +1.13 entry's extra 0.3 was host weather). This is
    inherent to the operator the query demonstrates, not a plan defect;
    the scale path for this COMPUTATION is udf_grouped_zscore_stats_join
    below (JVM stats + broadcast + mapInPandas: batch-bounded memory,
    full-width parallelism)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["l_extendedprice"].mean()
        sd = pdf["l_extendedprice"].std(ddof=1)
        z = ((pdf["l_extendedprice"] - mu) / sd).round(4)
        # degenerate groups (one row => sd NaN; constant prices => sd 0):
        # the oracle's x / NULL (and /0) yields NULL, while pandas emits
        # NaN/inf and Arrow ships those as double NaN — a hash MISMATCH.
        # Align by nulling non-finite z (None in a float column crosses
        # Arrow as null).
        import numpy as np

        z = z.where(np.isfinite(z), None)
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "price_z": z,
            }
        )

    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").applyInPandas(
        zscore, schema="l_orderkey long, l_linenumber int, price_z double"
    )


@query(
    "udf_grouped_zscore_stats_join",
    tags=("U3", "U2", "J3"),
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND((l_extendedprice - AVG(l_extendedprice) OVER w)
                 / stddev_samp(l_extendedprice) OVER w, 4) AS price_z
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag)
    """,
)
def udf_grouped_zscore_stats_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-PATH twin of udf_grouped_zscore — same result, same
    oracle, different physical shape. Grouped-map's cost model is
    parallelism == group cardinality and memory == O(largest group); with
    3 return flags over 100 TB of lineitem that is 3 workers each handed
    ~33 TB. This form decomposes the z-score into what each stage does
    best: the per-group (mu, sd) are algebraic aggregates the JVM
    computes with map-side partials (3-row result), broadcast back onto
    the scan, and the residual per-row arithmetic runs in mapInPandas
    over ARROW BATCHES — memory bounded by the batch size regardless of
    group width, parallelism = input partitions, zero shuffles of the
    fact table (the agg shuffles 3 partial rows per task, the join is a
    broadcast). The pandas node is retained deliberately as the U3/U2
    carrier; replacing it with built-in expressions would make the whole
    plan one codegen stage but stop exercising the Arrow batch path this
    query exists to prove scale-safe."""

    def z_batches(batches):
        import numpy as np

        for pdf in batches:
            z = ((pdf["l_extendedprice"] - pdf["__mu"]) / pdf["__sd"]).round(4)
            # same null alignment as the grouped-map twin: 1-row groups
            # give sd NULL -> NaN after Arrow, constant groups sd 0 ->
            # inf; the oracle yields NULL for both
            z = z.where(np.isfinite(z), None)
            yield pd.DataFrame(
                {
                    "l_orderkey": pdf["l_orderkey"],
                    "l_linenumber": pdf["l_linenumber"],
                    "price_z": z,
                }
            )

    l = load_table(spark, sf_dir, "lineitem")
    stats = l.groupBy("l_returnflag").agg(
        F.avg("l_extendedprice").alias("__mu"),
        F.stddev_samp("l_extendedprice").alias("__sd"),
    )
    joined = l.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice").join(
        F.broadcast(stats), "l_returnflag"
    )
    return joined.mapInPandas(
        z_batches, schema="l_orderkey long, l_linenumber int, price_z double"
    )


@query(
    "udtf_tokenize_part_names",
    tags=("U4",),
    oracle="""
    SELECT p_partkey,
           CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1 AS INT) AS pos,
           unnest(string_split(p_name, ' ')) AS tok
    FROM part
    """,
)
def udtf_tokenize_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (U4): one row in, N rows out — the page->records expansion
    shape from the connector domain, oracled against unnest."""

    @udtf(returnType="p_partkey bigint, pos int, tok string")
    class Tokenize:
        def eval(self, partkey: int, name: str):
            if name is None:  # oracle parity: unnest(string_split(NULL))
                return  # emits zero rows; None.split would kill the job
            for pos, tok in enumerate(name.split(" ")):
                yield partkey, pos, tok

    spark.udtf.register("tokenize_parts", Tokenize)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("__udtf_part")
    return spark.sql(
        "SELECT t.* FROM __udtf_part, LATERAL tokenize_parts(p_partkey, p_name) t"
    )


@query(
    "udtf_fixed_width_parse",
    tags=("U4", "P5"),
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nation_key,
           n_name AS nation_name,
           CAST(n_regionkey AS BIGINT) AS region_key
    FROM nation ORDER BY nation_key
    """,
)
def udtf_fixed_width_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (U4 depth): the output schema is computed at
    ANALYSIS time by the UDTF's static ``analyze()`` from a constant layout
    argument ('name:width:type,...') — the Spark 4 dynamic-schema UDTF API,
    vs udtf_tokenize_part_names' fixed returnType. The operator is
    fixed-width record parsing (the legacy mainframe/COBOL feed shape a
    connector framework meets): nation rows are rendered into 24-char
    fixed-width lines JVM-side (lpad/rpad/concat — the encode leg stays in
    whole-stage codegen), and the UDTF slices them back into TYPED columns
    whose names and types exist nowhere but the layout constant. The
    oracle reads the source table directly, so the hash match proves the
    encode->parse roundtrip is lossless including the analyze-derived
    schema (a drifted width or type shows up as a schema/value mismatch,
    not a silent truncation).

    Scale shape: one Python-worker pass per row batch, no shuffle (the
    UDTF is a LATERAL map); a production run points the same UDTF at a
    ``spark.read.text`` scan of the fixed-width files themselves.
    """
    from pyspark.sql.functions import udtf as _udtf
    from pyspark.sql.types import LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    from ..functions.fixedwidth import parse_fixed_width, parse_spec

    @_udtf
    class SplitFixedWidth:
        @staticmethod
        def analyze(line: AnalyzeArgument, spec: AnalyzeArgument) -> AnalyzeResult:
            # type objects, not DDL strings: analyze() runs in a planner
            # worker with no active session to parse "bigint"
            types = {"bigint": LongType(), "string": StringType()}
            schema = StructType()
            for name, _width, tp in parse_spec(spec.value):
                schema = schema.add(name, types[tp])
            return AnalyzeResult(schema=schema)

        def eval(self, line: str, spec: str):
            if line is None:
                return
            # shared slicer (functions/fixedwidth) — the same definition
            # the property tests exercise, so schema and slicing cannot
            # drift apart
            yield parse_fixed_width(line, spec)

    spark.udtf.register("split_fixed_width", SplitFixedWidth)
    (
        load_table(spark, sf_dir, "nation")
        .select(
            F.concat(
                F.lpad(F.col("n_nationkey").cast("string"), 4, " "),
                F.rpad(F.col("n_name"), 16, " "),
                F.lpad(F.col("n_regionkey").cast("string"), 4, " "),
            ).alias("line")
        )
        .createOrReplaceTempView("__fixed_width_lines")
    )
    return spark.sql(
        "SELECT t.* FROM __fixed_width_lines, LATERAL split_fixed_width("
        "line, 'nation_key:4:bigint,nation_name:16:string,region_key:4:bigint') t "
        "ORDER BY nation_key"
    )
