"""Normalization helpers for document-store compatibility (SURVEY.md P3-P5;
reference: "clean or reformat the data for MongoDB compatibility",
/root/reference/README.md:23): field-name sanitization (no dots, no leading
``$``), recursive through nested structs/arrays, plus typed coercion
helpers. Pure plan rewrites — a single ``select`` with aliases/casts."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def sanitize_name(name: str) -> str:
    """Doc-store-safe field name: dots -> underscores, leading $ stripped."""
    clean = name.replace(".", "_")
    if clean.startswith("$"):
        clean = "_" + clean.lstrip("$")
    return clean


def _rebuild(col: Column, dtype: DataType) -> Column:
    if isinstance(dtype, StructType):
        rebuilt = F.struct(
            *[
                _rebuild(col.getField(f.name), f.dataType).alias(sanitize_name(f.name))
                for f in dtype.fields
            ]
        )
        # guard: F.struct over a NULL struct would materialize a non-null
        # struct of all-null fields, silently un-nulling nested objects
        return F.when(col.isNotNull(), rebuilt)
    if isinstance(dtype, ArrayType) and isinstance(
        dtype.elementType, (StructType, ArrayType, MapType)
    ):
        return F.transform(col, lambda x: _rebuild(x, dtype.elementType))
    if isinstance(dtype, MapType) and isinstance(
        dtype.valueType, (StructType, ArrayType, MapType)
    ):
        # structs hiding inside map VALUES (from_json with a map schema)
        # must be sanitized too — the silent `return col` passthrough used
        # to ship dotted/$-prefixed nested names straight to the doc store.
        # Map KEYS are data, not field names: left untouched.
        return F.transform_values(col, lambda _, v: _rebuild(v, dtype.valueType))
    return col


def _check_collisions(names: list[str]) -> None:
    """Distinct source names mapping to one sanitized name ('a.b' vs 'a_b',
    '$x' vs '_x') would silently clobber a field in the doc-store write and
    make every later by-name reference AMBIGUOUS — fail loudly instead."""
    seen: dict[str, str] = {}
    for n in names:
        s = sanitize_name(n)
        if s in seen and seen[s] != n:
            raise ValueError(
                f"field-name sanitization collision: {seen[s]!r} and {n!r} "
                f"both sanitize to {s!r} — rename one upstream"
            )
        seen[s] = n


def sanitize_field_names(df: DataFrame) -> DataFrame:
    """Rename every field (recursively) to its sanitized form; raises on
    names that would collide after sanitization."""

    def check_nested(dtype: DataType) -> None:
        if isinstance(dtype, StructType):
            _check_collisions([f.name for f in dtype.fields])
            for f in dtype.fields:
                check_nested(f.dataType)
        elif isinstance(dtype, ArrayType):
            check_nested(dtype.elementType)
        elif isinstance(dtype, MapType):
            check_nested(dtype.valueType)

    check_nested(df.schema)
    return df.select(
        *[
            _rebuild(F.col(f"`{f.name}`"), f.dataType).alias(sanitize_name(f.name))
            for f in df.schema.fields
        ]
    )


def coerce_timestamps(df: DataFrame, cols: dict[str, str]) -> DataFrame:
    """ISO-8601 string columns -> TimestampType (``cols``: name -> format,
    empty format = default ISO parsing). try_to_timestamp: bad values become
    NULL instead of failing the job (ANSI-safe ingestion)."""
    out = df
    for name, fmt in cols.items():
        expr = (
            F.try_to_timestamp(F.col(name), F.lit(fmt))
            if fmt
            else F.try_to_timestamp(F.col(name))
        )
        out = out.withColumn(name, expr)
    return out


def drop_empty_payloads(df: DataFrame, required: list[str]) -> DataFrame:
    """Route out rows whose required fields are all null/empty (the spec's
    empty-payload validation, README.md:32-33)."""
    cond = None
    for c in required:
        this = F.col(c).isNotNull() & (F.col(c).cast("string") != "")
        cond = this if cond is None else (cond | this)
    return df.where(cond) if cond is not None else df
