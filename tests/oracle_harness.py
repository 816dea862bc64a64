"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables, then
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import json
import math

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(value):
    """Canonicalize a cell for order-insensitive multiset comparison."""
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # exact representation: floats must match bit-for-bit
        return repr(value)
    if hasattr(value, "asDict"):  # pyspark Row (subclasses tuple!)
        return _canon(value.asDict(recursive=True))
    if isinstance(value, (list, tuple)):
        return tuple(_canon(v) for v in value)
    if isinstance(value, dict):
        return tuple(sorted((k, _canon(v)) for k, v in value.items()))
    if isinstance(value, bytes):
        return value.hex()
    return str(value)


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        json.dumps([_canon(r[i]) for i in order], default=str) for r in rows
    )


def compare(spark_df, con, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    problems = []
    # The external driver's canonicalizer (pandas sort_values) dies on
    # list/struct cells — fail locally before the driver does.
    complex_cols = [
        f.name for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if complex_cols:
        problems.append(
            "complex-typed output columns (driver-canonicalizer-unsafe): "
            + ", ".join(complex_cols)
        )
        return problems
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems

    # Numeric-kind drift check: the external driver compares Spark
    # toPandas() against DuckDB .df(); a DuckDB HUGEINT/DECIMAL aggregate
    # surfacing as float64 against a Spark integer column (or vice versa)
    # breaks its hash even when every value matches. Cast the oracle
    # (e.g. CAST(SUM(..) AS BIGINT)) when this fires.
    from pyspark.sql.types import (
        ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType,
    )

    def _spark_kind(dt):
        if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
            return "i"
        if isinstance(dt, (FloatType, DoubleType)):
            return "f"
        return None

    d_pdf = con.execute(sql).df()
    for f_ in spark_df.schema.fields:
        sk = _spark_kind(f_.dataType)
        if sk is None or f_.name not in d_pdf.columns:
            continue
        dk = d_pdf[f_.name].dtype.kind
        if sk == "i" and dk == "f" and not d_pdf[f_.name].isna().any():
            problems.append(
                f"dtype drift: {f_.name} spark int vs duckdb float"
            )
        elif sk == "f" and dk in "iu":
            problems.append(
                f"dtype drift: {f_.name} spark float vs duckdb int"
            )
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")
    s_set = _rows_to_multiset(
        [[row[c] for c in s_cols] for row in s_rows], s_cols
    )
    d_set = _rows_to_multiset(d_rows, d_cols)
    if s_set != d_set:
        diff_s = [r for r in s_set if r not in set(d_set)][:3]
        diff_d = [r for r in d_set if r not in set(s_set)][:3]
        problems.append(
            f"values differ; spark-only={diff_s} duck-only={diff_d}"
        )
    return problems
