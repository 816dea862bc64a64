"""Shared helpers for operator builders."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from relational_to_doc_oriented_nosql_migrator_spark.sources.parquet import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def scratch_dir(prefix: str) -> str:
    """mkdtemp whose removal is registered at process exit: round-trip
    sink/source operators materialize real files per invocation (that IS
    the operator), and the returned frames read them lazily — so cleanup
    can't happen in-operator, but an un-registered mkdtemp accumulates a
    table copy per call across a driver run. atexit bounds the leak to
    the process lifetime."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, True)
    return d


def dec_sum(col: str | Column, scale: int = 6) -> Column:
    """Deterministic double sum: route through exact decimal arithmetic so
    Spark's partial-aggregation order and the DuckDB oracle's sequential sum
    produce bit-identical doubles. (A plain double SUM is order-dependent.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18," + str(scale) + ")")).cast("double")


def dec_avg(col: str | Column, scale: int = 6) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast(f"decimal(18,{scale})")
    return (F.sum(d) / F.count(c)).cast(f"decimal(28,{scale})").cast("double")


def sql_dec_sum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_dec_avg(expr: str, scale: int = 6) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) / "
        f"COUNT({expr}) AS DECIMAL(28,{scale})) AS DOUBLE)"
    )
