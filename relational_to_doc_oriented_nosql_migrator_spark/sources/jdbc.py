"""JDBC sources — the real-connector path for relational input
(SURVEY §7.2 step 7; the reference reads MySQL/Postgres over a
driver-per-row TCP loop, reference server/MySQLDBManager.js:254-282).

A naive `spark.read.jdbc(url, table)` funnels the whole table through ONE
task; at warehouse scale the read must be split. Two split strategies:

- numeric/temporal key: partitionColumn/lowerBound/upperBound/numPartitions
  (each executor issues a bounded range query)
- any key (string/uuid/skewed): explicit predicate list via MOD(hash) —
  `hash_predicates` builds per-dialect WHERE clauses so every executor
  scans a disjoint slice

No JDBC driver jars ship in this container, so the executable surface is
exercised through the pure option/predicate builders; `read_partitioned`
wires them into the standard DataFrameReader calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DIALECT_HASH = {
    # column placeholder {c}, partition count {n}, partition index {i}
    "mysql": "MOD(ABS(CRC32({c})), {n}) = {i}",
    "postgresql": "MOD(ABS(HASHTEXT({c}::text)), {n}) = {i}",
}


def quote_ident(name: str, url: str) -> str:
    """Dialect-aware identifier quoting for SQL text pushed through JDBC
    (dbtable subqueries, COUNT(*) probes). MySQL/MariaDB default
    sql_mode rejects ANSI double-quoted identifiers — `FROM "t"` parses
    as a string literal — so those dialects get backticks; everything
    else (Postgres, Derby, H2, ...) gets standard double quotes."""
    if url.startswith(("jdbc:mysql:", "jdbc:mariadb:")):
        return "`" + name.replace("`", "``") + "`"
    return '"' + name.replace('"', '""') + '"'


def range_options(
    column: str, lower: int, upper: int, num_partitions: int
) -> dict[str, str]:
    """Options for a range-partitioned JDBC read (numeric/temporal key).

    Bounds only steer the split points — rows outside [lower, upper) still
    load (Spark makes the first/last partitions unbounded), so stale bounds
    degrade balance, never correctness.
    """
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    if upper <= lower:
        raise ValueError("upper bound must exceed lower bound")
    return {
        "partitionColumn": column,
        "lowerBound": str(lower),
        "upperBound": str(upper),
        "numPartitions": str(num_partitions),
    }


def hash_predicates(
    column: str, num_partitions: int, dialect: str = "mysql"
) -> list[str]:
    """Disjoint, exhaustive WHERE clauses hashing `column` into
    num_partitions buckets (for keys with no usable numeric range)."""
    template = DIALECT_HASH.get(dialect)
    if template is None:
        raise ValueError(
            f"unknown dialect {dialect!r}; expected {sorted(DIALECT_HASH)}"
        )
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    return [
        template.format(c=column, n=num_partitions, i=i)
        for i in range(num_partitions)
    ]


def read_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    column: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 32,
    dialect: str = "mysql",
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC read: range split when bounds are given, hash
    predicates otherwise.

    Identifier contract: ``table`` and ``column`` are quoted into the
    generated SQL, which makes them CASE-SENSITIVE — pass the exact
    stored case the catalog reports (what ``sources.introspect``
    returns), not a case-folded convenience spelling. E.g. Derby stores
    unquoted DDL names uppercase, so ``NATION``, not ``nation``.
    Quoting is required because dbtable lands in ``SELECT * FROM
    <dbtable>`` and the split column in generated WHERE clauses, where
    reserved words / mixed case break unquoted."""
    props = dict(properties or {})
    # Identifiers are quoted on the way into SQL text: dbtable lands in
    # `SELECT * FROM <dbtable>` and partitionColumn in generated WHERE
    # clauses, so reserved words / mixed case break unquoted (the
    # introspection probes already quote — reads must match).
    qtable = quote_ident(table, url)
    if column is not None and lower is not None and upper is not None:
        opts = range_options(
            quote_ident(column, url), lower, upper, num_partitions
        )
        reader = spark.read.format("jdbc").option("url", url).option(
            "dbtable", qtable
        )
        for k, v in {**props, **opts}.items():
            reader = reader.option(k, v)
        return reader.load()
    if column is None:
        raise ValueError("a split column is required")
    predicates = hash_predicates(
        quote_ident(column, url), num_partitions, dialect
    )
    return spark.read.jdbc(url, qtable, predicates=predicates,
                           properties=props)
