"""JDBC split builders (pure logic; no driver jars in this container)."""

import pytest

from relational_to_doc_oriented_nosql_migrator_spark.sources.jdbc import (
    hash_predicates,
    range_options,
)


def test_range_options_shape():
    opts = range_options("o_orderkey", 1, 6_000_000, 128)
    assert opts == {
        "partitionColumn": "o_orderkey",
        "lowerBound": "1",
        "upperBound": "6000000",
        "numPartitions": "128",
    }


def test_range_options_validation():
    with pytest.raises(ValueError):
        range_options("k", 10, 10, 4)
    with pytest.raises(ValueError):
        range_options("k", 0, 10, 0)


@pytest.mark.parametrize("dialect", ["mysql", "postgresql"])
def test_hash_predicates_disjoint_exhaustive(dialect):
    preds = hash_predicates("c_name", 8, dialect)
    assert len(preds) == 8
    # One predicate per bucket index — disjoint and exhaustive by MOD.
    assert len(set(preds)) == 8
    for i, p in enumerate(preds):
        assert f"= {i}" in p
        assert "c_name" in p


def test_hash_predicates_unknown_dialect():
    with pytest.raises(ValueError, match="dialect"):
        hash_predicates("c", 4, "oracle")


def test_quote_ident_is_dialect_aware():
    from relational_to_doc_oriented_nosql_migrator_spark.sources.jdbc import quote_ident

    # MySQL/MariaDB default sql_mode parses "t" as a string literal —
    # identifiers must be backticked there, ANSI-quoted elsewhere.
    assert quote_ident("orders", "jdbc:mysql://h/db") == "`orders`"
    assert quote_ident("orders", "jdbc:mariadb://h/db") == "`orders`"
    assert quote_ident("orders", "jdbc:postgresql://h/db") == '"orders"'
    assert quote_ident("orders", "jdbc:derby:memory:db") == '"orders"'
    # embedded quote characters are doubled, not truncated
    assert quote_ident('we"ird', "jdbc:postgresql://h/db") == '"we""ird"'
    assert quote_ident("we`ird", "jdbc:mysql://h/db") == "`we``ird`"
