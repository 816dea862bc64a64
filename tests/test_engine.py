"""End-to-end engine tests on the sf0.001 testdata."""

import pyspark.sql.types as T
import pytest

from relational_to_doc_oriented_nosql_migrator_spark.engine import migrate

from tests.conftest import SF0001


@pytest.fixture(scope="module")
def collections(spark):
    return migrate(spark, SF0001)


def test_root_collections(collections):
    assert set(collections) == {"region", "part", "events", "documents",
                                "embeddings", "lineitem"}


def test_multilevel_nesting_schema(collections):
    region = collections["region"]
    schema = region.schema
    assert [f.name for f in schema.fields] == ["r_regionkey", "r_name",
                                               "nation"]
    nation_type = schema["nation"].dataType
    assert isinstance(nation_type, T.ArrayType)
    nation_struct = nation_type.elementType
    names = [f.name for f in nation_struct.fields]
    assert names == ["n_nationkey", "n_name", "customer", "supplier"]
    customer_struct = nation_struct["customer"].dataType.elementType
    assert [f.name for f in customer_struct.fields] == [
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment", "orders",
    ]


def test_nested_counts_match_flat(spark, collections):
    region = collections["region"].cache()
    assert region.count() == 5
    from pyspark.sql import functions as F

    exploded = (
        region.select(F.explode("nation").alias("n"))
        .select(F.explode("n.customer").alias("c"))
        .select(F.explode(F.coalesce("c.orders", F.array())).alias("o"))
    )
    orders = spark.read.parquet(f"{SF0001}/orders.parquet")
    # Every order whose customer exists lands in exactly one nested array.
    customer = spark.read.parquet(f"{SF0001}/customer.parquet")
    expected = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).count()
    assert exploded.count() == expected


def test_referencing_collection_renames(collections):
    lineitem = collections["lineitem"]
    cols = lineitem.columns
    assert "l_orderkey_REF" in cols and "l_partkey_REF" in cols
    assert "l_orderkey" not in cols
    assert lineitem.count() == 6000


def test_date_normalization(collections):
    region = collections["region"]
    from pyspark.sql import functions as F

    row = (
        region.select(F.explode("nation").alias("n"))
        .select(F.explode("n.customer").alias("c"))
        .select(F.explode("c.orders").alias("o"))
        .select("o.o_orderdate")
        .first()
    )
    assert isinstance(row["o_orderdate"], str)
    assert len(row["o_orderdate"]) == 10  # yyyy-MM-dd


def test_schema_templates(collections):
    """Client-parity skeletons (reference NoSqlCollection.js:14-29): empty
    strings for scalars, one-element arrays for embedded collections,
    nested to full depth."""
    from relational_to_doc_oriented_nosql_migrator_spark.functions import (
        collection_templates,
    )

    templates = collection_templates(collections)
    region = templates["region"]
    assert region["r_name"] == ""
    nation = region["nation"][0]
    assert nation["n_name"] == ""
    customer = nation["customer"][0]
    assert isinstance(customer["orders"], list)
    assert customer["orders"][0]["o_orderkey"] == ""


def test_hot_workload_flips_design(spark):
    """A write-heavy query log must flip hot tables from embedding to
    referencing through the REAL pipeline (log parse -> gaf/uaf -> maf ->
    plan -> materialize), reproducing reference DBMigration.js:354-386."""
    log = "\n".join(
        f"240807 10:15:{i:02d}\t   42 Query\tUPDATE orders SET"
        f" o_orderstatus = 'F' WHERE o_orderkey = {i}"
        for i in range(10)
    ) + "\n"
    collections = migrate(spark, SF0001, log_content=log)
    # orders: uaf >> maf -> referencing root with *_REF renames.
    assert "orders" in collections
    assert "o_custkey_REF" in collections["orders"].columns
    # customer is referenced by hot orders -> also a referencing root, and
    # the region tree no longer embeds it.
    assert "customer" in collections
    assert "c_nationkey_REF" in collections["customer"].columns
    region_fields = collections["region"].schema.simpleString()
    assert "customer" not in region_fields
