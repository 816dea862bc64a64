import pytest

from relational_to_doc_oriented_nosql_migrator_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="rdnm-tests", shuffle_partitions=8)
    yield spark
