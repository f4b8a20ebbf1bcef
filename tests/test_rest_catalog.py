"""REST catalog: real HTTP round-trips between client and in-process server."""

from __future__ import annotations

import tempfile

import pytest

from iceberg_matrix_spark.tables.catalog import (
    NoSuchTableError,
    TableAlreadyExistsError,
)
from iceberg_matrix_spark.session import local_df
from iceberg_matrix_spark.tables.rest_catalog import RestCatalog, RestCatalogServer


@pytest.fixture
def rest(spark):
    with RestCatalogServer(spark, tempfile.mkdtemp(prefix="rest-wh-")) as srv:
        yield RestCatalog(spark, srv.uri)


def test_config_and_namespace_crud(rest):
    assert "warehouse" in rest.config["overrides"]
    rest.create_namespace("db", {"owner": "rest-tests"})
    assert rest.list_namespaces() == ["db"]
    assert rest.namespace_properties("db") == {"owner": "rest-tests"}
    rest.drop_namespace("db")
    assert rest.list_namespaces() == []


def test_table_lifecycle_over_http(spark, rest):
    rest.create_namespace("db")
    t = rest.create_table("db.t", "id bigint, v string")
    t.append(local_df(spark, [(1, "a"), (2, "b")], "id bigint, v string"))
    assert rest.list_tables("db") == ["t"]
    # load through the protocol: resolves via served metadata-location
    got = rest.load_table("db.t")
    assert got.df().count() == 2
    assert rest.metadata_location("db.t").endswith("v2.metadata.json")
    with pytest.raises(TableAlreadyExistsError):
        rest.create_table("db.t", "id bigint")
    rest.drop_table("db.t", purge=True)
    assert not rest.table_exists("db.t")
    with pytest.raises(NoSuchTableError):
        rest.load_table("db.t")


def test_rename_and_register_endpoints(spark, rest):
    rest.create_namespace("db")
    rest.create_namespace("db2")
    t = rest.create_table("db.src", "id bigint")
    t.append(spark.range(3))
    rest.rename_table("db.src", "db2.dst")
    assert rest.list_tables("db") == [] and rest.list_tables("db2") == ["dst"]
    assert rest.load_table("db2.dst").df().count() == 3
    # register: adopt by metadata-location, the spec's register shape
    ml = rest.metadata_location("db2.dst")
    t2 = rest.register_table("db.adopted", ml)
    assert t2.df().count() == 3


def test_error_mapping(rest):
    rest.create_namespace("db")
    with pytest.raises(NoSuchTableError):
        rest.drop_table("db.ghost")
    with pytest.raises(Exception):
        rest.create_table("nope.t", "id bigint")  # unknown namespace -> 400


def test_partitioned_create_over_http(spark, rest):
    rest.create_namespace("db")
    t = rest.create_table(
        "db.part", "id bigint, ts timestamp", partition_by=["days(ts)"]
    )
    from datetime import datetime

    t.append(
        local_df(spark, 
            [(1, datetime(2020, 1, 1)), (2, datetime(2020, 1, 2))],
            "id bigint, ts timestamp",
        )
    )
    assert rest.load_table("db.part").df().count() == 2


def test_names_with_url_metacharacters(spark, rest):
    """Namespace/table names containing spaces or '#' must round-trip:
    unencoded they would split the HTTP request line or truncate the
    path."""
    rest.create_namespace("my ns")
    t = rest.create_table("my ns.my table#1", "id bigint")
    t.append(spark.range(3))
    assert rest.list_tables("my ns") == ["my table#1"]
    assert rest.load_table("my ns.my table#1").df().count() == 3
    rest.drop_table("my ns.my table#1", purge=True)
    rest.drop_namespace("my ns")


def test_duplicate_namespace_conflicts_over_http(rest):
    from iceberg_matrix_spark.tables.catalog import TableAlreadyExistsError

    rest.create_namespace("dup", {"k": "1"})
    rest.create_namespace("dup", {"k": "1"})  # idempotent
    with pytest.raises(TableAlreadyExistsError):
        rest.create_namespace("dup", {"k": "2"})
