"""Oracle parity for every registered SQL-expressible query (driver mirror)."""

from __future__ import annotations

import pytest

from python_cdc_postgres_to_clickhouse_spark.registry import all_queries

from .conftest import SF_ORACLE
from .oracle_harness import assert_parity

SPECS = {n: s for n, s in all_queries().items() if s.oracle is not None}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, name):
    assert_parity(spark, SPECS[name], SF_ORACLE)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema.fieldNames()[0] == "l_returnflag"


def test_every_query_has_runnable_fn(spark):
    import __spark_entry__ as e

    qs = e.queries()
    assert qs, "no queries registered"
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
