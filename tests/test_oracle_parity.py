"""Every oracle-paired query in the registry must match its DuckDB
oracle exactly (row count + columns + values) — the local replica of
the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from timescale_cdc_spark.oracle import compare_query
from timescale_cdc_spark.queries import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    res = compare_query(spark, name, sf_dir)
    assert res.ok, f"{name}: {res.message}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
