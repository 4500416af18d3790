"""Oracle parity for every registered query — the local mirror of the
driver's sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from statcan_etl_pipeline_spark.registry import ORACLES, QUERIES

from .oracle import assert_parity

ORACLE_NAMES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_parity_sf_small(spark, sf_small, name):
    assert_parity(spark, name, sf_small)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_parity_sf_med(spark, sf_med, name):
    assert_parity(spark, name, sf_med)


def test_all_queries_return_rows(spark, sf_med):
    # every query (oracle or not) runs and yields a stable schema
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, sf_med)
        assert df.columns, name
        assert df.count() >= 0, name
