"""Oracle parity for every registered query — the local mirror of the
driver's sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from statcan_etl_pipeline_spark.registry import ORACLES, QUERIES

from .oracle import assert_parity

ORACLE_NAMES = sorted(ORACLES)

# Heaviest single parity case (80+ s: the LSH pairs + star-contraction
# components composition) — `full` tier at BOTH SFs; the operator is
# still covered fast by test_components + the dedup_embedding_lsh
# parity cases.
_FULL_ONLY = {"dedup_embedding_groups"}

_SMALL_PARAMS = [
    pytest.param(n, marks=pytest.mark.full) if n in _FULL_ONLY else n
    for n in ORACLE_NAMES
]


@pytest.mark.parametrize("name", _SMALL_PARAMS)
def test_parity_sf_small(spark, sf_small, name):
    assert_parity(spark, name, sf_small)


# The sf0.01 sweep mirrors the driver's own correctness gate — `full`
# tier (the driver re-verifies its window itself; the sf0.001 sweep
# above stays in the default tier as the complete parity smoke).
@pytest.mark.full
@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_parity_sf_med(spark, sf_med, name):
    assert_parity(spark, name, sf_med)


@pytest.mark.full
def test_all_queries_return_rows(spark, sf_med):
    # every query (oracle or not) runs and yields a stable schema
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, sf_med)
        assert df.columns, name
        assert df.count() >= 0, name
