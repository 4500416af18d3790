"""r13: the k-core convergence contract (VERDICT r12 item 4).

The registered `part_kcore_decomposition` PUBLISHES fixed-12 rounds
with `converged` as the quality bit (its oracle unrolls exactly 12);
`part_kcore_converged` is the fixpoint companion. These tests pin the
three-way agreement that replaces an (impossible) static oracle for
the data-dependent depth: registered query == converged variant where
12 rounds suffice (every gate SF), and converged variant == the
independent DuckDB round-by-round peel (checker == oracle at gate SF —
the sf1_holdout_check precedent; scripts/kcore_converged_check.py runs
the same comparison at sf1, where the contract reports converged=0 and
the fixpoint needs more than 12 rounds).
"""

from __future__ import annotations

import os
import sys

import pytest

from statcan_etl_pipeline_spark.registry import QUERIES
from statcan_etl_pipeline_spark.queries.graph import part_kcore_converged

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts")
)
from kcore_converged_check import duckdb_kcore_fixpoint  # noqa: E402


@pytest.mark.parametrize("sf_fixture", ["sf_small", "sf_med"])
def test_converged_matches_registered_and_checker(spark, request, sf_fixture):
    sf_dir = request.getfixturevalue(sf_fixture)
    reg = QUERIES["part_kcore_decomposition"](spark, sf_dir).collect()[0].asDict()
    conv = part_kcore_converged(spark, sf_dir).collect()[0].asDict()
    # the registered contract converges within 12 at every gate SF
    # (measured 3/6/10 rounds) — there the two must agree exactly
    assert reg["converged"] == 1
    for col in ("k", "n_nodes", "n_core_nodes", "n_core_edges_in"):
        assert conv[col] == reg[col], (col, conv, reg)
    assert conv["converged"] == 1
    assert 1 <= conv["rounds"] <= 12
    # and the independent DuckDB peel (which also asserts the
    # min-induced-degree ≥ k core property in SQL) must reproduce the
    # whole row INCLUDING the round count
    exp = duckdb_kcore_fixpoint(sf_dir)
    assert conv == exp, (conv, exp)


def test_converged_raises_instead_of_truncating(spark, sf_small):
    """A function named 'converged' must never return a truncated
    core: an unreachable max_rounds raises."""
    with pytest.raises(RuntimeError, match="no fixpoint"):
        part_kcore_converged(spark, sf_small, max_rounds=1)


@pytest.mark.parametrize("seed", [11, 12])
def test_converged_matches_duckdb_peel_on_random_graphs(
    spark, tmp_path, seed
):
    """The three-way k-core agreement on ARBITRARY graphs, not just the
    shipped corpus: a random co-purchase incidence written as a
    lineitem table must produce the same (k, core, edges, rounds) from
    the Spark fixpoint peel and the independent DuckDB peel (which also
    asserts the min-induced-degree property in SQL)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n_lines = 600
    rows = [
        (int(o), int(p))
        for o, p in zip(
            rng.integers(0, 150, n_lines), rng.integers(0, 60, n_lines)
        )
    ]
    sf_dir = str(tmp_path / f"kc{seed}")
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        f"{sf_dir}/lineitem.parquet"
    )
    got = part_kcore_converged(spark, sf_dir).collect()[0].asDict()
    exp = duckdb_kcore_fixpoint(sf_dir)
    assert got == exp, (got, exp)
