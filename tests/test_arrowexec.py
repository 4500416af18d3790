"""Arrow execution surfaces: cogrouped applyInPandas + mapInArrow.

The parity suite already hash-checks both queries against DuckDB; here
we pin (a) semantic equivalence of the cogrouped merge_asof against the
JVM-native union+carry as-of operator, and (b) that the intended Arrow
exec nodes actually appear in the physical plans.
"""

from __future__ import annotations

from statcan_etl_pipeline_spark.registry import QUERIES


def _plan(spark, name, sf_dir) -> str:
    return (
        QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )


def test_cogrouped_asof_matches_jvm_asof(spark, sf_small):
    """pandas.merge_asof inside a cogroup must reproduce the JVM
    union+carry as-of join row-for-row (same backward/exact-match/
    max-view_id-tie contract)."""
    cg = {
        tuple(r)
        for r in QUERIES["asof_join_cogrouped"](spark, sf_small).collect()
    }
    jvm = {
        tuple(r)
        for r in QUERIES["asof_join_purchase_to_view"](spark, sf_small).collect()
    }
    assert cg == jvm
    assert len(cg) > 0


def test_cogrouped_asof_plan_has_cogroup_node(spark, sf_small):
    plan = _plan(spark, "asof_join_cogrouped", sf_small)
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan


def test_map_in_arrow_plan_has_arrow_node(spark, sf_small):
    plan = _plan(spark, "doc_token_arrow_stats", sf_small)
    assert "MapInArrow" in plan, plan
    # the per-source aggregation still gets a map-side partial combine
    assert "partial_" in plan


def test_map_in_arrow_prunes_unused_columns(spark, sf_small):
    """The documents scan under mapInArrow must read only (source,
    text) — lang / n_chars / doc_id stay pruned."""
    plan = _plan(spark, "doc_token_arrow_stats", sf_small)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and all("n_chars" not in ln and "lang" not in ln for ln in read)
