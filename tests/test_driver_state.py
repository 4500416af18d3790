"""Static allowlist pin on driver-side materialization in the engine.

`.collect()` / `.toPandas()` inside an operator means that path is not
distributed — every occurrence must be a documented bounded-driver-state
iterative op (k-means centroids k=4, PCA d=64 loading vector, MMR's
O(k) winner ids, the metrics profiler's own action). This test freezes
that set: a new collect anywhere in the package fails the suite until
it is either rewritten distributed or explicitly added here with a
boundedness argument.
"""

from __future__ import annotations

import os

import statcan_etl_pipeline_spark as pkg

# file (relative to package root) -> max allowed occurrences of
# ".collect()" + ".toPandas()" combined, with the boundedness reason.
_ALLOWED = {
    # k-means: k=4 centroids per iteration; seed medoid ids — O(k*dim)
    "queries/embeddings.py": (2, "k-means centroid state, O(k*dim)"),
    # PCA: one d=64 loading vector per power iteration — O(d)
    "queries/pca.py": (2, "power-iteration vector state, O(d)"),
    # MMR: k winner ids, one per greedy step — O(k)
    "queries/retrieval.py": (2, "MMR winner ids, O(k)"),
    # the exec-metrics profiler triggers the caller's action itself
    "plans/metrics.py": (1, "metrics profiler's own action"),
    # markov power iteration: k x k transition matrix + type set,
    # k = |event types| — O(k^2) rows collected once so the 8
    # iterations never re-scan the event stream (r9)
    "queries/survey.py": (1, "k x k transition matrix, O(k^2)"),
}


def test_driver_side_materialization_allowlist():
    root = os.path.dirname(os.path.abspath(pkg.__file__))
    found: dict[str, int] = {}
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root).replace(os.sep, "/")
            with open(path, encoding="utf-8") as f:
                src = f.read()
            n = src.count(".collect()") + src.count(".toPandas()")
            if n:
                found[rel] = n
    unexpected = {
        rel: n for rel, n in found.items()
        if rel not in _ALLOWED or n > _ALLOWED[rel][0]
    }
    assert not unexpected, (
        f"undocumented driver-side materialization: {unexpected}; "
        "rewrite distributed or extend the allowlist with a boundedness "
        "argument"
    )
    # the allowlist may not silently rot either
    stale = {rel for rel in _ALLOWED if rel not in found}
    assert not stale, f"allowlist entries no longer present: {stale}"


def _synthetic_events(spark, n_types: int):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, base + datetime.timedelta(minutes=i), u * 100 + i, f"type_{(u + i) % n_types}")
        for u in range(1, 4)
        for i in range(2 * n_types)
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )


def test_markov_k_bound_enforced_at_runtime(spark):
    """The O(k²) Markov driver fold must FAIL, not OOM, on a
    high-cardinality type column (VERDICT r9 item 5): the collect is
    LIMIT-bounded so the oversized case transfers ~k_max² rows max."""
    import pytest

    from statcan_etl_pipeline_spark.queries.survey import (
        MARKOV_MAX_K,
        _markov_stationary_from,
    )

    with pytest.raises(ValueError, match="driver-state bound"):
        _markov_stationary_from(
            spark, _synthetic_events(spark, MARKOV_MAX_K + 10)
        ).collect()


def test_markov_k_bound_passes_under_limit(spark):
    from statcan_etl_pipeline_spark.queries.survey import _markov_stationary_from

    out = _markov_stationary_from(spark, _synthetic_events(spark, 7)).collect()
    assert len(out) == 7
    # mass conservation: the nano-unit quantization keeps totals ~1e9
    assert abs(sum(r["pi8"] for r in out) - 1.0) < 1e-3
