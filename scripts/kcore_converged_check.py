"""r13 (VERDICT r12 item 4): independent fixpoint check for
`part_kcore_converged` — a round-by-round DuckDB peel with
MATERIALIZED temp tables (the sf1_holdout_check LPA precedent: the
round loop lives in Python, so the depth is data-dependent and nothing
is unrolled), plus the core PROPERTY asserted in SQL (every surviving
node's induced degree ≥ k; the peel construction gives maximality).

`duckdb_kcore_fixpoint` is imported by tests/test_kcore_converged.py
and pinned checker == registered-query at the gate SFs where the
12-round contract converges; run this script against testdata_big/sf1
for the scale decade where it does not (`converged = 0` under the
published contract — the fixpoint answer is what this verifies).

Usage: python scripts/kcore_converged_check.py [--sf-dir testdata_big/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def duckdb_kcore_fixpoint(sf_dir: str, max_rounds: int = 64) -> dict:
    """(k, n_nodes, n_core_nodes, n_core_edges_in, rounds) by iterative
    peel in DuckDB — independent of both the Spark loop and the
    registered query's unrolled-CTE oracle."""
    con = duckdb.connect()
    li = os.path.join(sf_dir, "lineitem.parquet")
    if os.path.isdir(li):
        # Spark writes a parquet DIRECTORY (tests' random graphs); the
        # shipped testdata are single files
        li = os.path.join(li, "*.parquet")
    con.execute(
        f"""CREATE TEMP TABLE edges AS
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM read_parquet('{li}'))
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"""
    )
    con.execute(
        """CREATE TEMP TABLE deg0 AS
        SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
        GROUP BY node"""
    )
    k = con.execute(
        "SELECT CAST(quantile_disc(d, 0.50) * 7 // 10 AS BIGINT) FROM deg0"
    ).fetchone()[0]
    n_nodes = con.execute("SELECT count(*) FROM deg0").fetchone()[0]
    con.execute("CREATE TEMP TABLE alive AS SELECT node FROM deg0")
    con.execute("CREATE TEMP TABLE e_cur AS SELECT u, v FROM edges")
    n_prev, rounds = None, 0
    while rounds < max_rounds:
        con.execute(
            """CREATE OR REPLACE TEMP TABLE e_next AS
            SELECT e.u, e.v FROM e_cur e
            JOIN alive x ON e.u = x.node JOIN alive y ON e.v = y.node"""
        )
        con.execute(
            f"""CREATE OR REPLACE TEMP TABLE alive2 AS
            SELECT node FROM (
              SELECT node, count(*) AS c
              FROM (SELECT u AS node FROM e_next UNION ALL SELECT v FROM e_next)
              GROUP BY node
            ) WHERE c >= {k}"""
        )
        con.execute("CREATE OR REPLACE TEMP TABLE e_cur AS SELECT * FROM e_next")
        con.execute("CREATE OR REPLACE TEMP TABLE alive AS SELECT * FROM alive2")
        rounds += 1
        n_alive = con.execute("SELECT count(*) FROM alive").fetchone()[0]
        if n_alive == n_prev:
            break
        n_prev = n_alive
    else:
        raise RuntimeError(f"duckdb peel: no fixpoint within {max_rounds} rounds")
    n_core = con.execute("SELECT count(*) FROM alive").fetchone()[0]
    n_edges = con.execute("SELECT count(*) FROM e_cur").fetchone()[0]
    # core PROPERTY: at the fixpoint every survivor's induced degree ≥ k
    # (vacuously true for an empty core)
    bad = con.execute(
        f"""SELECT count(*) FROM (
          SELECT node, count(*) AS c
          FROM (SELECT u AS node FROM e_cur UNION ALL SELECT v FROM e_cur)
          GROUP BY node HAVING count(*) < {k})"""
    ).fetchone()[0]
    assert bad == 0, f"core property violated: {bad} nodes below k={k}"
    con.close()
    return {
        "k": k,
        "n_nodes": n_nodes,
        "n_core_nodes": n_core,
        "n_core_edges_in": n_edges,
        "rounds": rounds,
        "converged": 1,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--sf-dir", default=os.path.join(repo, "testdata_big", "sf1"))
    args = ap.parse_args()

    t0 = time.perf_counter()
    exp = duckdb_kcore_fixpoint(args.sf_dir)
    print(f"duckdb fixpoint ({time.perf_counter() - t0:.1f} s): {exp}")

    from statcan_etl_pipeline_spark.queries.graph import part_kcore_converged
    from statcan_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="kcore_converged_check")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    got = part_kcore_converged(spark, args.sf_dir).collect()[0].asDict()
    print(f"spark fixpoint ({time.perf_counter() - t0:.1f} s): {got}")
    spark.stop()
    status = "MATCH" if got == exp else "MISMATCH"
    print(status)
    sys.exit(0 if status == "MATCH" else 1)


if __name__ == "__main__":
    main()
