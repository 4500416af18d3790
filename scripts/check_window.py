"""Driver-window invariant check (SURVEY §5): any query whose
implementation OR oracle changed since the last snapshot MUST sit inside
the driver's 50-query correctness window (`queries()` dict order,
first 50) so the change gets driver hash evidence in the same round.

The r8 retro that motivates this: six survey2 queries were modified
(broadcast-hint drops) without rotating them into the window, so the
engine carried modified-but-never-driver-verified code for a full round.

Usage:
    python scripts/check_window.py --snapshot   # at end of round: record
        per-query md5(source)+md5(oracle) into scripts/query_hashes.json
    python scripts/check_window.py              # before snapshot/commit:
        exit 1 if any changed/new query is outside the window
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "query_hashes.json")


def _current_hashes() -> tuple[dict[str, str], dict[str, str], dict[str, list[str]]]:
    """(per-query hash, per-module file hash, module -> query names).

    The per-query hash covers the registered function's own source plus
    its oracle; a change to a shared module-level helper does NOT move
    it (r9 example: pipeline_topk_per_segment's _topk_spec). The module
    hash catches that residue: a module whose file changed while none
    of its query hashes moved means helper-only edits — every query in
    it is potentially affected and gets a WARNING for manual triage.
    """
    from statcan_etl_pipeline_spark.registry import ORACLES, QUERIES

    out, mod_files, mod_queries = {}, {}, {}
    for name, fn in QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):  # builtins/lambdas: hash the repr
            src = repr(fn)
        blob = src + "\n--oracle--\n" + ORACLES.get(name, "")
        out[name] = hashlib.md5(blob.encode()).hexdigest()
        mod = getattr(fn, "__module__", None)
        if mod:
            mod_queries.setdefault(mod, []).append(name)
            if mod not in mod_files:
                try:
                    path = inspect.getfile(fn)
                    with open(path, "rb") as f:
                        mod_files[mod] = hashlib.md5(f.read()).hexdigest()
                except (OSError, TypeError):
                    pass
    return out, mod_files, mod_queries


def _window() -> list[str]:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.queries())[:50]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", action="store_true",
                    help="record the current per-query hashes as the baseline")
    args = ap.parse_args()

    cur, mod_files, mod_queries = _current_hashes()
    if args.snapshot:
        with open(MANIFEST, "w") as f:
            json.dump({"queries": cur, "modules": mod_files}, f,
                      indent=0, sort_keys=True)
        print(f"snapshot: {len(cur)} query hashes -> {MANIFEST}")
        return 0

    if not os.path.exists(MANIFEST):
        print(f"no manifest at {MANIFEST}; run --snapshot first", file=sys.stderr)
        return 2

    with open(MANIFEST) as f:
        snap = json.load(f)
    base = snap.get("queries", snap)  # tolerate the pre-module format
    base_mods = snap.get("modules", {})
    changed = sorted(
        name for name, h in cur.items() if base.get(name) != h
    )
    win = set(_window())
    outside = [name for name in changed if name not in win]
    print(f"changed/new queries since snapshot: {len(changed)}")
    for name in changed:
        mark = "OK (in window)" if name in win else "VIOLATION (outside window)"
        print(f"  {name}: {mark}")
    changed_set = set(changed)
    for mod, h in sorted(mod_files.items()):
        if base_mods.get(mod, h) != h and not (set(mod_queries[mod]) & changed_set):
            print(
                f"WARNING: {mod} changed but none of its query bodies did "
                f"(helper-only edit?) — triage whether any of "
                f"{sorted(mod_queries[mod])[:8]}... belongs in the window"
            )
    if outside:
        print(
            f"\nFAIL: {len(outside)} changed queries are outside the driver "
            "window — reorder _CHECK_FIRST in __spark_entry__.py so they are "
            "inside the first 50.",
            file=sys.stderr,
        )
        return 1
    print("OK: every changed query is inside the driver window.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
