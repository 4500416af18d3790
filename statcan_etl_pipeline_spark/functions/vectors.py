"""Vector (embedding) column math with cross-engine-exact semantics.

Dot products are accumulated in FIXED POINT (int64 nano-units): each
elementwise product is rounded half-away-from-zero to 1e-9, then summed
exactly — so Spark's `aggregate` fold and DuckDB's `list_sum` produce
identical integers regardless of accumulation order, and the derived
cosine doubles are bit-identical. Magnitudes: unit-ish 64-dim vectors
→ |product|·1e9 ≤ 2^31, sums ≪ 2^53. All JVM-side (`zip_with` /
`aggregate` inside codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = "1000000000.0"


def _c(x: str | Column) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot_fixed(a: str | Column, b: str | Column) -> Column:
    """Int64 fixed-point dot product of two array<float|double> columns
    (column names or Column expressions, e.g. a literal plane array)."""
    prod = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    fixed = F.transform(
        prod,
        lambda p: F.when(p >= 0, F.floor(p * F.lit(1e9) + F.lit(0.5))).otherwise(
            -F.floor((-p) * F.lit(1e9) + F.lit(0.5))
        ),
    )
    return F.aggregate(fixed, F.lit(0).cast("long"), lambda acc, v: acc + v)


def sql_dot_fixed(a: str, b: str) -> str:
    prod = f"(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))"
    fixed = (
        f"CASE WHEN {prod} >= 0 THEN CAST(floor({prod} * {_SCALE} + 0.5) AS BIGINT) "
        f"ELSE -CAST(floor((-{prod}) * {_SCALE} + 0.5) AS BIGINT) END"
    )
    return (
        f"CAST(list_sum(list_transform(range(1, len({a}) + 1), i -> {fixed})) AS BIGINT)"
    )


def sqdist_fixed(a: str | Column, b: str | Column) -> Column:
    """Int64 fixed-point squared L2 distance — each (x-y)^2 term is
    rounded to 1e-9 then summed exactly, so argmin over codebook
    centroids is engine-exact (see sql_sqdist_fixed)."""
    diff = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") - y.cast("double")
    )
    fixed = F.transform(
        diff, lambda d: F.floor(d * d * F.lit(1e9) + F.lit(0.5)).cast("long")
    )
    return F.aggregate(fixed, F.lit(0).cast("long"), lambda acc, v: acc + v)


def sql_sqdist_fixed(a: str, b: str, offset: str = "0", n: int = 16) -> str:
    """DuckDB twin of sqdist_fixed over `a[offset+1 .. offset+n]` vs
    `b[1 .. n]` — `offset` is a SQL expression (e.g. `bk.m * 16`)."""
    d = f"(CAST({a}[i + ({offset})] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    fixed = f"CAST(floor({d} * {d} * {_SCALE} + 0.5) AS BIGINT)"
    return f"CAST(list_sum(list_transform(range(1, {n} + 1), i -> {fixed})) AS BIGINT)"


def sql_list_lit(row: list[float]) -> str:
    """A DuckDB double-list literal from Python floats (repr round-trips
    exactly, so both engines see bit-identical constants)."""
    return "[" + ", ".join(repr(float(v)) for v in row) + "]"


def cosine(a: str, b: str) -> Column:
    """Cosine similarity (double, bit-identical to sql_cosine).

    NOTE: embedding this in a rounding wrapper (pround) copies the
    whole expression 3× at tree-build time — in a hot pair join use
    `with_pair_cosine`, which materializes each fold once per row."""
    dab = dot_fixed(a, b) / F.lit(1e9)
    daa = dot_fixed(a, a) / F.lit(1e9)
    dbb = dot_fixed(b, b) / F.lit(1e9)
    return F.when((daa > 0) & (dbb > 0), dab / (F.sqrt(daa) * F.sqrt(dbb)))


def with_pair_cosine(
    df,
    a: str,
    b: str,
    out: str,
    decimals: int = 6,
    daa: str | None = None,
    dbb: str | None = None,
    min_value: float | None = None,
):
    """Append `out` = round(cosine(df[a], df[b]), decimals) with every
    fixed-point fold evaluated ONCE per row (bit-identical to
    pround(cosine(a, b), decimals)).

    Why this exists (r11, measured): `pround(x)` embeds `x` three times
    in the expression tree (sign test + two floor branches), and the
    interpreted HOF folds have no common-subexpression elimination — so
    the inline form evaluates the 64-dim cross-dot fold 3× per pair
    (and, un-hoisted, the two self-dots 3× each: 9 folds/pair).
    Materializing each fold as its own projection column first leaves
    exactly one evaluation per fold per row; Catalyst's CollapseProject
    keeps the split because the folds are non-cheap and
    multi-referenced (verified: optimized plan carries 1 aggregate
    fold, not 3).

    `daa`/`dbb` name already-hoisted per-vector self-dot columns
    (`dot_fixed(v, v)/1e9`); when absent the self-dots are folded here,
    still exactly once per row.

    `min_value` (a non-negative threshold with ≤ `decimals` decimals,
    e.g. a dedup τ) applies `round(cosine) >= min_value` as an
    ATTRIBUTE-level predicate under the rounding projection. Filtering
    the rounded column instead re-inlines the whole fold into the
    pushed-down predicate (Catalyst substitutes aliases when pushing
    predicates through projections — measured 6 fold evaluations per
    pair); this form keeps it at one fold per pair plus one per
    SURVIVOR. Equivalence: for x ≥ 0, pround(x, d) >= τ ⟺
    floor(x·10^d + 0.5) >= τ·10^d (an integer, and τ·10^d/10^d
    round-trips to the same double the ≥ would compare against); for
    x < 0 or a NULL guard both forms reject."""
    from .portable import pround

    tmp = [f"_{out}_dab"]
    df = df.withColumn(tmp[0], dot_fixed(a, b) / F.lit(1e9))
    if daa is None:
        daa = f"_{out}_daa"
        tmp.append(daa)
        df = df.withColumn(daa, dot_fixed(a, a) / F.lit(1e9))
    if dbb is None:
        dbb = f"_{out}_dbb"
        tmp.append(dbb)
        df = df.withColumn(dbb, dot_fixed(b, b) / F.lit(1e9))
    guard = (F.col(daa) > 0) & (F.col(dbb) > 0)
    raw = F.col(tmp[0]) / (F.sqrt(daa) * F.sqrt(dbb))
    if min_value is not None:
        # strictly positive: at τ = 0 the (raw >= 0) guard would treat
        # a -0.0-rounding value differently from `pround(...) >= 0`
        assert min_value > 0, "min_value must be positive (see docstring)"
        thr = int(round(min_value * 10**decimals))
        scale = F.lit(float(10**decimals))
        df = df.filter(
            guard & (raw >= 0) & (F.floor(raw * scale + F.lit(0.5)) >= thr)
        )
    cos = F.when(guard, raw)
    return df.withColumn(out, pround(cos, decimals)).drop(*tmp)


def sql_cosine(a: str, b: str) -> str:
    dab = f"({sql_dot_fixed(a, b)} / {_SCALE})"
    daa = f"({sql_dot_fixed(a, a)} / {_SCALE})"
    dbb = f"({sql_dot_fixed(b, b)} / {_SCALE})"
    return (
        f"(CASE WHEN {daa} > 0 AND {dbb} > 0 "
        f"THEN {dab} / (sqrt({daa}) * sqrt({dbb})) ELSE NULL END)"
    )
