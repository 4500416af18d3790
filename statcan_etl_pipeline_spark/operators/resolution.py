"""Entity resolution: blocked fuzzy-matching of name-like keys.

The scale problem: "find all record pairs whose names are within edit
distance d" is quadratic if done naively — a cross join over a 100 TB
dimension is never acceptable. The standard bounded-candidate answer
for small d is FastSS (Bocek et al., 2007): the *deletion
neighborhood*. Two equal-or-near-length strings are within edit
distance 1 iff their deletion neighborhoods (the string itself plus
every single-character-deletion variant) intersect. Blocking on those
variants turns pair generation into an equi-join on a short string
key — each candidate bucket holds only the strings sharing one
variant, so pair fan-out is bounded per bucket and there is no
cartesian product anywhere. The final `levenshtein` check runs only
on candidates.

Spark-first design notes:
- variants are generated JVM-side with `transform(sequence(...))` —
  no Python UDF;
- the self-join is a plain equi-join on the variant key (one shuffle);
- candidate pairs are de-duplicated with a `distinct()` on the id
  pair (a pair can match on several variants, e.g. one per differing
  position) — one more shuffle on the pair key, still linear in the
  candidate count;
- `levenshtein(..., threshold)` (Spark 3.5+) short-circuits the DP to
  the band of width `threshold`, keeping verification O(len·d).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(name_expr: str) -> str:
    """SQL expression producing the deletion-1 neighborhood of
    `name_expr`: the string itself (i = 0) plus every variant with one
    character removed. `array_distinct` collapses variants made equal
    by repeated characters (deleting either '0' of "00" yields "0")."""
    return f"""array_distinct(transform(
        sequence(0, length({name_expr})),
        i -> CASE WHEN i = 0 THEN {name_expr}
                  ELSE concat(substring({name_expr}, 1, i - 1),
                              substring({name_expr}, i + 1)) END))"""


def fastss_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All id pairs (a < b) whose names are within `max_dist` edits,
    via deletion-neighborhood blocking. Complete for max_dist = 1 (the
    FastSS guarantee); for larger distances the single-deletion
    neighborhood is a *recall-reducing* blocker and the caller should
    chain deletions (not implemented — distance 1 is the dedup
    sweet spot for ID-like keys)."""
    v = df.select(
        F.col(id_col).alias("rid"),
        F.col(name_col).alias("rname"),
        F.explode(F.expr(deletion_variants(name_col))).alias("variant"),
    )
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(b, "variant")
        .filter(F.col("a.rid") < F.col("b.rid"))
        .select(
            F.col("a.rid").alias("a_id"),
            F.col("a.rname").alias("a_name"),
            F.col("b.rid").alias("b_id"),
            F.col("b.rname").alias("b_name"),
        )
        .distinct()
    )
    dist = F.levenshtein(F.col("a_name"), F.col("b_name"), max_dist)
    return cand.select(
        "a_id", "b_id", "a_name", "b_name", dist.alias("dist")
    ).filter(F.col("dist") >= 0)
