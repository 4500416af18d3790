"""SimHash (64-bit) with portable, engine-exact arithmetic.

Classic Charikar simhash: each shingle hashes to 64 bits; per bit the
doc accumulates +1/-1; the sign vector is the signature. Near-dup docs
differ in few bits, so candidates are found by matching any of 4
16-bit bands (pigeonhole: hamming ≤ 3 ⇒ some band equal).

Portability: the 64 bits come from md5 hex NIBBLES decoded with
instr('0123456789abcdef', …) and bit-extracted with floor(v / 2^j) % 2
— nothing but string ops and integer arithmetic, identical in Spark
SQL and DuckDB, so the oracle reproduces signatures bit-for-bit.

Scale: one explode over (doc, distinct shingle), 64 conditional SUMs
in a single hash aggregate (one shuffle on doc_id), then a band join.
No pairwise work outside band buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"
N_BITS = 64
N_BANDS = 4
BAND_HEX = 4  # hex chars per band (16 bits)


def _nibble_exprs() -> list[str]:
    """v1..v16: nibble value of each md5 hex char of the shingle."""
    return [
        f"instr('{HEX}', substr(md5(sh), {p}, 1)) - 1 AS v{p}" for p in range(1, 17)
    ]


def _bit_sum_sql(b: int) -> str:
    """Aggregate: signed sum of bit b over shingles (+1 set / -1 unset)."""
    p = b // 4 + 1  # nibble position 1..16
    j = 3 - b % 4  # MSB-first within nibble
    return f"sum(2 * (CAST(floor(v{p} / {2 ** j}) AS BIGINT) % 2) - 1)"


def _simhash_concat_sql() -> str:
    """Rebuild the 16-hex-char signature from the 64 signed sums."""

    def bit(b: int) -> str:
        return f"(CASE WHEN s_{b} >= 0 THEN 1 ELSE 0 END)"

    chars = []
    for p in range(16):
        b0 = p * 4
        val = f"({bit(b0)} * 8 + {bit(b0 + 1)} * 4 + {bit(b0 + 2)} * 2 + {bit(b0 + 3)})"
        chars.append(f"substr('{HEX}', {val} + 1, 1)")
    return "concat(" + ", ".join(chars) + ")"


def band_exprs(simhash_col: str = "simhash") -> list[str]:
    return [
        f"substr({simhash_col}, {1 + i * BAND_HEX}, {BAND_HEX}) AS band_{i}"
        for i in range(N_BANDS)
    ]


def simhash_signatures(shingled: DataFrame) -> DataFrame:
    """(doc_id, simhash, band_0..band_3) from (doc_id, sh)."""
    nibbles = shingled.selectExpr("doc_id", *_nibble_exprs())
    sums = nibbles.groupBy("doc_id").agg(
        *[F.expr(_bit_sum_sql(b)).alias(f"s_{b}") for b in range(N_BITS)]
    )
    return sums.selectExpr(
        "doc_id", f"{_simhash_concat_sql()} AS simhash"
    ).selectExpr("doc_id", "simhash", *band_exprs())


def simhash_oracle_sql(shingle_cte: str) -> str:
    """DuckDB oracle mirroring simhash_signatures exactly.
    `shingle_cte` must yield (doc_id, sh)."""
    nibbles = ", ".join(_nibble_exprs())
    sums = ", ".join(f"{_bit_sum_sql(b)} AS s_{b}" for b in range(N_BITS))
    bands = ", ".join(band_exprs())
    return f"""
WITH sh AS ({shingle_cte}),
nib AS (SELECT doc_id, {nibbles} FROM sh),
sums AS (SELECT doc_id, {sums} FROM nib GROUP BY doc_id),
sig AS (SELECT doc_id, {_simhash_concat_sql()} AS simhash FROM sums)
SELECT doc_id, simhash, {bands} FROM sig
ORDER BY doc_id
"""


def simhash_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Distinct (doc_a, doc_b) sharing ≥1 of the 4 bands."""
    stacked = signatures.selectExpr(
        "doc_id",
        "stack(4, " + ", ".join(f"{i}, band_{i}" for i in range(N_BANDS)) + ") AS (band, key)",
    )
    a, b = stacked.alias("a"), stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
