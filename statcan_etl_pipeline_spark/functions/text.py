"""Text-analysis column functions and their DuckDB-SQL twins.

Everything stays JVM-side (built-in string/array functions inside
whole-stage codegen) — no Python UDFs. Each Spark helper has a
`sql_*` twin generating the exact-same-semantics DuckDB expression so
oracle hashes match: identical normalization, identical tokenization,
identical integer/double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- normalization / tokenization ------------------------------------------


def norm_text(col: str = "text") -> Column:
    return F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " ")))


def sql_norm_text(col: str = "text") -> str:
    return f"lower(trim(regexp_replace({col}, '\\s+', ' ', 'g')))"


def tokens(norm_col: str = "norm") -> Column:
    return F.split(F.col(norm_col), " ")


def sql_tokens(norm_col: str = "norm") -> str:
    return f"string_split({norm_col}, ' ')"


# --- shingles ----------------------------------------------------------------


def word_shingles(toks_col: str = "toks", k: int = 3) -> Column:
    """Word k-gram shingles; empty array for docs shorter than k tokens."""
    return F.expr(
        f"CASE WHEN size({toks_col}) >= {k} THEN "
        f"transform(sequence(1, size({toks_col}) - {k - 1}), "
        f"i -> concat_ws(' ', slice({toks_col}, i, {k}))) "
        f"ELSE array() END"
    )


def sql_word_shingles(toks_col: str = "toks", k: int = 3) -> str:
    return (
        f"CASE WHEN len({toks_col}) >= {k} THEN "
        f"list_transform(range(1, len({toks_col}) - {k - 2}), "
        f"i -> array_to_string({toks_col}[i:i+{k - 1}], ' ')) "
        f"ELSE [] END"
    )


def char_shingles(norm_col: str = "norm", n: int = 5) -> Column:
    """Character n-gram shingles; whole string if shorter than n."""
    return F.expr(
        f"CASE WHEN length({norm_col}) >= {n} THEN "
        f"transform(sequence(1, length({norm_col}) - {n - 1}), "
        f"i -> substring({norm_col}, i, {n})) "
        f"ELSE array({norm_col}) END"
    )


def sql_char_shingles(norm_col: str = "norm", n: int = 5) -> str:
    return (
        f"CASE WHEN length({norm_col}) >= {n} THEN "
        f"list_transform(range(1, length({norm_col}) - {n - 2}), "
        f"i -> substr({norm_col}, CAST(i AS BIGINT), {n})) "
        f"ELSE [{norm_col}] END"
    )


# --- stopword hits ------------------------------------------------------------

STOPWORDS = {
    "en": ("the", "and", "of", "a", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "los", "y", "una", "por"),
}


def stopword_hits(toks_col: str, words: tuple[str, ...]) -> Column:
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"CAST(size(filter({toks_col}, t -> t IN ({lst}))) AS BIGINT)"
    )


def sql_stopword_hits(toks_col: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"CAST(len(list_filter({toks_col}, t -> t IN ({lst}))) AS BIGINT)"


# --- character-class ratios ----------------------------------------------------


def class_count(col: str, char_class: str) -> Column:
    """Count of characters matching a regex class, e.g. '[.,;:!?]'."""
    return F.length(F.regexp_replace(F.col(col), f"[^{char_class}]", "")).cast("long")


def sql_class_count(col: str, char_class: str) -> str:
    return f"CAST(length(regexp_replace({col}, '[^{char_class}]', '', 'g')) AS BIGINT)"
