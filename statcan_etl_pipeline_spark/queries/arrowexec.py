"""Arrow execution surfaces (round 7): cogrouped ``applyInPandas`` and
``mapInArrow`` — the two PySpark Python-execution APIs not exercised
anywhere else in the repo (``applyInPandasWithState`` covers the
streaming variant in streaming/stateful.py).

Both queries are full-oracle: the Python stage emits only
deterministic integer/timestamp values, so the driver's hash gate
checks the Arrow plumbing end-to-end, not just "ran without error".

Scale notes:
- cogroup = one hash shuffle per side on the group key, then one
  Arrow-batched pandas call per key — the same shuffle a JVM join
  would do, plus the Python serialization boundary. The JVM-native
  union+carry as-of (operators/temporal.py) stays the production
  path at 100 TB; this operator exists because grouped pandas logic
  (merge_asof, statsmodels-style per-group fits) is sometimes the
  only way to express a semantic, and it cross-checks the JVM path.
- mapInArrow is a zero-copy per-batch map: no shuffle at all, and
  pyarrow.compute kernels are vectorized C++ — the right template for
  a per-row featurizer too awkward for F.* but too hot for pandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import sql_round
from ..registry import query

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


# ---------------------------------------------------------------------------
# Cogrouped applyInPandas as-of join: purchases x views per user via
# pandas.merge_asof inside a cogroup. Same contract as
# asof_join_purchase_to_view (operators/temporal.py union+carry):
# backward match, exact ts allowed, max view_id wins a ts tie —
# merge_asof takes the LAST right row <= left ts, and the right side
# is sorted (ts, view_id), so ties resolve identically.
# ---------------------------------------------------------------------------
@query(
    "asof_join_cogrouped",
    oracle=f"""
WITH tagged AS (
  SELECT user_id, ts, 0 AS src, event_id AS view_id, NULL AS purchase_id
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, ts, 1 AS src, NULL AS view_id, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
), carried AS (
  SELECT *,
    last_value(view_id IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, src, view_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_view_id,
    last_value(CASE WHEN src = 0 THEN ts END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, src, view_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_ts
  FROM tagged
)
SELECT purchase_id AS event_id, user_id,
       strftime(ts, '{TS_FMT_DUCK}') AS purchase_ts,
       matched_view_id AS view_id,
       strftime(matched_ts, '{TS_FMT_DUCK}') AS view_ts
FROM carried WHERE src = 1
ORDER BY event_id
""",
)
def asof_join_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    # NOTE the alias on the view-side timestamp: in a self-cogroup both
    # sides carry attributes with the same expression ID, and Spark
    # resolves the duplicated `ts` to the LEFT side only — the right
    # pandas frame would arrive without its timestamp column.
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("vts")
    )

    def merge(left, right):
        # A key absent from one side arrives as an EMPTY, column-less
        # pandas DataFrame — both empties need explicit handling.
        import pandas as pd

        if left.empty:  # user had views but no purchases → no output rows
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "event_id": pd.Series(dtype="int64"),
                    "ts": pd.Series(dtype="datetime64[us]"),
                    "view_id": pd.Series(dtype="Int64"),
                    "view_ts": pd.Series(dtype="datetime64[us]"),
                }
            )
        left = left.sort_values(["ts", "event_id"], kind="mergesort")
        if right.empty:  # purchases but no views → all matches null
            out = left.copy()
            out["view_id"] = pd.Series(pd.NA, index=out.index, dtype="Int64")
            out["view_ts"] = pd.Series(
                pd.NaT, index=out.index, dtype=left["ts"].dtype
            )
            return out[["user_id", "event_id", "ts", "view_id", "view_ts"]]
        right = right.sort_values(["vts", "view_id"], kind="mergesort")
        out = pd.merge_asof(
            left,
            right.rename(columns={"vts": "view_ts"})[["view_ts", "view_id"]],
            left_on="ts",
            right_on="view_ts",
            direction="backward",
            allow_exact_matches=True,
        )
        out["view_id"] = out["view_id"].astype("Int64")  # NaN-safe long
        return out[["user_id", "event_id", "ts", "view_id", "view_ts"]]

    joined = (
        purchases.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(
            merge,
            schema="user_id long, event_id long, ts timestamp, "
            "view_id long, view_ts timestamp",
        )
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        "view_id",
        F.date_format("view_ts", TS_FMT_SPARK).alias("view_ts"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# mapInArrow corpus stats: per-document integer text features computed
# with vectorized pyarrow.compute kernels (bytes, chars, space-delimiter
# count), aggregated per source JVM-side afterwards. Every emitted
# number is an exact integer, so the oracle hash pins the whole Arrow
# path bit-for-bit.
# ---------------------------------------------------------------------------
@query(
    "doc_token_arrow_stats",
    oracle=f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(sum(length(text) - length(replace(text, ' ', ''))) AS BIGINT)
         AS total_spaces,
       {sql_round("CAST(sum(length(text)) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)}
         AS avg_chars
FROM documents
GROUP BY source
ORDER BY source
""",
)
def doc_token_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.portable import pround

    docs = load_table(spark, sf_dir, "documents").select("source", "text")

    def featurize(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            txt = b.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    pc.cast(pc.utf8_length(txt), pa.int64()),
                    pc.cast(pc.binary_length(txt), pa.int64()),
                    pc.cast(pc.count_substring(txt, " "), pa.int64()),
                ],
                names=["source", "n_chars", "n_bytes", "n_spaces"],
            )

    feats = docs.mapInArrow(
        featurize, schema="source string, n_chars long, n_bytes long, n_spaces long"
    )
    return (
        feats.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum("n_spaces").cast("long").alias("total_spaces"),
            pround(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)).cast("double"), 4
            ).alias("avg_chars"),
        )
        .orderBy("source")
    )
