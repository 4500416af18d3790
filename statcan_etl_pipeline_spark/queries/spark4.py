"""Spark 4-native surface: the VARIANT type for semi-structured data
and SQL pipe syntax. Both compile to the same Catalyst plans as the
classic APIs — these queries pin that the engine exposes the modern
entry points, with the usual DuckDB oracles (JSON functions / plain
ANSI SQL) proving identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import sql_cents, sql_money_sum, sql_round
from ..registry import query

# ---------------------------------------------------------------------------
# VARIANT ingestion of events.props: parse once to the binary variant
# encoding, extract typed fields with variant_get. Unlike
# get_json_object (string re-parse per extraction), a variant column
# is parsed once and shredded columnar — the Spark-4 path for
# semi-structured ingestion at scale.
# ---------------------------------------------------------------------------


@query(
    "events_variant_stats",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_min,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_max,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
            F.sum("k").cast("long").alias("k_sum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4.0): the same logical plan as the nested
# classic form, written as a linear dataflow. The oracle is the
# classic ANSI rendering — identical results proves the pipe chain
# lowers to the same semantics.
# ---------------------------------------------------------------------------

_PIPE_SQL = f"""
FROM orders
|> WHERE o_orderstatus = 'F'
|> AGGREGATE CAST(count(*) AS BIGINT) AS n,
             {sql_money_sum("o_totalprice")} AS total
   GROUP BY o_orderpriority
|> WHERE n > 1
|> ORDER BY o_orderpriority
"""


@query(
    "pipe_syntax_priority_summary",
    oracle=f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       {sql_money_sum("o_totalprice")} AS total
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
HAVING count(*) > 1
ORDER BY o_orderpriority
""",
)
def pipe_syntax_priority_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_PIPE_SQL)


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4) in a LATERAL join: one input row fans out to N
# output rows from user Python. The UDTF enumerates a document's token
# array with 1-based positions — deliberately NOT re-tokenizing (the
# tokenizer stays JVM-side; the UDTF's job here is table generation).
# Python is the slow path, so the demo runs over a deterministic ~1%
# doc_id sample and is Arrow-batched. Oracle: DuckDB's parallel
# unnest + generate_subscripts.
# ---------------------------------------------------------------------------


def _udtf_oracle() -> str:
    from .text import _DOC_BASE_SQL

    return f"""
WITH base AS ({_DOC_BASE_SQL})
SELECT doc_id,
       CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
       unnest(toks) AS word
FROM base
WHERE doc_id % 97 = 0
ORDER BY doc_id, pos
"""


@query("udtf_token_positions", oracle=_udtf_oracle())
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    from .text import _doc_base

    @udtf(returnType="pos: long, word: string", useArrow=True)
    class EnumTokens:
        def eval(self, toks):  # noqa: ANN001 — UDTF contract
            for i, w in enumerate(toks or []):
                yield (i + 1, w)

    spark.udtf.register("enum_tokens", EnumTokens)
    base = _doc_base(spark, sf_dir).filter(F.col("doc_id") % 97 == 0)
    base.select("doc_id", "toks").createOrReplaceTempView("udtf_doc_toks")
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.word
        FROM udtf_doc_toks, LATERAL enum_tokens(toks) t
        ORDER BY doc_id, pos
        """
    )


# ---------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL (Spark 3.4+/4): every non-aggregate
# SELECT item becomes a grouping key — kills the classic drift bug
# where a new projected column silently changes grouping. DuckDB
# speaks the same dialect, so the oracle IS the same modern SQL.
# ---------------------------------------------------------------------------

_GBA_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       {sql_money_sum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY ALL
ORDER BY ALL
"""


@query("group_by_all_revenue", oracle=_GBA_SQL)
def group_by_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GBA_SQL)


# ---------------------------------------------------------------------------
# Parameterized SQL (Spark 3.4+/4): named parameters bind server-side
# (`:min_total`), so values never get string-interpolated into the
# query — the injection-safe surface a pipeline templater should use.
# The oracle is the same query with the literals inlined.
# ---------------------------------------------------------------------------

_PARAM_MIN_TOTAL = 250_000.0
_PARAM_TOP_N = 50


@query(
    "parameterized_sql_topn",
    oracle=f"""
SELECT o_orderkey, o_orderpriority,
       {sql_round("o_totalprice", 2)} AS total
FROM orders
WHERE o_totalprice >= {_PARAM_MIN_TOTAL!r}
ORDER BY o_totalprice DESC, o_orderkey
LIMIT {_PARAM_TOP_N}
""",
)
def parameterized_sql_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_orderpriority,
               {sql_round("o_totalprice", 2)} AS total
        FROM orders
        WHERE o_totalprice >= :min_total
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT :top_n
        """,
        args={"min_total": _PARAM_MIN_TOTAL, "top_n": _PARAM_TOP_N},
    )


# ---------------------------------------------------------------------------
# Lateral column aliases (Spark 3.4+/4): later SELECT items reference
# earlier aliases in the SAME select list — derived-metric chains
# without nested subqueries. DuckDB resolves the same way, so both
# engines run the identical chain.
# ---------------------------------------------------------------------------

_LCA_SQL = f"""
SELECT l_returnflag,
       CAST(sum({{RC}}) AS BIGINT) AS rev_c,
       CAST(sum({{CC}}) AS BIGINT) AS cost_c,
       rev_c - cost_c AS margin_c,
       {sql_round("(CAST(margin_c AS DOUBLE) / CAST(rev_c AS DOUBLE))", 6)} AS margin_ratio
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


_LCA_FILLED = _LCA_SQL.replace(
    "{RC}", sql_cents("l_extendedprice * (1 - l_discount)")
).replace("{CC}", sql_cents("l_extendedprice * (1 - l_discount) * (1 - l_tax)"))


@query("lateral_alias_margin", oracle=_LCA_FILLED)
def lateral_alias_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_LCA_FILLED)


# ---------------------------------------------------------------------------
# Collations (Spark 4): case-insensitive GROUP BY via COLLATE
# UTF8_LCASE — the engine-level answer to "normalize casing before
# every comparison". Segment casing is deliberately mangled three ways
# per customer key; grouping on the collated column collapses the
# variants (n_case_variants = 3 proves the collation did the work, and
# the inner count(DISTINCT seg COLLATE UTF8_BINARY) pins that the raw
# binary values really differed). Oracle: DuckDB lower()-keyed
# grouping — identical semantics for ASCII casing.
# ---------------------------------------------------------------------------


@query(
    "collated_segment_rollup",
    oracle="""
WITH mangled AS (
  SELECT CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
              WHEN c_custkey % 3 = 1 THEN
                upper(substring(lower(c_mktsegment), 1, 1))
                || substring(lower(c_mktsegment), 2)
              ELSE c_mktsegment END AS seg
  FROM customer
)
SELECT lower(seg) AS segment_ci,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT seg) AS BIGINT) AS n_case_variants
FROM mangled
GROUP BY lower(seg)
ORDER BY segment_ci
""",
)
def collated_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
WITH mangled AS (
  SELECT CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
              WHEN c_custkey % 3 = 1 THEN initcap(lower(c_mktsegment))
              ELSE c_mktsegment END AS seg
  FROM customer
)
SELECT lower(seg COLLATE UTF8_LCASE) AS segment_ci,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT seg COLLATE UTF8_BINARY) AS BIGINT) AS n_case_variants
FROM mangled
GROUP BY seg COLLATE UTF8_LCASE
ORDER BY segment_ci
""")
