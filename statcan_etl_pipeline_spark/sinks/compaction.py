"""Small-file compaction + z-order layout — table maintenance for
parquet data lakes (the Delta/Iceberg OPTIMIZE / ZORDER BY shape,
re-expressed with plain Spark primitives).

Why it matters at 100 TB: a streaming or per-batch writer leaves
thousands of KB-sized files; every downstream scan then pays one task
+ one footer read per file, and the NameNode/object-store listing cost
dominates. Compaction rewrites a directory to ~`target_bytes` files.
Z-ordering additionally makes file-level min/max stats selective on
MULTIPLE columns at once (bit-interleaved space-filling curve), so
point/range filters on any z-column skip most files entirely.

File listing goes through the JVM Hadoop FileSystem API, so the same
code works on HDFS / S3A / local paths.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, size) for every data file under `path`, via Hadoop FS
    (works on any supported filesystem, not just local)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out: list[tuple[str, int]] = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not st.isFile() or name.startswith("_") or name.startswith("."):
            continue
        out.append((st.getPath().toString(), int(st.getLen())))
    return out


def compaction_plan(
    files: list[tuple[str, int]], target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    total = sum(sz for _, sz in files)
    n_target = max(1, math.ceil(total / target_bytes))
    return {
        "n_files": len(files),
        "total_bytes": total,
        "target_bytes": target_bytes,
        "target_files": n_target,
        "small_files": sum(1 for _, sz in files if sz < target_bytes // 2),
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    partition_cols: list[str] | None = None,
) -> dict:
    """Rewrite `path` into ~target-size files at `out_path`; returns
    before/after stats. With `partition_cols`, the rewrite keeps the
    hive layout and compacts within partitions (repartition by the
    partition columns so each output partition dir gets whole tasks).

    Compacting in place on object stores needs a commit protocol
    (write temp + atomic swap); this writes to a NEW path and leaves
    the swap to the caller/catalog, which is the safe default.
    """
    before = compaction_plan(list_data_files(spark, path), target_bytes)
    df = spark.read.parquet(path)
    n = before["target_files"]
    if partition_cols:
        # Repartitioning by the partition columns alone would collapse
        # every hive partition into a single task/file no matter its
        # size. Instead, estimate each partition's bytes from its row
        # share, derive a per-partition file count, and salt rows within
        # the partition over that many groups so oversized partitions
        # still split into ~target_bytes files.
        pcols = list(partition_cols)
        counts = df.groupBy(*pcols).agg(F.count(F.lit(1)).alias("__rows"))
        total_rows = F.sum("__rows").over(W.partitionBy())
        counts = counts.withColumn(
            "__files",
            F.greatest(
                F.lit(1),
                F.ceil(
                    F.col("__rows")
                    * F.lit(float(before["total_bytes"]))
                    / total_rows
                    / F.lit(float(target_bytes))
                ),
            ),
        )
        # NULL partition values are legal hive partitions
        # (__HIVE_DEFAULT_PARTITION__); a null-unsafe equi-join would
        # silently DROP those rows from the compacted output, so the
        # broadcast join must be eqNullSafe on every partition column.
        cdf = counts.drop("__rows").alias("__c")
        ddf = df.alias("__d")
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"__d.{p}").eqNullSafe(F.col(f"__c.{p}")) for p in pcols],
        )
        # REPRODUCIBLE salt (a monotonically_increasing_id salt is
        # partition-layout-dependent, so a task retry could re-salt rows
        # differently and the output file layout would drift run-to-run):
        #   1. __salt0 = xxhash64(all hashable columns) mod __files —
        #      content-derived, so distinct rows spread deterministically.
        #      Map columns are excluded (unhashable for xxhash64).
        #   2. EXACT duplicates all share __salt0, so a duplicate-heavy
        #      partition could blow one file past target; a row_number
        #      within the (pcols, __salt0) bucket — ordered by the row
        #      hash — splits them round-robin. Duplicates are
        #      interchangeable, so the tie-break among them cannot change
        #      the multiset of any output file: the layout is stable.
        #      The window is bounded to ~1/__files of a hive partition,
        #      not the whole partition, so no single-reducer skew.
        from pyspark.sql.types import MapType

        hashable = [
            c for c, f in zip(df.columns, df.schema.fields)
            if not isinstance(f.dataType, MapType)
        ]
        row_hash = (
            F.xxhash64(*[F.col(c) for c in hashable])
            if hashable
            else F.lit(0).cast("long")
        )
        joined = (
            ddf.join(F.broadcast(cdf), cond)
            .select(*[F.col(f"__d.{x}") for x in df.columns], F.col("__c.__files"))
            .withColumn("__rhash", row_hash)
            .withColumn("__salt0", F.pmod(F.col("__rhash"), F.col("__files")))
        )
        w_dup = W.partitionBy(*pcols, "__salt0").orderBy("__rhash")
        salted = joined.withColumn(
            "__salt",
            F.pmod(
                F.col("__salt0") + F.row_number().over(w_dup), F.col("__files")
            ),
        ).drop("__rhash", "__salt0")
        (
            salted.repartition(n, *[F.col(c) for c in pcols], F.col("__salt"))
            .drop("__files", "__salt")
            .write.mode("overwrite")
            .partitionBy(*pcols)
            .parquet(out_path)
        )
    else:
        df.repartition(n).write.mode("overwrite").parquet(out_path)
    after = compaction_plan(list_data_files(spark, out_path), target_bytes)
    return {"before": before, "after": after}


# --- z-order ----------------------------------------------------------------

_ZBITS = 21  # 2 cols × 21 bits = 42-bit z-value, fits a long


def _norm_to_bits(col: Column, lo: Column, hi: Column, bits: int = _ZBITS) -> Column:
    """Rank-free normalization of a numeric column onto [0, 2^bits):
    (x - min) scaled by the column range. Monotonic, cheap, and good
    enough for min/max-stat file skipping (a rank-based variant would
    handle heavy skew better at the cost of an extra pass)."""
    span = (hi - lo).cast("double")
    unit = (col.cast("double") - lo.cast("double")) / F.when(span > 0, span).otherwise(
        F.lit(1.0)
    )
    max_code = F.lit((1 << bits) - 1)
    return F.least(F.floor(unit * max_code).cast("long"), max_code)


def _interleave2(a: Column, b: Column, bits: int = _ZBITS) -> Column:
    """Bit-interleave two `bits`-wide codes into one z-value (a gets the
    even bit positions, b the odd)."""
    parts = []
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        parts.append(F.shiftleft(bit_a, 2 * i))
        parts.append(F.shiftleft(bit_b, 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def zorder_value(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Attach a `_zvalue` column interleaving the two columns' range-
    normalized codes. One extra aggregation pass computes the global
    min/max (broadcast scalar — no shuffle of the fact table)."""
    stats = df.agg(
        F.min(col_a).alias("_lo_a"),
        F.max(col_a).alias("_hi_a"),
        F.min(col_b).alias("_lo_b"),
        F.max(col_b).alias("_hi_b"),
    )
    joined = df.crossJoin(F.broadcast(stats))
    za = _norm_to_bits(F.col(col_a), F.col("_lo_a"), F.col("_hi_a"))
    zb = _norm_to_bits(F.col(col_b), F.col("_lo_b"), F.col("_hi_b"))
    return joined.withColumn("_zvalue", _interleave2(za, zb)).drop(
        "_lo_a", "_hi_a", "_lo_b", "_hi_b"
    )


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Cluster rows along the z-curve, then range-partition into
    `n_files` so each output file covers a tight (col_a, col_b)
    rectangle — filters on EITHER column then skip most files via
    parquet min/max stats."""
    z = zorder_value(df, col_a, col_b)
    (
        z.repartitionByRange(n_files, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode(mode)
        .parquet(path)
    )
