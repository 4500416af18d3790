"""Custom batch connector via the Python Data Source API (Spark 4):
a StatCan-WDS-shaped CSV reader with byte-range split planning.

This is the pure-Python connector surface — `partitions()` plans
Hadoop-style byte splits on the driver, each executor task opens the
file independently and parses only its slice, so a big dump reads in
parallel without JVM-side code. Line ownership follows the classic
convention: a record belongs to the split containing its first byte;
a reader finishes the record that crosses its end; the next reader
discards the partial record it lands in. (Assumes no embedded
newlines inside quoted fields — true of WDS full-table dumps.)
"""

from __future__ import annotations

import csv
import io
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

WDS_PY_SCHEMA = (
    "ref_date string, geo string, vector string, coordinate string, "
    "value double, status string"
)
_COLS = ("REF_DATE", "GEO", "VECTOR", "COORDINATE", "VALUE", "STATUS")


class _ByteSplit(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class WdsCsvReader(DataSourceReader):
    def __init__(self, options: dict):
        if "path" not in options:
            raise ValueError("wds_py source requires .option('path', ...)")
        self.path = options["path"]
        self.n_splits = int(options.get("splits", "4"))

    def partitions(self) -> Sequence[_ByteSplit]:
        size = os.path.getsize(self.path)
        n = max(1, min(self.n_splits, size))
        step = size // n
        cuts = [i * step for i in range(n)] + [size]
        return [_ByteSplit(self.path, cuts[i], cuts[i + 1]) for i in range(n)]

    def read(self, split: _ByteSplit) -> Iterator[tuple]:
        with open(split.path, "rb") as f:
            header = None
            if split.start == 0:
                header = f.readline()  # header is consumed, not emitted
            else:
                # land mid-record; finish it (it belongs to the previous
                # split) so we start at the first record of our range
                f.seek(split.start - 1)
                f.readline()
            if header is None:
                with open(split.path, "rb") as hf:
                    header = hf.readline()
            names = next(csv.reader([header.decode("utf-8")]))
            idx = [names.index(c) for c in _COLS]
            while f.tell() < split.end:
                line = f.readline()
                if not line:
                    break
                row = next(csv.reader(io.StringIO(line.decode("utf-8"))))
                vals = [row[i] if i < len(row) else "" for i in idx]
                value = float(vals[4]) if vals[4] not in ("", None) else None
                yield (vals[0], vals[1], vals[2], vals[3], value, vals[5])


class WdsCsvDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wds_py"

    def schema(self) -> str:
        return WDS_PY_SCHEMA

    def reader(self, schema) -> WdsCsvReader:
        return WdsCsvReader(dict(self.options))
