"""Custom Python DataSources (Spark 4 DataSource API) — the polished form
of the decoder sources (SURVEY.md §2.1 S2/S4 note).

`ZipMembersDataSource` registers a real `spark.read.format("zipmembers")`
connector: one partition per archive (partition parallelism = archive
count), one output row per member. Compared to the mapInPandas helper in
io/sources.py this is the production packaging — schema declared up front,
partitions planned by the source, usable from SQL via `CREATE TABLE ...
USING zipmembers`.

`XportDataSource` is the same packaging for SAS XPORT behind the
pyreadstat import gate (decoder unavailable in this container).
"""

from __future__ import annotations

import io as _io
import zipfile
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ZIP_SCHEMA = StructType(
    [
        StructField("archive", StringType()),
        StructField("member", StringType()),
        StructField("size", LongType()),
        StructField("content", BinaryType()),
    ]
)


class _ArchivePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ZipMembersReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("zipmembers: 'path' option (or load(path)) is required")
        self.name_filter = options.get("memberfilter")

    def partitions(self) -> Sequence[InputPartition]:
        import glob

        paths = sorted(glob.glob(self.path))
        if not paths:
            raise FileNotFoundError(self.path)
        return [_ArchivePartition(p) for p in paths]

    def read(self, partition: _ArchivePartition) -> Iterator[tuple]:
        with open(partition.path, "rb") as f:
            blob = f.read()
        with zipfile.ZipFile(_io.BytesIO(blob)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                if self.name_filter and self.name_filter not in info.filename:
                    continue
                yield (partition.path, info.filename, info.file_size, zf.read(info))


class ZipMembersDataSource(DataSource):
    """`spark.read.format("zipmembers").option("memberFilter", "-pres")
    .load("/data/*.zip")`"""

    @classmethod
    def name(cls) -> str:
        return "zipmembers"

    def schema(self) -> StructType:
        return ZIP_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return ZipMembersReader(self.options)


class XportReader(DataSourceReader):
    """One partition per .xpt file; rows decoded via the shared
    `decode_xport_blob` helper (pyreadstat when present, pure-Python TS-140
    parser otherwise — whole-file decode per encoding, so a retry can never
    duplicate rows, and total decode failure raises instead of yielding
    empty output)."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("xport: 'path' option (or load(path)) is required")
        self.chunksize = int(options.get("chunksize", 4000))

    def partitions(self) -> Sequence[InputPartition]:
        import glob

        paths = sorted(glob.glob(self.path))
        if not paths:
            raise FileNotFoundError(self.path)
        return [_ArchivePartition(p) for p in paths]

    def read(self, partition: _ArchivePartition) -> Iterator[tuple]:
        from scripts_toolkit_spark.io.sources import decode_xport_blob

        with open(partition.path, "rb") as f:
            frame = decode_xport_blob(f.read(), self.chunksize)
        yield from frame.itertuples(index=False)


class XportDataSource(DataSource):
    """`spark.read.format("xport").schema(...).load("/data/*.xpt")` —
    schema is required (the source can't probe files at plan time from
    SQL; use io/sources.read_xport for probe-and-read)."""

    @classmethod
    def name(cls) -> str:
        return "xport"

    def reader(self, schema: StructType) -> DataSourceReader:
        return XportReader(self.options)


def register_datasources(spark) -> None:
    """Register all custom formats on a session (idempotent)."""
    spark.dataSource.register(ZipMembersDataSource)
    spark.dataSource.register(XportDataSource)
