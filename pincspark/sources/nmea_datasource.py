"""The NMEA archive as a REGISTERED Spark data source (Spark 4 Python
DataSource API): ``spark.read.format("nmea").load(path)``.

`nmea_source.read_archive` parses archives through text-scan +
expressions; this is the same format surfaced the way a platform team
ships it — a pluggable named source with its own schema, file-level
partition planning, and per-file line numbering. One InputPartition per
archive file gives cluster-wide parallel ingest (a real crawl is many
files); ``line_idx`` is the line number WITHIN its file, so the batch
reassembly adjacency key can never be cut by a Spark split boundary
(strictly stronger than read_archive's monotonically_increasing_id,
whose groups a split boundary can cut — see D12).

Reference parity: ais_analysis.py:318-321 reads one unsplit stream; this
source preserves that per-file adjacency guarantee at any parallelism.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _ArchiveFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


class NmeaArchiveReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("nmea source requires a path: .load('<dir or glob>')")

    def partitions(self):
        p = self._path
        if os.path.isdir(p):
            files = sorted(
                f
                for f in glob.glob(os.path.join(p, "**", "*"), recursive=True)
                if os.path.isfile(f)
            )
        else:
            files = sorted(f for f in glob.glob(p) if os.path.isfile(f))
        if not files:
            raise FileNotFoundError(f"nmea source matched no files under {p!r}")
        return [_ArchiveFile(f) for f in files]

    def read(self, partition: _ArchiveFile):
        with open(partition.path, "rb") as fh:
            for i, raw in enumerate(fh):
                line = raw.decode("utf-8", errors="replace").rstrip("\r\n")
                if not line:
                    continue
                bang = line.find("!")
                if bang < 0:
                    continue
                yield (partition.path, i, line[:bang], line[bang:])


class NmeaArchiveDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "nmea"

    def schema(self) -> str:
        return "path string, line_idx bigint, tagblock string, sentence string"

    def reader(self, schema) -> NmeaArchiveReader:
        return NmeaArchiveReader(self.options)


def register(spark) -> None:
    """Make ``spark.read.format('nmea')`` available on this session."""
    spark.dataSource.register(NmeaArchiveDataSource)
