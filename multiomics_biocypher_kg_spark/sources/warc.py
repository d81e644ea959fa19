"""WARC (Web ARChive) support: a deterministic writer plus a Python
Data Source (``pyspark.sql.datasource``, the Spark 4 API) reader —
the container format Common-Crawl-style corpora actually arrive in
(north-star input: "Iceberg corpus of Common-Crawl-style web
pages"; the WARC scan is the step that lands crawl archives into
that table).

Reader design for 100 TB:
- one ``InputPartition`` per .warc file — a crawl delivers tens of
  thousands of segment files, so file-granular partitions give the
  scheduler its parallelism exactly like the built-in file sources;
- records are parsed STREAMING per partition (header scan +
  Content-Length-exact body consume — never a whole-file regex
  split), constant memory per record;
- the reader yields plain tuples; Spark's Arrow batching moves them
  JVM-side. A Python source is the right tool here precisely
  because WARC is a format the built-in readers cannot express —
  the "custom operators" escape hatch, applied to a scan.

The record layout written/parsed is the WARC/1.0 response shape
(version line, named headers, Content-Length, CRLF CRLF, body,
CRLF CRLF) — the same framing real crawl archives use, so the
parser works on genuine WARC response records with these headers.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

WARC_SCHEMA = "url string, warc_date string, content binary"

_CRLF = b"\r\n"


def write_warc_files(
    records: list[tuple[str, str, bytes]], out_dir: str, n_files: int = 8
) -> list[str]:
    """Write (url, warc_date, body) records round-robin into
    ``n_files`` WARC/1.0 files. Deterministic: record i goes to file
    i % n_files in input order."""
    os.makedirs(out_dir, exist_ok=True)
    paths = [
        os.path.join(out_dir, f"part-{i:05d}.warc") for i in range(n_files)
    ]
    handles = [open(p, "wb") for p in paths]
    try:
        for i, (url, date, body) in enumerate(records):
            _write_warc_record(handles[i % n_files], url, date, body)
    finally:
        for h in handles:
            h.close()
    return paths


def _write_warc_record(h, url: str, date: str, body: bytes) -> None:
    h.write(b"WARC/1.0" + _CRLF)
    h.write(b"WARC-Type: response" + _CRLF)
    h.write(b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF)
    h.write(b"WARC-Date: " + date.encode("ascii") + _CRLF)
    h.write(b"Content-Length: " + str(len(body)).encode() + _CRLF)
    h.write(_CRLF)
    h.write(body)
    h.write(_CRLF + _CRLF)


def write_warc_files_distributed(df, out_dir: str, n_files: int = 8) -> None:
    """Write a DataFrame of ``(file_id int, sort_key long, url string,
    warc_date string, body binary)`` into ``n_files`` WARC/1.0 files
    WITHOUT collecting to the driver: one shuffle co-locates each
    file's records (``repartition(n_files, file_id)`` — a file_id
    lands in exactly one partition, a partition may own several
    files), ``sortWithinPartitions`` pins in-file record order, and
    each executor task streams its files out with constant memory.
    This is the archive-synthesis shape that survives any corpus
    size; the driver-side ``write_warc_files`` remains only for
    micro-fixtures in unit tests. Executors write to ``out_dir``
    directly (shared storage on a real cluster; local fs here)."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def _write_partition(rows) -> None:
        handles: dict[int, object] = {}
        try:
            for r in rows:
                fid = int(r["file_id"])
                h = handles.get(fid)
                if h is None:
                    p = os.path.join(out_dir, f"part-{fid:05d}.warc")
                    h = handles[fid] = open(p, "wb")
                _write_warc_record(h, r["url"], r["warc_date"], bytes(r["body"]))
        finally:
            for h in handles.values():
                h.close()

    (
        df.select("file_id", "sort_key", "url", "warc_date", "body")
        .repartition(n_files, F.col("file_id"))
        .sortWithinPartitions("file_id", "sort_key")
        .foreachPartition(_write_partition)
    )


def parse_warc_file(path: str) -> Iterator[tuple[str, str, bytes]]:
    """Stream (url, warc_date, body) from one WARC file.

    Proper framing parse: read the version line, collect headers
    until the blank line, consume EXACTLY Content-Length body bytes,
    then the record separator — bodies may contain anything
    (including 'WARC/1.0'), so splitting on markers would be wrong.
    """
    with open(path, "rb") as f:
        while True:
            line = f.readline()
            if not line:
                return
            if line.strip() == b"":
                continue
            if not line.startswith(b"WARC/"):
                raise ValueError(f"{path}: expected WARC version line, got {line!r}")
            headers: dict[str, str] = {}
            while True:
                hl = f.readline()
                if hl in (_CRLF, b"\n", b""):
                    break
                k, _, v = hl.decode("utf-8").partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers["content-length"])
            body = f.read(length)
            if len(body) != length:
                raise ValueError(f"{path}: truncated record body")
            yield (
                headers.get("warc-target-uri", ""),
                headers.get("warc-date", ""),
                body,
            )


try:  # pyspark>=4 Python Data Source API
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class WarcFilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class WarcReader(DataSourceReader):
        def __init__(self, options):
            self._path = options.get("path")
            if not self._path:
                raise ValueError("warc source requires option 'path'")

        def partitions(self):
            paths = sorted(glob.glob(os.path.join(self._path, "*.warc")))
            if not paths:
                raise FileNotFoundError(
                    f"no .warc files under {self._path!r}"
                )
            return [WarcFilePartition(p) for p in paths]

        def read(self, partition):
            yield from parse_warc_file(partition.path)

    class WarcDataSource(DataSource):
        """``spark.read.format("warc").option("path", dir)``."""

        @classmethod
        def name(cls) -> str:
            return "warc"

        def schema(self) -> str:
            return WARC_SCHEMA

        def reader(self, schema):
            return WarcReader(self.options)

    def register_warc_source(spark) -> None:
        """Idempotent registration of the 'warc' format."""
        spark.dataSource.register(WarcDataSource)

except ImportError:  # pragma: no cover - pyspark<4 fallback, declared

    def register_warc_source(spark) -> None:
        raise NotImplementedError(
            "the warc data source needs pyspark>=4 (pyspark.sql.datasource)"
        )
