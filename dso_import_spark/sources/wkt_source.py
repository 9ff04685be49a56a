"""Pipe-delimited WKT file source as a Spark 4 Python DataSource
(SURVEY.md §2.1 S3).

The reference reads ``id|WKT`` text files with a driver-side loop —
``process_wkt`` splits each line on ``|`` and hands ``(id, geometry)``
to a row callback (/root/reference/src/dso_import/batch/geo.py:20-32).
That loop is single-process and unsplittable by construction.

Spark-first shape: the format is newline-delimited text, which IS
byte-range splittable with the classic Hadoop TextInputFormat rule —
every reader except the first skips forward past its first newline, and
every reader finishes the line that straddles its end offset. Each
record is then read by exactly one partition with no coordination. We
implement that rule in a pure-Python ``DataSource`` (Spark 4 API): the
driver plans byte-range ``InputPartition``s; executors open the file,
seek, and parse only their slice. On a cluster the same planner applies
per file, so a directory of WKT extracts fans out to
``files × partitions_per_file`` tasks.

Geometry stays as raw WKT text — type coercion is G1's job
(functions/geometry.coerce_wkt), matching the reference's split between
``process_wkt`` and ``get_geotype``.

Usage::

    register_wkt_source(spark)
    df = (spark.read.format("wkt")
          .option("numPartitions", 8)
          .load("/data/panden.wkt"))   # -> id: string, wkt: string
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_DEFAULT_PARTITIONS = 8


class _Slice(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class WktDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wkt source requires a path: .load('/file.wkt')")
        self.delimiter = options.get("delimiter", "|")
        self.num_partitions = int(options.get("numPartitions", _DEFAULT_PARTITIONS))

    def partitions(self) -> Sequence[_Slice]:
        """Plan byte-range splits per file (directory → every file)."""
        paths = []
        if os.path.isdir(self.path):
            for fn in sorted(os.listdir(self.path)):
                full = os.path.join(self.path, fn)
                if os.path.isfile(full) and not fn.startswith(("_", ".")):
                    paths.append(full)
        else:
            paths.append(self.path)
        slices: list[_Slice] = []
        for p in paths:
            size = os.path.getsize(p)
            n = max(1, min(self.num_partitions, size))  # ≥1 byte per slice
            step = size // n
            bounds = [i * step for i in range(n)] + [size]
            slices.extend(
                _Slice(p, bounds[i], bounds[i + 1])
                for i in range(n)
                if bounds[i + 1] > bounds[i] or i == 0
            )
        return slices

    def read(self, partition: _Slice) -> Iterator[tuple[str, str]]:
        """TextInputFormat rule: skip the first partial line unless at
        offset 0; keep reading past ``end`` until the current line
        completes. Runs executor-side; only this slice is scanned."""
        delim = self.delimiter
        with open(partition.path, "rb") as f:
            if partition.start == 0:
                f.seek(0)
            else:
                # a line is owned by the slice its FIRST byte falls in:
                # if the byte before our start is a newline, the line
                # beginning at start is ours; otherwise the straddling
                # line belongs to the previous slice — skip its tail
                f.seek(partition.start - 1)
                if f.read(1) != b"\n":
                    f.readline()
            while f.tell() < partition.end:
                line = f.readline()
                if not line:
                    break
                text = line.decode("utf-8").rstrip("\r\n")
                if not text:
                    continue
                ident, _, wkt = text.partition(delim)
                yield (ident, wkt if wkt else None)


class _WktCommit(WriterCommitMessage):
    """Per-task commit message: the invisible temp file the task wrote
    and its row count. Nothing a task writes is readable until the
    driver's commit() publishes it."""

    def __init__(self, tmp_name: str, n_rows: int):
        self.tmp_name = tmp_name
        self.n_rows = n_rows


class WktDataSourceWriter(DataSourceWriter):
    """Two-phase-commit writer for the ``id|WKT`` format (Spark 4
    Python DataSource write path).

    Protocol — the same shape every exactly-once file committer uses:
    - ``write`` (executor, per task): rows go to a dot-prefixed temp
      file the reader ignores; the task returns its temp name + count.
      A failed/retried task leaves only an orphaned temp, never a
      visible partial output.
    - ``commit`` (driver, once, only if EVERY task succeeded): delete
      any previously published part files (overwrite semantics),
      rename each temp to its final ``part-NNNNN.wkt`` name, then
      write the ``_SUCCESS`` manifest with the total row count —
      readers that check the manifest never observe a half-published
      table.
    - ``abort`` (driver, on any failure): remove the temps; the
      previous committed state stays fully intact.

    Local-filesystem rename is the publish primitive here (this
    container); on object storage the identical protocol publishes by
    manifest instead of rename — same task/driver split, same
    messages.
    """

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wkt sink requires a path: .save('/dir')")
        self.delimiter = options.get("delimiter", "|")
        if not overwrite:
            raise ValueError(
                "wkt sink supports mode('overwrite') only — append to a "
                "pipe-file table is a new write with a merged manifest"
            )

    def write(self, iterator) -> _WktCommit:
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp_name = f".part-{uuid.uuid4().hex}.wkt.tmp"
        n = 0
        with open(
            os.path.join(self.path, tmp_name), "w", encoding="utf-8"
        ) as f:
            for row in iterator:
                ident, wkt = row[0], row[1]
                f.write(f"{ident}{self.delimiter}{wkt if wkt is not None else ''}\n")
                n += 1
        return _WktCommit(tmp_name, n)

    def commit(self, messages) -> None:
        # retract the manifest FIRST: from here until the new manifest
        # lands the table is officially unpublished, so a manifest-
        # checking reader can never observe the destructive phase
        # under a stale _SUCCESS claiming the old row count
        manifest = os.path.join(self.path, "_SUCCESS")
        if os.path.exists(manifest):
            os.remove(manifest)
        for fn in sorted(os.listdir(self.path)):
            if fn.endswith(".wkt") and fn.startswith("part-"):
                os.remove(os.path.join(self.path, fn))
        total = 0
        seq = 0
        for m in messages:
            if m is None:
                continue
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, f"part-{seq:05d}.wkt"),
            )
            total += m.n_rows
            seq += 1
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except OSError:
                pass


class WktDataSource(DataSource):
    """``spark.read.format("wkt")`` — schema is fixed (id, wkt)."""

    @classmethod
    def name(cls) -> str:
        return "wkt"

    def schema(self) -> str:
        return "id string, wkt string"

    def reader(self, schema) -> WktDataSourceReader:
        return WktDataSourceReader(self.options)

    def writer(self, schema, overwrite: bool) -> "WktDataSourceWriter":
        if len(schema.fields) != 2:
            raise ValueError(
                f"wkt sink expects exactly (id, wkt) columns, got {schema}"
            )
        return WktDataSourceWriter(self.options, overwrite)


def register_wkt_source(spark) -> None:
    """Idempotently register the format with this session (shared
    helper: by-value pickling + applicationId-keyed idempotence)."""
    from dso_import_spark.sources._register import register_once

    register_once(spark, WktDataSource, __name__)
