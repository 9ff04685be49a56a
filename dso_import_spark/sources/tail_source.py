"""Append-tailing log stream as a Spark 4 Python streaming DataSource.

Spark's built-in file stream source tracks whole FILES: a file is
ingested once, at the size it had when first seen, and later appends to
it are invisible. Real event logs (GOB delivery drops, service logs)
are append-only files — the natural connector tails them. This source
implements that as a ``DataSourceStreamReader``:

- an offset is a JSON dict ``{path: committed_byte_position}``;
- ``latestOffset`` stats the directory — current size per file;
- each micro-batch plans one ``InputPartition`` per file that grew,
  reading exactly ``[start, end)`` bytes appended since the last batch;
- executors open/seek/parse only their slice (same discipline as the
  byte-range batch WKT source in wkt_source.py).

Exactly-once: offsets live in the query checkpoint, so a restarted
query resumes from the committed byte position — appended lines are
read once, never re-read, with no state outside the checkpoint.

Appends must be line-atomic (each write ends in ``\\n``) — true of
O_APPEND log writers; a torn final line without a newline is left for
the next batch rather than half-parsed.

Record format: ``event_id|user_id|event_type|value`` per line.

Usage::

    register_tail_source(spark)
    df = (spark.readStream.format("eventtail").load("/var/log/events"))
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _Tail(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _complete_size(path: str) -> int:
    """Bytes of the file covered by whole (newline-terminated) lines —
    a torn trailing line stays unread until its newline lands.
    A file rotated away between listing and stat reads as 0 bytes
    (it simply stops advancing) instead of crashing the stream."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return 0
    if size == 0:
        return 0
    with open(path, "rb") as f:
        f.seek(size - 1)
        if f.read(1) == b"\n":
            return size
        # walk back to the last newline; the tail after it is torn
        pos = size - 1
        chunk = 4096
        while pos > 0:
            back = min(chunk, pos)
            f.seek(pos - back)
            buf = f.read(back)
            nl = buf.rfind(b"\n")
            if nl >= 0:
                return pos - back + nl + 1
            pos -= back
        return 0


class TailStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("eventtail source requires .load('<dir>')")

    def _files(self) -> list[str]:
        if os.path.isfile(self.path):
            return [self.path]
        out = []
        for fn in sorted(os.listdir(self.path)):
            full = os.path.join(self.path, fn)
            if os.path.isfile(full) and not fn.startswith(("_", ".")):
                out.append(full)
        return out

    def initialOffset(self) -> dict:
        # start of every currently-present file: replay from byte 0
        return {p: 0 for p in self._files()}

    def latestOffset(self) -> dict:
        return {p: _complete_size(p) for p in self._files()}

    def partitions(self, start: dict, end: dict) -> Sequence[_Tail]:
        parts = [
            _Tail(p, int(start.get(p, 0)), int(e))
            for p, e in end.items()
            if int(e) > int(start.get(p, 0))
        ]
        # a batch with no growth still needs one (empty) partition —
        # Spark requires a non-empty plan
        return parts or [_Tail(next(iter(end), ""), 0, 0)]

    def read(self, partition: _Tail) -> Iterator[tuple]:
        if partition.end <= partition.start or not partition.path:
            return
        try:
            f = open(partition.path, "rb")
        except OSError:
            return  # rotated away after the offset was planned
        with f:
            f.seek(partition.start)
            while f.tell() < partition.end:
                line = f.readline()
                if not line:
                    break
                text = line.decode("utf-8", "replace").rstrip("\r\n")
                if not text:
                    continue
                # a malformed line must never be a poison pill: the
                # checkpoint would replay the same byte range forever.
                # Skip it (rejected-line discipline, like formats.py);
                # offsets still advance past it.
                try:
                    eid, uid, etype, value = text.split("|", 3)
                    # empty value field = NULL (nullable double column)
                    v = float(value) if value else None
                    yield (int(eid), int(uid), etype, v)
                except ValueError:
                    continue

    def commit(self, end: dict) -> None:
        # offsets are durable in the checkpoint; nothing external to ack
        pass


class TailDataSource(DataSource):
    """``spark.readStream.format("eventtail")`` — appended lines only."""

    @classmethod
    def name(cls) -> str:
        return "eventtail"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, value double"

    def streamReader(self, schema) -> TailStreamReader:
        return TailStreamReader(self.options)


_REGISTERED: set[int] = set()


def register_tail_source(spark) -> None:
    """Idempotently register the format with this session."""
    key = id(spark.sparkContext)
    if key not in _REGISTERED:
        # the DataSource class is cloudpickled to Python worker
        # processes that may not have this package on sys.path (the
        # planner-side data source runner does not see addPyFile) —
        # serialize this module by VALUE so no remote import happens
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
        spark.dataSource.register(TailDataSource)
        _REGISTERED.add(key)
