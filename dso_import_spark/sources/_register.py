"""Shared once-per-session Python DataSource registration.

Extracted from the previously duplicated blocks in wkt_source.py and
tail_source.py (round-8 review). Two subtleties live here so they are
fixed in exactly one place:

- The DataSource class is cloudpickled to planner-side Python runner
  processes that do NOT see ``addPyFile``/sys.path — the defining
  module must be serialized BY VALUE or the remote import fails with
  ModuleNotFoundError only in plain driver sessions.
- Idempotence is keyed by ``sparkContext.applicationId`` (unique per
  context), never ``id(sparkContext)``: CPython reuses addresses after
  GC, so an id() key can silently skip registration for a brand-new
  session that happens to allocate its context at a recycled address
  (the next readStream would fail DATA_SOURCE_NOT_EXIST).
"""

from __future__ import annotations

_REGISTERED: set[tuple[str, str]] = set()


def register_once(spark, datasource_cls, module_name: str) -> None:
    """Idempotently register ``datasource_cls`` with this session,
    cloudpickling its defining module by value."""
    key = (spark.sparkContext.applicationId, datasource_cls.name())
    if key in _REGISTERED:
        return
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[module_name])
    spark.dataSource.register(datasource_cls)
    _REGISTERED.add(key)
