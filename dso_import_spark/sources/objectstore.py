"""Object-store fetch with a freshness cache (S2).

Spark re-expression of the reference's Swift download task
(/root/reference/src/dso_import/batch/objectstore.py:43-69): fetch a
remote object into a local data directory, skipping the download when
a local copy newer than ``max_age_hours`` exists (:57-62), optionally
restoring the remote mtime on the local file.

This is driver-side ingestion plumbing, not a distributed operator —
executors read the *landed* files via ``spark.read``. Generic URL
transport (file:// for tests, http(s):// for real stores) replaces the
OpenStack-specific client; auth-token handling is out of scope.
"""

from __future__ import annotations

import os
import shutil
import time
import urllib.parse
import urllib.request

DEFAULT_MAX_AGE_HOURS = 24.0


def _stamp_path(path: str) -> str:
    return path + ".__fetched"


def is_fresh(path: str, max_age_hours: float = DEFAULT_MAX_AGE_HOURS) -> bool:
    """True if a local copy exists and was DOWNLOADED within the TTL
    (objectstore.py:57-62).

    Freshness reads the sidecar download stamp, not the file mtime:
    ``restore_mtime=True`` sets the file mtime to the REMOTE object's
    Last-Modified, so a static extract last modified months ago would
    look permanently stale by its own mtime and re-download on every
    run (round-8 review). Falls back to the file mtime for caches
    landed before the stamp existed."""
    if not os.path.exists(path):
        return False
    try:
        fetched_at = os.path.getmtime(_stamp_path(path))
    except OSError:
        try:
            fetched_at = os.path.getmtime(path)
        except OSError:
            return False
    return time.time() - fetched_at < max_age_hours * 3600


def fetch(
    url: str,
    dest_dir: str,
    *,
    max_age_hours: float = DEFAULT_MAX_AGE_HOURS,
    restore_mtime: bool = True,
) -> str:
    """Download ``url`` into ``dest_dir`` unless a fresh copy exists.

    Returns the local path. ``restore_mtime`` applies the source's
    Last-Modified (or file mtime for file:// URLs) to the local copy,
    mirroring objectstore.py:52-56 so the freshness check reflects the
    *remote* object's age semantics.
    """
    name = os.path.basename(urllib.parse.urlparse(url).path)
    if not name:
        raise ValueError(f"cannot derive a file name from {url!r}")
    local = os.path.join(dest_dir, name)
    if is_fresh(local, max_age_hours):
        return local
    os.makedirs(dest_dir, exist_ok=True)
    tmp = f"{local}.__part"
    with urllib.request.urlopen(url) as resp, open(tmp, "wb") as out:
        shutil.copyfileobj(resp, out)
        mtime = _source_mtime(resp, url)
    os.replace(tmp, local)
    # download-time stamp: the freshness TTL measures time since FETCH,
    # independent of the (possibly ancient) remote mtime restored below
    with open(_stamp_path(local), "w"):
        pass
    if restore_mtime and mtime is not None:
        os.utime(local, (mtime, mtime))
    return local


def _source_mtime(resp, url: str) -> float | None:
    last_mod = resp.headers.get("Last-Modified") if resp.headers else None
    if last_mod:
        from email.utils import parsedate_to_datetime

        try:
            return parsedate_to_datetime(last_mod).timestamp()
        except (TypeError, ValueError):
            return None
    parsed = urllib.parse.urlparse(url)
    if parsed.scheme == "file":
        try:
            return os.path.getmtime(urllib.request.url2pathname(parsed.path))
        except OSError:
            return None
    return None
