"""Object-store fetch utility: freshness cache + mtime restore."""

from __future__ import annotations

import os
import time

from dso_import_spark.sources.objectstore import fetch, is_fresh


def _make_src(tmp_path, name="data.csv", content=b"a;b\n1;2\n"):
    src = tmp_path / "remote" / name
    src.parent.mkdir(exist_ok=True)
    src.write_bytes(content)
    return src


def test_fetch_downloads_and_restores_mtime(tmp_path):
    src = _make_src(tmp_path)
    old = time.time() - 90000  # remote object is ~25h old
    os.utime(src, (old, old))
    dest = tmp_path / "data"
    local = fetch(src.as_uri(), str(dest))
    assert open(local, "rb").read() == b"a;b\n1;2\n"
    assert abs(os.path.getmtime(local) - old) < 2  # mtime restored


def test_fresh_copy_skips_download(tmp_path):
    src = _make_src(tmp_path)
    dest = tmp_path / "data"
    local = fetch(src.as_uri(), str(dest), restore_mtime=False)
    src.write_bytes(b"CHANGED")
    # fresh local copy → no re-download, old content kept
    assert fetch(src.as_uri(), str(dest), restore_mtime=False) == local
    assert open(local, "rb").read() == b"a;b\n1;2\n"


def test_stale_copy_refetches(tmp_path):
    src = _make_src(tmp_path)
    dest = tmp_path / "data"
    local = fetch(src.as_uri(), str(dest), restore_mtime=False)
    # staleness = time since DOWNLOAD: age the sidecar fetch stamp
    # (the file mtime no longer drives freshness — see below)
    old = time.time() - 90000
    os.utime(local + ".__fetched", (old, old))
    src.write_bytes(b"CHANGED")
    assert not is_fresh(local)
    fetch(src.as_uri(), str(dest), restore_mtime=False)
    assert open(local, "rb").read() == b"CHANGED"


def test_old_remote_mtime_does_not_defeat_the_cache(tmp_path):
    # round-8 review: restore_mtime=True sets the local file mtime to
    # the REMOTE object's age — a months-old static extract must still
    # count as fresh right after downloading, or every run re-downloads
    # it forever
    src = _make_src(tmp_path)
    old = time.time() - 90 * 86400
    os.utime(src, (old, old))  # remote object "modified" 90 days ago
    dest = tmp_path / "data"
    local = fetch(src.as_uri(), str(dest), restore_mtime=True)
    assert os.path.getmtime(local) < time.time() - 80 * 86400
    assert is_fresh(local)  # fetched seconds ago → fresh


def test_is_fresh_missing_file(tmp_path):
    assert not is_fresh(str(tmp_path / "nope.csv"))


def test_read_wkt_file(spark, tmp_path):
    """S3: pipe-delimited (id, wkt) scan (reference batch/geo.py:20-32)."""
    from dso_import_spark.sources.csv import read_wkt_file

    p = tmp_path / "geo.dat"
    p.write_text("A1|POINT (1 2)\nA2|POLYGON ((0 0, 1 0, 1 1, 0 0))\n")
    rows = {r["id"]: r["wkt"] for r in read_wkt_file(spark, str(p)).collect()}
    assert rows == {
        "A1": "POINT (1 2)",
        "A2": "POLYGON ((0 0, 1 0, 1 1, 0 0))",
    }
