"""S4 shapefile source: pure-Python .shp/.dbf reader over binaryFile.

The test fixture is written byte-for-byte from the published ESRI
Shapefile Technical Description (1998) and dBASE III header layout —
the same formats GDAL reads for the reference (geo.py:35-49) — so the
round-trip checks our parser against the spec, not against itself.
"""

from __future__ import annotations

import struct

from dso_import_spark.functions.geometry import coerce_wkt
from dso_import_spark.sources.shapefile import parse_dbf, parse_shp, read_shapefile


def _shp_bytes(records: list[bytes]) -> bytes:
    body = b""
    for i, content in enumerate(records, start=1):
        body += struct.pack(">ii", i, len(content) // 2) + content
    total_words = (100 + len(body)) // 2
    header = struct.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, total_words)
    header += struct.pack("<ii", 1000, 1)  # version, shape type
    header += struct.pack("<8d", 0, 0, 10, 10, 0, 0, 0, 0)  # bbox mmzz
    return header + body


def _point(x: float, y: float) -> bytes:
    return struct.pack("<i2d", 1, x, y)


def _polygon(rings: list[list[tuple[float, float]]]) -> bytes:
    pts = [p for r in rings for p in r]
    parts, acc = [], 0
    for r in rings:
        parts.append(acc)
        acc += len(r)
    content = struct.pack("<i4d", 5, 0, 0, 10, 10)
    content += struct.pack("<ii", len(rings), len(pts))
    content += struct.pack(f"<{len(parts)}i", *parts)
    content += struct.pack(f"<{2 * len(pts)}d", *[c for p in pts for c in p])
    return content


def _dbf_bytes(names: list[str], rows: list[list[str]], width: int = 10) -> bytes:
    n_fields = len(names)
    header_len = 32 + 32 * n_fields + 1
    record_len = 1 + width * n_fields
    header = struct.pack(
        "<B3BiHH20x", 3, 26, 8, 13, len(rows), header_len, record_len
    )
    for name in names:
        header += struct.pack(
            "<11sc4xBB14x", name.encode().ljust(11, b"\x00"), b"C", width, 0
        )
    header += b"\x0d"
    body = b""
    for row in rows:
        body += b" " + b"".join(v.encode().ljust(width)[:width] for v in row)
    return header + body + b"\x1a"


SQUARE = [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)]


def _write_fixture(tmp_path, stem: str = "areas") -> str:
    shp = _shp_bytes([_polygon([SQUARE]), _point(2.5, 3.5)])
    dbf = _dbf_bytes(["CODE", "NAAM"], [["A01", "Centrum"], ["A02", "Noord"]])
    (tmp_path / f"{stem}.shp").write_bytes(shp)
    (tmp_path / f"{stem}.dbf").write_bytes(dbf)
    return str(tmp_path / f"{stem}.shp")


def test_parse_shp_spec_bytes():
    recs = dict(parse_shp(_shp_bytes([_polygon([SQUARE]), _point(2.5, 3.5)])))
    assert recs[1].startswith("POLYGON ((0.000000 0.000000,")
    assert recs[2] == "POINT (2.500000 3.500000)"


def test_parse_dbf_spec_bytes():
    names, rows = parse_dbf(_dbf_bytes(["CODE", "NAAM"], [["A01", "Centrum"]]))
    assert names == ["CODE", "NAAM"]
    assert list(rows) == [["A01", "Centrum"]]


def test_read_shapefile_joins_attrs(spark, tmp_path):
    path = _write_fixture(tmp_path)
    rows = {
        r["record_no"]: r
        for r in read_shapefile(spark, path).collect()
    }
    assert rows[1]["attrs"]["NAAM"] == "Centrum"
    assert rows[1]["wkt"].startswith("POLYGON ((")
    assert rows[2]["attrs"]["CODE"] == "A02"
    assert rows[2]["wkt"] == "POINT (2.500000 3.500000)"


def test_shapefile_feeds_g1_coercion(spark, tmp_path):
    """Parsed WKT flows into the existing G1 geometry pipeline."""
    path = _write_fixture(tmp_path)
    df = read_shapefile(spark, path)
    coerced = df.select(
        "record_no", coerce_wkt(df["wkt"], "multipolygon").alias("g")
    ).collect()
    got = {r["record_no"]: r["g"] for r in coerced}
    assert got[1] is not None  # bare Polygon wrapped to MultiPolygon
    assert got[2] is None  # Point rejected under multipolygon, as in geo.py:52-78
