"""Shapefile source (SURVEY.md §2.1 S4).

The reference reads ESRI shapefiles through GDAL — ``DataSource(path)``,
iterate layer features, hand each feature to a row callback
(/root/reference/src/dso_import/batch/geo.py:35-49). This module is a
pure-Python reader for the published shapefile spec (ESRI Shapefile
Technical Description, 1998): the ``.shp`` geometry file and the
``.dbf`` (dBASE III) attribute sidecar. No GDAL dependency.

Spark-first shape: shapefiles are NOT splittable (record headers carry
no sync markers), so the unit of parallelism is the *file* — exactly
what ``spark.read.format("binaryFile")`` provides. Each executor task
receives one file's bytes and parses it with an Arrow-batched
``mapInPandas``; a directory of shapefiles therefore fans out across
the cluster with no driver-side parsing. Geometry is emitted as WKT so
the existing G1 coercion pipeline (functions/geometry.coerce_wkt)
applies unchanged.

Supported shape types (covers the reference's BAG usage — points and
polygons): 0 (Null), 1 (Point), 3 (PolyLine), 5 (Polygon), plus their
M/Z variants (8/11/13/15/18/21/23/25 parse the XY prefix and ignore
measures). Multi-ring polygons emit POLYGON with every part as a ring;
ring→multipolygon promotion is G1's job, matching the reference's
``get_geotype`` coercion.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

SHP_POINT = {1, 11, 21}
SHP_POLYLINE = {3, 13, 23}
SHP_POLYGON = {5, 15, 25}
SHP_MULTIPOINT = {8, 18, 28}


def _ring_wkt(points: list[tuple[float, float]]) -> str:
    return "(" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in points) + ")"


def _parse_poly(content: bytes, kind: str) -> str:
    """Shared PolyLine/Polygon record body: box, parts index, points."""
    num_parts, num_points = struct.unpack_from("<ii", content, 36)
    parts = list(struct.unpack_from(f"<{num_parts}i", content, 44))
    pts_off = 44 + 4 * num_parts
    flat = struct.unpack_from(f"<{2 * num_points}d", content, pts_off)
    pts = [(flat[2 * i], flat[2 * i + 1]) for i in range(num_points)]
    bounds = parts + [num_points]
    rings = [pts[bounds[i] : bounds[i + 1]] for i in range(num_parts)]
    body = ", ".join(_ring_wkt(r) for r in rings)
    if kind == "polygon":
        return f"POLYGON ({body})"
    if num_parts == 1:
        return f"LINESTRING {_ring_wkt(rings[0])}"
    return f"MULTILINESTRING ({body})"


def parse_shp(data: bytes) -> Iterator[tuple[int, str | None]]:
    """Yield (record_number, wkt) from .shp bytes.

    File header is 100 bytes; each record is an 8-byte big-endian
    (number, content-words) header followed by a little-endian shape.
    """
    file_len = struct.unpack_from(">i", data, 24)[0] * 2
    off = 100
    while off + 8 <= min(file_len, len(data)):
        rec_no, content_words = struct.unpack_from(">ii", data, off)
        content = data[off + 8 : off + 8 + content_words * 2]
        off += 8 + content_words * 2
        shape_type = struct.unpack_from("<i", content, 0)[0]
        if shape_type == 0:
            yield rec_no, None
        elif shape_type in SHP_POINT:
            x, y = struct.unpack_from("<2d", content, 4)
            yield rec_no, f"POINT ({x:.6f} {y:.6f})"
        elif shape_type in SHP_MULTIPOINT:
            (n,) = struct.unpack_from("<i", content, 36)
            flat = struct.unpack_from(f"<{2 * n}d", content, 40)
            body = ", ".join(
                f"({flat[2 * i]:.6f} {flat[2 * i + 1]:.6f})" for i in range(n)
            )
            yield rec_no, f"MULTIPOINT ({body})"
        elif shape_type in SHP_POLYGON:
            yield rec_no, _parse_poly(content, "polygon")
        elif shape_type in SHP_POLYLINE:
            yield rec_no, _parse_poly(content, "polyline")
        else:
            yield rec_no, None


def parse_dbf(data: bytes, encoding: str = "latin-1") -> tuple[list[str], Iterator[list[str | None]]]:
    """Parse dBASE III: return (field_names, row iterator of strings).

    All values surface as trimmed strings (NULL for blank) — the same
    read-as-strings-then-cast discipline as the S1 CSV source.
    """
    n_records, header_len, record_len = struct.unpack_from("<iHH", data, 4)
    fields: list[tuple[str, int]] = []
    off = 32
    while off < header_len - 1 and data[off] != 0x0D:
        raw_name = data[off : off + 11].split(b"\x00")[0]
        length = data[off + 16]
        fields.append((raw_name.decode("ascii", "replace"), length))
        off += 32
    names = [n for n, _ in fields]

    def rows() -> Iterator[list[str | None] | None]:
        pos = header_len
        for _ in range(n_records):
            rec = data[pos : pos + record_len]
            pos += record_len
            if len(rec) < record_len or rec[0:1] == b"*":
                # deleted row: yield a PLACEHOLDER, never skip — .dbf
                # records align positionally with .shp record numbers,
                # so dropping the slot would shift every later row's
                # attributes onto the wrong geometry
                yield None
                continue
            vals: list[str | None] = []
            f_off = 1
            for _, length in fields:
                raw = rec[f_off : f_off + length].decode(encoding).strip()
                vals.append(raw or None)
                f_off += length
            yield vals

    return names, rows()


def read_shapefile(
    spark: SparkSession, shp_path: str, encoding: str = "latin-1"
) -> DataFrame:
    """S4: shapefile(s) → DataFrame(path, record_no, wkt, attrs map).

    ``shp_path`` may be a single ``.shp`` or a glob/directory; the
    matching ``.dbf`` (same stem) is joined on record number. Each file
    is one task (binaryFile source); parsing runs executor-side via
    mapInPandas, so a directory of shapefiles scales horizontally.
    """
    import pandas as pd

    shp = spark.read.format("binaryFile").load(shp_path)

    def parse_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"path": [], "record_no": [], "wkt": [], "attrs": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                attr_rows: dict[int, dict[str, str | None]] = {}
                import os
                from urllib.parse import unquote

                if path.startswith(("file:", "/")):
                    # binaryFile URL-encodes file: URLs (space -> %20);
                    # a BARE /path is NOT encoded — unquoting it would
                    # corrupt filenames containing literal %XX (round-8
                    # review: '/data/100%20off.shp' must not become
                    # '/data/100 off.shp', whose missing .dbf silently
                    # drops every attribute)
                    if path.startswith("file:"):
                        local = unquote(path.removeprefix("file:"))
                    else:
                        local = path
                    dbf_path = os.path.splitext(local)[0] + ".dbf"
                    if os.path.exists(dbf_path):
                        # existing-but-unreadable must RAISE, not be
                        # treated as geometry-only: silently dropping
                        # every attribute is wrong data, not a fallback
                        with open(dbf_path, "rb") as fh:
                            names, rows = parse_dbf(fh.read(), encoding)
                        attr_rows = {
                            i + 1: dict(zip(names, vals))
                            for i, vals in enumerate(rows)
                            if vals is not None  # deleted slots keep
                            # their record number but carry no attrs
                        }
                # non-local storage (hdfs/s3a): the sidecar cannot be
                # opened with the local API — geometry-only for now; a
                # cluster deployment reads the .dbf through the same
                # binaryFile source and joins on (stem, record_no)
                for rec_no, wkt in parse_shp(data):
                    out["path"].append(path)
                    out["record_no"].append(rec_no)
                    out["wkt"].append(wkt)
                    out["attrs"].append(attr_rows.get(rec_no, {}))
            yield pd.DataFrame(out)

    return shp.select("path", "content").mapInPandas(
        parse_partition,
        schema="path string, record_no int, wkt string, attrs map<string,string>",
    )
