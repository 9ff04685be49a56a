"""WKT geometry parsing + type coercion (SURVEY.md §2.7 G1/G2).

Reference semantics (/root/reference/src/dso_import/batch/geo.py:52-78),
per expected geotype:

- multipolygon: POLYGON → wrap as MULTIPOLYGON; MULTIPOLYGON → keep;
  anything else → None (reject)
- polygon:      POLYGON only, else None
- point:        POINT only, else None
- multiline:    LINESTRING → wrap as MULTILINESTRING; MULTILINESTRING →
  keep; else None
- any other geotype → None

The reference parses with GEOS; GEOS/shapely is not available in this
environment, so parsing is a structural WKT validator + string-level
coercion implemented as an Arrow-batched Pandas UDF (the engine's
geometry interchange format is normalized WKT text; SRID is fixed
28992 as table metadata — bagh_create.sql:37 etc.). The wrap
POLYGON((r1),(r2)) → MULTIPOLYGON(((r1),(r2))) is exactly GEOS's
MultiPolygon(polygon) construction. Full ring-validity checking (GEOS
IsValid) is out of scope and documented as a divergence — malformed
nesting/parens/numbers are still rejected.

Scale note: pandas_udf processes Arrow batches (~10k rows) per call;
the hot path is a compiled regex prefix match, not per-row Python
object churn. At 100 TB geometry parsing is embarrassingly parallel
and stays inside the scan-project stage (no shuffle).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# type word, optional dimension token (Z/M/ZM — GEOS accepts these,
# geo.py parses via GEOSGeometry, so the port must too), then either a
# parenthesized body or the EMPTY keyword
_PREFIX_RE = re.compile(
    r"^\s*([A-Za-z]+)\s*(?:\b(ZM|Z|M)\s+)?(\(.*\)|EMPTY)\s*$",
    re.DOTALL | re.IGNORECASE,
)
_NUM_PAIR_RE = re.compile(
    r"^\s*-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?(?:\s+-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)+\s*$"
)

GEOMETRY_TYPES = {
    "POINT",
    "LINESTRING",
    "POLYGON",
    "MULTIPOINT",
    "MULTILINESTRING",
    "MULTIPOLYGON",
    "GEOMETRYCOLLECTION",
}


def _parse_wkt(wkt: str) -> tuple[str, str, str] | None:
    """Return (TYPE, dim-token ('' | 'Z' | 'M' | 'ZM'), body) if
    structurally valid, else None. body is '(...)' or 'EMPTY'."""
    m = _PREFIX_RE.match(wkt)
    if not m:
        return None
    gtype = m.group(1).upper()
    dim = (m.group(2) or "").upper()
    body = m.group(3)
    if gtype not in GEOMETRY_TYPES:
        return None
    if body.upper() == "EMPTY":
        return gtype, dim, "EMPTY"
    # parens must balance and never go negative
    depth = 0
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return None
    if depth != 0:
        return None
    # every innermost group must be comma-separated coordinate tuples
    for inner in re.findall(r"\(([^()]*)\)", body):
        for coord in inner.split(","):
            if not _NUM_PAIR_RE.match(coord):
                return None
    return gtype, dim, body


def coerce_wkt_value(wkt: str | None, geotype: str) -> str | None:
    """Pure-Python single-value coercion (geo.py:52-78 decision table)."""
    if not wkt:
        return None
    parsed = _parse_wkt(wkt)
    if not parsed:
        return None
    gtype, dim, body = parsed
    # preserve the dimension token where present (GEOS canonical form
    # is e.g. 'MULTIPOLYGON Z (((...)))'); EMPTY stays EMPTY unwrapped
    d = f" {dim} " if dim else ""
    if body == "EMPTY":
        wrap = {"multipolygon": "MULTIPOLYGON", "polygon": "POLYGON",
                "point": "POINT", "multiline": "MULTILINESTRING"}.get(geotype)
        ok = {
            "multipolygon": {"POLYGON", "MULTIPOLYGON"},
            "polygon": {"POLYGON"},
            "point": {"POINT"},
            "multiline": {"LINESTRING", "MULTILINESTRING"},
        }.get(geotype, set())
        return f"{wrap}{d or ' '}EMPTY" if gtype in ok else None
    if geotype == "multipolygon":
        if gtype == "POLYGON":
            return f"MULTIPOLYGON{d}({body})" if d else f"MULTIPOLYGON({body})"
        if gtype == "MULTIPOLYGON":
            return f"MULTIPOLYGON{d}{body}" if d else f"MULTIPOLYGON{body}"
        return None
    if geotype == "polygon":
        return (f"POLYGON{d}{body}" if d else f"POLYGON{body}") if gtype == "POLYGON" else None
    if geotype == "point":
        return (f"POINT{d}{body}" if d else f"POINT{body}") if gtype == "POINT" else None
    if geotype == "multiline":
        if gtype == "LINESTRING":
            return f"MULTILINESTRING{d}({body})" if d else f"MULTILINESTRING({body})"
        if gtype == "MULTILINESTRING":
            return f"MULTILINESTRING{d}{body}" if d else f"MULTILINESTRING{body}"
        return None
    return None


def coerce_wkt(col: Column | str, geotype: str) -> Column:
    """Column of WKT text → normalized WKT of the expected type, else NULL.

    NULL/'' input → NULL (allowed; the caller decides whether an empty
    geometry is a warn or a drop — bagh/batch.py:175-189).
    """

    @pandas_udf("string")
    def _coerce(s: pd.Series) -> pd.Series:
        return s.map(lambda v: coerce_wkt_value(v, geotype))

    c = F.col(col) if isinstance(col, str) else col
    return _coerce(c)


def wkt_geometry_type(col: Column | str) -> Column:
    """Uppercased WKT type prefix (ST_GeometryType analog), NULL if invalid."""
    c = F.col(col) if isinstance(col, str) else col
    # regexp_extract returns '' on no match — map that to NULL, and
    # restrict to the actual WKT geometry types: a bare alpha prefix
    # ('FOO (1 2)', 'POINTZ ...') is NOT a type, and returning it let
    # a "type IS NOT NULL" validity gate pass garbage rows that
    # coerce_wkt would reject (round-8 review)
    prefix = F.upper(F.regexp_extract(F.trim(c), r"^([A-Za-z]+)", 1))
    return F.when(prefix.isin(*sorted(GEOMETRY_TYPES)), prefix)
