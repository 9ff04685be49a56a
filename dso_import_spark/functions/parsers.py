"""Scalar parsers as Catalyst Column expressions (SURVEY.md §2.2).

Semantics match the reference's row-level Python parsers, but expressed
as pure Column expressions so they stay inside whole-stage codegen and
Catalyst can fold/push them — no Python executes per row anywhere here.

Reference parity (cites into /root/reference):
- create_id       src/dso_import/bagh/batch.py:20-21
- create_ids      src/dso_import/bagh/batch.py:24-32
- int_or_none     src/dso_import/bagh/batch.py:35-39
- parse_date      src/dso_import/batch/csv.py:21-26
- parse_date_time src/dso_import/batch/csv.py:12-18
- parse_yesno     src/dso_import/batch/csv.py:29-30
- date-range      src/dso_import/batch/csv.py:33-34
- empty→NULL      pervasive ``r[...] or None`` (bagh/batch.py:159 etc.)
- pipe-split      bagh/batch.py:547,556-558
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def empty_to_null(col: Column | str) -> Column:
    """'' → NULL (the reference's ``value or None`` coalescing)."""
    c = _col(col)
    return F.when(c == "", F.lit(None)).otherwise(c)


def create_id(identificatie: Column | str, volgnummer: Column | str) -> Column:
    """Surrogate key ``{identificatie}_{volgnummer:03d}``, NULL-propagating.

    Mirrors ``create_id`` (bagh/batch.py:20-21): falsy identificatie →
    None id — the reference's ``if identificatie`` is Python
    truthiness, so the EMPTY STRING also yields None (a '' ident must
    not fabricate a '_005'-style key that would collide across rows
    and slip past the NULL-key staging gate). volgnummer is
    zero-padded to width 3.
    """
    ident, volg = _col(identificatie), _col(volgnummer)
    # try_cast to BIGINT, not a raw cast('int'): under default-ANSI
    # Spark a non-numeric volgnummer ('2a') or an int32 overflow would
    # ABORT the whole import with CAST_INVALID_INPUT, where the
    # reference's Python int() succeeds on the 10+-digit case and the
    # module's own discipline is "NULL, never crash" (round-8 review).
    # Non-numeric → NULL key → caught by the NULL-key staging gate.
    vnum = volg.try_cast("bigint")
    return F.when(
        ident.isNotNull() & (ident != "") & vnum.isNotNull(),
        F.format_string("%s_%03d", ident, vnum),
    )


def create_ids(id_list: Column | str, volg_list: Column | str, sep: str = r"\|") -> Column:
    """Pipe-delimited id/volgnummer lists → array of surrogate keys.

    Mirrors ``create_ids`` (bagh/batch.py:24-32): split both columns on
    '|', zip pairwise, map each pair through ``create_id``. Divergence
    (documented in SURVEY.md §7): the reference would IndexError when the
    volgnummer list is shorter; we zip-to-longest with NULL fill, and a
    NULL on either side yields a NULL element (then compacted out).
    """
    ids = F.split(_col(id_list), sep)
    volgs = F.split(_col(volg_list), sep)
    zipped = F.arrays_zip(ids.alias("i"), volgs.alias("v"))
    # try_cast for the same reason as create_id: one corrupt token in
    # one pipe list must yield a NULL element (compacted out), never
    # abort the job with an ANSI cast error
    mapped = F.transform(
        zipped,
        lambda p: F.when(
            p["i"].isNotNull()
            & (p["i"] != "")
            & p["v"].try_cast("bigint").isNotNull(),
            F.format_string("%s_%03d", p["i"], p["v"].try_cast("bigint")),
        ),
    )
    return F.filter(mapped, lambda x: x.isNotNull())


def int_or_none(col: Column | str) -> Column:
    """Digits-only string → int, else NULL (bagh/batch.py:35-39).

    ``v.isdigit()`` in the reference accepts only [0-9]+ — so '-3',
    '1.5', 'abc', '' all map to NULL. ``try_cast`` would accept '-3';
    the rlike guard keeps exact parity. Cast target is LONG with an
    18-digit bound: a 10+-digit string passed the digit guard but
    overflowed cast('int'), which THROWS under default-ANSI Spark —
    the reference returns the unbounded Python int, so the widest
    crash-free integer type is the right port (beyond 18 digits the
    value exceeds any SQL integer; NULL, never crash).
    """
    c = _col(col)
    return F.when(c.rlike("^[0-9]{1,18}$"), c.cast("long"))


def parse_date(col: Column | str) -> Column:
    """ISO date from the first 10 chars; '' → NULL (batch/csv.py:21-26)."""
    c = empty_to_null(_col(col))
    return F.to_date(F.substring(c, 1, 10), "yyyy-MM-dd")


def parse_date_time(col: Column | str) -> Column:
    """len>10 → ISO timestamp, else midnight of ISO date (batch/csv.py:12-18).

    The reference returns datetime.date for short strings and
    datetime.datetime for long ones; a DataFrame column must be one
    type, so we unify to TimestampType (midnight for bare dates) —
    divergence documented in SURVEY.md §1.3.
    """
    c = empty_to_null(_col(col))
    return F.when(F.length(c) > 10, F.to_timestamp(c)).otherwise(
        F.to_timestamp(F.to_date(c, "yyyy-MM-dd"))
    )


def parse_yesno_boolean(col: Column | str) -> Column:
    """Tri-state boolean: 'J'/'Y' → true, 'N' → false, else NULL.

    (batch/csv.py:29-30). NULL must stay NULL — do not collapse to
    false (SURVEY.md §7 hard part (d)).
    """
    c = _col(col)
    return F.when(c.isin("J", "Y"), F.lit(True)).when(c == "N", F.lit(False))


def valid_date_range(begin: Column | str, end: Column | str) -> Column:
    """Row-validity predicate: end is NULL or begin <= end.

    ``is_valid_date_range`` (batch/csv.py:33-34) as applied at
    bagh/batch.py:160-164 — rows failing it are dropped (gate Q3).
    A NULL begin passes (open start).
    """
    b, e = _col(begin), _col(end)
    return e.isNull() | b.isNull() | (b <= e)


def pipe_split(col: Column | str) -> Column:
    """Pipe-list → array; ''/NULL → empty array (bagh/batch.py:547,556-558)."""
    c = _col(col)
    return F.when(c.isNull() | (c == ""), F.array().cast("array<string>")).otherwise(
        F.split(c, r"\|")
    )
