"""Synthetic BAGH-shaped CSV fixture generator (FIXTURES.md spec B).

Produces GOB-format CSVs (semicolon, utf-8-sig, camelCase headers,
empty string = NULL, pipe-lists) for a reduced FK chain
pand ← verblijfsobject → buurt, with known-bad rows that trip each
data-quality gate, plus a v2 variant for SCD2 merge-replay tests.
Deterministic (no randomness).
"""

from __future__ import annotations

import csv
import os

BUURT_HEADERS = [
    "identificatie",
    "volgnummer",
    "registratiedatum",
    "beginGeldigheid",
    "eindGeldigheid",
    "geometrie",
    "naam",
    "code",
    "cbsCode",
    "documentdatum",
    "documentnummer",
    "ligtIn:GBD.WIJK.identificatie",
    "ligtIn:GBD.WIJK.volgnummer",
    "ligtIn:GBD.GGW.identificatie",
    "ligtIn:GBD.GGW.volgnummer",
    "ligtIn:GBD.SDL.identificatie",
    "ligtIn:GBD.SDL.volgnummer",
]

PAND_HEADERS = [
    "identificatie",
    "volgnummer",
    "registratiedatum",
    "beginGeldigheid",
    "eindGeldigheid",
    "geometrie",
    "status",
    "documentdatum",
    "documentnummer",
    "aanduidingInOnderzoek",
    "geconstateerd",
]

VBO_HEADERS = [
    "identificatie",
    "volgnummer",
    "registratiedatum",
    "beginGeldigheid",
    "eindGeldigheid",
    "geometrie",
    "status",
    "documentdatum",
    "documentnummer",
    "aanduidingInOnderzoek",
    "geconstateerd",
    "oppervlakte",
    "verdiepingToegang",
    "hoogsteBouwlaag",
    "laagsteBouwlaag",
    "aantalKamers",
    "eigendomsverhouding",
    "gebruiksdoel",
    "gebruiksdoelWoonfunctie",
    "gebruiksdoelGezondheidszorgfunctie",
    "toegang",
    "redenopvoer",
    "heeftIn:BAG.NAG.identificatieHoofdadres",
    "heeftIn:BAG.NAG.volgnummerHoofdadres",
    "heeftIn:BAG.NAG.identificatieNevenadres",
    "heeftIn:BAG.NAG.volgnummerNevenadres",
    "ligtIn:GBD.BRT.identificatie",
    "ligtIn:GBD.BRT.volgnummer",
    "ligtIn:BAG.PND.identificatie",
    "ligtIn:BAG.PND.volgnummer",
]

POLY = "POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"
MPOLY = "MULTIPOLYGON(((0 0, 0 10, 10 10, 10 0, 0 0)))"
POINT = "POINT(4.5 52.1)"


def buurt_rows() -> list[dict]:
    rows = []
    for i in range(1, 21):
        ident = f"BU{i:04d}"
        # two closed versions + one open version per key
        for v in (1, 2, 3):
            rows.append(
                {
                    "identificatie": ident,
                    "volgnummer": v,
                    "registratiedatum": f"2020-0{v}-01T10:00:00",
                    "beginGeldigheid": f"201{v}-01-01",
                    "eindGeldigheid": "" if v == 3 else f"201{v + 1}-01-01",
                    "geometrie": POLY if v % 2 else MPOLY,
                    "naam": f"Buurt {i}",
                    "code": f"B{i:03d}",
                    "cbsCode": f"CBS{i:04d}",
                    "documentdatum": "2020-01-15",
                    "documentnummer": f"DOC{i}",
                    "ligtIn:GBD.WIJK.identificatie": "",
                    "ligtIn:GBD.WIJK.volgnummer": "",
                    "ligtIn:GBD.GGW.identificatie": "",
                    "ligtIn:GBD.GGW.volgnummer": "",
                    "ligtIn:GBD.SDL.identificatie": "",
                    "ligtIn:GBD.SDL.volgnummer": "",
                }
            )
    # gate trippers
    # Q2: overlapping ranges for BU0001 (v4 starts inside v3's open range)
    rows.append(
        {
            **rows[2],
            "volgnummer": 4,
            "beginGeldigheid": "2014-06-01",
            "eindGeldigheid": "",
        }
    )
    # ^ that also makes BU0001 have two open intervals (Q1) — fixed below
    rows[-1]["eindGeldigheid"] = "2015-01-01"
    # Q3: end < begin → row dropped
    rows.append(
        {
            **rows[5],
            "identificatie": "BU0002",
            "volgnummer": 9,
            "beginGeldigheid": "2019-01-01",
            "eindGeldigheid": "2018-01-01",
        }
    )
    # Q6: POINT under multipolygon expectation → row dropped
    rows.append(
        {
            **rows[8],
            "identificatie": "BU0003",
            "volgnummer": 9,
            "beginGeldigheid": "2019-06-01",
            "eindGeldigheid": "2019-07-01",
            "geometrie": POINT,
        }
    )
    # empty geometry on an open row → kept with NULL geometry (warn only)
    rows.append(
        {
            **rows[11],
            "identificatie": "BU0004",
            "volgnummer": 9,
            "beginGeldigheid": "2019-06-01",
            "eindGeldigheid": "2019-07-01",
            "geometrie": "",
        }
    )
    return rows


def pand_rows() -> list[dict]:
    rows = []
    for i in range(1, 31):
        ident = f"PD{i:04d}"
        rows.append(
            {
                "identificatie": ident,
                "volgnummer": 1,
                "registratiedatum": "2020-01-01T09:30:00",
                "beginGeldigheid": "2015-01-01",
                "eindGeldigheid": "",
                "geometrie": POLY,
                "status": "in gebruik",
                "documentdatum": "2020-01-10",
                "documentnummer": f"PDOC{i}",
                "aanduidingInOnderzoek": "N",
                "geconstateerd": "J" if i % 2 else "N",
            }
        )
    return rows


def vbo_rows() -> list[dict]:
    rows = []
    for i in range(1, 41):
        ident = f"VB{i:04d}"
        buurt = f"BU{(i % 20) + 1:04d}"
        pands = f"PD{(i % 30) + 1:04d}|PD{((i + 1) % 30) + 1:04d}"
        rows.append(
            {
                "identificatie": ident,
                "volgnummer": 1,
                "registratiedatum": "2021-03-05T12:00:00",
                "beginGeldigheid": "2016-01-01",
                "eindGeldigheid": "",
                "geometrie": POINT,
                "status": "in gebruik",
                "documentdatum": "2021-01-10",
                "documentnummer": f"VDOC{i}",
                "aanduidingInOnderzoek": "" if i % 5 == 0 else "N",
                "geconstateerd": "Y" if i % 3 == 0 else "N",
                "oppervlakte": str(40 + i) if i % 7 else "abc",  # P4 junk
                "verdiepingToegang": "0",
                "hoogsteBouwlaag": "4",
                "laagsteBouwlaag": "-1",  # not digits → NULL (P4 parity)
                "aantalKamers": str(2 + i % 4),
                "eigendomsverhouding": "Eigendom",
                "gebruiksdoel": "woonfunctie|kantoorfunctie" if i % 2 else "woonfunctie",
                "gebruiksdoelWoonfunctie": "woning" if i % 2 else "",
                "gebruiksdoelGezondheidszorgfunctie": "",
                "toegang": "trap" if i % 4 else "",
                "redenopvoer": "nieuwbouw",
                "heeftIn:BAG.NAG.identificatieHoofdadres": f"NA{i:04d}",
                "heeftIn:BAG.NAG.volgnummerHoofdadres": "1",
                "heeftIn:BAG.NAG.identificatieNevenadres": f"NA{i:04d}|NB{i:04d}"
                if i % 6 == 0
                else "",
                "heeftIn:BAG.NAG.volgnummerNevenadres": "1|2" if i % 6 == 0 else "",
                "ligtIn:GBD.BRT.identificatie": buurt,
                "ligtIn:GBD.BRT.volgnummer": "3",
                "ligtIn:BAG.PND.identificatie": pands,
                "ligtIn:BAG.PND.volgnummer": "1|1",
            }
        )
    # Q5: dangling buurt FK → row dropped
    rows.append(
        {**rows[0], "identificatie": "VB9999", "ligtIn:GBD.BRT.identificatie": "BU9999"}
    )
    # J3: one dangling pand id in the pipe-list → element dropped, row kept
    rows.append(
        {
            **rows[1],
            "identificatie": "VB9998",
            "ligtIn:BAG.PND.identificatie": "PD0001|PD9999",
            "ligtIn:BAG.PND.volgnummer": "1|1",
        }
    )
    return rows


def write_csv(path: str, headers: list[str], rows: list[dict]) -> None:
    with open(path, "w", encoding="utf-8-sig", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=headers, delimiter=";", quotechar='"')
        w.writeheader()
        for r in rows:
            w.writerow({h: r.get(h, "") for h in headers})


def generate(
    data_dir: str, v2: bool = False, drop: tuple[str, int] | None = None
) -> None:
    """Write the three GOB CSVs. v2 applies the SCD2 replay changes:
    one changed row (BU0005 naam), one new version (BU0006 v4).
    ``drop=(identificatie, volgnummer)`` removes one buurt row — used to
    trip the Q4 never-delete gate on a rerun."""
    os.makedirs(data_dir, exist_ok=True)
    b = buurt_rows()
    if drop:
        b = [
            r
            for r in b
            if not (r["identificatie"] == drop[0] and r["volgnummer"] == drop[1])
        ]
    if v2:
        for r in b:
            if r["identificatie"] == "BU0005" and r["volgnummer"] == 3:
                r["naam"] = "Buurt 5 renamed"
        open_row = next(
            r for r in b if r["identificatie"] == "BU0006" and r["volgnummer"] == 3
        )
        open_row["eindGeldigheid"] = "2020-01-01"
        b.append(
            {
                **open_row,
                "volgnummer": 4,
                "beginGeldigheid": "2020-01-01",
                "eindGeldigheid": "",
            }
        )
    write_csv(os.path.join(data_dir, "GBD_buurt_ActueelEnHistorie.csv"), BUURT_HEADERS, b)
    write_csv(os.path.join(data_dir, "BAG_pand_ActueelEnHistorie.csv"), PAND_HEADERS, pand_rows())
    write_csv(
        os.path.join(data_dir, "BAG_verblijfsobject_ActueelEnHistorie.csv"),
        VBO_HEADERS,
        vbo_rows(),
    )
