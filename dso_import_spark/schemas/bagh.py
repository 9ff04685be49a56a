"""BAGH table schemas + per-table import configs.

Explicit StructTypes for the 15 target tables, derived from the
reference DDL (/root/reference/src/dso_import/bagh/bagh_create.sql:17-333)
per the type mapping in SURVEY.md §1.2:

- varchar(n)/text → StringType (length not enforced)
- smallint → ShortType, integer → IntegerType
- boolean → BooleanType (tri-state: NULL preserved)
- date → DateType, timestamptz → TimestampType (session TZ)
- text[] / varchar[] → ArrayType(StringType)
- geometry(T,28992) → StringType holding normalized WKT + the expected
  geometry type captured in TableConfig.geotype (no native Spark
  geometry type; SURVEY.md §1.2). PK/FK/CHECK become engine gates
  (operators.quality), indexes have no Spark equivalent.

Per-table import configs mirror the reference task definitions
(bagh/batch.py:459-592): GOB source path, expected geometry type,
FK references, and extra derived columns.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import types as T


def _temporal_core() -> list[T.StructField]:
    """The shared SCD2 temporal core (bagh_create.sql:17-27 pattern)."""
    return [
        T.StructField("id", T.StringType(), False),
        T.StructField("identificatie", T.StringType(), False),
        T.StructField("volgnummer", T.ShortType(), False),
        T.StructField("registratiedatum", T.TimestampType(), True),
        T.StructField("begin_geldigheid", T.DateType(), True),
        T.StructField("eind_geldigheid", T.DateType(), True),
    ]


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


_S = T.StringType()
_B = T.BooleanType()
_I = T.IntegerType()
_D = T.DateType()
_TS = T.TimestampType()
_AS = T.ArrayType(T.StringType())

BAGH_SCHEMAS: dict[str, T.StructType] = {
    # bagh_create.sql:17-27
    "gemeente": T.StructType(
        _temporal_core()
        + [_f("naam", _S, False), _f("verzorgingsgebied", _B)]
    ),
    # bagh_create.sql:29-46
    "stadsdeel": T.StructType(
        _temporal_core()
        + [
            _f("geometrie", _S),
            _f("date_modified", _TS),
            _f("code", _S),
            _f("naam", _S),
            _f("documentdatum", _D),
            _f("documentnummer", _S),
            _f("vervallen", _B),
            _f("ingang_cyclus", _D),
            _f("gemeente_id", _S, False),
        ]
    ),
    # bagh_create.sql:51-65
    "ggw_gebied": T.StructType(
        _temporal_core()
        + [
            _f("documentdatum", _D),
            _f("documentnummer", _S),
            _f("code", _S, False),
            _f("naam", _S, False),
            _f("geometrie", _S),
            _f("stadsdeel_id", _S, False),
        ]
    ),
    # bagh_create.sql:71-87
    "wijk": T.StructType(
        _temporal_core()
        + [
            _f("naam", _S, False),
            _f("code", _S, False),
            _f("documentdatum", _D),
            _f("documentnummer", _S),
            _f("cbs_code", _S),
            _f("geometrie", _S),
            _f("ggw_gebied_id", _S),
            _f("stadsdeel_id", _S, False),
        ]
    ),
    # bagh_create.sql:92-109
    "buurt": T.StructType(
        _temporal_core()
        + [
            _f("geometrie", _S),
            _f("code", _S),
            _f("naam", _S),
            _f("cbs_code", _S),
            _f("documentdatum", _D),
            _f("documentnummer", _S),
            _f("wijk_id", _S, False),
            _f("ggw_gebied_id", _S),
            _f("stadsdeel_id", _S, False),
        ]
    ),
    # bagh_create.sql:114-128
    "ggw_praktijkgebied": T.StructType(
        _temporal_core()
        + [
            _f("code", _S),
            _f("naam", _S, False),
            _f("documentdatum", _D),
            _f("documentnummer", _S),
            _f("geometrie", _S),
            _f("stadsdeel_id", _S, False),
        ]
    ),
    # bagh_create.sql:133-144
    "bouwblok": T.StructType(
        _temporal_core()
        + [_f("code", _S, False), _f("geometrie", _S), _f("buurt_id", _S)]
    ),
    # bagh_create.sql:149-165
    "woonplaats": T.StructType(
        _temporal_core()
        + [
            _f("aanduiding_in_onderzoek", _B),
            _f("geconstateerd", _B),
            _f("naam", _S, False),
            _f("documentdatum", _D),
            _f("documentnummer", _S),
            _f("status", _S, False),
            _f("geometrie", _S),
            _f("gemeente_id", _S),
        ]
    ),
    # bagh_create.sql:170-188
    "openbare_ruimte": T.StructType(
        _temporal_core()
        + [
            _f("aanduiding_in_onderzoek", _B),
            _f("geconstateerd", _B),
            _f("naam", _S, False),
            _f("naam_nen", _S, False),
            _f("type", _S),
            _f("documentdatum", _D),
            _f("documentnummer", _S),
            _f("status", _S, False),
            _f("geometrie", _S),
            _f("woonplaats_id", _S),
        ]
    ),
    # bagh_create.sql:193-209
    "ligplaats": T.StructType(
        _temporal_core()
        + [
            _f("documentdatum", _D),
            _f("documentnummer", _S),
            _f("aanduiding_in_onderzoek", _B),
            _f("geconstateerd", _B),
            _f("geometrie", _S),
            _f("status", _S, False),
            _f("buurt_id", _S, False),
            # DDL declares hoofdadres_id NOT NULL (bagh_create.sql:205)
            # but the import never populates it (loaded by a later
            # address pass in production); nullable here like the other
            # transcribed-but-unpopulated columns
            _f("hoofdadres_id", _S),
        ]
    ),
    # bagh_create.sql:214-230
    "standplaats": T.StructType(
        _temporal_core()
        + [
            _f("documentdatum", _D),
            _f("documentnummer", _S),
            _f("aanduiding_in_onderzoek", _B),
            _f("geconstateerd", _B),
            _f("geometrie", _S),
            _f("status", _S, False),
            _f("buurt_id", _S),
            _f("hoofdadres_id", _S),  # bagh_create.sql:226 — see ligplaats
        ]
    ),
    # bagh_create.sql:235-267
    "verblijfsobject": T.StructType(
        _temporal_core()
        + [
            _f("documentdatum", _D),
            _f("documentnummer", _S),
            _f("aanduiding_in_onderzoek", _B),
            _f("geconstateerd", _B),
            _f("heeftin_hoofdadres_id", _S),
            _f("heeftin_nevenadres_id", _AS),
            _f("geometrie", _S),
            _f("oppervlakte", _I),
            _f("status", _S, False),
            _f("verdieping_toegang", _I),
            _f("hoogste_bouwlaag", _I),
            _f("laagste_bouwlaag", _I),
            _f("aantal_kamers", _I),
            _f("eigendomsverhouding", _S),
            _f("gebruiksdoel_gezondheidszorgfunctie", _S),
            _f("gebruiksdoel_woonfunctie", _S),
            _f("gebruiksdoel", _AS, False),
            _f("toegang", _AS, False),
            _f("redenopvoer", _S),
            _f("redenafvoer", _S),
            # bagh_create.sql:253-261 — transcribed, never populated
            _f("aantal_eenheden_complex", _I),
            _f("aantal_bouwlagen", _I),
            _f("gebruik", _S),
            _f("buurt_id", _S),
        ]
    ),
    # bagh_create.sql:272-294
    "nummeraanduiding": T.StructType(
        _temporal_core()
        + [
            _f("documentdatum", _D),
            _f("documentnummer", _S),
            _f("aanduiding_in_onderzoek", _B),
            _f("geconstateerd", _B),
            _f("huisnummer", _I, False),
            _f("huisletter", _S),
            _f("huisnummer_toevoeging", _S),
            _f("postcode", _S),
            _f("openbare_ruimte_id", _S),
            _f("ligplaats_id", _S),
            _f("standplaats_id", _S),
            _f("verblijfsobject_id", _S),
            _f("type_adres", _S),
            _f("status", _S),
        ]
    ),
    # bagh_create.sql:298-320
    "pand": T.StructType(
        _temporal_core()
        + [
            _f("documentdatum", _D),
            _f("documentnummer", _S),
            _f("aanduiding_in_onderzoek", _B),
            _f("geconstateerd", _B),
            _f("bouwjaar", _I),  # CHECK (bouwjaar >= 0) → quality gate
            _f("status", _S, False),
            _f("naam", _S),
            _f("ligging", _S),
            _f("type_woonobject", _S),
            _f("aantal_bouwlagen", _I),
            _f("laagste_bouwlaag", _I),
            _f("hoogste_bouwlaag", _I),
            _f("geometrie", _S),
            _f("bouwblok_id", _S),
        ]
    ),
    # bagh_create.sql:325-333 (M:N bridge; full-replace semantics)
    "verblijfsobjectpandrelatie": T.StructType(
        [
            _f("id", _S, False),
            _f("pand_id", _S, False),
            _f("verblijfsobject_id", _S, False),
        ]
    ),
}


@dataclass
class TableConfig:
    """One import task's config (mirrors bagh/batch.py:459-592 kwargs)."""

    name: str
    gob_path: str = "bag"  # 'bag' → BAG_*, 'gebieden' → GBD_* (batch.py:51-54)
    geotype: str = "multipolygon"  # default at batch.py:59
    references: list[str] = field(default_factory=list)
    # extra derived columns: name → fn(raw DataFrame) -> Column
    extra_fields: dict[str, Callable[..., Column]] = field(default_factory=dict)

    @property
    def gob_id(self) -> str:
        return {"bag": "BAG", "gebieden": "GBD"}[self.gob_path]

    @property
    def filename(self) -> str:
        return f"{self.gob_id}_{self.name}_ActueelEnHistorie.csv"


def _extra_fields_verblijfsobject() -> dict[str, Callable]:
    from pyspark.sql import functions as F

    from dso_import_spark.functions.parsers import (
        create_id,
        create_ids,
        empty_to_null,
        int_or_none,
        pipe_split,
    )

    return {
        "oppervlakte": lambda df: int_or_none(df["oppervlakte"]),
        "verdieping_toegang": lambda df: int_or_none(df["verdiepingToegang"]),
        "hoogste_bouwlaag": lambda df: int_or_none(df["hoogsteBouwlaag"]),
        "laagste_bouwlaag": lambda df: int_or_none(df["laagsteBouwlaag"]),
        "aantal_kamers": lambda df: int_or_none(df["aantalKamers"]),
        "eigendomsverhouding": lambda df: df["eigendomsverhouding"],
        # pipe_split, not raw F.split: the CSV reader maps '' to NULL,
        # and F.split(NULL) stores NULL in a NOT NULL text[] column —
        # P10 specifies empty → empty array (like toegang below)
        "gebruiksdoel": lambda df: pipe_split(df["gebruiksdoel"]),
        "gebruiksdoel_woonfunctie": lambda df: empty_to_null(
            df["gebruiksdoelWoonfunctie"]
        ),
        "gebruiksdoel_gezondheidszorgfunctie": lambda df: empty_to_null(
            df["gebruiksdoelGezondheidszorgfunctie"]
        ),
        "toegang": lambda df: pipe_split(df["toegang"]),
        "redenopvoer": lambda df: empty_to_null(df["redenopvoer"]),
        # reference reads redenopvoer for redenafvoer too (batch.py:560) —
        # kept bug-for-bug for parity
        "redenafvoer": lambda df: empty_to_null(df["redenopvoer"]),
        "heeftin_hoofdadres_id": lambda df: create_id(
            df["`heeftIn:BAG.NAG.identificatieHoofdadres`"],
            int_or_none(df["`heeftIn:BAG.NAG.volgnummerHoofdadres`"]),
        ),
        "heeftin_nevenadres_id": lambda df: create_ids(
            df["`heeftIn:BAG.NAG.identificatieNevenadres`"],
            df["`heeftIn:BAG.NAG.volgnummerNevenadres`"],
        ),
    }


def _extra_fields_nummeraanduiding() -> dict[str, Callable]:
    from dso_import_spark.functions.parsers import empty_to_null, int_or_none

    return {
        "huisnummer": lambda df: int_or_none(df["huisnummer"]),
        "huisletter": lambda df: empty_to_null(df["huisletter"]),
        "huisnummer_toevoeging": lambda df: empty_to_null(df["huisnummertoevoeging"]),
        "postcode": lambda df: df["postcode"],
        "type_adres": lambda df: df["typeAdres"],
    }


def _cbs_code() -> dict[str, Callable]:
    return {"cbs_code": lambda df: df["cbsCode"]}


def _naam_nen() -> dict[str, Callable]:
    return {"naam_nen": lambda df: df["naamNEN"]}


# FK dependency order (bagh/batch.py:459-592); gemeente is a literal source
TABLE_CONFIGS: dict[str, TableConfig] = {
    "gemeente": TableConfig("gemeente"),
    # the reference constructs ImportWoonplaatsTask with use=["gemeente"]
    # (batch.py:464-466) — a DEAD kwarg: the framework only reads
    # kwargs.get("references", []), so woonplaats has NO FK validation
    # and gemeente_id stays NULL (nullable in the DDL). Mirroring
    # references=["gemeente"] here invented a read of ligtIn:BRK.GME.*
    # and a drop gate the reference does not have.
    "woonplaats": TableConfig("woonplaats"),
    "stadsdeel": TableConfig("stadsdeel", "gebieden", references=["gemeente"]),
    "ggw_gebied": TableConfig("ggw_gebied", "gebieden", references=["stadsdeel"]),
    "ggw_praktijkgebied": TableConfig(
        "ggw_praktijkgebied", "gebieden", references=["stadsdeel"]
    ),
    "wijk": TableConfig(
        "wijk", "gebieden", references=["stadsdeel", "ggw_gebied"],
        extra_fields=_cbs_code(),
    ),
    "buurt": TableConfig(
        "buurt", "gebieden", references=["wijk", "ggw_gebied", "stadsdeel"],
        extra_fields=_cbs_code(),
    ),
    "bouwblok": TableConfig("bouwblok", "gebieden", references=["buurt"]),
    "openbare_ruimte": TableConfig(
        "openbare_ruimte", "bag", references=["woonplaats"],
        extra_fields=_naam_nen(),
    ),
    "ligplaats": TableConfig(
        "ligplaats", "bag", geotype="polygon", references=["buurt"]
    ),
    "standplaats": TableConfig(
        "standplaats", "bag", geotype="polygon", references=["buurt"]
    ),
    "pand": TableConfig("pand", "bag", geotype="polygon"),
    "verblijfsobject": TableConfig(
        "verblijfsobject", "bag", geotype="point", references=["buurt"],
        extra_fields=_extra_fields_verblijfsobject(),
    ),
    "nummeraanduiding": TableConfig(
        "nummeraanduiding", "bag",
        references=["ligplaats", "standplaats", "verblijfsobject", "openbare_ruimte"],
        extra_fields=_extra_fields_nummeraanduiding(),
    ),
}

TABLE_ORDER: list[str] = list(TABLE_CONFIGS)

# CSV column each FK reference reads, per referenced table
# (bagh/batch.py:214-225)
MODEL_FIELD_MAP: dict[str, str] = {
    "gemeente": "ligtIn:BRK.GME",
    "stadsdeel": "ligtIn:GBD.SDL",
    "ggw_gebied": "ligtIn:GBD.GGW",
    "wijk": "ligtIn:GBD.WIJK",
    "buurt": "ligtIn:GBD.BRT",
    "woonplaats": "ligtIn:BAG.WPS",
    "openbare_ruimte": "ligtAan:BAG.ORE",
    "ligplaats": "adresseert:BAG.LPS",
    "standplaats": "adresseert:BAG.SPS",
    "verblijfsobject": "adresseert:BAG.VOT",
}
