from dso_import_spark.functions.parsers import (
    create_id,
    create_ids,
    empty_to_null,
    int_or_none,
    parse_date,
    parse_date_time,
    parse_yesno_boolean,
    pipe_split,
    valid_date_range,
)

__all__ = [
    "create_id",
    "create_ids",
    "empty_to_null",
    "int_or_none",
    "parse_date",
    "parse_date_time",
    "parse_yesno_boolean",
    "pipe_split",
    "valid_date_range",
]
